"""SparkSession construction with scale-aware defaults.

The reference (ispras/pu4spark) leaves all session/physical decisions to
the caller (SURVEY.md §4).  We centralize them here so every entry point —
tests, bench, driver harness — runs with the same, 100-TB-minded config:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- UTC session timezone (duckdb-oracle comparability; duckdb timestamps
  are UTC-naive)
- Arrow enabled for the few pandas-UDF paths (multimodal decode)
- shuffle partitions sized to the local core count; on a real cluster
  AQE coalesces from an intentionally-high initial number instead.

``spark.driver.memory`` is a static JVM option: it takes effect only when
``getOrCreate`` actually COLD-STARTS the JVM (which is exactly what the
bench, tests, and oracle checker do) and is silently ignored when the
driver harness hands us an already-running session — where that harness's
own submit-time setting governs.  Leaving it unset was measured to leave
a 1 GiB default heap under local[32]: GC pressure from ML models +
cached intermediates degraded later stateful-streaming queries up to 9×.
``SPARK_GRAFT_DRIVER_MEM`` overrides the default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pu4spark_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master``/``shuffle_partitions`` default from env
    (``SPARK_GRAFT_CPUS``) so the driver harness and bench.py agree.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce/re-plan ON TOP of persisted intermediates —
        # the dedup/similarity operators persist multiply-consumed
        # subtrees, and without this flag every downstream stage of a
        # cached plan keeps the cache's full partition count even when
        # the shuffled data is tiny (default false pins cached layout)
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # static JVM option — effective on cold start only (see module
        # docstring); the 1 GiB default is far too small for local[32]
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    )
    from pu4spark_spark.scratch import install_scratch_gc

    install_scratch_gc()  # bound tempdir growth (ADVICE r6)
    return builder.getOrCreate()


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created
    session (the driver passes us its own SparkSession)."""
    from pu4spark_spark.scratch import install_scratch_gc

    install_scratch_gc()  # bound tempdir growth (ADVICE r6)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
    except Exception:
        pass  # static conf in some deployments; best-effort
    return spark
