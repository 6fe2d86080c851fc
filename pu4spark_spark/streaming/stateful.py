"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2B streaming/UDAF rows — the arbitrary-state API the
north-star brief calls out for operators watermarked windows can't
express).

The operator keeps one state tuple per user — event count and an exact
running total in integer cents — updated Arrow-batch-wise.  Money is
accumulated as ``int(round(value·100))`` so the state is an associative
integer sum: partition- and batch-order independent, restart-safe, and
bit-identical to the DuckDB oracle (floats would drift per ordering).

Scale: state lives in the state store partitioned by the grouping key
(one shuffle); each microbatch touches only keys present in the batch.
The availableNow drain makes the same operator driver-checkable as a
batch-equivalent query.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from pu4spark_spark.streaming.events import read_events_stream

OUTPUT_SCHEMA = "user_id long, n_events long, total_cents long"
STATE_SCHEMA = "n long, cents long"


def _update_user_totals(key, pdf_iter: Iterator, state) -> Iterator:
    """Fold this batch's rows for one user into (count, cents) state."""
    (uid,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    import pandas as pd

    yield pd.DataFrame(
        {"user_id": [uid], "n_events": [n], "total_cents": [cents]}
    )


def user_totals_stateful(stream: DataFrame) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def q_streaming_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the stateful per-user totals with availableNow and reduce
    the update-mode output to the LAST update per user, which equals
    the batch aggregate over the whole fixture — so the DuckDB oracle
    fully value-checks the stateful path.

    The last-update reduction matters: in update mode the memory sink
    holds one row per (user, micro-batch that touched the user), so
    with ``maxFilesPerTrigger=1`` and a multi-file landing directory a
    re-updated user appears once per batch.  ``n_events`` is strictly
    increasing for a user across its updates (the state folds batches
    in), so max(n_events) + max_by(total_cents, n_events) selects the
    final state row exactly."""
    return drain_user_totals(spark, read_events_stream(spark, sf_dir))


def drain_user_totals(spark: SparkSession, stream: DataFrame) -> DataFrame:
    """availableNow-drain ``user_totals_stateful`` over any event
    stream and reduce the update-mode sink to last-update-per-user."""
    from pu4spark_spark.streaming.drain import drain_to_memory

    out = user_totals_stateful(stream)
    drained = drain_to_memory(spark, out, "user_totals_stream", "update")
    from pyspark.sql import functions as F

    return (
        drained.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_cents", "n_events").alias("total_cents"),
        )
    )


SQL_STREAMING_USER_TOTALS = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS total_cents
FROM events
GROUP BY user_id
"""

def q_streaming_user_totals_rocksdb(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SAME ``applyInPandasWithState`` per-user totals drained
    under the **RocksDB state-store provider** — the production choice
    for keyed state at 100 TB: state lives off-heap in a per-partition
    RocksDB instance (on-disk, incremental snapshot/changelog) instead
    of the default HDFSBackedStateStore's executor-heap hash maps, so
    task memory stays bounded no matter how many keys the stream
    accumulates.  The provider is a pure-JVM engine lever (no extra
    deps — unlike the protobuf-gated ``transformWithStateInPandas``
    twin), set for this drain and restored after.

    WITNESS discipline (same as the OCC mini-lake queries): the drain's
    final progress must report ``rocksdb*`` custom metrics on the
    state operator — proof the provider was in effect, not just
    configured — or the query raises.  Values then reduce with the
    same last-update-per-user fold and hash-match the same batch
    oracle as the default-provider twin, pinning that the provider
    swap is semantics-neutral."""
    import uuid as _uuid

    from pu4spark_spark.streaming.drain import drain_partitions

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = user_totals_stateful(read_events_stream(spark, sf_dir))
        name = f"user_totals_rocksdb_{_uuid.uuid4().hex[:8]}"
        with drain_partitions(spark):
            q = (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            prog = q.lastProgress
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)
    ops = (prog or {}).get("stateOperators") or []
    if not any(
        "rocksdb" in metric.lower()
        for op in ops
        for metric in (op.get("customMetrics") or {})
    ):
        raise AssertionError(
            "RocksDB state store not witnessed in drain progress: "
            f"{prog}"
        )
    from pyspark.sql import functions as F

    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_cents", "n_events").alias("total_cents"),
        )
    )


QUERIES = {
    "streaming_user_totals": q_streaming_user_totals,
    "streaming_user_totals_rocksdb": q_streaming_user_totals_rocksdb,
}
ORACLE_SQL = {
    "streaming_user_totals": SQL_STREAMING_USER_TOTALS,
    "streaming_user_totals_rocksdb": SQL_STREAMING_USER_TOTALS,
}


# -- transformWithStateInPandas (Spark 4 arbitrary-state API) ------------

def q_streaming_user_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same exact-integer per-user totals through Spark 4's NEW
    arbitrary-state API — ``transformWithStateInPandas`` with a
    ``StatefulProcessor`` and typed ``ValueState`` — beside the
    ``applyInPandasWithState`` twin above, so both stateful surfaces
    are exercised and value-checked against the same batch oracle.

    TWS requires the RocksDB state-store provider (set for the query,
    restored after): at 100 TB keyed state that is the production
    choice anyway — state lives off-heap/on-disk per key-partition and
    task memory stays bounded.

    Environment gate: TWS's worker protocol needs ``google.protobuf``
    (pyspark's StateMessage protos); the query registers only when the
    import succeeds, so containers without protobuf simply don't list
    it (same import-try discipline as the multimodal decode stub)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n long, cents long"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, cents = (
                self._state.get() if self._state.exists() else (0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                cents += int(
                    (pdf["value"] * 100).round().astype("int64").sum()
                )
            self._state.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [cents],
                }
            )

        def close(self) -> None:
            pass

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, sf_dir)
        out = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=UserTotals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
        from pu4spark_spark.streaming.drain import drain_to_memory

        drained = drain_to_memory(spark, out, "user_totals_tws", "update")
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)
    from pyspark.sql import functions as F

    return (
        drained.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_cents", "n_events").alias("total_cents"),
        )
    )


def _tws_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if _tws_available():  # pragma: no cover — environment-dependent
    QUERIES["streaming_user_totals_tws"] = q_streaming_user_totals_tws
    ORACLE_SQL["streaming_user_totals_tws"] = SQL_STREAMING_USER_TOTALS
