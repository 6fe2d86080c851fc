"""Physical-plan helpers: partitioning hygiene and plan inspection.

The driver fixtures arrive as one small parquet file per table, so a
scan yields ONE input partition — and any operator doing expensive
per-row array work (md5 shingling, 64-dim dot products) or a pairwise
block join serializes on a single core.  ``spread`` guarantees a minimum
parallelism without ever *shrinking* a real cluster's partitioning: at
100 TB the scan already has thousands of partitions and ``spread`` is a
no-op; on a single small file it fans out to every core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition up to ``defaultParallelism × factor`` iff
    the current plan has fewer partitions; never reduces partitioning."""
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def two_phase_rank(
    df: DataFrame,
    partition_by: list,
    order_by: list,
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Top-k per partition group in TWO phases so no task ever sorts a
    group's full candidate set — the repo's standard no-single-task-sort
    shape, centralized because its one correctness requirement is easy
    to break in a copy: phase 1's per-``(group, spark_partition_id())``
    order must be EXACTLY phase 2's global per-group total order (a
    deterministic tie-broken ordering), or a true global top-k row can
    be cut locally.

    Phase 1 keeps ≤ k rows per (group, input partition) — a map-side
    cut, each task sorting only its own slice.  Phase 2 ranks the
    ≤ k·P survivors per group.  With a single-phase
    ``Window.partitionBy(group)`` the plan has exactly |groups|
    partitions — a single-task sort bottleneck at 100× scale (and a
    one-task global sort when ``partition_by`` is empty; here phase 2
    then sorts only ≤ k·P rows).  When ``rank_col`` is None the rank is
    dropped from the output."""
    from pyspark.sql import Window

    rc = rank_col or "__r"
    wl = Window.partitionBy(*partition_by, "__part").orderBy(*order_by)
    local = (
        df.withColumn("__part", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(wl))
        .filter(F.col("__lr") <= k)
        .drop("__part", "__lr")
    )
    wg = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = local.withColumn(rc, F.row_number().over(wg)).filter(
        F.col(rc) <= k
    )
    return ranked if rank_col else ranked.drop(rc)


#: frames persisted by cached() since the last release_cached() call —
#: the session-lifetime ledger that keeps a ~300-query bench/driver run
#: from accumulating cached blocks (each registry query releases its
#: predecessor's frames on entry; see queries._with_release)
_RELEASABLE: list[DataFrame] = []


def cached(df: DataFrame) -> DataFrame:
    """MEMORY_AND_DISK-persist a DataFrame that a query plan consumes
    more than once (self-joins, candidate-verify joins).  Spark's
    ReusedExchange only kicks in for identical exchanges; a subtree
    consumed through *different* downstream shuffles is otherwise
    recomputed per consumer — at 100 TB that's re-reading the scan and
    re-hashing every shingle N times.  Spilling to disk keeps the
    operator safe when the intermediate exceeds executor memory.

    Lifetime: the frame stays pinned while its query's consumer (the
    harness collecting the result) still needs it, and is released when
    the NEXT registry query starts (:func:`release_cached`), so cached
    blocks never accumulate across a multi-hundred-query session."""
    from pyspark.storagelevel import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _RELEASABLE.append(df)
    return df


def release_cached() -> None:
    """Unpersist every frame :func:`cached` pinned since the last call.
    Called by the registry wrapper at each query's entry — by then the
    previous query's result has been consumed, so its intermediates are
    dead weight.  Re-deriving a released frame is correct (a recompute)
    for PLAN-BACKED frames only: ``cached(df.localCheckpoint(...))``
    frames have their lineage truncated, so unpersisting drops the only
    copy and any LATER action on a retained reference fails instead of
    recomputing.  Contract: no registry query may hand a cached
    localCheckpoint frame to a later query — every such frame must be
    fully consumed before the query returns (true today: checkpointed
    loop state in dedup/similarity is drained into the query's own
    result)."""
    while _RELEASABLE:
        try:
            _RELEASABLE.pop().unpersist()
        except Exception:
            pass


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The formatted physical plan as a string (for tests/inspection)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the hot-key shuffle split ``salt`` ways.

    AQE's skew-join splitting (enabled in ``session.get_spark``) handles
    most skew at runtime, but it only splits *partitions*, not a single
    monster key inside one partition, and it can't help a sort-merge
    join's sort spill on that key.  Manual salting is the standard
    pre-emptive fix: the fact side appends a deterministic salt
    ``pmod(hash(<all fact columns>), salt)`` and the (smaller) dim side
    is exploded ``salt``× so every (key, salt) bucket still finds its
    match.  Join output is row-identical to the unsalted join.

    Use when one key holds ≫ 1/numPartitions of the fact table (null
    keys, default values, celebrity users).  The dim side is replicated
    ``salt``× — keep it the smaller input.
    """
    fact_salted = fact.withColumn(
        "__salt",
        F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(salt)).cast(
            "int"
        ),
    )
    dim_exploded = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = fact_salted.join(dim_exploded, [key, "__salt"], how)
    return out.drop("__salt")
