"""Write path (SURVEY.md §2B scans/sources/sinks row).

The reference never persists anything — ``weight`` returns a DataFrame
and the caller is on their own (PositiveUnlabeledLearner.scala:22-25).
A pipeline engine needs a real write path, and at 100 TB its layout
decisions ARE the read-side performance story:

- ``write_parquet``: partitioned parquet — partition columns become
  directory keys, so downstream filters on them prune entire
  directories before a single row is read (partition pruning);
  ``maxRecordsPerFile`` bounds file size so a skewed partition can't
  produce a multi-GB file that one task must then re-read alone.
- ``write_bucketed_table``: hash-bucketed (+ optionally sorted)
  ``saveAsTable`` — two tables bucketed the same way join WITHOUT a
  shuffle (Spark reuses the bucketing as the join distribution), which
  is exactly what the dedup candidate joins (content hash) and ANN
  probes (LSH bucket) want: write once bucketed by the key, then every
  following run's join/probe is shuffle-free and bucket-pruned.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as (optionally directory-partitioned) parquet."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(int(max_records_per_file)))
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a hash-bucketed managed parquet table.

    Joins/aggregations on ``bucket_cols`` against another table with
    the same bucketing skip the shuffle entirely; ``sort_cols`` adds
    within-bucket ordering (sort-merge join without the sort step).

    The pre-write ``repartition(n_buckets, bucket_cols)`` is
    load-bearing: Spark's bucketed write emits one file per (input
    partition × bucket touched), so an unaligned 64-partition input
    writes up to 64×N tiny files (measured 36 s vs 4 s for the sf0.1
    band table).  ``repartition``'s HashPartitioning is the SAME
    murmur3-pmod the bucket assignment uses, so after it each task
    holds exactly one bucket → one file per bucket, which is also the
    single-file-per-bucket layout Spark needs to exploit ``sortBy``
    order at read time."""
    w = (
        df.repartition(int(n_buckets), *[F.col(c) for c in bucket_cols])
        .write.mode(mode)
        .format("parquet")
        .bucketBy(int(n_buckets), *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_parquet(df_spark, path: str) -> DataFrame:
    """Symmetric re-read of :func:`write_parquet` output."""
    return df_spark.read.parquet(path)
