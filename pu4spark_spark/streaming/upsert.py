"""Streaming CDC upsert via ``foreachBatch`` — the MERGE-at-ingest
pattern (SURVEY.md §2B streaming row; the reference has no streaming).

A landing directory holds a base snapshot file and an update-batch file;
``maxFilesPerTrigger=1`` makes them two micro-batches.  Each micro-batch
MERGEs into a parquet state directory: union current state with the
batch, keep the max-version row per key, write to a fresh directory and
atomically swap.  The final compacted state must hash-match the SAME
DuckDB oracle as the batch ``orders_upsert_compact`` query — the
streaming path and the batch path are required to agree row-for-row.

Scale notes (100 TB):
- the merge work per micro-batch is ONE hash-partitioned window over
  state+batch — the same single-shuffle compaction as the batch op;
- state lives in parquet files, not executor memory (contrast
  ``stateful.py``'s keyed state store: right for high-rate per-key
  updates, wrong for wide-snapshot MERGE);
- the swap is directory-atomic on one host; on an object store the same
  role is played by the table-format commit (Delta/Iceberg) this
  pattern deliberately reproduces with plain parquet.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pu4spark_spark.streaming.drain import drain_partitions
from pu4spark_spark.streaming.state import (
    fresh_state_dir as _fresh_state_dir,
    read_state,
    swap_parquet_state,
    write_single_file_shards,
)

from pu4spark_spark.operators.relational import SQL_ORDERS_UPSERT_COMPACT
from pu4spark_spark.sources import load_table

MERGE_KEY = "o_orderkey"


def _cdc_landing_dir(spark: SparkSession, sf_dir: str) -> str:
    """Two-file landing dir: 0_base (all orders, version 0) then
    1_updates (every 7th order re-priced +100.00, version 1) — the same
    change-set as the batch upsert query, written once per sf_dir."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"pu4spark_cdc_{tag}")
    marker = os.path.join(d, "_READY")
    if os.path.exists(marker):
        return d
    orders = load_table(spark, "orders", sf_dir)
    base = orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        F.lit(0).alias("version"),
    )
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (
            F.col("o_totalprice").cast("decimal(12,2)")
            + F.lit("100.00").cast("decimal(12,2)")
        )
        .cast("decimal(12,2)")
        .alias("price"),
        F.lit(1).alias("version"),
    )
    write_single_file_shards(d, (("0_base", base), ("1_updates", updates)))
    return d


def merge_batch(
    spark: SparkSession, batch: DataFrame, state_dir: str
) -> None:
    """MERGE one micro-batch into the parquet state: union + keep the
    max-version row per key, write fresh, swap atomically.  Tombstone
    rows (an ``op`` column = 'D'), when the schema carries them, WIN
    their key battle by version and are RETAINED in state — dropping
    them here would let a lower-version upsert replayed out of order
    resurrect a deleted key; consumers filter tombstones at read-out
    (exactly a table format's delete vector awaiting compaction)."""
    cur = read_state(spark, state_dir)
    merged_src = cur.unionByName(batch) if cur is not None else batch
    w = Window.partitionBy(MERGE_KEY).orderBy(F.desc("version"))
    merged = (
        merged_src.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    swap_parquet_state(merged, state_dir)


def q_streaming_upsert_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the CDC landing stream through the foreachBatch MERGE and
    return the per-status totals of the FINAL compacted state — must
    equal the batch upsert oracle exactly."""
    land = _cdc_landing_dir(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(land, "0_base.parquet")).schema
    # one state dir per process (cleared up front), not a fresh uuid per
    # invocation: repeated bench/pytest runs must not accumulate an
    # unbounded set of orders-snapshot directories in the tempdir.  The
    # returned frame lazily re-reads this dir — callers must not delete
    # it before collecting.
    state_dir = _fresh_state_dir("pu4spark_cdc_state", sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    with drain_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _id: merge_batch(spark, df, state_dir)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    out = (
        spark.read.parquet(state_dir)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("version") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_updated"),
            F.sum("price").cast("double").alias("total_price"),
        )
    )
    # NOTE: lazy — the frame re-reads state_dir at action time (the
    # per-process dir persists until the next invocation clears it)
    return out


# -- full MERGE semantics: upserts AND deletes ---------------------------

def _cdc_del_landing_dir(spark: SparkSession, sf_dir: str) -> str:
    """Three-file landing dir for the full-MERGE drain: 0_base (all
    orders, op='U', version 0), 1_updates (every 7th re-priced, op='U',
    version 1), 2_deletes (every 11th order tombstoned, op='D',
    version 2) — written once per sf_dir."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"pu4spark_cdcdel_{tag}")
    marker = os.path.join(d, "_READY")
    if os.path.exists(marker):
        return d
    orders = load_table(spark, "orders", sf_dir)

    def shape(df, version, op):
        return df.select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
            F.lit(version).alias("version"),
            F.lit(op).alias("op"),
        )

    base = shape(orders, 0, "U")
    # decimal-exact re-pricing (same arithmetic as the batch oracle —
    # a double +100.0 before the cast could round differently)
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (
            F.col("o_totalprice").cast("decimal(12,2)")
            + F.lit("100.00").cast("decimal(12,2)")
        )
        .cast("decimal(12,2)")
        .alias("price"),
        F.lit(1).alias("version"),
        F.lit("U").alias("op"),
    )
    deletes = shape(orders.filter(F.col("o_orderkey") % 11 == 0), 2, "D")
    write_single_file_shards(
        d, (("0_base", base), ("1_updates", updates), ("2_deletes", deletes))
    )
    return d


#: full MERGE is the SAME per-batch fold — tombstones are ordinary
#: max-version rows in state (retained so out-of-order replays cannot
#: resurrect a deleted key); the WHEN MATCHED THEN DELETE arm happens
#: at read-out, where consumers filter op != 'D'
merge_batch_with_deletes = merge_batch


def q_streaming_upsert_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the base/updates/deletes CDC stream through the full-MERGE
    foreachBatch; the final snapshot must equal the batch oracle: max-
    version per key, tombstoned keys absent."""
    land = _cdc_del_landing_dir(spark, sf_dir)
    schema = spark.read.parquet(os.path.join(land, "0_base.parquet")).schema
    state_dir = _fresh_state_dir("pu4spark_cdcdel_state", sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    with drain_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _id: merge_batch_with_deletes(spark, df, state_dir)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return (
        spark.read.parquet(state_dir)
        # the WHEN MATCHED THEN DELETE arm: tombstones live in state
        # (replay safety) and drop out of every read
        .filter(F.col("op") != "D")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("version") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_updated"),
            F.sum("price").cast("double").alias("total_price"),
        )
    )


#: batch re-derivation of the same MERGE: delete keys vanish, update
#: keys carry the re-priced value (deletes take precedence — higher
#: version), everything else keeps version 0
SQL_STREAMING_UPSERT_DELETES = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_updated,
       CAST(SUM(CASE WHEN o_orderkey % 7 = 0
                     THEN CAST(o_totalprice AS DECIMAL(12,2))
                          + CAST('100.00' AS DECIMAL(12,2))
                     ELSE CAST(o_totalprice AS DECIMAL(12,2)) END)
            AS DOUBLE) AS total_price
FROM orders
WHERE o_orderkey % 11 <> 0
GROUP BY o_orderstatus
"""


QUERIES = {
    "streaming_upsert_compact": q_streaming_upsert_compact,
    "streaming_upsert_deletes": q_streaming_upsert_deletes,
}
#: the streaming MERGE must agree with the batch compaction oracle
ORACLE_SQL = {
    "streaming_upsert_compact": SQL_ORDERS_UPSERT_COMPACT,
    "streaming_upsert_deletes": SQL_STREAMING_UPSERT_DELETES,
}
