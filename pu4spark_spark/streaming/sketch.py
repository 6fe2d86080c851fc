"""Streaming mergeable-sketch maintenance via ``foreachBatch`` — the
sketch-at-ingest pattern (SURVEY.md §2B streaming row; reference has no
streaming).

Count-Min sketches are LINEAR: sketch(A ∪ B) = sketch(A) + sketch(B)
cell-wise.  So a stream can maintain the corpus-wide sketch by adding
each micro-batch's partial sketch into a persisted d×w counter table —
no token-level state, no rescan of history.  That is the whole point of
sketches at 100 TB: the state carried between batches is the FIXED-SIZE
counter table (2 048 rows here), regardless of how many tokens ever
flowed.

Correctness contract: after draining the sharded landing directory, the
merged table must equal the batch-built sketch over all documents
CELL-FOR-CELL — linearity makes the check exact, so the DuckDB oracle is
the batch sketch SQL itself.  (Same discipline as
``streaming_upsert_compact``: the streaming path and the batch path are
required to agree row-for-row.)

Mechanics mirror ``streaming/upsert.py``: a multi-file landing dir with
``maxFilesPerTrigger=1`` (one shard per micro-batch), parquet state with
an atomic directory swap per merge.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pu4spark_spark.streaming.drain import drain_partitions

from pu4spark_spark.operators.text import (
    CMS_DEPTH,
    CMS_WIDTH,
    _CMS_BUCKETS_SQL,
    cms_sketch_from_counts,
    cms_token_counts,
)
from pu4spark_spark.sources import load_table

#: number of landing-dir shards = number of micro-batches in the drain
N_SHARDS = 3


def _docs_landing_dir(spark: SparkSession, sf_dir: str) -> str:
    """Shard ``documents`` into N_SHARDS parquet files (doc_id mod) so
    the stream reader sees N_SHARDS micro-batches; built once per
    sf_dir."""
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"pu4spark_cms_land_{tag}")
    marker = os.path.join(d, "_READY")
    if os.path.exists(marker):
        return d
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    from pu4spark_spark.streaming.state import write_single_file_shards

    write_single_file_shards(
        d,
        (
            (f"{i}_shard", docs.filter(F.col("doc_id") % N_SHARDS == i))
            for i in range(N_SHARDS)
        ),
    )
    return d


def merge_sketch_batch(
    spark: SparkSession, batch: DataFrame, state_dir: str
) -> None:
    """Add one micro-batch's partial sketch into the persisted counter
    table: union + ONE groupBy(depth, bucket) sum (both inputs are
    ≤ d·w rows — the merge cost is sketch-sized, not data-sized), then
    an atomic directory swap."""
    from pu4spark_spark.streaming.state import read_state, swap_parquet_state

    partial = cms_sketch_from_counts(cms_token_counts(batch))
    cur = read_state(spark, state_dir)
    if cur is not None:
        merged = (
            cur.unionByName(partial)
            .groupBy("depth", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
    else:
        merged = partial
    swap_parquet_state(merged, state_dir)


def q_streaming_cms_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the sharded documents stream, maintaining the Count-Min
    sketch incrementally; return the final merged counter table —
    cell-for-cell equal to the batch sketch by linearity."""
    land = _docs_landing_dir(spark, sf_dir)
    schema = spark.read.parquet(
        os.path.join(land, "0_shard.parquet")
    ).schema
    from pu4spark_spark.streaming.state import fresh_state_dir

    # per-(sf, process) state dir, cleared up front — no uuid leak
    state_dir = fresh_state_dir("pu4spark_cms_state", sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    with drain_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(
                lambda b, _eid: merge_sketch_batch(spark, b, state_dir)
            )
            .option(
                "checkpointLocation",
                os.path.join(state_dir + ".ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return spark.read.parquet(state_dir).select(
        F.col("depth").cast("int").alias("depth"),
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("cnt").cast("bigint").alias("cnt"),
    )


#: the batch sketch over ALL documents — linearity of the sketch makes
#: the streaming merge exactly reproduce it
SQL_STREAMING_CMS_MERGE = f"""
WITH counts AS (
  SELECT token, COUNT(*) AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY token
),
hashed AS (
  SELECT token, n,
         CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h1,
         CAST(('0x' || substr(md5(token), 9, 8)) AS BIGINT) | 1 AS h2
  FROM counts
),
deposits AS (
  SELECT token, n, u.depth AS depth, u.bucket AS bucket
  FROM hashed, UNNEST([{_CMS_BUCKETS_SQL}]) AS t(u)
)
SELECT CAST(depth AS INTEGER) AS depth,
       CAST(bucket AS BIGINT) AS bucket,
       CAST(SUM(n) AS BIGINT) AS cnt
FROM deposits GROUP BY depth, bucket
"""


QUERIES = {
    "streaming_cms_merge": q_streaming_cms_merge,
}

ORACLE_SQL = {
    "streaming_cms_merge": SQL_STREAMING_CMS_MERGE,
}
