"""Streaming dedup-at-ingest: each arriving micro-batch of documents
probes the PRECOMPUTED bucketed corpus band artifact
(:func:`pu4spark_spark.operators.dedup.ensure_band_artifacts`) and
appends verified near-dup pairs to a parquet sink — the 100 TB arrival
pattern run as a STREAM instead of a scheduled batch.

Scale shape: all stateful relational work (the signature groupBy, the
candidate ``distinct``, the verify joins) happens INSIDE ``foreachBatch``
with full batch semantics over the batch-sized micro-batch, so the
streaming engine itself carries ZERO state (no watermark, no state
store); the corpus side is only ever touched through the bucketed
artifact tables, whose layout serves the band join with no corpus-side
exchange.  The sink is an append-only parquet directory — no row ever
passes through the driver.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pu4spark_spark.streaming.drain import drain_partitions


def _docs_stream_dir(sf_dir: str) -> str:
    """Landing directory with a symlink to the (read-only) documents
    file — the shared dangling-link-safe builder (ADVICE r4)."""
    from pu4spark_spark.streaming.landing import symlink_landing_dir

    return symlink_landing_dir(f"{sf_dir}/documents.parquet", "pu4spark_docs")


def probe_micro_batch(
    spark: SparkSession,
    batch: DataFrame,
    bands_tbl: str,
    sh_tbl: str,
    out_dir: str,
) -> None:
    """One micro-batch of arriving docs → verified near-dup pairs vs the
    corpus artifact, appended to the parquet sink.  Batch-sized work
    only: the corpus is touched through its bucketed tables."""
    from pu4spark_spark.functions.textfns import (
        jaccard_sets,
        tokens,
        word_shingles,
    )
    from pu4spark_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        minhash_bands,
        probe_band_candidates,
    )
    from pu4spark_spark.plans import cached, spread

    shingled = cached(
        spread(batch).select(
            "doc_id",
            F.array_distinct(word_shingles(tokens("text"))).alias("sh"),
        )
    )
    try:
        cand = probe_band_candidates(
            minhash_bands(shingled), spark.table(bands_tbl)
        )
        sa = shingled.select(
            F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b")
        )
        sc = spark.table(sh_tbl).select(
            F.col("doc_id").alias("c_id"), F.col("sh").alias("sh_c")
        )
        out = (
            cand.join(sa, "b_id")
            .join(sc, "c_id")
            .withColumn("jaccard", jaccard_sets(F.col("sh_b"), F.col("sh_c")))
            .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
            .select("b_id", "c_id", "jaccard")
        )
        out.write.mode("append").parquet(out_dir)
    finally:
        shingled.unpersist()


def q_streaming_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the document landing stream through the foreachBatch probe
    and return the appended pair sink — must equal the batch
    ``dedup_band_artifact_probe`` oracle exactly (same batch split:
    ``doc_id % INCR_BATCH_MOD == 0`` plays the arriving docs, the rest
    are the corpus behind the bucketed artifact)."""
    from pu4spark_spark.operators.dedup import (
        INCR_BATCH_MOD,
        ensure_band_artifacts,
    )

    bands_tbl, sh_tbl = ensure_band_artifacts(spark, sf_dir)
    land = _docs_stream_dir(sf_dir)
    schema = spark.read.parquet(land).schema
    base = os.path.join(
        tempfile.gettempdir(),
        # per-process suffix: concurrent sessions (bench + pytest)
        # must not rmtree each other's live out/ckpt dirs (ADVICE r4)
        f"pu4spark_ingest_dedup_{hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]}_{os.getpid()}",
    )
    # fresh run each invocation: the checkpoint would otherwise treat
    # the (static) fixture as already-processed and append nothing
    shutil.rmtree(base, ignore_errors=True)
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
        .filter(F.col("doc_id") % INCR_BATCH_MOD == 0)
        .select("doc_id", "text")
    )
    with drain_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _id: probe_micro_batch(
                    spark, df, bands_tbl, sh_tbl, out_dir
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return spark.read.parquet(out_dir)


def q_streaming_lang_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-routed streaming ingest: arriving documents stream into
    a parquet sink PARTITIONED BY ``lang`` (``writeStream.partitionBy``)
    — the landing layout that makes every later per-language job a
    partition-pruned scan (the hash-split/temperature-mix consumers
    never touch other languages' files).  Stateless (pure routing: no
    watermark, no state store); exactly-once via checkpoint + sink
    commit log.  The result re-reads the committed sink and reports
    per-language doc and token counts — which must equal the batch
    aggregate exactly, value-checking that routing loses or duplicates
    nothing."""
    base = os.path.join(
        tempfile.gettempdir(),
        f"pu4spark_lang_router_{hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]}_{os.getpid()}",
    )
    shutil.rmtree(base, ignore_errors=True)
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    land = _docs_stream_dir(sf_dir)
    schema = spark.read.parquet(land).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
        .select("doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens"))
    )
    with drain_partitions(spark):
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .partitionBy("lang")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    routed = spark.read.parquet(out_dir)
    return routed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


SQL_STREAMING_LANG_ROUTER = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM documents
GROUP BY lang
"""


def q_streaming_quality_router(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MULTI-SINK streaming routing: each arriving micro-batch is
    quality-gated ONCE and fanned out to TWO parquet sinks in the same
    ``foreachBatch`` — kept docs to the corpus landing dir, rejects
    (with their first-match drop reason, the ``pipeline_drop_reasons``
    rule) to a quarantine dir.  This is the ingest topology every
    curation pipeline actually runs (accepted data forward, rejects
    kept for audit, ONE pass over the bytes) and the pattern a single
    ``writeStream`` sink cannot express; the micro-batch is persisted
    so the expensive quality projection evaluates once, not per sink.

    Stateless (no watermark/state store).  The result re-reads BOTH
    sinks and reports (route, reason, lang) counts — the oracle
    re-derives them from the parquet truth, so routing that loses,
    duplicates, or misclassifies one row hash-mismatches; losslessness
    and disjointness are additionally pinned in pytest."""
    from pu4spark_spark.functions.textfns import tokens
    from pu4spark_spark.operators.pipeline import (
        MIN_QUALITY,
        MIN_TOKENS,
        _quality_score,
    )

    base = os.path.join(
        tempfile.gettempdir(),
        f"pu4spark_qrouter_{hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]}_{os.getpid()}",
    )
    shutil.rmtree(base, ignore_errors=True)
    kept_dir = os.path.join(base, "kept")
    quar_dir = os.path.join(base, "quarantine")
    ckpt = os.path.join(base, "ckpt")
    land = _docs_stream_dir(sf_dir)
    schema = spark.read.parquet(land).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
        .select("doc_id", "lang", "text")
    )

    def route(df: DataFrame, batch_id: int) -> None:
        tok = tokens("text")
        scored = df.select(
            "doc_id",
            "lang",
            F.size(tok).alias("n_tokens"),
            _quality_score(tok).alias("quality_score"),
        ).withColumn(
            "reason",
            F.when(F.col("n_tokens") < MIN_TOKENS, F.lit("too_short"))
            .when(
                F.col("quality_score") < MIN_QUALITY, F.lit("low_quality")
            )
            .otherwise(F.lit("kept")),
        ).persist()
        # foreachBatch is at-least-once: a crash between the two sink
        # writes replays the micro-batch.  Each write therefore targets
        # a per-batch subdirectory (partition-style `batch_id=N`) in
        # OVERWRITE mode — the retry clobbers its own partial output
        # instead of appending duplicates, making the fan-out
        # effectively exactly-once without a transactional sink.
        try:
            (
                scored.filter(F.col("reason") == "kept")
                .drop("reason")
                .write.mode("overwrite")
                .parquet(os.path.join(kept_dir, f"batch_id={batch_id}"))
            )
            (
                scored.filter(F.col("reason") != "kept")
                .write.mode("overwrite")
                .parquet(os.path.join(quar_dir, f"batch_id={batch_id}"))
            )
        finally:
            scored.unpersist()

    with drain_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(route)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    kept = (
        spark.read.parquet(kept_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.lit("kept").alias("route"),
            F.lit("kept").alias("reason"),
            "lang",
            "n_docs",
        )
    )
    quar = (
        spark.read.parquet(quar_dir)
        .groupBy("reason", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.lit("quarantine").alias("route"), "reason", "lang", "n_docs")
    )
    return kept.unionByName(quar)


def _sql_quality_router() -> str:
    from pu4spark_spark.operators.pipeline import (
        _STOP_IN,
        MIN_QUALITY,
        MIN_TOKENS,
    )

    return f"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST(len(ws) AS INTEGER) AS n_tokens,
         0.4 * least(CAST(len(ws) AS DOUBLE) / 50.0, 1.0)
         + 0.3 * (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws))
         + 0.3 * (1.0 - CAST(len(list_filter(ws, t -> t IN ({_STOP_IN}))) AS DOUBLE) / len(ws))
           AS quality_score
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents)
),
labeled AS (
  SELECT lang,
         CASE WHEN n_tokens < {MIN_TOKENS} THEN 'too_short'
              WHEN quality_score < {MIN_QUALITY} THEN 'low_quality'
              ELSE 'kept' END AS reason
  FROM scored
)
SELECT CASE WHEN reason = 'kept' THEN 'kept' ELSE 'quarantine' END AS route,
       reason, lang, COUNT(*) AS n_docs
FROM labeled
GROUP BY 1, 2, 3
"""


#: identical contract to the batch artifact probe — the stream must
#: reproduce it bit-for-bit
def _probe_sql() -> str:
    from pu4spark_spark.operators.dedup import SQL_DEDUP_BAND_ARTIFACT_PROBE

    return SQL_DEDUP_BAND_ARTIFACT_PROBE


SQL_STREAMING_INGEST_DEDUP = _probe_sql()
SQL_STREAMING_QUALITY_ROUTER = _sql_quality_router()

QUERIES = {
    "streaming_ingest_dedup": q_streaming_ingest_dedup,
    "streaming_lang_router": q_streaming_lang_router,
    "streaming_quality_router": q_streaming_quality_router,
}

ORACLE_SQL = {
    "streaming_ingest_dedup": SQL_STREAMING_INGEST_DEDUP,
    "streaming_lang_router": SQL_STREAMING_LANG_ROUTER,
    "streaming_quality_router": SQL_STREAMING_QUALITY_ROUTER,
}
