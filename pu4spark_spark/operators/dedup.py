"""Deduplication operators for LLM-data pipelines (north-star extension,
SURVEY.md §2B): exact, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup — every variant oracle-checkable because all
hashing goes through md5 (identical in Spark and DuckDB; see
:mod:`pu4spark_spark.functions.textfns`).

Scale design (100 TB):
- exact dedup = one hash-partitioned groupBy on the content hash — the
  only shuffle, map-side combined;
- MinHash signatures/bands are computed array-native per row (no
  shuffle, whole-stage codegen), then ONE shuffle on the band key joins
  candidates; verification joins fetch only candidate docs' shingle
  sets.  This is the classic shingle→minhash→band→bucket-join pipeline;
  cost is O(candidates), never O(n²);
- SimHash reduces each doc to a 32-bit fingerprint via one map-side
  partially-aggregated groupBy; near-dup lookup becomes an equi-join on
  16-bit bands (two per doc) — again never O(n²);
- n-gram Jaccard is *blocked* (lang × shingle-count bucket) so the
  quadratic verify stays within small blocks;
- embedding near-dup quantizes floats to exact integers
  (``floor(x·1000)``) so dot products are associative integer sums —
  partition-order independent AND engine-exact; the pairing is blocked
  by the label column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pu4spark_spark.functions.textfns import (
    jaccard_sets,
    minhash_component,
    sql_jaccard_sets,
    sql_minhash_component,
    sql_word_shingles,
    tokens,
    word_shingles,
)
from pu4spark_spark.sources import load_table

# -- generic exact dedup -------------------------------------------------

def dedup_keep_first(
    df: DataFrame, key_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """Keep the first row per key under a deterministic order — the
    row_number()==1 idiom (SURVEY.md §2B north-star row)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")


def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact text dedup over documents: one group per distinct content
    hash, keeping the smallest doc_id."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


SQL_DEDUP_EXACT_DOCS = """
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""


def q_dedup_events_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup at event granularity: first event per
    (user_id, event_type) by time."""
    events = load_table(spark, "events", sf_dir)
    first = dedup_keep_first(
        events, ["user_id", "event_type"], [F.asc("ts"), F.asc("event_id")]
    )
    return first.select("user_id", "event_type", F.col("event_id").alias("first_event_id"))


SQL_DEDUP_EVENTS_FIRST = """
SELECT user_id, event_type, event_id AS first_event_id
FROM (SELECT user_id, event_type, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts ASC, event_id ASC) AS rn
      FROM events)
WHERE rn = 1
"""


# -- MinHash + LSH near-dup ---------------------------------------------

N_HASHES = 8
BAND_R = 2  # rows per band → 4 bands
JACCARD_THRESHOLD = 0.5

_SH_SQL = sql_word_shingles("text")


def _doc_shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pu4spark_spark.plans import spread

    docs = spread(load_table(spark, "documents", sf_dir))
    return docs.select(
        "doc_id",
        "lang",
        F.array_distinct(word_shingles(tokens("text"))).alias("sh"),
    )


def minhash_bands(df: DataFrame, shingle_col: str = "sh") -> DataFrame:
    """doc_id → (band_pos, band_hash), 4 rows per doc.  Signatures are
    per-row array ops; the band hash compresses BAND_R signature
    components so bucket equality ⇒ those components all collide."""
    sh = F.col(shingle_col)
    sigs = [minhash_component(sh, i) for i in range(N_HASHES)]
    bands = [
        F.md5(
            F.concat_ws(":", F.lit(str(b)), *sigs[b * BAND_R : (b + 1) * BAND_R])
        )
        for b in range(N_HASHES // BAND_R)
    ]
    return df.select(
        "doc_id",
        F.posexplode(F.array(*bands)).alias("band_pos", "band_hash"),
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: MinHash-LSH candidates (any shared band) verified
    with exact shingle-set Jaccard ≥ 0.5."""
    from pu4spark_spark.plans import cached

    # the shingle-set table feeds three consumers (band explode + both
    # verify joins) — persist it once instead of re-shingling per use
    base = cached(_doc_shingle_sets(spark, sf_dir))
    bands = cached(minhash_bands(base))
    left = bands.alias("a")
    right = bands.alias("b")
    cand = (
        left.join(
            right,
            (F.col("a.band_pos") == F.col("b.band_pos"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    sa = base.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sh_a"))
    sb = base.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", jaccard_sets(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("a_id", "b_id", "jaccard")
    )


def _sql_minhash_bands() -> str:
    sigs = [sql_minhash_component("sh", i) for i in range(N_HASHES)]
    bands = ", ".join(
        "md5("
        + " || ':' || ".join([f"'{b}'"] + sigs[b * BAND_R : (b + 1) * BAND_R])
        + f") AS band{b}"
        for b in range(N_HASHES // BAND_R)
    )
    return bands


SQL_DEDUP_MINHASH = f"""
WITH base AS (
  SELECT doc_id, list_distinct({_SH_SQL}) AS sh FROM documents
),
sigs AS (
  SELECT doc_id, sh, {_sql_minhash_bands()} FROM base
),
bands AS (
  SELECT doc_id, u.band_pos, u.band_hash
  FROM sigs, UNNEST([
      {{'band_pos': 0, 'band_hash': band0}},
      {{'band_pos': 1, 'band_hash': band1}},
      {{'band_pos': 2, 'band_hash': band2}},
      {{'band_pos': 3, 'band_hash': band3}}]) AS t(u)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band_pos = b.band_pos AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
)
SELECT a_id, b_id,
       {sql_jaccard_sets('sa.sh', 'sb.sh')} AS jaccard
FROM cand
JOIN base sa ON sa.doc_id = a_id
JOIN base sb ON sb.doc_id = b_id
WHERE {sql_jaccard_sets('sa.sh', 'sb.sh')} >= {JACCARD_THRESHOLD}
"""


# -- SimHash fingerprint -------------------------------------------------

SIMHASH_BITS = 32  # 8 md5 hex nibbles


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """32-bit SimHash per doc: explode tokens, sum per-bit ±1
    contributions (map-side combined), threshold sums to bits.

    Contribution of token t to bit j: +1 if bit j of md5(t)'s first 8
    nibbles is set else −1; bit j of the fingerprint is 1 iff the sum is
    positive.  One shuffle on doc_id; 32 conditional sums.
    """
    from pu4spark_spark.plans import spread

    tok = spread(docs).select("doc_id", F.explode(tokens("text")).alias("t"))
    tok = tok.withColumn("h", F.md5(F.col("t")))
    # nibble value for hex char i (1-based) via conv-free arithmetic:
    # ascii('0'..'9') → 48..57; 'a'..'f' → 97..102
    def nib(i: int) -> Column:
        a = F.ascii(F.substring(F.col("h"), i, 1))
        return F.when(a <= 57, a - 48).otherwise(a - 87)

    sums = [
        F.sum(
            (F.shiftright(nib(j // 4 + 1), j % 4).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = tok.groupBy("doc_id").agg(*sums)
    fingerprint = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return per_doc.select("doc_id", fingerprint.alias("simhash"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return simhash_fingerprints(docs)


def _sql_simhash_core() -> str:
    nib = (
        "(CASE WHEN ascii(substr(h, {i}, 1)) <= 57"
        " THEN ascii(substr(h, {i}, 1)) - 48"
        " ELSE ascii(substr(h, {i}, 1)) - 87 END)"
    )
    sums = ",\n         ".join(
        f"SUM((({nib.format(i=j // 4 + 1)} >> {j % 4}) & 1) * 2 - 1) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""
tok AS (
  SELECT doc_id, md5(u.t) AS h
  FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
),
persum AS (
  SELECT doc_id,
         {sums}
  FROM tok GROUP BY doc_id
),
fp AS (SELECT doc_id, {fp} AS simhash FROM persum)
"""


SQL_DEDUP_SIMHASH = f"""
WITH {_sql_simhash_core()}
SELECT doc_id, simhash FROM fp
"""


def q_dedup_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs sharing an identical 32-bit SimHash — hamming-0 duplicate
    groups (band-join generalizes to hamming ≤ k at scale)."""
    fp = q_dedup_simhash(spark, sf_dir)
    return (
        fp.groupBy("simhash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


SQL_DEDUP_SIMHASH_GROUPS = f"""
WITH {_sql_simhash_core()}
SELECT simhash, MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
FROM fp GROUP BY simhash HAVING COUNT(*) > 1
"""


# -- blocked n-gram Jaccard ---------------------------------------------

NGRAM_JACCARD_THRESHOLD = 0.3


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise 3-gram Jaccard within (lang, shingle-count-bucket)
    blocks — the quadratic verify is confined to small blocks; standard
    blocking tradeoff: near-dups straddling a bucket boundary are missed.
    """
    from pu4spark_spark.plans import cached

    base = cached(
        _doc_shingle_sets(spark, sf_dir).withColumn(
            "bucket", F.floor(F.size("sh") / 10).cast("int")
        )
    )
    a = base.select(
        F.col("doc_id").alias("a_id"),
        F.col("lang").alias("l"),
        F.col("bucket").alias("bk"),
        F.col("sh").alias("sh_a"),
    )
    b = base.select(
        F.col("doc_id").alias("b_id"),
        F.col("lang").alias("l"),
        F.col("bucket").alias("bk"),
        F.col("sh").alias("sh_b"),
    )
    return (
        a.join(b, ["l", "bk"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("jaccard", jaccard_sets(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= NGRAM_JACCARD_THRESHOLD)
        .select("a_id", "b_id", "jaccard")
    )


SQL_DEDUP_NGRAM_JACCARD = f"""
WITH base AS (
  SELECT doc_id, lang,
         list_distinct({_SH_SQL}) AS sh,
         CAST(floor(len(list_distinct({_SH_SQL})) / 10) AS INTEGER) AS bucket
  FROM documents
)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       {sql_jaccard_sets('a.sh', 'b.sh')} AS jaccard
FROM base a JOIN base b
  ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id
WHERE {sql_jaccard_sets('a.sh', 'b.sh')} >= {NGRAM_JACCARD_THRESHOLD}
"""


# -- embedding-cosine near-dup ------------------------------------------

from pu4spark_spark.functions.vectors import QUANT, int_dot, quantized  # noqa: E402

COSINE_DUP_THRESHOLD = 0.4


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical embedding pairs (quantized cosine ≥ 0.99), blocked
    by the label column."""
    from pu4spark_spark.plans import cached, spread

    emb = spread(load_table(spark, "embeddings", sf_dir))
    base = cached(
        emb.select(
            "vec_id", "label", quantized(F.col("embedding")).alias("q")
        ).withColumn("norm2", int_dot(F.col("q"), F.col("q")))
    )
    a = base.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("lab"),
        F.col("q").alias("qa"),
        F.col("norm2").alias("na"),
    )
    b = base.select(
        F.col("vec_id").alias("b_id"),
        F.col("label").alias("lab"),
        F.col("q").alias("qb"),
        F.col("norm2").alias("nb"),
    )
    cos = int_dot(F.col("qa"), F.col("qb")) / (
        F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))
    )
    return (
        a.join(b, "lab")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
        .select("a_id", "b_id", "cosine")
    )


SQL_DEDUP_EMBEDDING_COSINE = f"""
WITH base AS (
  SELECT vec_id, label,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {QUANT}) AS BIGINT)) AS q
  FROM embeddings
),
normed AS (
  SELECT vec_id, label, q, list_dot_product(q, q) AS norm2 FROM base
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       list_dot_product(a.q, b.q) / (sqrt(a.norm2) * sqrt(b.norm2)) AS cosine
FROM normed a JOIN normed b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.q, b.q) / (sqrt(a.norm2) * sqrt(b.norm2))
      >= {COSINE_DUP_THRESHOLD}
"""


# -- Spark ML MinHashLSH (built-in scale path; rows-only) ----------------

def q_dedup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in ``ml.feature.MinHashLSH`` pipeline over hashed token
    vectors (``approxSimilarityJoin``) — Spark's native LSH engine;
    rows-only check (UDT/estimator internals aren't SQL-expressible)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = load_table(spark, "documents", sf_dir)
    tok_df = docs.select("doc_id", tokens("text").alias("toks"))
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=1 << 14, binary=True)
    feat = tf.transform(tok_df)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a_id"),
            F.col("datasetB.doc_id").alias("b_id"),
            F.col("jaccard_dist"),
        )
    )


QUERIES = {
    "dedup_exact_docs": q_dedup_exact_docs,
    "dedup_events_first": q_dedup_events_first,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_groups": q_dedup_simhash_groups,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "dedup_minhash_ml": q_dedup_minhash_ml,
}

ORACLE_SQL = {
    "dedup_exact_docs": SQL_DEDUP_EXACT_DOCS,
    "dedup_events_first": SQL_DEDUP_EVENTS_FIRST,
    "dedup_minhash_lsh": SQL_DEDUP_MINHASH,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "dedup_simhash_groups": SQL_DEDUP_SIMHASH_GROUPS,
    "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
    "dedup_embedding_cosine": SQL_DEDUP_EMBEDDING_COSINE,
    # dedup_minhash_ml: ML UDT internals — rows-only
}
