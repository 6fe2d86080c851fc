"""Corpus-curation operators for LLM-data pipelines (north-star
extension, SURVEY.md §2B): PII redaction, test-set decontamination,
deterministic domain-mixture sampling, token-budget shard packing, and
intra-document repetition statistics.

These are the cleaning/packaging stages a pretraining pipeline runs
after dedup (operators/dedup.py) and quality scoring (operators/text.py).
Every operator is pure Catalyst (no UDFs) and deterministic, so each is
oracle-checkable against DuckDB.

Scale notes (100 TB):
- redaction / repetition / packing are per-row or per-group — no global
  state, shuffles only on (doc_id, gram) or (lang) keys with map-side
  combine;
- decontamination broadcasts the benchmark shingle set (test sets are
  small by construction) so the contamination probe is a broadcast
  semi-probe + one groupBy(doc_id) shuffle;
- mixture sampling is a stateless hash filter — evaluates inside the
  scan, fully pushdown-friendly, no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pu4spark_spark.functions.textfns import (
    nibble,
    sql_nibble,
    sql_word_shingles,
    tokens,
    word_shingles,
)
from pu4spark_spark.operators.text import SQL_QSCORE as _SQL_QSCORE
from pu4spark_spark.sources import load_table

# -- PII / sensitive-term redaction --------------------------------------

#: patterns use the common RE2 ⊆ Java-regex subset so Spark (Java regex)
#: and DuckDB (RE2) match identically
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
#: fixture text is word soup without emails/IPs, so a term denylist
#: ("secret-like" tokens) exercises the replace path on real matches
SECRET_TERMS_RE = r"\b(hash|key)\b"
REDACTED = "[REDACTED]"


def q_curation_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count PII-pattern hits and produce the scrubbed text's md5 — the
    standard pre-release redaction pass.  Pure per-row regex work: at
    100 TB this runs inside the scan stage, zero shuffle."""
    docs = load_table(spark, "documents", sf_dir)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, REDACTED),
            IPV4_RE,
            REDACTED,
        ),
        SECRET_TERMS_RE,
        REDACTED,
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), 0)).alias(
            "n_email"
        ),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(IPV4_RE), 0)).alias(
            "n_ipv4"
        ),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(SECRET_TERMS_RE), 0)
        ).alias("n_secret"),
        F.length(scrubbed).alias("redacted_len"),
        F.md5(scrubbed).alias("redacted_md5"),
    )


SQL_PII_REDACT = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INTEGER) AS n_email,
       CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS INTEGER) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '{SECRET_TERMS_RE}')) AS INTEGER) AS n_secret,
       CAST(length(scrubbed) AS INTEGER) AS redacted_len,
       md5(scrubbed) AS redacted_md5
FROM (
  SELECT doc_id,
         text,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{EMAIL_RE}', '{REDACTED}', 'g'),
             '{IPV4_RE}', '{REDACTED}', 'g'),
           '{SECRET_TERMS_RE}', '{REDACTED}', 'g') AS scrubbed
  FROM documents)
"""


# -- test-set decontamination --------------------------------------------

#: every MOD-th doc is the held-out "benchmark" set; the rest is the
#: training corpus to be decontaminated against it
BENCH_MOD = 25
#: word n-gram size for the overlap probe (5-grams are the usual
#: published decontamination unit; long enough to be meaningful even in
#: a small fixture vocabulary)
CONTAM_N = 5
#: a training doc sharing at least this many distinct benchmark shingles
#: is flagged
CONTAM_THRESHOLD = 3


def q_curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training documents whose word 5-grams overlap the held-out
    benchmark set — published-benchmark decontamination.

    Plan shape: the benchmark shingle set is DISTINCT'd and broadcast
    (test sets are fixed-size, not corpus-proportional at 100 TB); the
    training side explodes per-doc distinct shingles, probes the
    broadcast, and aggregates hits per doc — one groupBy(doc_id)
    shuffle with map-side combine, then a plain left join back so
    untainted docs report 0.  The report-back join carries NO
    broadcast hint: ``hits`` is usually tiny but worst-case
    corpus-proportional (every doc contaminated), so the hint is AQE's
    call, not a hard-coded driver broadcast.
    """
    from pu4spark_spark.plans import cached

    docs = load_table(spark, "documents", sf_dir)
    # stage tokens before shingling, then MATERIALIZE the distinct
    # shingle arrays before any explode: Generate inlines an
    # interpreted HOF child and re-evaluates it per OUTPUT row (per
    # shingle), so an uncached explode(word_shingles(...)) is
    # quadratic per doc — the same lesson as the KMV sketch (measured
    # 1.2 s → 0.5 s here at sf0.1); both explodes below read the
    # materialized arrays
    toked = docs.select("doc_id", tokens("text").alias("__t"))
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    arr = cached(
        toked.select(
            "doc_id",
            is_bench.alias("__b"),
            F.array_distinct(word_shingles(F.col("__t"), CONTAM_N)).alias(
                "__sh"
            ),
        )
    )

    bench_sh = (
        arr.filter("__b").select(F.explode("__sh").alias("sh")).distinct()
    )
    train = arr.filter(~F.col("__b"))
    hits = (
        train.select("doc_id", F.explode("__sh").alias("sh"))
        .join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contam"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_contam"), F.lit(0))
            .cast("int")
            .alias("n_contam"),
        )
        .withColumn("flagged", F.col("n_contam") >= CONTAM_THRESHOLD)
    )


_SH = sql_word_shingles("text", CONTAM_N)

SQL_DECONTAMINATE = f"""
WITH bench AS (
  SELECT DISTINCT unnest(list_distinct({_SH})) AS sh
  FROM documents WHERE doc_id % {BENCH_MOD} = 0
),
train AS (
  SELECT doc_id, list_distinct({_SH}) AS shs
  FROM documents WHERE doc_id % {BENCH_MOD} <> 0
),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_contam
  FROM (SELECT doc_id, unnest(shs) AS sh FROM train) t
  JOIN bench USING (sh)
  GROUP BY t.doc_id
)
SELECT train.doc_id,
       CAST(coalesce(hits.n_contam, 0) AS INTEGER) AS n_contam,
       coalesce(hits.n_contam, 0) >= {CONTAM_THRESHOLD} AS flagged
FROM train LEFT JOIN hits USING (doc_id)
"""


# -- Bloom-filter decontamination (the 100 TB shape) ----------------------

#: bloom geometry: 2^18 bits in 32-bit words (8192 words ≈ 32 KB), 4
#: probes per key via Kirsch-Mitzenmacher double hashing — h_i = h1 +
#: i·h2 (mod m) from the two md5 halves, so ONE digest per shingle
#: covers all probes.  At a real benchmark size (say 10M shingles)
#: m=2^27 keeps the same ~1% FP rate in a 16 MB broadcast — the
#: geometry scales by widening m, never by rehashing the corpus.
BLOOM_BITS = 1 << 18
BLOOM_WORDS = BLOOM_BITS >> 5
BLOOM_K = 4


def _bloom_positions(sh: Column) -> Column:
    """Array of BLOOM_K bit positions for one shingle — the shared
    Kirsch–Mitzenmacher double hash (see ``textfns.km_positions`` for
    the overflow/odd-stride invariants, shared with the CMS buckets)."""
    from pu4spark_spark.functions.textfns import km_positions

    return km_positions(sh, BLOOM_K, BLOOM_BITS)


def _sql_bloom_positions(sh_expr: str) -> str:
    terms = ", ".join(
        f"(h1 + {i} * h2) % {BLOOM_BITS}" for i in range(BLOOM_K)
    )
    return (
        f"(SELECT [{terms}] FROM (SELECT"
        f" CAST(('0x' || substr(md5({sh_expr}), 1, 8)) AS BIGINT) AS h1,"
        f" CAST(('0x' || substr(md5({sh_expr}), 9, 8)) AS BIGINT) | 1 AS h2))"
    )


def q_curation_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination through a DISTRIBUTED Bloom filter —
    the shape that survives a benchmark set too large to broadcast as
    raw shingles.  ``q_curation_decontaminate`` broadcasts the exact
    shingle strings (fine for fixed test sets, ~GBs for a 10M-doc
    benchmark suite); this variant compresses the same membership into
    a 32 KB bit table, built and probed entirely with DataFrame ops:

    1. build — benchmark shingles explode to (word, bit-mask) pairs,
       one ``groupBy(word).agg(bit_or)`` makes the bloom a BLOOM_WORDS-
       row table (fixed size, independent of corpus OR benchmark
       cardinality — the aggregation's map-side combine reduces each
       partition to ≤ BLOOM_WORDS rows before the exchange);
    2. probe — training shingles compute the same BLOOM_K positions,
       broadcast-join the word table, and a shingle counts as a maybe-
       hit iff ALL K probed bits are set; per-doc maybe-hit counts
       mirror the exact variant's ``n_contam``.

    False positives are INTENTIONAL bloom semantics (rate (1-e^{-kn/m})^k
    ≈ 1% here) and — because both engines run the identical md5 double-
    hash arithmetic — bit-identical across Spark and DuckDB, so the
    oracle hash-checks the false positives too, not just the exact hits.
    Spark's own runtime shuffle-pruning blooms (spark.sql.optimizer.
    runtime.bloomFilter) use this exact aggregate-then-reuse pattern.
    """
    from pu4spark_spark.plans import cached, spread

    # spread() the single-file scan: the md5 double-hash per (shingle,
    # probe) below is the dominant per-row cost and must fan out.
    # Materialize the distinct shingle arrays before the explodes —
    # Generate re-evaluates an interpreted-HOF child per output row
    # (the KMV lesson), so both shingle explodes read cached arrays
    docs = spread(load_table(spark, "documents", sf_dir))
    toked = docs.select("doc_id", tokens("text").alias("__t"))
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    arr = cached(
        toked.select(
            "doc_id",
            is_bench.alias("__b"),
            F.array_distinct(word_shingles(F.col("__t"), CONTAM_N)).alias(
                "__sh"
            ),
        )
    )

    def positions(frame: DataFrame) -> DataFrame:
        return frame.withColumn(
            "pos", F.explode(_bloom_positions(F.col("sh")))
        ).select(
            *frame.columns,
            F.shiftright(F.col("pos"), 5).alias("word"),
            # shiftleft's bit-count arg must be a Column-free literal in
            # the python API — spell the expression in SQL
            F.expr(
                "cast(shiftleft(cast(1 as bigint),"
                " cast(pos % 32 as int)) as bigint)"
            ).alias("mask"),
        )

    bench_sh = (
        arr.filter("__b").select(F.explode("__sh").alias("sh")).distinct()
    )
    bloom = (
        positions(bench_sh)
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    train = arr.filter(~F.col("__b"))
    train_sh = train.select("doc_id", F.explode("__sh").alias("sh"))
    maybe_hits = (
        positions(train_sh)
        .join(F.broadcast(bloom), "word")
        .withColumn(
            "bit_set",
            (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")),
        )
        .groupBy("doc_id", "sh")
        .agg(F.sum(F.col("bit_set").cast("int")).alias("n_set"))
        .filter(F.col("n_set") == BLOOM_K)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contam"))
    )
    return (
        train.select("doc_id")
        .join(maybe_hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_contam"), F.lit(0))
            .cast("int")
            .alias("n_contam"),
        )
        .withColumn("flagged", F.col("n_contam") >= CONTAM_THRESHOLD)
    )


SQL_BLOOM_DECONTAMINATE = f"""
WITH bench AS (
  SELECT DISTINCT unnest(list_distinct({_SH})) AS sh
  FROM documents WHERE doc_id % {BENCH_MOD} = 0
),
bench_pos AS (
  SELECT u.pos // 32 AS word, (1::BIGINT << (u.pos % 32)) AS mask
  FROM (SELECT sh, unnest({_sql_bloom_positions('sh')}) AS pos FROM bench) u(sh, pos)
),
bloom AS (SELECT word, bit_or(mask) AS bits FROM bench_pos GROUP BY word),
train AS (
  SELECT doc_id, list_distinct({_SH}) AS shs
  FROM documents WHERE doc_id % {BENCH_MOD} <> 0
),
train_sh AS (SELECT doc_id, unnest(shs) AS sh FROM train),
probe AS (
  SELECT doc_id, sh, pos // 32 AS word, (1::BIGINT << (pos % 32)) AS mask
  FROM (SELECT doc_id, sh, unnest({_sql_bloom_positions('sh')}) AS pos
        FROM train_sh)
),
maybe AS (
  SELECT doc_id, sh
  FROM probe JOIN bloom USING (word)
  GROUP BY doc_id, sh
  HAVING SUM(CASE WHEN (bits & mask) = mask THEN 1 ELSE 0 END) = {BLOOM_K}
),
hits AS (SELECT doc_id, COUNT(*) AS n_contam FROM maybe GROUP BY doc_id)
SELECT train.doc_id,
       CAST(coalesce(hits.n_contam, 0) AS INTEGER) AS n_contam,
       coalesce(hits.n_contam, 0) >= {CONTAM_THRESHOLD} AS flagged
FROM train LEFT JOIN hits USING (doc_id)
"""


# -- deterministic domain-mixture sampling --------------------------------

#: per-language keep rates in per-mille — the "domain mixture weights"
#: of a pretraining recipe
MIX_PER_MILLE = {"en": 900, "es": 700, "de": 500, "fr": 300, "zh": 100}
#: Knuth multiplicative hash on the pre-reduced id: 1000003 * 2654435761
#: < 2^52, so the product is exact int64 in both engines
_KNUTH = 2654435761
_PREMOD = 1000003


def _keep(doc_id: Column) -> Column:
    return ((doc_id % _PREMOD) * _KNUTH) % 1000


def q_curation_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Bernoulli sampling with deterministic hash coins —
    reproducible domain mixing (every run, every engine draws the same
    sample; no RNG state to coordinate across 1000 executors).

    The keep-filter is a stateless row predicate: it evaluates inside
    the scan stage (pushdown-friendly), needs no shuffle, and the final
    per-language report is one map-side-combined groupBy(lang)."""
    docs = load_table(spark, "documents", sf_dir)
    coin = _keep(F.col("doc_id"))
    rate = None
    for lang, pm in MIX_PER_MILLE.items():
        rate = (
            F.when(F.col("lang") == lang, pm)
            if rate is None
            else rate.when(F.col("lang") == lang, pm)
        )
    rate = rate.otherwise(F.lit(0))
    return (
        docs.select("lang", (coin < rate).cast("int").alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_sampled"),
            (F.sum("kept").cast("double") / F.count(F.lit(1))).alias(
                "achieved_rate"
            ),
        )
    )


_RATE_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_PER_MILLE.items())
    + " ELSE 0 END"
)

SQL_DOMAIN_MIX = f"""
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(kept) AS BIGINT) AS n_sampled,
       CAST(SUM(kept) AS DOUBLE) / COUNT(*) AS achieved_rate
FROM (
  SELECT lang,
         CASE WHEN ((doc_id % {_PREMOD}) * {_KNUTH}) % 1000 < {_RATE_CASE}
              THEN 1 ELSE 0 END AS kept
  FROM documents)
GROUP BY lang
"""


# -- token-budget shard packing ------------------------------------------

#: target tokens per output shard (tiny for the fixture; the operator
#: shape is budget-independent)
SHARD_TOKEN_BUDGET = 2000


def q_curation_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into fixed-token-budget shards: within each
    language, a running token total in doc_id order assigns
    ``shard_id = floor(tokens_before_doc / budget)`` — the layout step
    that turns a cleaned corpus into training shards.

    Scale shape: the running sum is a window PARTITIONED BY lang (or any
    balanced partition key at 100 TB — never a global ORDER BY), so each
    partition packs independently; the shard report is one further
    map-side-combined groupBy."""
    docs = load_table(spark, "documents", sf_dir)
    nt = F.size(tokens("text"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_shard = docs.select(
        "lang", "doc_id", nt.alias("nt")
    ).withColumn(
        "shard_id",
        F.floor((F.sum("nt").over(w) - F.col("nt")) / SHARD_TOKEN_BUDGET),
    )
    return with_shard.groupBy("lang", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("bigint").alias("shard_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


SQL_SHARD_PACK = f"""
WITH sized AS (
  SELECT lang, doc_id, len(string_split(text, ' ')) AS nt
  FROM documents
),
packed AS (
  SELECT lang, doc_id, nt,
         CAST(floor((SUM(nt) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - nt)
                    / {SHARD_TOKEN_BUDGET}) AS BIGINT) AS shard_id
  FROM sized
)
SELECT lang, shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS shard_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY lang, shard_id
"""


#: training context length for the sequence-packing audit
SEQ_LEN = 512


def q_curation_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-PACKING audit — the final pretraining data-prep step:
    the per-language token stream (doc_id order) is conceptually
    concatenated and cut every ``SEQ_LEN`` tokens (GPT-style
    concat-and-split packing), and each resulting training sequence is
    profiled: how many documents touch it (attention fragmentation),
    how many BEGIN in it (boundary starts), and how many tokens fill
    it (everything but each language's final partial sequence is
    exactly full — packing wastes no pad).  This is the table that
    answers "what does my context actually look like after packing?"
    before anyone trains on it.

    Scale shape: one running-sum window per language partition (the
    ``shard_pack`` caveat applies — at 100 TB partition by any balanced
    key), then each doc explodes to the ceil(n/L)+1 sequences it spans
    — fan-out is output-sized (corpus tokens / L), never quadratic —
    and ONE map-side-combined groupBy(lang, seq_id).  All integer
    arithmetic, so the oracle hash-checks every cell."""
    docs = load_table(spark, "documents", sf_dir)
    nt = F.size(tokens("text")).cast("bigint")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = (
        docs.select("lang", "doc_id", nt.alias("n"))
        .filter(F.col("n") > 0)
        .withColumn(
            "cum", F.coalesce(F.sum("n").over(w), F.lit(0).cast("bigint"))
        )
    )
    L = F.lit(SEQ_LEN).cast("bigint")
    first_seq = F.expr(f"cum DIV {SEQ_LEN}")
    last_seq = F.expr(f"(cum + n - 1) DIV {SEQ_LEN}")
    spans = sized.select(
        "lang",
        "cum",
        "n",
        first_seq.alias("fs"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    tok_in = F.least(
        (F.col("seq_id") + 1) * L, F.col("cum") + F.col("n")
    ) - F.greatest(F.col("seq_id") * L, F.col("cum"))
    return (
        spans.select(
            "lang",
            "seq_id",
            tok_in.alias("tok"),
            F.when(F.col("seq_id") == F.col("fs"), 1)
            .otherwise(0)
            .alias("is_start"),
        )
        .groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("is_start").cast("bigint").alias("n_starts"),
            F.sum("tok").cast("bigint").alias("tokens_filled"),
        )
    )


SQL_SEQUENCE_PACK = f"""
WITH sized AS (
  SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
  WHERE len(string_split(text, ' ')) > 0
),
cums AS (
  SELECT lang, doc_id, n,
         COALESCE(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cum
  FROM sized
),
spans AS (
  SELECT c.lang, t.seq_id,
         least((t.seq_id + 1) * {SEQ_LEN}, c.cum + c.n)
         - greatest(t.seq_id * {SEQ_LEN}, c.cum) AS tok,
         CASE WHEN t.seq_id = c.cum // {SEQ_LEN} THEN 1 ELSE 0 END
           AS is_start
  FROM cums c,
       UNNEST(generate_series(CAST(c.cum // {SEQ_LEN} AS BIGINT),
                              CAST((c.cum + c.n - 1) // {SEQ_LEN} AS BIGINT)))
         AS t(seq_id)
)
SELECT lang, CAST(seq_id AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(is_start) AS BIGINT) AS n_starts,
       CAST(SUM(tok) AS BIGINT) AS tokens_filled
FROM spans
GROUP BY lang, seq_id
"""


# -- intra-document repetition statistics --------------------------------

def q_curation_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent-bigram concentration per document (the Gopher-style
    repetition filter signal): explode word 2-grams, count per (doc,
    gram), keep each doc's max count and total — ``top_ratio`` near 1
    means the doc is one phrase repeated.

    Two map-side-combined shuffles on high-cardinality keys
    ((doc_id, gram) then doc_id) — no skew pivot, scale-safe."""
    docs = load_table(spark, "documents", sf_dir)
    toked = docs.select("doc_id", tokens("text").alias("__t"))
    grams = word_shingles(F.col("__t"), 2)
    per_gram = (
        toked.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").cast("int").alias("n_grams"),
        F.max("c").cast("int").alias("top_gram_count"),
        (F.max("c").cast("double") / F.sum("c")).alias("top_ratio"),
    )


_SH2 = sql_word_shingles("text", 2)

SQL_REPETITION = f"""
WITH per_gram AS (
  SELECT doc_id, gram, COUNT(*) AS c
  FROM (SELECT doc_id, unnest({_SH2}) AS gram FROM documents)
  GROUP BY doc_id, gram
)
SELECT doc_id,
       CAST(SUM(c) AS INTEGER) AS n_grams,
       CAST(MAX(c) AS INTEGER) AS top_gram_count,
       CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_ratio
FROM per_gram
GROUP BY doc_id
"""


# -- end-to-end corpus-release pipeline ----------------------------------

PIPE_MIN_TOKENS = 10


def q_pipeline_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain as ONE lazy Catalyst plan: quality gate
    (≥ 10 tokens) → benchmark decontamination → exact dedup keep-first
    → redaction audit → token-budget shard packing, ending in per-shard
    release stats.  Composing the stages proves they chain without
    materialization barriers; every stage is SQL-expressible, so the
    WHOLE pipeline value-checks against a single composed oracle.

    Shuffle census at 100 TB: benchmark probe (broadcast + one
    groupBy), dedup window (one hash partition on content md5), pack
    window + shard groupBy (one hash partition on lang, reused by the
    groupBy) — four data-size shuffles total, none all-pairs."""
    docs = load_table(spark, "documents", sf_dir)
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    toked = docs.select(
        "doc_id", "lang", "text", tokens("text").alias("__t")
    )
    kept = toked.withColumn("nt", F.size("__t")).filter(
        (F.col("nt") >= PIPE_MIN_TOKENS) & ~is_bench
    )

    sh = word_shingles(F.col("__t"), CONTAM_N)
    bench_sh = (
        toked.filter(is_bench)
        .select(F.explode(F.array_distinct(sh)).alias("sh"))
        .distinct()
    )
    flagged = (
        kept.select("doc_id", F.explode(F.array_distinct(sh)).alias("sh"))
        .join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contam"))
        .filter(F.col("n_contam") >= CONTAM_THRESHOLD)
        .select("doc_id")
    )
    # no broadcast hint on `flagged`: it is corpus-derived (worst case
    # every doc is contaminated) — AQE broadcasts iff measured small
    clean = kept.join(flagged, "doc_id", "left_anti")

    wx = Window.partitionBy(F.md5(F.col("text"))).orderBy(F.asc("doc_id"))
    ded = (
        clean.withColumn("__rn", F.row_number().over(wx))
        .filter(F.col("__rn") == 1)
        .select(
            "doc_id",
            "lang",
            "nt",
            F.size(
                F.regexp_extract_all(
                    F.col("text"), F.lit(SECRET_TERMS_RE), 0
                )
            ).alias("n_secret"),
        )
    )

    wp = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = ded.withColumn(
        "shard_id",
        F.floor((F.sum("nt").over(wp) - F.col("nt")) / SHARD_TOKEN_BUDGET),
    )
    return packed.groupBy("lang", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("bigint").alias("shard_tokens"),
        F.sum("n_secret").cast("bigint").alias("n_redactions"),
    )


SQL_PIPELINE_CORPUS_RELEASE = f"""
WITH kept AS (
  SELECT doc_id, lang, text,
         len(string_split(text, ' ')) AS nt
  FROM documents
  WHERE len(string_split(text, ' ')) >= {PIPE_MIN_TOKENS}
    AND doc_id % {BENCH_MOD} <> 0
),
bench AS (
  SELECT DISTINCT unnest(list_distinct({_SH})) AS sh
  FROM documents WHERE doc_id % {BENCH_MOD} = 0
),
flagged AS (
  SELECT k.doc_id
  FROM (SELECT doc_id,
               unnest(list_distinct({sql_word_shingles('text', CONTAM_N)})) AS sh
        FROM kept) k
  JOIN bench USING (sh)
  GROUP BY k.doc_id
  HAVING COUNT(*) >= {CONTAM_THRESHOLD}
),
clean AS (
  SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
),
ded AS (
  SELECT doc_id, lang, nt,
         len(regexp_extract_all(text, '{SECRET_TERMS_RE}')) AS n_secret
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id ASC) AS rn
        FROM clean)
  WHERE rn = 1
),
packed AS (
  SELECT lang, doc_id, nt, n_secret,
         CAST(floor((SUM(nt) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - nt)
                    / {SHARD_TOKEN_BUDGET}) AS BIGINT) AS shard_id
  FROM ded
)
SELECT lang, shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS shard_tokens,
       CAST(SUM(n_secret) AS BIGINT) AS n_redactions
FROM packed
GROUP BY lang, shard_id
"""


# -- deterministic train/val/test hash split -----------------------------

#: md5-derived decimal bucket (0..9): 8/1/1 → train/val/test.  The split
#: is a pure function of doc_id, so it is stable across runs, engines,
#: cluster sizes, and corpus growth — a doc never migrates between
#: splits when new data arrives (the property random() sampling lacks).
SPLIT_BUCKETS = 10
SPLIT_SALT = "split:"


def hash_split_bucket(doc_id: Column) -> Column:
    """Bucket 0..9 from the first two md5 hex nibbles of the salted id.

    Evaluates inside the scan stage (no shuffle, no state); the salt
    decouples this hash from every other md5-of-id key in the pipeline
    (band hashes, sample keys) so splits don't correlate with buckets.
    """
    d = F.md5(F.concat(F.lit(SPLIT_SALT), doc_id.cast("string")))
    return (nibble(d, 1) * 16 + nibble(d, 2)) % SPLIT_BUCKETS


def q_curation_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to train/val/test by deterministic hash —
    the standard leakage-safe split for a growing corpus.  Per-row
    scan-stage math only; at 100 TB this costs one pass, zero shuffle
    (the plan-gate asserts no Exchange)."""
    docs = load_table(spark, "documents", sf_dir)
    b = hash_split_bucket(F.col("doc_id"))
    return docs.select(
        "doc_id",
        "lang",
        b.alias("bucket"),
        F.when(b < 8, "train").when(b == 8, "val").otherwise("test").alias(
            "split"
        ),
    )


def _sql_split_bucket() -> str:
    md5 = f"md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR))"
    return (
        f"(({sql_nibble(md5, 1)} * 16 + {sql_nibble(md5, 2)})"
        f" % {SPLIT_BUCKETS})"
    )


SQL_HASH_SPLIT = f"""
SELECT doc_id, lang,
       CAST({_sql_split_bucket()} AS INTEGER) AS bucket,
       CASE WHEN {_sql_split_bucket()} < 8 THEN 'train'
            WHEN {_sql_split_bucket()} = 8 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# -- stratified deterministic sampling -----------------------------------

#: docs kept per language stratum
STRATUM_K = 25
SAMPLE_SALT = "strat:"


def q_curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-language sample, ordered by a salted hash of the
    id — a deterministic reservoir: the chosen set only changes where
    new docs hash below the current k-th, never on partitioning or
    execution order.

    Two-phase rank (the ``two_phase_topk`` discipline): phase 1 windows
    over ``(lang, spark_partition_id())`` so each task cuts its own
    slice to ≤ k rows per stratum; the global per-lang window then
    ranks ≤ k·P survivors.  A single ``Window.partitionBy(lang)`` would
    give the plan exactly n_langs partitions — a handful of tasks each
    sorting a whole stratum of a 100 TB corpus.
    """
    from pu4spark_spark.plans import two_phase_rank

    docs = load_table(spark, "documents", sf_dir)
    key = F.md5(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string")))
    return two_phase_rank(
        docs.withColumn("__key", key),
        ["lang"],
        [F.asc("__key"), F.asc("doc_id")],
        STRATUM_K,
        rank_col="sample_rank",
    ).select("doc_id", "lang", "sample_rank")


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY lang
         ORDER BY md5('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS INTEGER) AS sample_rank
FROM documents
QUALIFY sample_rank <= {STRATUM_K}
"""


# -- sliding-window chunking ---------------------------------------------

#: tokens per training chunk / stride between chunk starts (50% overlap)
CHUNK_SIZE = 32
CHUNK_STRIDE = 16


def q_curation_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping fixed-token windows — the
    sequence-packing precursor every pretraining / RAG pipeline runs.

    Contract: chunk starts at every multiple of the stride below the
    token count; the tail chunk may be shorter.  The explode happens
    where the tokens already live (no repartition), all chunk math is
    codegen array ops, and the output carries an md5 of the chunk text
    rather than the text itself, so the operator's exchange-free plan
    reads the corpus once and writes chunk metadata.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", tokens("text").alias("__toks")
    ).filter(F.size("__toks") > 0)
    chunks = toks.select(
        "doc_id",
        F.expr(
            f"posexplode(sequence(0, size(__toks) - 1, {CHUNK_STRIDE}))"
        ).alias("__i", "__start"),
        "__toks",
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, CHUNK_SIZE)
    return chunks.select(
        "doc_id",
        F.col("__i").cast("long").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


SQL_CHUNK_WINDOWS = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) > 0
),
starts AS (
  SELECT doc_id, t, unnest(range(0, len(t), {CHUNK_STRIDE})) AS g FROM toks
)
SELECT doc_id,
       CAST(g / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(len(list_slice(t, g + 1, g + {CHUNK_SIZE})) AS INTEGER)
         AS n_tokens,
       md5(array_to_string(list_slice(t, g + 1, g + {CHUNK_SIZE}), ' '))
         AS chunk_md5
FROM starts
"""


# -- out-of-vocabulary rate across the hash split ------------------------

def q_curation_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-test-document out-of-vocabulary rate against the TRAIN
    split's vocabulary — the distribution-shift check run before
    trusting an eval split (composes the deterministic hash split with
    a vocabulary build).

    Scale shape: the vocabulary is corpus-derived, so the probe is a
    token-key LEFT JOIN (cardinality grows with data, AQE decides
    broadcast-vs-shuffle — never a mandatory hint), followed by one
    map-side-combined per-doc rollup.  The rate is an exact integer
    ratio."""
    docs = load_table(spark, "documents", sf_dir)
    b = hash_split_bucket(F.col("doc_id"))
    train = docs.filter(b < 8)
    # bucket 9 is the TEST split exactly (8 is val) — mixing val in
    # would double the row count behind a "per-test-document" label
    test = docs.filter(b == 9)
    vocab = (
        train.select(F.explode(tokens("text")).alias("token"))
        .distinct()
        .withColumn("__in_vocab", F.lit(1))
    )
    test_toks = test.select(
        "doc_id", "lang", F.explode(tokens("text")).alias("token")
    )
    return (
        test_toks.join(vocab, "token", "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


SQL_OOV_RATE = f"""
WITH split AS (
  SELECT doc_id, lang, text, {_sql_split_bucket()} AS b FROM documents
),
vocab AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS token
  FROM split WHERE b < 8
),
test_toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM split WHERE b = 9
)
SELECT doc_id, lang,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS oov_rate
FROM test_toks t
LEFT JOIN vocab v ON t.token = v.token
GROUP BY doc_id, lang
"""


# -- UDTF surface demo (chunking as a lateral table function) -------------

def q_curation_chunk_windows_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME chunk tiling as a registered Python UDTF consumed with
    LATERAL — completing the UDF/UDAF/UDTF surface literally.  Must
    hash-match the same oracle as the native operator, proving the two
    paths agree row-for-row.

    This is an API-parity demo, NOT the production path: UDTF eval is
    per-row Python, while ``q_curation_chunk_windows`` does the
    identical work in whole-stage codegen (posexplode + array ops).
    The engine's rule stands — per-row Python never in the hot path —
    and the paired oracle makes the equivalence checkable.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id: bigint, n_tokens: int")
    class ChunkWindows:
        def eval(self, text: str):
            from pu4spark_spark.operators.curation import (
                CHUNK_SIZE,
                CHUNK_STRIDE,
            )

            if text is None:
                return
            toks = text.split(" ")
            if not toks:
                return
            for i, start in enumerate(range(0, len(toks), CHUNK_STRIDE)):
                yield i, min(CHUNK_SIZE, len(toks) - start)

    spark.udtf.register("chunk_windows_udtf", ChunkWindows)
    load_table(spark, "documents", sf_dir).createOrReplaceTempView(
        "__docs_for_udtf"
    )
    return spark.sql(
        "SELECT doc_id, c.chunk_id, c.n_tokens "
        "FROM __docs_for_udtf, LATERAL chunk_windows_udtf(text) AS c"
    )


SQL_CHUNK_WINDOWS_UDTF = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) > 0
),
starts AS (
  SELECT doc_id, t, unnest(range(0, len(t), {CHUNK_STRIDE})) AS g FROM toks
)
SELECT doc_id,
       CAST(g / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(len(list_slice(t, g + 1, g + {CHUNK_SIZE})) AS INTEGER)
         AS n_tokens
FROM starts
"""


# -- exact span-level dedup over chunk fingerprints ----------------------

def q_dedup_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span detection: full-size chunk windows whose
    md5 recurs anywhere in the corpus — the chunk-aligned approximation
    of exact-substring dedup (Lee et al.'s "deduplicating training
    data" span pass, at stride granularity).

    Rides the chunking operator's plan: explode to stride windows, md5
    per window, then two map-side-combined aggregations — a
    (chunk_md5, doc_id) distinct feeding the chunk_md5 rollup (the
    distinct-doc count forces the extra exchange; both carry
    fingerprint rows, never token data) — and the HAVING>1 filter
    means the output is just the duplicated spans.  At 100 TB the key
    is a 128-bit hash (cardinality grows with data, no hot key), and
    the keeper_doc min gives the canonical copy to keep.
    """
    chunks = q_curation_chunk_windows(spark, sf_dir)
    return (
        chunks.filter(F.col("n_tokens") == CHUNK_SIZE)
        .groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keeper_doc"),
        )
        .filter(F.col("n_spans") > 1)
    )


SQL_DEDUP_CHUNK_SPANS = f"""
WITH chunks AS ({SQL_CHUNK_WINDOWS})
SELECT chunk_md5,
       COUNT(*) AS n_spans,
       COUNT(DISTINCT doc_id) AS n_docs,
       MIN(doc_id) AS keeper_doc
FROM chunks
WHERE n_tokens = {CHUNK_SIZE}
GROUP BY chunk_md5
HAVING COUNT(*) > 1
"""


# -- duplicated-span REMOVAL (the rewrite half of exact-substring dedup) --

def q_dedup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL pass that completes ``dedup_chunk_spans``: Lee et
    al.'s exact-substring dedup keeps ONE canonical occurrence of each
    duplicated span and cuts the rest out of the surviving documents.
    Here the span grid is the non-overlapping ``CHUNK_SIZE`` tile
    (every start at a multiple of CHUNK_SIZE, so cuts never overlap
    and token accounting is exact); a tile is dropped iff an identical
    tile occurs EARLIER in (doc_id, tile_id) order anywhere in the
    corpus — intra-doc repeats lose all but their first copy too.
    Short tail tiles (< CHUNK_SIZE tokens) are never candidates, the
    span-length floor of the paper.  Output: the per-document rewrite
    report (tiles, dropped tiles, kept tokens).

    Scale shape: ride the chunking explode where the tokens live, hash
    each tile to 128 bits, then exactly two data-sized exchanges —
    one on ``chunk_md5`` for the first-occurrence window (hash key ⇒
    no skew, cardinality grows with data) and one on ``doc_id`` for
    the report rollup — both carrying fingerprint rows, never text.
    The keeper choice is a row_number over (doc_id, tile order), the
    same rank the oracle computes, so the report is integer-exact."""
    from pu4spark_spark.plans import cached

    # the stride grid is CHUNK_STRIDE; keep only starts on the
    # non-overlapping CHUNK_SIZE grid (chunk_id * stride % size == 0).
    # cached(): the tile frame feeds BOTH the first-occurrence window
    # and the per-doc report join — uncached, the corpus explode +
    # md5 hashing would run once per consumer (§5b staging lesson)
    tiles_all = cached(
        q_curation_chunk_windows(spark, sf_dir).filter(
            (F.col("chunk_id") * CHUNK_STRIDE) % CHUNK_SIZE == 0
        )
    )
    full = F.col("n_tokens") == CHUNK_SIZE
    w = Window.partitionBy("chunk_md5").orderBy(
        F.asc("doc_id"), F.asc("chunk_id")
    )
    ranked = tiles_all.filter(full).withColumn(
        "__rn", F.row_number().over(w)
    )
    dropped = ranked.filter(F.col("__rn") > 1).select(
        "doc_id", "chunk_id"
    )
    per_doc = tiles_all.join(
        dropped.withColumn("__drop", F.lit(1)),
        ["doc_id", "chunk_id"],
        "left",
    ).groupBy("doc_id")
    return (
        per_doc.agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.sum(
                F.when(F.col("__drop").isNotNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_dropped"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(F.col("__drop").isNotNull(), 0).otherwise(
                    F.col("n_tokens")
                )
            )
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .filter(F.col("n_dropped") > 0)
    )


SQL_DEDUP_SPAN_REMOVAL = f"""
WITH tiles AS (
  SELECT * FROM ({SQL_CHUNK_WINDOWS})
  WHERE (chunk_id * {CHUNK_STRIDE}) % {CHUNK_SIZE} = 0
),
ranked AS (
  SELECT doc_id, chunk_id,
         ROW_NUMBER() OVER (PARTITION BY chunk_md5
                            ORDER BY doc_id, chunk_id) AS rn
  FROM tiles WHERE n_tokens = {CHUNK_SIZE}
),
dropped AS (
  SELECT doc_id, chunk_id, 1 AS d FROM ranked WHERE rn > 1
)
SELECT t.doc_id,
       COUNT(*) AS n_tiles,
       CAST(SUM(CASE WHEN d.d IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST(SUM(t.n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN d.d IS NOT NULL THEN 0 ELSE t.n_tokens END)
            AS BIGINT) AS kept_tokens
FROM tiles t
LEFT JOIN dropped d
  ON t.doc_id = d.doc_id AND t.chunk_id = d.chunk_id
GROUP BY t.doc_id
HAVING SUM(CASE WHEN d.d IS NOT NULL THEN 1 ELSE 0 END) > 0
"""


# -- global token offsets (distributed prefix sum) ------------------------

#: range partitions for the prefix-sum — per-partition totals stay a
#: bounded merge table (one row each)
OFFSET_PARTS = 16


def q_curation_token_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token offset per document — the training-data INDEX: a
    dataloader that addresses "tokens [i, j)" needs every doc's start
    offset in the canonical corpus order, i.e. the prefix sum of token
    counts over ``doc_id``.

    The naive window ``SUM() OVER (ORDER BY doc_id)`` is an
    unpartitioned window — one task sorts and scans the entire corpus.
    The scalable form is the classic two-phase distributed prefix sum:

    1. ``repartitionByRange(doc_id)`` — Spark's RangePartitioner
       assigns ascending key ranges to ascending partition ids, so the
       global order is (partition, doc_id);
    2. a LOCAL prefix sum per partition (window keyed by the partition
       id — each task scans only its own range);
    3. per-partition totals — a bounded merge table (``OFFSET_PARTS``
       rows) — cumulated and broadcast back.

    Every data-sized pass is partition-local; the only global step
    touches one row per partition.  All-integer, so the index
    hash-checks against the oracle's single-window replica."""
    from pu4spark_spark.plans import cached

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.size(tokens("text")).cast("bigint").alias("n_tokens")
    )
    # cached(): the ranged frame feeds the local window AND the
    # per-partition totals; uncached each consumer would re-scan and
    # re-exchange (the range exchange is only reused for IDENTICAL
    # consumer subtrees, which a window vs an agg are not)
    ranged = cached(
        toks.repartitionByRange(OFFSET_PARTS, "doc_id").withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn(
        "__local", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    totals = ranged.groupBy("__pid").agg(F.sum("n_tokens").alias("__t"))
    # unpartitioned window over the BOUNDED totals table only
    w_pid = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__t").over(w_pid), F.lit(0))
    ).select("__pid", "__off")
    return local.join(F.broadcast(offsets), "__pid").select(
        "doc_id",
        "n_tokens",
        (F.col("__local") + F.col("__off"))
        .cast("bigint")
        .alias("token_offset"),
    )


SQL_CURATION_TOKEN_OFFSETS = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(COALESCE(SUM(len(string_split(text, ' ')))
              OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS BIGINT) AS token_offset
FROM documents
WHERE text IS NOT NULL
"""


# -- fixed-size deterministic eval holdout (k per stratum) ----------------

EVAL_K = 20


def q_curation_eval_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY ``EVAL_K`` documents per language, chosen by hash order
    — the frozen eval subset every training pipeline carves out.  Rate
    -based hash splits (``curation_hash_split``) give *proportional*
    strata; an eval set needs a FIXED size per stratum that is stable
    under corpus growth *for the docs that stay*: ordering by
    ``md5(doc_id)`` is a uniform permutation independent of insertion
    order, and appending new docs only inserts into that order (it
    never reshuffles survivors — the property a "first K by doc_id"
    sample lacks, since doc_ids correlate with crawl time).

    Selection is the capped two-phase rank (never one task per
    language); rank arithmetic is integer and the md5 order is
    bit-identical across engines, so membership AND rank hash-check."""
    from pu4spark_spark.plans import two_phase_rank

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("__h")
    )
    picked = two_phase_rank(
        docs,
        ["lang"],
        [F.asc("__h"), F.asc("doc_id")],
        EVAL_K,
        rank_col="rank",
    )
    return picked.select(
        "lang", F.col("rank").cast("bigint").alias("rank"), "doc_id"
    )


SQL_CURATION_EVAL_HOLDOUT = f"""
WITH ranked AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rank
  FROM documents
)
SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id
FROM ranked WHERE rank <= {EVAL_K}
"""


# -- keyed pseudonymization (privacy-preserving identifiers) -------------

#: demo tokenization key — in production this comes from a KMS and
#: rotates; the ALGEBRA (keyed hash, join-consistency) is what the
#: engine provides
PSEUDO_KEY = "pu4spark-demo-key-r7"
PSEUDO_TOKEN_CHARS = 16


def pseudonym(col, key: str = PSEUDO_KEY) -> F.Column:
    """Deterministic keyed pseudonym for an identifier column: the
    md5-HMAC-style token ``md5(key ':' value)`` truncated to 16 hex
    chars.  Same input → same token, so JOINABILITY across tables and
    runs is preserved while the raw identifier never leaves the scan
    stage — the GDPR-pseudonymization pattern every shared analytics
    corpus needs.  Scan-stage only; zero shuffle.

    NULL propagates to NULL (``F.concat``, not ``concat_ws`` — the
    latter silently SKIPS nulls, which would tokenize a null id to
    ``md5(key ':')``, colliding with the empty-string id and diverging
    from the oracle's null-propagating ``'||'``): an absent identifier
    has no pseudonym, same as every SQL engine's hash-of-null."""
    c = col if isinstance(col, F.Column) else F.col(col)
    return F.substring(
        F.md5(F.concat(F.lit(key), F.lit(":"), c.cast("string"))),
        1,
        PSEUDO_TOKEN_CHARS,
    )


def q_curation_pseudonymize_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Events with ``user_id`` replaced by its keyed pseudonym, reduced
    to a per-token activity profile.  The tokenized table must carry
    the SAME per-user structure as the raw one (the whole point of
    deterministic tokenization) — the consistency test joins this back
    to the raw per-user profile and asserts a bijection; the oracle
    recomputes the identical md5 arithmetic, so the tokens themselves
    hash-check."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.select(
            pseudonym("user_id").alias("user_token"),
            "event_type",
            "value",
        )
        .groupBy("user_token")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchases"),
        )
    )


SQL_PSEUDONYMIZE_EVENTS = f"""
SELECT substr(md5('{PSEUDO_KEY}' || ':' || CAST(user_id AS VARCHAR)),
              1, {PSEUDO_TOKEN_CHARS}) AS user_token,
       COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchases
FROM events
GROUP BY 1
"""


# -- user-coherent sampling (keep ALL events of sampled users) -----------

#: per-mille of users kept by the coherent sample
COHERENT_KEEP_PM = 200


def q_curation_user_coherent_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ENTITY-coherent downsampling: a deterministic hash coin on
    ``user_id`` keeps ~20% of USERS with ALL their events — the correct
    way to shrink event data for development (row-level Bernoulli
    sampling shreds every user's history; sessionization, funnels and
    retention all silently break on it).  The keep predicate is a
    stateless scan-stage expression — no shuffle, no user-table join —
    and the per-type report plus the full/sampled user counts land in
    one plan.  All counts exact; the kept-user ratio is one IEEE
    division the oracle replays."""
    events = load_table(spark, "events", sf_dir)
    keep = (
        F.pmod(
            F.conv(F.substring(F.md5(F.concat_ws(":", F.lit("ucs2"),
                F.col("user_id").cast("string"))), 1, 8), 16, 10)
            .cast("bigint"),
            F.lit(1000),
        )
        < COHERENT_KEEP_PM
    )
    kept = events.filter(keep)
    per_type = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    totals = events.agg(
        F.countDistinct("user_id").alias("__all_users")
    )
    return per_type.crossJoin(F.broadcast(totals)).select(
        "event_type",
        "n_events",
        "n_users",
        (F.col("n_users").cast("double") / F.col("__all_users")).alias(
            "user_frac"
        ),
    )


SQL_USER_COHERENT_SAMPLE = f"""
WITH kept AS (
  SELECT * FROM events
  WHERE CAST(('0x' || substr(md5('ucs2' || ':' || CAST(user_id AS VARCHAR)),
                             1, 8)) AS BIGINT) % 1000 < {COHERENT_KEEP_PM}
),
tot AS (SELECT COUNT(DISTINCT user_id) AS all_users FROM events)
SELECT k.event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT k.user_id) AS n_users,
       CAST(COUNT(DISTINCT k.user_id) AS DOUBLE) / t.all_users AS user_frac
FROM kept k, tot t
GROUP BY k.event_type, t.all_users
"""


# -- soft dedup: duplicate-count loss weights ----------------------------

def q_curation_soft_dedup_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SOFT deduplication: instead of dropping duplicated spans, keep
    ONE canonical copy per distinct chunk and assign it a loss weight
    of ``1/n_copies`` — every piece of content contributes total
    exposure 1.0 to training no matter how many times the crawl found
    it (the count-based down-weighting alternative to hard dedup,
    which loses the duplication signal entirely; ``repeat_count`` is
    itself a useful quality feature — boilerplate repeats, prose
    doesn't).

    One map-side-combined groupBy on the 128-bit chunk fingerprint (a
    key whose cardinality grows with data — no hot key), a min-struct
    aggregate picks the deterministic keeper, and the weight is one
    IEEE division.  Rides the chunking operator's exchange-free plan,
    so the whole operator is chunk explode + ONE shuffle of
    fingerprint rows."""
    chunks = q_curation_chunk_windows(spark, sf_dir)
    keeper = F.min(F.struct("doc_id", "chunk_id")).alias("__keep")
    return (
        chunks.filter(F.col("n_tokens") == CHUNK_SIZE)
        .groupBy("chunk_md5")
        .agg(keeper, F.count(F.lit(1)).alias("repeat_count"))
        .select(
            "chunk_md5",
            F.col("__keep.doc_id").alias("keeper_doc"),
            F.col("__keep.chunk_id").alias("keeper_chunk"),
            F.col("repeat_count").cast("bigint").alias("repeat_count"),
            (
                F.lit(1.0) / F.col("repeat_count").cast("double")
            ).alias("loss_weight"),
        )
    )


SQL_CURATION_SOFT_DEDUP = f"""
WITH chunks AS ({SQL_CHUNK_WINDOWS})
SELECT chunk_md5,
       MIN({{'doc_id': doc_id, 'chunk_id': chunk_id}}).doc_id AS keeper_doc,
       MIN({{'doc_id': doc_id, 'chunk_id': chunk_id}}).chunk_id
         AS keeper_chunk,
       CAST(COUNT(*) AS BIGINT) AS repeat_count,
       1.0 / CAST(COUNT(*) AS DOUBLE) AS loss_weight
FROM chunks
WHERE n_tokens = {CHUNK_SIZE}
GROUP BY chunk_md5
"""


# -- temperature-scaled domain resampling --------------------------------

#: alpha = 0.5 (temperature 2): keep probability per source ∝ n^(α-1),
#: normalized so the SMALLEST source keeps everything — the standard
#: up-weighting of rare domains/languages for pretraining mixes.  Only
#: sqrt/divide are used (both IEEE-correctly-rounded, so the oracle's
#: doubles match bit-for-bit; pow() would not be).
MIX_TEMP_SALT = "mix:"


def q_curation_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic temperature-2 domain resampling report: per-source
    keep probability and the docs actually kept by the salted hash
    coin.

    Scale shape: per-source counts are one map-side-combined agg over a
    BOUNDED key (sources are domains — a dimension, not data-scaled);
    the 1-row max and the per-source weights join back onto the corpus
    as AQE-chosen broadcasts (no explicit hint — the round-2 lesson on
    corpus-derived sides).  The hash coin is scan-stage math, so the
    whole operator costs one corpus pass + one tiny agg.
    """
    docs = load_table(spark, "documents", sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    w = F.lit(1.0) / F.sqrt(F.col("n_src").cast("double"))
    weighted = counts.withColumn("__w", w)
    wmax = weighted.agg(F.max("__w").alias("__wmax"))
    probs = weighted.crossJoin(wmax).select(
        "source", "n_src", (F.col("__w") / F.col("__wmax")).alias("p_keep")
    )
    d = F.md5(F.concat(F.lit(MIX_TEMP_SALT), F.col("doc_id").cast("string")))
    coin = (
        (nibble(d, 1) * 16 + nibble(d, 2)).cast("double") + F.lit(0.5)
    ) / F.lit(256.0)
    kept = docs.withColumn("__coin", coin).join(probs, "source").filter(
        F.col("__coin") < F.col("p_keep")
    )
    return (
        kept.groupBy("source")
        .agg(
            F.first("n_src").alias("n_src"),
            F.first("p_keep").alias("p_keep"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )


def _sql_mix_coin() -> str:
    md5 = f"md5('{MIX_TEMP_SALT}' || CAST(doc_id AS VARCHAR))"
    return (
        f"((CAST({sql_nibble(md5, 1)} * 16 + {sql_nibble(md5, 2)} AS DOUBLE)"
        f" + 0.5) / 256.0)"
    )


SQL_TEMPERATURE_MIX = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_src FROM documents GROUP BY source
),
weighted AS (
  SELECT source, n_src, 1.0 / sqrt(CAST(n_src AS DOUBLE)) AS w FROM counts
),
probs AS (
  SELECT source, n_src, w / (SELECT MAX(w) FROM weighted) AS p_keep
  FROM weighted
)
SELECT d.source,
       CAST(MIN(p.n_src) AS BIGINT) AS n_src,
       MIN(p.p_keep) AS p_keep,
       COUNT(*) AS n_kept
FROM documents d
JOIN probs p ON d.source = p.source
WHERE {_sql_mix_coin()} < p.p_keep
GROUP BY d.source
"""


# -- chunk-level release pipeline (r4 capstone composition) ---------------

def q_pipeline_chunk_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunk-granularity release chain as ONE Catalyst plan:
    sliding-window chunking → exact span dedup (drop every chunk whose
    full-size fingerprint recurs, keep the lowest (doc_id, chunk_id)
    copy) → token-budget shard packing of the survivors.

    Composition proof, same as ``pipeline_corpus_release``: Catalyst
    sees the whole tree — the chunk explode runs once and feeds both
    the duplicate-span aggregate and the keep side; the anti-join key
    is the 128-bit chunk hash (scales with data); packing is the
    per-lang running-sum window, never a global sort.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id", "lang", tokens("text").alias("__toks")
    ).filter(F.size("__toks") > 0)
    chunks = toks.select(
        "doc_id",
        "lang",
        F.expr(
            f"posexplode(sequence(0, size(__toks) - 1, {CHUNK_STRIDE}))"
        ).alias("__i", "__start"),
        "__toks",
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, CHUNK_SIZE)
    flat = chunks.select(
        "doc_id",
        "lang",
        F.col("__i").cast("long").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )
    # duplicated full-size spans: keep only the (min doc, min chunk) copy
    dup_keep = (
        flat.filter(F.col("n_tokens") == CHUNK_SIZE)
        .groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.struct("doc_id", "chunk_id")).alias("__keep"),
        )
        .filter(F.col("__n") > 1)
        .select(
            "chunk_md5",
            F.col("__keep.doc_id").alias("__kd"),
            F.col("__keep.chunk_id").alias("__kc"),
        )
    )
    kept = (
        flat.join(dup_keep, "chunk_md5", "left")
        .filter(
            F.col("__kd").isNull()
            | (
                (F.col("doc_id") == F.col("__kd"))
                & (F.col("chunk_id") == F.col("__kc"))
            )
        )
        .select("doc_id", "lang", "chunk_id", "n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = kept.withColumn(
        "shard_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            / SHARD_TOKEN_BUDGET
        ),
    )
    return packed.groupBy("lang", "shard_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
    )


SQL_PIPELINE_CHUNK_RELEASE = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(text, ' ') AS t
  FROM documents
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) > 0
),
starts AS (
  SELECT doc_id, lang, t, unnest(range(0, len(t), {CHUNK_STRIDE})) AS g
  FROM toks
),
flat AS (
  SELECT doc_id, lang,
         CAST(g / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
         CAST(len(list_slice(t, g + 1, g + {CHUNK_SIZE})) AS INTEGER)
           AS n_tokens,
         md5(array_to_string(list_slice(t, g + 1, g + {CHUNK_SIZE}), ' '))
           AS chunk_md5
  FROM starts
),
dup_keep AS (
  SELECT chunk_md5,
         MIN({{'doc_id': doc_id, 'chunk_id': chunk_id}}) AS keep
  FROM flat WHERE n_tokens = {CHUNK_SIZE}
  GROUP BY chunk_md5
  HAVING COUNT(*) > 1
),
kept AS (
  SELECT f.doc_id, f.lang, f.chunk_id, f.n_tokens
  FROM flat f LEFT JOIN dup_keep d USING (chunk_md5)
  WHERE d.chunk_md5 IS NULL
     OR (f.doc_id = d.keep.doc_id AND f.chunk_id = d.keep.chunk_id)
),
packed AS (
  SELECT lang,
         CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang
                                         ORDER BY doc_id, chunk_id
                                         ROWS UNBOUNDED PRECEDING)
                     - n_tokens) / {SHARD_TOKEN_BUDGET}) AS BIGINT)
           AS shard_id,
         n_tokens
  FROM kept
)
SELECT lang, shard_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
FROM packed
GROUP BY lang, shard_id
"""


def q_curation_dup_rate_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dedup observability: per-source exact-duplicate rate (docs whose
    content hash appears elsewhere in the corpus) — the table that says
    WHICH feed is flooding the corpus with copies, before any dedup
    runs.  Two map-side-combined aggregations: content-hash group
    sizes, then per-source rollup; the hash-size join back is
    hash-keyed (corpus-sized but 1:1, no amplification).  Counts exact;
    one IEEE division per source."""
    docs = load_table(spark, "documents", sf_dir)
    h = docs.select("source", F.md5("text").alias("h"))
    sizes = h.groupBy("h").agg(F.count(F.lit(1)).alias("n_copies"))
    return (
        h.join(sizes, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("n_copies") > 1).cast("int"))
            .cast("bigint")
            .alias("n_duplicated"),
            (
                F.sum((F.col("n_copies") > 1).cast("int")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("dup_rate"),
        )
    )


SQL_DUP_RATE_BY_SOURCE = """
WITH h AS (SELECT source, md5(text) AS h FROM documents),
sizes AS (SELECT h, COUNT(*) AS n_copies FROM h GROUP BY h)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_duplicated,
       CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_rate
FROM h JOIN sizes USING (h)
GROUP BY source
"""


# -- fuzzy (near-match) decontamination -----------------------------------

#: a train doc whose verified shingle Jaccard vs ANY benchmark doc
#: reaches this is contamination — deliberately far below the dedup
#: threshold (0.5): paraphrased test leakage shares far fewer shingles
#: than a near-duplicate
FUZZY_CONTAM_JACCARD = 0.3


def q_curation_fuzzy_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NEAR-match benchmark decontamination: train docs that are
    MinHash-LSH candidates of a benchmark doc with verified 3-gram
    Jaccard ≥ ``FUZZY_CONTAM_JACCARD`` — the fuzzy companion to
    :func:`q_curation_decontaminate`, which only catches verbatim
    shingle overlap (paraphrased or lightly-edited test leakage slips
    an exact-shingle probe but not a near-dup one).

    Scale shape: the benchmark side is fixed-size by construction, so
    its band table and shingle sets are legitimately broadcast (same
    argument as the exact probe); the train side does the usual
    band-key candidate join + candidate-only verify — O(candidates),
    never O(train × bench).  One groupBy(doc_id) reduce produces the
    per-doc contamination report.
    """
    from pu4spark_spark.functions.textfns import jaccard_sets
    from pu4spark_spark.operators.dedup import minhash_bands
    from pu4spark_spark.plans import cached, spread

    docs = spread(load_table(spark, "documents", sf_dir))
    toked = docs.select("doc_id", tokens("text").alias("__t"))
    base = toked.select(
        "doc_id", F.array_distinct(word_shingles(F.col("__t"))).alias("sh")
    )
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = cached(base.filter(is_bench))
    train = cached(base.filter(~is_bench))
    cand = (
        minhash_bands(train)
        .join(
            F.broadcast(
                minhash_bands(bench).select(
                    F.col("doc_id").alias("bench_id"), "band_pos", "band_hash"
                )
            ),
            ["band_pos", "band_hash"],
        )
        .select("doc_id", "bench_id")
        .distinct()
    )
    verified = (
        cand.join(train.select("doc_id", F.col("sh").alias("sh_t")), "doc_id")
        .join(
            F.broadcast(
                bench.select(
                    F.col("doc_id").alias("bench_id"), F.col("sh").alias("sh_b")
                )
            ),
            "bench_id",
        )
        .withColumn("jaccard", jaccard_sets(F.col("sh_t"), F.col("sh_b")))
        .filter(F.col("jaccard") >= FUZZY_CONTAM_JACCARD)
    )
    return verified.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bench_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )


def _sql_fuzzy_decontaminate() -> str:
    from pu4spark_spark.functions.textfns import (
        sql_jaccard_sets,
        sql_word_shingles,
    )
    from pu4spark_spark.operators.dedup import (
        _sql_minhash_bands,
        _UNNEST_BANDS,
    )

    sh3 = sql_word_shingles("text")
    return f"""
WITH base AS (
  SELECT doc_id, list_distinct({sh3}) AS sh FROM documents
),
sigs AS (SELECT doc_id, sh, {_sql_minhash_bands()} FROM base),
t_bands AS (
  SELECT doc_id, u.band_pos, u.band_hash
  FROM sigs, {_UNNEST_BANDS}
  WHERE doc_id % {BENCH_MOD} <> 0
),
b_bands AS (
  SELECT doc_id AS bench_id, u.band_pos, u.band_hash
  FROM sigs, {_UNNEST_BANDS}
  WHERE doc_id % {BENCH_MOD} = 0
),
cand AS (
  SELECT DISTINCT t.doc_id, b.bench_id
  FROM t_bands t JOIN b_bands b
    ON t.band_pos = b.band_pos AND t.band_hash = b.band_hash
)
SELECT c.doc_id,
       COUNT(*) AS n_bench_matches,
       MAX({sql_jaccard_sets('st.sh', 'sb.sh')}) AS max_jaccard
FROM cand c
JOIN base st ON st.doc_id = c.doc_id
JOIN base sb ON sb.doc_id = c.bench_id
WHERE {sql_jaccard_sets('st.sh', 'sb.sh')} >= {FUZZY_CONTAM_JACCARD}
GROUP BY c.doc_id
"""


SQL_FUZZY_DECONTAMINATE = _sql_fuzzy_decontaminate()


#: target token shares per language for the mixture planner (sums to
#: 1000 per mille; a deliberately non-uniform target so the report is
#: non-degenerate on the near-uniform fixture)
TARGET_MIX_PER_MILLE = {"en": 400, "de": 200, "fr": 200, "es": 100, "zh": 100}


def q_curation_mix_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture PLANNING report: given target token shares per language
    and the corpus's actual shares, the keep-rate each language needs
    so the sampled corpus hits the target with NO upsampling (rates
    are scaled so the most over-demanded language keeps 100% and
    everything else downsamples proportionally) — the table that turns
    a mixture spec into the hash-coin thresholds ``domain_mix``-style
    sampling actually runs with.

    Scale shape: one map-side-combined groupBy(lang) for actual token
    counts; all planning arithmetic happens on the L-row result (scan-
    stage math after a 1-row total broadcast).  Exact integer counts;
    the rates are fixed chains of IEEE divisions, so the oracle
    hash-checks the plan itself."""
    docs = load_table(spark, "documents", sf_dir)
    counts = docs.groupBy("lang").agg(
        F.sum(F.size(tokens("text"))).cast("bigint").alias("n_tokens")
    )
    tgt = None
    for lang, pm in TARGET_MIX_PER_MILLE.items():
        tgt = (
            F.when(F.col("lang") == lang, pm)
            if tgt is None
            else tgt.when(F.col("lang") == lang, pm)
        )
    tgt = tgt.otherwise(F.lit(0))
    tot = counts.agg(F.sum("n_tokens").alias("__T"))
    base = counts.crossJoin(tot).select(
        "lang",
        "n_tokens",
        (tgt.cast("double") / F.lit(1000.0)).alias("target_share"),
        (F.col("n_tokens").cast("double") / F.col("__T")).alias(
            "actual_share"
        ),
    )
    # demand ratio: how over-demanded each language is vs its supply
    demand = F.col("target_share") / F.col("actual_share")
    mx = base.agg(F.max(demand).alias("__dmax"))
    return base.crossJoin(mx).select(
        "lang",
        "n_tokens",
        "target_share",
        "actual_share",
        ((F.col("target_share") / F.col("actual_share")) / F.col("__dmax")).alias(
            "keep_rate"
        ),
    )


SQL_MIX_PLANNER = f"""
WITH counts AS (
  SELECT lang,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
base AS (
  SELECT lang, n_tokens,
         CAST(CASE {' '.join(f"WHEN lang = '{lang}' THEN {pm}" for lang, pm in TARGET_MIX_PER_MILLE.items())} ELSE 0 END AS DOUBLE) / 1000.0
           AS target_share,
         CAST(n_tokens AS DOUBLE) / (SELECT SUM(n_tokens) FROM counts)
           AS actual_share
  FROM counts
)
SELECT lang, n_tokens, target_share, actual_share,
       (target_share / actual_share)
       / (SELECT MAX(target_share / actual_share) FROM base) AS keep_rate
FROM base
"""


#: training shards per epoch (fixture-scale; production O(1000s))
EPOCH_SHARDS = 8
EPOCH_SEED = "epoch0"


def q_curation_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EPOCH SHUFFLE: every doc gets a training shard and
    an intra-shard position from ``md5(seed ‖ doc_id)`` — the global
    random-order layout a training run consumes, reproducible bit-for-
    bit from the seed (restartable epochs, no RNG state to persist;
    epoch 2 is just a different seed).

    Scale shape: the shard key is scan-stage hash math (uniform across
    ``EPOCH_SHARDS``), and the intra-shard position is a rank window
    PARTITIONED BY shard — with shards sized for the cluster, each
    window task orders one shard, and there is never a global ORDER BY.
    Output: (doc_id, shard, pos) — the manifest a loader walks."""
    docs = load_table(spark, "documents", sf_dir)
    key = F.md5(F.concat(F.lit(EPOCH_SEED), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard").orderBy("__k", "doc_id")
    return (
        docs.select(
            "doc_id",
            key.alias("__k"),
        )
        .withColumn(
            "shard",
            (
                F.conv(F.substring("__k", 1, 4), 16, 10).cast("long")
                % EPOCH_SHARDS
            ).cast("int"),
        )
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select("doc_id", "shard", "pos")
    )


SQL_EPOCH_SHUFFLE = f"""
WITH keyed AS (
  SELECT doc_id,
         md5('{EPOCH_SEED}' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents
),
sharded AS (
  SELECT doc_id, k,
         CAST(CAST('0x' || substr(k, 1, 4) AS INTEGER)
              % {EPOCH_SHARDS} AS INTEGER) AS shard
  FROM keyed
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) - 1
            AS BIGINT) AS pos
FROM sharded
"""


# -- weight-proportional systematic sampling ------------------------------

#: systematic sample size (docs picked ∝ token count); fixture-scale
SAMPLE_K = 40
#: doc_ids per prefix-sum bucket.  Production tuning: pick the span so
#: n_buckets ≈ corpus_rows / 10^6 — the bucket table stays a few MB and
#: its cumulative window is driver-trivial while each bucket's in-range
#: window is executor-local.
PS_BUCKET_SPAN = 100


def q_curation_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional SYSTEMATIC sampling: pick ~``SAMPLE_K`` docs
    with probability proportional to token count, by walking the global
    token axis and taking one doc every ``total_tokens / k`` tokens —
    the classic importance-sampling layout step (upsample long docs,
    never pick empty ones) with ZERO per-item randomness: all integer
    arithmetic, so the sample is reproducible across engines and runs.

    Scale shape — a global prefix sum WITHOUT a global sort: doc_ids
    are range-bucketed (``doc_id DIV span``); per-bucket token totals
    are one map-side-combined agg over a tiny table; bucket offsets are
    a window over that bucket table only (bucket-count rows, never
    corpus rows); each doc's global cumulative position is then its
    bucket offset + an in-bucket running sum partitioned BY bucket.
    The final pick predicate ``(cum·k) DIV W > ((cum−w)·k) DIV W`` is
    pure scan-stage integer math (``cum·k`` fits BIGINT up to ~9·10¹⁸;
    at extreme scale widen to DECIMAL(38,0) — same algebra).

    The DuckDB oracle deliberately uses the naive single global window
    formulation, so the two engines cross-check the *algorithm*, not
    the decomposition.
    """
    docs = load_table(spark, "documents", sf_dir)
    sized = docs.select(
        "doc_id",
        F.size(tokens("text")).cast("long").alias("w"),
        F.expr(f"doc_id DIV {PS_BUCKET_SPAN}").alias("__b"),
    )
    boff = (
        sized.groupBy("__b")
        .agg(F.sum("w").alias("__bw"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__bw").over(
                    Window.orderBy("__b").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .drop("__bw")
    )
    wtot = sized.agg(F.sum("w").alias("__W"))
    win = (
        Window.partitionBy("__b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        sized.withColumn("__incum", F.sum("w").over(win))
        .join(boff, "__b")
        .withColumn("cum", F.col("__off") + F.col("__incum"))
        .crossJoin(wtot)
    )
    picked = cum.filter(
        F.expr(f"(cum * {SAMPLE_K}) DIV __W")
        > F.expr(f"((cum - w) * {SAMPLE_K}) DIV __W")
    )
    return picked.select(
        "doc_id",
        F.col("w").alias("n_tokens"),
        F.expr(f"((cum - w) * {SAMPLE_K}) DIV __W").alias("sample_slot"),
    )


SQL_IMPORTANCE_SAMPLE = f"""
WITH sized AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS w
  FROM documents
),
c AS (
  SELECT doc_id, w,
         SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM sized
),
t AS (SELECT SUM(w) AS tw FROM sized)
SELECT doc_id, w AS n_tokens,
       CAST(((cum - w) * {SAMPLE_K}) // tw AS BIGINT) AS sample_slot
FROM c, t
WHERE (cum * {SAMPLE_K}) // tw > ((cum - w) * {SAMPLE_K}) // tw
"""


# -- token-budget quality threshold (data selection under budget) --------

#: fraction of total corpus tokens the selection may keep
BUDGET_FRAC = 0.4
BUDGET_BINS = 64


def q_curation_token_budget_threshold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Data selection under a token budget: find the quality threshold
    t* such that keeping docs with quality ≥ t* consumes ≈
    ``BUDGET_FRAC`` of the corpus's tokens — the "best N tokens"
    selection every budget-constrained pretraining run needs.

    The naive formulation is a GLOBAL sort by quality with a running
    token sum — a single-task sort at 100 TB.  Instead, the threshold
    comes from a token-WEIGHTED 64-bin histogram of the quality score
    (fixed sketch state, map-side combined; same chain as
    ``lineitem_winsorized_mean``): cumulate token mass from the TOP
    bin down, find the bin where the budget lands, interpolate t*
    linearly in token mass.  A second exact pass filters ``quality ≥
    t*`` and reports the realized selection — so the output carries
    both the estimate and its exact outcome, and the whole chain
    (binning, DESC cumulation, interpolation, filter) is replicated
    IEEE arithmetic that DuckDB hash-checks bit-for-bit."""
    docs = load_table(spark, "documents", sf_dir)
    from pu4spark_spark.operators.text import quality_score_expr

    tok = tokens("text")
    base = docs.select(
        "doc_id",
        F.size(tok).cast("bigint").alias("n_tokens"),
        quality_score_expr(tok).alias("q"),
    )
    gb = base.agg(
        F.min("q").alias("mn"),
        F.max("q").alias("mx"),
        F.sum("n_tokens").alias("tot"),
    )
    # degenerate all-equal-score corpus: pin bin 0 (the same guard as
    # q_text_quality_quantile_normalize — an unguarded (mx-mn) division
    # NULLs every bin and silently empties the result)
    bin_expr = F.when(
        F.col("mx") == F.col("mn"), F.lit(0).cast("bigint")
    ).otherwise(
        F.least(
            F.floor(
                ((F.col("q") - F.col("mn")) * F.lit(float(BUDGET_BINS)))
                / (F.col("mx") - F.col("mn"))
            ),
            F.lit(BUDGET_BINS - 1).cast("bigint"),
        )
    )
    binned = (
        base.crossJoin(F.broadcast(gb))
        .select(bin_expr.alias("bin"), "n_tokens")
        .groupBy("bin")
        .agg(F.sum("n_tokens").alias("w"))
    )
    # cumulate token mass from the TOP (highest-quality bin first)
    wdesc = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = binned.withColumn(
        "cum_above", F.coalesce(F.sum("w").over(wdesc), F.lit(0))
    )
    probes = gb.withColumn(
        "target", F.lit(BUDGET_FRAC) * F.col("tot").cast("double")
    )
    hit = probes.join(
        F.broadcast(cum),
        (F.col("cum_above").cast("double") < F.col("target"))
        & (
            F.col("target")
            <= (F.col("cum_above") + F.col("w")).cast("double")
        ),
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(float(BUDGET_BINS))
    frac = (
        F.col("target") - F.col("cum_above").cast("double")
    ) / F.col("w").cast("double")
    # taking `frac` of the bin's token mass from its TOP edge
    thr = hit.select(
        "mn",
        "mx",
        "tot",
        "target",
        (
            F.col("mn")
            + (F.col("bin").cast("double") + F.lit(1.0) - frac) * width
        ).alias("threshold_est"),
    )
    picked = base.crossJoin(F.broadcast(thr)).filter(
        F.col("q") >= F.col("threshold_est")
    )
    return picked.groupBy("threshold_est", "target", "tot").agg(
        F.count(F.lit(1)).alias("n_docs_selected"),
        F.sum("n_tokens").alias("tokens_selected"),
    ).select(
        "threshold_est",
        F.col("target").alias("target_tokens"),
        F.col("tot").alias("total_tokens"),
        "n_docs_selected",
        "tokens_selected",
    )


SQL_CURATION_TOKEN_BUDGET = f"""
WITH base AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, {{QSCORE}} AS q
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
),
gb AS (SELECT MIN(q) AS mn, MAX(q) AS mx, SUM(n_tokens) AS tot FROM base),
binned AS (
  SELECT CASE WHEN mx = mn THEN 0
              ELSE least(floor(((q - mn) * {float(BUDGET_BINS)}) / (mx - mn)),
                         {BUDGET_BINS - 1})
         END AS bin,
         SUM(n_tokens) AS w
  FROM base, gb GROUP BY 1
),
cum AS (
  SELECT bin, w,
         COALESCE(SUM(w) OVER (ORDER BY bin DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_above
  FROM binned
),
thr AS (
  SELECT mn, mx, tot, {BUDGET_FRAC} * CAST(tot AS DOUBLE) AS target,
         mn + (CAST(bin AS DOUBLE) + 1.0
               - (({BUDGET_FRAC} * CAST(tot AS DOUBLE)
                   - CAST(cum_above AS DOUBLE)) / CAST(w AS DOUBLE)))
              * ((mx - mn) / {float(BUDGET_BINS)}) AS threshold_est
  FROM gb, cum
  WHERE CAST(cum_above AS DOUBLE) < {BUDGET_FRAC} * CAST(tot AS DOUBLE)
    AND {BUDGET_FRAC} * CAST(tot AS DOUBLE)
        <= CAST(cum_above + w AS DOUBLE)
)
SELECT t.threshold_est,
       t.target AS target_tokens,
       CAST(t.tot AS BIGINT) AS total_tokens,
       COUNT(*) AS n_docs_selected,
       CAST(SUM(b.n_tokens) AS BIGINT) AS tokens_selected
FROM base b, thr t
WHERE b.q >= t.threshold_est
GROUP BY 1, 2, 3
"""


# -- weighted priority sampling ------------------------------------------

#: per-language sample size for the weighted draw
PRIORITY_SAMPLE_K = 20
#: key salt for the per-doc uniform
PRIORITY_SALT = "ws1"


def q_curation_weighted_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Size-weighted PRIORITY SAMPLING (Duffield–Lund–Thorup, JACM'07):
    draw K docs per language with inclusion probability ∝ doc size, by
    ranking on the priority ``q = w / u`` with ``u`` a per-doc uniform
    — the one-pass weighted sample every mixture pipeline needs when
    "sample documents uniformly" would under-represent token mass
    (a 10-token doc and a 10k-token doc are NOT the same amount of
    training data).

    Determinism/exactness: ``u`` is the md5-derived 32-bit integer
    coin (the ``curation_eval_holdout`` discipline, salted so this
    draw is independent of the holdout's), and the priority is ONE
    exact division ``(w·2³²) / (u+1)`` of int64s that stay below 2⁵³
    — both engines compute the identical double, so rank order and
    the priorities themselves hash-check.

    Scale shape: the coin and priority are scan-stage expressions;
    the per-language top-K runs through ``two_phase_rank`` (map-side
    cut to ≤K per input split, then ≤K·P survivors per language — no
    single-task sort of a language's full corpus)."""
    from pu4spark_spark.plans import two_phase_rank

    docs = load_table(spark, "documents", sf_dir)
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(PRIORITY_SALT),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    base = docs.select(
        "doc_id",
        "lang",
        F.col("n_chars").alias("weight"),
        (
            (F.col("n_chars") * F.lit(4294967296)).cast("double")
            / (u + F.lit(1)).cast("double")
        ).alias("priority"),
    )
    return two_phase_rank(
        base,
        ["lang"],
        [F.desc("priority"), F.asc("doc_id")],
        PRIORITY_SAMPLE_K,
        rank_col="rank",
    ).select(
        "lang", F.col("rank").cast("bigint").alias("rank"),
        "doc_id", "weight", "priority",
    )


SQL_CURATION_WEIGHTED_SAMPLE = f"""
WITH base AS (
  SELECT doc_id, lang, n_chars AS weight,
         CAST(n_chars * 4294967296 AS DOUBLE)
         / CAST(CAST(('0x' || substr(md5('{PRIORITY_SALT}' || ':'
                      || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                + 1 AS DOUBLE) AS priority
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, weight, priority,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY priority DESC, doc_id
         ) AS rank
  FROM base
)
SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, weight, priority
FROM ranked WHERE rank <= {PRIORITY_SAMPLE_K}
"""


# -- privacy: k-anonymity suppression -------------------------------------

K_ANON_K = 10


def q_curation_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release (suppression form): customers grouped by
    the quasi-identifier pair (market segment, nation); any QI cell
    with fewer than k members is SUPPRESSED — its rows re-aggregate
    into a single ``*``/``*`` residual cell, and the residual itself
    is dropped when its total membership is still below k — so no
    published row describes fewer than k people, including the
    residual.  The privacy partner to
    :func:`q_curation_pseudonymize_events` (tokenization hides WHO,
    k-anonymity hides small crowds).

    Shapes at 100 TB: one groupBy over the QI pair (map-side combined;
    QI cardinality is segments × nations, tiny), then a second
    aggregate over the relabeled cells that is bounded by the CELL
    count, not the row count — the relabel + re-aggregate never
    touches the raw table again."""
    cust = load_table(spark, "customer", sf_dir)
    cells = cust.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("bal"),
    )
    ok = F.col("n") >= K_ANON_K
    return (
        cells.select(
            F.when(ok, F.col("c_mktsegment")).otherwise("*").alias("segment"),
            F.when(ok, F.col("c_nationkey").cast("string"))
            .otherwise("*")
            .alias("nation"),
            "n",
            "bal",
        )
        .groupBy("segment", "nation")
        .agg(
            F.sum("n").alias("n_customers"),
            F.sum("bal").cast("double").alias("sum_acctbal"),
        )
        # The residual cell aggregates all suppressed QI cells; if even
        # their union holds < k people, publishing it would still
        # describe a small crowd — drop it (cell-count-sized filter).
        .where(F.col("n_customers") >= K_ANON_K)
    )


SQL_K_ANONYMITY = f"""
WITH cells AS (
  SELECT c_mktsegment, c_nationkey,
         COUNT(*) AS n,
         SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
  FROM customer
  GROUP BY c_mktsegment, c_nationkey
),
relabeled AS (
  SELECT CASE WHEN n >= {K_ANON_K} THEN c_mktsegment ELSE '*' END
             AS segment,
         CASE WHEN n >= {K_ANON_K} THEN CAST(c_nationkey AS VARCHAR)
              ELSE '*' END AS nation,
         n, bal
  FROM cells
)
SELECT segment, nation,
       CAST(SUM(n) AS BIGINT) AS n_customers,
       CAST(SUM(bal) AS DOUBLE) AS sum_acctbal
FROM relabeled
GROUP BY segment, nation
HAVING SUM(n) >= {K_ANON_K}
"""


QUERIES = {
    "curation_pii_redact": q_curation_pii_redact,
    "curation_k_anonymity": q_curation_k_anonymity,
    "curation_weighted_sample": q_curation_weighted_sample,
    "pipeline_corpus_release": q_pipeline_corpus_release,
    "curation_decontaminate": q_curation_decontaminate,
    "curation_domain_mix": q_curation_domain_mix,
    "curation_shard_pack": q_curation_shard_pack,
    "curation_sequence_pack": q_curation_sequence_pack,
    "curation_repetition": q_curation_repetition,
    "curation_hash_split": q_curation_hash_split,
    "curation_stratified_sample": q_curation_stratified_sample,
    "curation_chunk_windows": q_curation_chunk_windows,
    "dedup_chunk_spans": q_dedup_chunk_spans,
    "dedup_span_removal": q_dedup_span_removal,
    "curation_token_offsets": q_curation_token_offsets,
    "curation_eval_holdout": q_curation_eval_holdout,
    "curation_soft_dedup_weights": q_curation_soft_dedup_weights,
    "curation_pseudonymize_events": q_curation_pseudonymize_events,
    "curation_user_coherent_sample": q_curation_user_coherent_sample,
    "curation_temperature_mix": q_curation_temperature_mix,
    "curation_oov_rate": q_curation_oov_rate,
    "pipeline_chunk_release": q_pipeline_chunk_release,
    "curation_chunk_windows_udtf": q_curation_chunk_windows_udtf,
    "curation_bloom_decontaminate": q_curation_bloom_decontaminate,
    "curation_importance_sample": q_curation_importance_sample,
    "curation_token_budget_threshold": q_curation_token_budget_threshold,
    "curation_epoch_shuffle": q_curation_epoch_shuffle,
    "curation_mix_planner": q_curation_mix_planner,
    "curation_fuzzy_decontaminate": q_curation_fuzzy_decontaminate,
    "curation_dup_rate_by_source": q_curation_dup_rate_by_source,
}

ORACLE_SQL = {
    "curation_pii_redact": SQL_PII_REDACT,
    "curation_k_anonymity": SQL_K_ANONYMITY,
    "pipeline_corpus_release": SQL_PIPELINE_CORPUS_RELEASE,
    "curation_decontaminate": SQL_DECONTAMINATE,
    "curation_domain_mix": SQL_DOMAIN_MIX,
    "curation_shard_pack": SQL_SHARD_PACK,
    "curation_sequence_pack": SQL_SEQUENCE_PACK,
    "curation_repetition": SQL_REPETITION,
    "curation_hash_split": SQL_HASH_SPLIT,
    "curation_stratified_sample": SQL_STRATIFIED_SAMPLE,
    "curation_chunk_windows": SQL_CHUNK_WINDOWS,
    "dedup_chunk_spans": SQL_DEDUP_CHUNK_SPANS,
    "dedup_span_removal": SQL_DEDUP_SPAN_REMOVAL,
    "curation_token_offsets": SQL_CURATION_TOKEN_OFFSETS,
    "curation_eval_holdout": SQL_CURATION_EVAL_HOLDOUT,
    "curation_soft_dedup_weights": SQL_CURATION_SOFT_DEDUP,
    "curation_pseudonymize_events": SQL_PSEUDONYMIZE_EVENTS,
    "curation_user_coherent_sample": SQL_USER_COHERENT_SAMPLE,
    "curation_weighted_sample": SQL_CURATION_WEIGHTED_SAMPLE,
    "curation_temperature_mix": SQL_TEMPERATURE_MIX,
    "curation_oov_rate": SQL_OOV_RATE,
    "pipeline_chunk_release": SQL_PIPELINE_CHUNK_RELEASE,
    "curation_chunk_windows_udtf": SQL_CHUNK_WINDOWS_UDTF,
    "curation_bloom_decontaminate": SQL_BLOOM_DECONTAMINATE,
    "curation_importance_sample": SQL_IMPORTANCE_SAMPLE,
    "curation_token_budget_threshold": SQL_CURATION_TOKEN_BUDGET.replace(
        "{QSCORE}", _SQL_QSCORE
    ),
    "curation_epoch_shuffle": SQL_EPOCH_SHUFFLE,
    "curation_mix_planner": SQL_MIX_PLANNER,
    "curation_fuzzy_decontaminate": SQL_FUZZY_DECONTAMINATE,
    "curation_dup_rate_by_source": SQL_DUP_RATE_BY_SOURCE,
}
