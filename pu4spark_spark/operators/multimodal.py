"""Multimodal column plumbing (north-star extension, SURVEY.md §2B).

Images/audio/video are carried as opaque ``binary`` payload columns with
a typed metadata struct.  The Spark-side machinery — schema, Arrow batch
shape, ``mapInPandas`` signature, partitioning — is real and tested; the
actual media decoding is STUBBED (``decode_image`` raises
``NotImplementedError`` unless a decoder library is importable — none is
in this container) behind a deterministic fake feature extractor so the
pipeline is end-to-end verifiable, including against the DuckDB oracle.

Scale notes: payloads stay in the executors (never collected); the
pandas stages are Arrow-batched (``spark.sql.execution.arrow``), the
per-batch work is O(bytes); at 100 TB the same pipeline runs unchanged
with binary columns read straight from parquet.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pu4spark_spark.sources import load_table

#: width of the fake "pixel head" window the stub decoder reads —
#: measured in *characters* of the UTF-8-decoded payload (not raw bytes)
#: so the head sum is well-defined for any unicode payload and matches
#: the oracle's per-character code-point sum exactly
HEAD_BYTES = 16


def pack_documents(docs: DataFrame) -> DataFrame:
    """documents → multimodal layout: opaque binary payload + metadata
    struct (mime/n_bytes/source) — the schema every decode stage takes."""
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
        F.col("source").alias("origin"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def decode_image(payload: bytes) -> tuple[int, int, float]:
    """Real media decode: ``(width, height, mean_luma)`` via
    Pillow + numpy when importable at runtime; otherwise raises
    ``NotImplementedError`` (this container ships no decoder, so the
    deterministic ``fake_features`` path below is what the harness
    exercises).  The import is attempted per call on purpose — the
    decision must be made inside the executor-side Python worker, where
    the library may or may not be installed, not at driver import."""
    try:
        import PIL.Image
    except ImportError as e:
        raise NotImplementedError(
            "media decoding requires an image library (e.g. Pillow); "
            "use fake_features (deterministic stub) in this environment"
        ) from e
    import io

    import numpy as np

    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    arr = np.asarray(img, dtype="float64")
    return int(img.width), int(img.height), float(arr.mean())


def fake_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode+feature-extract: byte length,
    code-point sum of the first HEAD_BYTES decoded characters, and a
    fake frame count."""
    head = payload.decode("utf-8")[:HEAD_BYTES]
    return len(payload), sum(ord(c) for c in head), len(payload) % 7 + 1


def extract_features(packed: DataFrame) -> DataFrame:
    """Arrow-batched ``mapInPandas`` feature extraction over the binary
    payload — the real decode would slot into ``fake_features``."""
    schema = "doc_id long, n_bytes long, head_sum long, n_frames int"

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            feats = pdf["payload"].map(fake_features)
            out = pdf[["doc_id"]].copy()
            out["n_bytes"] = feats.map(lambda t: t[0])
            out["head_sum"] = feats.map(lambda t: t[1])
            out["n_frames"] = feats.map(lambda t: t[2])
            yield out

    return packed.mapInPandas(run, schema=schema)


def q_mm_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata of the packed layout (struct field access + binary
    length) — pure Catalyst, oracle-checked."""
    docs = load_table(spark, "documents", sf_dir)
    packed = pack_documents(docs)
    return packed.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.origin").alias("origin"),
    )


SQL_MM_PACK_STATS = """
SELECT doc_id,
       'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       source AS origin
FROM documents
"""


def q_mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pack → mapInPandas decode-stub pipeline.  The oracle
    recomputes the fake features from the text (payload is its UTF-8
    encoding), validating the Arrow batch plumbing end-to-end."""
    docs = load_table(spark, "documents", sf_dir)
    return extract_features(pack_documents(docs))


SQL_MM_DECODE_FEATURES = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(list_sum(list_transform(range(1, least(length(text), {HEAD_BYTES}) + 1),
                                    i -> ascii(substr(text, i, 1)))) AS BIGINT) AS head_sum,
       CAST(octet_length(encode(text)) % 7 + 1 AS INTEGER) AS n_frames
FROM documents
"""


# -- frame sampling (1-to-N decode) ---------------------------------------

#: fixed frame width in decoded characters — the stand-in for video
#: frame extraction / audio windowing (real decoders slot into the same
#: 1-to-N mapInPandas shape)
FRAME_CHARS = 64


def sample_frames(packed: DataFrame) -> DataFrame:
    """Arrow-batched 1-to-N frame sampling: every payload explodes into
    fixed-width frames with per-frame features.  This is the row-count-
    changing UDTF shape (decode → many frames) that tumbling substring
    logic can't express column-wise; output rows stay on the executors.
    """
    schema = "doc_id long, frame_idx int, frame_len int, code_sum long"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8")
                for i in range(0, len(text), FRAME_CHARS):
                    fr = text[i : i + FRAME_CHARS]
                    ids.append(doc_id)
                    idxs.append(i // FRAME_CHARS)
                    lens.append(len(fr))
                    sums.append(sum(ord(c) for c in fr))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "code_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return packed.mapInPandas(run, schema=schema)


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return sample_frames(pack_documents(docs))


SQL_MM_FRAME_SAMPLE = f"""
WITH frames AS (
  SELECT doc_id, CAST(t.i AS INTEGER) AS frame_idx,
         substr(text, CAST(t.i AS INTEGER) * {FRAME_CHARS} + 1,
                {FRAME_CHARS}) AS frame
  FROM documents,
       UNNEST(range(0, CAST(ceil(length(text) / {FRAME_CHARS}.0) AS BIGINT)))
         AS t(i)
)
SELECT doc_id, frame_idx,
       CAST(length(frame) AS INTEGER) AS frame_len,
       CAST(coalesce(list_sum(list_transform(range(1, length(frame) + 1),
                                             j -> ascii(substr(frame, j, 1)))),
                     0) AS BIGINT) AS code_sum
FROM frames
"""


# -- mapInArrow: zero-copy columnar payload stats ------------------------

def q_mm_arrow_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload byte statistics via ``mapInArrow`` — the LOWEST
    Python boundary the engine exposes: RecordBatches flow into
    ``pyarrow.compute`` kernels (vectorized C++, no pandas
    materialization, no per-row Python) and straight back.  This is the
    right boundary when the per-batch work is itself columnar — here
    ``binary_length`` and ``count_substring`` over the opaque payload —
    and the cheapest possible Python detour at 100 TB: payload bytes
    are never copied into Python objects at all.
    """
    packed = pack_documents(load_table(spark, "documents", sf_dir))

    def stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            doc = b.column(0)
            pay = b.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    doc,
                    pc.cast(pc.binary_length(pay), pa.int64()),
                    pc.cast(pc.count_substring(pay, " "), pa.int64()),
                ],
                names=["doc_id", "n_bytes", "n_spaces"],
            )

    return packed.select("doc_id", "payload").mapInArrow(
        stats, "doc_id long, n_bytes long, n_spaces long"
    )


SQL_MM_ARROW_PAYLOAD_STATS = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
         AS n_spaces
FROM documents
"""


# -- content-defined chunking (binary dedup primitive) -------------------

#: gear table: 256 deterministic 64-bit values derived from md5 — the
#: rolling-hash alphabet, identical across runs/engines/seeds
def _gear_table() -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"gear:{i}".encode()).hexdigest()[:16], 16)
        for i in range(256)
    ]


GEAR = _gear_table()
#: boundary when the low 6 bits of the rolling hash are zero → ~64-byte
#: average chunks (fixture payloads are a few hundred bytes; production
#: media would use KB-scale masks — one constant)
CDC_MASK = 0x3F
CDC_MIN, CDC_MAX = 16, 256
_U64 = (1 << 64) - 1


def cdc_boundaries(payload: bytes) -> list[tuple[int, int]]:
    """Gear-hash content-defined chunking: cut-candidate positions
    depend only on the trailing ≤64 bytes of content (the ``h << 1``
    shift ages bytes out of the 64-bit state), so an insertion early in
    the payload shifts at most the chunks up to the next candidate —
    every later chunk keeps its hash (fixed-stride chunking would shift
    EVERY later boundary, destroying dedup).  The hash deliberately
    does NOT reset at cuts: a reset would make candidates depend on cut
    phase and repetitive content would never resync after an edit
    (measured: 0 shared chunks on a periodic payload with reset, full
    resync without).  Min/max bounds cap pathological content; returns
    (offset, length) pairs."""
    chunks: list[tuple[int, int]] = []
    start = 0
    h = 0
    for i, b in enumerate(payload):
        h = ((h << 1) + GEAR[b]) & _U64
        ln = i + 1 - start
        if (ln >= CDC_MIN and (h & CDC_MASK) == 0) or ln >= CDC_MAX:
            chunks.append((start, ln))
            start = i + 1
    if start < len(payload):
        chunks.append((start, len(payload) - start))
    return chunks


def cdc_chunk_table(packed: DataFrame) -> DataFrame:
    """Arrow-batched 1-to-N chunking of binary payloads: every payload
    explodes into content-defined chunks with offsets and content
    hashes — the substrate for byte-level dedup of image/audio/video
    columns, where n-gram shingling has no meaning.  Payload bytes stay
    executor-side; output is chunk metadata only (hashes + offsets),
    which is what ships to the dedup join at 100 TB — never the bytes.
    """
    schema = (
        "doc_id long, chunk_idx int, offset int, length int, "
        "chunk_md5 string"
    )

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, idxs, offs, lens, digs = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for ci, (off, ln) in enumerate(cdc_boundaries(data)):
                    ids.append(doc_id)
                    idxs.append(ci)
                    offs.append(off)
                    lens.append(ln)
                    digs.append(hashlib.md5(data[off : off + ln]).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int32"),
                    "length": pd.Series(lens, dtype="int32"),
                    "chunk_md5": pd.Series(digs, dtype="object"),
                }
            )

    return packed.select("doc_id", "payload").mapInPandas(run, schema=schema)


def q_mm_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC chunk table over packed documents — rows-only (a rolling
    hash is not SQL-expressible); a CPython reference chunker and
    shift-invariance property tests pin the semantics
    (``tests/test_text_multimodal.py``)."""
    docs = load_table(spark, "documents", sf_dir)
    return cdc_chunk_table(pack_documents(docs))


def q_mm_cdc_dup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate chunks: one map-side-combined groupBy
    over the chunk hashes — ``dedup_bytes`` is what a content-addressed
    store saves.  Composes the CDC explode with the exact-dedup shape;
    only chunk METADATA is shuffled."""
    chunks = q_mm_cdc_chunks(spark, sf_dir)
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.max("length").alias("length"),
            (F.max("length") * (F.count(F.lit(1)) - 1)).alias("dedup_bytes"),
        )
        .filter(F.col("n_copies") > 1)
    )


# -- perceptual average-hash (aHash) near-dup over payloads --------------

AHASH_BITS = 64
#: pigeonhole band count = AHASH_HAMMING_K + 1 (two 32-bit halves)
AHASH_HAMMING_K = 1
_AHASH_BAND_MASK = (1 << (AHASH_BITS // 2)) - 1


def ahash_fingerprints(packed: DataFrame) -> DataFrame:
    """64-bit average-hash per payload — the perceptual-dedup shape for
    media columns: downscale to a fixed 64-cell grid, then bit j = 1
    iff cell j is brighter than the grid mean.  A real image pipeline
    computes cells from decoded pixels (8×8 luma downscale); here the
    deterministic stand-in "decodes" the payload as UTF-8 and averages
    code points over 64 equal-length segments — same grid algebra,
    same robustness property (a local edit perturbs a few cells, so
    near-identical payloads land within small hamming distance, unlike
    content hashes).  Contract: empty payloads have no fingerprint.

    Execution shape mirrors ``dedup.simhash_fingerprints`` — explode
    to one row per character inside whole-stage codegen, ONE
    map-side-combined groupBy(doc_id) computes the 64 segment sums
    (the exchange carries one 64-counter row per doc, not the payload
    bytes), and the bit-pack is a single projected expression.  Bit 63
    maps to the BIGINT sign bit (two's complement), matching the
    SimHash convention so the same band/xor machinery applies.
    """
    txt = F.decode(F.col("payload"), "UTF-8")
    base = packed.select(
        "doc_id", txt.alias("__txt")
    ).filter(F.char_length("__txt") > 0)
    chars = base.select(
        "doc_id",
        F.char_length("__txt").alias("__n"),
        F.posexplode(F.split("__txt", "")).alias("__q", "__c"),
    )
    segd = chars.select(
        "doc_id",
        F.expr(f"(__q * {AHASH_BITS}) div __n").alias("__seg"),
        F.ascii("__c").alias("__cp"),
    )
    sums = segd.groupBy("doc_id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN __seg = {i} THEN __cp ELSE 0 END)"
            ).alias(f"__p{i}")
            for i in range(AHASH_BITS)
        ]
    )
    tot = " + ".join(f"__p{i}" for i in range(AHASH_BITS))
    staged = sums.selectExpr("*", f"({tot}) AS __tot")

    def bit_term(j: int) -> str:
        one = (
            "(CAST(-9223372036854775807 AS BIGINT) - 1)"
            if j == AHASH_BITS - 1
            else f"CAST({1 << j} AS BIGINT)"
        )
        return (
            f"(CASE WHEN {AHASH_BITS} * __p{j} > __tot"
            f" THEN {one} ELSE CAST(0 AS BIGINT) END)"
        )

    fp = " | ".join(bit_term(j) for j in range(AHASH_BITS))
    return staged.select("doc_id", F.expr(fp).alias("ahash"))


def q_mm_ahash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return ahash_fingerprints(pack_documents(docs))


def q_mm_ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptually-near payload pairs at hamming ≤ 1 — the pigeonhole
    band join (two 32-bit halves: any pair differing in ≤1 bit agrees
    exactly on one half) over the aHash table, then exact
    ``bit_count(xor)`` verify.  Identical scale shape to
    ``dedup_simhash_hamming``: one equi-join shuffle on a band key
    whose cardinality (2^32 per position) grows with fingerprint
    width, never a quadratic all-pairs compare."""
    fp = ahash_fingerprints(
        pack_documents(load_table(spark, "documents", sf_dir))
    )
    h = F.col("ahash")
    bands = fp.select(
        "doc_id",
        "ahash",
        F.posexplode(
            F.array(
                h.bitwiseAND(F.lit(_AHASH_BAND_MASK)),
                F.shiftright(h, AHASH_BITS // 2).bitwiseAND(
                    F.lit(_AHASH_BAND_MASK)
                ),
            )
        ).alias("band_pos", "band_val"),
    )
    a = bands.select(
        F.col("doc_id").alias("a_id"),
        F.col("ahash").alias("ha"),
        "band_pos",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"),
        F.col("ahash").alias("hb"),
        "band_pos",
        "band_val",
    )
    cand = (
        a.join(b, ["band_pos", "band_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "ha", "hb")
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= AHASH_HAMMING_K)
        .select("a_id", "b_id", "hamming")
    )


def _sql_ahash_core() -> str:
    sums = ",\n         ".join(
        f"SUM(CASE WHEN seg = {i} THEN cp ELSE 0 END) AS p{i}"
        for i in range(AHASH_BITS)
    )
    tot = " + ".join(f"p{i}" for i in range(AHASH_BITS))

    def bit_term(j: int) -> str:
        one = (
            "(-9223372036854775807 - 1)"
            if j == AHASH_BITS - 1
            else f"CAST({1 << j} AS BIGINT)"
        )
        return (
            f"(CASE WHEN {AHASH_BITS} * p{j} > tot"
            f" THEN {one} ELSE CAST(0 AS BIGINT) END)"
        )

    fp = "\n       | ".join(bit_term(j) for j in range(AHASH_BITS))
    return f"""abase AS (
  SELECT doc_id, string_split(text, '') AS cs, length(text) AS n
  FROM documents WHERE length(text) > 0
),
achars AS (
  SELECT doc_id, n, unnest(range(n)) AS q, cs FROM abase
),
asegd AS (
  SELECT doc_id, (q * {AHASH_BITS}) // n AS seg,
         ascii(cs[CAST(q + 1 AS INT)]) AS cp
  FROM achars
),
asums AS (SELECT doc_id, {sums} FROM asegd GROUP BY doc_id),
afp AS (
  SELECT doc_id, {fp} AS ahash
  FROM (SELECT *, {tot} AS tot FROM asums)
)"""


SQL_MM_AHASH_FINGERPRINT = f"""
WITH {_sql_ahash_core()}
SELECT doc_id, ahash FROM afp
"""

SQL_MM_AHASH_NEAR_DUP = f"""
WITH {_sql_ahash_core()},
bands AS (
  SELECT doc_id, ahash, u.band_pos, u.band_val
  FROM afp, UNNEST([
      {{'band_pos': 0, 'band_val': ahash & {_AHASH_BAND_MASK}}},
      {{'band_pos': 1,
        'band_val': (ahash >> {AHASH_BITS // 2}) & {_AHASH_BAND_MASK}}}
  ]) AS t(u)
),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
         a.ahash AS ha, b.ahash AS hb
  FROM bands a JOIN bands b
    ON a.band_pos = b.band_pos AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT a_id, b_id, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(ha, hb)) <= {AHASH_HAMMING_K}
"""


def q_mm_payload_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAYLOAD INTEGRITY audit before any decode runs: per-payload byte
    histogram statistics — total bytes, distinct byte values, and the
    heaviest byte's count/share — the cheap screen that catches
    truncated, zero-filled, constant-padded, or double-encoded blobs
    in a 100 TB media lake without ever invoking a decoder (a real
    image/audio payload has high byte diversity; a corrupt one is a
    handful of values).  ``is_suspect`` uses integer cross-
    multiplication (≤4 distinct values or one byte ≥ 20% of the blob).

    Execution shape — the SimHash discipline (§5b lesson 1): the
    payload hex-encodes once, a codegen ``explode(sequence)`` +
    substring projects one row per byte (co-located, no repartition),
    and ONE map-side-combined groupBy(doc, byte) reduces to ≤256
    counter rows per doc before the exchange.  DuckDB reproduces the
    identical hex-pair arithmetic, so every count hash-checks."""
    from pu4spark_spark.plans import spread

    docs = spread(load_table(spark, "documents", sf_dir))
    mm = pack_documents(docs)
    hexed = mm.select(
        "doc_id",
        F.hex(F.col("payload")).alias("hx"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )
    by_byte = (
        hexed.select(
            "doc_id",
            "n_bytes",
            F.explode(
                F.sequence(F.lit(0), F.col("n_bytes") - 1)
            ).alias("i"),
            "hx",
        )
        .select(
            "doc_id",
            "n_bytes",
            F.substring(F.col("hx"), F.col("i") * 2 + 1, 2).alias("b"),
        )
        .groupBy("doc_id", "n_bytes", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = by_byte.groupBy("doc_id", "n_bytes").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_bytes"),
        F.max("c").alias("top_byte_count"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n_bytes").cast("bigint").alias("n_bytes"),
        "n_distinct_bytes",
        "top_byte_count",
        (F.col("top_byte_count").cast("double") / F.col("n_bytes")).alias(
            "top_byte_share"
        ),
        (
            (F.col("n_distinct_bytes") <= 4)
            | (F.col("top_byte_count") * 5 >= F.col("n_bytes"))
        ).alias("is_suspect"),
    )


SQL_MM_PAYLOAD_BYTE_STATS = """
WITH hexed AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n_bytes
  FROM documents
),
by_byte AS (
  SELECT doc_id, n_bytes, substr(hx, t.i * 2 + 1, 2) AS b,
         COUNT(*) AS c
  FROM hexed,
       UNNEST(generate_series(0, CAST(n_bytes - 1 AS BIGINT))) AS t(i)
  GROUP BY doc_id, n_bytes, b
)
SELECT doc_id,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_bytes,
       CAST(MAX(c) AS BIGINT) AS top_byte_count,
       CAST(MAX(c) AS DOUBLE) / n_bytes AS top_byte_share,
       (COUNT(*) <= 4 OR MAX(c) * 5 >= n_bytes) AS is_suspect
FROM by_byte
GROUP BY doc_id, n_bytes
"""


QUERIES = {
    "mm_pack_stats": q_mm_pack_stats,
    "mm_payload_byte_stats": q_mm_payload_byte_stats,
    "mm_decode_features": q_mm_decode_features,
    "mm_frame_sample": q_mm_frame_sample,
    "mm_arrow_payload_stats": q_mm_arrow_payload_stats,
    # rows-only pair: rolling-hash chunking is not SQL-expressible;
    # CPython reference + shift-invariance tests pin the semantics
    "mm_cdc_chunks": q_mm_cdc_chunks,
    "mm_cdc_dup_chunks": q_mm_cdc_dup_chunks,
    "mm_ahash_fingerprint": q_mm_ahash_fingerprint,
    "mm_ahash_near_dup": q_mm_ahash_near_dup,
}

ORACLE_SQL = {
    "mm_pack_stats": SQL_MM_PACK_STATS,
    "mm_payload_byte_stats": SQL_MM_PAYLOAD_BYTE_STATS,
    "mm_decode_features": SQL_MM_DECODE_FEATURES,
    "mm_frame_sample": SQL_MM_FRAME_SAMPLE,
    "mm_arrow_payload_stats": SQL_MM_ARROW_PAYLOAD_STATS,
    "mm_ahash_fingerprint": SQL_MM_AHASH_FINGERPRINT,
    "mm_ahash_near_dup": SQL_MM_AHASH_NEAR_DUP,
}
