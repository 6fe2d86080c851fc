"""Text-format sources/sinks (CSV, JSON-lines) — SURVEY.md §2B
scans/sources row.

Schema is ALWAYS explicit: at 100 TB, schema inference is a full extra
pass over the data before the real job starts (and a silently wrong one
when late files drift).  Readers here refuse to infer — callers pass a
``StructType`` or DDL string, which also makes the scan plan stable
across runs.  Malformed rows are quarantined PERMISSIVE-style into a
``_corrupt_record`` column rather than failing the whole 1000-executor
job, unless ``strict=True`` (FAILFAST).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def load_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
    strict: bool = False,
) -> DataFrame:
    """Schema-explicit CSV scan (no inference pass)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(path)
    )


def load_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    strict: bool = False,
) -> DataFrame:
    """Schema-explicit JSON-lines scan (no inference pass)."""
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path)
    )


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    """CSV sink with a timestamp format the readers above round-trip."""
    (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .csv(path)
    )


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink, timestamp format symmetric with ``load_json``."""
    (
        df.write.mode(mode)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path)
    )


def load_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """ORC scan — the other columnar format Spark ships natively.  ORC
    files embed their schema (no inference pass either way), so
    ``schema`` is optional and, when given, acts as projection +
    type-check; predicate pushdown and column pruning reach the ORC
    reader exactly as with parquet."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zstd-compressed, matching the parquet default)."""
    df.write.mode(mode).option("compression", "zstd").orc(path)


# -- registered round-trip queries ----------------------------------------
# The format layer enters the driver's correctness artifact directly:
# each query WRITES a fixture projection in the text/columnar format,
# re-reads it with the schema-explicit reader, aggregates, and must
# hash-match a DuckDB oracle computed straight from the parquet — an
# end-to-end fidelity proof (timestamps at microsecond precision,
# doubles, longs) rather than a unit-test-only claim.

def _scratch(sf_dir: str, kind: str) -> str:
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    # per-process suffix: concurrent sessions (bench + pytest) must not
    # rmtree each other's in-flight roundtrip dirs (ADVICE r4)
    d = os.path.join(
        tempfile.gettempdir(), f"pu4spark_fmt_{kind}_{tag}_{os.getpid()}"
    )
    shutil.rmtree(d, ignore_errors=True)
    return d


def _artifact(sf_dir: str, kind: str) -> str:
    """Like :func:`_scratch` but NOT cleared on each call — for
    build-once-probe-many layouts (the caller checks ``_SUCCESS``)."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"pu4spark_fmt_{kind}_{tag}")


def q_fmt_csv_roundtrip(spark: SparkSession, sf_dir: str):
    from pyspark.sql import functions as F

    from pu4spark_spark.sources import load_table

    from pu4spark_spark.plans import spread

    # single-file fixture scans arrive as ONE partition; the per-row
    # timestamp formatting + IO of a text-format write is exactly the
    # "heavy per-row work" case SURVEY §5b prescribes spread() for
    # (measured 8.4 s -> ~1 s at sf0.1), and a distributed write is
    # the correct 100 TB shape anyway
    orders = spread(
        load_table(spark, "orders", sf_dir).select(
            "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
        )
    )
    path = _scratch(sf_dir, "csv")
    write_csv(orders, path)
    # o_orderdate is TIMESTAMP_NTZ (parquet ms timestamps with
    # isAdjustedToUTC=false): the reader schema must say so, and the
    # writer/reader pair round-trips it via timestampNTZFormat
    back = load_csv(
        spark,
        path,
        "o_orderkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz",
    )
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_total"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


SQL_FMT_CSV_ROUNDTRIP = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
       CAST(MIN(o_orderdate) AS TIMESTAMP) AS first_date,
       CAST(MAX(o_orderdate) AS TIMESTAMP) AS last_date
FROM orders
GROUP BY o_orderstatus
"""


def q_fmt_json_roundtrip(spark: SparkSession, sf_dir: str):
    from pyspark.sql import functions as F

    from pu4spark_spark.sources import load_table

    from pu4spark_spark.plans import spread

    events = spread(
        load_table(spark, "events", sf_dir).select(
            "event_id", "user_id", "event_type", "value", "ts"
        )
    )
    path = _scratch(sf_dir, "json")
    write_json(events, path)
    back = load_json(
        spark,
        path,
        "event_id bigint, user_id bigint, event_type string, "
        "value double, ts timestamp",
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
            "sum_value"
        ),
        F.max("ts").alias("last_ts"),
    )


SQL_FMT_JSON_ROUNDTRIP = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(MAX(ts) AS TIMESTAMP) AS last_ts
FROM events
GROUP BY event_type
"""


def q_fmt_orc_roundtrip(spark: SparkSession, sf_dir: str):
    from pyspark.sql import functions as F

    from pu4spark_spark.sources import load_table

    from pu4spark_spark.plans import spread

    li = spread(
        load_table(spark, "lineitem", sf_dir).select(
            "l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate"
        )
    )
    path = _scratch(sf_dir, "orc")
    write_orc(li, path)
    back = load_orc(spark, path).filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias(
            "sum_qty"
        ),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


SQL_FMT_ORC_ROUNDTRIP = """
SELECT COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
"""


def q_fmt_text_roundtrip(spark: SparkSession, sf_dir: str):
    """Raw-text source/sink (``spark.read/write.text``) — the line-
    oriented landing format a scrape pipeline starts from.  Documents
    serialize as TAB-joined lines (the word-soup text contains no
    tabs), round-trip through the text format, and are re-parsed with
    scan-stage split/cast — the aggregate must match the parquet
    truth.  The text source is splittable at newlines, so at 100 TB
    the read parallelizes exactly like any other line format."""
    from pyspark.sql import functions as F

    from pu4spark_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir).select(
        F.concat_ws(
            "\t", F.col("doc_id"), F.col("lang"), F.col("text")
        ).alias("value")
    )
    path = _scratch(sf_dir, "text")
    docs.write.mode("overwrite").text(path)
    back = spark.read.text(path).select(
        F.split_part(F.col("value"), F.lit("\t"), F.lit(1))
        .cast("bigint")
        .alias("doc_id"),
        F.split_part(F.col("value"), F.lit("\t"), F.lit(2)).alias("lang"),
        F.split_part(F.col("value"), F.lit("\t"), F.lit(3)).alias("text"),
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


SQL_FMT_TEXT_ROUNDTRIP = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM documents
GROUP BY lang
"""


def q_fmt_xml_roundtrip(spark: SparkSession, sf_dir: str):
    """XML source/sink (built into Spark 4 as ``format("xml")``) —
    the interchange format enterprise feeds still arrive in.  Parts
    serialize as ``<part>`` row elements, round-trip through the XML
    reader with an EXPLICIT schema (inference on XML is an extra full
    pass, same policy as the other text formats here), and the
    per-brand aggregate must match the parquet truth.  The XML reader
    splits on row tags, so the scan parallelizes over files like any
    text source."""
    from pyspark.sql import functions as F

    from pu4spark_spark.sources import load_table

    from pu4spark_spark.plans import spread

    parts = spread(
        load_table(spark, "part", sf_dir).select(
            "p_partkey", "p_brand", "p_size", "p_retailprice"
        )
    )
    path = _scratch(sf_dir, "xml")
    (
        parts.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "parts")
        .option("rowTag", "part")
        .save(path)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "part")
        .schema(
            "p_partkey bigint, p_brand string, p_size bigint, "
            "p_retailprice double"
        )
        .load(path)
    )
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.sum("p_size").alias("sum_size"),
        F.min("p_partkey").alias("first_part"),
        F.max("p_partkey").alias("last_part"),
    )


SQL_FMT_XML_ROUNDTRIP = """
SELECT p_brand,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_price,
       CAST(SUM(p_size) AS BIGINT) AS sum_size,
       MIN(p_partkey) AS first_part,
       MAX(p_partkey) AS last_part
FROM part
GROUP BY p_brand
"""


def _pct_escape(col):
    """Percent-escape %/TAB/LF/CR in a string column — applied to
    EVERY string field of the TAB landing line (keys included), so no
    literal value can collide with the separators or the "%00" NULL
    sentinel (a literal "%00" escapes to "%2500")."""
    from pyspark.sql import functions as F

    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(col, "%", "%25"),
                "\t", "%09"),
            "\n", "%0A"),
        "\r", "%0D")


def tagged_line_expr():
    """The TAB landing-line writer expression for doc_id/lang/text.
    The format is only well-defined if no field contains the
    separators: percent-escape %/TAB/LF/CR in every string field
    (unambiguous, round-tripped by the UDTF parser).  NULL handling is
    per-field: the KEY columns (doc_id, lang) use NULL-PROPAGATING
    concat + raise_error so a NULL key fails loudly instead of
    silently shifting fields (concat_ws skips NULLs); the free-text
    column stays NULLABLE — a NULL text lands as the "%00" sentinel,
    collision-free for ALL fields because the escape runs on keys too."""
    from pyspark.sql import functions as F

    keys = F.concat(
        F.col("doc_id").cast("string"),
        F.lit("\t"),
        _pct_escape(F.col("lang")),
    )
    return F.concat(
        F.when(keys.isNotNull(), keys).otherwise(
            F.raise_error(
                F.lit("fmt_text_parse_udtf: NULL key column in landing row")
            )
        ),
        F.lit("\t"),
        F.coalesce(_pct_escape(F.col("text")), F.lit("%00")),
    )


def q_fmt_text_parse_udtf(spark: SparkSession, sf_dir: str):
    """POLYMORPHIC Python UDTF (``analyze()``-driven schema): a
    schema-on-read parser for the TAB landing format whose output
    columns come from a DDL string argument resolved AT PLAN TIME —
    the one UDTF capability a static ``returnType`` can't express
    (the registered function adapts to any field spec the caller
    passes).  Spark calls ``analyze`` with the constant-folded spec,
    gets the StructType back, and plans the LATERAL join with real
    per-field types.

    API-parity demo like ``curation_chunk_windows_udtf`` — per-row
    Python, never the production path (the scan-stage ``split_part``
    twin in ``fmt_text_roundtrip`` does the same work in codegen) —
    and it must hash-match the SAME oracle as that twin, proving the
    two parse paths agree row-for-row."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udtf

    from pu4spark_spark.sources import load_table

    @udtf
    class ParseTagged:
        @staticmethod
        def analyze(line, spec):
            # runs in a session-less Python worker: build the schema by
            # hand (StructType.fromDDL needs the JVM parser)
            from pyspark.sql.types import (
                IntegerType,
                LongType,
                StringType,
                StructField,
                StructType,
            )
            from pyspark.sql.udtf import AnalyzeResult

            if spec.value is None:
                raise ValueError(
                    "parse_tagged: field spec must be a constant string"
                )
            tmap = {
                "bigint": LongType(),
                "long": LongType(),
                "int": IntegerType(),
                "string": StringType(),
            }
            fields = []
            for part in spec.value.split(","):
                name, typ = part.strip().split()
                fields.append(StructField(name, tmap[typ.lower()]))
            return AnalyzeResult(schema=StructType(fields))

        def eval(self, line: str, spec: str):
            if line is None:
                return
            parts = line.split("\t")
            types = [s.strip().split()[1].lower() for s in spec.split(",")]
            row = []
            for i, t in enumerate(types):
                v = parts[i] if i < len(parts) else None
                if v is not None and t in ("bigint", "long", "int"):
                    v = int(v)
                elif v == "%00":
                    # the writer's NULL sentinel for nullable string
                    # fields — unambiguous because a literal "%00" in
                    # the data escapes to "%2500"
                    v = None
                elif v is not None:
                    # undo the writer's percent-escape of the field/row
                    # separators (%25 LAST so escaped escapes survive)
                    v = (
                        v.replace("%09", "\t")
                        .replace("%0A", "\n")
                        .replace("%0D", "\r")
                        .replace("%25", "%")
                    )
                row.append(v)
            yield tuple(row)

    spark.udtf.register("parse_tagged", ParseTagged)

    docs = load_table(spark, "documents", sf_dir).select(
        tagged_line_expr().alias("value")
    )
    path = _scratch(sf_dir, "text_udtf")
    docs.write.mode("overwrite").text(path)
    spark.read.text(path).createOrReplaceTempView("__tagged_lines")
    parsed = spark.sql(
        "SELECT p.doc_id, p.lang, p.text "
        "FROM __tagged_lines, "
        "LATERAL parse_tagged("
        "value, 'doc_id bigint, lang string, text string') AS p"
    )
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


QUERIES = {
    "fmt_csv_roundtrip": q_fmt_csv_roundtrip,
    "fmt_text_roundtrip": q_fmt_text_roundtrip,
    "fmt_json_roundtrip": q_fmt_json_roundtrip,
    "fmt_orc_roundtrip": q_fmt_orc_roundtrip,
    "fmt_xml_roundtrip": q_fmt_xml_roundtrip,
    "fmt_text_parse_udtf": q_fmt_text_parse_udtf,
}

ORACLE_SQL = {
    "fmt_csv_roundtrip": SQL_FMT_CSV_ROUNDTRIP,
    "fmt_text_roundtrip": SQL_FMT_TEXT_ROUNDTRIP,
    "fmt_json_roundtrip": SQL_FMT_JSON_ROUNDTRIP,
    "fmt_orc_roundtrip": SQL_FMT_ORC_ROUNDTRIP,
    "fmt_xml_roundtrip": SQL_FMT_XML_ROUNDTRIP,
    # the polymorphic UDTF parse must agree with the codegen parse twin
    "fmt_text_parse_udtf": SQL_FMT_TEXT_ROUNDTRIP,
}


def q_fmt_partition_pruned_scan(spark: SparkSession, sf_dir: str):
    """Directory-partitioned layout, driver-witnessed: embeddings are
    written partitioned by their sign-LSH bucket, re-read with a
    single-bucket filter (PartitionFilters prune the other directories
    before a row is read — plan-gated in tests/test_sinks.py), and
    aggregated per label.  The oracle computes the same bucket
    predicate from the raw embeddings, so the partition column's
    round-trip fidelity is value-checked, not assumed."""
    from pyspark.sql import functions as F

    from pu4spark_spark.functions.vectors import sign_bucket
    from pu4spark_spark.sources import load_table, write_parquet

    dims = [0, 10, 20, 30, 40, 50]
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "label", sign_bucket("embedding", dims).alias("bucket")
    )
    path = _scratch(sf_dir, "part")
    write_parquet(emb, path, partition_by=["bucket"])
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("bucket") == 0)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.min("vec_id").alias("min_vec_id"),
        )
    )


def _sql_fmt_partition_pruned() -> str:
    from pu4spark_spark.functions.vectors import sql_sign_bucket

    bucket = sql_sign_bucket("embedding", [0, 10, 20, 30, 40, 50])
    return f"""
SELECT label, COUNT(*) AS n_vecs, MIN(vec_id) AS min_vec_id
FROM embeddings
WHERE {bucket} = 0
GROUP BY label
"""


QUERIES["fmt_partition_pruned_scan"] = q_fmt_partition_pruned_scan
ORACLE_SQL["fmt_partition_pruned_scan"] = _sql_fmt_partition_pruned()


def q_fmt_schema_evolution_scan(spark: SparkSession, sf_dir: str):
    """Schema-evolution read: a dataset whose early shards predate a
    column (here ``o_orderpriority``, added mid-stream) is read as ONE
    DataFrame with ``mergeSchema`` — pre-evolution rows surface the new
    column as NULL, exactly the additive-column contract a 100 TB lake
    lives with for years (a full rewrite of old shards being off the
    table).  The aggregate folds NULLs into a sentinel group, so the
    oracle value-checks the evolution semantics themselves: DuckDB
    derives which rows must be NULL from the same shard predicate.

    mergeSchema is a FOOTER-level union (schema reconciliation at
    planning, no data rewrite); per-file pushdown and pruning still
    apply to each shard's own columns."""
    from pyspark.sql import functions as F

    from pu4spark_spark.sources import load_table

    orders = load_table(spark, "orders", sf_dir)
    path = _scratch(sf_dir, "evolve")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    v1.write.mode("overwrite").parquet(f"{path}/shard=0")
    v2.write.mode("overwrite").parquet(f"{path}/shard=1")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/shard=0", f"{path}/shard=1"
    )
    return (
        back.groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("<pre-evolution>"))
            .alias("priority")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_total"),
        )
    )


SQL_FMT_SCHEMA_EVOLUTION = """
SELECT COALESCE(CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END,
                '<pre-evolution>') AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
FROM orders
GROUP BY 1
"""

QUERIES["fmt_schema_evolution_scan"] = q_fmt_schema_evolution_scan
ORACLE_SQL["fmt_schema_evolution_scan"] = SQL_FMT_SCHEMA_EVOLUTION


def _dpp_fact_dir(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent per-sf_dir build of the supplier-partitioned lineitem
    layout the DPP query probes (build once, probe per call — same
    artifact discipline as ``dedup.ensure_band_artifacts``)."""
    import os

    from pu4spark_spark.sources import load_table, write_parquet

    path = _artifact(sf_dir, "dppfact")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    write_parquet(li, path, partition_by=["l_suppkey"])
    return path


N_CORRUPT_LINES = 7


def q_fmt_json_corrupt_quarantine(spark: SparkSession, sf_dir: str):
    """PERMISSIVE ingestion with corrupt-record quarantine, end to end:
    the events feed lands as JSONL with ``N_CORRUPT_LINES`` malformed
    lines injected (truncated JSON, bare garbage — what real feeds
    contain), the schema-explicit reader quarantines them into
    ``_corrupt_record`` instead of failing the job, and the report
    proves NOTHING ELSE was lost: good-row count and exact-decimal
    value sum must match the parquet truth, corrupt count must equal
    the injected constant.  At 1000 executors a FAILFAST ingest dies on
    the first bad line of a 100 TB feed; this is the production mode.
    """
    import os as _os

    from pyspark.sql import functions as F

    from pu4spark_spark.sources import load_table

    events = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    path = _scratch(sf_dir, "jsonq")
    write_json(events, path)
    bad = _os.path.join(path, "zz_corrupt.jsonl")
    with open(bad, "w") as fh:
        for i in range(N_CORRUPT_LINES):
            fh.write('{"event_id": %d, "user_id": ' % i + "@@garbage@@\n")
    back = load_json(
        spark,
        path,
        "event_id bigint, user_id bigint, event_type string, "
        "value double, _corrupt_record string",
    )
    # caching is REQUIRED before referencing only-corrupt-column
    # predicates (Spark's documented raw-scan restriction); routed
    # through the ledger so the blocks release at the next registry
    # query's entry instead of lingering until a harness clearCache
    from pu4spark_spark.plans import cached

    back = cached(back)
    return back.agg(
        F.sum(F.col("_corrupt_record").isNull().cast("int"))
        .cast("bigint")
        .alias("n_good"),
        F.sum(F.col("_corrupt_record").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum(
            F.when(
                F.col("_corrupt_record").isNull(),
                F.col("value").cast("decimal(18,2)"),
            )
        )
        .cast("double")
        .alias("good_value_sum"),
    )


SQL_FMT_JSON_CORRUPT = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_good,
       CAST({N_CORRUPT_LINES} AS BIGINT) AS n_corrupt,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS good_value_sum
FROM events
"""


#: deterministic writer contract for the audited layout: each suppkey's
#: rows land in ONE task (repartition on the partition key) and roll to
#: a new file every AUDIT_MAX_RECORDS rows — so the file count per
#: partition directory is exactly ceil(rows / AUDIT_MAX_RECORDS), which
#: is what makes the audit ORACLE-CHECKABLE from the row-level truth.
AUDIT_MAX_RECORDS = 256


def _audit_fact_dir(spark: SparkSession, sf_dir: str) -> str:
    """Idempotent build of the audit target: supplier-partitioned
    lineitem written under the deterministic contract above (the DPP
    layout at :func:`_dpp_fact_dir` predates the contract and keeps its
    own artifact)."""
    import os

    from pu4spark_spark.sources import load_table, write_parquet

    path = _artifact(sf_dir, "auditfact")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice"
    )
    write_parquet(
        li.repartition("l_suppkey"),
        path,
        partition_by=["l_suppkey"],
        max_records_per_file=AUDIT_MAX_RECORDS,
    )
    return path


def audit_file_listing(
    spark: SparkSession, path: str, partition_col: str = "l_suppkey"
):
    """O(FILES) distributed listing of a partitioned layout: the
    ``binaryFile`` source with only path/length projected — the content
    column is NEVER selected, so no data byte is read (plan-gated in
    tests/test_plans.py); the partition key (``partition_col``, the
    Hive-style ``{col}={value}`` directory component — explicit so
    reuse on a differently-partitioned layout can't silently yield
    all-NULL keys) comes from the directory name and the exact
    per-file row count from the parquet FOOTER (a bounded pandas UDF
    over the file list, one footer read per file).  This is the
    audit's whole cost model: a 100 TB table with 100k files costs
    100k stat calls + 100k footer reads — never a row scan."""
    import re as _re

    from pyspark.sql import functions as F

    # type-hint-inferred scalar pandas UDF; built in a module without
    # `from __future__ import annotations` (which would stringify the
    # hints pandas_udf's inference reads) — the supported replacement
    # for the deprecated PandasUDFType functionType argument
    from pu4spark_spark.functions.arrow_udfs import parquet_footer_rows

    footer_rows = parquet_footer_rows()

    # bound the DISTRIBUTED listing job's task count (guide §6: file
    # listing is planning cost): Spark's parallel partition discovery
    # defaults to one task per directory (measured: a 1000-directory
    # layout spent ~6 s scheduling 1000 single-`ls` tasks — far more
    # than the listing itself).  Scale-adaptively cap it at 2× the
    # cluster parallelism — on a real cluster listing stays fully
    # distributed, locally it stops being a 1000-task job.
    # NOTE: this mutates the session-global conf for the duration of
    # the load (restored in `finally`).  Sound under the harness's
    # single-threaded driver; if queries ever plan concurrently on the
    # same SparkSession, scope the cap per-read (session clone) instead.
    par_conf = "spark.sql.sources.parallelPartitionDiscovery.parallelism"
    prev = spark.conf.get(par_conf, None)
    spark.conf.set(
        par_conf, str(2 * spark.sparkContext.defaultParallelism)
    )
    try:
        listed = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true")
            .load(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(par_conf)
        else:
            spark.conf.set(par_conf, prev)

    return (
        listed
        .select(
            # slash-bounded + re.escape: a col name that is a suffix of
            # another ("suppkey" inside "l_suppkey=") or contains regex
            # metacharacters cannot silently mismatch; integer-valued
            # keys are the helper's contract (cast target is bigint)
            F.regexp_extract(
                "path", rf"/{_re.escape(partition_col)}=(\d+)/", 1
            )
            .cast("bigint")
            .alias(partition_col),
            F.col("length").alias("bytes"),
            footer_rows("path").alias("rows"),
        )
    )


def q_fmt_file_metadata_audit(spark: SparkSession, sf_dir: str):
    """Small-file / layout audit, O(FILES) not O(rows): a distributed
    ``binaryFile`` listing of the supplier-partitioned fact layout
    (path + length only — the content column is never selected, so the
    audit reads ZERO data bytes; plan-gated), partition key derived
    from the directory path, exact per-file row counts from parquet
    footers.  At 100 TB small-file proliferation is a top-3
    operational problem, and a detector priced as a corpus scan would
    never be run — this one costs one stat + one footer read per file.

    Oracle-checkable because the layout is written under the
    deterministic contract (``repartition(key)`` +
    ``maxRecordsPerFile``): per suppkey, ``n_files`` must equal
    ``ceil(n_rows / AUDIT_MAX_RECORDS)`` — DuckDB re-derives both from
    the row-level truth.  Physical byte sizes are compression-dependent
    and stay pytest-pinned (``audit_file_listing`` exposes them)."""
    from pyspark.sql import functions as F

    path = _audit_fact_dir(spark, sf_dir)
    return (
        audit_file_listing(spark, path)
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("rows").cast("bigint").alias("n_rows"),
        )
    )


SQL_FMT_FILE_METADATA_AUDIT = f"""
SELECT l_suppkey,
       CAST((COUNT(*) + {AUDIT_MAX_RECORDS - 1}) // {AUDIT_MAX_RECORDS}
            AS BIGINT) AS n_files,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_suppkey
"""


def q_fmt_dpp_fact_scan(spark: SparkSession, sf_dir: str):
    """Dynamic partition pruning, witnessed end-to-end: the fact table
    is laid out partitioned by ``l_suppkey``; a selective dimension
    filter (suppliers of one nation) reaches the fact scan as a RUNTIME
    partition filter — Catalyst injects ``dynamicpruning#`` into the
    fact's PartitionFilters (plan-gated in tests/test_plans.py), reusing
    the dimension's broadcast as the IN-set, so only the matching
    partition directories are ever listed or read.  At 100 TB this is
    the difference between scanning one supplier's shard and scanning
    the table: static pruning can't help (the pruning values are known
    only after the dim filter runs), and without DPP the fact scan is
    full.  The oracle computes the same join from the raw tables."""
    from pyspark.sql import functions as F

    from pu4spark_spark.sources import load_table

    fact = spark.read.parquet(_dpp_fact_dir(spark, sf_dir))
    supp = (
        load_table(spark, "supplier", sf_dir)
        .filter(F.col("s_nationkey") == 13)
        .select("s_suppkey", "s_name")
    )
    return (
        fact.join(supp, fact["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (
                        F.lit("1.00").cast("decimal(18,2)")
                        - F.col("l_discount").cast("decimal(18,2)")
                    )
                ).cast("decimal(28,4)")
            )
            .cast("double")
            .alias("revenue"),
        )
    )


SQL_FMT_DPP_FACT_SCAN = """
SELECT s.s_name,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST('1.00' AS DECIMAL(18,2))
                   - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4)))
            AS DOUBLE) AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE s.s_nationkey = 13
GROUP BY s.s_name
"""

QUERIES["fmt_dpp_fact_scan"] = q_fmt_dpp_fact_scan
QUERIES["fmt_file_metadata_audit"] = q_fmt_file_metadata_audit
QUERIES["fmt_json_corrupt_quarantine"] = q_fmt_json_corrupt_quarantine
ORACLE_SQL["fmt_json_corrupt_quarantine"] = SQL_FMT_JSON_CORRUPT
ORACLE_SQL["fmt_dpp_fact_scan"] = SQL_FMT_DPP_FACT_SCAN
# n_files is derivable because the layout writer is deterministic
ORACLE_SQL["fmt_file_metadata_audit"] = SQL_FMT_FILE_METADATA_AUDIT
