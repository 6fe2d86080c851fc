"""PARQUET shard payloads under the mini-lake protocol (VERDICT r13
next #1): columnar staging through the shared shard builder, the
reader's RecordBatch fast path + row-tuple fallback, format dispatch
per shard (mixed tables), tombstones/pruning/mapping/evolution parity
with the JSONL payload, and the compaction migration path."""

from __future__ import annotations

import datetime
import decimal
import json
import os

import pytest

from pu4spark_spark.sources import pydatasource as P
from pu4spark_spark.sources.lake.protocol import (
    _arrow_batch_schema_of_ddl,
    _arrow_type_of_ddl,
    _iter_parquet_batches,
    _iter_parquet_rows,
)
from pu4spark_spark.sources.lake.source import JsonlDocsReader

DDL = (
    "doc_id bigint, text string, lang string, source string, "
    "n_chars bigint"
)


def _write(spark, rows, ddl, out, parts=2, **opts):
    w = (
        spark.createDataFrame(rows, ddl)
        .repartition(parts, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .option("payload_format", "parquet")
    )
    for k, v in opts.items():
        w = w.option(k, v)
    w.mode("overwrite").save()


def test_parquet_roundtrip_and_shard_extension(spark, tmp_path):
    P.register_pyds(spark)
    out = str(tmp_path / "t")
    rows = [(i, f"d{i}", "en", "s", i * 2) for i in range(50)]
    _write(spark, rows, DDL, out)
    files = [f for f in os.listdir(out) if not f.startswith("_")]
    assert files and all(f.endswith(".parquet") for f in files)
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert sorted((r["doc_id"], r["n_chars"]) for r in back.collect()) == [
        (i, i * 2) for i in range(50)
    ]


def test_parquet_typed_cells_batch_path(spark, tmp_path):
    """decimal / date / binary survive the RecordBatch fast path
    exactly (the schema is batch-safe, so the reader must pick it)."""
    P.register_pyds(spark)
    out = str(tmp_path / "typed")
    ddl = "doc_id bigint, price decimal(10,2), day date, blob binary"
    rows = [
        (i, decimal.Decimal(f"{i}.25"), datetime.date(2020, 1, 1 + i),
         bytes([i, i + 1]))
        for i in range(5)
    ]
    _write(spark, rows, ddl, out, parts=1)
    assert JsonlDocsReader({"path": out})._pa_target is not None
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


def test_parquet_timestamp_tuple_fallback(spark, tmp_path):
    """Timestamps make the schema batch-UNSAFE (Spark's arrow type
    carries the session tz an executor cannot know) — the reader falls
    back to row tuples and values still round-trip exactly."""
    P.register_pyds(spark)
    out = str(tmp_path / "ts")
    ddl = "doc_id bigint, ts timestamp"
    rows = [(i, datetime.datetime(2021, 1, 1, 0, 0, i)) for i in range(4)]
    _write(spark, rows, ddl, out, parts=1)
    assert JsonlDocsReader({"path": out})._pa_target is None
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


def test_parquet_pruning_all_axes(spark, tmp_path):
    """_STATS pruning is payload-independent (stats are computed from
    the row dicts before serialization): doc_id zonemap, per-column
    envelope, null counts, blooms, and partition values all prune
    parquet shards."""
    P.register_pyds(spark)
    out = str(tmp_path / "prune")
    rows = [
        (i, f"d{i}", "en" if i < 200 else "fr", "s",
         i if i % 7 else None)
        for i in range(400)
    ]
    (
        spark.createDataFrame(rows, DDL)
        .repartitionByRange(8, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .option("payload_format", "parquet")
        .option("bloom_filter_columns", "doc_id")
        .mode("overwrite")
        .save()
    )
    total = len(JsonlDocsReader({"path": out}).partitions())
    r = JsonlDocsReader({"path": out})
    r._lo = 390
    assert len(r.partitions()) == 1
    r = JsonlDocsReader({"path": out})
    r._col_rng = {"n_chars": [395, None]}
    assert len(r.partitions()) == 1
    r = JsonlDocsReader({"path": out})
    r._eq_sets = {"doc_id": [{999_999}]}
    assert len(r.partitions()) == 0
    r = JsonlDocsReader({"path": out})
    r._null_req = {"n_chars": {"null"}}
    assert 0 < len(r.partitions()) <= total
    # engine-level exactness rides the pushed filters
    got = sorted(
        row["doc_id"]
        for row in spark.read.format("jsonl_docs").option("path", out)
        .load().filter("doc_id >= 395").collect()
    )
    assert got == [395, 396, 397, 398, 399]


def test_parquet_projection_reads_only_needed_columns(tmp_path):
    """The columnar payload's point: the shard scan materializes ONLY
    the projected columns (JSONL must parse whole rows regardless).
    Pinned at the iterator level: batches carry exactly the requested
    fields, and a tombstoned scan adds only doc_id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "wide.parquet")
    n = 100
    cols = {f"c{j}": list(range(n)) for j in range(10)}
    cols["doc_id"] = list(range(n))
    pq.write_table(pa.table(cols), p)

    target = _arrow_batch_schema_of_ddl("c1 bigint, c7 bigint")
    batches = list(_iter_parquet_batches(p, ("c1", "c7"), target))
    assert all(b.schema.names == ["c1", "c7"] for b in batches)
    assert sum(b.num_rows for b in batches) == n

    # tombstones: doc_id rides along for the mask, output unchanged
    batches = list(
        _iter_parquet_batches((p, (0, 1), ()), ("c1", "c7"), target)
    )
    assert all(b.schema.names == ["c1", "c7"] for b in batches)
    assert sum(b.num_rows for b in batches) == n - 2

    # row-tuple fallback projects identically
    rows = list(_iter_parquet_rows((p, (0, 1), ()), ("c1", "c7")))
    assert len(rows) == n - 2 and all(len(t) == 2 for t in rows)


def test_parquet_null_doc_id_survives_tombstones(tmp_path):
    """A NULL doc_id is never in a tombstone set — the vectorized
    anti-membership mask must KEEP null-key rows (is_in yields null
    for nulls; an unfilled null would be dropped by filter)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "nulls.parquet")
    pq.write_table(
        pa.table({"doc_id": [1, None, 3], "v": ["a", "b", "c"]}), p
    )
    target = _arrow_batch_schema_of_ddl("doc_id bigint, v string")
    got = []
    for b in _iter_parquet_batches((p, (3,), ()), ("doc_id", "v"), target):
        got += list(zip(b.column(0).to_pylist(), b.column(1).to_pylist()))
    assert got == [(1, "a"), (None, "b")]
    rows = list(_iter_parquet_rows((p, (3,), ()), ("doc_id", "v")))
    assert rows == [(1, "a"), (None, "b")]


def test_mixed_format_table_and_version_stream(spark, tmp_path):
    """One table, both payloads: reads union both, a DELETE's
    tombstones apply to both formats' scans, and the VERSION STREAM
    delivers parquet-commit shards like jsonl ones."""
    P.register_pyds(spark)
    out = str(tmp_path / "mixed")
    a = [(i, f"d{i}", "en", "s", i) for i in range(0, 10)]
    b = [(i, f"d{i}", "fr", "s", i) for i in range(10, 20)]
    spark.createDataFrame(a, DDL).coalesce(1).write.format(
        "jsonl_docs"
    ).option("path", out).mode("overwrite").save()
    spark.createDataFrame(b, DDL).coalesce(1).write.format(
        "jsonl_docs"
    ).option("path", out).option("payload_format", "parquet").mode(
        "append"
    ).save()
    exts = {
        f.rsplit(".", 1)[1]
        for f in os.listdir(out)
        if not f.startswith("_")
    }
    assert exts == {"jsonl", "parquet"}
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert back.count() == 20
    P.delete_from_jsonl_dir(out, [5, 15])  # one key per format
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert sorted(r["doc_id"] for r in back.collect()) == [
        i for i in range(20) if i not in (5, 15)
    ]
    # version stream over the mixed history (ignore_deletes: the
    # delete commit cannot be retracted by an append-only stream)
    q = (
        spark.readStream.format("jsonl_docs")
        .option("path", out)
        .option("versioned", "true")
        .option("ignore_deletes", "true")
        .load()
        .writeStream.format("memory")
        .queryName("mixed_vs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"] for r in spark.sql("select * from mixed_vs").collect()
    )
    assert got == [i for i in range(20) if i not in (5, 15)]


def test_compaction_preserves_and_migrates_payload(spark, tmp_path):
    """Default OPTIMIZE preserves an all-parquet table's columnar
    payload; payload_format='parquet' on a JSONL table is the
    migration path (content-neutral either way)."""
    P.register_pyds(spark)
    rows = [(i, f"d{i}", "en", "s", i) for i in range(100)]

    pq_tbl = str(tmp_path / "pq")
    _write(spark, rows, DDL, pq_tbl, parts=4)
    P.compact_jsonl_dir(spark, pq_tbl, 2)
    with open(os.path.join(pq_tbl, "_MANIFEST.v2")) as fh:
        files = [f for f in json.load(fh) if not f.startswith("_")]
    assert files and all(f.endswith(".parquet") for f in files)

    js_tbl = str(tmp_path / "js")
    spark.createDataFrame(rows, DDL).repartition(4, "doc_id").write \
        .format("jsonl_docs").option("path", js_tbl) \
        .mode("overwrite").save()
    P.compact_jsonl_dir(spark, js_tbl, 2, payload_format="parquet")
    with open(os.path.join(js_tbl, "_MANIFEST.v2")) as fh:
        files = [f for f in json.load(fh) if not f.startswith("_")]
    assert files and all(f.endswith(".parquet") for f in files)
    for tbl in (pq_tbl, js_tbl):
        got = sorted(
            r["doc_id"]
            for r in spark.read.format("jsonl_docs").option("path", tbl)
            .load().collect()
        )
        assert got == list(range(100))


def test_parquet_column_mapping_physical_keys(spark, tmp_path):
    """Post-rename parquet appends carry the PHYSICAL column name in
    the file (column-mapping invariant), and reads resolve the logical
    name across pre- and post-rename shards."""
    import pyarrow.parquet as pq

    P.register_pyds(spark)
    out = str(tmp_path / "map")
    _write(spark, [(1, "a", "en", "s", 5)], DDL, out, parts=1)
    P.rename_jsonl_column(out, "n_chars", "length")
    ddl2 = (
        "doc_id bigint, text string, lang string, source string, "
        "length bigint"
    )
    spark.createDataFrame([(2, "b", "fr", "s", 9)], ddl2).coalesce(1) \
        .write.format("jsonl_docs").option("path", out) \
        .option("payload_format", "parquet").mode("append").save()
    with open(os.path.join(out, "_MANIFEST.v3")) as fh:
        m = json.load(fh)
    new = [f for f in m if not f.startswith("_") and f.endswith(".parquet")]
    newest = max(new, key=lambda f: os.path.getmtime(os.path.join(out, f)))
    names = pq.ParquetFile(os.path.join(out, newest)).schema_arrow.names
    assert "n_chars" in names and "length" not in names
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert sorted((r["doc_id"], r["length"]) for r in back.collect()) == [
        (1, 5),
        (2, 9),
    ]


def test_parquet_type_widening_casts_old_shards(spark, tmp_path):
    """Pre-widen parquet shards carry the NARROW arrow type; after
    widen_jsonl_column the batch path casts them up to the declared
    type (int32 → int64) — values exact, schema the widened one."""
    P.register_pyds(spark)
    out = str(tmp_path / "wide")
    ddl = "doc_id bigint, n int"
    spark.createDataFrame([(1, 10), (2, 20)], ddl).coalesce(1).write \
        .format("jsonl_docs").option("path", out) \
        .option("payload_format", "parquet").mode("overwrite").save()
    P.widen_jsonl_column(out, "n", "bigint")
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert dict(back.dtypes)["n"] == "bigint"
    assert sorted((r["doc_id"], r["n"]) for r in back.collect()) == [
        (1, 10),
        (2, 20),
    ]


def test_stream_sink_parquet_payload(spark, tmp_path):
    """The streaming sink stages parquet micro-batch shards under the
    same OCC/_txn contract."""
    P.register_pyds(spark)
    land = str(tmp_path / "land")
    sink = str(tmp_path / "sink")
    rows = [(i, f"d{i}", "en", "s", i) for i in range(12)]
    spark.createDataFrame(rows, DDL).coalesce(3).write.mode(
        "overwrite"
    ).json(land)
    q = (
        spark.readStream.format("jsonl_docs")
        .option("path", land)
        .load()
        .writeStream.format("jsonl_docs")
        .option("path", sink)
        .option("payload_format", "parquet")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    files = [f for f in os.listdir(sink) if not f.startswith("_")]
    assert files and all(f.endswith(".parquet") for f in files)
    back = spark.read.format("jsonl_docs").option("path", sink).load()
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(12))


def test_unsupported_payload_types_fail_at_plan_time(spark, tmp_path):
    P.register_pyds(spark)
    out = str(tmp_path / "bad")
    df = spark.createDataFrame(
        [(1, {"a": 1})], "doc_id bigint, m map<string,int>"
    )
    with pytest.raises(Exception, match="unsupported column type"):
        df.write.format("jsonl_docs").option("path", out).option(
            "payload_format", "parquet"
        ).mode("overwrite").save()
    with pytest.raises(Exception, match="payload_format"):
        spark.createDataFrame([(1,)], "doc_id bigint").write.format(
            "jsonl_docs"
        ).option("path", out).option("payload_format", "orc").mode(
            "overwrite"
        ).save()


def test_arrow_type_map_matches_spark():
    """The DDL→arrow map must agree with Spark's own to_arrow_type for
    every batch-safe type — a divergence would feed the JVM a batch it
    misreads."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_type
    from pyspark.sql import types as T

    cases = {
        "string": T.StringType(),
        "bigint": T.LongType(),
        "int": T.IntegerType(),
        "smallint": T.ShortType(),
        "tinyint": T.ByteType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "boolean": T.BooleanType(),
        "date": T.DateType(),
        "binary": T.BinaryType(),
        "decimal(10,2)": T.DecimalType(10, 2),
    }
    for ddl, st in cases.items():
        assert _arrow_type_of_ddl(ddl) == to_arrow_type(st), ddl
    assert _arrow_batch_schema_of_ddl("a bigint, b timestamp") is None
    assert _arrow_batch_schema_of_ddl("a bigint, b array<double>") is None
    sch = _arrow_batch_schema_of_ddl("a bigint, b string")
    assert sch == pa.schema([("a", pa.int64()), ("b", pa.string())])


def test_parquet_row_group_pruning(spark, tmp_path):
    """One level below the shard zonemap: pushed numeric bounds skip
    ROW GROUPS inside a surviving parquet shard via the footer's own
    min/max stats — and deletion-vector positions stay exact across
    skipped groups (each group carries its absolute start offset)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pu4spark_spark.sources.lake.protocol import (
        _parquet_row_groups,
        _write_atomic_excl,
    )

    P.register_pyds(spark)
    out = str(tmp_path / "rg")
    os.makedirs(out)
    # 400 range-ordered rows × 50-row groups = 8 row groups in 1 shard
    # (crafted directly: the engine writer sizes groups at 64Ki rows —
    # far above a fixture — so the multi-group layout is hand-built
    # and hand-committed; the read path is the code under test)
    shard = "part-00000-rgtest.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(400), pa.int64()),
                "text": [f"d{i}" for i in range(400)],
                "lang": ["en"] * 400,
                "source": ["s"] * 400,
                "n_chars": pa.array(range(400), pa.int64()),
            }
        ),
        os.path.join(out, shard),
        row_group_size=50,
    )
    _write_atomic_excl(
        os.path.join(out, "_MANIFEST.v1"),
        json.dumps({shard: 400, "_ts": 1}),
    )
    pf = pq.ParquetFile(os.path.join(out, shard))
    assert pf.metadata.num_row_groups == 8

    # bounds helper: doc_id >= 390 keeps only the LAST group (offset
    # preserved), doc_id <= 10 only the first, out-of-domain none
    assert _parquet_row_groups(pf, {"doc_id": (390, None)}) == [(7, 350)]
    assert _parquet_row_groups(pf, {"doc_id": (None, 10)}) == [(0, 0)]
    assert _parquet_row_groups(pf, {"doc_id": (1000, None)}) == []
    # unknown / unbounded columns never prune
    assert len(_parquet_row_groups(pf, {"nope": (1, 2)})) == 8
    assert len(_parquet_row_groups(pf, None)) == 8
    pf.close()

    # engine exactness through the pushed filter (bounds ride the
    # pickled reader into read())
    got = sorted(
        r["doc_id"]
        for r in spark.read.format("jsonl_docs").option("path", out)
        .load().filter("doc_id >= 390").collect()
    )
    assert got == list(range(390, 400))

    # DV positions stay exact when earlier groups are skipped: delete
    # row 395 (position 395 in the shard), read with a bound that
    # skips groups 0..6 — the mask must hit exactly position 395
    P.delete_from_jsonl_dir(out, [395], spark=spark,
                            deletion_vectors=True)
    got = sorted(
        r["doc_id"]
        for r in spark.read.format("jsonl_docs").option("path", out)
        .load().filter("doc_id >= 390").collect()
    )
    assert got == [390, 391, 392, 393, 394, 396, 397, 398, 399]


def test_columns_option_source_projection(spark, tmp_path):
    """option('columns'): source-level projection (the Python DS API
    has no Catalyst column pruning, so narrowing must narrow the
    DECLARED schema) — served columns and order match the list,
    tombstones/DVs still apply (doc_id rides internally even when
    unprojected), unknown names fail loudly, streams refuse it."""
    P.register_pyds(spark)
    out = str(tmp_path / "cols")
    rows = [(i, f"d{i}", "en", "s", i) for i in range(30)]
    _write(spark, rows, DDL, out, parts=1)
    df = (
        spark.read.format("jsonl_docs")
        .option("path", out)
        .option("columns", "n_chars,doc_id")
        .load()
    )
    assert df.columns == ["n_chars", "doc_id"]
    assert sorted((r["doc_id"], r["n_chars"]) for r in df.collect()) == [
        (i, i) for i in range(30)
    ]
    P.delete_from_jsonl_dir(out, [3])  # ledger tombstone
    P.delete_from_jsonl_dir(out, [4], spark=spark, deletion_vectors=True)
    got = sorted(
        r["n_chars"]
        for r in spark.read.format("jsonl_docs").option("path", out)
        .option("columns", "n_chars").load().collect()
    )
    assert got == [i for i in range(30) if i not in (3, 4)]
    with pytest.raises(Exception, match="unknown columns"):
        spark.read.format("jsonl_docs").option("path", out).option(
            "columns", "nope"
        ).load().collect()
    # a stream with the option fails loudly when it starts
    s = (
        spark.readStream.format("jsonl_docs")
        .option("path", out)
        .option("columns", "n_chars")
        .load()
    )
    q = (
        s.writeStream.format("memory")
        .queryName("cols_refused")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="batch-read projection"):
        q.awaitTermination(60)
