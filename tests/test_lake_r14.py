"""Round-14 lake fixes: schema recording on table-creating commits,
stream-sink claim-loop schema re-check, compaction bloom rebuild,
reserved stats-key rejection, the fused single-pass zorder quantile
job, and fresh-stream first-trigger rate limiting."""

from __future__ import annotations

import json
import os

import pytest

from pu4spark_spark.sources import pydatasource as P
from pu4spark_spark.sources.lake.protocol import (
    BLOOM_M_BITS,
    SCHEMA_KEY,
    _write_atomic_excl,
)
from pu4spark_spark.sources.lake.source import (
    JsonlCommit,
    JsonlDocsReader,
    JsonlDocsStreamWriter,
)

DDL = (
    "doc_id bigint, text string, lang string, source string, "
    "n_chars bigint"
)


def test_append_creating_table_records_schema(spark, tmp_path):
    """A first APPEND into a fresh directory CREATES the table, so it
    must record the written shape like an overwrite does — otherwise a
    non-docs table created by append reads back NULL under the legacy
    documents DDL."""
    P.register_pyds(spark)
    out = str(tmp_path / "t")
    spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string") \
        .write.format("jsonl_docs").option("path", out) \
        .mode("append").save()
    with open(os.path.join(out, "_MANIFEST.v1")) as fh:
        m = json.load(fh)
    assert m.get(SCHEMA_KEY) == "k bigint, v string"
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert back.columns == ["k", "v"]
    assert sorted((r["k"], r["v"]) for r in back.collect()) == [
        (1, "a"),
        (2, "b"),
    ]


def _stage_shard(path: str, token: str, rows: list[dict]) -> JsonlCommit:
    """Hand-stage one temp shard the way a sink task would leave it."""
    final = "part-00000-deadbeef.jsonl"
    tmp = f"_tmp-{token}-{final}"
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, tmp), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    return JsonlCommit(tmp, final, len(rows))


def test_stream_sink_rebased_first_batch_records_schema(spark, tmp_path):
    """The DDL-recording rule is keyed on the BASE lacking ``_schema``
    (table creation), not on ``version == 1``: a first micro-batch that
    loses the v1 claim and re-bases must still record the table shape
    (and a re-base onto a table of a DIFFERENT shape must fail loudly
    in the claim loop — the write()-time check ran against a stale
    base)."""
    out = str(tmp_path / "sink")
    schema = spark.createDataFrame([], "k bigint, v string").schema
    w = JsonlDocsStreamWriter({"path": str(out)}, schema)
    msg = _stage_shard(out, w.job_token, [{"k": 1, "v": "a"}])
    w.commit([msg], 0)
    with open(os.path.join(out, "_MANIFEST.v1")) as fh:
        assert json.load(fh).get(SCHEMA_KEY) == "k bigint, v string"

    # claim-loop re-check: the table changed shape between staging and
    # commit (simulated: a schema-less docs-shaped base claimed v1
    # while our batch staged) — commit must raise, stage nothing
    out2 = str(tmp_path / "sink2")
    os.makedirs(out2)
    with open(os.path.join(out2, "docs.jsonl"), "w") as fh:
        fh.write(json.dumps({"doc_id": 1, "text": "t", "lang": "en",
                             "source": "s", "n_chars": 1}) + "\n")
    _write_atomic_excl(
        os.path.join(out2, "_MANIFEST.v1"),
        json.dumps({"docs.jsonl": 1, "_ts": 1}),
    )
    w2 = JsonlDocsStreamWriter({"path": str(out2)}, schema)
    msg2 = _stage_shard(out2, w2.job_token, [{"k": 9, "v": "z"}])
    with pytest.raises(ValueError, match="does not match table"):
        w2.commit([msg2], 0)
    # the staged shard was rolled back — in no manifest, not on disk
    leftovers = [
        f for f in os.listdir(out2) if f.startswith(("part-", "_tmp-"))
    ]
    assert leftovers == []


def test_reserved_rows_column_rejected(spark, tmp_path):
    """A column physically named ``_rows`` would overwrite the
    per-shard row-count sentinel inside ``_STATS['_nulls']`` and
    corrupt IsNotNull pruning — refused loudly at write time."""
    P.register_pyds(spark)
    out = str(tmp_path / "r")
    with pytest.raises(Exception, match="_rows.*reserved|reserved"):
        spark.createDataFrame([(1, 2)], "doc_id bigint, _rows bigint") \
            .write.format("jsonl_docs").option("path", out) \
            .mode("overwrite").save()


def test_bloom_buffer_sized_from_protocol_constant():
    from pu4spark_spark.sources.lake.source import _ShardSink
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        s = _ShardSink(d, "tok", 0, ["doc_id"], {}, None, ["doc_id"])
        assert len(s.blooms["doc_id"]) == BLOOM_M_BITS // 8
        s.add({"doc_id": 1})
        s.close()


def test_compaction_rebuilds_blooms(spark, tmp_path):
    """OPTIMIZE carries the bloom index across the rewrite (Delta
    rebuilds bloom indexes on OPTIMIZE): columns bloomed on any
    pre-compaction shard get fresh blooms on the rewritten shards,
    old shards' entries stay (snapshot reads still prune), and the
    post-compaction point lookup still skips shards."""
    P.register_pyds(spark)
    out = str(tmp_path / "bl")
    rows = [(i, f"d{i}", "en", "s", i) for i in range(400)]
    spark.createDataFrame(rows, DDL).repartition(8, "text") \
        .write.format("jsonl_docs").option("path", out) \
        .option("bloom_filter_columns", "doc_id") \
        .mode("overwrite").save()
    from pu4spark_spark.sources.lake.checkpoint import assemble_stats

    pre_bloom = assemble_stats(out)["_bloom"]
    assert len(pre_bloom) == 8

    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        P.compact_jsonl_dir(spark, out, target_shards=4)
    finally:
        spark.conf.set(key, old)

    with open(os.path.join(out, "_MANIFEST.v2")) as fh:
        new_files = [f for f in json.load(fh) if not f.startswith("_")]
    bloom = assemble_stats(out)["_bloom"]
    for f in new_files:
        assert "doc_id" in bloom.get(f, {}), f"no rebuilt bloom on {f}"
    for f in pre_bloom:  # old entries retained for snapshot reads
        assert f in bloom

    # the rebuilt index still prunes a point lookup
    r = JsonlDocsReader({"path": out})
    r._eq_sets = {"doc_id": [{999_999}]}
    assert len(r.partitions()) == 0
    got = sorted(
        row["doc_id"]
        for row in spark.read.format("jsonl_docs").option("path", out)
        .load().filter("doc_id in (7, 311)").collect()
    )
    assert got == [7, 311]


def test_zorder_is_one_quantile_pass(spark, tmp_path, monkeypatch):
    """The z-order pre-pass samples ALL z-columns in ONE
    ``approxQuantile`` call (the API takes a column list) — k columns
    must not cost k sampling scans of the pre-compaction table."""
    # patch the CLASSIC DataFrame (pyspark.sql.DataFrame is the
    # dispatching base in Spark 4; the override is what executes)
    from pyspark.sql.classic.dataframe import DataFrame

    P.register_pyds(spark)
    out = str(tmp_path / "z")
    rows = [(i, f"d{i}", "en", "s", (i * 37) % 500) for i in range(200)]
    spark.createDataFrame(rows, DDL).repartition(4, "text") \
        .write.format("jsonl_docs").option("path", out) \
        .mode("overwrite").save()

    calls: list = []
    orig = DataFrame.approxQuantile

    def counting(self, col, probabilities, relativeError):
        calls.append(col)
        return orig(self, col, probabilities, relativeError)

    monkeypatch.setattr(DataFrame, "approxQuantile", counting)
    P.compact_jsonl_dir(
        spark, out, target_shards=4, zorder_by=["doc_id", "n_chars"]
    )
    assert len(calls) == 1, f"expected ONE sampling job, got {calls}"
    assert isinstance(calls[0], list) and len(calls[0]) == 2
    got = sorted(
        r["doc_id"]
        for r in spark.read.format("jsonl_docs").option("path", out)
        .load().collect()
    )
    assert got == list(range(200))


def test_fresh_stream_first_trigger_rate_limited(spark, tmp_path):
    """A FRESH stream (initialOffset consulted) is bounded from its
    very first trigger — previously the floor stayed unset until
    partitions() ran and the first batch ingested the whole backlog.
    A restart (no initialOffset call) keeps the documented unbounded
    first trigger: the Python API's latestOffset carries no start
    offset to bound against."""
    from pu4spark_spark.sources.lake.streaming import (
        JsonlDocsStreamReader,
        JsonlDocsVersionStreamReader,
    )

    land = tmp_path / "land"
    land.mkdir()
    for i in range(6):
        (land / f"part-{i}.jsonl").write_text(
            json.dumps({"doc_id": i, "text": f"d{i}", "lang": "en",
                        "source": "s", "n_chars": 1}) + "\n"
        )
    r = JsonlDocsStreamReader(
        {"path": str(land), "max_files_per_trigger": "2"}
    )
    assert r.initialOffset() == {"index": 0}
    assert r.latestOffset() == {"index": 2}  # bounded first trigger
    # restart simulation: no initialOffset call → unbounded once
    r2 = JsonlDocsStreamReader(
        {"path": str(land), "max_files_per_trigger": "2"}
    )
    assert r2.latestOffset() == {"index": 6}

    # versioned reader: same seeding
    P.register_pyds(spark)
    tbl = str(tmp_path / "tbl")
    for _ in range(4):
        spark.createDataFrame(
            [(1, "t", "en", "s", 1)], DDL
        ).coalesce(1).write.format("jsonl_docs").option(
            "path", tbl
        ).mode("append").save()
    v = JsonlDocsVersionStreamReader(
        {"path": tbl, "max_versions_per_trigger": "1"}
    )
    assert v.initialOffset() == {"version": 0}
    assert v.latestOffset() == {"version": 1}  # bounded first trigger


def test_table_features_gate(spark, tmp_path):
    """Protocol versioning (Delta's table-features contract): a
    manifest requiring a feature this build does not know fails
    LOUDLY on read AND on write (batch, DML, maintenance) instead of
    being silently misread; known features pass; writers STAMP the
    features they introduce and the stamp is sticky across commits,
    compaction, clone, and restore."""
    from pu4spark_spark.sources.lake.protocol import FEATURES_KEY

    P.register_pyds(spark)
    out = str(tmp_path / "t")
    rows = [(i, f"d{i}", "en", "s", i) for i in range(8)]
    spark.createDataFrame(rows, DDL).coalesce(1).write.format(
        "jsonl_docs"
    ).option("path", out).mode("overwrite").save()

    # stamp: parquet append declares payload-parquet; rename declares
    # column-mapping; constraint declares check-constraints
    spark.createDataFrame(
        [(100, "x", "fr", "s", 1)], DDL
    ).coalesce(1).write.format("jsonl_docs").option("path", out).option(
        "payload_format", "parquet"
    ).mode("append").save()
    with open(os.path.join(out, "_MANIFEST.v2")) as fh:
        feats = json.load(fh).get(FEATURES_KEY, [])
    assert "payload-parquet" in feats
    P.rename_jsonl_column(out, "n_chars", "length")
    P.add_constraint_jsonl_dir(out, "pos", "doc_id >= 0")
    with open(os.path.join(out, "_MANIFEST.v4")) as fh:
        feats = set(json.load(fh).get(FEATURES_KEY, []))
    assert {"payload-parquet", "column-mapping",
            "check-constraints"} <= feats

    # sticky across compaction / clone / restore
    P.compact_jsonl_dir(spark, out, 1)
    with open(os.path.join(out, "_MANIFEST.v5")) as fh:
        assert "column-mapping" in json.load(fh).get(FEATURES_KEY, [])
    dst = str(tmp_path / "clone")
    P.clone_jsonl_dir(out, dst)
    with open(os.path.join(dst, "_MANIFEST.v1")) as fh:
        assert "column-mapping" in json.load(fh).get(FEATURES_KEY, [])
    P.restore_jsonl_dir(out, 1)  # v1 had no features; union keeps them
    with open(os.path.join(out, "_MANIFEST.v6")) as fh:
        assert "payload-parquet" in json.load(fh).get(FEATURES_KEY, [])

    # the gate: craft a FUTURE-feature commit; every consumer refuses
    fut = str(tmp_path / "future")
    spark.createDataFrame(rows, DDL).coalesce(1).write.format(
        "jsonl_docs"
    ).option("path", fut).mode("overwrite").save()
    with open(os.path.join(fut, "_MANIFEST.v1")) as fh:
        m = json.load(fh)
    m[FEATURES_KEY] = ["quantum-entangled-shards"]
    body = json.dumps(m)
    from pu4spark_spark.sources.lake.protocol import _write_atomic

    _write_atomic(os.path.join(fut, "_MANIFEST.v2"), body)
    _write_atomic(os.path.join(fut, "_MANIFEST"), body)

    with pytest.raises(Exception, match="unsupported feature"):
        spark.read.format("jsonl_docs").option("path", fut).load() \
            .collect()
    with pytest.raises(Exception, match="unsupported feature"):
        spark.createDataFrame(rows, DDL).coalesce(1).write.format(
            "jsonl_docs"
        ).option("path", fut).mode("append").save()
    with pytest.raises(Exception, match="unsupported feature"):
        P.delete_from_jsonl_dir(fut, [1])
    with pytest.raises(Exception, match="unsupported feature"):
        P.compact_jsonl_dir(spark, fut, 1)
    with pytest.raises(Exception, match="unsupported feature"):
        P.rename_jsonl_column(fut, "lang", "language")
    with pytest.raises(Exception, match="unsupported feature"):
        P.clone_jsonl_dir(fut, str(tmp_path / "c2"))
    # stream readers refuse at plan time too
    from pu4spark_spark.sources.lake.streaming import (
        JsonlDocsVersionStreamReader,
    )
    with pytest.raises(Exception, match="unsupported feature"):
        JsonlDocsVersionStreamReader({"path": fut})


def test_partition_scoped_optimize(spark, tmp_path):
    """OPTIMIZE WHERE (Delta's partition-scoped compaction): only the
    named partition's shards are rewritten — cold partitions keep
    their exact files — the consolidated shards keep their _parts
    pruning metadata, tombstones fold in, and the commit is a
    stream-skipped rewrite."""
    P.register_pyds(spark)
    out = str(tmp_path / "pw")
    rows = [
        (i, f"d{i}", "en" if i % 2 else "fr", "s", i) for i in range(40)
    ]
    # partitioned write scattered over tasks: many small shards per lang
    spark.createDataFrame(rows, DDL).repartition(4).write.format(
        "jsonl_docs"
    ).option("path", out).option("partition_by", "lang").mode(
        "overwrite"
    ).save()
    with open(os.path.join(out, "_MANIFEST.v1")) as fh:
        m1 = json.load(fh)
    from pu4spark_spark.sources.lake.checkpoint import assemble_stats

    parts = assemble_stats(out)["_parts"]
    en_shards = {f for f, p in parts.items() if p.get("lang") == "en"}
    fr_shards = {
        f for f in m1 if not f.startswith("_") and f not in en_shards
    }
    assert len(en_shards) > 1 and fr_shards
    # a delete folds into the rewrite
    P.delete_from_jsonl_dir(out, [1])
    v = P.compact_partitions_jsonl_dir(
        spark, out, {"lang": "en"}, target_shards=1
    )
    with open(os.path.join(out, f"_MANIFEST.v{v}")) as fh:
        m = json.load(fh)
    post = {f for f in m if not f.startswith("_")}
    assert fr_shards <= post, "cold partition must keep its files"
    assert not (en_shards & post), "hot partition must be rewritten"
    new = post - fr_shards
    assert len(new) == 1
    assert m["_op"] == "compact-partition"
    assert os.path.exists(os.path.join(out, f"_MANIFEST.v{v}.rewrite"))
    # rewritten shard keeps partition metadata (still prunable)
    parts2 = assemble_stats(out)["_parts"]
    assert all(parts2.get(f, {}).get("lang") == "en" for f in new)
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert sorted(r["doc_id"] for r in back.collect()) == [
        i for i in range(40) if i != 1
    ]
    # no recorded partition value -> nothing provably matches -> no-op
    assert P.compact_partitions_jsonl_dir(
        spark, out, {"source": "s"}
    ) == v
    # empty predicate refused
    with pytest.raises(ValueError, match="at least one"):
        P.compact_partitions_jsonl_dir(spark, out, {})
