"""Positional deletion vectors (VERDICT r13 next #6 — Delta's DVs):
per-shard row-index bitmaps in the manifest, applied as a pure
positional mask on every read path (no key files, no tombstone
replay), merged across delete commits, carried by clones, retracted
loudly by streams, and physically reclaimed by the REORG purge that
rewrites ONLY the DV-carrying shards."""

from __future__ import annotations

from pu4spark_spark.sources.lake.protocol import iter_reader_rows

import json
import os

import pytest

from pu4spark_spark.sources import pydatasource as P
from pu4spark_spark.sources.lake.protocol import (
    DV_KEY,
    _dv_merge,
    _dv_pack,
    _dv_buf,
    _dv_test,
)
from pu4spark_spark.sources.lake.source import JsonlDocsReader

DDL = (
    "doc_id bigint, text string, lang string, source string, "
    "n_chars bigint"
)


def _mk(spark, out, n=40, parquet_half=True):
    P.register_pyds(spark)
    rows = [(i, f"d{i}", "en", "s", i) for i in range(n // 2)]
    spark.createDataFrame(rows, DDL).coalesce(1).write.format(
        "jsonl_docs"
    ).option("path", out).mode("overwrite").save()
    rows2 = [(i, f"d{i}", "fr", "s", i) for i in range(n // 2, n)]
    w = spark.createDataFrame(rows2, DDL).coalesce(1).write.format(
        "jsonl_docs"
    ).option("path", out)
    if parquet_half:
        w = w.option("payload_format", "parquet")
    w.mode("append").save()


def test_dv_bitset_helpers():
    e = _dv_pack([0, 3, 17], 20)
    assert e["n"] == 3
    buf = _dv_buf(e)
    assert [_dv_test(buf, i) for i in range(20)] == [
        i in (0, 3, 17) for i in range(20)
    ]
    # positions beyond the bitset are live
    assert not _dv_test(buf, 10_000)
    # merge ORs and re-counts
    m = _dv_merge(e, _dv_pack([3, 5], 20))
    assert m["n"] == 4
    assert _dv_merge(None, e) == e


def test_dv_delete_masks_both_formats_and_merges(spark, tmp_path):
    out = str(tmp_path / "t")
    _mk(spark, out, 40)
    v = P.delete_from_jsonl_dir(
        out, [3, 25], spark=spark, deletion_vectors=True
    )
    m = json.load(open(os.path.join(out, f"_MANIFEST.v{v}")))
    assert DV_KEY in m and len(m[DV_KEY]) == 2  # one per format shard
    assert "deletion-vectors" in m.get("_features", [])
    # the ledger is untouched — DVs are NOT tombstones
    assert not m.get("_tombstones", {}).get("entries")
    # key files were scan inputs only — reclaimed
    assert not [f for f in os.listdir(out) if f.startswith("_delete-")]
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert sorted(r["doc_id"] for r in back.collect()) == [
        i for i in range(40) if i not in (3, 25)
    ]
    # second DV delete merges bitsets per shard (bitwise OR)
    P.delete_from_jsonl_dir(out, [4], spark=spark, deletion_vectors=True)
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert back.count() == 37
    # time travel BEFORE the DVs still serves every row
    tt = spark.read.format("jsonl_docs").option("path", out) \
        .option("version", 2).load()
    assert tt.count() == 40


def test_dv_and_tombstones_compose(spark, tmp_path):
    """A ledger DELETE and a DV DELETE on the same table both apply —
    the scan masks positions AND filters keys."""
    out = str(tmp_path / "mix")
    _mk(spark, out, 20)
    P.delete_from_jsonl_dir(out, [1])  # ledger tombstone
    P.delete_from_jsonl_dir(out, [2], spark=spark, deletion_vectors=True)
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert sorted(r["doc_id"] for r in back.collect()) == [
        i for i in range(20) if i not in (1, 2)
    ]


def test_fully_masked_shard_is_skipped(spark, tmp_path):
    """A shard whose every written row is DV-deleted is dropped from
    the partition list entirely — zero scan tasks for dead files."""
    out = str(tmp_path / "full")
    _mk(spark, out, 20, parquet_half=False)
    total = len(JsonlDocsReader({"path": out}).partitions())
    # kill the entire second half (one whole shard)
    P.delete_from_jsonl_dir(
        out, list(range(10, 20)), spark=spark, deletion_vectors=True
    )
    r = JsonlDocsReader({"path": out})
    assert len(r.partitions()) == total - 1
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert sorted(x["doc_id"] for x in back.collect()) == list(range(10))


def test_purge_rewrites_only_dv_shards(spark, tmp_path):
    """REORG ... APPLY (PURGE): clean shards keep their exact file
    names (never rescanned or rewritten); DV shards are replaced and
    their _dv entries cleared; a version stream skips the purge
    commit (rewrite marker — dataChange=false)."""
    out = str(tmp_path / "purge")
    _mk(spark, out, 40)  # shard A jsonl (0..19), shard B parquet (20..39)
    with open(os.path.join(out, "_MANIFEST.v2")) as fh:
        pre_files = {f for f in json.load(fh) if not f.startswith("_")}
    P.delete_from_jsonl_dir(
        out, [25, 30], spark=spark, deletion_vectors=True
    )
    m3 = json.load(open(os.path.join(out, "_MANIFEST.v3")))
    dv_shards = set(m3[DV_KEY])
    clean = pre_files - dv_shards
    assert clean and dv_shards  # only the parquet half was touched
    v = P.purge_jsonl_dir(spark, out)
    m4 = json.load(open(os.path.join(out, f"_MANIFEST.v{v}")))
    post_files = {f for f in m4 if not f.startswith("_")}
    assert DV_KEY not in m4
    assert clean <= post_files, "purge must not touch clean shards"
    assert not (dv_shards & post_files), "dv shards must be replaced"
    # purged payload format preserved (parquet in, parquet out)
    assert all(
        f.endswith(".parquet") for f in post_files - clean
    )
    assert os.path.exists(os.path.join(out, f"_MANIFEST.v{v}.rewrite"))
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert sorted(r["doc_id"] for r in back.collect()) == [
        i for i in range(40) if i not in (25, 30)
    ]
    # idempotent: nothing left to purge
    assert P.purge_jsonl_dir(spark, out) == v

    # a fresh version stream over the purged table delivers the live
    # rows once (initial snapshot at earliest version + skipped purge)
    q = (
        spark.readStream.format("jsonl_docs")
        .option("path", out)
        .option("versioned", "true")
        .option("ignore_deletes", "true")
        .load()
        .writeStream.format("memory")
        .queryName("dv_purged_vs")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["doc_id"]
        for r in spark.sql("select * from dv_purged_vs").collect()
    )
    assert got == [i for i in range(40) if i not in (25, 30)]


def test_version_stream_dv_retraction_contract(spark, tmp_path):
    """A DV delete is a deletion: the version stream fails loudly on
    it (append-only streams cannot retract) unless ignore_deletes —
    and with ignore_deletes, rows deleted-as-of-batch-end never enter
    the stream (positional analog of the ledger's union rule)."""
    from pu4spark_spark.sources.lake.streaming import (
        JsonlDocsVersionStreamReader,
    )

    out = str(tmp_path / "vs")
    _mk(spark, out, 20, parquet_half=False)
    P.delete_from_jsonl_dir(out, [5], spark=spark, deletion_vectors=True)
    r = JsonlDocsVersionStreamReader({"path": out})
    with pytest.raises(ValueError, match="deletion vectors grew"):
        r.partitions({"version": 2}, {"version": 3})
    # ignore_deletes: batch spanning the dv commit masks the row
    r2 = JsonlDocsVersionStreamReader(
        {"path": out, "ignore_deletes": "true"}
    )
    parts = r2.partitions({"version": 0}, {"version": 3})
    got = sorted(
        row[0]
        for p in parts
        for row in iter_reader_rows(r2, p)
    )
    assert got == [i for i in range(20) if i != 5]


def test_cdf_stream_dv_contract(spark, tmp_path):
    """The change feed refuses a DV delete made WITHOUT cdf (no
    pre-images anywhere) and serves one made WITH cdf=True from its
    commit-time CDC files."""
    from pu4spark_spark.sources.lake.streaming import (
        JsonlDocsChangeFeedStreamReader,
    )

    out = str(tmp_path / "cdf")
    _mk(spark, out, 20, parquet_half=False)
    P.delete_from_jsonl_dir(out, [7], spark=spark, deletion_vectors=True)
    r = JsonlDocsChangeFeedStreamReader({"path": out})
    with pytest.raises(ValueError, match="no CDC files"):
        r.partitions({"version": 2}, {"version": 3})

    out2 = str(tmp_path / "cdf2")
    _mk(spark, out2, 20, parquet_half=False)
    P.delete_from_jsonl_dir(
        out2, [7], spark=spark, deletion_vectors=True, cdf=True
    )
    r2 = JsonlDocsChangeFeedStreamReader({"path": out2})
    parts = r2.partitions({"version": 2}, {"version": 3})
    changes = [row for p in parts for row in iter_reader_rows(r2, p)]
    assert [(c[0], c[-2], c[-1]) for c in changes] == [(7, "delete", 3)]


def test_clone_carries_deletion_vectors(spark, tmp_path):
    out = str(tmp_path / "src")
    _mk(spark, out, 20, parquet_half=False)
    P.delete_from_jsonl_dir(out, [3], spark=spark, deletion_vectors=True)
    dst = str(tmp_path / "dst")
    P.clone_jsonl_dir(out, dst)
    back = spark.read.format("jsonl_docs").option("path", dst).load()
    assert sorted(r["doc_id"] for r in back.collect()) == [
        i for i in range(20) if i != 3
    ]


def test_purge_rebuilds_blooms(spark, tmp_path):
    """PURGE carries the bloom index across its rewrite like
    compaction does — rewritten shards get fresh blooms for columns
    the purged shards had indexed."""
    out = str(tmp_path / "pb")
    P.register_pyds(spark)
    rows = [(i, f"d{i}", "en", "s", i) for i in range(40)]
    spark.createDataFrame(rows, DDL).coalesce(2).write.format(
        "jsonl_docs"
    ).option("path", out).option(
        "bloom_filter_columns", "doc_id"
    ).mode("overwrite").save()
    P.delete_from_jsonl_dir(out, [3], spark=spark, deletion_vectors=True)
    v = P.purge_jsonl_dir(spark, out)
    with open(os.path.join(out, f"_MANIFEST.v{v}")) as fh:
        m = json.load(fh)
    new_files = [f for f in m if not f.startswith("_")]
    from pu4spark_spark.sources.lake.checkpoint import assemble_stats

    bloom = assemble_stats(out).get("_bloom", {})
    # the DV'd (hence rewritten) shard's replacement carries a bloom;
    # untouched shards keep their original entries
    rebuilt = [f for f in new_files if f in bloom]
    assert rebuilt, "purge dropped the bloom index"
    r = JsonlDocsReader({"path": out})
    r._eq_sets = {"doc_id": [{999_999}]}
    assert len(r.partitions()) == 0


def test_dv_scan_prunes_by_zonemap(spark, tmp_path, monkeypatch):
    """The DV position scan never opens shards whose doc_id zonemap
    cannot hold any key — a targeted delete costs O(candidate
    shards), not O(table)."""
    from pu4spark_spark.sources.lake import dml as _dml

    out = str(tmp_path / "zp")
    P.register_pyds(spark)
    rows = [(i, f"d{i}", "en", "s", i) for i in range(100)]
    # range-clustered: 4 shards with disjoint doc_id ranges
    spark.createDataFrame(rows, DDL).repartitionByRange(4, "doc_id") \
        .write.format("jsonl_docs").option("path", out) \
        .mode("overwrite").save()

    scanned: list = []
    orig = _dml._scan_dv_positions

    def spying(spark_, path_, manifest_, files_, kfp, inline):
        scanned.extend(files_)
        return orig(spark_, path_, manifest_, files_, kfp, inline)

    monkeypatch.setattr(_dml, "_scan_dv_positions", spying)
    P.delete_from_jsonl_dir(out, [97, 99], spark=spark,
                            deletion_vectors=True)
    assert len(scanned) == 1, scanned  # only the top-range shard
    back = spark.read.format("jsonl_docs").option("path", out).load()
    assert back.count() == 98


def test_dml_staging_counts_and_no_observation_poison(spark, tmp_path):
    """The native-sink sidecar staging must (a) record the EXACT key
    count in the ledger (surfaced by DESCRIBE HISTORY — hash-checked)
    without a second pass, and (b) never instantiate the session's
    ``ObservationManager``: that non-serializable field rides inside
    every MLlib training summary's session reference, so one
    ``Observation`` on the shared session breaks every later
    summary-carrying model's task serialization (the r15 regression
    this test pins)."""
    from pyspark.sql import functions as F

    from pu4spark_spark.sources.lake.protocol import _tombstones_of, _manifest_at

    out = str(tmp_path / "dmlcount")
    _mk(spark, out, n=40, parquet_half=False)
    keys = spark.range(0, 40, 2).select(F.col("id").alias("doc_id"))
    P.delete_from_jsonl_dir(out, keys, spark=spark)
    entries = _tombstones_of(_manifest_at(out, 3))["entries"]
    assert sum(e["n"] for e in entries) == 20
    # an LR fit + transform + collect AFTER the DML must still serialize
    cloud = spark.createDataFrame(
        [(float(i % 7), float(i % 5), int(i % 3 == 0)) for i in range(60)],
        "x double, y double, label int",
    )
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    va = VectorAssembler(inputCols=["x", "y"], outputCol="features")
    model = LogisticRegression(maxIter=2).fit(va.transform(cloud))
    assert model.transform(va.transform(cloud)).count() == 60
