"""Write-path round-trips (SURVEY.md §2B sinks row): what is written
must re-read value-identical, partitioning must prune, bucketing must
survive as table metadata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pu4spark_spark.functions.vectors import sign_bucket
from pu4spark_spark.operators.dedup import q_dedup_exact_docs
from pu4spark_spark.sources import load_table, write_bucketed_table, write_parquet

SF01_DIR = "/root/testdata/sf0.01"


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_parquet_roundtrip_dedup_output(spark, tmp_path):
    """Dedup output written to parquet re-reads hash-identical."""
    out = q_dedup_exact_docs(spark, SF01_DIR)
    expected = _rowset(out)
    path = str(tmp_path / "dedup_exact")
    write_parquet(out, path, max_records_per_file=10_000)
    back = spark.read.parquet(path)
    # parquet re-reads are always nullable; names+types must match
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in out.schema
    ]
    assert _rowset(back) == expected


def test_partitioned_write_prunes(spark, tmp_path):
    """Embeddings written partitioned by LSH bucket: values round-trip
    and a bucket-filtered scan reads only that bucket's directory."""
    emb = load_table(spark, "embeddings", SF01_DIR).select(
        "vec_id",
        "label",
        sign_bucket("embedding", [0, 10, 20, 30, 40, 50]).alias("bucket"),
    )
    path = str(tmp_path / "emb_bucketed")
    write_parquet(emb, path, partition_by=["bucket"])
    back = spark.read.parquet(path)
    assert _rowset(back.select("vec_id", "label", "bucket")) == _rowset(
        emb.select("vec_id", "label", "bucket")
    )
    one = back.filter(F.col("bucket") == 0)
    # partition filter must reach the scan (directory pruning, not a row filter)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert one.count() == emb.filter(F.col("bucket") == 0).count()


def test_bucketed_table_roundtrip(spark):
    """saveAsTable with bucketBy: values round-trip and the catalog
    records the bucket spec (the no-shuffle-join precondition)."""
    docs = load_table(spark, "documents", SF01_DIR).select(
        "doc_id", F.md5(F.col("text")).alias("text_hash")
    )
    spark.sql("DROP TABLE IF EXISTS t_docs_bucketed")
    write_bucketed_table(
        docs, "t_docs_bucketed", ["text_hash"], 8, sort_cols=["text_hash"]
    )
    try:
        back = spark.table("t_docs_bucketed")
        assert _rowset(back) == _rowset(docs)
        ddl = spark.sql("DESCRIBE TABLE EXTENDED t_docs_bucketed").collect()
        info = {r["col_name"]: r["data_type"] for r in ddl}
        assert info.get("Num Buckets") == "8"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_bucketed")


def test_streaming_parquet_file_sink(spark, tmp_path):
    """Streaming file sink: the watermarked hourly aggregation written
    as parquet files (append mode + checkpoint) re-reads equal to the
    batch events_hourly result — the durable-output path a production
    stream would use instead of the memory sink."""
    from pu4spark_spark.operators.relational import q_events_hourly
    from pu4spark_spark.streaming.events import (
        hourly_counts,
        read_events_stream,
    )

    sf = "/root/testdata/sf0.001"
    agg = hourly_counts(read_events_stream(spark, sf))
    out_dir = str(tmp_path / "hourly_out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    back = spark.read.parquet(out_dir)
    batch = q_events_hourly(spark, sf)
    # append mode only flushes windows CLOSED by the final watermark
    # (max ts - 2h); the in-flight tail correctly stays in state
    from datetime import timedelta

    from pu4spark_spark.sources import load_table

    max_ts = load_table(spark, "events", sf).agg(F.max("ts")).collect()[0][0]
    wm = max_ts - timedelta(hours=2)
    closed = [
        r for r in batch.collect() if r["hour"] + timedelta(hours=1) < wm
    ]
    got = _rowset(back)
    assert got == sorted(tuple(r) for r in closed)
    assert len(got) > 0
    # and everything emitted agrees with the batch result row-for-row
    assert set(got) <= set(_rowset(batch))


def test_stateful_totals_multi_batch_landing_dir(spark, tmp_path):
    """Two-file landing directory + maxFilesPerTrigger=1 ⇒ two
    micro-batches: users present in both files get TWO update-mode
    sink rows, and drain_user_totals' last-update reduction must still
    equal the batch aggregate."""
    import shutil

    from pu4spark_spark.sources import load_table
    from pu4spark_spark.streaming.events import normalize_event_ts
    from pu4spark_spark.streaming.stateful import drain_user_totals

    sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf}/events.parquet")
    land = tmp_path / "land"
    land.mkdir()
    for i, half in enumerate(
        (F.col("event_id") % 2 == 0, F.col("event_id") % 2 == 1)
    ):
        part_dir = tmp_path / f"half{i}"
        raw.filter(half).coalesce(1).write.parquet(str(part_dir))
        (src,) = part_dir.glob("part-*.parquet")
        shutil.copy(src, land / f"events_{i}.parquet")

    # the scenario is only meaningful if some user spans both files
    spans = (
        raw.select("user_id", (F.col("event_id") % 2).alias("h"))
        .distinct()
        .groupBy("user_id")
        .count()
        .filter(F.col("count") == 2)
        .count()
    )
    assert spans > 0

    stream = normalize_event_ts(
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land))
    )
    got = _rowset(drain_user_totals(spark, stream))

    ev = load_table(spark, "events", sf)
    expected = _rowset(
        ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("total_cents"),
        )
    )
    assert got == expected


def test_streaming_file_sink_restart_is_exactly_once(spark, tmp_path):
    """Re-starting the drained stream against the SAME checkpoint with
    no new input must emit nothing new — the checkpoint + file-sink
    commit log give exactly-once output across restarts (the property
    that makes the parquet drain operationally safe at 100 TB)."""
    from pu4spark_spark.streaming.events import (
        hourly_counts,
        read_events_stream,
    )

    sf = "/root/testdata/sf0.001"
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain_once():
        q = (
            hourly_counts(read_events_stream(spark, sf))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        return _rowset(spark.read.parquet(out_dir))

    first = drain_once()
    assert len(first) > 0
    second = drain_once()  # same checkpoint, same (fully-consumed) input
    assert second == first


def test_foreachbatch_merge_is_incremental(spark, tmp_path):
    """merge_batch applies micro-batches one at a time: after the base
    batch the state is the base; after the update batch only updated
    keys carry version 1."""
    from pu4spark_spark.streaming.upsert import merge_batch

    state = str(tmp_path / "state")
    base = spark.createDataFrame(
        [(1, "A", 10.0, 0), (2, "B", 20.0, 0)],
        "o_orderkey long, o_orderstatus string, price double, version int",
    )
    upd = spark.createDataFrame(
        [(2, "B", 120.0, 1)],
        "o_orderkey long, o_orderstatus string, price double, version int",
    )
    merge_batch(spark, base, state)
    s1 = {r["o_orderkey"]: r for r in spark.read.parquet(state).collect()}
    assert {k: v["version"] for k, v in s1.items()} == {1: 0, 2: 0}
    merge_batch(spark, upd, state)
    s2 = {r["o_orderkey"]: r for r in spark.read.parquet(state).collect()}
    assert {k: v["version"] for k, v in s2.items()} == {1: 0, 2: 1}
    assert s2[2]["price"] == 120.0 and s2[1]["price"] == 10.0


def test_streaming_ingest_dedup_equals_batch_probe(spark):
    """The foreachBatch ingest probe must reproduce the batch artifact
    probe bit-for-bit (same batch split, same artifact)."""
    from pu4spark_spark.operators.dedup import q_dedup_band_artifact_probe
    from pu4spark_spark.streaming.ingest import q_streaming_ingest_dedup

    sf = "/root/testdata/sf0.001"
    got = {
        (r["b_id"], r["c_id"], round(r["jaccard"], 12))
        for r in q_streaming_ingest_dedup(spark, sf).collect()
    }
    want = {
        (r["b_id"], r["c_id"], round(r["jaccard"], 12))
        for r in q_dedup_band_artifact_probe(spark, sf).collect()
    }
    assert got == want


def test_tws_totals_when_protobuf_available(spark):
    """transformWithStateInPandas twin of the applyInPandasWithState
    totals — runs only where pyspark's TWS worker protocol deps
    (google.protobuf) exist; must equal the batch aggregate exactly."""
    import pytest

    from pu4spark_spark.streaming.stateful import (
        _tws_available,
        q_streaming_user_totals_tws,
    )

    if not _tws_available():
        pytest.skip("google.protobuf absent — TWS worker protocol unavailable")
    from pyspark.sql import functions as F

    from pu4spark_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_events"], r["total_cents"])
        for r in q_streaming_user_totals_tws(spark, sf).collect()
    }
    want = {
        r["user_id"]: (r["n_events"], r["total_cents"])
        for r in load_table(spark, "events", sf)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("total_cents"),
        )
        .collect()
    }
    assert got == want


def test_drain_partitions_sets_and_restores(spark):
    """The drain context must pin the state-partition count for the
    duration of the drain and restore the session's batch setting on
    BOTH exit paths — a leaked low setting would silently deparallelize
    every later batch shuffle in the session."""
    from pu4spark_spark.streaming.drain import DRAIN_PARTITIONS, drain_partitions

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    assert prev != str(DRAIN_PARTITIONS)  # the test must observe a change
    with drain_partitions(spark):
        assert spark.conf.get(key) == str(DRAIN_PARTITIONS)
    assert spark.conf.get(key) == prev
    with pytest.raises(RuntimeError):
        with drain_partitions(spark, 5):
            assert spark.conf.get(key) == "5"
            raise RuntimeError("drain failed")
    assert spark.conf.get(key) == prev


def test_drain_to_memory_values_match_batch(spark):
    """A drained stateful aggregate under the reduced state-partition
    count must equal the same aggregate at the session default — values
    are partition-count independent, only store-commit overhead moves."""
    from pyspark.sql import functions as F

    from pu4spark_spark.sources import load_table
    from pu4spark_spark.streaming.events import (
        hourly_counts,
        read_events_stream,
    )
    from pu4spark_spark.streaming.drain import drain_to_memory

    sf = "/root/testdata/sf0.001"
    drained = drain_to_memory(
        spark,
        hourly_counts(read_events_stream(spark, sf)),
        "drain_test",
        "complete",
        n=3,
    )
    batch = (
        load_table(spark, "events", sf)
        .groupBy(
            F.date_trunc("hour", "ts").alias("hour"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    got = {tuple(r) for r in drained.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want


def test_tombstone_survives_out_of_order_replay(spark, tmp_path):
    """A deleted key must STAY deleted when a lower-version upsert for
    it is replayed after the tombstone (out-of-order CDC) — the merge
    retains tombstones in state so version, not arrival order, decides;
    the read-out filter is what hides them."""
    from pyspark.sql import functions as F

    from pu4spark_spark.streaming.upsert import merge_batch_with_deletes

    state = str(tmp_path / "state_del")
    ddl = (
        "o_orderkey long, o_orderstatus string, price double,"
        " version int, op string"
    )
    delete_batch = spark.createDataFrame([(7, "A", 0.0, 2, "D")], ddl)
    late_upsert = spark.createDataFrame([(7, "A", 70.0, 1, "U")], ddl)
    merge_batch_with_deletes(spark, delete_batch, state)
    merge_batch_with_deletes(spark, late_upsert, state)
    snapshot = spark.read.parquet(state)
    # the tombstone (v2) won the key battle and is retained in state...
    rows = {r["o_orderkey"]: r for r in snapshot.collect()}
    assert rows[7]["op"] == "D" and rows[7]["version"] == 2
    # ...and the read-out contract hides it
    assert snapshot.filter(F.col("op") != "D").count() == 0


def test_restart_resume_recovers_state_with_new_data(spark):
    """The restart-resume drain (phase-1 files -> stop -> phase-2
    files -> restart from checkpoint) must equal the batch aggregate
    over ALL events: recovered state counts phase-1 exactly once."""
    from pyspark.sql import functions as F

    from pu4spark_spark.sources import load_table
    from pu4spark_spark.streaming.events import q_streaming_restart_resume

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: (r["n_events"], r["total_cents"])
        for r in q_streaming_restart_resume(spark, sf).collect()
    }
    want = {
        r["event_type"]: (r["n_events"], r["total_cents"])
        for r in load_table(spark, "events", sf)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
            ).alias("total_cents"),
        )
        .collect()
    }
    assert got == want and len(got) > 0
