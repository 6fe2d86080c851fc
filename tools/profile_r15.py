"""r15 optimization-round profiler: per-phase wall times for the
heaviest query families (lake DML, lake streaming drains, CC loops),
plus a Python-datasource fixed-cost micro-benchmark.

Usage: python tools/profile_r15.py [section ...]
Sections: micro, dml, stream, cc, ann   (default: all)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pu4spark_spark.session import get_spark  # noqa: E402
from pu4spark_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class T:
    def __init__(self):
        self.rows = []
        self._t0 = time.time()

    def lap(self, label):
        t = time.time()
        self.rows.append((label, t - self._t0))
        self._t0 = t

    def dump(self, title):
        print(f"--- {title} ---")
        for label, s in self.rows:
            print(f"{s:8.3f}  {label}")
        print(f"{sum(s for _, s in self.rows):8.3f}  TOTAL")
        self.rows = []
        self._t0 = time.time()


def micro(spark):
    """Fixed-cost anatomy of one pyds write and read."""
    from pu4spark_spark.sources.lake.source import register_pyds

    docs = load_table(spark, "documents", SF_DIR)
    docs.count()
    t = T()
    register_pyds(spark)
    t.lap("register_pyds")
    out = os.path.join(tempfile.gettempdir(), f"prof_micro_{os.getpid()}")
    for i in range(2):
        (
            docs.repartition(4, "doc_id")
            .write.format("jsonl_docs")
            .option("path", out)
            .mode("overwrite")
            .save()
        )
        t.lap(f"pyds write 5k docs 4 shards (run {i})")
    for i in range(2):
        (
            spark.read.format("jsonl_docs")
            .option("path", out)
            .load()
            .groupBy("lang")
            .agg(F.count(F.lit(1)))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        t.lap(f"pyds read+agg (run {i})")
    # native-parquet yardstick: same data, JVM path
    pq = os.path.join(tempfile.gettempdir(), f"prof_micro_pq_{os.getpid()}")
    for i in range(2):
        docs.repartition(4, "doc_id").write.mode("overwrite").parquet(pq)
        t.lap(f"native parquet write (run {i})")
    for i in range(2):
        (
            spark.read.parquet(pq)
            .groupBy("lang")
            .agg(F.count(F.lit(1)))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        t.lap(f"native parquet read+agg (run {i})")
    # pure no-op job latency
    for i in range(2):
        spark.range(10).write.format("noop").mode("overwrite").save()
        t.lap(f"trivial job (run {i})")
    t.dump("micro: pyds fixed costs")


def dml(spark):
    """Phase timing of the fmt_pyds_delete_merge shape."""
    import hashlib

    from pu4spark_spark.sources.lake.dml import (
        delete_from_jsonl_dir,
        merge_into_jsonl_dir,
    )
    from pu4spark_spark.sources.lake.source import register_pyds

    register_pyds(spark)
    docs = load_table(spark, "documents", SF_DIR)
    docs.count()
    tag = hashlib.md5(os.path.abspath(SF_DIR).encode()).hexdigest()[:8]
    out = os.path.join(tempfile.gettempdir(), f"prof_dml_{os.getpid()}")
    t = T()
    (
        docs.filter(F.col("doc_id") % 2 == 0)
        .repartition(4, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .mode("overwrite")
        .save()
    )
    t.lap("write v1 (evens)")
    (
        docs.filter(F.col("doc_id") % 2 == 1)
        .repartition(4, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .option("base_version", 1)
        .mode("append")
        .save()
    )
    t.lap("append v2 (odds)")
    delete_from_jsonl_dir(
        out,
        docs.filter(F.col("doc_id") % 10 == 3).select("doc_id").repartition(2),
        base_version=2,
    )
    t.lap("delete v3")
    upserts = docs.filter(F.col("doc_id") % 10 == 7).select(
        "doc_id", "text", "lang", "source",
        (F.col("n_chars") + F.lit(1000)).alias("n_chars"),
    )
    merge_into_jsonl_dir(spark, upserts.repartition(2, "doc_id"), out)
    t.lap("merge v4")
    pre = (
        spark.read.format("jsonl_docs")
        .option("path", out)
        .option("version", 2)
        .load()
    )
    pre.groupBy("lang").agg(F.count(F.lit(1))).write.format("noop").mode(
        "overwrite"
    ).save()
    t.lap("read@v2 + agg")
    post = spark.read.format("jsonl_docs").option("path", out).load()
    post.groupBy("lang").agg(F.count(F.lit(1))).write.format("noop").mode(
        "overwrite"
    ).save()
    t.lap("read@latest + agg")
    t.dump("dml: fmt_pyds_delete_merge phases")


def stream(spark):
    """Phase timing of the streaming_pyds_delete_feed shape."""
    import shutil
    import uuid

    from pu4spark_spark.sources.lake.dml import (
        delete_from_jsonl_dir,
        merge_into_jsonl_dir,
    )
    from pu4spark_spark.sources.lake.protocol import N_SHARDS
    from pu4spark_spark.sources.lake.source import register_pyds
    from pu4spark_spark.sources.lake.queries_stream import (
        _versioned_lang_drain_opts,
    )

    register_pyds(spark)
    docs = load_table(spark, "documents", SF_DIR)
    docs.count()
    out = os.path.join(tempfile.gettempdir(), f"prof_stream_{os.getpid()}")
    ckpt = os.path.join(out, "_ckpt")
    shutil.rmtree(out, ignore_errors=True)
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    t = T()
    (
        evens.repartition(N_SHARDS, "doc_id")
        .write.format("jsonl_docs")
        .option("path", out)
        .mode("overwrite")
        .save()
    )
    t.lap("write v1")
    lag = f"prof_lag_{uuid.uuid4().hex[:8]}"
    _versioned_lang_drain_opts(spark, out, ckpt, lag, ignore_deletes=True)
    t.lap("drain 1 (v1)")
    delete_from_jsonl_dir(
        out,
        evens.filter(F.col("doc_id") % 10 == 4).select("doc_id").repartition(2),
        base_version=1,
    )
    t.lap("delete v2")
    upserts = evens.filter(F.col("doc_id") % 10 == 8).select(
        "doc_id", "text", "lang", "source",
        (F.col("n_chars") + F.lit(1000)).alias("n_chars"),
    )
    merge_into_jsonl_dir(spark, upserts.repartition(2, "doc_id"), out)
    t.lap("merge v3")
    _versioned_lang_drain_opts(spark, out, ckpt, lag, ignore_deletes=True)
    t.lap("drain 2 (resume, v2+v3)")
    fresh = f"prof_fresh_{uuid.uuid4().hex[:8]}"
    _versioned_lang_drain_opts(
        spark, out, os.path.join(out, "_ckpt_fresh"), fresh,
        ignore_deletes=True,
    )
    t.lap("drain 3 (fresh)")
    (
        spark.table(lag)
        .unionByName(spark.table(fresh))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    t.lap("final union")
    t.dump("stream: streaming_pyds_delete_feed phases")


def cc(spark):
    """Phase timing of dedup_cluster_quality."""
    from pu4spark_spark.operators.dedup import (
        q_dedup_minhash_lsh,
        connected_components,
    )

    t = T()
    pairs = q_dedup_minhash_lsh(spark, SF_DIR)
    pairs.write.format("noop").mode("overwrite").save()
    t.lap("minhash_lsh pairs (materialized)")
    labels = connected_components(pairs)
    t.lap("connected_components (loop jobs)")
    labels.write.format("noop").mode("overwrite").save()
    t.lap("labels final write")
    t.dump("cc: pair graph + CC loop")


def ann(spark):
    """ANN IVF probes."""
    from pu4spark_spark.queries import QUERIES

    for name in ("ann_ivf_tuning", "ann_ivf_partitioned_probe"):
        t = T()
        df = QUERIES[name](spark, SF_DIR)
        t.lap(f"{name}: construct")
        df.write.format("noop").mode("overwrite").save()
        t.lap(f"{name}: execute")
        t.dump(name)


def main():
    sections = sys.argv[1:] or ["micro", "dml", "stream", "cc", "ann"]
    spark = get_spark(app_name="profile_r15")
    spark.sparkContext.setLogLevel("ERROR")
    fns = {"micro": micro, "dml": dml, "stream": stream, "cc": cc, "ann": ann}
    for s in sections:
        fns[s](spark)


if __name__ == "__main__":
    main()
