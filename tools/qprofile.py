"""Per-job anatomy of one registry query (guide §1: attribute wall time
before changing anything): runs the query with the noop sink and prints
every Spark job it triggered — description, wall ms, task count — plus
the job-count total.  Fixed-overhead-dominated queries (many small
jobs) are exactly the ones whose cure is job elimination, not data-path
tuning.

Usage: python tools/qprofile.py name [name ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pu4spark_spark.queries import QUERIES  # noqa: E402
from pu4spark_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_SF_DIR = "/root/testdata/sf0.001"


def _jobs(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    out = {}
    it = store.jobsList(None).iterator()
    while it.hasNext():
        j = it.next()
        sub = j.submissionTime()
        comp = j.completionTime()
        ms = None
        if sub.isDefined() and comp.isDefined():
            ms = comp.get().getTime() - sub.get().getTime()
        out[j.jobId()] = (
            ms,
            j.numTasks(),
            (j.description().get() if j.description().isDefined() else j.name())[:110],
        )
    return out


def main() -> None:
    spark = get_spark(app_name="qprofile")
    spark.sparkContext.setLogLevel("ERROR")
    for name in sys.argv[1:]:
        # warm once at tiny scale so codegen JIT isn't billed (bench
        # convention), with the same post-run hygiene
        try:
            df = QUERIES[name](spark, WARMUP_SF_DIR)
            df.write.format("noop").mode("overwrite").save()
        except Exception as e:
            print(f"warmup failed for {name}: {e}")
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)
        time.sleep(0.3)
        before = set(_jobs(spark))
        t0 = time.time()
        df = QUERIES[name](spark, SF_DIR)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        time.sleep(0.5)
        jobs = _jobs(spark)
        new = sorted(k for k in jobs if k not in before)
        print(f"=== {name}: build {t1-t0:.2f}s  write {t2-t1:.2f}s  "
              f"total {t2-t0:.2f}s  jobs {len(new)}")
        for k in new:
            ms, ntasks, desc = jobs[k]
            print(f"  job {k}: {ms if ms is not None else '?':>6} ms  "
                  f"{ntasks:>4} tasks  {desc}")
        spark.catalog.clearCache()
        for t in spark.catalog.listTables():
            if t.isTemporary:
                spark.catalog.dropTempView(t.name)


if __name__ == "__main__":
    main()
