"""Capture .explain("formatted") for a list of registry queries into
plans/r15/<query>_<tag>.txt (guide §1: record the plan shape — Exchange
count, join strategy, PushedFilters/ReadSchema, WholeStageCodegen spans,
Batch/ArrowEvalPython nodes — beside every timing claim).

Usage: python tools/capture_plans.py <tag> name1 name2 ...  (or @file)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pu4spark_spark.plans import explain_str, release_cached  # noqa: E402
from pu4spark_spark.queries import QUERIES  # noqa: E402
from pu4spark_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r15",
)


def main() -> None:
    tag = sys.argv[1]
    names: list[str] = []
    for a in sys.argv[2:]:
        if a.startswith("@"):
            names += open(a[1:]).read().split()
        else:
            names.append(a)
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        try:
            release_cached()
            df = QUERIES[name](spark, SF_DIR)
            txt = explain_str(df, "formatted")
        except Exception as e:  # capture the failure instead of dying
            txt = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        with open(
            os.path.join(OUT_DIR, f"{name}_{tag}.txt"), "w"
        ) as fh:
            fh.write(txt)
        print(f"captured {name}")


if __name__ == "__main__":
    main()
