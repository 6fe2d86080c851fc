"""Driver-evidence rotation planner.

The per-round driver correctness artifact (``CORRECTNESS_r0N.json``)
records only the first 50 registry entries, so ``queries.DRIVER_FIRST``
is a rotation window: each round it should hold ONLY queries no driver
artifact has ever witnessed, cheapest first (so the driver's time
budget reaches the whole window).  This tool computes that list from
the committed artifacts + the latest bench detail — paste its output
into ``pu4spark_spark/queries.py`` at the start of each round.

Usage: python tools/rotation.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pu4spark_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    witnessed: set[str] = set()
    arts = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r[0-9]*.json")))
    for p in arts:
        with open(p) as fh:
            witnessed |= set(json.load(fh))
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as fh:
        costs = json.load(fh)["queries"]

    never = [n for n in QUERIES if n not in witnessed]
    with_oracle = [n for n in never if n in ORACLE_SQL]
    rows_only = [n for n in never if n not in ORACLE_SQL]
    ranked = sorted(
        with_oracle, key=lambda n: (n not in costs, costs.get(n, 0.0))
    )
    print(
        f"# registry {len(QUERIES)}; witnessed {len(witnessed & set(QUERIES))} "
        f"(from {len(arts)} artifacts); never-witnessed {len(never)} "
        f"({len(with_oracle)} oracle-backed, {len(rows_only)} rows-only)"
    )
    print(f"# window: the {min(window, len(ranked))} cheapest (sf0.1 bench sec)")
    print("DRIVER_FIRST = [")
    for n in ranked[:window]:
        c = costs.get(n)
        print(f'    "{n}",{"":<2}# {c if c is not None else "unbenched"}')
    print("]")
    if len(ranked) < window:
        short = window - len(ranked)
        print(
            f"# NOTE: only {len(ranked)} oracle-backed never-witnessed remain "
            f"— window is {short} short; fill with the cheapest rows-only "
            f"entries or already-witnessed re-verifications:"
        )
        for n in rows_only:
            print(f"#   rows-only: {n} ({costs.get(n)})")


if __name__ == "__main__":
    main()
