"""Metadata-plane micro-bench (r15): quantify what the columnar
checkpoint buys at commit-heavy table sizes — no Spark session, pure
driver-side metadata like the paths it measures.

Synthesizes a table directory with N commits (one shard per commit,
realistic stats deltas including an ~11 KiB bloom entry per shard —
the r14 root-_STATS killer), then measures:

- r14 model (simulated): the root-_STATS read-modify-rewrite a commit
  paid, and the whole-JSON parse a filtered plan paid;
- r15 deltas only: per-commit delta write; plan-time assembly over the
  delta tail (the un-checkpointed worst case);
- r15 checkpointed: assembly from the columnar checkpoint (zonemap
  family only — what a doc_id range scan actually deserializes) +
  tail; DESCRIBE-HISTORY-equivalent metadata walk vs the embedded
  checkpoint history.

Usage: python tools/metadata_bench.py [n_commits]   (default 1000)
Appends nothing; prints a markdown table for SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pu4spark_spark.sources.lake.checkpoint import (  # noqa: E402
    assemble_stats,
    checkpoint_history,
    last_checkpoint_version,
    write_checkpoint,
    write_stats_delta,
)
from pu4spark_spark.sources.lake.protocol import (  # noqa: E402
    _manifest_at,
    _write_atomic,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
ROWS_PER_SHARD = 10_000


def fake_bloom() -> dict:
    import base64

    return {
        "m": 65536,
        "k": 7,
        "bits": base64.b64encode(os.urandom(65536 // 8)).decode(),
    }


def shard_entry(v: int) -> tuple[str, dict]:
    f = f"part-{v:05d}-deadbeef.jsonl"
    lo = v * ROWS_PER_SHARD
    delta = {
        f: [lo, lo + ROWS_PER_SHARD - 1],
        "_cols": {f: {"lang": ["de", "fr"], "n_chars": [1, 9999]}},
        "_nulls": {f: {"_rows": ROWS_PER_SHARD, "text": 0}},
        "_parts": {f: {"lang": "en"}},
        "_bloom": {f: {"doc_id": fake_bloom()}},
    }
    return f, delta


def main() -> None:
    d = tempfile.mkdtemp(prefix="mdbench-")
    try:
        manifest: dict = {}
        t_delta_writes = 0.0
        t_root_writes = 0.0  # simulated r14 model on the same data
        root_stats: dict = {}
        for v in range(1, N + 1):
            f, delta = shard_entry(v)
            manifest[f] = ROWS_PER_SHARD
            manifest["_op"] = "append"
            manifest["_ts"] = 1_000_000 + v
            _write_atomic(
                os.path.join(d, f"_MANIFEST.v{v}"), json.dumps(manifest)
            )
            t0 = time.perf_counter()
            write_stats_delta(d, v, delta)
            t_delta_writes += time.perf_counter() - t0
            # r14 model: read-modify-rewrite ONE root JSON per commit
            t0 = time.perf_counter()
            rp = os.path.join(d, "_STATS_SIM")
            if os.path.exists(rp):
                with open(rp) as fh:
                    root_stats = json.load(fh)
            root_stats[f] = delta[f]
            for k in ("_cols", "_nulls", "_parts", "_bloom"):
                root_stats.setdefault(k, {}).update(delta[k])
            _write_atomic(rp, json.dumps(root_stats))
            t_root_writes += time.perf_counter() - t0
        root_bytes = os.path.getsize(os.path.join(d, "_STATS_SIM"))

        # r14 plan cost: parse the whole root JSON
        t0 = time.perf_counter()
        with open(os.path.join(d, "_STATS_SIM")) as fh:
            json.load(fh)
        t_root_plan = time.perf_counter() - t0

        # r15 un-checkpointed plan cost: assemble the full delta tail
        t0 = time.perf_counter()
        s = assemble_stats(d, families={"zonemap"})
        t_tail_plan = time.perf_counter() - t0
        assert len([k for k in s if not k.startswith("_")]) == N

        # checkpoint, then plan again (zonemap family only)
        t0 = time.perf_counter()
        ck = write_checkpoint(d)
        t_ckpt = time.perf_counter() - t0
        assert ck == N and last_checkpoint_version(d) == N
        ck_bytes = os.path.getsize(
            os.path.join(d, f"_CHECKPOINT.v{N}.parquet")
        )
        t0 = time.perf_counter()
        s2 = assemble_stats(d, families={"zonemap"})
        t_ck_plan = time.perf_counter() - t0
        assert len([k for k in s2 if not k.startswith("_")]) == N
        # full-family assembly (bloom included) from the checkpoint
        t0 = time.perf_counter()
        assemble_stats(d)
        t_ck_plan_full = time.perf_counter() - t0

        # history: manifest walk vs checkpoint-embedded
        t0 = time.perf_counter()
        for v in range(1, N + 1):
            _manifest_at(d, v)
        t_hist_walk = time.perf_counter() - t0
        t0 = time.perf_counter()
        h = checkpoint_history(d, ck)
        t_hist_ck = time.perf_counter() - t0
        assert len(h) == N

        print(f"### Metadata plane at {N} commits "
              f"(1 shard/commit, bloom stats on)")
        print()
        print("| metric | r14 root `_STATS` | r15 deltas | "
              "r15 checkpointed |")
        print("|---|---|---|---|")
        print(
            f"| per-commit stats write (total s) | "
            f"{t_root_writes:.2f} (read-modify-rewrite, "
            f"final {root_bytes/1e6:.1f} MB) | "
            f"{t_delta_writes:.2f} (O(commit) delta) | same |"
        )
        print(
            f"| filtered-plan stats load (s) | {t_root_plan:.3f} "
            f"(whole JSON) | {t_tail_plan:.2f} ({N}-delta tail) | "
            f"{t_ck_plan:.3f} (zonemap cols only; "
            f"{t_ck_plan_full:.3f} all families) |"
        )
        print(
            f"| checkpoint write (s) / size | — | — | "
            f"{t_ckpt:.2f} / {ck_bytes/1e6:.1f} MB (zstd) |"
        )
        print(
            f"| history metadata (s) | {t_hist_walk:.2f} "
            f"({N} manifest opens) | same | {t_hist_ck:.3f} "
            f"(1 footer read) |"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
