"""Parquet-state plumbing shared by the foreachBatch MERGE/sketch
drains: the atomic state swap, the state-or-none read, and the
single-file landing-shard writer.

These existed as three near-identical copies each (upsert ×2, sketch
×1); a crash-safety or semantics fix now lands once.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


#: per-(prefix, key) invocation counter for state-dir versioning
_STATE_VERSIONS: dict[tuple[str, str], int] = {}
#: how many versions stay on disk (current + previous): the frames the
#: PREVIOUS invocation returned keep reading their own dir
KEEP_STATE_VERSIONS = 2


def fresh_state_dir(prefix: str, key: str) -> str:
    """A per-(key, process, INVOCATION) state directory.  Versioning
    fixes ADVICE r6: the drains return LAZY frames that re-read the
    state dir at action time, so clearing one shared dir on the next
    invocation silently invalidated (or repointed) the frame the
    previous call returned.  Each call now gets ``..._vN`` and GCs
    versions older than the previous one — bounded to
    ``KEEP_STATE_VERSIONS`` live dirs per (key, process) instead of a
    leak-per-invocation, while the pid suffix still keeps concurrent
    sessions (bench + pytest) from clobbering each other (ADVICE r4).
    A frame held across TWO newer invocations is out of contract."""
    import hashlib
    import tempfile

    tag = hashlib.md5(os.path.abspath(key).encode()).hexdigest()[:8]
    base = os.path.join(
        tempfile.gettempdir(), f"{prefix}_{tag}_{os.getpid()}"
    )
    n = _STATE_VERSIONS.get((prefix, tag), 0) + 1
    _STATE_VERSIONS[(prefix, tag)] = n
    # clear the derived dirs too: a surviving ".ckpt" would make the
    # next availableNow drain treat the static fixture as already
    # processed and silently skip every batch
    for old in range(1, n - KEEP_STATE_VERSIONS + 1):
        for suffix in ("", ".next", ".ckpt"):
            shutil.rmtree(f"{base}_v{old}{suffix}", ignore_errors=True)
    d = f"{base}_v{n}"
    for suffix in ("", ".next", ".ckpt"):
        shutil.rmtree(d + suffix, ignore_errors=True)
    return d


def read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The committed parquet state, or None before the first commit."""
    if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
        return spark.read.parquet(state_dir)
    return None


def swap_parquet_state(merged: DataFrame, state_dir: str) -> None:
    """Write ``merged`` to a fresh directory and atomically swap it in —
    the plain-parquet stand-in for a table-format commit (directory-
    atomic on one host; on an object store this role is played by the
    Delta/Iceberg commit protocol)."""
    tmp = state_dir + ".next"
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(state_dir):
        shutil.rmtree(state_dir)
    os.rename(tmp, state_dir)


def write_single_file_shards(d: str, named_dfs) -> None:
    """Write each ``(name, df)`` as exactly ONE parquet file
    ``<d>/<name>.parquet`` (stage via coalesce(1), copy the part file
    out, drop the stage dir) and stamp ``_READY`` — the fixture builder
    for ``maxFilesPerTrigger=1`` landing directories where file count =
    micro-batch count."""
    os.makedirs(d, exist_ok=True)
    for name, df in named_dfs:
        part_dir = os.path.join(d, f"__stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(part_dir)
        (src,) = (f for f in os.listdir(part_dir) if f.endswith(".parquet"))
        shutil.copy(
            os.path.join(part_dir, src), os.path.join(d, f"{name}.parquet")
        )
        shutil.rmtree(part_dir)
    open(os.path.join(d, "_READY"), "w").close()
