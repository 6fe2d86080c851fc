"""Tempdir scratch GC (ADVICE r6): the per-process scratch/sink/
checkpoint/state directories (``pu4spark_*_<tag>_<pid>[_vN]``) fixed
cross-session clobbering but were never cleaned up, so every process
leaked its trees into the tempdir.  Two bounded mechanisms:

- an ``atexit`` hook removes THIS process's own dirs on clean exit;
- a startup sweep removes dirs whose embedded pid is no longer alive
  (covers crashed/killed processes the atexit hook never ran for).

Shared (pid-less) artifact dirs like ``pu4spark_jsonl_<tag>`` are
deliberately exempt: the pattern requires an 8-hex tag segment BEFORE
the pid segment, so a tag that happens to be all digits can never be
misread as a pid.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
import tempfile

#: …_<8-hex tag>_<pid> with an optional _v<N> state-version suffix
_PID_DIR = re.compile(r"^pu4spark_\w+_[0-9a-f]{8}_(\d+)(?:_v\d+)?$")

_installed = False


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except OSError:
        return True  # EPERM etc. — it exists, leave it alone
    return True


def _iter_pid_dirs():
    tmp = tempfile.gettempdir()
    try:
        names = os.listdir(tmp)
    except OSError:
        return
    for name in names:
        m = _PID_DIR.match(name)
        if m:
            yield os.path.join(tmp, name), int(m.group(1))


def sweep_stale_scratch() -> int:
    """Remove scratch dirs left by DEAD processes; returns the count."""
    n = 0
    for path, pid in _iter_pid_dirs():
        if pid != os.getpid() and not _pid_alive(pid):
            shutil.rmtree(path, ignore_errors=True)
            n += 1
    return n


def _cleanup_own() -> None:
    me = os.getpid()
    for path, pid in _iter_pid_dirs():
        if pid == me:
            shutil.rmtree(path, ignore_errors=True)


def install_scratch_gc() -> None:
    """Idempotent: sweep dead processes' leftovers now, and register
    this process's own cleanup for exit."""
    global _installed
    if _installed:
        return
    _installed = True
    sweep_stale_scratch()
    atexit.register(_cleanup_own)
