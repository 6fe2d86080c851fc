"""Landing-directory builders for the file-source streams.

The parquet file source wants a *directory* of arriving files; the
fixtures are single read-only parquet files, so each stream gets a tmp
directory holding a symlink to its fixture — in production this is
simply the directory new files land in.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


def symlink_landing_dir(src_file: str, prefix: str) -> str:
    """Idempotent tmp landing dir containing one symlink to
    ``src_file``.  Uses ``lexists``, not ``exists``: a DANGLING symlink
    (fixture path moved or regenerated) reports ``exists()=False`` but
    still blocks ``os.symlink`` (ADVICE r4) — the link is recreated
    whenever its target changed."""
    src = os.path.abspath(src_file)
    tag = hashlib.md5(src.encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(src))
    if os.path.lexists(link):
        if os.path.islink(link) and os.readlink(link) == src:
            return d
        os.remove(link)
    os.symlink(src, link)
    return d
