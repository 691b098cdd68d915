"""Scratch staging directories for fixtures and materialized partials.

One idiom, one place: several operators stage derived artifacts under
/tmp (stored IVM partials, CSV/JSONL exports, the stream-source
symlink dir). The directory is keyed on the absolute source dir plus
an optional version token, so regenerated testdata or a bumped layout
version gets a fresh directory instead of silently reusing stale
files. Relocating scratch off /tmp or changing the keying now happens
here, not in six call sites.
"""

from __future__ import annotations

import hashlib
import os

#: Root for all engine scratch dirs.
SCRATCH_ROOT = "/tmp"


def scratch_dir(tag: str, sf_dir: str, version: str = "") -> str:
    """Deterministic per-(tag, source-dir, version) staging directory;
    created if absent, contents left to the caller."""
    key = os.path.abspath(sf_dir) + ("|" + version if version else "")
    d = os.path.join(SCRATCH_ROOT, f"spark_graft_{tag}",
                     hashlib.md5(key.encode()).hexdigest()[:12])
    os.makedirs(d, exist_ok=True)
    return d


def source_fingerprint(sf_dir: str, filename: str) -> str:
    """Cheap identity of a source file (size + mtime-ns): staging dirs
    keyed on it re-stage when testdata is regenerated IN PLACE — a
    skip-if-_SUCCESS fixture keyed on path alone would silently serve
    stale exports against fresh sources. A directory-shaped table (the
    production layout) fingerprints as the sum of part sizes plus the
    newest part mtime — a bare os.stat of the directory would report
    4096 bytes forever and miss in-place part rewrites."""
    path = os.path.join(sf_dir, filename)
    if os.path.isdir(path):
        total = 0
        newest = 0
        for root, _, files in os.walk(path):
            for f in files:
                st = os.stat(os.path.join(root, f))
                total += st.st_size
                newest = max(newest, st.st_mtime_ns)
        return f"{total}-{newest}"
    st = os.stat(path)
    return f"{st.st_size}-{st.st_mtime_ns}"
