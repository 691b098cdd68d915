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
import shutil
import tempfile

#: Root for all engine scratch dirs.
SCRATCH_ROOT = "/tmp"


def stage_atomic(artifact_dir: str, build, marker: str | None = None) -> str:
    """Multi-process-safe write-once staging: rename-as-commit.

    The overwrite-in-place idiom this replaces has a real race: every
    fresh session saw "not staged yet" in its own catalog and rewrote
    the SHARED on-disk artifact, so two concurrent sessions (the
    correctness driver plus any sweep tool) could collide — the loser
    dies with ``TASK_WRITE_FAILED`` on a ``_temporary`` attempt dir
    the winner's overwrite just deleted, or a reader of the old files
    gets ``FileNotFoundException`` mid-scan (reproduced under
    ``tools/``-style concurrency; the r5c determinism sweep's
    one-off ``agg_bucketed_no_shuffle`` ERROR is this class).

    Protocol: if ``artifact_dir`` is committed, return it untouched
    (a committed artifact is never rewritten — readers can hold file
    lists indefinitely). Otherwise ``build(tmp_dir)`` writes into a
    unique sibling and one atomic ``os.rename`` publishes it; when
    rivals race, exactly one rename wins and losers discard their
    private build and read the winner's. No path ever holds a
    half-written artifact, and no committed file is ever deleted.

    ``marker``: optional relative path (e.g. ``_SUCCESS``) that must
    exist inside ``artifact_dir`` for it to count as committed —
    guards against garbage left at the final path by the legacy
    in-place writers, which rename-commit can never produce itself.
    """
    committed = os.path.join(artifact_dir, marker) if marker else artifact_dir
    if os.path.exists(committed):
        return artifact_dir
    parent = os.path.dirname(artifact_dir)
    os.makedirs(parent, exist_ok=True)
    if os.path.exists(artifact_dir):
        # Legacy partial write (reachable only with a marker: without
        # one, any existing dir counted as committed above). Never
        # rmtree in place — between the marker check and the delete, a
        # rival can rename ITS build into artifact_dir, and the rmtree
        # would destroy a committed artifact out from under readers
        # (the exact race this function exists to close). Instead:
        # atomically rename the dir aside, re-check the marker INSIDE
        # the renamed dir, and if a rival's commit got swept up in the
        # rename, put it straight back.
        aside = tempfile.mkdtemp(
            prefix=os.path.basename(artifact_dir) + ".aside.", dir=parent)
        swept = os.path.join(aside, "d")
        # Re-check the marker at the last instant before the
        # rename-aside: a rival may have committed since the
        # top-of-function check, and skipping the rename entirely is
        # strictly better than sweep-then-restore. A commit landing
        # between THIS check and the rename is still swept and put
        # back below — during that restore the committed path is
        # briefly absent, the one residual visibility gap
        # rename-as-commit cannot close (a reader that re-opens by
        # path in that window must tolerate one retry; readers that
        # already hold file handles are unaffected).
        if os.path.exists(committed):
            shutil.rmtree(aside, ignore_errors=True)
            return artifact_dir
        try:
            os.rename(artifact_dir, swept)
        except OSError:
            # A rival moved/cleared it first; fall through to the
            # normal build-and-commit race below.
            shutil.rmtree(aside, ignore_errors=True)
        else:
            if os.path.exists(os.path.join(swept, marker)):
                # Commit won the race: restore it. If ANOTHER rival
                # committed at artifact_dir in the interim, both dirs
                # hold valid commits of the same deterministic build —
                # keep theirs, discard the swept copy.
                try:
                    os.rename(swept, artifact_dir)
                    shutil.rmtree(aside, ignore_errors=True)
                    return artifact_dir
                except OSError:
                    pass
            shutil.rmtree(aside, ignore_errors=True)
        if os.path.exists(committed):  # rival committed meanwhile
            return artifact_dir
    tmp = tempfile.mkdtemp(
        prefix=os.path.basename(artifact_dir) + ".tmp.", dir=parent)
    try:
        build(tmp)
        os.rename(tmp, artifact_dir)  # the commit point
    except OSError:
        if not os.path.exists(committed):  # not a lost race: real failure
            raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return artifact_dir


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


def dump_schema(df, staging_dir: str, name: str) -> None:
    """Persist ``df``'s schema as ``<name>.schema.json`` next to the
    dataset ``<name>`` inside a staged artifact. A persisted artifact
    must carry its own schema: an EMPTY dataset writes zero parquet
    data files (only ``_SUCCESS``), and schema inference over a
    data-less directory throws ``UNABLE_TO_INFER_SCHEMA`` — so any
    reader that infers is broken for exactly the empty-partition case
    a 100 TB pipeline hits routinely."""
    with open(os.path.join(staging_dir, f"{name}.schema.json"), "w") as f:
        f.write(df.schema.json())


def read_staged_parquet(spark, artifact_dir: str, name: str):
    """Read dataset ``<name>`` from a committed staged artifact using
    its persisted schema sidecar (see :func:`dump_schema`) — total
    over empty datasets, and partition-column types come from the
    writer, not directory-name re-inference."""
    import json

    from pyspark.sql.types import StructType

    with open(os.path.join(artifact_dir, f"{name}.schema.json")) as f:
        schema = StructType.fromJson(json.loads(f.read()))
    return (spark.read.schema(schema)
            .parquet(os.path.join(artifact_dir, name)))
