"""Snapshot-versioned tables: time travel via metadata-pointer commits.

The mechanism every modern table format (Delta, Iceberg, Hudi) builds
on, reduced to its core: data files are immutable, each write lands in
a fresh version directory, and the COMMIT is a single atomic rename of
a small manifest file. Readers resolve versions purely from manifests,
so a half-written data directory (crash before commit) is invisible —
no reader coordination, no locks, scan-level isolation.

Layout:

    table/
      v00001/...parquet        immutable snapshot data
      v00002/...parquet
      _versions/00001.json     commit manifests (rename = commit point)
      _versions/00002.json

At 100 TB the same structure holds on an object store: manifests are
tiny (one PUT), snapshots are written by the cluster, and `vacuum`
is the only operation that deletes data. This module is driver-side
metadata bookkeeping only — all data movement is Spark jobs.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_VDIR = "_versions"


def _manifest_dir(path: str) -> str:
    return os.path.join(path, _VDIR)


def _committed(path: str) -> list[int]:
    vdir = _manifest_dir(path)
    if not os.path.isdir(vdir):
        return []
    return sorted(int(f[:-5]) for f in os.listdir(vdir) if f.endswith(".json"))


def write_snapshot(df: DataFrame, path: str) -> int:
    """Write a new immutable snapshot and commit it; returns the new
    version number. The commit point is the manifest rename — a crash
    anywhere before leaves an orphan data dir that readers never see
    (and `vacuum` clears)."""
    os.makedirs(_manifest_dir(path), exist_ok=True)
    versions = _committed(path)
    v = (versions[-1] + 1) if versions else 1
    data_dir = os.path.join(path, f"v{v:05d}")
    df.write.mode("overwrite").parquet(data_dir)
    n_rows = df.sparkSession.read.parquet(data_dir).count()
    manifest = {
        "version": v,
        "data_dir": f"v{v:05d}",
        "schema": df.schema.json(),
        "n_rows": n_rows,
    }
    tmp = os.path.join(_manifest_dir(path), f".{v:05d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(_manifest_dir(path), f"{v:05d}.json"))
    return v


def read_snapshot(spark: SparkSession, path: str,
                  version: int | None = None) -> DataFrame:
    """Read a committed snapshot — the latest by default, or any past
    version (time travel). Schema comes from the manifest, not
    re-inference, so a snapshot reads back identically forever."""
    versions = _committed(path)
    if not versions:
        raise FileNotFoundError(f"no committed snapshots at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not committed (have {versions})")
    with open(os.path.join(_manifest_dir(path), f"{v:05d}.json")) as f:
        m = json.load(f)
    schema = StructType.fromJson(json.loads(m["schema"]))
    return spark.read.schema(schema).parquet(os.path.join(path, m["data_dir"]))


def snapshots(path: str) -> list[dict]:
    """Commit history, oldest first: [{version, n_rows, data_dir}]."""
    out = []
    for v in _committed(path):
        with open(os.path.join(_manifest_dir(path), f"{v:05d}.json")) as f:
            m = json.load(f)
        out.append({"version": m["version"], "n_rows": m["n_rows"],
                    "data_dir": m["data_dir"]})
    return out


def vacuum(path: str, keep: int = 1) -> list[int]:
    """Drop all but the newest `keep` committed snapshots, plus any
    orphan (uncommitted) data dirs. Returns removed version numbers.
    The only operation that deletes data — everything else appends."""
    versions = _committed(path)
    keep_set = set(versions[-keep:]) if keep > 0 else set()
    removed = []
    for v in versions:
        if v not in keep_set:
            shutil.rmtree(os.path.join(path, f"v{v:05d}"), ignore_errors=True)
            os.remove(os.path.join(_manifest_dir(path), f"{v:05d}.json"))
            removed.append(v)
    committed_dirs = {f"v{v:05d}" for v in keep_set}
    for d in os.listdir(path):
        if d.startswith("v") and d not in committed_dirs and d != _VDIR:
            full = os.path.join(path, d)
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
                # orphans have no version number to report
    return removed


def merge_snapshot(spark: SparkSession, path: str, changes: DataFrame,
                   key: str, delete_col: str | None = None) -> int:
    """MERGE into a snapshot table: apply `changes` (upserts keyed on
    `key`; rows where `delete_col` is true are deletes) to the latest
    committed version and commit the result as a new version.

    This is the copy-on-write MERGE of the table formats: readers of
    the old version are untouched (snapshot isolation comes free from
    immutability), the new version becomes visible atomically at the
    manifest rename, and time travel doubles as the undo log. The
    merge itself is one outer join on the key — at 100 TB you restrict
    the rewrite to affected partitions; here the whole snapshot
    rewrites, which is the correct baseline semantics.
    """
    from pyspark.sql import functions as F

    current = read_snapshot(spark, path)
    if delete_col is not None:
        deletes = changes.filter(F.col(delete_col)).select(key)
        upserts = changes.filter(~F.col(delete_col)).drop(delete_col)
    else:
        deletes = None
        upserts = changes
    kept = current.join(upserts.select(key), key, "left_anti")
    merged = kept.unionByName(upserts)
    if deletes is not None:
        merged = merged.join(deletes, key, "left_anti")
    return write_snapshot(merged, path)
