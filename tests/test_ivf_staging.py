"""Staged-IVF index lifecycle pins (`similarity._ivf_stage`): the
build-once/probe-many contract only holds if staging is idempotent,
re-keys when the source changes, and rebuilds bit-identically — the
properties a persisted index needs before anything at 100 TB trusts
it. Probe-plan shape is pinned separately in test_plan_quality."""

from __future__ import annotations

import os
import shutil

from .conftest import SF_SMOKE


def _stage(spark):
    from sql_database_engine_spark.operators.similarity import _ivf_stage
    return _ivf_stage(spark, SF_SMOKE)


def test_staging_is_idempotent(spark):
    """Second call must reuse the staged files, not rewrite them."""
    stage = _stage(spark)
    assigns = os.path.join(stage, "assignments")
    mtimes = {p: os.path.getmtime(os.path.join(r, p))
              for r, _, fs in os.walk(assigns) for p in fs}
    assert mtimes, "no staged assignment files"
    stage2 = _stage(spark)
    assert stage2 == stage
    mtimes2 = {p: os.path.getmtime(os.path.join(r, p))
               for r, _, fs in os.walk(assigns) for p in fs}
    assert mtimes2 == mtimes, "re-staged despite committed artifact"


def test_rebuild_is_bit_identical(spark):
    """Blowing away the staging and rebuilding must reproduce the
    exact same index content — the determinism the SQL oracle's
    build replay presupposes."""
    stage = _stage(spark)

    def snapshot():
        cents = sorted(map(tuple, spark.read.parquet(
            os.path.join(stage, "centroids")).collect()))
        assigns = sorted(
            (r["vec_id"], tuple(r["e"]), r["cid"])
            for r in spark.read.parquet(
                os.path.join(stage, "assignments")).collect())
        return cents, assigns

    before = snapshot()
    shutil.rmtree(stage)
    stage2 = _stage(spark)
    assert stage2 == stage  # same fingerprint -> same dir
    assert snapshot() == before


def test_staging_rekeys_on_source_fingerprint(spark):
    """A different source fingerprint must map to a DIFFERENT staging
    dir (regenerated testdata can never silently serve a stale
    index). Checked at the scratch-key level — the same rule
    stream_merge_into_snapshot relies on."""
    from sql_database_engine_spark.scratch import (scratch_dir,
                                                   source_fingerprint)
    fp = source_fingerprint(SF_SMOKE, "embeddings.parquet")
    d1 = scratch_dir("ivf_index", SF_SMOKE, version="v1|" + fp)
    d2 = scratch_dir("ivf_index", SF_SMOKE, version="v1|" + fp + "x")
    assert d1 != d2


def test_assignments_partitioned_by_centroid(spark):
    """The staged layout must be cid-partitioned directories — the
    physical property the probe's partition filter prunes on."""
    stage = _stage(spark)
    parts = [d for d in os.listdir(os.path.join(stage, "assignments"))
             if d.startswith("cid=")]
    assert len(parts) == 4, parts
