"""Pins for ``scratch.stage_atomic`` — the rename-as-commit staging
protocol every shared on-disk artifact (bucketed facts, Hilbert
layout, both IVF indexes) now publishes through.

The defect class it closes (reproduced before the fix): the legacy
overwrite-in-place stagers let any fresh session rewrite a SHARED
artifact while a rival session was scanning or writing it — two
concurrent processes die with ``TASK_WRITE_FAILED`` on each other's
``_temporary`` dirs, or a reader hits ``FileNotFoundException`` on
files the winner's overwrite deleted (the r5c determinism sweep's
one-off ``agg_bucketed_no_shuffle`` ERROR is this signature). These
pins check the protocol's invariants single-process; the invariants
themselves (commit = one rename, committed dirs never rewritten) are
what make the multi-process interleavings safe.
"""

from __future__ import annotations

import os

import pytest

from sql_database_engine_spark.scratch import stage_atomic


def _write(d: str, name: str = "data", body: str = "x") -> None:
    with open(os.path.join(d, name), "w") as f:
        f.write(body)


def test_builds_and_publishes(tmp_path):
    art = str(tmp_path / "artifact")
    out = stage_atomic(art, lambda d: _write(d, "data", "v1"))
    assert out == art
    assert open(os.path.join(art, "data")).read() == "v1"
    # no tmp siblings left behind
    assert os.listdir(tmp_path) == ["artifact"]


def test_committed_artifact_is_never_rewritten(tmp_path):
    art = str(tmp_path / "artifact")
    stage_atomic(art, lambda d: _write(d, "data", "v1"))

    def rebuild(d):  # pragma: no cover — must not run
        raise AssertionError("rebuilt a committed artifact")

    assert stage_atomic(art, rebuild) == art
    assert open(os.path.join(art, "data")).read() == "v1"


def test_final_path_never_holds_partial_state(tmp_path):
    """During build, the artifact path must not exist — readers
    either see nothing (and stage their own) or the complete
    artifact, never a half-written directory."""
    art = str(tmp_path / "artifact")

    def build(d):
        assert not os.path.exists(art)
        _write(d)

    stage_atomic(art, build)
    assert os.path.exists(art)


def test_lost_race_discards_private_build(tmp_path):
    """If a rival commits first (simulated by publishing the final
    dir inside our build), our rename loses and the rival's artifact
    survives untouched."""
    art = str(tmp_path / "artifact")

    def build(d):
        os.makedirs(art)
        _write(art, "data", "rival")
        _write(d, "data", "mine")

    out = stage_atomic(art, build)
    assert out == art
    assert open(os.path.join(art, "data")).read() == "rival"
    assert os.listdir(tmp_path) == ["artifact"]  # loser's tmp removed


def test_build_failure_propagates_and_leaves_no_artifact(tmp_path):
    art = str(tmp_path / "artifact")

    def build(d):
        _write(d)
        raise OSError("disk on fire")

    with pytest.raises(OSError, match="disk on fire"):
        stage_atomic(art, build)
    assert not os.path.exists(art)
    assert os.listdir(tmp_path) == []  # tmp cleaned up


def test_marker_guards_legacy_garbage(tmp_path):
    """A final dir WITHOUT the marker is legacy-partial garbage (the
    in-place writers could crash mid-overwrite): it must be cleared
    and rebuilt, while a dir WITH the marker counts as committed."""
    art = str(tmp_path / "artifact")
    os.makedirs(art)
    _write(art, "data", "stale-partial")  # no _SUCCESS

    stage_atomic(art, lambda d: [_write(d, "data", "fresh"),
                                 _write(d, "_SUCCESS", "")],
                 marker="_SUCCESS")
    assert open(os.path.join(art, "data")).read() == "fresh"

    def rebuild(d):  # pragma: no cover — must not run
        raise AssertionError("rebuilt despite marker")

    stage_atomic(art, rebuild, marker="_SUCCESS")
