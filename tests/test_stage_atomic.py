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


def test_toctou_rival_commit_between_check_and_sweep(tmp_path, monkeypatch):
    """ADVICE r5: between the committed-marker check and the
    legacy-partial sweep, a rival can rename its finished build into
    the artifact path. The old ``shutil.rmtree`` then destroyed that
    committed artifact (readers holding its file list get
    FileNotFoundException). Pin: the swept dir's marker is re-checked
    after the rename-aside and a swept-up commit is restored intact —
    the build callback must never run and no rival byte may be lost.

    The race window is simulated deterministically by making the FIRST
    marker-existence probe read stale (as if the rival's commit landed
    a microsecond after it)."""
    import sql_database_engine_spark.scratch as scratch

    art = str(tmp_path / "artifact")
    os.makedirs(art)
    _write(art, "_SUCCESS", "")
    _write(art, "data", "rival-commit")

    real_exists = os.path.exists
    lied = []

    def stale_first_read(p):
        if not lied and p == os.path.join(art, "_SUCCESS"):
            lied.append(True)
            return False
        return real_exists(p)

    monkeypatch.setattr(scratch.os.path, "exists", stale_first_read)

    def build(d):  # pragma: no cover — must not run
        raise AssertionError("rebuilt over a rival's commit")

    out = scratch.stage_atomic(art, build, marker="_SUCCESS")
    assert out == art
    assert open(os.path.join(art, "data")).read() == "rival-commit"
    assert real_exists(os.path.join(art, "_SUCCESS"))
    # no aside/tmp siblings left behind
    assert os.listdir(tmp_path) == ["artifact"]


def _race_worker(args):
    """One racing session: stage the shared artifact (slow build with
    real fsync-scale latency), then act as a READER — list the
    committed files and re-open every one. Returns what it observed;
    any FileNotFoundError mid-read is the regression."""
    art, wid = args
    import time

    from sql_database_engine_spark.scratch import stage_atomic

    def build(d):
        for i in range(5):
            with open(os.path.join(d, f"part-{i}"), "w") as f:
                f.write(f"builder={wid}")
            time.sleep(0.01)
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("")

    try:
        out = stage_atomic(art, build, marker="_SUCCESS")
        seen = sorted(n for n in os.listdir(out) if n.startswith("part-"))
        bodies = set()
        for _ in range(20):  # probe loop: re-read while rivals race
            for n in seen:
                with open(os.path.join(out, n)) as f:
                    bodies.add(f.read())
            time.sleep(0.002)
        return ("ok", sorted(bodies), seen)
    except Exception as e:  # noqa: BLE001 — the test asserts on this
        return ("err", type(e).__name__, str(e))


def test_concurrent_sessions_build_and_probe_one_commit(tmp_path):
    """VERDICT r5 item 6: the two-session staging race, pinned as a
    real multi-process test. Eight processes concurrently stage the
    SAME artifact dir and then probe it like readers. Contract: every
    session succeeds, exactly one build's files are ever visible (one
    rename wins; no torn mixes of two builds), and no reader observes
    a missing file. The legacy overwrite-in-place stager fails this
    with FileNotFoundError / torn multi-builder contents."""
    import multiprocessing as mp

    art = str(tmp_path / "artifact")
    with mp.get_context("spawn").Pool(8) as pool:
        results = pool.map(_race_worker, [(art, w) for w in range(8)])
    errs = [r for r in results if r[0] != "ok"]
    assert not errs, f"racing sessions failed: {errs}"
    winners = {b for _, bodies, _ in results for b in bodies}
    assert len(winners) == 1, f"torn artifact: files from {winners}"
    assert all(seen == [f"part-{i}" for i in range(5)]
               for _, _, seen in results)
    assert os.path.exists(os.path.join(art, "_SUCCESS"))
