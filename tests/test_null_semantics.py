"""Regression pins for the null_sweep defect classes.

The shipped fixtures contain zero NULLs, so the ordinary oracle
differential can never exercise a null code path (the round-5
null_sweep audit found 42 measures-tier + 34 payload-tier divergences
that way). This module keeps one representative query per FIXED CLASS
permanently under test against the null-injected replica — the audit
tool (`tools/null_sweep.py`) remains the registry-wide sweep; these
pins make the classes fail fast in `pytest` between audit runs.

Classes covered (one query each):
- explicit NULLS LAST window ordering ................ window_rank
- null-skipping order statistics ..................... percentile_cont_interpolated
- null-safe group re-join ............................ winsorize_event_values
- label-null coalesce in metric denominators ......... score_auc_exact
- complement region split (IVM) ...................... ivm_append_join_view
- struct-carry point-in-time versions ................ scd2_point_in_time_join
- 3VL neither-bucket counting ........................ q12_priority_by_linestatus
- NULL map keys / value flattening ................... map_column_ops
- concat_ws n-gram collapse .......................... event_path_trigrams
- observed-vector contract (similarity family) ....... ann_lsh_topk
- entity-key contract (as-of joins) .................. events_asof_join
- missing-text contract (curation gates) ............. curation_gate_report
- pandas-kernel null-in/null-out ..................... pandas_udf_token_count
- stateful-kernel NaN/None handling .................. stream_user_profiles
"""

from __future__ import annotations

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))

SF = "/root/testdata/sf0.001"

PINNED = [
    "window_rank",
    "percentile_cont_interpolated",
    "winsorize_event_values",
    "score_auc_exact",
    "ivm_append_join_view",
    "scd2_point_in_time_join",
    "q12_priority_by_linestatus",
    "map_column_ops",
    "event_path_trigrams",
    "ann_lsh_topk",
    "events_asof_join",
    "curation_gate_report",
    "pandas_udf_token_count",
    "stream_user_profiles",
]


@pytest.fixture(scope="module")
def replica():
    """Full-tier null-injected replica (staged once, reused)."""
    from null_sweep import stage_replica

    path, proof = stage_replica(SF, "full", ROOT)
    # Vacuity guard: the audit-of-the-audit rule — every injected
    # column must actually contain nulls and row counts must match.
    assert all(p["rows_src"] == p["rows_dst"] for p in proof.values())
    assert all(n > 0 for p in proof.values() for n in p["nulls"].values())
    return path


@pytest.fixture(scope="module")
def duck_replica(replica):
    import duckdb

    from sql_database_engine_spark.catalog import register_duck_views

    con = duckdb.connect()
    register_duck_views(con, replica)
    yield con
    con.close()


@pytest.mark.parametrize("name", PINNED)
def test_null_class_pin(spark, duck_replica, replica, name):
    from cert_sweep import duck_rows, spark_rows, value_hash

    from sql_database_engine_spark import operators
    operators.load_all()
    a, a_cols = spark_rows(operators.QUERIES[name](spark, replica))
    if name not in operators.ORACLES:
        # rows-only pins assert executability on null-bearing data
        return
    b, b_cols = duck_rows(duck_replica, operators.ORACLES[name])
    assert a_cols == b_cols, f"{name}: column mismatch"
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)} rows"
    assert value_hash(a) == value_hash(b), f"{name}: value hash mismatch"
