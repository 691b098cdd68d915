"""Physical-plan audits: the scale contract, asserted.

Correctness tests prove the right rows come back; these prove the
plans would survive 100× the data — filters and projections reach the
parquet scan, bounded dims broadcast, top-k never globally sorts.
Regressions here are performance bugs even when results stay right.
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE


def _plan(spark, name):
    from sql_database_engine_spark import operators
    operators.load_all()
    df = operators.QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushed_to_scan(spark):
    plan = _plan(spark, "filter_project")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # Column pruning: the scan must read only the 6 referenced columns,
    # not all 11 of lineitem.
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    assert "l_tax" not in scan and "l_returnflag" not in scan


def test_flagship_broadcasts_bounded_dims(spark):
    plan = _plan(spark, "flagship_revenue_by_region")
    # nation and region joins must be broadcast (bounded at any SF);
    # at tiny SF Catalyst may broadcast more — that's AQE's call.
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "sort_limit_topk")
    assert "TakeOrderedAndProject" in plan
    # A global Sort + CollectLimit would be the unscalable shape.
    assert "Sort [l_extendedprice" not in plan


def test_q3_topk_take_ordered(spark):
    assert "TakeOrderedAndProject" in _plan(spark, "q3_shipping_priority")


def test_cosine_topk_broadcasts_query_vector(spark):
    plan = _plan(spark, "cosine_topk_bruteforce")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row build side


def test_semi_join_stays_semi(spark):
    plan = _plan(spark, "join_semi")
    assert "LeftSemi" in plan


def test_dedup_shuffles_digests_not_documents(spark):
    # The exact-dedup shuffle must carry the sha256 digest, not text.
    plan = _plan(spark, "dedup_exact_keep_first")
    exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert exchanges and all("content_hash" in l for l in exchanges)
    assert all("text" not in l for l in exchanges)
