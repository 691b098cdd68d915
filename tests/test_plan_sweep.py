"""Whole-registry physical-plan sweep.

Every registered batch query gets its physical plan built (planning
only — nothing executes) and audited against the two anti-patterns
that are never acceptable at 100 TB:

- ``CartesianProduct`` — an unkeyed all-pairs join. Deliberate 1-row
  scalar broadcasts plan as BroadcastNestedLoopJoin, which is allowed.
- ``BatchEvalPython`` — row-at-a-time Python UDF serde. The sanctioned
  Python tiers are Arrow-batched (``ArrowEvalPython``,
  ``FlatMapGroupsInPandas``, ``MapInPandas``), which are allowed; the
  one deliberate row-Python demo is the UDTF (whitelisted, its codegen
  twin is the production path).

Streaming drains and layout-staging queries are skipped: building
their "plan" executes work (availableNow drains / ensure-* writes),
and their shapes are pinned by their own dedicated tests.
"""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE

#: Queries whose invocation executes work instead of just planning.
_EXECUTES_ON_BUILD = {
    "clustered_range_scan",      # stages the Hilbert layout
    "join_bucketed_colocated",   # stages the bucketed layout
    "binaryfile_wav_ingest",     # stages the media dir (cheap, but IO)
}

#: Deliberate row-Python: the UDTF tier demo (codegen twin exists).
_ROW_PYTHON_OK = {"udtf_doc_chunks"}


def _batch_queries():
    from sql_database_engine_spark import operators
    operators.load_all()
    return {n: fn for n, fn in operators.QUERIES.items()
            if not n.startswith("stream_") and n not in _EXECUTES_ON_BUILD}


def test_registry_plans_free_of_scale_antipatterns(spark):
    """One planning pass over the whole registry, both audits."""
    cartesian, row_python = [], []
    for name, fn in _batch_queries().items():
        plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if name not in _ROW_PYTHON_OK:
            # BatchEvalPythonExec is the row-serde operator; the Arrow
            # tiers plan as ArrowEvalPython / MapInPandas /
            # FlatMapGroupsInPandas and are allowed.
            for line in plan.splitlines():
                if "BatchEvalPython" in line and "UDTF" not in line:
                    row_python.append(name)
                    break
    assert not cartesian, f"unkeyed all-pairs joins in: {cartesian}"
    assert not row_python, f"row-at-a-time Python in: {row_python}"
