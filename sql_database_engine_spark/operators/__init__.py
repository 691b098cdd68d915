"""Operator inventory: named, oracle-checked DataFrame query builders.

Each operator module registers its queries with :func:`query`. A
registered query is a callable ``(spark, sf_dir) -> DataFrame``; when
an oracle is supplied it is the DuckDB-dialect SQL computing the same
result (same column names, bit-identical values — see
``functions.exact`` for the float-determinism policy). Queries without
an oracle are genuinely non-SQL-expressible (probabilistic LSH,
streaming state) and get a rows-only check from the driver.

``__spark_entry__.py`` exposes the union of all registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query, optionally with its DuckDB oracle SQL."""
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def load_all() -> None:
    """Import every operator module (side effect: registry fills)."""
    from . import (relational, analytics, windows, setops, scalar, events,  # noqa: F401
                   text, similarity, multimodal)
