"""Exact (bit-reproducible) aggregation over double-typed measures.

Why this exists
---------------
A parallel ``SUM(double)`` is non-associative: Spark's partial/final
hash aggregation and DuckDB's parallel aggregation add the same values
in different orders and produce results differing in the last ulps.
The correctness driver hash-compares our results against a DuckDB
oracle, so "equal up to 1e-9" is not good enough — values must match
*bit for bit*.

The fix: make the aggregate integral. Per row we compute
``CAST(ROUND(expr * 100) AS BIGINT)`` — a short, fixed sequence of
IEEE-754 double ops that both engines evaluate identically (same
binary input, same operation order, round-half-away-from-zero in both
Spark's ROUND and DuckDB's ROUND) — then SUM the resulting integers,
which is exact and order-independent. Dividing the integer total by
``100.0`` afterwards is a single deterministic double op.

This is also the *right* design at 100 TB: money should be
fixed-point. The scale=2 here matches the testdata's 2-decimal money
columns; a production engine would store DECIMAL(18,2) at rest.

Every helper has a twin SQL generator so the DuckDB oracle is the
same arithmetic by construction. DuckDB quirk handled: its SUM over
BIGINT returns HUGEINT (int128), so oracle SQL re-casts to BIGINT
before any further arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SCALE = 100  # 2 decimal places: the testdata money precision


def cents(expr: Column) -> Column:
    """Per-row exact integer representation of a 2-decimal measure."""
    return F.round(expr * SCALE).cast("long")


def money_sum(expr: Column) -> Column:
    """Order-independent SUM over a double measure, as a double."""
    return F.sum(cents(expr)).cast("double") / float(SCALE)


def money_avg(expr: Column) -> Column:
    """Order-independent AVG over a double measure, as a double."""
    # sum_cents / 100.0 / n : two deterministic double divisions.
    return F.sum(cents(expr)).cast("double") / float(SCALE) / F.count(F.lit(1))


def MONEY_SUM_SQL(expr_sql: str) -> str:
    """DuckDB SQL computing exactly :func:`money_sum`."""
    return (f"CAST(CAST(SUM(CAST(ROUND(({expr_sql}) * 100) AS BIGINT)) AS BIGINT)"
            f" AS DOUBLE) / 100.0")


def MONEY_AVG_SQL(expr_sql: str) -> str:
    """DuckDB SQL computing exactly :func:`money_avg`."""
    return f"{MONEY_SUM_SQL(expr_sql)} / COUNT(*)"
