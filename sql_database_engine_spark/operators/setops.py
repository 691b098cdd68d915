"""Set operations: union / intersect / except / distinct.

Spark implements INTERSECT/EXCEPT as aggregations or left-semi/anti
joins on all columns — they shuffle on the full row, so at scale we
apply them to key projections, never to wide rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import Catalog
from . import query

_URGENT = "SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
_BIG = "SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000"


def _urgent(cat: Catalog) -> DataFrame:
    return (cat.orders.filter(F.col("o_orderpriority") == "1-URGENT")
            .select("o_custkey").distinct())


def _big(cat: Catalog) -> DataFrame:
    return (cat.orders.filter(F.col("o_totalprice") > 300000)
            .select("o_custkey").distinct())


@query("setop_union", oracle=f"{_URGENT} UNION {_BIG}")
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    cat = Catalog(spark, sf_dir)
    return _urgent(cat).union(_big(cat)).distinct()


@query("setop_intersect", oracle=f"{_URGENT} INTERSECT {_BIG}")
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers in both sets."""
    cat = Catalog(spark, sf_dir)
    return _urgent(cat).intersect(_big(cat))


@query("setop_except", oracle=f"{_URGENT} EXCEPT {_BIG}")
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: urgent-priority customers without a big-ticket order."""
    cat = Catalog(spark, sf_dir)
    return _urgent(cat).exceptAll(_big(cat)).distinct()


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT on a projection (partial dedup map-side, then a
    key-only shuffle)."""
    return Catalog(spark, sf_dir).customer.select("c_mktsegment", "c_nationkey").distinct()


@query(
    "union_by_name_tagged",
    oracle="""
    SELECT 'customer' AS side, c_custkey AS acct_key, c_acctbal AS balance
    FROM customer WHERE c_acctbal < 0
    UNION ALL
    SELECT 'supplier' AS side, s_suppkey AS acct_key, s_acctbal AS balance
    FROM supplier WHERE s_acctbal < 0
    """,
)
def union_by_name_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of heterogeneous sources aligned by column name
    (schema-evolution-safe union — the 100 TB habit)."""
    cat = Catalog(spark, sf_dir)
    c = (cat.customer.filter(F.col("c_acctbal") < 0)
         .select(F.lit("customer").alias("side"),
                 F.col("c_custkey").alias("acct_key"),
                 F.col("c_acctbal").alias("balance")))
    s = (cat.supplier.filter(F.col("s_acctbal") < 0)
         .select(F.lit("supplier").alias("side"),
                 F.col("s_suppkey").alias("acct_key"),
                 F.col("s_acctbal").alias("balance")))
    return c.unionByName(s)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: multiplicity = min of the two
    sides) — distinct from the set variant above."""
    cat = Catalog(spark, sf_dir)
    a = cat.orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = cat.orders.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return a.intersectAll(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics: multiplicity subtraction)."""
    cat = Catalog(spark, sf_dir)
    a = cat.orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = cat.orders.filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return a.exceptAll(b)
