"""Third-wave TPC-H query shapes: Q5, Q8, Q12, Q13, Q17, Q21, Q22.

The reference ships the classic decision-support shapes as its
acceptance queries (see SURVEY.md §2 "query surface"); this module
adds the remaining ones the driver testdata can express. The testdata
has no ``partsupp`` table and ``lineitem`` carries no
shipmode/commitdate/receiptdate, so three queries are adapted while
keeping their *query shape* — the part the engine must support —
intact:

- Q12: classify by ``l_linestatus`` instead of shipmode (same
  join + conditional-count shape).
- Q21: "kept waiting" means shipped >60 days after the order date
  (same EXISTS / NOT-EXISTS double-correlation shape).
- Q22: "dormant" means no order since 2000-01-01 and the country-code
  IN-list becomes a market-segment IN-list (same scalar-subquery +
  anti-join shape).

Scale notes (100 TB): every query broadcasts the dimensions that stay
small at any SF (region/nation/supplier — asserted by
``Catalog.broadcast``) and lets the fact-side joins shuffle on their
keys under AQE. Correlated subqueries are decorrelated into aggregate
joins / windows — one shuffle each instead of a per-row probe; this is
what Catalyst itself does for SQL-authored correlation, expressed
explicitly at the DataFrame layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import Catalog
from ..functions.exact import money_avg, money_sum, MONEY_AVG_SQL, MONEY_SUM_SQL
from . import query

REV_SQL = "l_extendedprice * (1 - l_discount)"


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {MONEY_SUM_SQL(REV_SQL)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where the customer and the supplier
    share a nation. The same-nation equality rides along on the
    supplier join (a second equi-key, not a post-filter), so Catalyst
    hashes on both columns. region/nation/supplier broadcast."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer
        .join(cat.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter((F.col("o_orderdate") >= _ts("1996-01-01"))
                & (F.col("o_orderdate") < _ts("1998-01-01")))
        .join(cat.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.broadcast("supplier"),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(cat.broadcast("nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(cat.broadcast("region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(money_sum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


@query(
    "q8_market_share",
    oracle="""
    WITH vol AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                   AS vol_cents,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                              THEN vol_cents ELSE 0 END) AS BIGINT) AS DOUBLE)
           / CAST(CAST(SUM(vol_cents) AS BIGINT) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of ECONOMY-part revenue sold into
    AMERICA, per year. Joins ``nation`` twice under different roles
    (customer's for the region filter, supplier's for the share
    numerator) — both broadcast. The share is a ratio of two exact
    cent-sums, so it is bit-reproducible."""
    cat = Catalog(spark, sf_dir)
    n_cust = cat.broadcast("nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    n_supp = cat.broadcast("nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = (
        cat.part.filter(F.col("p_type") == "ECONOMY")
        .join(cat.lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(cat.broadcast("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter((F.col("o_orderdate") >= _ts("1996-01-01"))
                & (F.col("o_orderdate") < _ts("1998-01-01")))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(n_cust, F.col("c_nationkey") == F.col("cn_key"))
        .join(cat.broadcast("region"), F.col("cn_region") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .join(n_supp, F.col("s_nationkey") == F.col("sn_key"))
        .select(F.year("o_orderdate").alias("o_year"),
                F.round(_rev() * 100).cast("long").alias("vol_cents"),
                "supp_nation")
    )
    share_cents = F.sum(F.when(F.col("supp_nation") == "NATION_3",
                               F.col("vol_cents")).otherwise(F.lit(0)))
    return (
        vol.groupBy("o_year")
        .agg((share_cents.cast("double")
              / F.sum("vol_cents").cast("double")).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → linestatus: the testdata lineitem
    has no shipmode): one fact-fact join, then conditional counts —
    the CASE folds into the partial aggregate, so each side of the
    count pair is map-side combined before the single shuffle."""
    cat = Catalog(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        cat.lineitem
        .filter((F.col("l_shipdate") >= _ts("1997-01-01"))
                & (F.col("l_shipdate") < _ts("1998-01-01")))
        .join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
        .orderBy("l_linestatus")
    )


@query(
    "q13_customer_order_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of per-customer order counts, with a
    filtering predicate *inside* the left join's ON clause (customers
    whose only orders are urgent still count with c_count = 0 — a
    WHERE would drop them). COUNT(o_orderkey) skips the null-extended
    rows; the double aggregation is two shuffles, the second tiny."""
    cat = Catalog(spark, sf_dir)
    c_orders = (
        cat.customer.join(
            cat.orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small orders of Brand#23 parts. The
    correlated per-part AVG decorrelates into a window over the joined
    rows (every lineitem of each Brand#23 part is present, so the
    window sees exactly the subquery's input — no extra scan of
    lineitem, unlike the textbook aggregate-then-rejoin plan).
    l_quantity is integral in the testdata, so AVG is exact and the
    0.2× threshold is bit-reproducible."""
    cat = Catalog(spark, sf_dir)
    joined = (
        cat.lineitem
        .join(F.broadcast(cat.part.filter(F.col("p_brand") == "Brand#23")),
              F.col("p_partkey") == F.col("l_partkey"))
    )
    part_avg = F.avg("l_quantity").over(W.partitionBy("l_partkey"))
    return (
        joined.withColumn("__thresh", 0.2 * part_avg)
        .filter(F.col("l_quantity") < F.col("__thresh"))
        .agg((F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
              .cast("double") / 100.0 / 7.0).alias("avg_yearly"))
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate >
                            CAST(o_orderdate AS DATE) + INTERVAL 60 DAY)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape ("late" = shipped >60 days after order date;
    the testdata has no commit/receipt dates): suppliers who were the
    *sole* late supplier on a finished multi-supplier order.

    The EXISTS / NOT-EXISTS pair decorrelates into a per-(order,
    supplier) aggregation plus an unbounded window over l_orderkey: an
    order qualifies a supplier iff it has >1 distinct suppliers and
    exactly one of them was late. The window (not aggregate-then-
    rejoin) keeps the per-order stats on the rows that carry them —
    one exchange on l_orderkey instead of a shuffle + sort-merge
    self-join. Counting DISTINCT orders per supplier matches the
    oracle's COUNT(DISTINCT l1.l_orderkey)."""
    cat = Catalog(spark, sf_dir)
    late = F.col("l_shipdate") > F.date_add(
        F.col("o_orderdate").cast("date"), 60).cast("timestamp")
    flagged = (
        cat.lineitem
        .join(cat.orders.filter(F.col("o_orderstatus") == "F"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("late"))
    )
    per_order = W.partitionBy("l_orderkey")
    return (
        flagged
        .withColumn("n_supp", F.count(F.lit(1)).over(per_order))
        .withColumn("n_late", F.sum("late").over(per_order))
        .filter((F.col("late") == 1)
                & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(cat.broadcast("supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "q22_dormant_value_customers",
    oracle=f"""
    WITH avg_bal AS (
        SELECT {MONEY_AVG_SQL("c_acctbal")} AS threshold
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           {MONEY_SUM_SQL("c_acctbal")} AS totacctbal
    FROM customer, avg_bal
    WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
      AND c_acctbal > threshold
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q22_dormant_value_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (segment IN-list for the country-code IN-list;
    "dormant" = no order since 2000 — every sf0.01 customer has *some*
    order): above-average-balance customers gone quiet, per segment.
    The scalar AVG subquery broadcasts as a one-row cross join; the
    NOT EXISTS is a left-anti join against orders pre-filtered to the
    dormancy window (filter *before* the anti join: at 100 TB that
    prunes most of the orders scan ahead of the shuffle). The
    threshold is an exact cents-average, so the > compare is
    bit-identical in both engines."""
    cat = Catalog(spark, sf_dir)
    thresh = (
        cat.customer.filter(F.col("c_acctbal") > 0.0)
        .agg(money_avg(F.col("c_acctbal")).alias("threshold"))
    )
    recent = cat.orders.filter(
        F.col("o_orderdate") >= _ts("2000-01-01")).select("o_custkey")
    return (
        cat.customer
        .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "MACHINERY"))
        .crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("numcust"),
             money_sum(F.col("c_acctbal")).alias("totacctbal"))
        .orderBy("c_mktsegment")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS order_year,
           {MONEY_SUM_SQL("l_extendedprice * (1 - l_discount)"
                          " - 0.6 * p_retailprice * l_quantity")} AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by supplier nation and
    year), adapted for the partsupp-less testdata: unit supply cost is
    proxied as 60% of p_retailprice — a pure function of the part row,
    keeping Q9's defining structure intact (selective LIKE on part,
    two fact joins, profit expression mixing lineitem and part
    measures, nation x year rollup).

    Scale: part is filtered by the LIKE *before* its join (Catalyst
    pushes the predicate to the part scan), then joins the fact on
    l_partkey — at 100 TB this is a shuffle join whose build side was
    pre-pruned; supplier/nation broadcast. The profit expression goes
    through the engine-wide exact-cents policy so the nation x year
    sums hash-match the oracle bit-for-bit.
    """
    cat = Catalog(spark, sf_dir)
    red_parts = cat.part.filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice")
    profit = (_rev()
              - 0.6 * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        cat.lineitem
        .join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(red_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(cat.broadcast("supplier").select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cat.broadcast("nation").select("n_nationkey", "n_name"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(money_sum(profit).alias("profit"))
    )
