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
from ..functions.exact import (cents, money_avg, money_sum,
                               MONEY_AVG_SQL, MONEY_SUM_SQL)
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
    count pair is map-side combined before the single shuffle.

    Null semantics (null_sweep audit): an unknown priority is
    NEITHER high nor low — SQL's 3-valued NOT IN already gives the
    oracle that reading, and the Spark side states it explicitly
    (a bare otherwise(1) would have silently counted null-priority
    lines as low)."""
    cat = Catalog(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    low = F.col("o_orderpriority").isNotNull() & ~high
    return (
        cat.lineitem
        .filter((F.col("l_shipdate") >= _ts("1997-01-01"))
                & (F.col("l_shipdate") < _ts("1998-01-01")))
        .join(cat.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(low, 1).otherwise(0)).alias("low_line_count"))
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
        .agg((F.sum(cents(F.col("l_extendedprice")))
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


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               CAST(MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS cost_cents
        FROM lineitem GROUP BY 1, 2
    )
    SELECT p_partkey, p_brand, s_name, n_name, s_acctbal,
           CAST(cost_cents AS DOUBLE) / 100.0 AS supply_cost
    FROM part, supply, supplier, nation, region
    WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE' AND p_size = 15 AND p_type = 'STANDARD'
      AND cost_cents = (
          SELECT MIN(s2.cost_cents)
          FROM supply s2, supplier sp2, nation n2, region r2
          WHERE s2.ps_partkey = p_partkey
            AND sp2.s_suppkey = s2.ps_suppkey
            AND sp2.s_nationkey = n2.n_nationkey
            AND n2.n_regionkey = r2.r_regionkey
            AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier per part within a region),
    adapted for the partsupp-less testdata: the supply catalog is
    derived from shipping history — cost of (part, supplier) is the
    cheapest line (exact cents) that pair ever shipped.

    The defining structure is the correlated MIN subquery ("the cost
    equals the region-wide minimum for that part"), decorrelated into
    a window MIN over p_partkey on the already-joined rows: the join
    output contains exactly the subquery's input (same region filter,
    same supply relation), so the window sees the right set and costs
    one hash-exchange on the part key instead of a second scan +
    rejoin of the whole supply side. supplier/nation/region broadcast;
    the final order is total (acctbal, nation, supplier name, part
    key), so LIMIT 100 is deterministic.

    Reference: the classic Q2 plan; decorrelation-by-window is what
    Catalyst's RewriteCorrelatedScalarSubquery does for the SQL form.
    """
    cat = Catalog(spark, sf_dir)
    supply = (cat.lineitem
              .groupBy(F.col("l_partkey").alias("ps_partkey"),
                       F.col("l_suppkey").alias("ps_suppkey"))
              .agg(F.min(cents(F.col("l_extendedprice")))
                   .alias("cost_cents")))
    eur_supp = (cat.broadcast("supplier")
                .join(cat.broadcast("nation"),
                      F.col("s_nationkey") == F.col("n_nationkey"))
                .join(cat.broadcast("region"),
                      F.col("n_regionkey") == F.col("r_regionkey"))
                .filter(F.col("r_name") == "EUROPE")
                .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    parts = (cat.part
             .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
             .select("p_partkey", "p_brand"))
    joined = (supply
              .join(F.broadcast(eur_supp),
                    F.col("ps_suppkey") == F.col("s_suppkey"))
              .join(F.broadcast(parts),
                    F.col("ps_partkey") == F.col("p_partkey")))
    min_cost = F.min("cost_cents").over(W.partitionBy("p_partkey"))
    return (joined
            .withColumn("__min", min_cost)
            .filter(F.col("cost_cents") == F.col("__min"))
            .select("p_partkey", "p_brand", "s_name", "n_name", "s_acctbal",
                    (F.col("cost_cents").cast("double") / 100.0)
                    .alias("supply_cost"))
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey")
            .limit(100))


@query(
    "q11_important_stock",
    oracle="""
    WITH held AS (
        SELECT l_partkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS value_cents
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey,
           CAST(value_cents AS DOUBLE) / 100.0 AS part_value
    FROM held
    WHERE value_cents * 1000 > (SELECT CAST(SUM(value_cents) AS BIGINT)
                                FROM held)
    ORDER BY part_value DESC, p_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (parts that concentrate a nation's held value),
    adapted for the partsupp-less testdata: "held value" of a part is
    the exact-cents revenue NATION_7's suppliers shipped for it.

    The defining structure is the HAVING-over-a-global-scalar: keep
    groups whose value exceeds a fixed fraction (1/1000) of the sum
    over ALL groups. The global total is a 1-row aggregate OF the
    grouped result, broadcast-cross-joined back — the grouped relation
    is built once and feeds both sides (Spark reuses the exchange),
    and the threshold compare runs in pure integers
    (``value_cents * 1000 > total_cents``), so the fraction never
    touches a float. Output ordered by value then key: total order,
    deterministic.
    """
    cat = Catalog(spark, sf_dir)
    nation_supp = (cat.broadcast("supplier")
                   .join(cat.broadcast("nation"),
                         F.col("s_nationkey") == F.col("n_nationkey"))
                   .filter(F.col("n_name") == "NATION_7")
                   .select("s_suppkey"))
    held = (cat.lineitem
            .join(F.broadcast(nation_supp),
                  F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("l_partkey")
            .agg(F.sum(cents(F.col("l_extendedprice")))
                 .alias("value_cents")))
    total = held.agg(F.sum("value_cents").alias("total_cents"))
    return (held.crossJoin(F.broadcast(total))
            .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
            .select(F.col("l_partkey").alias("p_partkey"),
                    (F.col("value_cents").cast("double") / 100.0)
                    .alias("part_value"))
            .orderBy(F.col("part_value").desc(), "p_partkey"))


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can deliver each
    (brand, type, size) combination, excluding flagged suppliers —
    the NOT-IN-subquery + COUNT(DISTINCT) pattern. Adaptation for the
    testdata: the supply relation is the distinct (part, supplier)
    shipping pairs, and "flagged" (the spec's complaints LIKE) is a
    negative account balance.

    The NOT IN decorrelates into a left-anti join — exactly
    equivalent here because s_suppkey is a non-null key (NOT IN's
    three-valued NULL trap cannot fire; with a nullable probe side it
    would need the null-aware variant). The flagged-supplier side is
    tiny at any SF and broadcasts; part prunes on brand/size before
    its join. COUNT(DISTINCT) rides the groupBy shuffle on the three
    grouping columns.
    """
    cat = Catalog(spark, sf_dir)
    pairs = (cat.lineitem.select("l_partkey", "l_suppkey").distinct())
    flagged = (cat.broadcast("supplier")
               .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    parts = (cat.part
             .filter((F.col("p_brand") != "Brand#5")
                     & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
             .select("p_partkey", "p_brand", "p_type", "p_size"))
    return (pairs
            .join(F.broadcast(flagged),
                  F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
            .join(F.broadcast(parts),
                  F.col("l_partkey") == F.col("p_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                     "p_size"))


@query(
    "q20_concentrated_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'small%')
          GROUP BY l_partkey, l_suppkey
          HAVING 2 * CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                                    AND l_shipdate <  TIMESTAMP '1998-01-01'
                                   THEN CAST(l_quantity AS BIGINT)
                                   ELSE 0 END) AS BIGINT)
               > CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT))
    ORDER BY s_name
    """,
)
def q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with excess availability of
    selected parts), adapted for the partsupp-less testdata: a
    supplier qualifies if, for some 'small%'-named part, MORE than
    half of all quantity they ever shipped of it went out in 1997 —
    the same nested-IN-with-grouped-quantity-threshold structure
    (IN over a part-name IN-subquery, HAVING comparing a windowed
    quantity sum against a fraction of a correlated total).

    Decorrelation: the inner part-name IN becomes a broadcast
    left-semi join onto lineitem (pruning before the group-by), the
    HAVING is a plain post-aggregation filter in pure integers
    (quantities are integral in the testdata, so the BIGINT cast is
    exact in both engines and ``2 * q1997 > q_total`` never touches a
    float), and the outer IN becomes a left-semi join from the
    nation-filtered supplier dimension. Output columns are raw stored
    values — bit-identical by construction.
    """
    cat = Catalog(spark, sf_dir)
    small_parts = (cat.part.filter(F.col("p_name").like("small%"))
                   .select("p_partkey"))
    qty = F.col("l_quantity").cast("long")
    in_1997 = ((F.col("l_shipdate") >= _ts("1997-01-01"))
               & (F.col("l_shipdate") < _ts("1998-01-01")))
    concentrated = (cat.lineitem
                    .join(F.broadcast(small_parts),
                          F.col("l_partkey") == F.col("p_partkey"),
                          "left_semi")
                    .groupBy("l_partkey", "l_suppkey")
                    .agg(F.sum(F.when(in_1997, qty).otherwise(F.lit(0)))
                         .alias("q_1997"),
                         F.sum(qty).alias("q_total"))
                    .filter(2 * F.col("q_1997") > F.col("q_total"))
                    .select("l_suppkey"))
    return (cat.broadcast("supplier")
            .join(cat.broadcast("nation"),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .filter(F.col("n_name") == "NATION_3")
            .join(concentrated, F.col("s_suppkey") == F.col("l_suppkey"),
                  "left_semi")
            .select("s_name", "s_acctbal")
            .orderBy("s_name"))
