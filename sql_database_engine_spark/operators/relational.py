"""Core relational operators: scan, filter, project, join, aggregate.

Everything here is a declarative DataFrame plan — Catalyst applies
predicate pushdown, column pruning, join selection (broadcast vs
sort-merge), and partial/final aggregation. Scale notes per query in
the docstrings; the guiding rules at 100 TB:

- fact-fact joins (lineitem ⋈ orders) shuffle on the join key — that
  is unavoidable and correct; we never *force* a repartition Catalyst
  would not choose.
- bounded dimensions (region, nation, supplier) are broadcast
  explicitly: at any scale factor they stay tiny, so the hint is safe
  and removes a shuffle of the big side.
- aggregates on double measures use the exact integer-cents path
  (``functions.exact``) — order-independent, hence both cluster-safe
  and oracle-reproducible.

Reference parity: the reference's only query is a full scan in
insertion order (`/root/reference/db.cpp:487-502`); ``full_scan``
covers it over the testdata, and the REPL layer (``repl.py``) keeps
the byte-exact version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import Catalog
from ..functions.exact import (money_sum, money_avg, MONEY_SUM_SQL,
                               MONEY_AVG_SQL, cents as cents_f)
from . import query

def REVENUE():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


REVENUE_SQL = "l_extendedprice * (1 - l_discount)"


def _with_phantom(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Union ONE all-NULL ``__ph = 1`` row onto ``df`` — the
    single-scan device that makes grouping-set aggregates total over
    the empty relation (ANSI: the ``()`` set is a global aggregate
    and yields a row even over zero input rows; Spark's
    Expand+HashAggregate yields nothing). Aggregates must be
    phantom-blind (``WHEN __ph = 0``) and phantom-only detail groups
    (``n = 0`` outside the all-grouped set) filtered — a real group
    always has ≥ 1 row, so the filter can never drop real output."""
    phantom = spark.range(1).select(
        *[F.lit(None).cast(f.dataType).alias(f.name)
          for f in df.schema.fields],
        F.lit(1).alias("__ph"))
    return df.withColumn("__ph", F.lit(0)).unionByName(phantom)


# ---------------------------------------------------------------------------
# scan / filter / project
# ---------------------------------------------------------------------------

@query(
    "full_scan",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference parity: return every row of a table (db.cpp:487-502).

    At scale this is a pure parquet scan — no shuffle, no exchange.
    """
    return Catalog(spark, sf_dir).region.select("r_regionkey", "r_name")


@query(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(ROUND(({rev}) * 100) AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_discount > 0.05
    """.format(rev=REVENUE_SQL),
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection, both pushed to the parquet scan.

    `.explain` shows PushedFilters on l_shipdate/l_discount and a
    4-column ReadSchema — at 100 TB this reads a fraction of the
    table's bytes and zero irrelevant columns.
    """
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.filter((F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
                  & (F.col("l_discount") > 0.05))
        .select(
            "l_orderkey", "l_linenumber", "l_quantity",
            F.round(REVENUE() * 100).cast("long").alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------

@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {MONEY_SUM_SQL('l_quantity')} AS sum_qty,
           {MONEY_SUM_SQL('l_extendedprice')} AS sum_base_price,
           {MONEY_SUM_SQL(REVENUE_SQL)} AS sum_disc_price,
           {MONEY_SUM_SQL(REVENUE_SQL + ' * (1 + l_tax)')} AS sum_charge,
           {MONEY_AVG_SQL('l_quantity')} AS avg_qty,
           {MONEY_AVG_SQL('l_extendedprice')} AS avg_price,
           {MONEY_AVG_SQL('l_discount')} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (8 aggregates over 2 keys).

    Catalyst runs this as partial hash-agg per scan partition →
    exchange on (returnflag, linestatus) [4 groups] → final agg; the
    shuffle moves only 4 rows × partials per task regardless of SF.
    """
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(F.col("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(REVENUE()).alias("sum_disc_price"),
            money_sum(REVENUE() * (1 + F.col("l_tax"))).alias("sum_charge"),
            money_avg(F.col("l_quantity")).alias("avg_qty"),
            money_avg(F.col("l_extendedprice")).alias("avg_price"),
            money_avg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "revenue_forecast",
    oracle=f"""
    SELECT {MONEY_SUM_SQL('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, no join, no group.

    The ideal 100 TB plan: pushed filters prune row groups via parquet
    min/max stats; a single global aggregate reduces map-side first.
    """
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column exact distinct aggregation.

    Catalyst rewrites multiple COUNT(DISTINCT) into an expand +
    two-phase aggregate; at scale prefer approx_count_distinct (see
    ``agg_approx_distinct``) when 2% error is acceptable.
    """
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(1 AS BIGINT) AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB-scale answer to
    COUNT(DISTINCT): one pass, fixed memory, no expand.

    The raw estimate is sketch-implementation-defined (DuckDB's
    approx_count_distinct is a different HLL), so the *contract* is
    what gets oracle-checked: the exact count plus a flag asserting
    the HLL estimate landed within 5% of it (rsd=0.01 gives ~1%
    standard error, so 5% is a deterministic-in-practice bound). The
    oracle computes the exact count and expects the flag to be 1 —
    a hash mismatch means the sketch drifted out of tolerance.
    """
    li = Catalog(spark, sf_dir).lineitem
    est = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    err = F.abs(F.col("approx_parts") - F.col("exact_parts")) \
        / F.col("exact_parts").cast("double")
    return est.select(
        "l_returnflag",
        "exact_parts",
        (err <= 0.05).cast("long").alias("within_5pct"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           (GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           {MONEY_SUM_SQL(REVENUE_SQL)} AS revenue
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping id (disambiguates subtotal rows from NULL
    group keys). Catalyst expands grouping sets map-side; the shuffle
    carries one partial per (set, keys) — still tiny at any SF.

    Empty-input semantics (the empty_sweep class): ANSI says the
    ``()`` grouping set is a GLOBAL aggregate and yields one row
    (COUNT=0, SUM NULL) even over the empty relation — DuckDB and
    Postgres do; Spark's Expand+HashAggregate emits nothing. Fixed
    single-scan with a phantom row: one all-NULL ``__ph=1`` row
    unions into the input so every grouping set materializes, every
    aggregate is phantom-blind (``WHEN __ph = 0``), and phantom-only
    DETAIL groups (n=0, gid<3 — impossible for real data, every real
    group has ≥1 row) are filtered. No second scan, no extra
    exchange; the () row's values are exact."""
    li = Catalog(spark, sf_dir).lineitem
    src = _with_phantom(
        spark,
        li.select("l_returnflag", "l_linestatus",
                  cents_f(REVENUE()).alias("__cents")))
    return (
        src.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast("int").alias("gid"),
            F.sum(1 - F.col("__ph")).alias("n"),
            (F.sum(F.when(F.col("__ph") == 0, F.col("__cents")))
             .cast("double") / 100.0).alias("revenue"),
        )
        .filter(~((F.col("gid") < 3) & (F.col("n") == 0)))
        .select("l_returnflag", "l_linestatus", "gid", "n", "revenue")
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           (GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           {MONEY_SUM_SQL('o_totalprice')} AS total
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dimensions. Same phantom-row
    empty-input fix as :func:`agg_rollup` — the ``()`` set must
    yield its global-aggregate row even over an empty relation."""
    o = Catalog(spark, sf_dir).orders
    src = _with_phantom(
        spark,
        o.select("o_orderstatus", "o_orderpriority",
                 cents_f(F.col("o_totalprice")).alias("__cents")))
    return (
        src.cube("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).cast("int").alias("gid"),
            F.sum(1 - F.col("__ph")).alias("n"),
            (F.sum(F.when(F.col("__ph") == 0, F.col("__cents")))
             .cast("double") / 100.0).alias("total"),
        )
        .filter(~((F.col("gid") < 3) & (F.col("n") == 0)))
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
    )


@query(
    "agg_having",
    oracle=f"""
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           {MONEY_SUM_SQL('o_totalprice')} AS spend
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             money_sum(F.col("o_totalprice")).alias("spend"))
        .filter(F.col("n_orders") >= 12)
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

@query(
    "flagship_revenue_by_region",
    oracle=f"""
    SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_items,
           {MONEY_SUM_SQL(REVENUE_SQL)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def flagship_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: revenue per region — 5-way join + aggregate.

    Plan at scale: lineitem ⋈ orders shuffles both on orderkey (the
    one unavoidable big shuffle), orders ⋈ customer shuffles on
    custkey; nation and region are broadcast (bounded size at every
    SF), so the two dimension joins add no exchange. The final
    group-by has 5 groups — the agg shuffle is negligible. AQE
    coalesces the post-join partitions at small SF.
    """
    cat = Catalog(spark, sf_dir)
    joined = (
        cat.lineitem
        .join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(cat.broadcast("nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(cat.broadcast("region"), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        money_sum(REVENUE()).alias("revenue"),
    )


@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_orderstatus, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 400000
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level inner equi-join (fact ⋈ dimension-that-scales).

    customer grows with SF, so no broadcast hint: Catalyst picks
    sort-merge/shuffled-hash at scale and AQE may downgrade to
    broadcast when the filtered side turns out small at runtime.
    """
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.filter(F.col("o_totalprice") > 400000)
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderstatus", "c_name", "c_mktsegment")
    )


@query(
    "join_left_nulls",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders
    (COUNT(col) skips the all-NULL right side → 0)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer
        .join(cat.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT n_name, s_suppkey, s_name
    FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — nations with no suppliers surface with NULL
    supplier columns. (Outer joins suppress broadcast of the
    preserved side; both inputs here are bounded dims anyway.)"""
    cat = Catalog(spark, sf_dir)
    return (
        cat.nation
        .join(cat.supplier, F.col("n_nationkey") == F.col("s_nationkey"), "full_outer")
        .select("n_name", "s_suppkey", "s_name")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having a finished order.
    Semi joins shuffle only the distinct keys of the right side."""
    cat = Catalog(spark, sf_dir)
    finished = cat.orders.filter(F.col("o_orderstatus") == "F")
    return (
        cat.customer
        .join(finished, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no order above
    400,000.

    Originally "customers with no orders at all" — which is EMPTY at
    sf0.001/sf0.01 and 1 row at sf0.1 (TPC-H custkeys are nearly all
    referenced), so its driver-green r1 row was a 0-vs-0 hash match
    that could never catch the anti join dropping rows (the r5
    vacuity audit, `tools/vacuity_audit.py`, flagged it — the
    vacuous-CDC lesson applied to result cardinality). The price
    threshold makes both directions load-bearing at every test SF
    (sf0.001/0.01/0.1 → 20/202/1997 of 150/1500/15000 customers):
    most customers have a qualifying order (exclusion exercised) and
    a real minority do not (retention exercised). Same plan shape —
    the filter pushes below the anti join's build side."""
    cat = Catalog(spark, sf_dir)
    big = cat.orders.filter(F.col("o_totalprice") > 400000)
    return (
        cat.customer
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join — only ever used between bounded dims (here 5 × 25);
    a cross join with a fact table would be a plan bug at any scale."""
    cat = Catalog(spark, sf_dir)
    return cat.region.crossJoin(cat.nation).select("r_name", "n_name")


@query(
    "join_range_theta",
    oracle="""
    SELECT p_partkey, p_retailprice, s_suppkey
    FROM part JOIN supplier
      ON p_size = CAST(s_suppkey AS INT) AND p_retailprice > s_acctbal / 2
    """,
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi-condition + range residual. Catalyst keys the
    hash join on the equi part and evaluates the inequality as a
    post-join residual filter — the scalable shape for theta joins
    (pure-inequality joins degrade to nested loop; always give the
    planner an equi component)."""
    cat = Catalog(spark, sf_dir)
    p, s = cat.part, cat.supplier
    return (
        p.join(s, (p.p_size == s.s_suppkey.cast("int"))
               & (p.p_retailprice > s.s_acctbal / 2))
        .select("p_partkey", "p_retailprice", "s_suppkey")
    )


@query(
    "subquery_scalar_filter",
    oracle=f"""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_acctbal > (
        SELECT {MONEY_SUM_SQL('c_acctbal')} / COUNT(*) FROM customer)
    """,
)
def subquery_scalar_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery predicate: customers above the mean balance.

    The mean is computed with the exact integer path so the predicate
    threshold is bit-identical to the oracle's (a float-averaged
    threshold could flip rows at the boundary). The single-row
    aggregate is cross-joined — Catalyst broadcasts it."""
    c = Catalog(spark, sf_dir).customer
    mean = c.agg(money_avg(F.col("c_acctbal")).alias("__mean"))
    return (
        c.crossJoin(F.broadcast(mean))
        .filter(F.col("c_acctbal") > F.col("__mean"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "top_spenders_per_nation",
    oracle=f"""
    WITH spend AS (
        SELECT c_custkey, c_name, c_nationkey,
               {MONEY_SUM_SQL('o_totalprice')} AS total_spend
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name, c_nationkey
    )
    SELECT n_name, c_custkey, c_name, total_spend
    FROM (
        SELECT s.*, n_name,
               ROW_NUMBER() OVER (
                   PARTITION BY n_name
                   ORDER BY total_spend DESC, c_custkey) AS rn
        FROM spend s JOIN nation ON c_nationkey = n_nationkey
    ) WHERE rn <= 3
    """,
)
def top_spenders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate + top-k per group: the canonical composed
    pipeline. Ties broken by c_custkey so the top-3 set is total-order
    deterministic on any cluster."""
    from pyspark.sql import Window as W
    cat = Catalog(spark, sf_dir)
    spend = (
        cat.customer
        .join(cat.orders, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(money_sum(F.col("o_totalprice")).alias("total_spend"))
        .join(cat.broadcast("nation"), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = W.partitionBy("n_name").orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
    return (
        spend.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("n_name", "c_custkey", "c_name", "total_spend")
    )


@query(
    "join_right_nulls",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    """,
)
def join_right_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join — every nation kept, suppliers NULL where a
    nation has none (mirror of join_left_nulls for the right-outer
    plan shape)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.supplier
        .join(cat.nation, F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "join_bucketed_colocated",
    oracle=f"""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
           {MONEY_SUM_SQL(REVENUE_SQL)} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recurring fact-fact join read from bucketed tables: both
    sides bucketed (and sorted) on orderkey, so the sort-merge join
    needs no Exchange and no Sort — the write-time layout is the
    shuffle, paid once (``sources/bucketed.py``). ``bench.py`` stages
    the layout untimed and times this query; at 100 TB this is the
    difference between re-shuffling two fact tables per query and
    never shuffling them."""
    from ..sources.bucketed import ensure_bucketed_facts
    names = ensure_bucketed_facts(spark, sf_dir)
    li, o = spark.table(names["lineitem"]), spark.table(names["orders"])
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"),
             money_sum(REVENUE()).alias("revenue"))
        .orderBy("o_orderpriority")
    )


@query(
    "clustered_range_scan",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           {MONEY_SUM_SQL(REVENUE_SQL)} AS revenue
    FROM lineitem
    WHERE l_orderkey < 10000
      AND l_extendedprice >= 20000.0 AND l_extendedprice <= 30000.0
    """,
)
def clustered_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-column range scan over the Hilbert-clustered lineitem copy
    (``sources/clustering.py``): every file has a tight min/max
    envelope on BOTH l_orderkey and l_extendedprice, so the parquet
    reader prunes most files from footer stats alone — the layout is
    the index. ``bench.py`` stages the clustered write untimed (the
    once-paid pass) and times this scan; the oracle runs the same
    predicate over the unclustered table, proving layout changes
    results not at all and cost a lot."""
    from ..sources.clustering import ensure_clustered_lineitem, read_clustered
    path = ensure_clustered_lineitem(spark, sf_dir)
    # Sidecar-schema read: total over an empty clustered copy (zero
    # data files -> inference would throw UNABLE_TO_INFER_SCHEMA),
    # and no per-query source-footer re-read.
    li = read_clustered(spark, path)
    return (
        li.filter((F.col("l_orderkey") < 10000)
                  & (F.col("l_extendedprice") >= 20000.0)
                  & (F.col("l_extendedprice") <= 30000.0))
        .agg(F.count(F.lit(1)).alias("n_lines"),
             money_sum(REVENUE()).alias("revenue"))
    )


@query(
    "join_skew_salted",
    oracle=f"""
    SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
           {MONEY_SUM_SQL(REVENUE_SQL)} AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit skew salting (``functions/skew.py``): the big side
    scatters each row across 8 salt buckets by a row hash, the small
    side replicates x8, and the join key becomes (key, salt) — a hot
    supplier's rows spread over 8 tasks instead of one. Semantics are
    identical to the plain join (each big row matches exactly its own
    salt replica), which is what the oracle checks. AQE's skew split
    handles most real skew at runtime; explicit salting is the lever
    when one power-law key overwhelms even a split partition."""
    from ..functions.skew import salted_join
    cat = Catalog(spark, sf_dir)
    big = cat.lineitem.withColumnRenamed("l_suppkey", "s_suppkey")
    small = cat.supplier.select("s_suppkey", "s_nationkey")
    return (
        salted_join(big, small, "s_suppkey")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_lines"),
             money_sum(REVENUE()).alias("revenue"))
    )


@query(
    "key_skew_profile",
    oracle="""
    WITH counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events GROUP BY user_id
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(n_rows) AS BIGINT) AS total_rows
        FROM counts
    ), top AS (
        SELECT user_id, n_rows,
               ROW_NUMBER() OVER (ORDER BY n_rows DESC, user_id) AS rnk
        FROM counts
    )
    SELECT t.rnk AS rnk, t.user_id, t.n_rows, s.n_keys, s.total_rows,
           CAST(s.total_rows AS DOUBLE) / s.n_keys AS mean_rows_per_key,
           CAST(t.n_rows * s.n_keys AS DOUBLE) / s.total_rows
               AS skew_vs_mean
    FROM top t, stats s
    WHERE t.rnk <= 5
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the query you run BEFORE picking a
    join strategy at scale: the 5 hottest keys with their share
    versus the mean rows-per-key, plus corpus totals. A skew_vs_mean
    in the hundreds says salt this key or rely on AQE skew-join
    splitting; ~1 says a plain shuffle join is safe.

    Scale shape: per-key counts are one partial-aggregated exchange;
    the hottest keys come from TakeOrderedAndProject over the counts
    (never a global sort — the same top-k discipline as
    sort_limit_topk, asserted in the plan suite); the 1-row stats
    side broadcasts back over the top-k. No global window, no
    all-keys sort — at 10^9 distinct keys the only full pass is the
    count itself. Ratios divide exact integers — deterministic.
    """
    from pyspark.sql import Window as W
    ev = Catalog(spark, sf_dir).events
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_rows"))
    stats = counts.agg(F.count(F.lit(1)).alias("n_keys"),
                       F.sum("n_rows").alias("total_rows"))
    top = (counts.orderBy(F.desc("n_rows"), "user_id").limit(5)
           .withColumn("rnk", F.row_number().over(
               W.orderBy(F.desc("n_rows"), "user_id"))))
    return (top.crossJoin(F.broadcast(stats))
            .select("rnk", "user_id", "n_rows", "n_keys", "total_rows",
                    (F.col("total_rows").cast("double") / F.col("n_keys"))
                    .alias("mean_rows_per_key"),
                    ((F.col("n_rows") * F.col("n_keys")).cast("double")
                     / F.col("total_rows")).alias("skew_vs_mean")))


@query(
    "join_cardinality_estimate",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS c,
               CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS p
        FROM events GROUP BY user_id
    ), est AS (
        SELECT CAST(SUM(c * p) AS BIGINT) AS est_pairs FROM per_user
    ), act AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS actual_pairs
        FROM events c JOIN events p
          ON c.user_id = p.user_id
         AND c.event_type = 'click' AND p.event_type = 'purchase'
         AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
         AND CAST(p.ts AS TIMESTAMP)
             <= CAST(c.ts AS TIMESTAMP) + INTERVAL 1 HOUR
    )
    SELECT est_pairs, actual_pairs,
           CAST(actual_pairs AS DOUBLE) / est_pairs AS range_selectivity
    FROM est, act
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from per-key statistics — what a
    cost-based optimizer computes before picking a join strategy:
    the click-purchase equi-join's exact output cardinality is
    SUM(clicks_u * purchases_u) over per-user counts (one aggregate,
    no join executed), and the ±1h range predicate's selectivity is
    measured against it by running the real range join. The per-key
    histogram pass costs one shuffle of counts; the estimate prices a
    join the optimizer may then refuse to run — exactly the stats
    that justify the binned interval join over the raw theta join at
    100 TB.
    """
    ev = Catalog(spark, sf_dir).events
    per_user = (ev.groupBy("user_id")
                .agg(F.sum((F.col("event_type") == "click").cast("long"))
                     .alias("c"),
                     F.sum((F.col("event_type") == "purchase").cast("long"))
                     .alias("p")))
    est = per_user.agg(F.sum(F.col("c") * F.col("p")).alias("est_pairs"))
    c = (ev.filter(F.col("event_type") == "click")
         .select("user_id", F.col("ts").alias("c_ts")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")))
    act = (c.join(p, (F.col("user_id") == F.col("p_user"))
                  & (F.col("p_ts") >= F.col("c_ts"))
                  & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")))
           .agg(F.count(F.lit(1)).alias("actual_pairs")))
    # try_divide: an estimate of 0 pairs (no user has both event
    # types) makes selectivity undefined — NULL like DuckDB's x/0,
    # not an ANSI throw (empty_sweep singleton tier).
    return (est.crossJoin(act)
            .select("est_pairs", "actual_pairs",
                    F.try_divide(F.col("actual_pairs").cast("double"),
                                 F.col("est_pairs"))
                    .alias("range_selectivity")))


@query(
    "csv_roundtrip_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 100.0 AS total_price,
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink -> source round-trip, driver-verified: a lineitem
    projection is exported to CSV (header, default quoting) in a
    version-keyed staging dir, read back through the TEXT parser with
    an explicit schema, and aggregated — the oracle computes the same
    aggregate from the original parquet, so any value lost in
    serialization (Java's Double.toString is shortest-round-trip, the
    reader must recover the identical bits), a quoting slip, or a
    header/schema misalignment hash-fails. This promotes the CSV path
    from pytest-only (tests/test_sources.py) to the driver's hard
    signal; schema inference stays deliberately OFF — at 100 TB an
    inference pass is a full extra scan and a type-drift hazard, so
    production CSV ingest declares its schema.

    Staging is the fixture, not the operator (binaryfile/bucketed
    precedent): written once per (sf_dir), skipped when _SUCCESS
    exists; the measured plan is the CSV scan + one hash aggregate.
    """
    import os

    from ..functions.exact import cents

    li = Catalog(spark, sf_dir).lineitem.select(
        "l_returnflag", "l_quantity", "l_extendedprice")
    from ..scratch import scratch_dir, source_fingerprint
    stage = scratch_dir(
        "csv", sf_dir,
        version="v1|" + source_fingerprint(sf_dir, "lineitem.parquet"))
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        li.write.mode("overwrite").option("header", True).csv(stage)
    back = (spark.read
            .schema("l_returnflag string, l_quantity double, "
                    "l_extendedprice double")
            .option("header", True).csv(stage))
    return (back.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 (F.sum(cents(F.col("l_extendedprice"))).cast("double")
                  / 100.0).alias("total_price"),
                 F.sum(F.floor("l_quantity").cast("long"))
                 .alias("total_qty")))


@query(
    "jsonl_roundtrip_docs",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT sha256(text)) AS BIGINT) AS n_distinct_texts
    FROM documents GROUP BY source
    """,
)
def jsonl_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink -> source round-trip over the DOCUMENT corpus —
    JSON Lines is the lingua franca of LLM training data, and the
    property that matters is CONTENT FIDELITY through JSON string
    escaping (quotes, backslashes, non-ASCII) plus schema-declared
    readback. The documents table is exported to JSONL in a
    version-keyed staging dir, read back with an explicit schema, and
    aggregated per source INCLUDING a distinct count over sha256 of
    the round-tripped text: one corrupted character in one document
    changes a digest and hash-fails against the oracle computed from
    the original parquet.

    Same fixture/operator split as ``csv_roundtrip_agg``; the
    measured plan is the JSONL scan plus one aggregate. Schema
    inference off, as always — JSONL at 100 TB is read with a
    declared schema or not at all.
    """
    import os

    d = Catalog(spark, sf_dir).documents
    from ..scratch import scratch_dir, source_fingerprint
    stage = scratch_dir(
        "jsonl", sf_dir,
        version="v1|" + source_fingerprint(sf_dir, "documents.parquet"))
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        d.write.mode("overwrite").json(stage)
    back = (spark.read
            .schema("doc_id bigint, text string, lang string, "
                    "source string, n_chars bigint")
            .json(stage))
    return (back.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.countDistinct(F.sha2(F.col("text"), 256))
                 .alias("n_distinct_texts")))


@query(
    "fixed_width_ingest",
    oracle="""
    SELECT n_regionkey,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           MIN(n_name) AS first_name,
           MAX(n_name) AS last_name,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def fixed_width_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (COBOL/mainframe layout) text ingest — the legacy
    interchange format ETL teams still receive nightly: records are
    positional, no delimiters, schema = (offset, width) pairs. The
    fixture exports nation as 33-char records (key 4, name
    right-padded 25, regionkey 4), the operator reads them back
    through ``spark.read.text`` and parses with pure substring/trim
    expressions — scan-level, codegen'd, no UDF — then aggregates.
    The oracle computes from the original table, so a one-column
    offset error, a padding character surviving the trim, or an
    integer parse slip hash-fails.

    Layout declaration is explicit (as CSV schema inference is off,
    so is any "guess the columns" pass); at 100 TB fixed-width is
    actually the CHEAPEST text format to split — every record is the
    same byte length, so readers can seek to exact offsets without
    scanning for newlines.
    """
    import os

    from ..scratch import scratch_dir, source_fingerprint

    cat = Catalog(spark, sf_dir)
    stage = scratch_dir(
        "fixedwidth", sf_dir,
        version="v1|" + source_fingerprint(sf_dir, "nation.parquet"))
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        (cat.nation.select(
            F.concat(
                F.lpad(F.col("n_nationkey").cast("string"), 4, "0"),
                F.rpad(F.col("n_name"), 25, " "),
                F.lpad(F.col("n_regionkey").cast("string"), 4, "0"))
            .alias("value"))
         .write.mode("overwrite").text(stage))
    raw = spark.read.text(stage)
    parsed = raw.select(
        F.substring("value", 1, 4).cast("long").alias("n_nationkey"),
        F.rtrim(F.substring("value", 5, 25)).alias("n_name"),
        F.substring("value", 30, 4).cast("long").alias("n_regionkey"))
    return (parsed.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n_nations"),
                 F.min("n_name").alias("first_name"),
                 F.max("n_name").alias("last_name"),
                 F.sum("n_nationkey").alias("key_sum"))
            .orderBy("n_regionkey"))


@query(
    "grid_proximity_join",
    oracle="""
    WITH pts AS (
        SELECT c_custkey AS id,
               ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 6))
                   ::BIGINT % 1000 AS x,
               ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 7, 6))
                   ::BIGINT % 1000 AS y
        FROM customer
    ), cells AS (
        SELECT id, x, y, x // 8 AS cx, y // 8 AS cy FROM pts
    ), offs AS (
        SELECT dx.d AS dx, dy.d AS dy
        FROM (SELECT unnest([-1, 0, 1]) AS d) dx,
             (SELECT unnest([-1, 0, 1]) AS d) dy
    ), pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
               GREATEST(ABS(a.x - b.x), ABS(a.y - b.y)) AS cheb
        FROM cells a
        CROSS JOIN offs o
        JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
        WHERE a.id < b.id
          AND ABS(a.x - b.x) <= 8 AND ABS(a.y - b.y) <= 8
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT_IF(cheb <= 2) AS BIGINT) AS n_within_2,
           CAST(COUNT_IF(cheb BETWEEN 3 AND 5) AS BIGINT) AS n_3_to_5,
           CAST(COUNT_IF(cheb BETWEEN 6 AND 8) AS BIGINT) AS n_6_to_8,
           CAST(COUNT(DISTINCT id_a) AS BIGINT) AS n_left_points
    FROM pairs
    """,
)
def grid_proximity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL proximity join by grid binning — the scale pattern
    behind every geo/embedding-space neighbor query: bucket points
    into fixed cells sized to the search radius, probe only the 3×3
    neighbor cells, verify the exact distance on candidates. Never
    all-pairs: candidate count is density-bounded per cell, and the
    join is a pure EQUI-join on (cell_x + dx, cell_y + dy) — the
    9-offset explode turns the spatial predicate into hash-join keys
    (the same decomposition ``events_interval_join_binned`` uses for
    time). Each qualifying pair is found exactly once (the probed
    point's cell is unique), so no distinct is needed.

    Points are md5-derived synthetic coordinates on a 1000×1000 grid
    (engine-independent, SF-scaling density); distance is Chebyshev
    (exact integers — Euclidean would need no sqrt either, comparing
    squared sums, but the banded histogram here stays pure-integer).
    Output is the one-row pair census with distance bands.
    """
    c = Catalog(spark, sf_dir).customer
    hex6 = lambda s, p: F.conv(
        F.substring(F.md5(F.col("c_custkey").cast("string")), p, 6),
        16, 10).cast("long")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (hex6("c_custkey", 1) % 1000).alias("x"),
        (hex6("c_custkey", 7) % 1000).alias("y"))
    cells = (pts.withColumn("cx", F.expr("x div 8"))
             .withColumn("cy", F.expr("y div 8"))
             .localCheckpoint(eager=False))
    offs = (spark.range(0, 9)
            .select((F.col("id") % 3 - 1).alias("dx"),
                    (F.col("id") / 3).cast("long").alias("dy"))
            .select("dx", (F.col("dy") - 1).alias("dy")))
    a = cells.select(F.col("id").alias("id_a"), F.col("x").alias("xa"),
                     F.col("y").alias("ya"),
                     F.col("cx").alias("cxa"), F.col("cy").alias("cya"))
    b = cells.select(F.col("id").alias("id_b"), F.col("x").alias("xb"),
                     F.col("y").alias("yb"),
                     F.col("cx").alias("cxb"), F.col("cy").alias("cyb"))
    pairs = (a.crossJoin(F.broadcast(offs))
             .withColumn("cxb", F.col("cxa") + F.col("dx"))
             .withColumn("cyb", F.col("cya") + F.col("dy"))
             .join(b, ["cxb", "cyb"])
             .filter((F.col("id_a") < F.col("id_b"))
                     & (F.abs(F.col("xa") - F.col("xb")) <= 8)
                     & (F.abs(F.col("ya") - F.col("yb")) <= 8))
             .select("id_a",
                     F.greatest(F.abs(F.col("xa") - F.col("xb")),
                                F.abs(F.col("ya") - F.col("yb")))
                     .alias("cheb")))
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("cheb") <= 2).cast("long")).alias("n_within_2"),
        F.sum(F.col("cheb").between(3, 5).cast("long")).alias("n_3_to_5"),
        F.sum(F.col("cheb").between(6, 8).cast("long")).alias("n_6_to_8"),
        F.countDistinct("id_a").alias("n_left_points"))


@query(
    "python_datasource_ingest",
    oracle="""
    WITH rows_gen AS (
        SELECT i AS id, i % 10 AS bucket, (i * 37) % 10000 AS cents
        FROM generate_series(0, 1999) t(i)
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(cents) AS BIGINT) AS BIGINT) AS total_cents,
           CAST(MIN(id) AS BIGINT) AS min_id,
           CAST(MAX(id) AS BIGINT) AS max_id
    FROM rows_gen
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def python_datasource_ingest(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """CUSTOM Python DataSource ingest (Spark 4 DataSource API) — the
    connector escape hatch for systems with no built-in reader: a
    Python class declares schema + PARTITIONS + a per-partition
    generator, and Spark plans it like any parquet scan (8 input
    partitions = 8 parallel tasks here; a real connector derives
    partitions from the backing system's shards). The deterministic
    arithmetic generator makes the MECHANISM oracle-checkable: the
    DuckDB twin regenerates the same sequence, so a partition-range
    bug, a dropped partition, or a schema drift hash-fails.

    This is the engine's answer to the reference's "open any file"
    layer at the extensibility end: sources the built-ins can't read
    join the catalog as first-class, partition-parallel relations.
    """
    from ..sources.pydatasource import register

    register(spark)
    rows = spark.read.format("seqgen").load()
    return (rows.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("cents").alias("total_cents"),
                 F.min("id").alias("min_id"),
                 F.max("id").alias("max_id"))
            .orderBy("bucket"))


@query(
    "python_stream_datasource_drain",
    oracle="""
    WITH rows_gen AS (
        SELECT i AS id, i % 10 AS bucket, (i * 37) % 10000 AS cents
        FROM generate_series(0, 599) t(i)
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(cents) AS BIGINT) AS BIGINT) AS total_cents
    FROM rows_gen
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def python_stream_datasource_drain(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """CUSTOM STREAMING Python DataSource, drained through the real
    incremental engine — the Kafka-shaped mechanism (initialOffset /
    read-next-batch / replay-between-offsets) implemented in Python
    and driven by repeated availableNow runs over ONE checkpoint: 600
    rows arrive in 200-row micro-batches, each run resumes from the
    committed offset, and the appended parquet output is exactly-once
    (the oracle regenerates the full sequence, so a duplicated or
    dropped micro-batch hash-fails — the replay path included, since
    recovery calls readBetweenOffsets).

    Staging is version-keyed scratch; a fully drained checkpoint
    makes further runs no-ops, which is itself the exactly-once
    property under test. Aggregation then runs on the drained table
    like any batch relation.
    """
    import os

    from ..scratch import scratch_dir
    from ..sources.pydatasource import (N_STREAM_TOTAL, register_stream)

    register_stream(spark)
    stage = scratch_dir("seqstream", sf_dir, version="v1")
    ckpt = os.path.join(stage, "ckpt")
    out = os.path.join(stage, "out")
    for _ in range(5):
        q = (spark.readStream.format("seqstream").load()
             .writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        try:
            if spark.read.parquet(out).count() >= N_STREAM_TOTAL:
                break
        except Exception:
            continue
    drained = spark.read.parquet(out)
    return (drained.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("cents").alias("total_cents"))
            .orderBy("bucket"))


@query(
    "python_datasource_sink_roundtrip",
    oracle="""
    SELECT n_regionkey,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
           MIN(n_name) AS first_name
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def python_datasource_sink_roundtrip(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """CUSTOM Python SINK round-trip — the write side of the
    DataSource API: nation flows through a Python
    ``DataSourceWriter`` whose executors write temp-named
    per-partition line files and whose DRIVER renames winners at
    commit (two-phase commit — a failed or speculative task's output
    can never leak into the committed set, the property every real
    sink must carry). The committed files are read back through the
    text reader, parsed at scan level, and aggregated; the oracle
    computes from the original table, so a lost partition file, a
    double-committed task, or a serialization slip hash-fails.

    The staging dir is cleared per invocation (the sink demonstrates
    append-mode commit; idempotence here comes from the clean slate,
    where the streaming sibling gets it from offsets).
    """
    import os
    import shutil

    from ..scratch import scratch_dir
    from ..sources.pydatasource import register_sink

    register_sink(spark)
    stage = scratch_dir("lineswriter", sf_dir, version="v1")
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage, exist_ok=True)
    (Catalog(spark, sf_dir).nation
     .select("n_nationkey", "n_name", "n_regionkey")
     .write.format("lineswriter").option("path", stage)
     .mode("append").save())
    raw = spark.read.text(stage)
    parts = F.split(F.col("value"), "\\|")
    parsed = raw.select(
        parts.getItem(0).cast("long").alias("n_nationkey"),
        parts.getItem(1).alias("n_name"),
        parts.getItem(2).cast("long").alias("n_regionkey"))
    return (parsed.groupBy("n_regionkey")
            .agg(F.count(F.lit(1)).alias("n_nations"),
                 F.sum("n_nationkey").alias("key_sum"),
                 F.min("n_name").alias("first_name"))
            .orderBy("n_regionkey"))


@query(
    "catalog_table_census",
    oracle="""
    SELECT 'customer' AS table_name,
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS n_rows
    UNION ALL SELECT 'documents',
           CAST((SELECT COUNT(*) FROM documents) AS BIGINT)
    UNION ALL SELECT 'embeddings',
           CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT)
    UNION ALL SELECT 'events',
           CAST((SELECT COUNT(*) FROM events) AS BIGINT)
    UNION ALL SELECT 'lineitem',
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT)
    UNION ALL SELECT 'nation',
           CAST((SELECT COUNT(*) FROM nation) AS BIGINT)
    UNION ALL SELECT 'orders',
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    UNION ALL SELECT 'part',
           CAST((SELECT COUNT(*) FROM part) AS BIGINT)
    UNION ALL SELECT 'region',
           CAST((SELECT COUNT(*) FROM region) AS BIGINT)
    UNION ALL SELECT 'supplier',
           CAST((SELECT COUNT(*) FROM supplier) AS BIGINT)
    ORDER BY table_name
    """,
)
def catalog_table_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW TABLES + row statistics — the catalog introspection
    surface (the reference's `.btree`/`.constants` commands scaled
    up): one row per registered table with its exact row count, the
    numbers an optimizer's cost model and a freshness monitor both
    start from. Each count is a parquet metadata-level aggregate
    (COUNT(*) with no filter reads footer statistics, not data), so
    the census costs ~zero I/O at any scale; the union of ten 1-row
    aggregates composes into one lazy plan.
    """
    cat = Catalog(spark, sf_dir)
    parts = []
    for name in ["customer", "documents", "embeddings", "events",
                 "lineitem", "nation", "orders", "part", "region",
                 "supplier"]:
        df = getattr(cat, name)
        parts.append(df.agg(F.count(F.lit(1)).alias("n_rows"))
                     .select(F.lit(name).alias("table_name"), "n_rows"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")


@query(
    "sql_parameterized_front_door",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(CAST(ROUND(l_extendedprice
                                    * (1 - l_discount) * 100)
                              AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0
               AS revenue
    FROM lineitem
    WHERE l_quantity < 24 AND l_discount >= 0.03
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sql_parameterized_front_door(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL front door (Spark 4 named parameters) — the
    injection-safe API every SQL-facing service needs: the query text
    carries ``:max_qty`` / ``:min_disc`` placeholders and the values
    arrive as typed arguments, never string-concatenated; the table
    arrives as a registered temp view (the session-catalog surface).
    Same revenue arithmetic as the exact-cents policy; the oracle
    inlines the literals, so a parameter-binding bug (wrong order,
    wrong coercion) hash-fails.
    """
    cat = Catalog(spark, sf_dir)
    cat.lineitem.createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(ROUND(l_extendedprice
                                   * (1 - l_discount) * 100)
                             AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
        FROM lineitem_v
        WHERE l_quantity < :max_qty AND l_discount >= :min_disc
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
        args={"max_qty": 24, "min_disc": 0.03})


@query(
    "orc_roundtrip_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 100.0 AS total_price
    FROM orders GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → source round-trip — the third columnar format made
    driver-visible (CSV and JSONL round-trips are
    ``csv_roundtrip_agg`` / ``jsonl_roundtrip_docs``): an orders
    projection exports to ORC in a version-keyed staging dir, reads
    back with the declared schema, and aggregates; the oracle
    computes from the original parquet, so a type-mapping slip
    (ORC's timestamp/decimal encodings differ from parquet's) or a
    lost stripe hash-fails. Staging is the fixture (skip on
    _SUCCESS), the measured plan is the ORC scan + one aggregate.
    """
    import os

    from ..scratch import scratch_dir, source_fingerprint

    o = Catalog(spark, sf_dir).orders.select(
        "o_orderpriority", "o_totalprice")
    stage = scratch_dir(
        "orc", sf_dir,
        version="v1|" + source_fingerprint(sf_dir, "orders.parquet"))
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        o.write.mode("overwrite").orc(stage)
    back = (spark.read
            .schema("o_orderpriority string, o_totalprice double")
            .orc(stage))
    return (back.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 (F.sum(F.round(F.col("o_totalprice") * 100)
                        .cast("long")).cast("double") / 100.0)
                 .alias("total_price"))
            .orderBy("o_orderpriority"))


@query(
    "xml_roundtrip_agg",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT))
                AS BIGINT) AS total_bal_cents
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def xml_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink → source round-trip — the fourth text format made
    driver-visible (CSV/JSONL/fixed-width are already hash-checked;
    ORC covers columnar). Spark 4 ships the former spark-xml module
    natively: the supplier dimension exports as one <row> element per
    record under a declared rowTag, reads back with an explicit
    schema (never inference — XML's everything-is-a-string surface
    makes inferred numerics fragile), joins to nation, and
    aggregates. The oracle computes from the original parquet, so an
    escaping bug (XML entity encoding), a type-mapping slip, or a
    dropped element hash-fails. Staging is the fixture (skip on
    _SUCCESS); the measured plan is the XML scan + broadcast join +
    aggregate.

    XML is the legacy-interchange format of enterprise ingest (SOAP
    feeds, regulatory filings); at 100 TB you parse it once into
    parquet exactly like this, never query it in place.
    """
    import os

    from ..scratch import scratch_dir, source_fingerprint

    cat = Catalog(spark, sf_dir)
    s = cat.supplier.select("s_suppkey", "s_nationkey", "s_acctbal")
    stage = scratch_dir(
        "xml", sf_dir,
        version="v1|" + source_fingerprint(sf_dir, "supplier.parquet"))
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        (s.write.mode("overwrite")
         .option("rootTag", "suppliers").option("rowTag", "supplier")
         .format("xml").save(stage))
    back = (spark.read
            .schema("s_suppkey bigint, s_nationkey int, s_acctbal double")
            .option("rowTag", "supplier")
            .format("xml").load(stage))
    n = cat.nation.select("n_nationkey", "n_name")
    return (back.join(F.broadcast(n),
                      back.s_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_suppliers"),
                 F.sum(F.round(F.col("s_acctbal") * 100).cast("long"))
                 .alias("total_bal_cents"))
            .orderBy("n_name"))


@query(
    "partitioned_scan_pruned",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def partitioned_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partition pruning, driver-visible end to end: stage
    orders as a directory-partitioned table (one dir per
    o_orderpriority — the layout every warehouse lands fact tables
    in), then read it back with a partition-key predicate. Catalyst
    resolves the IN filter against DIRECTORY NAMES at planning time
    (PartitionFilters in the scan, pinned by test_plan_quality), so
    3 of 5 partition directories are never opened — the I/O lever
    that makes a date-partitioned 100 TB table queryable. The oracle
    aggregates the original parquet under the same predicate; a
    pruning bug that drops or double-reads a directory hash-fails.
    Staging is the fixture (skip on _SUCCESS); the measured plan is
    the pruned scan + aggregate.
    """
    import os

    from ..scratch import scratch_dir, source_fingerprint

    o = Catalog(spark, sf_dir).orders.select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    stage = scratch_dir(
        "hivepart", sf_dir,
        version="v1|" + source_fingerprint(sf_dir, "orders.parquet"))
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        (o.write.mode("overwrite").partitionBy("o_orderpriority")
         .parquet(stage))
    back = (spark.read
            .schema("o_orderkey bigint, o_totalprice double, "
                    "o_orderpriority string")
            .parquet(stage))
    return (back.filter(F.col("o_orderpriority")
                        .isin("1-URGENT", "2-HIGH"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                 .alias("total_cents"))
            .orderBy("o_orderpriority"))


@query(
    "late_dimension_fallback",
    oracle="""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey % 20 <> 0
    )
    SELECT COALESCE(d.c_mktsegment, 'UNKNOWN') AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(COUNT(*) FILTER (WHERE d.c_custkey IS NULL)
                AS BIGINT) AS n_pending_reprocess
    FROM orders o LEFT JOIN dim d ON o.o_custkey = d.c_custkey
    GROUP BY COALESCE(d.c_mktsegment, 'UNKNOWN')
    ORDER BY segment
    """,
)
def late_dimension_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Early-arriving facts / late-arriving dimension handling — the
    ingestion reality every warehouse join must survive: facts whose
    dimension row hasn't landed yet (simulated deterministically:
    every 20th customer is 'late') must not drop (inner join) or
    poison aggregates with NULL groups; they route to an explicit
    UNKNOWN bucket, and the per-bucket ``n_pending_reprocess`` count
    is the reprocessing-queue metric the backfill job watches. One
    broadcast LEFT join + one aggregate; when the dimension lands,
    re-running shrinks UNKNOWN to zero and the same query is the
    backfill's verification.
    """
    cat = Catalog(spark, sf_dir)
    dim = (cat.customer.filter(F.col("c_custkey") % 20 != 0)
           .select("c_custkey", "c_mktsegment"))
    o = cat.orders
    seg = F.coalesce(F.col("c_mktsegment"), F.lit("UNKNOWN"))
    return (o.join(F.broadcast(dim), o.o_custkey == dim.c_custkey, "left")
            .groupBy(seg.alias("segment"))
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                 .alias("total_cents"),
                 F.sum(F.when(F.col("c_custkey").isNull(), 1).otherwise(0))
                 .cast("long").alias("n_pending_reprocess"))
            .orderBy("segment"))


@query(
    "lateral_top2_per_nation",
    oracle="""
    SELECT n.n_name, t.c_custkey, t.bal_cents
    FROM nation n,
         LATERAL (SELECT c_custkey,
                         CAST(ROUND(c_acctbal * 100) AS BIGINT)
                             AS bal_cents
                  FROM customer
                  WHERE c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey
                  LIMIT 2) t
    ORDER BY n_name, bal_cents DESC, c_custkey
    """,
)
def lateral_top2_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LATERAL correlated subquery — the 2023-standard spelling of
    per-row dependent subqueries (top-N per key, nearest match per
    row), supported natively in Spark 4 SQL: for each nation, the
    LATERAL body re-executes logically with that nation's key bound,
    returning its two richest customers. Catalyst DE-CORRELATES the
    lateral into a join + per-key limit — the same physical shape as
    the window-function top-k — so the surface is per-row but the
    execution is set-oriented; the plan must show no per-row loop.
    (The DataFrame ``lateralJoin``/``outer()`` API exists in 4.x but
    silently mis-resolves correlated references when inner and outer
    share column names — the SQL form is the reliable front door, so
    that is the registered surface.) Same exact-cents policy; ties
    break on custkey in both engines.
    """
    cat = Catalog(spark, sf_dir)
    cat.nation.createOrReplaceTempView("nation_lv")
    cat.customer.createOrReplaceTempView("customer_lv")
    return spark.sql("""
        SELECT n.n_name, t.c_custkey, t.bal_cents
        FROM nation_lv n,
             LATERAL (SELECT c_custkey,
                             CAST(ROUND(c_acctbal * 100) AS BIGINT)
                                 AS bal_cents
                      FROM customer_lv
                      WHERE c_nationkey = n.n_nationkey
                      ORDER BY c_acctbal DESC, c_custkey
                      LIMIT 2) t
        ORDER BY n_name, bal_cents DESC, c_custkey
    """)


@query(
    "agg_bucketed_no_shuffle",
    oracle="""
    SELECT l_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
               AS total_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def agg_bucketed_no_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-FREE aggregation off the bucketed layout — the second
    payoff of write-time bucketing after the co-located join: a
    groupBy on the bucket key needs no Exchange at all, because the
    bucketed scan already guarantees each key lives in exactly one
    task (plan-pinned: zero exchanges below the aggregate). At 100 TB
    this turns every recurring per-order rollup from a full fact
    shuffle into a map-side pass — the single biggest win available
    to a workload that aggregates the same key daily. Same
    ``ensure_bucketed_facts`` staging the join rides (paid once,
    outside the measured plan).
    """
    from ..sources.bucketed import ensure_bucketed_facts
    names = ensure_bucketed_facts(spark, sf_dir)
    li = spark.table(names["lineitem"])
    return (li.groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum(F.round(F.col("l_quantity")).cast("long"))
                 .alias("total_qty"),
                 F.sum(F.round(F.col("l_extendedprice") * 100)
                       .cast("long")).alias("total_cents")))


#: ONE SQL text for both engines (the _RECURSIVE_BFS_SQL precedent):
#: Spark 4 and DuckDB both implement the 2023-vintage GROUP BY ALL /
#: ORDER BY ALL sugar, so the front door and its oracle are literally
#: the same string.
_GROUP_BY_ALL_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
               AS total_qty
    FROM {table}
    GROUP BY ALL
    ORDER BY ALL
"""


@query("group_by_all_sugar",
       oracle=_GROUP_BY_ALL_SQL.format(table="lineitem"))
def group_by_all_sugar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL — the analyst-ergonomics sugar
    both engines adopted (every non-aggregate select item groups;
    every output column orders): the registered query and its oracle
    share one SQL template (only the relation name binds differently
    — temp view vs DuckDB view), the strongest possible parity statement
    for the SQL surface (the WITH RECURSIVE front door set the
    precedent). Nothing changes physically — Catalyst expands the
    sugar to the explicit grouping before optimization.
    """
    Catalog(spark, sf_dir).lineitem.createOrReplaceTempView(
        "lineitem_gba")
    return spark.sql(_GROUP_BY_ALL_SQL.format(table="lineitem_gba"))
