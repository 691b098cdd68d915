"""Window-function operators.

Windows shuffle once on their partition key, then sort within
partitions; every window here partitions on a real entity key
(customer, supplier, brand) so state per partition stays bounded at
100 TB. All ORDER BYs include a unique tiebreaker column — without a
total order, distributed window results are nondeterministic.

Null ordering is EXPLICIT on every nullable ordering column, on both
the Spark side and the DuckDB oracle: Spark's ASC default is NULLS
FIRST while DuckDB/Postgres default to NULLS LAST, so any window
ordered by a nullable column silently diverges between engines the
moment real data (which has nulls) arrives — the null_sweep audit
found exactly this on the shipped null-free fixtures' null-injected
replica. Policy: missing values sort AFTER present ones regardless
of direction (``asc_nulls_last`` / ``desc_nulls_last`` / SQL
``NULLS LAST``).

Running sums over double measures use integer-cents accumulation
(exact, order-independent within the frame) — see ``functions.exact``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import Catalog
from . import query
from .timeseries import (_DAILY_REVENUE_SQL,  # noqa: F401
                         _daily_revenue)


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_idx,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w AS DOUBLE) / 100.0
               AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS LAST, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative spend over order history. Orders with
    an unknown date sort after dated ones (explicit NULLS LAST both
    engines)."""
    o = Catalog(spark, sf_dir).orders
    odate = F.col("o_orderdate").asc_nulls_last()
    w = (W.partitionBy("o_custkey")
         .orderBy(odate, "o_orderkey")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        F.row_number().over(
            W.partitionBy("o_custkey").orderBy(odate, "o_orderkey")
        ).cast("long").alias("order_idx"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w)
         .cast("double") / 100.0).alias("running_spend"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderdate)  OVER w AS prev_orderdate,
           LEAD(o_orderdate) OVER w AS next_orderdate,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS LAST, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gaps per customer via lag/lead. Undated orders
    sort last (explicit NULLS LAST both engines)."""
    o = Catalog(spark, sf_dir).orders
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(), "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        prev.alias("prev_orderdate"),
        F.lead("o_orderdate").over(w).alias("next_orderdate"),
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"),
    )


@query(
    "window_rank",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(RANK()       OVER w AS BIGINT) AS price_rank,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS price_dense_rank,
           CAST(NTILE(4) OVER (PARTITION BY p_brand
                               ORDER BY p_retailprice NULLS LAST, p_partkey)
                AS BIGINT)
               AS price_quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand
                 ORDER BY p_retailprice DESC NULLS LAST, p_partkey)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile within brand by price. Unpriced
    parts rank last in both directions (explicit NULLS LAST)."""
    p = Catalog(spark, sf_dir).part
    w = W.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc_nulls_last(), "p_partkey")
    wq = W.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").asc_nulls_last(), "p_partkey")
    return p.select(
        "p_brand", "p_partkey", "p_retailprice",
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
        F.ntile(4).over(wq).cast("long").alias("price_quartile"),
    )


@query(
    "window_first_last_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
           FIRST_VALUE(l_shipdate) OVER w AS first_ship,
           LAST_VALUE(l_shipdate)  OVER w AS latest_ship_so_far,
           CAST(COUNT(*) OVER (PARTITION BY l_suppkey) AS BIGINT) AS supp_items
    FROM lineitem
    WINDOW w AS (PARTITION BY l_suppkey
                 ORDER BY l_shipdate NULLS LAST, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_first_last_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame with first/last over a supplier's ship
    history, plus an unbounded partition count. Unshipped lines sort
    last (explicit NULLS LAST both engines)."""
    li = Catalog(spark, sf_dir).lineitem
    w = (W.partitionBy("l_suppkey")
         .orderBy(F.col("l_shipdate").asc_nulls_last(),
                  "l_orderkey", "l_linenumber")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate",
        F.first("l_shipdate").over(w).alias("first_ship"),
        F.last("l_shipdate").over(w).alias("latest_ship_so_far"),
        F.count(F.lit(1)).over(W.partitionBy("l_suppkey")).alias("supp_items"),
    )


@query(
    "sort_limit_topk",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark runs ORDER BY + LIMIT as TakeOrderedAndProject
    — per-partition heaps of k rows, no full sort, no full shuffle.
    Deterministic via the unique (orderkey, linenumber) tiebreak."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "window_ntile_quartiles",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey)
                AS INT) AS balance_quartile
    FROM customer
    """,
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: each customer's balance quartile within its
    market segment. Deterministic via the unique c_custkey tiebreak
    (NTILE over a non-unique ordering is engine-dependent). One
    shuffle on the partition key, sort within partitions — the
    standard windowed-rank plan."""
    c = Catalog(spark, sf_dir).customer
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_custkey", "c_acctbal",
        F.ntile(4).over(w).alias("balance_quartile"),
    )


@query(
    "purchase_value_streaks",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               ROW_NUMBER() OVER w AS rn,
               CASE WHEN CAST(ROUND(value * 100) AS BIGINT)
                         > LAG(CAST(ROUND(value * 100) AS BIGINT)) OVER w
                    THEN 0 ELSE 1 END AS brk
        FROM events WHERE event_type = 'purchase'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), isl AS (
        SELECT user_id,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY rn
                              ROWS UNBOUNDED PRECEDING) AS streak_id
        FROM p
    ), runs AS (
        SELECT user_id, streak_id, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM isl GROUP BY user_id, streak_id
    )
    SELECT user_id,
           CAST(MAX(run_len) AS BIGINT) AS longest_streak,
           CAST(COUNT_IF(run_len >= 3) AS BIGINT) AS n_streaks_ge3,
           CAST(SUM(run_len) AS BIGINT) AS n_purchases
    FROM runs GROUP BY user_id
    """,
)
def purchase_value_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, runs of strictly increasing
    purchase values (ordered by ts with the unique event_id
    tiebreak), reporting the longest run and how many runs reach
    length 3 — the sequential-pattern shape (MATCH_RECOGNIZE's
    bread-and-butter) expressed as lag-compare → running break-sum →
    island aggregate. The value comparison happens on exact cents,
    so run boundaries are engine-identical.

    One exchange on user_id serves the lag window, the running sum,
    and both aggregates — everything after the shuffle is
    in-partition sorts and hash aggregates over (user_id, ...) keys.
    Scale follows the per-user event count; skew handling is the same
    salting story as any per-entity window.
    """
    from ..functions.exact import cents
    ev = Catalog(spark, sf_dir).events
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"),
        cents(F.col("value")).alias("cents"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    marked = p.select(
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.when(F.col("cents") > F.lag("cents").over(w), 0).otherwise(1)
        .alias("brk"))
    isl = marked.withColumn(
        "streak_id",
        F.sum("brk").over(W.partitionBy("user_id").orderBy("rn")
                          .rowsBetween(W.unboundedPreceding, 0)))
    runs = isl.groupBy("user_id", "streak_id").agg(
        F.count(F.lit(1)).alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.max("run_len").alias("longest_streak"),
        F.sum((F.col("run_len") >= 3).cast("long")).alias("n_streaks_ge3"),
        F.sum("run_len").alias("n_purchases"),
    )


@query(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS trailing_1h_cents
    FROM events
    """,
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based RANGE frame: per user, the trailing-1-hour sum of
    event value at every event — the physical-time sibling of
    ``window_range_frame``'s value-range frame. The frame bound is
    expressed on the microsecond epoch (RANGE over integers), so
    frame membership is an exact integer comparison on both engines;
    ties in event time share one frame by RANGE semantics, which
    makes the per-row result order-independent under duplicates.
    One keyed window exchange; integer-cent sums.
    """
    from ..catalog import Catalog
    ev = Catalog(spark, sf_dir).events
    from ..functions.exact import cents
    w = (W.partitionBy("user_id").orderBy(F.unix_micros("ts"))
         .rangeBetween(-3_600_000_000, 0))
    return ev.select(
        "event_id", "user_id", "ts",
        F.sum(cents(F.col("value"))).over(w).alias("trailing_1h_cents"))


@query(
    "window_moving_median",
    oracle="""
    SELECT event_id, user_id,
           quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5e0) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
           / 100e0 AS moving_median
    FROM events
    """,
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median over the 7 trailing events per user — an ORDER
    STATISTIC as a window aggregate (not a running sum), the robust
    smoother for spiky series. Exactness: the median runs over
    integer CENTS, so the even-frame interpolation midpoint
    (lo + 0.5*(hi-lo)) is exactly representable and both engines'
    formulas agree bit-for-bit; one division to dollars at the end.
    One keyed window exchange; the frame is 7 rows, so per-row cost
    is O(frame log frame) regardless of history length.
    """
    from ..catalog import Catalog
    from ..functions.exact import cents
    ev = Catalog(spark, sf_dir).events
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-6, 0))
    med = F.expr(
        "percentile(cast(round(value * 100) as bigint), 0.5D)").over(w)
    return ev.select("event_id", "user_id",
                     (med / F.lit(100.0)).alias("moving_median"))


@query(
    "topk_with_ties_dense",
    oracle="""
    WITH r AS (
        SELECT n_name, c_custkey, c_acctbal,
               DENSE_RANK() OVER (PARTITION BY n_name
                                  ORDER BY CAST(ROUND(c_acctbal * 100)
                                                AS BIGINT) DESC)
                   AS tier
        FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    SELECT n_name, CAST(tier AS INT) AS tier, c_custkey, c_acctbal
    FROM r WHERE tier <= 3
    """,
)
def topk_with_ties_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES: the three highest account-balance TIERS per
    nation, every customer in a tied tier included — DENSE_RANK
    semantics (SQL's FETCH FIRST k ROWS WITH TIES generalized to
    per-group), vs ``top_spenders_per_nation``'s exactly-k
    ROW_NUMBER cut. Ranking compares integer cents so tie detection
    is exact; the dimension join broadcasts (nation is bounded);
    one keyed window pass.
    """
    from ..catalog import Catalog
    cat = Catalog(spark, sf_dir)
    c = cat.customer
    n = cat.broadcast("nation").select("n_nationkey", "n_name")
    j = c.join(n, c.c_nationkey == F.col("n_nationkey"))
    cents_bal = F.round(F.col("c_acctbal") * 100).cast("long")
    tier = F.dense_rank().over(
        W.partitionBy("n_name").orderBy(cents_bal.desc()))
    return (j.select("n_name", "c_custkey", "c_acctbal",
                     tier.alias("tier"))
            .filter(F.col("tier") <= 3)
            .select("n_name", "tier", "c_custkey", "c_acctbal"))


@query(
    "rolling_ols_slope_7d",
    oracle=f"""
    WITH {_DAILY_REVENUE_SQL}, mn AS (SELECT min(d) AS d0 FROM daily),
    idx AS (
        SELECT d, CAST(date_diff('day', d0, d) AS BIGINT) AS x, y
        FROM daily CROSS JOIN mn
    ), w AS (
        SELECT d, x, y,
               CAST(COUNT(*) OVER fr AS BIGINT) AS n,
               CAST(SUM(x) OVER fr AS BIGINT) AS sx,
               CAST(SUM(y) OVER fr AS BIGINT) AS sy,
               CAST(SUM(x * y) OVER fr AS BIGINT) AS sxy,
               CAST(SUM(x * x) OVER fr AS BIGINT) AS sxx
        FROM idx
        WINDOW fr AS (ORDER BY x RANGE BETWEEN 6 PRECEDING
                      AND CURRENT ROW)
    )
    SELECT d, n AS n_days_in_window,
           CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
                END AS slope_per_day
    FROM w
    ORDER BY d
    """,
)
def rolling_ols_slope_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day regression slope of daily revenue — the local
    trend signal dashboards plot next to the raw series (a moving
    average smooths level; this smooths DIRECTION). The window is a
    RANGE frame over the integer day index, so calendar gaps shrink
    the fitted set instead of silently stretching the window across
    them (the ROWS-frame bug); all five frame moments are integer
    window sums (whole-unit revenue, recentered day index — products
    bounded far under 2⁶³ in a 7-row frame), and the slope is one
    guarded double division. Degenerate frames (n < 2 or zero
    x-variance) yield NULL, matching both engines' CASE semantics.

    One orders aggregate, a 1-row broadcast min-date, then every
    window sum shares the single ordered walk over the
    calendar-bounded daily relation (the KS-family envelope).
    """
    from pyspark.sql import Window as W

    daily = _daily_revenue(Catalog(spark, sf_dir))
    mn = daily.agg(F.min("d").alias("d0"))
    idx = (daily.crossJoin(F.broadcast(mn))
           .select("d",
                   F.datediff(F.col("d"), F.col("d0")).cast("long")
                   .alias("x"), "y"))
    fr = W.orderBy("x").rangeBetween(-6, 0)
    w = (idx
         .withColumn("n", F.count(F.lit(1)).over(fr))
         .withColumn("sx", F.sum("x").over(fr))
         .withColumn("sy", F.sum("y").over(fr))
         .withColumn("sxy", F.sum(F.col("x") * F.col("y")).over(fr))
         .withColumn("sxx", F.sum(F.col("x") * F.col("x")).over(fr)))
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (w.select(
        "d", F.col("n").alias("n_days_in_window"),
        F.when((F.col("n") >= 2) & (den != 0),
               num.cast("double") / den.cast("double"))
        .alias("slope_per_day"))
        .orderBy("d"))


@query(
    "cumulative_distinct_users_by_type",
    oracle="""
    WITH first_seen AS (
        SELECT event_type, user_id,
               MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS first_day
        FROM events GROUP BY event_type, user_id
    ), daily_new AS (
        SELECT event_type, first_day AS day,
               CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_seen GROUP BY event_type, first_day
    )
    SELECT event_type, day, new_users,
           CAST(SUM(new_users) OVER (PARTITION BY event_type
                                     ORDER BY day
                                     ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_distinct_users
    FROM daily_new
    ORDER BY event_type, day
    """,
)
def cumulative_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — the audience-growth
    curve ("distinct users who have ever done X, by day") that SQL
    engines refuse to express directly (COUNT(DISTINCT) OVER is
    unsupported in Spark). The scalable reformulation: distinctness
    is a FIRST-OCCURRENCE property, so reduce (event_type, user) to
    its first day (one aggregate), count first-claims per day, and
    cumulative-sum those day-grain counts. The textbook dense_rank
    trick gives the same numbers but windows over EVERY event row;
    this plan's window runs over day-grain rows — orders of magnitude
    smaller, and the events table is touched exactly once.

    Two exchanges total: (event_type, user) for the first-occurrence
    reduce, event_type for the day walk. Both keys are the
    aggregation's natural keys — nothing shuffles twice.
    """
    ev = Catalog(spark, sf_dir).events
    first_seen = (ev.groupBy("event_type", "user_id")
                  .agg(F.min(F.col("ts").cast("date")).alias("first_day")))
    daily_new = (first_seen.groupBy("event_type",
                                    F.col("first_day").alias("day"))
                 .agg(F.count(F.lit(1)).alias("new_users")))
    w = (W.partitionBy("event_type").orderBy("day")
         .rowsBetween(W.unboundedPreceding, 0))
    return (daily_new
            .withColumn("cum_distinct_users",
                        F.sum("new_users").over(w).cast("long"))
            .orderBy("event_type", "day"))


@query(
    "window_rank_functions_suite",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents,
           CAST(RANK() OVER w AS BIGINT) AS bal_rank,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS bal_dense_rank,
           PERCENT_RANK() OVER w AS bal_percent_rank,
           CUME_DIST() OVER w AS bal_cume_dist,
           CAST(NTILE(4) OVER w AS BIGINT) AS bal_quartile,
           CAST(NTH_VALUE(CAST(ROUND(c_acctbal * 100) AS BIGINT), 2)
                OVER (PARTITION BY c_nationkey
                      ORDER BY c_acctbal DESC, c_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                           AND UNBOUNDED FOLLOWING) AS BIGINT)
               AS second_highest_cents
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_functions_suite(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """The remaining rank-family window functions in one audited
    plan: RANK / DENSE_RANK (gap vs no-gap tie handling),
    PERCENT_RANK and CUME_DIST (the two normalized ranks — exact
    here because both divide the same integers in both engines),
    NTILE(4) (equal-height buckets), and NTH_VALUE over the full
    frame (the "second best per group" idiom, which needs UNBOUNDED
    FOLLOWING — the default frame would return NULL until row 2).
    All seven share ONE window spec over (nation, balance DESC,
    custkey), so Catalyst evaluates them in a single Window operator
    on a single exchange — the plan shape to insist on when a report
    stacks rank columns.
    """
    c = Catalog(spark, sf_dir).customer
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_custkey", "c_nationkey", cents.alias("bal_cents"),
        F.rank().over(w).cast("long").alias("bal_rank"),
        F.dense_rank().over(w).cast("long").alias("bal_dense_rank"),
        F.percent_rank().over(w).alias("bal_percent_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
        F.nth_value(cents, 2).over(full).cast("long")
        .alias("second_highest_cents"))


@query(
    "window_rolling_median_7d",
    oracle=f"""
    WITH {_DAILY_REVENUE_SQL}, win AS (
        SELECT d, y,
               list_sort(list_filter(
                   [y, LAG(y, 1) OVER w, LAG(y, 2) OVER w,
                    LAG(y, 3) OVER w, LAG(y, 4) OVER w,
                    LAG(y, 5) OVER w, LAG(y, 6) OVER w],
                   x -> x IS NOT NULL)) AS vals
        FROM daily WINDOW w AS (ORDER BY d)
    )
    SELECT d, y, CAST(len(vals) AS BIGINT) AS n_window,
           CAST(vals[(len(vals) + 1) // 2] AS BIGINT) AS median7
    FROM win
    """,
)
def window_rolling_median_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-point EXACT median of daily revenue — the robust
    smoother a spike-heavy series needs where the rolling mean (and
    the EWMA) chase outliers. No approx_percentile: the frame is
    bounded at 7 rows, so the median is literal order-statistic
    selection — collect the frame's lags into an array, drop NULLs
    (series head and NULL-revenue days shrink the window on both
    engines identically), sort, take the lower-median element. An
    all-NULL frame (possible under null-injection: NULL-revenue days
    keep NULL y) yields NULL, matching DuckDB's out-of-range list
    index — Spark's element_at raises on index 0, so the empty frame
    is guarded explicitly (ADVICE r9). Exact BIGINTs end to end;
    nearest-rank (lower) convention.

    One Window operator materializes all 7 lags over one sort of the
    day-grain series (calendar-bounded rows at any corpus scale); the
    array sort is per-row constant work. The same shape scales to any
    bounded frame; an unbounded-frame exact median is a different
    operator (exact_median_two_pass).
    """
    daily = _daily_revenue(Catalog(spark, sf_dir))
    w = W.orderBy("d")
    arr = F.array(*[F.lag("y", k).over(w) for k in range(0, 7)])
    present = "filter(arr, x -> x IS NOT NULL)"
    return (daily.withColumn("arr", arr)
            .select("d", "y",
                    F.expr(f"size({present})").cast("long")
                    .alias("n_window"),
                    F.expr(f"CASE WHEN size({present}) = 0"
                           f" THEN CAST(NULL AS BIGINT)"
                           f" ELSE element_at(array_sort({present}),"
                           f" CAST((size({present}) + 1) div 2 AS INT))"
                           f" END")
                    .cast("long").alias("median7")))
