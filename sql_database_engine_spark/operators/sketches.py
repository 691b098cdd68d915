"""Count-min sketch: sub-linear-memory frequency estimation, built
with plain distributive aggregation.

The sketch is a d×w counter matrix: row i counts tokens into cell
``h_i(token) mod w``; an item's estimate is the min over its d cells.
Because each cell is a SUM, the build is one ``groupBy(row, cell)``
— partial-aggregated map-side, mergeable across partitions, executors,
days (sketch union = matrix addition). That mergeability is the whole
point at 100 TB: the exact vocabulary count
(``text.heavy_hitter_tokens``) shuffles one row per distinct token,
while the sketch shuffles at most d×w rows *total* regardless of
vocabulary size, at the price of a bounded overestimate
(E[err] ≤ e·N/w per hash row, driven below any threshold by width).

Guarantees are asserted statistically in
``tests/test_neardup_quality.py`` style: estimates never undercount,
and overshoot stays within the Markov bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import Catalog
from . import query

#: depth (independent hash rows) × width (cells per row).
CMS_DEPTH = 4
CMS_WIDTH = 1 << 14


def _cells(tok_col, depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """(row, cell) pairs for a token — md5-derived 32-bit hash with a
    per-row salt, the same cross-engine-replayable hash family as the
    MinHash/winnowing pipelines (a production build would swap in
    xxhash64 — faster, JVM-native — without changing the plan; md5
    here makes the sketch CELLS oracle-verifiable, not just the
    error contract)."""
    h32 = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")  # noqa: E731
    return F.array(*[
        F.struct(F.lit(i).alias("row"),
                 F.pmod(h32(F.concat(tok_col, F.lit(f"#{i}"))),
                        F.lit(width)).alias("cell"))
        for i in range(depth)
    ])


def _cells_sql(tok_sql: str, depth: int = CMS_DEPTH,
               width: int = CMS_WIDTH) -> str:
    """DuckDB twin of :func:`_cells` as a LATERAL-ready (row, cell)
    generator body: one SELECT per hash row, unioned."""
    parts = [
        f"SELECT {i} AS row, "
        f"CAST(('0x' || substring(md5({tok_sql} || '#{i}'), 1, 8))::UBIGINT"
        f" AS BIGINT) % {width} AS cell"
        for i in range(depth)
    ]
    return " UNION ALL ".join(parts)


def build_cms(toks: DataFrame, tok_col: str = "tok") -> DataFrame:
    """The sketch matrix as a DataFrame: (row, cell, n)."""
    return (
        toks.select(F.explode(_cells(F.col(tok_col))).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _cms_estimates_sql() -> str:
    """Pipeline-replay oracle for ``cms_token_count_estimates``: the
    full d×w sketch build (same md5 cells), the same top-25 probe
    set, the same min-over-rows estimate."""
    return f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), cms AS (
        SELECT row, cell, CAST(COUNT(*) AS BIGINT) AS n
        FROM toks, LATERAL ({_cells_sql('tok')}) AS h
        GROUP BY row, cell
    ), exact AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM toks GROUP BY tok
        ORDER BY n_exact DESC, tok LIMIT 25
    ), probes AS (
        SELECT tok, n_exact, h.row, h.cell
        FROM exact, LATERAL ({_cells_sql('tok')}) AS h
    )
    SELECT p.tok, p.n_exact, MIN(c.n) AS n_est
    FROM probes p JOIN cms c ON p.row = c.row AND p.cell = c.cell
    GROUP BY p.tok, p.n_exact
    ORDER BY p.n_exact DESC, p.tok
    """


@query("cms_token_count_estimates", oracle=_cms_estimates_sql())
def cms_token_count_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimate the top-25 tokens' frequencies from a count-min sketch
    and report estimate vs exact. The estimate join probes d cells per
    queried token against the (at most d×w row) sketch — the sketch
    side broadcasts at any corpus size, which is the payoff shape.

    Formerly rows-only ("sketch cells are engine-private"): the cells
    were xxhash64, which DuckDB cannot compute. The hash family is
    incidental to the CMS structure, so it now uses the md5-derived
    32-bit hashes the MinHash/winnowing oracles established, and the
    oracle replays the ENTIRE sketch — build, probe, min-over-rows —
    hash-pinning estimates the ``cms_error_contract`` could only
    bound."""
    d = Catalog(spark, sf_dir).documents
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    cms = build_cms(toks)

    exact = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_exact"))
             .orderBy(F.col("n_exact").desc(), "tok").limit(25))
    probes = (exact.select("tok", "n_exact",
                           F.explode(_cells(F.col("tok"))).alias("rc"))
              .select("tok", "n_exact",
                      F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell")))
    return (
        probes.join(F.broadcast(cms), ["row", "cell"])
        .groupBy("tok", "n_exact")
        .agg(F.min("n").alias("n_est"))
        .orderBy(F.col("n_exact").desc(), "tok")
    )


@query(
    "cms_error_contract",
    oracle="""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), e AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM toks GROUP BY tok
        ORDER BY n_exact DESC, tok LIMIT 25
    )
    SELECT tok, n_exact,
           CAST(1 AS BIGINT) AS no_undercount,
           CAST(1 AS BIGINT) AS within_bound
    FROM e
    """,
)
def cms_error_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The count-min sketch's guarantees as an oracle-checked
    CONTRACT — companion to ``cms_token_count_estimates`` (now itself
    fully oracle-replayed; this contract remains the portable form a
    production xxhash build would keep): for the top-25 tokens, emit
    the exact count plus
    flags asserting (a) the sketch never undercounts — a structural
    CMS property, deterministically true — and (b) the overcount
    stays within 8x the Markov bound e·N/w (measured slack is ~∞:
    zero overcount at every test SF; the 8x margin makes the flag
    deterministic-in-practice at any corpus this vocabulary shape
    scales to). Same bounded-contract pattern as
    ``agg_approx_distinct`` and ``sketch_percentile_drift`` — the
    driver hash-verifies the sketch's error envelope instead of
    skipping it.
    """
    import math
    d = Catalog(spark, sf_dir).documents
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    cms = build_cms(toks)
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_exact"))
             .orderBy(F.col("n_exact").desc(), "tok").limit(25))
    probes = (exact.select("tok", "n_exact",
                           F.explode(_cells(F.col("tok"))).alias("rc"))
              .select("tok", "n_exact",
                      F.col("rc.row").alias("row"),
                      F.col("rc.cell").alias("cell")))
    est = (probes.join(F.broadcast(cms), ["row", "cell"])
           .groupBy("tok", "n_exact")
           .agg(F.min("n").alias("n_est")))
    bound = F.ceil(F.lit(8.0 * math.e) * F.col("n_total") / F.lit(CMS_WIDTH))
    return (est.crossJoin(F.broadcast(total))
            .select("tok", "n_exact",
                    (F.col("n_est") >= F.col("n_exact")).cast("long")
                    .alias("no_undercount"),
                    (F.col("n_est") - F.col("n_exact") <= bound).cast("long")
                    .alias("within_bound")))


@query(
    "hll_rollup_distinct_contract",
    oracle="""
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS BIGINT) AS within_5pct
    FROM events
    GROUP BY 1
    """,
)
def hll_rollup_distinct_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable COUNT DISTINCT rollup via HLL sketch partials — the
    missing piece of ``analytics.rollup_reuse_two_grain``: count-sum
    partials merge upward across grains, but DISTINCT does not (a
    user active on 5 days is 5 daily distincts and 1 weekly), so a
    naive weekly distinct must rescan the fact table. The sketch
    rollup restores mergeability: each day aggregates its users into
    an HLL sketch (``hll_sketch_agg``, DataSketches HllSketch registers),
    and the weekly grain is ``hll_union_agg`` over SEVEN daily
    sketches — register-wise max, commutative and order-insensitive,
    hence deterministic — never a rescan. At 100 TB this is THE
    distinct-user architecture: daily sketches are a few KB each,
    weekly/monthly/all-time rollups union them in milliseconds, and
    the fact table is scanned exactly once ever.

    Contract shape (4th use of the ``cms_error_contract`` pattern):
    the emitted columns are the exact weekly distincts — computed
    identically in both engines — plus a flag asserting the sketch
    estimate landed within 5% of exact. Default lgConfigK=12 gives a
    relative standard error of ~1.6%, so the 5% margin is >3 sigma;
    below ~2.5k distincts the sketch is in exact (sparse) mode and
    the error is zero. Flag arithmetic is integer-only:
    |est - exact| * 20 <= exact.
    """
    e = Catalog(spark, sf_dir).events
    wk = F.date_trunc("week", "ts").cast("date")
    daily = (
        e.select(wk.alias("week"), F.to_date("ts").alias("day"), "user_id")
        .groupBy("week", "day")
        .agg(F.hll_sketch_agg(F.col("user_id").cast("string")).alias("sk"))
    )
    rolled = daily.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = (
        e.select(wk.alias("week"), "user_id")
        .groupBy("week")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    return (
        rolled.join(exact, "week")
        .select(
            "week", "n_days", "exact_users",
            (F.abs(F.col("est") - F.col("exact_users")) * 20
             <= F.col("exact_users")).cast("long").alias("within_5pct"))
    )


@query(
    "kll_merge_quantile_contract",
    oracle="""
    WITH v AS (
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week, value,
               ROW_NUMBER() OVER (PARTITION BY date_trunc('week', ts)
                                  ORDER BY value) AS rn,
               COUNT(*) OVER (PARTITION BY date_trunc('week', ts)) AS n
        FROM events WHERE value IS NOT NULL
    )
    SELECT week,
           CAST(n AS BIGINT) AS n_values,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS exact_p50,
           MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS exact_p90,
           CAST(1 AS BIGINT) AS p50_rank_ok,
           CAST(1 AS BIGINT) AS p90_rank_ok
    FROM v
    GROUP BY week, n
    """,
)
def kll_merge_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE rollup via KLL sketch partials — the
    percentile sibling of ``hll_rollup_distinct_contract``: exact
    percentiles need the week's full value multiset (per-group sort;
    quantiles don't merge), so every new grain rescans the facts. KLL
    restores mergeability: each day builds a fixed-size sketch
    (``kll_sketch_agg_double``, k=200), and the weekly sketch is a
    fold of ``kll_sketch_merge_double`` over the week's <= 7 daily
    sketches (bounded ``collect_list`` + ``F.aggregate`` — the merge
    is pairwise, so the fold shape is exactly how a 100 TB rollup
    tree merges thousands of shard sketches, log-depth).

    Contract shape: the emitted columns are the exact nearest-rank
    p50/p90 — the r-th order statistic is a unique VALUE even with
    duplicates, so it is deterministic in both engines — plus flags
    asserting the merged sketch's estimate sits within 5% normalized
    rank of its target: |rank_le(est)/n - q| <= 0.05, checked in
    integer arithmetic (|20*rank_le - 20q*n| <= n). k=200 bounds rank
    error at ~1.65% with 99% confidence, so 5% is >3x the bound; the
    sketch estimate itself (whose retained-item choice may vary with
    merge order) is asserted, not emitted, keeping the output
    deterministic. Null values are excluded on both engines — KLL
    sketches aggregate observed doubles and a quantile is an order
    statistic over observed values (the null_sweep audit class).
    """
    e = Catalog(spark, sf_dir).events.filter(F.col("value").isNotNull())
    from pyspark.sql import Window as W

    wk = F.date_trunc("week", "ts").cast("date")
    vals = e.select(wk.alias("week"), F.to_date("ts").alias("day"), "value")

    # Sketch lane: daily partials, weekly pairwise-merge fold.
    daily = vals.groupBy("week", "day").agg(
        F.kll_sketch_agg_double("value").alias("sk"))
    l = F.collect_list("sk")
    merged = F.aggregate(
        F.slice(l, 2, F.size(l) - 1), F.element_at(l, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x))
    ests = daily.groupBy("week").agg(
        F.kll_sketch_get_quantile_double(merged, F.lit(0.5)).alias("p50_est"),
        F.kll_sketch_get_quantile_double(merged, F.lit(0.9)).alias("p90_est"),
    )

    # Exact lane: nearest-rank order statistics per week.
    w = W.partitionBy("week")
    ranked = (vals
              .withColumn("rn", F.row_number().over(w.orderBy("value")))
              .withColumn("n", F.count(F.lit(1)).over(w)))
    exact = ranked.groupBy("week", "n").agg(
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"),
                     F.col("value"))).alias("exact_p50"),
        F.max(F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"),
                     F.col("value"))).alias("exact_p90"),
    ).select(F.col("week"), F.col("n").alias("n_values"),
             "exact_p50", "exact_p90")

    # Rank audit: where do the estimates land in the exact multiset?
    ranks = (vals.join(F.broadcast(ests), "week")
             .groupBy("week")
             .agg(F.sum((F.col("value") <= F.col("p50_est")).cast("long"))
                  .alias("rank50"),
                  F.sum((F.col("value") <= F.col("p90_est")).cast("long"))
                  .alias("rank90")))
    return (
        exact.join(ranks, "week")
        .select(
            "week", "n_values", "exact_p50", "exact_p90",
            # Tolerance floor of ONE rank position (n vs 20 in the
            # x20 lane): sub-1-rank error is unattainable, so the 5%
            # normalized-rank contract is impossible for n < 20 — a
            # 1-value week (empty_sweep singleton tier) has only
            # ranks 0 and 1. Identical to the plain 5% rule at
            # n >= 20.
            (F.abs(20 * F.col("rank50") - 10 * F.col("n_values"))
             <= F.greatest(F.col("n_values"), F.lit(20)))
            .cast("long").alias("p50_rank_ok"),
            (F.abs(20 * F.col("rank90") - 18 * F.col("n_values"))
             <= F.greatest(F.col("n_values"), F.lit(20)))
            .cast("long").alias("p90_rank_ok"))
    )


@query(
    "bitmap_distinct_rollup",
    oracle="""
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
    FROM events
    GROUP BY 1
    """,
)
def bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable COUNT DISTINCT rollup via bucketed bitmaps —
    the precise sibling of ``hll_rollup_distinct_contract`` and the
    third leg of the rollup family (count-sum partials merge by SUM,
    HLL sketches by register-max, bitmaps by OR): each user_id maps
    to a (bucket, bit position) pair (``bitmap_bucket_number`` /
    ``bitmap_bit_position``, 32k bits per 4 KB bucket), each day
    builds per-bucket presence bitmaps (``bitmap_construct_agg``),
    the weekly grain ORs the daily bitmaps per bucket
    (``bitmap_or_agg`` — idempotent and commutative, so merge order
    and double-counting don't matter), and popcount-sum reads the
    EXACT distinct count. No rescan, no error bar — hash-checked
    against a plain COUNT(DISTINCT) oracle.

    The 100 TB trade vs HLL: bitmap partials cost 4 KB per OCCUPIED
    32k-id bucket (dense ids → tiny; sparse 64-bit ids → prefer HLL's
    fixed few KB), buy back exactness and set algebra (AND/ANDNOT for
    retention and churn between periods without touching facts).
    Shuffle carries (week, day, bucket, 4 KB bitmap) — never raw
    events — and every merge level partial-aggregates map-side.
    """
    e = Catalog(spark, sf_dir).events
    wk = F.date_trunc("week", "ts").cast("date")
    daily = (
        e.select(wk.alias("week"), F.to_date("ts").alias("day"),
                 F.bitmap_bucket_number("user_id").alias("bkt"),
                 F.bitmap_bit_position("user_id").alias("pos"))
        .groupBy("week", "day", "bkt")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    weekly = daily.groupBy("week", "bkt").agg(
        F.bitmap_or_agg("bm").alias("bm"))
    return (weekly.groupBy("week")
            .agg(F.sum(F.bitmap_count("bm")).alias("distinct_users")))


@query(
    "bitmap_retention_churn",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS week,
               user_id
        FROM events WHERE user_id IS NOT NULL
    ), tot AS (
        SELECT week, CAST(COUNT(*) AS BIGINT) AS n_active
        FROM uw GROUP BY week
    ), ret AS (
        SELECT a.week, CAST(COUNT(*) AS BIGINT) AS retained
        FROM uw a JOIN uw b ON b.user_id = a.user_id
                           AND b.week = a.week + 7
        GROUP BY a.week
    )
    SELECT t.week AS week_start, t.n_active AS active_this,
           n.n_active AS active_next,
           COALESCE(r.retained, 0) AS retained,
           t.n_active - COALESCE(r.retained, 0) AS churned,
           n.n_active - COALESCE(r.retained, 0) AS new_users
    FROM tot t
    JOIN tot n ON n.week = t.week + 7
    LEFT JOIN ret r ON r.week = t.week
    """,
)
def bitmap_retention_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention / churn / new-user decomposition via
    BITMAP SET ALGEBRA — the payoff ``bitmap_distinct_rollup``'s
    docstring promises: once weekly presence bitmaps exist, retained
    users are popcount(thisweek AND nextweek) (``bitmap_and_agg``
    over the two aligned bucket rows), and churned/new fall out as
    total - retained on each side — the fact table is never rejoined.
    The set-membership version (``retention_weekly_cohorts``) shuffles
    one row per (user, week); this shuffles one 4 KB bitmap per
    occupied (week, bucket) — at 100 TB that's the difference between
    a user-cardinality exchange and a metadata-sized one, and the
    same AND/ANDNOT algebra answers any period pair from the stored
    bitmaps alone.

    Anonymous events (null user_id) are excluded explicitly on both
    engines — the bitmap position of NULL is undefined, while the
    oracle's DISTINCT previously counted NULL as one extra "user"
    per week (null_sweep audit).

    Plan shape: weekly bucket bitmaps are built once, contributed to
    pair groups (week w serves pair w as "current" and pair w-7 as
    "next") via a union, and intersected by ``bitmap_and_agg`` only
    where BOTH weeks populate the bucket (n_src = 2 guard — AND over
    a 1-row group is the identity, which would overcount). Exact
    integers end to end.
    """
    e = Catalog(spark, sf_dir).events.filter(
        F.col("user_id").isNotNull())
    wk = F.date_trunc("week", "ts").cast("date")
    weekly = (
        e.select(wk.alias("week"),
                 F.bitmap_bucket_number("user_id").alias("bkt"),
                 F.bitmap_bit_position("user_id").alias("pos"))
        .groupBy("week", "bkt")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    tot = weekly.groupBy("week").agg(
        F.sum(F.bitmap_count("bm")).alias("n_active"))

    cur = weekly.select(F.col("week").alias("pair_week"), "bkt", "bm")
    nxt = weekly.select(F.date_sub("week", 7).alias("pair_week"),
                        "bkt", "bm")
    inter = (cur.unionByName(nxt)
             .groupBy("pair_week", "bkt")
             .agg(F.count(F.lit(1)).alias("n_src"),
                  F.bitmap_and_agg("bm").alias("abm"))
             .filter(F.col("n_src") == 2))
    retained = inter.groupBy("pair_week").agg(
        F.sum(F.bitmap_count("abm")).alias("retained"))

    t = tot.select(F.col("week").alias("week_start"),
                   F.col("n_active").alias("active_this"))
    n = tot.select(F.date_sub("week", 7).alias("week_start"),
                   F.col("n_active").alias("active_next"))
    return (
        t.join(n, "week_start")
        .join(retained.withColumnRenamed("pair_week", "week_start"),
              "week_start", "left")
        .select(
            "week_start", "active_this", "active_next",
            F.coalesce("retained", F.lit(0)).alias("retained"),
            (F.col("active_this") - F.coalesce("retained", F.lit(0)))
            .alias("churned"),
            (F.col("active_next") - F.coalesce("retained", F.lit(0)))
            .alias("new_users"))
    )


@query(
    "hll_setop_contract",
    oracle="""
    WITH a AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'click' AND user_id IS NOT NULL
    ), b AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ), ex AS (
        SELECT (SELECT COUNT(*) FROM a) AS exact_a,
               (SELECT COUNT(*) FROM b) AS exact_b,
               (SELECT COUNT(*) FROM (SELECT user_id FROM a
                                      UNION SELECT user_id FROM b))
                   AS exact_union
    )
    SELECT CAST(exact_a AS BIGINT) AS exact_a,
           CAST(exact_b AS BIGINT) AS exact_b,
           CAST(exact_union AS BIGINT) AS exact_union,
           CAST(exact_a + exact_b - exact_union AS BIGINT)
               AS exact_intersection,
           CAST(1 AS BIGINT) AS union_within_5pct,
           CAST(1 AS BIGINT) AS intersection_within_10pct
    FROM ex
    """,
)
def hll_setop_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA with error contracts — the audience-overlap
    query every marketing/analytics stack runs ("how many users
    clicked AND purchased?") answered from mergeable sketches:
    |A∪B| is ``hll_union_agg`` over the two audience sketches (HLL
    unions are lossless — register max), and |A∩B| falls out of
    inclusion-exclusion |A|+|B|−|A∪B|. At 100 TB the audiences are
    one sketch each (KB-sized, maintained incrementally); the overlap
    matrix over N audiences costs N² sketch unions, never N² joins
    of user sets.

    Contract shape (5th use of the pattern): exact values computed
    identically in both engines ride with integer-only flags —
    union within 5% (HLL RSE ~1.6% at lgK=12, so >3σ), intersection
    within 10% OF THE UNION size (inclusion-exclusion differences
    amplify relative error — the flag's denominator states that
    honestly; |est∩ − exact∩|·10 ≤ exact∪).

    Anonymous events are excluded on both engines: the sketch input
    already skips NULL user_ids, but the oracle's COUNT(*) over a
    DISTINCT set previously counted the NULL row as one extra user
    (null_sweep audit).
    """
    e = Catalog(spark, sf_dir).events.filter(
        F.col("user_id").isNotNull())
    uid = F.col("user_id").cast("string")
    sk = (e.filter(F.col("event_type").isin("click", "purchase"))
          .groupBy("event_type")
          .agg(F.hll_sketch_agg(uid).alias("sk"),
               F.count_distinct("user_id").alias("exact")))
    # Pivot the 2-row sketch relation into one row: the set-op lane.
    # coalesce: an absent audience (no clicks, or nothing at all — the
    # empty_sweep class) is a COUNT of zero users, not unknown; the
    # oracle's scalar subqueries likewise count 0. Same for the union
    # estimate of zero sketches.
    one = sk.agg(
        F.coalesce(
            F.max(F.when(F.col("event_type") == "click", F.col("exact"))),
            F.lit(0)).alias("exact_a"),
        F.coalesce(
            F.max(F.when(F.col("event_type") == "purchase", F.col("exact"))),
            F.lit(0)).alias("exact_b"),
        F.coalesce(F.hll_sketch_estimate(F.hll_union_agg("sk")),
                   F.lit(0)).alias("est_union"))
    exact_union = (e.filter(F.col("event_type")
                            .isin("click", "purchase"))
                   .agg(F.count_distinct("user_id")
                        .alias("exact_union")))
    j = one.crossJoin(F.broadcast(exact_union))
    est_inter = (F.col("exact_a") + F.col("exact_b")
                 - F.col("est_union"))
    exact_inter = (F.col("exact_a") + F.col("exact_b")
                   - F.col("exact_union"))
    return j.select(
        "exact_a", "exact_b", "exact_union",
        exact_inter.cast("long").alias("exact_intersection"),
        (F.abs(F.col("est_union") - F.col("exact_union")) * 20
         <= F.col("exact_union")).cast("long").alias("union_within_5pct"),
        (F.abs(est_inter - exact_inter) * 10 <= F.col("exact_union"))
        .cast("long").alias("intersection_within_10pct"))


@query(
    "theta_setop_contract",
    oracle="""
    WITH a AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 5e1
          AND user_id IS NOT NULL
    ), b AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 8e1
          AND user_id IS NOT NULL
    ), ex AS (
        SELECT (SELECT COUNT(*) FROM a) AS exact_a,
               (SELECT COUNT(*) FROM b) AS exact_b,
               (SELECT COUNT(*) FROM (SELECT user_id FROM a
                                      INTERSECT
                                      SELECT user_id FROM b))
                   AS exact_intersection,
               (SELECT COUNT(*) FROM (SELECT user_id FROM a
                                      EXCEPT
                                      SELECT user_id FROM b))
                   AS exact_difference
        )
    SELECT CAST(exact_a AS BIGINT) AS exact_a,
           CAST(exact_b AS BIGINT) AS exact_b,
           CAST(exact_intersection AS BIGINT) AS exact_intersection,
           CAST(exact_difference AS BIGINT) AS exact_difference,
           CAST(1 AS BIGINT) AS intersection_within_10pct,
           CAST(1 AS BIGINT) AS difference_within_10pct
    FROM ex
    """,
)
def theta_setop_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set algebra with error contracts — the capability
    HLL fundamentally lacks: SET DIFFERENCE ("clicked but never
    purchased") from KB-sized sketches. Datasketches theta sketches
    (Spark 4.1 built-ins) support union, intersection, AND a-not-b
    natively; this operator builds sketches for two spend cohorts
    (purchasers above 50 vs above 80 — a containment-heavy pair with
    a REAL difference set, unlike the by-type cohorts where every
    fixture user appears in both), applies
    ``theta_intersection`` / ``theta_difference``, and emits the
    exact values beside integer within-10% contract flags — the
    bounded-contract pattern (``hll_setop_contract``,
    ``cms_error_contract``): the oracle predicts exact counts and
    flag=1, so an estimate drifting out of bound hash-fails. At this
    fixture's cardinalities theta estimates are exact-mode
    (below the sketch's retention threshold), which the contract
    absorbs — the flags are the driver-checkable surface either way.

    One events scan builds both sketches as aggregates; the set
    algebra runs on two KB blobs — at 100 TB this is the only way
    difference-of-audiences is answerable interactively.
    """
    # Anonymous purchasers are excluded on both engines — theta
    # sketches skip NULL inputs while the exact DISTINCT sets would
    # otherwise carry a NULL member (null_sweep audit).
    ev = Catalog(spark, sf_dir).events.filter(
        F.col("user_id").isNotNull())
    in_a = (F.col("event_type") == "purchase") & (F.col("value") > 50.0)
    in_b = (F.col("event_type") == "purchase") & (F.col("value") > 80.0)
    sk = (ev.agg(
        F.theta_sketch_agg(F.when(in_a, F.col("user_id"))).alias("sk_a"),
        F.theta_sketch_agg(F.when(in_b, F.col("user_id"))).alias("sk_b")))
    ests = sk.select(
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sk_a"), F.col("sk_b")))
        .alias("est_i"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("sk_a"), F.col("sk_b")))
        .alias("est_d"))
    # Each cohort feeds intersect, except, AND its own count —
    # checkpoint so the events scan runs once per cohort, not per
    # reference (the scan-count audit measured 7 events scans).
    a = (ev.filter(in_a).select("user_id").distinct()
         .localCheckpoint(eager=False))
    b = (ev.filter(in_b).select("user_id").distinct()
         .localCheckpoint(eager=False))
    ex = (a.intersect(b).agg(F.count(F.lit(1)).alias("exact_intersection"))
          .crossJoin(a.exceptAll(b).distinct()
                     .agg(F.count(F.lit(1)).alias("exact_difference")))
          .crossJoin(a.agg(F.count(F.lit(1)).alias("exact_a")))
          .crossJoin(b.agg(F.count(F.lit(1)).alias("exact_b"))))
    within = lambda est, exact: (  # noqa: E731
        (F.abs(F.round(est).cast("long") - F.col(exact)) * 10)
        <= F.col(exact)).cast("long")
    return (ex.crossJoin(F.broadcast(ests))
            .select("exact_a", "exact_b",
                    "exact_intersection", "exact_difference",
                    within(F.col("est_i"), "exact_intersection")
                    .alias("intersection_within_10pct"),
                    within(F.col("est_d"), "exact_difference")
                    .alias("difference_within_10pct")))
