"""Event-time analytics over the `events` table (batch semantics).

The same logical operations run as Structured Streaming plans in
``streaming/``; here they are batch DataFrame plans with DuckDB
oracles. Time semantics: ``events.ts`` is nanosecond-precision at
rest; the catalog truncates to microseconds (Spark's native
resolution), and every oracle applies the same ``CAST(ts AS
TIMESTAMP)`` truncation so both engines see identical instants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import Catalog
from . import query

_CENTS = "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)"


@query(
    "events_tumbling_window",
    oracle=f"""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST({_CENTS} AS DOUBLE) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type.

    Uses Spark's native ``window()`` (the same operator the streaming
    path uses with a watermark); the struct is flattened to
    window_start so the schema is oracle-comparable. Hour-aligned
    tumbling windows are exactly date_trunc buckets.
    """
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100.0)
             .alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


@query(
    "events_sliding_window",
    oracle="""
    WITH grid AS (
        SELECT user_id,
               (epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000) * 1800000000 AS slot_us
        FROM events
    ), expanded AS (
        SELECT unnest([make_timestamp(slot_us),
                       make_timestamp(slot_us - 1800000000)]) AS window_start,
               user_id
        FROM grid
    )
    SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM expanded GROUP BY window_start
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1-hour length, 30-minute slide — each event
    belongs to exactly 2 windows. Spark's window() enumerates the
    copies natively; the oracle reproduces the expansion with an
    explicit 30-minute grid + unnest."""
    ev = Catalog(spark, sf_dir).events
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.countDistinct("user_id").alias("n_users"))
        .select(F.col("w.start").alias("window_start"), "n", "n_users")
    )


@query(
    "events_sessionize",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_id,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM ordered
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           min(CAST(ts AS TIMESTAMP)) AS session_start,
           max(CAST(ts AS TIMESTAMP)) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, session_idx
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: 30-minute inactivity gap splits sessions.

    Classic lag + cumulative-sum session assignment — one shuffle on
    user_id, then two window passes over the same partitioning (Spark
    reuses the exchange). The streaming twin uses session_window().
    """
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Gap in exact integer microseconds — casting ts to whole seconds
    # would truncate and disagree with the oracle at 30:00.xx gaps.
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    sess = (
        ev.withColumn("new_session",
                      F.when(gap_us > 30 * 60 * 1_000_000, 1).otherwise(0))
        .withColumn("session_idx",
                    F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", F.col("session_idx").cast("long").alias("session_idx"))
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "events_dedup_first",
    oracle="""
    SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id) AS rn
        FROM (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
              FROM events)
    ) WHERE rn = 1
    """,
)
def events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the deterministic first occurrence.

    dropDuplicates() keeps an *arbitrary* row per key — fine for
    at-most-once semantics, wrong for reproducible pipelines. The
    scalable deterministic form is argmin via row_number over
    (ts, event_id). The streaming twin is dropDuplicates with a
    watermark over the same key."""
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type",
                F.col("ts").alias("first_ts"),
                F.col("event_id").alias("first_event_id"))
    )


@query(
    "events_asof_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           s.ts AS signup_ts, s.event_id AS signup_event_id
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events
          WHERE event_type <> 'signup' AND user_id IS NOT NULL) e
    ASOF JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events
               WHERE event_type = 'signup' AND user_id IS NOT NULL) s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent
    signup at-or-before it (inner: unmatched events drop).

    Spark lacks a native ASOF JOIN; the scalable composition is
    union-tag-and-carry: union both sides tagged, sort within user by
    time, carry the last signup forward with last(..., ignorenulls)
    over an unbounded-preceding frame, keep event rows with a match.
    One shuffle on user_id, no range explosion, no per-key driver
    loop — this survives arbitrarily long histories per user.

    Tie rule: a signup at exactly the event's ts matches (>=), so
    within equal ts signup rows sort first (is_event ASC).
    """
    # As-of joins are keyed by user; rows without the key cannot
    # match (oracle ASOF ON user equality) and are excluded on both
    # engines (null_sweep audit).
    ev = Catalog(spark, sf_dir).events.filter(
        F.col("user_id").isNotNull())
    events_side = (ev.filter(F.col("event_type") != "signup")
                   .select("event_id", "user_id", "ts", "event_type",
                           F.lit(None).cast("timestamp").alias("s_ts"),
                           F.lit(None).cast("long").alias("s_id"),
                           F.lit(1).alias("is_event")))
    signup_side = (ev.filter(F.col("event_type") == "signup")
                   .select("event_id", "user_id", "ts",
                           F.lit(None).cast("string").alias("event_type"),
                           F.col("ts").alias("s_ts"),
                           F.col("event_id").alias("s_id"),
                           F.lit(0).alias("is_event")))
    unioned = events_side.unionByName(signup_side)
    w = (W.partitionBy("user_id")
         .orderBy("ts", "is_event", "event_id")
         .rowsBetween(W.unboundedPreceding, 0))
    carried = (
        unioned
        .withColumn("signup_ts", F.last("s_ts", ignorenulls=True).over(w))
        .withColumn("signup_event_id", F.last("s_id", ignorenulls=True).over(w))
    )
    return (
        carried.filter((F.col("is_event") == 1) & F.col("signup_ts").isNotNull())
        .select("event_id", "user_id", "ts", "event_type", "signup_ts", "signup_event_id")
    )


@query(
    "events_type_value_stats",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST({_CENTS} AS DOUBLE) / 100.0 AS total_value,
           CAST(MIN(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS min_value,
           CAST(MAX(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS max_value
    FROM events GROUP BY event_type
    """,
)
def events_type_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event statistics (count, distinct users, exact value
    sum / min / max)."""
    ev = Catalog(spark, sf_dir).events
    cents = F.round(F.col("value") * 100).cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        (F.sum(cents).cast("double") / 100.0).alias("total_value"),
        (F.min(cents).cast("double") / 100.0).alias("min_value"),
        (F.max(cents).cast("double") / 100.0).alias("max_value"),
    )


@query(
    "events_asof_join_left",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           s.ts AS signup_ts, s.event_id AS signup_event_id
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events
          WHERE event_type <> 'signup' AND user_id IS NOT NULL) e
    ASOF LEFT JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                    FROM events
               WHERE event_type = 'signup' AND user_id IS NOT NULL) s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
)
def events_asof_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT as-of join: like events_asof_join but events with no prior
    signup are preserved with NULL match columns — the enrichment
    variant that never drops fact rows. Same union-tag-carry plan,
    minus the match filter."""
    # As-of joins are keyed by user; rows without the key cannot
    # match (oracle ASOF ON user equality) and are excluded on both
    # engines (null_sweep audit).
    ev = Catalog(spark, sf_dir).events.filter(
        F.col("user_id").isNotNull())
    events_side = (ev.filter(F.col("event_type") != "signup")
                   .select("event_id", "user_id", "ts", "event_type",
                           F.lit(None).cast("timestamp").alias("s_ts"),
                           F.lit(None).cast("long").alias("s_id"),
                           F.lit(1).alias("is_event")))
    signup_side = (ev.filter(F.col("event_type") == "signup")
                   .select("event_id", "user_id", "ts",
                           F.lit(None).cast("string").alias("event_type"),
                           F.col("ts").alias("s_ts"),
                           F.col("event_id").alias("s_id"),
                           F.lit(0).alias("is_event")))
    unioned = events_side.unionByName(signup_side)
    w = (W.partitionBy("user_id")
         .orderBy("ts", "is_event", "event_id")
         .rowsBetween(W.unboundedPreceding, 0))
    carried = (
        unioned
        .withColumn("signup_ts", F.last("s_ts", ignorenulls=True).over(w))
        .withColumn("signup_event_id", F.last("s_id", ignorenulls=True).over(w))
    )
    return (
        carried.filter(F.col("is_event") == 1)
        .select("event_id", "user_id", "ts", "event_type",
                "signup_ts", "signup_event_id")
    )


@query(
    "events_interval_join_binned",
    oracle="""
    SELECT e.user_id, e.event_id AS error_id,
           CAST(e.ts AS TIMESTAMP) AS error_ts,
           p.event_id AS purchase_id,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts
    FROM events e JOIN events p
      ON e.user_id = p.user_id
     AND e.event_type = 'error' AND p.event_type = 'purchase'
     AND CAST(p.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP)
     AND CAST(p.ts AS TIMESTAMP) <  CAST(e.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
    """,
)
def events_interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval join (purchases inside the 30 minutes after an
    error, per user), executed as a *binned* join — the scalable shape
    for range predicates with no natural equi key.

    A naive formulation joins on user_id alone and filters, making
    the candidate space per-user-quadratic (one hot user = one hot
    task). Here both sides get a 30-minute time-bin key: each interval
    emits its (at most two) covering bins, each probe event its single
    bin, and the join runs on (user_id, bin) with the range predicate
    as residual. Candidates are bounded by co-occurrence in a real
    time window, the shuffle key is (user, bin) so hot users spread
    over bins, and no pair can match twice (a probe has exactly one
    bin). This is the same decomposition the as-of join family uses
    (`events_asof_join`), generalized to overlap predicates."""
    _BIN_US = 30 * 60 * 1_000_000
    ev = Catalog(spark, sf_dir).events
    err = (ev.filter(F.col("event_type") == "error")
           .select(F.col("user_id").alias("e_user"),
                   F.col("event_id").alias("error_id"),
                   F.col("ts").alias("error_ts")))
    # the interval [ts, ts+30min) always lies inside bins {b, b+1}
    err = (err.withColumn("b0", F.expr(f"unix_micros(error_ts) div {_BIN_US}"))
           .withColumn("bin", F.explode(F.array("b0", F.col("b0") + 1)))
           .drop("b0"))
    pur = (ev.filter(F.col("event_type") == "purchase")
           .select(F.col("user_id").alias("user_id"),
                   F.col("event_id").alias("purchase_id"),
                   F.col("ts").alias("purchase_ts"))
           .withColumn("bin", F.expr(f"unix_micros(purchase_ts) div {_BIN_US}")))
    return (
        err.join(pur, (F.col("e_user") == F.col("user_id"))
                 & (err["bin"] == pur["bin"]))
        .filter((F.col("purchase_ts") >= F.col("error_ts"))
                & (F.col("purchase_ts") <
                   F.col("error_ts") + F.expr("INTERVAL 30 MINUTE")))
        .select("user_id", "error_id", "error_ts", "purchase_id", "purchase_ts")
    )


@query(
    "events_asof_join_forward",
    oracle="""
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           e.event_type, CAST(p.ts AS TIMESTAMP) AS next_purchase_ts
    FROM (SELECT event_id, user_id, ts, event_type
          FROM events
          WHERE event_type <> 'purchase' AND user_id IS NOT NULL) e
    ASOF JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events
               WHERE event_type = 'purchase' AND user_id IS NOT NULL) p
      ON e.user_id = p.user_id AND CAST(e.ts AS TIMESTAMP) <= p.ts
    """,
)
def events_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each event matched to the user's *next*
    purchase at-or-after it (inner). Mirror of ``events_asof_join``
    with the carry reversed: first(..., ignorenulls) over the
    [current, unbounded following] frame instead of last(...) over
    the preceding frame — still one shuffle on user_id, still no
    range explosion. Tie rule: a purchase at exactly the event's ts
    matches (<=), so at equal ts event rows sort first (is_event
    DESC) and see the purchase inside their frame."""
    # As-of joins are keyed by user; rows without the key cannot
    # match (oracle ASOF ON user equality) and are excluded on both
    # engines (null_sweep audit).
    ev = Catalog(spark, sf_dir).events.filter(
        F.col("user_id").isNotNull())
    events_side = (ev.filter(F.col("event_type") != "purchase")
                   .select("event_id", "user_id", "ts", "event_type",
                           F.lit(None).cast("timestamp").alias("p_ts"),
                           F.lit(1).alias("is_event")))
    purchase_side = (ev.filter(F.col("event_type") == "purchase")
                     .select("event_id", "user_id", "ts",
                             F.lit(None).cast("string").alias("event_type"),
                             F.col("ts").alias("p_ts"),
                             F.lit(0).alias("is_event")))
    unioned = events_side.unionByName(purchase_side)
    w = (W.partitionBy("user_id")
         .orderBy("ts", F.col("is_event").desc(), "event_id")
         .rowsBetween(0, W.unboundedFollowing))
    carried = unioned.withColumn(
        "next_purchase_ts", F.first("p_ts", ignorenulls=True).over(w))
    return (
        carried.filter((F.col("is_event") == 1)
                       & F.col("next_purchase_ts").isNotNull())
        .select("event_id", "user_id", "ts", "event_type", "next_purchase_ts")
    )


@query(
    "events_asof_join_nearest",
    oracle="""
    WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
                      event_type
               FROM events
               WHERE event_type <> 'purchase' AND user_id IS NOT NULL),
         p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
               FROM events
               WHERE event_type = 'purchase' AND user_id IS NOT NULL),
         b AS (SELECT e.event_id, p.ts AS b_ts
               FROM e ASOF JOIN p
                 ON e.user_id = p.user_id AND e.ts >= p.ts),
         f AS (SELECT e.event_id, p.ts AS f_ts
               FROM e ASOF JOIN p
                 ON e.user_id = p.user_id AND e.ts <= p.ts)
    SELECT e.event_id, e.user_id, e.ts, e.event_type,
           CASE WHEN b_ts IS NULL THEN f_ts
                WHEN f_ts IS NULL THEN b_ts
                WHEN epoch_us(e.ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(e.ts) THEN b_ts
                ELSE f_ts END AS purchase_ts,
           CASE WHEN b_ts IS NULL THEN 'forward'
                WHEN f_ts IS NULL THEN 'backward'
                WHEN epoch_us(e.ts) - epoch_us(b_ts)
                     <= epoch_us(f_ts) - epoch_us(e.ts) THEN 'backward'
                ELSE 'forward' END AS direction,
           CAST(LEAST(COALESCE(epoch_us(e.ts) - epoch_us(b_ts), 9223372036854775807),
                      COALESCE(epoch_us(f_ts) - epoch_us(e.ts), 9223372036854775807))
                AS BIGINT) AS delta_us
    FROM e
    LEFT JOIN b ON e.event_id = b.event_id
    LEFT JOIN f ON e.event_id = f.event_id
    WHERE b_ts IS NOT NULL OR f_ts IS NOT NULL
    """,
)
def events_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: each event matched to the user's closest
    purchase in either direction (tie → the earlier one, i.e.
    backward wins). Completes the as-of family: backward
    (``events_asof_join``), left, forward, nearest.

    Both candidates come from ONE union-tag pass: the backward carry
    (last purchase ts over the preceding frame) and the forward carry
    (first over the following frame) are two window functions over the
    same user_id partitioning — one shuffle, two in-partition sorts
    (the tie rules need opposite is_event orderings). No range
    explosion, no per-key loop; the oracle reproduces the semantics
    with two DuckDB ASOF joins recombined.
    """
    # As-of joins are keyed by user; rows without the key cannot
    # match (oracle ASOF ON user equality) and are excluded on both
    # engines (null_sweep audit).
    ev = Catalog(spark, sf_dir).events.filter(
        F.col("user_id").isNotNull())
    events_side = (ev.filter(F.col("event_type") != "purchase")
                   .select("event_id", "user_id", "ts", "event_type",
                           F.lit(None).cast("timestamp").alias("p_ts"),
                           F.lit(1).alias("is_event")))
    purchase_side = (ev.filter(F.col("event_type") == "purchase")
                     .select("event_id", "user_id", "ts",
                             F.lit(None).cast("string").alias("event_type"),
                             F.col("ts").alias("p_ts"),
                             F.lit(0).alias("is_event")))
    unioned = events_side.unionByName(purchase_side)
    w_back = (W.partitionBy("user_id")
              .orderBy("ts", "is_event", "event_id")
              .rowsBetween(W.unboundedPreceding, 0))
    w_fwd = (W.partitionBy("user_id")
             .orderBy("ts", F.col("is_event").desc(), "event_id")
             .rowsBetween(0, W.unboundedFollowing))
    carried = (
        unioned
        .withColumn("b_ts", F.last("p_ts", ignorenulls=True).over(w_back))
        .withColumn("f_ts", F.first("p_ts", ignorenulls=True).over(w_fwd))
    )
    d_back = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
    d_fwd = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts"))
    back_wins = (F.col("f_ts").isNull()
                 | (F.col("b_ts").isNotNull() & (d_back <= d_fwd)))
    big = F.lit(9223372036854775807).cast("long")
    return (
        carried.filter((F.col("is_event") == 1)
                       & (F.col("b_ts").isNotNull() | F.col("f_ts").isNotNull()))
        .select(
            "event_id", "user_id", "ts", "event_type",
            F.when(back_wins, F.col("b_ts")).otherwise(F.col("f_ts"))
            .alias("purchase_ts"),
            F.when(back_wins, F.lit("backward")).otherwise(F.lit("forward"))
            .alias("direction"),
            F.least(F.coalesce(d_back, big), F.coalesce(d_fwd, big))
            .cast("long").alias("delta_us"),
        )
    )


@query(
    "winsorize_event_values",
    oracle="""
    WITH c AS (
        SELECT event_type, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL
    ), r AS (
        SELECT event_type, x,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY x, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM c
    ), thr AS (
        SELECT event_type,
               MIN(CASE WHEN rn = CAST(FLOOR(0.05 * (n - 1)) AS BIGINT) + 1
                        THEN x END) AS lo,
               MIN(CASE WHEN rn = CAST(FLOOR(0.95 * (n - 1)) AS BIGINT) + 1
                        THEN x END) AS hi
        FROM r GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT_IF(c.x < t.lo) AS BIGINT) AS n_clipped_low,
           CAST(COUNT_IF(c.x > t.hi) AS BIGINT) AS n_clipped_high,
           CAST(CAST(t.lo AS DOUBLE) / 100.0 AS DOUBLE) AS p05_value,
           CAST(CAST(t.hi AS DOUBLE) / 100.0 AS DOUBLE) AS p95_value,
           CAST(CAST(SUM(GREATEST(t.lo, LEAST(t.hi, c.x))) AS BIGINT)
                AS DOUBLE) / 100.0 AS winsorized_total
    FROM c JOIN thr t ON c.event_type IS NOT DISTINCT FROM t.event_type
    GROUP BY c.event_type, t.lo, t.hi
    """,
)
def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (outlier clipping to the [p05, p95] band) per
    event type — the robust-statistics cleaning step before value
    aggregates that a single fat-finger row would poison.

    Percentiles are NEAREST-RANK (the value at row
    floor(p·(n−1))+1 of the per-type sort), not interpolated:
    interpolation mixes integers through g·(b−a) float arithmetic
    whose last-ulp rounding can differ between engines, while a
    ranked pick is an exact integer — the cents-scaling policy
    extended to order statistics. One shuffle for the rank window;
    the per-type thresholds re-join by broadcast; the clipped sum is
    an exact integer aggregate.

    Null semantics (null_sweep audit): rows with a null value are
    excluded on both engines — clipping is defined over observed
    values — and the threshold re-join is NULL-SAFE so a null
    event_type still forms a winsorized group instead of silently
    vanishing through an equi-join.
    """
    ev = Catalog(spark, sf_dir).events.filter(F.col("value").isNotNull())
    c = ev.select(
        "event_type", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("x"))
    w = W.partitionBy("event_type")
    r = c.select(
        "event_type", "x",
        F.row_number().over(w.orderBy("x", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"))
    k = lambda p: F.floor(F.lit(p) * (F.col("n") - 1)).cast("long") + 1
    thr = r.groupBy(F.col("event_type").alias("et2")).agg(
        F.min(F.when(F.col("rn") == k(0.05), F.col("x"))).alias("lo"),
        F.min(F.when(F.col("rn") == k(0.95), F.col("x"))).alias("hi"))
    clipped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("x")))
    return (
        c.join(F.broadcast(thr),
               F.col("event_type").eqNullSafe(F.col("et2")))
        .groupBy("event_type", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum((F.col("x") < F.col("lo")).cast("long")).alias("n_clipped_low"),
             F.sum((F.col("x") > F.col("hi")).cast("long")).alias("n_clipped_high"),
             F.sum(clipped).alias("wt"))
        .select("event_type", "n", "n_clipped_low", "n_clipped_high",
                (F.col("lo").cast("double") / 100.0).alias("p05_value"),
                (F.col("hi").cast("double") / 100.0).alias("p95_value"),
                (F.col("wt").cast("double") / 100.0).alias("winsorized_total"))
    )


@query(
    "event_value_mad_outliers",
    oracle="""
    WITH c AS (
        SELECT event_type, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL
    ), r1 AS (
        SELECT event_type, x,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY x, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM c
    ), med AS (
        SELECT event_type,
               min(CASE WHEN rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1
                        THEN x END) AS med
        FROM r1 GROUP BY event_type
    ), dev AS (
        SELECT c.event_type, c.x, ABS(c.x - m.med) AS d, c.event_id, m.med
        FROM c JOIN med m
          ON c.event_type IS NOT DISTINCT FROM m.event_type
    ), r2 AS (
        SELECT event_type, x, d, med,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY d, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev
    ), mad AS (
        SELECT event_type,
               min(CASE WHEN rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT) + 1
                        THEN d END) AS mad
        FROM r2 GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(max(d.med) AS DOUBLE) / 100.0 AS median_value,
           CAST(max(m.mad) AS DOUBLE) / 100.0 AS mad_value,
           CAST(COUNT_IF(d.d > 3 * m.mad) AS BIGINT) AS n_outliers,
           CAST(COUNT_IF(d.d > 3 * m.mad) AS DOUBLE) / COUNT(*)
               AS outlier_ratio
    FROM dev d JOIN mad m
      ON d.event_type IS NOT DISTINCT FROM m.event_type
    GROUP BY d.event_type
    """,
)
def event_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type via median absolute
    deviation: a value is an outlier when |x − median| > 3·MAD — the
    robust-statistics alternative to z-scores (a single fat-finger
    row shifts a mean+stddev fence but not a median+MAD fence).

    Both order statistics are NEAREST-RANK picks on exact cents
    (the winsorize rule — no interpolation, no float drift), computed
    by two rank-window passes over the same event_type partitioning:
    median of x, then median of the absolute deviations, then the
    fence counts ride the deviation stream with the per-type MAD
    broadcast back. Integer comparisons decide outliers, so the flag
    is bit-deterministic; the only doubles are the display divisions.
    At 100 TB the two sorted windows per type are the cost — the
    sketch-based alternative (KLL median) drops in when exactness is
    traded for one pass.

    Null semantics (null_sweep audit): null values are excluded on
    both engines (the fence is over observed values); both broadcast
    re-joins are NULL-SAFE so a null event_type keeps its group.
    """
    ev = Catalog(spark, sf_dir).events.filter(F.col("value").isNotNull())
    c = ev.select("event_type", "event_id",
                  F.round(F.col("value") * 100).cast("long").alias("x"))
    w = W.partitionBy("event_type")
    k = lambda p: F.floor(F.lit(p) * (F.col("n") - 1)).cast("long") + 1
    r1 = c.select("event_type", "x",
                  F.row_number().over(w.orderBy("x", "event_id")).alias("rn"),
                  F.count(F.lit(1)).over(w).alias("n"))
    med = r1.groupBy(F.col("event_type").alias("et_m")).agg(
        F.min(F.when(F.col("rn") == k(0.5), F.col("x"))).alias("med"))
    dev = (c.join(F.broadcast(med),
                  F.col("event_type").eqNullSafe(F.col("et_m")))
           .select("event_type", "event_id", "x", "med",
                   F.abs(F.col("x") - F.col("med")).alias("d")))
    r2 = dev.select("event_type", "d",
                    F.row_number().over(w.orderBy("d", "event_id"))
                    .alias("rn"),
                    F.count(F.lit(1)).over(w).alias("n"))
    mad = r2.groupBy(F.col("event_type").alias("et_d")).agg(
        F.min(F.when(F.col("rn") == k(0.5), F.col("d"))).alias("mad"))
    out = (F.col("d") > 3 * F.col("mad")).cast("long")
    return (dev.join(F.broadcast(mad),
                     F.col("event_type").eqNullSafe(F.col("et_d")))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.max("med").cast("double") / 100.0).alias("median_value"),
                 (F.max("mad").cast("double") / 100.0).alias("mad_value"),
                 F.sum(out).alias("n_outliers"),
                 (F.sum(out).cast("double") / F.count(F.lit(1)))
                 .alias("outlier_ratio")))


@query(
    "user_activity_bitmap",
    oracle="""
    WITH mn AS (
        SELECT min(CAST(ts AS DATE)) AS d0 FROM events
    ), offs AS (
        SELECT user_id,
               date_diff('day', d0, CAST(ts AS DATE)) AS off
        FROM events CROSS JOIN mn
        WHERE date_diff('day', d0, CAST(ts AS DATE)) < 64
    ), bitmaps AS (
        SELECT user_id,
               bit_or(CAST(1 AS BIGINT) << CAST(off AS INT)) AS bitmap
        FROM offs GROUP BY user_id
    )
    SELECT CAST(bit_count(bitmap) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM bitmaps GROUP BY 1
    """,
)
def user_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity bitmap over the first 64 days of the corpus,
    rolled up to the engagement histogram (how many users were active
    on exactly N distinct days). Day-presence packs into one BIGINT
    via shiftleft + BIT_OR — the bitmap-index trick: the per-user
    aggregate is a single 8-byte OR instead of a distinct-date set,
    popcount reads the answer, and the same representation supports
    cohort AND/OR algebra (days-active-in-both = bit_count(a & b))
    without touching the event table again.

    Scale: BIT_OR partial-aggregates map-side like any sum — the
    shuffle carries one long per (user, task). 64 days per word is
    the declared window; longer horizons shard into (user, epoch)
    words, staying O(1) per row. Everything is integer — the
    histogram is bit-deterministic.
    """
    ev = Catalog(spark, sf_dir).events
    mn = ev.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    off = F.datediff(F.col("ts").cast("date"), F.col("d0"))
    offs = (ev.crossJoin(F.broadcast(mn))
            .select("user_id", off.alias("off"))
            .filter(F.col("off") < 64))
    bitmaps = (offs.select(
        "user_id",
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(off AS INT))")
        .alias("bit"))
        .groupBy("user_id")
        .agg(F.bit_or("bit").alias("bitmap")))
    return (bitmaps
            .groupBy(F.bit_count("bitmap").cast("long")
                     .alias("n_active_days"))
            .agg(F.count(F.lit(1)).alias("n_users")))


@query(
    "cep_click_purchase_no_error",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id AS purchase_id,
               CAST(ts AS TIMESTAMP) AS purchase_ts
        FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL
    )
    SELECT p.user_id, p.purchase_id, p.purchase_ts
    FROM p
    WHERE EXISTS (
        SELECT 1 FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND CAST(c.ts AS TIMESTAMP) >= p.purchase_ts - INTERVAL 1 HOUR
          AND CAST(c.ts AS TIMESTAMP) < p.purchase_ts
    )
    AND NOT EXISTS (
        SELECT 1 FROM events x
        WHERE x.user_id = p.user_id AND x.event_type = 'error'
          AND CAST(x.ts AS TIMESTAMP) >= p.purchase_ts - INTERVAL 1 HOUR
          AND CAST(x.ts AS TIMESTAMP) < p.purchase_ts
    )
    """,
)
def cep_click_purchase_no_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern: purchases preceded by a
    click within the last hour with NO error in that same hour — the
    MATCH_RECOGNIZE shape (A then B, C absent between) as one
    window pass instead of two correlated subqueries.

    Plan: one (user)-partitioned window ordered by time computes, at
    every purchase, the timestamps of the most recent click and most
    recent error (two last/ignorenulls carries on the SAME window
    frame — one exchange); the pattern predicate is then a pure row
    filter: click within 1h, error absent-or-older-than-the-hour.
    The frame is a RANGE over event-time micros ending at -1, not a
    ROWS frame: the pattern requires *strictly earlier* events, and a
    row frame would leak same-timestamp neighbors in on event_id tie
    order (and a `carried < ts` row filter would wrongly discard
    purchases whose same-ts click shadows an older in-window one).
    The oracle states the same pattern as EXISTS/NOT EXISTS —
    verifying the window rewrite against the declarative form. At
    100 TB the window form wins: the correlated form re-joins the
    fact table per subquery, the carry form scans it once.

    The pattern is keyed by user: anonymous events are excluded on
    both engines — Spark's user partition groups NULL users into one
    pseudo-user whose events "match" each other, while the oracle's
    correlated EXISTS on user equality never matches them
    (null_sweep audit).
    """
    ev = Catalog(spark, sf_dir).events.filter(
        F.col("user_id").isNotNull())
    w = (W.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts")))
         .rangeBetween(W.unboundedPreceding, -1))
    carried = ev.select(
        "user_id", "event_id", "event_type", "ts",
        F.last(F.when(F.col("event_type") == "click", F.col("ts")),
               ignorenulls=True).over(w).alias("last_click_ts"),
        F.last(F.when(F.col("event_type") == "error", F.col("ts")),
               ignorenulls=True).over(w).alias("last_error_ts"))
    hour = F.expr("INTERVAL 1 HOUR")
    ok_click = (F.col("last_click_ts").isNotNull()
                & (F.col("last_click_ts") >= F.col("ts") - hour))
    no_error = (F.col("last_error_ts").isNull()
                | (F.col("last_error_ts") < F.col("ts") - hour))
    return (carried.filter((F.col("event_type") == "purchase")
                           & ok_click & no_error)
            .select("user_id", F.col("event_id").alias("purchase_id"),
                    F.col("ts").alias("purchase_ts")))


@query(
    "cep_purchase_error_absence",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               event_id,
               MIN(CASE WHEN event_type = 'error'
                        THEN CAST(ts AS TIMESTAMP) END)
                   OVER (PARTITION BY user_id
                         ORDER BY CAST(ts AS TIMESTAMP), event_id
                         ROWS BETWEEN 1 FOLLOWING
                         AND UNBOUNDED FOLLOWING) AS next_error_ts
        FROM events WHERE user_id IS NOT NULL
    ), purchases AS (
        SELECT CAST(ts AS DATE) AS day,
               CASE WHEN next_error_ts IS NOT NULL
                         AND next_error_ts <= ts + INTERVAL 1 HOUR
                    THEN 1 ELSE 0 END AS followed_by_error
        FROM seq WHERE event_type = 'purchase'
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(followed_by_error) AS BIGINT) AS n_error_within_1h,
           CAST(COUNT(*) - SUM(followed_by_error) AS BIGINT) AS n_clean
    FROM purchases
    GROUP BY day
    ORDER BY day
    """,
)
def cep_purchase_error_absence(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """ABSENCE pattern detection — the CEP shape
    ``cep_click_purchase_no_error`` doesn't cover: instead of
    matching a sequence that happened, flag whether a FOLLOWING event
    fails to happen in a horizon (purchase NOT followed by an error
    within 1 hour = clean checkout; the complement is the incident
    signal an alerting pipeline pages on). Negation-over-time is the
    classically awkward CEP primitive — a join formulation needs a
    NOT EXISTS per event — but as a window it is one conditional MIN
    over the strictly-following frame: the earliest future error per
    user, compared against the horizon at scan level.

    One keyed exchange (user_id), O(1) frame state (Spark keeps the
    running conditional min, not the row buffer), then a per-day
    rollup. The event_id tiebreak pins same-microsecond ordering on
    both engines. Anonymous events are excluded on both engines —
    without the filter every null-user event lands in ONE pseudo-user
    partition whose purchases alarm on other anonymous users' errors
    (both engines agreed, both were wrong; null_sweep audit).
    """
    ev = Catalog(spark, sf_dir).events.filter(
        F.col("user_id").isNotNull())
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(1, W.unboundedFollowing))
    seq = ev.select(
        "user_id", "event_type", "ts",
        F.min(F.when(F.col("event_type") == "error", F.col("ts")))
        .over(w).alias("next_error_ts"))
    purchases = (seq.filter(F.col("event_type") == "purchase")
                 .select(F.to_date("ts").alias("day"),
                         (F.col("next_error_ts").isNotNull()
                          & (F.col("next_error_ts")
                             <= F.col("ts") + F.expr("INTERVAL 1 HOUR")))
                         .cast("long").alias("followed_by_error")))
    return (purchases.groupBy("day")
            .agg(F.count(F.lit(1)).alias("n_purchases"),
                 F.sum("followed_by_error").alias("n_error_within_1h"),
                 (F.count(F.lit(1)) - F.sum("followed_by_error"))
                 .alias("n_clean"))
            .orderBy("day"))


@query(
    "robust_scale_features",
    oracle="""
    WITH c AS (
        SELECT event_type, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS x
        FROM events WHERE value IS NOT NULL
    ), r AS (
        SELECT event_type, x,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY x, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM c
    ), thr AS (
        SELECT event_type,
               MIN(CASE WHEN rn = CAST(FLOOR(0.25 * (n - 1)) AS BIGINT)
                             + 1 THEN x END) AS q1,
               MIN(CASE WHEN rn = CAST(FLOOR(0.5 * (n - 1)) AS BIGINT)
                             + 1 THEN x END) AS med,
               MIN(CASE WHEN rn = CAST(FLOOR(0.75 * (n - 1)) AS BIGINT)
                             + 1 THEN x END) AS q3
        FROM r GROUP BY event_type
    ), scaled AS (
        SELECT c.event_type, t.med, t.q3 - t.q1 AS iqr,
               ((c.x - t.med) * 1000000
                + 1000000000 * (t.q3 - t.q1)) // (t.q3 - t.q1)
               - 1000000000 AS z_robust_micros
        FROM c JOIN thr t USING (event_type)
        WHERE t.q3 > t.q1
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(any_value(med) AS BIGINT) AS median_cents,
           CAST(any_value(iqr) AS BIGINT) AS iqr_cents,
           CAST(MIN(z_robust_micros) AS BIGINT) AS min_scaled_micros,
           CAST(MAX(z_robust_micros) AS BIGINT) AS max_scaled_micros,
           CAST(COUNT_IF(ABS(z_robust_micros) > 3000000) AS BIGINT)
               AS n_robust_outliers
    FROM scaled
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def robust_scale_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust feature scaling — (x − median) / IQR, the scaler that
    shrugs off the outliers a z-score would let poison μ and σ
    (sklearn's RobustScaler, as a query). Completes the engine's
    scaling trio: min-max (``score_calibration_bins``'s lane),
    z-score (``zscore_event_values``), robust. Quartiles are
    nearest-rank exact picks (the ``winsorize_event_values``
    discipline); the scaled value is integer micros via the
    +K·IQR offset trick, because (x − median) goes negative where
    Spark's div truncates and DuckDB's // floors. Per-type summary:
    scaled range and the |z_robust| > 3 outlier census (the robust
    fence that MAD-based fences approximate).

    One keyed rank window, a per-type threshold aggregate broadcast
    back, one scan-level scaling expression, one rollup.
    """
    ev = Catalog(spark, sf_dir).events
    c = (ev.filter(F.col("value").isNotNull())
         .select("event_type", "event_id",
                 F.round(F.col("value") * 100).cast("long").alias("x")))
    w = W.partitionBy("event_type")
    r = c.select(
        "event_type", "x",
        F.row_number().over(w.orderBy("x", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"))
    k = lambda p: F.floor(F.lit(p) * (F.col("n") - 1)).cast("long") + 1
    thr = r.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == k(0.25), F.col("x"))).alias("q1"),
        F.min(F.when(F.col("rn") == k(0.5), F.col("x"))).alias("med"),
        F.min(F.when(F.col("rn") == k(0.75), F.col("x"))).alias("q3"))
    scaled = (c.join(F.broadcast(thr), "event_type")
              .filter(F.col("q3") > F.col("q1"))
              .withColumn("iqr", F.col("q3") - F.col("q1"))
              .withColumn(
                  "z_robust_micros",
                  F.expr("((x - med) * 1000000 + 1000000000 * iqr)"
                         " div iqr - 1000000000")))
    return (scaled.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.first("med").alias("median_cents"),
                 F.first("iqr").alias("iqr_cents"),
                 F.min("z_robust_micros").alias("min_scaled_micros"),
                 F.max("z_robust_micros").alias("max_scaled_micros"),
                 F.sum((F.abs(F.col("z_robust_micros")) > 3000000)
                       .cast("long")).alias("n_robust_outliers"))
            .orderBy("event_type"))


@query(
    "concurrent_sessions_peak",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                         > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM ordered
    ), s AS (
        SELECT user_id, session_idx,
               min(epoch_us(CAST(ts AS TIMESTAMP))) AS start_us,
               max(epoch_us(CAST(ts AS TIMESTAMP))) + 1800000000 AS end_us
        FROM sess GROUP BY user_id, session_idx
    ), b AS (
        SELECT start_us AS t, 1 AS d FROM s
        UNION ALL
        SELECT end_us AS t, -1 AS d FROM s
    ), g AS (
        SELECT t, SUM(d) AS delta,
               SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS n_starts
        FROM b GROUP BY t
    ), r AS (
        SELECT t, n_starts,
               SUM(delta) OVER (ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS running
        FROM g
    ), m AS (SELECT MAX(running) AS peak FROM r)
    SELECT CAST((SELECT SUM(n_starts) FROM r) AS BIGINT) AS n_sessions,
           CAST(m.peak AS BIGINT) AS peak_concurrent,
           CAST(MIN(r.t) AS BIGINT) AS peak_at_us
    FROM r, m WHERE r.running = m.peak GROUP BY m.peak
    """,
)
def concurrent_sessions_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency by sweep line — "how many sessions were open
    at once, and when?", the capacity-planning readout behind license
    sizing and surge alerts. Sessions come from the shared 30-minute
    inactivity rule (each extended 30 minutes past its last event,
    matching ``session_window`` semantics); every session emits a +1
    boundary at its start and a -1 at its end, boundaries aggregate to
    INSTANT grain (delta, n_starts), and one running sum ordered by
    instant gives the active count after each instant. Processing ends
    before starts within an instant means per-instant max is
    max(prev, running-after) — so the global peak is simply
    MAX(running) over instant rows, and the reported instant is the
    earliest achieving it (struct-max over (running, -t), one
    aggregate, no second pass).

    Scale: events shuffle once on user_id (session assignment), then
    the sweep runs over boundary rows at SESSION-INSTANT grain — two
    orders of magnitude smaller than events. The single ordered
    running sum is the textbook two-level prefix-sum at 100 TB
    (per-partition partials + broadcast offsets); at instant grain a
    single-partition window is the honest local plan and is the same
    shape the other day/instant-grain walks use.
    """
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = (F.unix_micros(F.col("ts"))
              - F.lag(F.unix_micros(F.col("ts"))).over(w))
    sess_idx = F.sum(
        F.when(gap_us > 30 * 60 * 1_000_000, 1).otherwise(0)
    ).over(w.rowsBetween(W.unboundedPreceding, 0))
    s = (ev.withColumn("session_idx", sess_idx)
         .groupBy("user_id", "session_idx")
         .agg(F.min(F.unix_micros(F.col("ts"))).alias("start_us"),
              (F.max(F.unix_micros(F.col("ts"))) + 1_800_000_000)
              .alias("end_us")))
    # Both boundaries from ONE pass over the session relation (a
    # union of two selects would recompute the whole sessionize
    # pipeline — and rescan events — once per side).
    b = s.select(F.explode(F.array(
        F.struct(F.col("start_us").alias("t"), F.lit(1).alias("d")),
        F.struct(F.col("end_us").alias("t"), F.lit(-1).alias("d"))))
        .alias("bd")).select("bd.t", "bd.d")
    g = (b.groupBy("t")
         .agg(F.sum("d").alias("delta"),
              F.sum(F.when(F.col("d") == 1, 1).otherwise(0))
              .alias("n_starts")))
    r = g.withColumn(
        "running",
        F.sum("delta").over(
            W.orderBy("t").rowsBetween(W.unboundedPreceding, 0)))
    # No sessions -> no peak ROW (the oracle's grouped tail yields
    # nothing over an empty relation, the global agg here yields one
    # all-NULL row — the empty_sweep class). n_sessions is NULL only
    # in that zero-input case, so the filter never drops real output.
    return (r.agg(F.sum("n_starts").alias("n_sessions"),
                  F.max(F.struct(F.col("running"), (-F.col("t")).alias("negt")))
                  .alias("m"))
            .select(F.col("n_sessions").cast("long").alias("n_sessions"),
                    F.col("m.running").cast("long").alias("peak_concurrent"),
                    (-F.col("m.negt")).cast("long").alias("peak_at_us"))
            .where(F.col("n_sessions").isNotNull()))


@query(
    "session_path_markov",
    oracle="""
    WITH trans AS (
        SELECT LAG(event_type) OVER w AS from_type,
               event_type AS to_type,
               epoch_us(CAST(ts AS TIMESTAMP))
                   - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), edges AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM trans
        WHERE from_type IS NOT NULL AND gap_us <= 1800000000
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY from_type)
                AS BIGINT) AS prob_micros
    FROM edges
    ORDER BY from_type, to_type
    """,
)
def session_path_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over in-session event
    paths — "after a click, what happens next, with what
    probability?", the model behind next-action prediction and
    funnel-leak diagnosis. A transition is two consecutive events of
    one user separated by at most the 30-minute session gap (the
    shared sessionize rule: crossing the gap starts a new session,
    not a transition). Conditional probabilities are floor-divided
    integer micros over the from-state's outgoing total, so every
    cell is exact.

    One shuffle on user_id for the lag walk, then the edge aggregate
    collapses to |event_types|^2 rows — the transition matrix is
    metadata-sized at any corpus scale, and the normalizing window
    runs on those few rows.
    """
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = (F.unix_micros(F.col("ts"))
              - F.lag(F.unix_micros(F.col("ts"))).over(w))
    edges = (ev.select(F.lag("event_type").over(w).alias("from_type"),
                       F.col("event_type").alias("to_type"),
                       gap_us.alias("gap_us"))
             .filter(F.col("from_type").isNotNull()
                     & (F.col("gap_us") <= 30 * 60 * 1_000_000))
             .groupBy("from_type", "to_type")
             .agg(F.count(F.lit(1)).alias("n")))
    tot = F.sum("n").over(W.partitionBy("from_type"))
    return (edges.withColumn("_tot", tot)
            .select("from_type", "to_type", "n",
                    F.expr("n * 1000000L div _tot").alias("prob_micros"))
            .orderBy("from_type", "to_type"))


@query(
    "events_asof_join_tolerance",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events
        WHERE event_type <> 'signup' AND user_id IS NOT NULL
    ), s AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events
        WHERE event_type = 'signup' AND user_id IS NOT NULL
    ), matched AS (
        SELECT e.event_id, e.user_id, e.ts, e.event_type,
               s.ts AS signup_ts, s.event_id AS signup_event_id
        FROM e ASOF LEFT JOIN s
          ON e.user_id = s.user_id AND e.ts >= s.ts
    )
    SELECT event_id, user_id, ts, event_type,
           CASE WHEN signup_ts >= ts - INTERVAL 7 DAY
                THEN signup_ts END AS signup_ts,
           CASE WHEN signup_ts >= ts - INTERVAL 7 DAY
                THEN signup_event_id END AS signup_event_id,
           CAST(CASE WHEN signup_ts IS NOT NULL
                      AND signup_ts < ts - INTERVAL 7 DAY
                     THEN 1 ELSE 0 END AS BIGINT) AS stale_dropped
    FROM matched
    """,
)
def events_asof_join_tolerance(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS TOLERANCE — the production variant
    the plain as-of family omits: a match older than 7 days is not a
    match (a quote, rate, or attribution credit goes stale), so the
    carried signup is kept only inside the tolerance window, nulled
    out beyond it, and the drop is FLAGGED (``stale_dropped``) so the
    pipeline can monitor how much of its join surface is aging out.
    Same union-tag-and-carry skeleton as ``events_asof_join`` (one
    user_id shuffle, no range explosion); the tolerance is a scan-
    level predicate on the carried column — zero extra plan cost.
    """
    # As-of joins are keyed by user; rows without the key cannot
    # match (oracle ASOF ON user equality) and are excluded on both
    # engines (null_sweep audit).
    ev = Catalog(spark, sf_dir).events.filter(
        F.col("user_id").isNotNull())
    events_side = (ev.filter(F.col("event_type") != "signup")
                   .select("event_id", "user_id", "ts", "event_type",
                           F.lit(None).cast("timestamp").alias("s_ts"),
                           F.lit(None).cast("long").alias("s_id"),
                           F.lit(1).alias("is_event")))
    signup_side = (ev.filter(F.col("event_type") == "signup")
                   .select("event_id", "user_id", "ts",
                           F.lit(None).cast("string").alias("event_type"),
                           F.col("ts").alias("s_ts"),
                           F.col("event_id").alias("s_id"),
                           F.lit(0).alias("is_event")))
    unioned = events_side.unionByName(signup_side)
    w = (W.partitionBy("user_id")
         .orderBy("ts", "is_event", "event_id")
         .rowsBetween(W.unboundedPreceding, 0))
    carried = (
        unioned
        .withColumn("signup_ts", F.last("s_ts", ignorenulls=True).over(w))
        .withColumn("signup_event_id",
                    F.last("s_id", ignorenulls=True).over(w)))
    fresh = F.col("signup_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAY")
    return (carried.filter(F.col("is_event") == 1)
            .select("event_id", "user_id", "ts", "event_type",
                    F.when(fresh, F.col("signup_ts")).alias("signup_ts"),
                    F.when(fresh, F.col("signup_event_id"))
                    .alias("signup_event_id"),
                    (F.col("signup_ts").isNotNull() & ~fresh)
                    .cast("long").alias("stale_dropped")))


@query(
    "dq_freshness_lag_audit",
    oracle="""
    WITH per_type AS (
        SELECT event_type,
               MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS max_ts_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type
    ), g AS (
        SELECT MAX(max_ts_us) AS global_max_us FROM per_type
    )
    SELECT event_type, n_events,
           CAST(max_ts_us AS BIGINT) AS max_ts_us,
           CAST(g.global_max_us - max_ts_us AS BIGINT) AS lag_us,
           CAST((g.global_max_us - max_ts_us
                 <= 21600000000) AS BIGINT) AS fresh_ok
    FROM per_type, g
    ORDER BY event_type
    """,
)
def dq_freshness_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-freshness audit — the first page of every data-ops
    runbook: per event type, the newest record's timestamp, its lag
    behind the newest record ANYWHERE in the table, and a 6-hour SLA
    flag. A feed whose max-ts trails the global frontier by hours is
    stalled upstream even though rows keep arriving elsewhere; at
    100 TB this is a footer-statistics query (MAX over a timestamp
    rides parquet column stats), so the audit costs ~zero I/O.
    Exact integer microseconds throughout; the 1-row global frontier
    broadcasts back over the per-type rows.
    """
    ev = Catalog(spark, sf_dir).events
    per_type = (ev.groupBy("event_type")
                .agg(F.max(F.unix_micros(F.col("ts"))).alias("max_ts_us"),
                     F.count(F.lit(1)).alias("n_events")))
    g = per_type.agg(F.max("max_ts_us").alias("global_max_us"))
    lag = F.col("global_max_us") - F.col("max_ts_us")
    return (per_type.crossJoin(F.broadcast(g))
            .select("event_type", "n_events",
                    F.col("max_ts_us").cast("long").alias("max_ts_us"),
                    lag.cast("long").alias("lag_us"),
                    (lag <= 6 * 3600 * 1_000_000).cast("long")
                    .alias("fresh_ok"))
            .orderBy("event_type"))


@query(
    "cart_abandonment_daily",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                         > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_type,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                   AS session_idx
        FROM ordered
    ), per_session AS (
        SELECT user_id, session_idx,
               CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) AS day,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS has_click,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS has_purchase
        FROM sess GROUP BY user_id, session_idx
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(has_click) AS BIGINT) AS n_intent,
           CAST(SUM(CASE WHEN has_click = 1 AND has_purchase = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned,
           CAST(CASE WHEN SUM(has_click) > 0 THEN
                SUM(CASE WHEN has_click = 1 AND has_purchase = 0
                         THEN 1 ELSE 0 END) * 1000000 // SUM(has_click)
                ELSE 0 END AS BIGINT) AS abandonment_micros
    FROM per_session
    GROUP BY day
    ORDER BY day
    """,
)
def cart_abandonment_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cart abandonment by day — the conversion-leak KPI: a session
    that shows intent (a click) but ends without a purchase is
    abandoned; the daily rate is abandoned/intent sessions in
    floor-divided integer micros. Sessions come from the shared
    30-minute inactivity rule and are attributed to the day they
    START (a midnight-straddling session counts once). Composes the
    sessionize walk with two conditional-max flags per session — one
    user-keyed exchange, then day-grain aggregation; the same
    skeleton extends to any funnel-within-session definition.
    """
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = (F.unix_micros(F.col("ts"))
              - F.lag(F.unix_micros(F.col("ts"))).over(w))
    sess_idx = F.sum(
        F.when(gap_us > 30 * 60 * 1_000_000, 1).otherwise(0)
    ).over(w.rowsBetween(W.unboundedPreceding, 0))
    per_session = (
        ev.withColumn("session_idx", sess_idx)
        .groupBy("user_id", "session_idx")
        .agg(F.min(F.col("ts").cast("date")).alias("day"),
             F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
             .alias("has_click"),
             F.max(F.when(F.col("event_type") == "purchase", 1)
                   .otherwise(0)).alias("has_purchase")))
    abandoned = F.sum(
        F.when((F.col("has_click") == 1) & (F.col("has_purchase") == 0), 1)
        .otherwise(0))
    return (per_session.groupBy("day")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum("has_click").alias("n_intent"),
                 abandoned.alias("n_abandoned"))
            .select("day", "n_sessions",
                    F.col("n_intent").cast("long").alias("n_intent"),
                    F.col("n_abandoned").cast("long").alias("n_abandoned"),
                    F.when(F.col("n_intent") > 0,
                           F.expr("n_abandoned * 1000000L div n_intent"))
                    .otherwise(F.lit(0)).cast("long")
                    .alias("abandonment_micros"))
            .orderBy("day"))


@query(
    "events_session_entropy",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                         - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                         > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, event_type,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                   AS session_idx
        FROM ordered
    ), counts AS (
        SELECT user_id, session_idx, event_type,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM sess GROUP BY user_id, session_idx, event_type
    ), terms AS (
        SELECT user_id, session_idx, cnt,
               CAST(ROUND((-((cnt / n) * LN(cnt / n))) * 1e9) AS BIGINT)
                   AS nano
        FROM (SELECT *, CAST(SUM(cnt) OVER (PARTITION BY user_id,
                                            session_idx) AS BIGINT) AS n
              FROM counts) t
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           CAST(SUM(cnt) AS BIGINT) AS n_events,
           CAST(SUM(nano) AS BIGINT) AS h_nanounits
    FROM terms GROUP BY user_id, session_idx
    """,
)
def events_session_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session event-type entropy — how varied a session's
    behavior is (one-action sessions score 0; uniform mixes score
    ln(k)) — the engagement-diversity feature behind bot filtering
    and intent models. Sessionization is the shared 30-minute-gap
    rule.

    Exactness: H = -sum p*ln(p) is order-dependent in floats, so each
    term is computed through an IDENTICAL expression dag in both
    engines and pre-rounded to integer NANO-UNITS; the per-session
    sum is then an exact integer add under any accumulation order
    (the pagerank fixed-point precedent). Output is h_nanounits
    BIGINT — exactly 1e9 * H as both engines compute it.

    One shuffle on user_id for the session walk; the entropy runs on
    (session x event_type) grain, a bounded multiple of the session
    count; state per partition stays user-bounded at 100 TB.
    """
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = (F.unix_micros(F.col("ts"))
              - F.lag(F.unix_micros(F.col("ts"))).over(w))
    sess = (ev.withColumn("new_session",
                          F.when(gap_us > 30 * 60 * 1_000_000, 1)
                          .otherwise(0))
            .withColumn("session_idx",
                        F.sum("new_session")
                        .over(w.rowsBetween(W.unboundedPreceding, 0))))
    counts = (sess.groupBy("user_id", "session_idx", "event_type")
              .agg(F.count(F.lit(1)).alias("cnt")))
    n = (F.sum("cnt").over(W.partitionBy("user_id", "session_idx"))
         .cast("long"))
    p = F.col("cnt") / F.col("n")
    nano = F.round((-(p * F.log(p))) * F.lit(1.0e9)).cast("long")
    return (counts.withColumn("n", n)
            .withColumn("nano", nano)
            .groupBy("user_id",
                     F.col("session_idx").cast("long").alias("session_idx"))
            .agg(F.sum("cnt").cast("long").alias("n_events"),
                 F.sum("nano").cast("long").alias("h_nanounits")))


@query(
    "events_pattern_funnel_strict_order",
    oracle="""
    WITH w1 AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
               MIN(CASE WHEN event_type = 'signup'
                        THEN CAST(ts AS TIMESTAMP) END)
                   OVER (PARTITION BY user_id) AS signup_ts
        FROM events
    ), w2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > signup_ts
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS click_ts
        FROM w1
    ), w3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > click_ts
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS purchase_ts
        FROM w2
    )
    SELECT user_id, MIN(signup_ts) AS signup_ts,
           MIN(click_ts) AS click_ts, MIN(purchase_ts) AS purchase_ts,
           CAST(CASE WHEN MIN(purchase_ts) IS NOT NULL
                     THEN 1 ELSE 0 END AS BIGINT) AS completed
    FROM w3 GROUP BY user_id
    """,
)
def events_pattern_funnel_strict_order(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """Strict-ordered signup -> click -> purchase funnel by SEQUENTIAL
    matching: the click must strictly follow the user's first signup,
    and the purchase must strictly follow THAT click — the
    MATCH_RECOGNIZE-style pattern, distinct from the global-firsts
    funnel (funnel_signup_click_purchase), which admits a purchase
    that precedes the matched click. Implemented as a window carry
    replay: each step's earliest qualifying timestamp is a
    conditional MIN over the user partition referencing the previous
    step's carry.

    All three window passes share one user_id partitioning — a single
    exchange, three Window operators, then the per-user collapse
    reuses the same partitioning. No self-joins, no per-user state
    beyond three timestamps at 100 TB.
    """
    ev = Catalog(spark, sf_dir).events
    wp = W.partitionBy("user_id")
    step1 = ev.withColumn(
        "signup_ts",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts")))
        .over(wp))
    step2 = step1.withColumn(
        "click_ts",
        F.min(F.when((F.col("event_type") == "click")
                     & (F.col("ts") > F.col("signup_ts")), F.col("ts")))
        .over(wp))
    step3 = step2.withColumn(
        "purchase_ts",
        F.min(F.when((F.col("event_type") == "purchase")
                     & (F.col("ts") > F.col("click_ts")), F.col("ts")))
        .over(wp))
    return (step3.groupBy("user_id")
            .agg(F.min("signup_ts").alias("signup_ts"),
                 F.min("click_ts").alias("click_ts"),
                 F.min("purchase_ts").alias("purchase_ts"))
            .withColumn("completed",
                        F.when(F.col("purchase_ts").isNotNull(), 1)
                        .otherwise(0).cast("long")))


@query(
    "survival_km_signup_to_purchase",
    oracle="""
    WITH w1 AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
               MIN(CASE WHEN event_type = 'signup'
                        THEN CAST(ts AS TIMESTAMP) END)
                   OVER (PARTITION BY user_id) AS t0
        FROM events WHERE user_id IS NOT NULL
    ), w2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t0
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t1
        FROM w1
    ), subj AS (
        SELECT user_id, MIN(t0) AS t0, MIN(t1) AS t1
        FROM w2 WHERE t0 IS NOT NULL GROUP BY user_id
    ), dur AS (
        SELECT CASE WHEN t1 IS NOT NULL
                     AND (epoch_us(t1) - epoch_us(t0)) // 3600000000 < 72
                    THEN (epoch_us(t1) - epoch_us(t0)) // 3600000000
                    ELSE 72 END AS t,
               CASE WHEN t1 IS NOT NULL
                     AND (epoch_us(t1) - epoch_us(t0)) // 3600000000 < 72
                    THEN 1 ELSE 0 END AS observed
        FROM subj
    ), grain AS (
        SELECT CAST(t AS BIGINT) AS t,
               CAST(SUM(observed) AS BIGINT) AS d_t,
               CAST(SUM(1 - observed) AS BIGINT) AS c_t
        FROM dur GROUP BY t
    ), risk AS (
        SELECT t, d_t, c_t,
               CAST(SUM(d_t + c_t) OVER () AS BIGINT)
                 - CAST(COALESCE(SUM(d_t + c_t) OVER (
                       ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS BIGINT)
                   AS n_t
        FROM grain
    ), lane AS (
        SELECT t, d_t, c_t, n_t,
               CASE WHEN n_t > d_t AND d_t > 0
                    THEN CAST(ROUND(LN((n_t - d_t) / n_t) * 1e9) AS BIGINT)
                    WHEN d_t = 0 THEN 0 END AS step_nanos
        FROM risk
    )
    SELECT t, d_t, c_t, n_t,
           CAST(SUM(step_nanos) OVER (ORDER BY t) AS BIGINT)
               AS log_surv_nanos
    FROM lane
    """,
)
def survival_km_signup_to_purchase(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-from-signup-to-first-
    purchase at hour grain, administratively right-censored at 72
    hours (the horizon makes BOTH lanes non-vacuous on the shipped
    data: ~25% of subjects censor at every SF — checked at design
    time). The survival estimate ships in LOG space as exact integer
    nano-units: each factor ln(1 - d_t/n_t) is one fixed float dag
    pre-rounded to nanos (the events_session_entropy precedent), the
    cumulative product becomes an exact integer cumulative sum, and
    S(t) = exp(log_surv_nanos/1e9) is the caller's single op. A
    terminal everyone-events step (n_t == d_t, S hits exactly 0) has
    no finite log and carries a NULL step, which the NULL-skipping
    cumulative sum holds at the last positive value — documented
    convention, identical on both engines.

    Durations are integer MICROSECOND differences floor-divided to
    hours: DuckDB's date_diff counts boundary crossings while Spark's
    timestampdiff counts elapsed units, so neither is shared —
    epoch-micros arithmetic is (found at design time). One events
    scan (the strict-funnel window chain), then everything runs on
    the hour-grain table: <=73 rows at any corpus scale.
    """
    ev = Catalog(spark, sf_dir).events.filter(F.col("user_id").isNotNull())
    wp = W.partitionBy("user_id")
    t0 = F.min(F.when(F.col("event_type") == "signup",
                      F.col("ts"))).over(wp)
    w1 = ev.withColumn("t0", t0)
    t1 = F.min(F.when((F.col("event_type") == "purchase")
                      & (F.col("ts") > F.col("t0")),
                      F.col("ts"))).over(wp)
    subj = (w1.withColumn("t1", t1)
            .filter(F.col("t0").isNotNull())
            .groupBy("user_id")
            .agg(F.min("t0").alias("t0"), F.min("t1").alias("t1")))
    hours = F.expr("(unix_micros(t1) - unix_micros(t0)) div 3600000000")
    within = F.col("t1").isNotNull() & (hours < 72)
    dur = subj.select(
        F.when(within, hours).otherwise(F.lit(72)).alias("t"),
        F.when(within, 1).otherwise(0).alias("observed"))
    grain = (dur.groupBy(F.col("t").cast("long").alias("t"))
             .agg(F.sum("observed").cast("long").alias("d_t"),
                  F.sum(F.lit(1) - F.col("observed")).cast("long")
                  .alias("c_t")))
    wall = (W.partitionBy()
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    before = (W.orderBy("t")
              .rowsBetween(W.unboundedPreceding, -1))
    risk = grain.select(
        "t", "d_t", "c_t",
        (F.sum(F.col("d_t") + F.col("c_t")).over(wall).cast("long")
         - F.coalesce(F.sum(F.col("d_t") + F.col("c_t")).over(before),
                      F.lit(0)).cast("long")).alias("n_t"))
    ratio = (F.col("n_t") - F.col("d_t")) / F.col("n_t")
    step = (F.when((F.col("n_t") > F.col("d_t")) & (F.col("d_t") > 0),
                   F.round(F.log(ratio) * F.lit(1.0e9)).cast("long"))
            .when(F.col("d_t") == 0, F.lit(0)))
    cum = W.orderBy("t")
    return (risk.withColumn("step_nanos", step)
            .select("t", "d_t", "c_t", "n_t",
                    F.sum("step_nanos").over(cum).cast("long")
                    .alias("log_surv_nanos")))
