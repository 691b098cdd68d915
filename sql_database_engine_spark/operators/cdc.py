"""CDC / warehouse-maintenance patterns: MERGE-style upsert and SCD2
history, emulated with pure DataFrame ops (no Delta/Iceberg jars in
this build — the guide's anti-join + union + window recipe).

At scale both are one shuffle on the merge key; the SCD2 window pass
reuses the same partitioning. With a table format present, `merge_`
becomes MERGE INTO and the plans below are exactly what the format's
engine executes underneath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..catalog import Catalog
from . import query

#: Split point: events before this instant form the base state,
#: events after it are the incoming change stream. Near the end of
#: the fixture's Jan 1-30 event horizon, chosen so the latest-state
#: keys split ~60/40 updated/base (measured). The original
#: 2024-02-01 value lay PAST the horizon, so every "update"/
#: "changed" branch in the split-based operators was silently
#: vacuous (was_updated always 0, table diffs all-unchanged); both
#: engines agreed on the vacuous answer, so only a value inspection
#: caught it (round 4).
_SPLIT = "2024-01-29 00:00:00"


@query(
    "merge_upsert_latest_state",
    oracle=f"""
    WITH ranked AS (
        SELECT user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '{_SPLIT}'
                    THEN 1 ELSE 0 END AS from_update
        FROM events
    )
    SELECT user_id, event_type, value AS latest_value, ts AS latest_ts,
           CAST(from_update AS INT) AS was_updated
    FROM ranked WHERE rn = 1
    """,
)
def merge_upsert_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert) emulation: a base state table (events < split)
    merged with a change batch (events >= split); the newest row per
    (user_id, event_type) wins, flagged with whether an update
    replaced the base row.

    Plan: tag both sides, union, one window argmax on the merge key —
    the standard no-table-format upsert. A true MERGE INTO produces
    the same shuffle + dedup underneath."""
    ev = Catalog(spark, sf_dir).events
    split = F.lit(_SPLIT).cast("timestamp")
    tagged = ev.select(
        "user_id", "event_type", "value", "ts", "event_id",
        F.when(F.col("ts") >= split, 1).otherwise(0).alias("from_update"))
    w = (W.partitionBy("user_id", "event_type")
         .orderBy(F.col("ts").desc(), F.col("event_id").desc()))
    return (
        tagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type",
                F.col("value").alias("latest_value"),
                F.col("ts").alias("latest_ts"),
                F.col("from_update").cast("int").alias("was_updated"))
    )


@query(
    "scd2_user_value_history",
    oracle="""
    SELECT user_id, event_id AS version_id,
           CAST(ts AS TIMESTAMP) AS valid_from,
           LEAD(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
           value,
           CAST(CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS INT)
               AS is_current
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: each change becomes a versioned row
    with [valid_from, valid_to) derived from the next change via
    lead(); the open-ended row is flagged current. One shuffle on the
    dimension key; appending tomorrow's changes only rewrites each
    key's last row."""
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("version_id"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            "value",
            F.when(F.lead("ts").over(w).isNull(), 1).otherwise(0)
            .cast("int").alias("is_current"),
        )
    )


@query(
    "cdc_apply_deletes",
    oracle=f"""
    WITH changes AS (
        SELECT user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts,
               event_id,
               CASE WHEN event_type = 'click' AND value < 5.0 THEN 'D'
                    ELSE 'U' END AS op
        FROM events
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM changes
    )
    SELECT user_id, event_type, value AS latest_value, ts AS latest_ts
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-feed application WITH delete handling — the part that
    separates a real CDC sink from an upsert toy: each change carries
    an op (U upsert / D delete; here derived deterministically from
    the row so the oracle can derive the same), the newest change per
    key wins, and a key whose newest change is a delete disappears
    from the state. Same single-shuffle window-argmax plan as the
    upsert; the delete is a post-argmax filter, not a second pass.
    With a table format this is MERGE ... WHEN MATCHED AND op = 'D'
    THEN DELETE."""
    ev = Catalog(spark, sf_dir).events
    changes = ev.select(
        "user_id", "event_type", "value", "ts", "event_id",
        F.when((F.col("event_type") == "click") & (F.col("value") < 5.0), "D")
        .otherwise("U").alias("op"))
    w = (W.partitionBy("user_id", "event_type")
         .orderBy(F.col("ts").desc(), F.col("event_id").desc()))
    return (
        changes.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("user_id", "event_type",
                F.col("value").alias("latest_value"),
                F.col("ts").alias("latest_ts"))
    )


@query(
    "table_diff_user_state",
    oracle=f"""
    WITH ranked_old AS (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '{_SPLIT}'
    ), old AS (
        SELECT user_id, event_type, value FROM ranked_old WHERE rn = 1
    ), ranked_new AS (
        SELECT user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ), new_ AS (
        SELECT user_id, event_type, value FROM ranked_new WHERE rn = 1
    )
    SELECT n.event_type,
           CAST(COUNT_IF(o.user_id IS NULL) AS BIGINT) AS n_added,
           CAST(COUNT_IF(o.user_id IS NOT NULL
                AND CAST(ROUND(n.value * 100) AS BIGINT)
                    <> CAST(ROUND(o.value * 100) AS BIGINT)) AS BIGINT)
               AS n_changed,
           CAST(COUNT_IF(o.user_id IS NOT NULL
                AND CAST(ROUND(n.value * 100) AS BIGINT)
                    = CAST(ROUND(o.value * 100) AS BIGINT)) AS BIGINT)
               AS n_unchanged
    FROM new_ n
    LEFT JOIN old o ON o.user_id = n.user_id
                   AND o.event_type = n.event_type
    GROUP BY n.event_type
    """,
)
def table_diff_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed table diff between two versions of the latest-state
    table: the state as of the CDC split instant vs the state after
    the full history — per event_type, how many keys were added,
    changed, or unchanged. The audit you run after any MERGE/backfill
    ("what did that batch actually do?"), and the generic two-
    snapshot diff when pointed at snapshot reads (sources/snapshots
    supplies time travel).

    One full-outer-shaped comparison: both versions reduce to latest-
    per-key with the same window argmax, then a single LEFT join on
    the key classifies every key (removal is impossible in an append-
    only feed, so left covers the space; value equality compares
    exact cents). Both window passes and the join share the
    (user_id, event_type) partitioning — one logical shuffle.
    """
    ev = Catalog(spark, sf_dir).events
    split = F.lit(_SPLIT).cast("timestamp")
    w = (W.partitionBy("user_id", "event_type")
         .orderBy(F.col("ts").desc(), F.col("event_id").desc()))

    def latest(df: DataFrame) -> DataFrame:
        return (df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("user_id", "event_type",
                        F.round(F.col("value") * 100).cast("long")
                        .alias("cents")))

    old = latest(ev.filter(F.col("ts") < split)).select(
        F.col("user_id").alias("o_uid"),
        F.col("event_type").alias("o_type"),
        F.col("cents").alias("o_cents"))
    new = latest(ev)
    joined = new.join(
        old, (new.user_id == old.o_uid) & (new.event_type == old.o_type),
        "left")
    return (joined.groupBy("event_type")
            .agg(F.sum(F.col("o_uid").isNull().cast("long")).alias("n_added"),
                 F.sum((F.col("o_uid").isNotNull()
                        & (F.col("cents") != F.col("o_cents")))
                       .cast("long")).alias("n_changed"),
                 F.sum((F.col("o_uid").isNotNull()
                        & (F.col("cents") == F.col("o_cents")))
                       .cast("long")).alias("n_unchanged")))


@query(
    "ivm_append_join_view",
    oracle="""
    SELECT o_orderkey, o_custkey, c_mktsegment, o_totalprice,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def ivm_append_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a fact-dim join view under
    append-only changes: V = orders |><| customer is materialized for
    the base region (o_orderdate < 1999), then the delta region is
    folded in with the delta-join rule dV = dOrders |><| customer —
    the stored view is READ BACK, never recomputed, and only the
    delta joins. This is how a warehouse keeps a wide denormalized
    view fresh without re-running the full join per batch: at 100 TB
    the nightly delta is orders-of-magnitude smaller than the view.

    The maintained result (stored ∪ delta-join) must equal the
    from-scratch join — which is exactly what the oracle computes, so
    the driver verifies the maintenance identity end-to-end.
    tests/test_engine.py additionally pins that the second phase's
    plan scans the stored parquet, not the base fact rows.
    """

    o = Catalog(spark, sf_dir).orders
    c = Catalog(spark, sf_dir).customer.select("c_custkey", "c_mktsegment")
    cols = ("o_orderkey", "o_custkey", "c_mktsegment", "o_totalprice",
            "o_orderdate")
    split = F.lit("1999-01-01").cast("timestamp")
    from ..scratch import scratch_dir
    scratch = scratch_dir("ivm", sf_dir)
    # The delta region is the COMPLEMENT of the base predicate, not
    # its naive negation: `>= split` alone strands null-dated orders
    # in NEITHER region and the maintained view silently loses them
    # (null_sweep audit — 42 rows vanished at sf0.001). Base ∪ delta
    # must partition the table.
    base = (o.filter(F.col("o_orderdate") < split)
            .join(c, o.o_custkey == c.c_custkey).select(*cols))
    base.write.mode("overwrite").parquet(scratch)
    stored = spark.read.parquet(scratch)
    delta = (o.filter((F.col("o_orderdate") >= split)
                      | F.col("o_orderdate").isNull())
             .join(c, o.o_custkey == c.c_custkey).select(*cols))
    return stored.unionByName(delta)


@query(
    "ivm_append_agg_view",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 100.0 AS total_revenue
    FROM orders GROUP BY o_orderpriority
    """,
)
def ivm_append_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of an AGGREGATE view (the summing-table
    pattern): per-priority order counts and exact revenue are
    materialized for the base region as PARTIALS (count + cents sum),
    the delta region aggregates separately, and the refreshed view is
    the key-wise SUM of stored and delta partials — never a rescan of
    the base facts. This is the ClickHouse SummingMergeTree /
    materialized-aggregate pattern on DataFrames: counts and integer
    cent sums are self-mergeable, so refresh cost tracks the delta.

    The maintained result must equal the from-scratch aggregate —
    exactly what the oracle computes. Exact-money policy end to end:
    partials store integer cents; the double division happens once,
    after the final merge.
    """

    from ..functions.exact import cents
    o = Catalog(spark, sf_dir).orders
    split = F.lit("1999-01-01").cast("timestamp")
    from ..scratch import scratch_dir
    scratch = scratch_dir("ivm_agg", sf_dir)

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).alias("cents"))

    # Complement split (see ivm_append_join_view): null-dated orders
    # belong to the delta region, not to neither.
    partials(o.filter(F.col("o_orderdate") < split)) \
        .write.mode("overwrite").parquet(scratch)
    stored = spark.read.parquet(scratch)
    delta = partials(o.filter((F.col("o_orderdate") >= split)
                              | F.col("o_orderdate").isNull()))
    return (stored.unionByName(delta)
            .groupBy("o_orderpriority")
            .agg(F.sum("n_orders").alias("n_orders"),
                 (F.sum("cents").cast("double") / 100.0)
                 .alias("total_revenue")))


@query(
    "scd2_point_in_time_join",
    oracle="""
    WITH dim AS (
        SELECT user_id, event_id AS version_id,
               CAST(ts AS TIMESTAMP) AS valid_from,
               LEAD(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
               value
        FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT c.user_id, c.event_id AS click_id,
           CAST(c.ts AS TIMESTAMP) AS click_ts,
           d.version_id, d.value AS value_at_click
    FROM events c LEFT JOIN dim d
      ON c.user_id = d.user_id
     AND CAST(c.ts AS TIMESTAMP) >= d.valid_from
     AND (d.valid_to IS NULL OR CAST(c.ts AS TIMESTAMP) < d.valid_to)
    WHERE c.event_type = 'click' AND c.user_id IS NOT NULL
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension join — the query SCD2 exists FOR: each
    fact (click) joins the dimension VERSION that was valid at the
    fact's own timestamp, not today's row (joining current state is
    the classic time-travel bug in training-data builds: it leaks
    future attribute values into past examples).

    Plan: NOT the declarative interval join the oracle states (per-key
    interval theta joins explode at scale) — the union-carry as-of
    shape instead: version rows and fact rows union into one
    user-partitioned (ts, tag, id) ordering, a last/ignorenulls carry
    pins the in-effect version on every fact row, one exchange total.
    Versions sort before facts at equal timestamps (tag 0 < 1), which
    IS the [valid_from, valid_to) half-open semantics; among
    same-timestamp versions the highest event_id carries, matching
    the lead()-defined intervals where earlier ones are empty. Facts
    before a user's first version keep NULL — exactly the oracle's
    left join.
    """
    # The dimension is keyed by entity (user); rows without the key
    # can neither version nor look up — excluded on both engines
    # (null_sweep audit: Spark's user partition groups NULL users
    # together while the oracle's equi-ASOF never matches them).
    ev = Catalog(spark, sf_dir).events.filter(
        F.col("user_id").isNotNull())
    dim = (ev.filter(F.col("event_type") == "purchase")
           .select("user_id", "ts",
                   F.col("event_id").alias("oid"),
                   F.col("event_id").alias("v_id"),
                   F.col("value").alias("v_value"),
                   F.lit(0).alias("tag")))
    facts = (ev.filter(F.col("event_type") == "click")
             .select("user_id", "ts",
                     F.col("event_id").alias("oid"),
                     F.lit(None).cast("long").alias("v_id"),
                     F.lit(None).cast("double").alias("v_value"),
                     F.lit(1).alias("tag")))
    w = (W.partitionBy("user_id").orderBy("ts", "tag", "oid")
         .rowsBetween(W.unboundedPreceding, 0))
    # Carry the version as ONE struct, nulled on fact rows: separate
    # per-column last(ignorenulls) carries would skip a version whose
    # value is legitimately NULL and reach back to the PRIOR version
    # — attribute time travel on exactly the rows where the dimension
    # recorded a missing value (null_sweep audit class).
    ver = F.when(F.col("tag") == 0,
                 F.struct(F.col("v_id").alias("id"),
                          F.col("v_value").alias("val")))
    carried = (dim.unionByName(facts)
               .withColumn("ver", F.last(ver, ignorenulls=True).over(w))
               .withColumn("version_id", F.col("ver.id"))
               .withColumn("value_at_click", F.col("ver.val")))
    return (carried.filter(F.col("tag") == 1)
            .select("user_id", F.col("oid").alias("click_id"),
                    F.col("ts").alias("click_ts"),
                    "version_id", "value_at_click"))


@query(
    "ivm_retract_agg_view",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS DOUBLE) / 100.0 AS total_revenue
    FROM orders
    WHERE (o_orderdate < TIMESTAMP '1997-01-01' AND o_orderkey % 10 <> 0)
       OR o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderpriority
    """,
)
def ivm_retract_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-view IVM under RETRACTIONS — the step beyond
    ``ivm_append_agg_view`` that separates append-only maintenance
    from true change-data maintenance: the delta carries DELETES
    (every 10th base order is retracted) alongside inserts (the
    post-split region), and the view refreshes as
    stored + insert partials - delete partials. This works because
    COUNT and integer-cents SUM form an abelian GROUP (subtractable),
    which is exactly the class of aggregates retraction-capable IVM
    supports — MIN/MAX are only a monoid (no inverse), so a deleted
    minimum forces a per-group rescan; that boundary is the design
    reason this view stores count+sum partials and derives averages,
    never extremes.

    Refresh cost tracks |delta|: the stored partials are read back
    (priority-cardinality rows), the two delta scans prune on the
    split predicate, and the merge is a key-wise SUM of signed
    partials. The oracle recomputes the post-change state from
    scratch — any sign slip or double-counted retraction
    hash-mismatches.
    """

    from ..functions.exact import cents
    o = Catalog(spark, sf_dir).orders
    split = F.lit("1997-01-01").cast("timestamp")
    from ..scratch import scratch_dir
    scratch = scratch_dir("ivm_retract", sf_dir)

    def partials(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            (F.count(F.lit(1)) * sign).alias("n_orders"),
            (F.sum(cents(F.col("o_totalprice"))) * sign).alias("cents"))

    base = o.filter(F.col("o_orderdate") < split)
    partials(base, 1).write.mode("overwrite").parquet(scratch)
    stored = spark.read.parquet(scratch)

    inserts = partials(o.filter(F.col("o_orderdate") >= split), 1)
    deletes = partials(
        base.filter(F.col("o_orderkey") % 10 == 0), -1)
    return (stored.unionByName(inserts).unionByName(deletes)
            .groupBy("o_orderpriority")
            .agg(F.sum("n_orders").alias("n_orders"),
                 (F.sum("cents").cast("double") / 100.0)
                 .alias("total_revenue")))


@query(
    "deletion_impact_audit",
    oracle="""
    WITH del_users AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 101 = 13
    ), del_custs AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 101 = 13
    ), ev AS (
        SELECT 'events' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows_to_delete,
               CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_entities
        FROM events e JOIN del_users d ON d.user_id = e.user_id
    ), cu AS (
        SELECT 'customer' AS table_name,
               CAST(COUNT(*) AS BIGINT), CAST(COUNT(*) AS BIGINT)
        FROM del_custs
    ), orx AS (
        SELECT 'orders' AS table_name,
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
        FROM orders o JOIN del_custs d ON d.c_custkey = o.o_custkey
    ), li AS (
        SELECT 'lineitem' AS table_name,
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT)
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN del_custs d ON d.c_custkey = o.o_custkey
    )
    SELECT * FROM ev UNION ALL SELECT * FROM cu
    UNION ALL SELECT * FROM orx UNION ALL SELECT * FROM li
    ORDER BY table_name
    """,
)
def deletion_impact_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact audit: BEFORE executing a GDPR
    deletion request, count exactly what it touches — per table, the
    rows that reference the requested entities and how many entities
    actually appear there. The demo request set is deterministic
    (user_id / custkey ≡ 13 mod 101); production swaps in the DSR
    queue unchanged. The cascade follows the FK graph: customer →
    orders → lineitem (lineitem carries no custkey — its exposure is
    THROUGH orders, which is why impact analysis needs the join,
    not a per-table WHERE).

    Plan: the deletion set is a broadcast semi-side (bounded by the
    request queue, never the fact table); each count is one
    fact-scan aggregate; the lineitem leg reuses the orders join the
    warehouse already bucket-optimizes. Deleting itself is the MERGE
    machinery (``merge_upsert_latest_state``) with WHEN MATCHED THEN
    DELETE — this operator is the blast-radius report that gates it.
    """
    cat = Catalog(spark, sf_dir)
    del_users = (cat.events.filter(F.col("user_id") % 101 == 13)
                 .select("user_id").distinct())
    del_custs = (cat.customer.filter(F.col("c_custkey") % 101 == 13)
                 .select("c_custkey"))
    ev = (cat.events.join(F.broadcast(del_users), "user_id")
          .agg(F.count(F.lit(1)).alias("n_rows_to_delete"),
               F.countDistinct("user_id").alias("n_entities"))
          .select(F.lit("events").alias("table_name"),
                  "n_rows_to_delete", "n_entities"))
    cu = (del_custs
          .agg(F.count(F.lit(1)).alias("n_rows_to_delete"),
               F.count(F.lit(1)).alias("n_entities"))
          .select(F.lit("customer").alias("table_name"),
                  "n_rows_to_delete", "n_entities"))
    orx = (cat.orders.join(F.broadcast(del_custs),
                           F.col("o_custkey") == F.col("c_custkey"))
           .agg(F.count(F.lit(1)).alias("n_rows_to_delete"),
                F.countDistinct("o_custkey").alias("n_entities"))
           .select(F.lit("orders").alias("table_name"),
                   "n_rows_to_delete", "n_entities"))
    li = (cat.lineitem.select("l_orderkey")
          .join(cat.orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
          .join(F.broadcast(del_custs),
                F.col("o_custkey") == F.col("c_custkey"))
          .agg(F.count(F.lit(1)).alias("n_rows_to_delete"),
               F.countDistinct("o_custkey").alias("n_entities"))
          .select(F.lit("lineitem").alias("table_name"),
                  "n_rows_to_delete", "n_entities"))
    return (ev.unionByName(cu).unionByName(orx).unionByName(li)
            .orderBy("table_name"))


@query(
    "currency_normalize_asof",
    oracle="""
    WITH months AS (
        SELECT DISTINCT date_trunc('month', o_orderdate) AS month
        FROM orders
    ), rates AS (
        SELECT month,
               1000000 + (CAST(year(month) * 12 + month(month)
                          AS BIGINT) * 7919) % 100000 AS rate_micros
        FROM months
    ), converted AS (
        SELECT o.o_orderkey,
               date_trunc('month', o.o_orderdate) AS month,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
               r.rate_micros,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                   * r.rate_micros // 1000000 AS converted_cents
        FROM orders o
        JOIN rates r ON r.month = date_trunc('month', o.o_orderdate)
    )
    SELECT CAST(month AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(any_value(rate_micros) AS BIGINT) AS rate_micros,
           CAST(CAST(SUM(cents) AS BIGINT) AS BIGINT) AS local_cents,
           CAST(CAST(SUM(converted_cents) AS BIGINT) AS BIGINT)
               AS converted_cents
    FROM converted
    GROUP BY month
    ORDER BY month
    """,
)
def currency_normalize_asof(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Currency normalization against a time-varying rate table —
    the multi-entity warehouse staple: every order converts at the
    rate IN EFFECT for its month. Because the rate table is
    month-grain, the as-of lookup collapses to an EQUI-join on the
    truncated month (the cheapest as-of there is — the general
    irregular-timestamp case is the ``events_asof_join`` family);
    conversion is exact integer micros (cents·rate div 10⁶). The
    deterministic synthetic rate curve is a pure function of the
    month, so both engines derive the identical table — production
    swaps in its rates dimension unchanged.

    One orders scan, a broadcast month-rate dimension derived from
    the data's own month range, one month-grain rollup that pins the
    local/converted reconciliation.
    """
    o = Catalog(spark, sf_dir).orders
    month = F.date_trunc("month", F.col("o_orderdate"))
    months = o.select(month.alias("month")).distinct()
    rates = months.select(
        "month",
        (F.lit(1000000)
         + (F.year("month").cast("long") * 12
            + F.month("month").cast("long")) * 7919 % 100000)
        .alias("rate_micros"))
    converted = (o.select(month.alias("month"),
                          F.round(F.col("o_totalprice") * 100)
                          .cast("long").alias("cents"))
                 .join(F.broadcast(rates), "month")
                 .withColumn("converted_cents",
                             F.expr("cents * rate_micros div 1000000")))
    return (converted.groupBy("month")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.first("rate_micros").alias("rate_micros"),
                 F.sum("cents").alias("local_cents"),
                 F.sum("converted_cents").alias("converted_cents"))
            .select(F.col("month").cast("date").alias("month"),
                    "n_orders", "rate_micros", "local_cents",
                    "converted_cents")
            .orderBy("month"))


@query(
    "snapshot_time_travel_diff",
    oracle="""
    WITH snap AS (
        SELECT c_custkey, c_mktsegment,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer
    ), v2 AS (
        -- v1 (even keys) + odd-key upserts - (key % 10 = 0) deletes
        SELECT * FROM snap
        WHERE c_custkey % 2 = 1 OR c_custkey % 10 <> 0
    ), v3 AS (
        -- v2 with a +10.00 balance adjustment upsert on key % 7 = 0
        SELECT c_custkey, c_mktsegment,
               bal_cents + CASE WHEN c_custkey % 7 = 0
                                THEN 1000 ELSE 0 END AS bal_cents
        FROM v2
    ), u AS (
        SELECT 2 AS version, c_mktsegment,
               COUNT(*) AS n_customers, SUM(bal_cents) AS total_bal_cents
        FROM v2 GROUP BY c_mktsegment
        UNION ALL
        SELECT 3, c_mktsegment, COUNT(*), SUM(bal_cents)
        FROM v3 GROUP BY c_mktsegment
    )
    SELECT CAST(version AS BIGINT) AS version, c_mktsegment,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(total_bal_cents AS BIGINT) AS total_bal_cents,
           CAST(2 AS BIGINT) AS n_live_versions
    FROM u
    ORDER BY version, c_mktsegment
    """,
)
def snapshot_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot table time travel, driver-visible end to end: commit
    v1 (even-keyed customers), MERGE to v2 (odd-key upserts + key%10
    deletes), MERGE to v3 (+10.00 balance adjustment on key%7), then
    VACUUM keep=2 — and read the two SURVIVING versions back through
    the manifest-resolved time-travel path (``sources/snapshots.py``),
    aggregating each per market segment. The oracle recomputes both
    version states from the base customer table via the same modular
    derivations, so a broken commit, a merge that mis-applies deletes,
    a vacuum that drops a live version (``n_live_versions`` pins
    retention), or a time-travel read that resolves the wrong data
    dir all hash-fail. Staging is the fixture (skipped once versions
    [2, 3] are the committed set); the measured plan is two
    manifest-schema parquet scans + one union-aggregate.

    At 100 TB this is the table-format core: immutable snapshot dirs,
    tiny manifest commits (one atomic rename), readers never
    coordinate with writers, and vacuum is the only deleting op.
    """
    import shutil

    from ..functions.exact import cents
    from ..scratch import scratch_dir, source_fingerprint
    from ..sources.snapshots import (merge_snapshot, read_snapshot,
                                     snapshots, vacuum, write_snapshot)

    stage = scratch_dir(
        "snapshot_tt", sf_dir,
        version="v1|" + source_fingerprint(sf_dir, "customer.parquet"))
    base = Catalog(spark, sf_dir).customer.select(
        "c_custkey", "c_mktsegment",
        cents(F.col("c_acctbal")).alias("bal_cents"))

    try:
        done = [s["version"] for s in snapshots(stage)] == [2, 3]
    except (OSError, ValueError, KeyError):
        done = False
    if not done:
        # Any partial prior state rebuilds from scratch: the whole
        # staging sequence is deterministic, so a wipe is the simple
        # correct recovery (crash-orphan data dirs included).
        shutil.rmtree(stage, ignore_errors=True)
        write_snapshot(base.filter(F.col("c_custkey") % 2 == 0), stage)
        changes2 = (base.filter(F.col("c_custkey") % 2 == 1)
                    .withColumn("is_delete", F.lit(False))
                    .unionByName(
                        base.filter((F.col("c_custkey") % 2 == 0)
                                    & (F.col("c_custkey") % 10 == 0))
                        .withColumn("is_delete", F.lit(True))))
        merge_snapshot(spark, stage, changes2, "c_custkey", "is_delete")
        current = read_snapshot(spark, stage)
        changes3 = (current.filter(F.col("c_custkey") % 7 == 0)
                    .withColumn("bal_cents", F.col("bal_cents") + 1000))
        merge_snapshot(spark, stage, changes3, "c_custkey")
        vacuum(stage, keep=2)

    n_live = len(snapshots(stage))
    parts = []
    for v in (2, 3):
        df = read_snapshot(spark, stage, v)
        parts.append(
            df.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum("bal_cents").alias("total_bal_cents"))
            .select(F.lit(v).cast("long").alias("version"),
                    "c_mktsegment", "n_customers", "total_bal_cents"))
    return (parts[0].unionByName(parts[1])
            .withColumn("n_live_versions", F.lit(n_live).cast("long"))
            .orderBy("version", "c_mktsegment"))


@query(
    "ctas_compaction_census",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents,
           CAST(1 AS BIGINT) AS files_ok
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def ctas_compaction_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTAS + small-file compaction, driver-visible end to end: CREATE
    TABLE AS a 16-way round-robin-repartitioned orders projection
    partitioned by o_orderpriority (16 files per partition dir — the
    streaming-sink small-file accretion pattern), then
    ``Engine.compact_table(target_files=2)`` rewrites every directory
    down to at most 2 files via the (partition cols, row-hash bucket)
    repartition, preserving Hive layout. The returned census
    aggregates the COMPACTED table per priority; ``files_ok`` pins
    the file bound from INSIDE the plan (count_distinct of
    input_file_name() per group, entirely JVM-side), and the oracle's
    counts/sums come from the original parquet — so a compaction that
    loses rows, flattens the partition layout, or leaves the rewrite
    un-swapped all hash-fail. Staging is the fixture (skip on the
    _COMPACTED marker); the measured plan is one partitioned scan +
    aggregate.

    At 100 TB compaction is the maintenance op that keeps scan plans
    healthy — per-file open/footer overhead dominates once appends
    accrete; the bucketed rewrite bounds output files per directory
    without losing pruning.
    """
    import os

    from ..engine import Engine
    from ..functions.exact import cents
    from ..scratch import scratch_dir, source_fingerprint

    root = scratch_dir(
        "ctas_compact", sf_dir,
        version="v1|" + source_fingerprint(sf_dir, "orders.parquet"))
    tbl = os.path.join(root, "orders_by_priority")
    marker = os.path.join(root, "_COMPACTED")
    eng = Engine(spark, sf_dir)
    src = eng.table("orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("cents"),
        "o_orderpriority")
    if not os.path.exists(marker):
        eng.create_table("ctas_orders_by_priority",
                         src.repartition(16), tbl,
                         partition_by=("o_orderpriority",))
        eng.compact_table(tbl, target_files=2)
        open(marker, "w").close()
    back = (spark.read.schema(src.schema).parquet(tbl)
            .withColumn("_file", F.input_file_name()))
    return (back.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("cents").alias("total_cents"),
                 (F.count_distinct(F.col("_file")) <= 2)
                 .cast("long").alias("files_ok"))
            .orderBy("o_orderpriority"))


@query(
    "scd2_interval_overlap_audit",
    oracle="""
    WITH hist AS (
        SELECT user_id, event_id AS version_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS from_us,
               LEAD(epoch_us(CAST(ts AS TIMESTAMP)))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS to_us
        FROM events
    ), checked AS (
        SELECT user_id, version_id, from_us, to_us,
               LAG(to_us) OVER (PARTITION BY user_id
                                ORDER BY from_us, version_id)
                   AS prev_to_us
        FROM hist
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_entities,
           CAST(SUM(CASE WHEN prev_to_us > from_us
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overlaps,
           CAST(SUM(CASE WHEN prev_to_us < from_us
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
           CAST(SUM(CASE WHEN to_us IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST((SUM(CASE WHEN prev_to_us > from_us THEN 1 ELSE 0 END)
                 = 0 AND
                 SUM(CASE WHEN to_us IS NULL THEN 1 ELSE 0 END)
                 = COUNT(DISTINCT user_id)) AS BIGINT) AS history_ok
    FROM checked
    """,
)
def scd2_interval_overlap_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Validity-interval integrity audit for SCD2 history — the DQ
    gate a point-in-time join silently depends on: per entity, sorted
    validity intervals must tile time with no OVERLAP (two versions
    simultaneously valid makes PIT joins ambiguous) and exactly one
    open (is_current) interval. Built over the same history
    derivation as ``scd2_user_value_history``; the walk compares each
    interval's start to its predecessor's end with one lag — no
    self-join — and also counts GAPS, which are legal (entity dormant
    between versions) but worth monitoring. ``history_ok`` is the
    release flag: zero overlaps and exactly one open interval per
    entity.

    One user-keyed exchange shared by both window passes; the audit
    reduces to a single row at any history size.
    """
    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    hist = ev.select(
        "user_id", F.col("event_id").alias("version_id"),
        F.unix_micros(F.col("ts")).alias("from_us"),
        F.lead(F.unix_micros(F.col("ts"))).over(w).alias("to_us"))
    w2 = W.partitionBy("user_id").orderBy("from_us", "version_id")
    checked = hist.withColumn("prev_to_us",
                              F.lag("to_us").over(w2))
    overlaps = F.sum(F.when(F.col("prev_to_us") > F.col("from_us"), 1)
                     .otherwise(0))
    opens = F.sum(F.when(F.col("to_us").isNull(), 1).otherwise(0))
    return checked.agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.countDistinct("user_id").alias("n_entities"),
        overlaps.alias("n_overlaps"),
        F.sum(F.when(F.col("prev_to_us") < F.col("from_us"), 1)
              .otherwise(0)).alias("n_gaps"),
        opens.alias("n_open"),
    ).select(
        "n_intervals", "n_entities", "n_overlaps", "n_gaps", "n_open",
        ((F.col("n_overlaps") == 0)
         & (F.col("n_open") == F.col("n_entities")))
        .cast("long").alias("history_ok"))


@query(
    "bitemporal_as_believed",
    oracle=f"""
    WITH facts AS (
        SELECT user_id, event_id,
               CAST(ts AS TIMESTAMP) AS valid_ts,
               CAST(ts AS TIMESTAMP)
                   + to_days(CAST(event_id % 3 AS INTEGER)) AS txn_ts,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ), believed_then AS (
        SELECT user_id, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY valid_ts DESC,
                                           event_id DESC) AS rn
        FROM facts
        WHERE txn_ts <= TIMESTAMP '{_SPLIT}'
          AND valid_ts <= TIMESTAMP '{_SPLIT}'
    ), believed_now AS (
        SELECT user_id, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY valid_ts DESC,
                                           event_id DESC) AS rn
        FROM facts
        WHERE valid_ts <= TIMESTAMP '{_SPLIT}'
    )
    SELECT n.user_id,
           t.cents AS cents_believed_then,
           n.cents AS cents_believed_now,
           CAST((t.cents IS DISTINCT FROM n.cents) AS BIGINT)
               AS corrected
    FROM (SELECT user_id, cents FROM believed_now WHERE rn = 1) n
    LEFT JOIN (SELECT user_id, cents FROM believed_then WHERE rn = 1) t
           USING (user_id)
    ORDER BY user_id
    """,
)
def bitemporal_as_believed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL point-in-time query — the two-axis question SCD2
    alone cannot answer: "what did we BELIEVE on date B about each
    user's state as of valid date V?" Facts carry VALID time (when
    the purchase happened) and TRANSACTION time (when the warehouse
    recorded it — here derived deterministically as valid + 0..2
    days, the late-arrival pattern). Believed-then restricts to
    txn_ts ≤ B before the per-user argmax; believed-now drops the
    transaction filter; rows where they differ are the late-arriving
    corrections an audit or restatement must explain — the
    ``corrected`` flag is null-safe (a user with NO believed-then
    state counts as corrected). This is the reproducibility
    primitive for regulated reporting: any historical report can be
    re-derived bit-for-bit by re-binding B.

    Two window argmaxes on the same user-keyed exchange + one join;
    the transaction filter is a scan predicate, so "query the past"
    costs the same plan as "query the present".
    """
    ev = Catalog(spark, sf_dir).events
    split = F.lit(_SPLIT).cast("timestamp")
    facts = (ev.filter(F.col("event_type") == "purchase")
             .select("user_id", "event_id",
                     F.col("ts").alias("valid_ts"),
                     (F.col("ts") + F.make_dt_interval(
                         F.col("event_id") % 3)).alias("txn_ts"),
                     F.round(F.col("value") * 100).cast("long")
                     .alias("cents")))
    w = (W.partitionBy("user_id")
         .orderBy(F.col("valid_ts").desc(), F.col("event_id").desc()))

    def latest(df):
        return (df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1).select("user_id", "cents"))

    then = latest(facts.filter((F.col("txn_ts") <= split)
                               & (F.col("valid_ts") <= split))) \
        .withColumnRenamed("cents", "cents_believed_then")
    now = latest(facts.filter(F.col("valid_ts") <= split)) \
        .withColumnRenamed("cents", "cents_believed_now")
    return (now.join(then, "user_id", "left")
            .select("user_id", "cents_believed_then",
                    "cents_believed_now",
                    (~F.col("cents_believed_then")
                     .eqNullSafe(F.col("cents_believed_now")))
                    .cast("long").alias("corrected"))
            .orderBy("user_id"))


@query(
    "scd2_merge_batch",
    oracle=f"""
    WITH hist AS (
        SELECT user_id, event_id AS version_id,
               CAST(ts AS TIMESTAMP) AS valid_from,
               LEAD(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
               value,
               CAST(CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END
                    AS INT) AS is_current
        FROM events
        WHERE event_type = 'purchase' AND ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, version_id, valid_from, valid_to, value, is_current,
           CAST(CASE WHEN valid_from >= TIMESTAMP '{_SPLIT}' THEN 2
                     WHEN valid_to >= TIMESTAMP '{_SPLIT}' THEN 1
                     ELSE 0 END AS INT) AS merge_lane
    FROM hist
    """,
)
def scd2_merge_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 MAINTENANCE: merge a change batch (purchases >= _SPLIT)
    into an existing SCD2 dimension (built from purchases < _SPLIT)
    without rebuilding history — the nightly warehouse operation,
    replayed as three union lanes: (0) non-current and untouched
    current rows carried verbatim, (1) each merged user's current row
    CLOSED at the batch's first change, (2) batch rows chained among
    themselves and appended. The oracle is the full-history REBUILD:
    the hash match proves the incremental merge is exactly
    rebuild-equivalent, which is the whole correctness obligation of
    SCD2 MERGE (lane labels are derivable from the timestamps, so the
    rebuild can label them too).

    Every lane is co-partitioned on user_id (the dimension's merge
    key): one shuffle each for the two window passes and the
    first-change join — no fact-grain recomputation, which is the
    point of merging instead of rebuilding at 100 TB.
    """
    ev = Catalog(spark, sf_dir).events
    split = F.lit(_SPLIT).cast("timestamp")
    # A NULL ts has no place on an SCD2 validity timeline: it is
    # neither < split nor >= split, so the lane split would silently
    # drop it while the oracle's rebuild windows it NULLS LAST
    # (ADVICE r9). Exclude it SYMMETRICALLY on both sides — the
    # rebuild-equivalence contract is over rows with a valid_from.
    pur = (ev.filter((F.col("event_type") == "purchase")
                     & F.col("ts").isNotNull())
           .select("user_id", "event_id", "ts", "value"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")

    def scd2(df: DataFrame) -> DataFrame:
        return df.select(
            "user_id", F.col("event_id").alias("version_id"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"), "value",
            F.when(F.lead("ts").over(w).isNull(), 1).otherwise(0)
            .cast("int").alias("is_current"))

    dim = scd2(pur.filter(F.col("ts") < split))
    batch = pur.filter(F.col("ts") >= split)
    first_b = batch.groupBy("user_id").agg(F.min("ts").alias("first_ts"))

    # One pass over the whole dimension handles both the carried and
    # the closed lanes (splitting them into two filtered branches
    # re-derives the dimension and doubles the events scan count —
    # scan_audit class). Null-safe merge-key match: the rebuild's
    # window treats the NULL user_id as ONE partition, so the merge
    # must close its current row too — a plain equi-join silently
    # skips NULL keys (caught by the full-tier null sweep at this
    # query's gate).
    closes = (F.col("is_current") == 1) & F.col("first_ts").isNotNull()
    merged_dim = (
        dim.join(first_b.withColumnRenamed("user_id", "b_user"),
                 F.col("user_id").eqNullSafe(F.col("b_user")), "left")
        .select("user_id", "version_id", "valid_from",
                F.when(closes, F.col("first_ts")).otherwise(F.col("valid_to"))
                .alias("valid_to"),
                "value",
                F.when(closes, 0).otherwise(F.col("is_current"))
                .cast("int").alias("is_current"),
                F.when(closes, 1).otherwise(0).cast("int")
                .alias("merge_lane")))
    inserted = (scd2(batch)
                .withColumn("merge_lane", F.lit(2).cast("int")))
    return merged_dim.unionByName(inserted)
