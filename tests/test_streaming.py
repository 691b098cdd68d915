"""Batch-equivalence tests for the Structured Streaming twins
(SURVEY.md §5.2: streaming has no DuckDB oracle, so the oracle is the
engine's own batch plan over the same data).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F, types as T

from sql_database_engine_spark.streaming import events_stream as es
from .conftest import SF_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def stream(spark):
    return es.events_stream(spark, SF_SMOKE)


def test_tumbling_counts_matches_batch(spark, stream):
    from sql_database_engine_spark import operators
    operators.load_all()
    QUERIES = operators.QUERIES
    got = es.run_available_now(es.tumbling_counts(stream),
                               "t_tumbling", output_mode="complete")
    want = QUERIES["events_tumbling_window"](spark, SF_SMOKE)
    cols = ["window_start", "event_type", "n", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_session_windows_match_batch(spark, stream):
    from sql_database_engine_spark import operators
    operators.load_all()
    QUERIES = operators.QUERIES
    got = es.run_available_now(es.session_windows(stream),
                               "t_sessions", output_mode="complete")
    # Batch twin: compare (user_id, session_start, n_events); the
    # native session_window's end = last_ts + gap, the batch plan's
    # end = last_ts, so end is definitionally different.
    want = (QUERIES["events_sessionize"](spark, SF_SMOKE)
            .select("user_id", F.col("session_start"), "n_events"))
    cols = ["user_id", "session_start", "n_events"]
    assert _rows(got, cols) == _rows(want, cols)


def test_dedup_stream_removes_duplicates(spark, stream):
    # Duplicate the stream by unioning it with itself: every event_id
    # arrives twice; watermark-scoped dedup must keep exactly one.
    doubled = stream.union(es.events_stream(spark, SF_SMOKE))
    got = es.run_available_now(es.dedup_stream(doubled), "t_dedup")
    n_unique = (spark.read.parquet(f"{SF_SMOKE}/events.parquet")
                .select("event_id").distinct().count())
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_stateful_user_profiles_match_batch(spark, stream):
    from sql_database_engine_spark.streaming.stateful import user_profiles
    got = es.run_available_now(user_profiles(stream), "t_profiles",
                               output_mode="update")
    # Last update per user is the complete profile (single availableNow
    # batch over static data → exactly one emission per user).
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    want = (ev.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.sum(F.round(F.col("value") * 100).cast("long"))
                  .cast("double") / 100.0).alias("total_value")))
    cols = ["user_id", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_streaming_queries_are_rerunnable(spark):
    # The driver may invoke a registered streaming query repeatedly in
    # one session; memory-sink names must not collide.
    from sql_database_engine_spark import operators
    operators.load_all()
    q = operators.QUERIES["stream_tumbling_counts"]
    n1 = q(spark, SF_SMOKE).count()
    n2 = q(spark, SF_SMOKE).count()
    assert n1 == n2 > 0


def test_continuous_rollup_matches_batch(spark, tmp_path):
    """The incrementally-maintained rollup equals the batch tumbling
    aggregate after draining the backlog — and stays correct when the
    same backlog is re-delivered (checkpoint makes refresh exactly-once)."""
    from sql_database_engine_spark.streaming import rollup as ru
    from sql_database_engine_spark import operators
    operators.load_all()
    store = str(tmp_path / "rollup_store")
    ckpt = str(tmp_path / "rollup_ckpt")
    q = ru.continuous_rollup(spark, SF_SMOKE, store, ckpt)
    q.awaitTermination()
    got = ru.read_rollup(spark, store)
    want = operators.QUERIES["events_tumbling_window"](spark, SF_SMOKE)
    cols = ["window_start", "event_type", "n", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)
    # Re-run: checkpoint says nothing new → rollup unchanged.
    q2 = ru.continuous_rollup(spark, SF_SMOKE, store, ckpt)
    q2.awaitTermination()
    assert _rows(ru.read_rollup(spark, store), cols) == _rows(want, cols)

    # Merge path: deliver the same events as a NEW epoch — the store
    # must read-merge-commit (staged, not in-place) and double every
    # count exactly once.
    from sql_database_engine_spark.catalog import load_table as _lt
    batch = _lt(spark, SF_SMOKE, "events")
    ru._merge_partials(store)(batch, epoch_id=99)
    doubled = {(r.window_start, r.event_type): (r.n, r.total_value)
               for r in ru.read_rollup(spark, store).collect()}
    for r in want.collect():
        n, v = doubled[(r.window_start, r.event_type)]
        assert n == 2 * r.n and abs(v - 2 * r.total_value) < 1e-9

    # At-least-once replay of that same epoch is a no-op.
    ru._merge_partials(store)(batch, epoch_id=99)
    again = {(r.window_start, r.event_type): (r.n, r.total_value)
             for r in ru.read_rollup(spark, store).collect()}
    assert again == doubled


def test_incremental_arrival_and_late_data(spark, tmp_path):
    """Two-drain scenario: an early file is processed, then a second
    file with the remaining events arrives; the second availableNow
    drain must process only the new file (checkpointed offsets) and
    the rollup store must accumulate to exactly the batch aggregate.
    This is the live-pipeline shape: files land, the query wakes,
    state carries."""
    import glob
    import shutil

    import pyspark.sql.functions as FF

    from sql_database_engine_spark.catalog import load_table
    from sql_database_engine_spark.streaming import rollup as ru

    src = tmp_path / "arriving"
    src.mkdir()
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    canon = load_table(spark, SF_SMOKE, "events").orderBy("event_id")
    early = canon.limit(600)
    late = canon.subtract(early)

    def stage(df, name):
        # File stream sources list FILES, not subdirectories — write a
        # single part file and move it into the watched dir.
        tmp = str(tmp_path / f"_stage_{name}")
        (df.withColumn("ts", FF.unix_micros("ts") * 1000)
         .select("event_id", "ts", "user_id", "event_type", "value", "props")
         .coalesce(1).write.mode("overwrite").parquet(tmp))
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, str(src / name))
        shutil.rmtree(tmp)

    # stage() writes ts as an INT64 ns epoch, so the drain schema is
    # the ns-epoch flavor regardless of the testdata's current one.
    ns_schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])

    def drain():
        raw = spark.readStream.schema(ns_schema).parquet(str(src))
        stream = raw.withColumn("ts", FF.timestamp_micros(FF.expr("ts div 1000")))
        q = (stream.writeStream.foreachBatch(ru._merge_partials(store))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    stage(early, "batch0.parquet")
    drain()
    n_first = ru.read_rollup(spark, store).agg(F.sum("n").alias("t")).first().t
    assert n_first == 600

    stage(late, "batch1.parquet")
    drain()
    total = ru.read_rollup(spark, store).agg(F.sum("n").alias("t")).first().t
    assert total == canon.count()

    # Final store equals the batch aggregate over ALL events.
    want = (canon.groupBy(F.date_trunc("hour", "ts").alias("window_start"),
                          "event_type")
            .agg(F.count(F.lit(1)).alias("n")))
    got = ru.read_rollup(spark, store).select("window_start", "event_type", "n")
    cols = ["window_start", "event_type", "n"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_stream_join_matches_batch(spark, stream):
    """The watermarked stream-stream join drains to exactly the batch
    range-join over the same events."""
    from sql_database_engine_spark.catalog import load_table
    got = es.run_available_now(es.click_purchase_join(stream),
                               "t_cp_join", output_mode="append")
    ev = load_table(spark, SF_SMOKE, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts")))
    want = (clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")))
        .select(F.col("c_user").alias("user_id"), "click_id", "click_ts",
                "purchase_id", "purchase_ts"))
    cols = ["user_id", "click_id", "click_ts", "purchase_id", "purchase_ts"]
    assert got.count() > 0
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_stream_left_join_watermark_horizon(spark, stream):
    """Outer-join rows emit only once the watermark clears their match
    window: matched rows equal the batch inner join exactly; the
    null-extended rows equal the batch anti-join *restricted to clicks
    the final watermark could adjudicate* (older than max_ts − 3h:
    2h lateness + 1h join range). Younger unmatched clicks stay in
    state — the documented availableNow behavior."""
    from sql_database_engine_spark.catalog import load_table
    got = es.run_available_now(es.click_purchase_left_join(stream),
                               "t_cp_left", output_mode="append")
    ev = load_table(spark, SF_SMOKE, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts")))
    cond = ((F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")))
    inner = clicks.join(purchases, cond).select(
        F.col("c_user").alias("user_id"), "click_id", "click_ts",
        "purchase_id", "purchase_ts")
    cols = ["user_id", "click_id", "click_ts", "purchase_id", "purchase_ts"]
    got_matched = got.filter(F.col("purchase_id").isNotNull())
    assert _rows(got_matched, cols) == _rows(inner, cols)

    # The global watermark is the MIN across both input streams
    # (multipleWatermarkPolicy=min), so the adjudication horizon keys
    # off the slower side: min(max click, max purchase) − 2h lateness,
    # and a click needs its whole 1h match range below that.
    import datetime
    mc = clicks.agg(F.max("click_ts")).first()[0]
    mp = purchases.agg(F.max("purchase_ts")).first()[0]
    cutoff = min(mc, mp) - datetime.timedelta(hours=3)
    unmatched_batch = (clicks.join(purchases, cond, "left_anti")
                       .filter(F.col("click_ts") <= F.lit(cutoff))
                       .select(F.col("c_user").alias("user_id"),
                               "click_id", "click_ts"))
    got_nulls = (got.filter(F.col("purchase_id").isNull())
                 .filter(F.col("click_ts") <= F.lit(cutoff))
                 .select("user_id", "click_id", "click_ts"))
    c3 = ["user_id", "click_id", "click_ts"]
    assert _rows(got_nulls, c3) == _rows(unmatched_batch, c3)


def test_stream_full_outer_join_settled_matches_batch(spark, stream):
    """The settled region of the FULL outer stream-stream join equals
    the batch full-outer join restricted to the same horizon — on
    BOTH null-extended sides."""
    from sql_database_engine_spark import operators
    operators.load_all()
    got = operators.QUERIES["stream_click_purchase_full_join_settled"](
        spark, SF_SMOKE)
    from sql_database_engine_spark.catalog import load_table
    ev = load_table(spark, SF_SMOKE, "events")
    c = (ev.filter(F.col("event_type") == "click")
         .select(F.col("user_id").alias("c_user"),
                 F.col("event_id").alias("click_id"),
                 F.col("ts").alias("click_ts")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .select(F.col("user_id").alias("p_user"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("purchase_ts")))
    cut = (ev.agg(F.least(
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))))
        .alias("m"))
        .select((F.col("m") - F.expr("INTERVAL 3 HOUR")).alias("cutoff")))
    want = (c.join(p, (F.col("c_user") == F.col("p_user"))
                   & (F.col("purchase_ts") >= F.col("click_ts"))
                   & (F.col("purchase_ts") <= F.col("click_ts")
                      + F.expr("INTERVAL 1 HOUR")), "full_outer")
            .select(F.coalesce("c_user", "p_user").alias("user_id"),
                    "click_id", "click_ts", "purchase_id", "purchase_ts")
            .crossJoin(F.broadcast(cut))
            .filter((F.col("click_id").isNotNull()
                     & F.col("purchase_id").isNotNull())
                    | (F.col("purchase_id").isNull()
                       & (F.col("click_ts") <= F.col("cutoff")))
                    | (F.col("click_id").isNull()
                       & (F.col("purchase_ts") <= F.col("cutoff"))))
            .drop("cutoff"))
    cols = ["user_id", "click_id", "click_ts", "purchase_id", "purchase_ts"]

    def rows(df):
        # null-safe sort: full outer nulls appear on BOTH id columns
        key = lambda t: tuple((v is None, v) for v in t)
        return sorted((tuple(r[c] for c in cols)
                       for r in df.select(*cols).collect()), key=key)

    assert rows(got) == rows(want)


def test_backlog_state_partitions_sizing(tmp_path, monkeypatch):
    """The drain sizing rule: ~8 MB of backlog per state partition,
    clamped to [2, cores]; directory-shaped tables sum their parts.
    A stateful shuffle cannot be AQE-coalesced, so this choice is the
    only lever against per-partition state-store commit overhead."""
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "32")
    # single file, 2 MB -> floor clamp of 2
    sf = tmp_path / "small"
    sf.mkdir()
    (sf / "events.parquet").write_bytes(b"\0" * (2 << 20))
    assert es.backlog_state_partitions(str(sf)) == 2
    # single file, 130 MB -> ceil(130/8) = 17
    sf2 = tmp_path / "big"
    sf2.mkdir()
    with open(sf2 / "events.parquet", "wb") as f:
        f.truncate(130 << 20)
    assert es.backlog_state_partitions(str(sf2)) == 17
    # 1 GB -> would be 128, clamped to cores (32)
    sf3 = tmp_path / "huge"
    sf3.mkdir()
    with open(sf3 / "events.parquet", "wb") as f:
        f.truncate(1 << 30)
    assert es.backlog_state_partitions(str(sf3)) == 32
    # directory-shaped: parts sum (3 x 8 MB = 24 MB -> 3)
    sf4 = tmp_path / "dir"
    (sf4 / "events.parquet").mkdir(parents=True)
    for i in range(3):
        with open(sf4 / "events.parquet" / f"part-{i}.parquet", "wb") as f:
            f.truncate(8 << 20)
    assert es.backlog_state_partitions(str(sf4)) == 3
    # missing file -> safe fallback to cores
    assert es.backlog_state_partitions(str(tmp_path / "nope")) == 32


def test_stream_dir_monitors_directory_shaped_source(tmp_path):
    """A directory-shaped events.parquet (the production layout) must
    be monitored directly: symlinking a directory into the staged
    monitor dir as if it were a file lists zero files and silently
    streams nothing (found by the 64x-backlog experiment; the
    fixture-shape sweep now guards the whole registry)."""
    src = tmp_path / "events.parquet"
    src.mkdir()
    (src / "part-0.parquet").write_bytes(b"x")
    got = es._stream_dir(str(tmp_path))
    assert got == str(src)


def test_fingerprint_walks_directory_sources(tmp_path):
    """source_fingerprint on a directory-shaped table reflects part
    content (sum of sizes), not the directory inode's constant 4096."""
    from sql_database_engine_spark.scratch import source_fingerprint
    d = tmp_path / "orders.parquet"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"\0" * 100)
    fp1 = source_fingerprint(str(tmp_path), "orders.parquet")
    (d / "b.parquet").write_bytes(b"\0" * 50)
    fp2 = source_fingerprint(str(tmp_path), "orders.parquet")
    assert fp1 != fp2
    assert fp2.startswith("150-")
