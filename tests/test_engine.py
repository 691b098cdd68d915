"""Engine facade smoke tests."""

from __future__ import annotations

from sql_database_engine_spark.engine import Engine
from .conftest import SF_SMOKE


def test_engine_facade(spark, tmp_path):
    eng = Engine(spark, SF_SMOKE)
    assert eng.table("region").count() == 5
    assert eng.sql("SELECT count(*) AS n FROM region").first().n == 5
    assert len(eng.queries()) >= 80
    assert eng.query("full_scan").count() == 5
    users = eng.users(str(tmp_path / "u.db"))
    users.insert(1, "u", "e@x")
    assert users.select_rows() == [(1, "u", "e@x")]
    assert eng.stream_events().isStreaming


def test_engine_ctas(spark, tmp_path):
    eng = Engine(spark, SF_SMOKE)
    summary = eng.query("pricing_summary")
    out = eng.create_table("pricing_rollup", summary, str(tmp_path / "ctas"))
    assert out.count() == summary.count()
    assert eng.sql("SELECT count(*) AS n FROM pricing_rollup").first().n == out.count()


def test_engine_sql_macros(spark):
    eng = Engine(spark, SF_SMOKE)
    row = eng.sql("""
        SELECT cosine_sim(CAST(ARRAY(1.0, 0.0) AS ARRAY<DOUBLE>),
                          CAST(ARRAY(1.0, 0.0) AS ARRAY<DOUBLE>)) AS c,
               token_count('a b c') AS t,
               money_cents(12.34) AS m
    """).first()
    assert row.c == 1.0 and row.t == 3 and row.m == 1234


def test_engine_compaction(spark, tmp_path):
    from pyspark.sql import functions as F
    eng = Engine(spark, SF_SMOKE)
    out = str(tmp_path / "many_files")
    # simulate a small-file mess: 16 appends
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").limit(256)
    for i in range(4):
        li.repartition(4).write.mode("append").parquet(out)
    import glob
    before = len(glob.glob(f"{out}/*.parquet"))
    assert before >= 16
    rows_before = spark.read.parquet(out).count()
    after = eng.compact_table(out, target_files=2)
    assert after <= 2
    assert spark.read.parquet(out).count() == rows_before


def test_engine_compaction_preserves_partitioning(spark, tmp_path):
    """Compacting a Hive-partitioned table must keep the key=value
    directory layout (and thus partition pruning), bounding each
    directory at target_files files — not flatten it."""
    import glob
    from pyspark.sql import functions as F
    eng = Engine(spark, SF_SMOKE)
    out = str(tmp_path / "part_table")
    li = (spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").limit(512)
          .withColumn("rf", F.col("l_returnflag")))
    for _ in range(3):
        li.repartition(4).write.mode("append").partitionBy("rf").parquet(out)
    rows_before = spark.read.parquet(out).count()
    dirs_before = sorted(d for d in glob.glob(f"{out}/rf=*"))
    assert len(dirs_before) >= 2
    eng.compact_table(out, target_files=2)
    assert sorted(d for d in glob.glob(f"{out}/rf=*")) == dirs_before
    for d in dirs_before:
        assert len(glob.glob(f"{d}/*.parquet")) <= 2
    assert spark.read.parquet(out).count() == rows_before


def test_engine_compaction_recovers_stale_dirs(spark, tmp_path):
    """A crashed prior compaction (backup exists, live path gone, or
    leftover scratch) must be recovered, not fail the next run."""
    import os
    import shutil
    eng = Engine(spark, SF_SMOKE)
    out = str(tmp_path / "crashy")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").limit(64)
    li.repartition(4).write.parquet(out)
    rows = spark.read.parquet(out).count()
    # Simulate a crash mid-swap: table renamed away, scratch leftover.
    os.rename(out, out + "__precompact")
    shutil.copytree(out + "__precompact", out + "__compacting")
    after = eng.compact_table(out, target_files=1)
    assert after == 1
    assert spark.read.parquet(out).count() == rows


def test_snapshot_time_travel(spark, tmp_path):
    """Writes commit immutable versions; latest read tracks the head
    while any past version stays readable bit-for-bit (time travel)."""
    from pyspark.sql import functions as F
    eng = Engine(spark, SF_SMOKE)
    path = str(tmp_path / "versioned")
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    v1 = eng.write_snapshot(nat, path)
    v2 = eng.write_snapshot(nat.filter(F.col("n_regionkey") == 0), path)
    assert (v1, v2) == (1, 2)
    assert eng.read_snapshot(path).count() == eng.read_snapshot(path, 2).count()
    assert eng.read_snapshot(path, 1).count() == nat.count()
    hist = eng.snapshots(path)
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[0]["n_rows"] == nat.count()


def test_snapshot_uncommitted_invisible_and_vacuumed(spark, tmp_path):
    """A data dir without a manifest (crash before the commit rename)
    must be invisible to readers and removed by vacuum; vacuum keeps
    the newest `keep` committed versions."""
    import os
    eng = Engine(spark, SF_SMOKE)
    path = str(tmp_path / "crashy_snap")
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    eng.write_snapshot(nat, path)
    eng.write_snapshot(nat.limit(5), path)
    # simulate a crash: orphan data dir, no manifest
    os.makedirs(os.path.join(path, "v00003"))
    assert eng.read_snapshot(path).count() == 5  # head is v2, not the orphan
    removed = eng.vacuum_snapshots(path, keep=1)
    assert removed == [1]
    assert not os.path.exists(os.path.join(path, "v00001"))
    assert not os.path.exists(os.path.join(path, "v00003"))
    assert eng.read_snapshot(path).count() == 5
    import pytest as _pytest
    with _pytest.raises(ValueError):
        eng.read_snapshot(path, 1)


def test_snapshot_merge_upsert_and_delete(spark, tmp_path):
    """Copy-on-write MERGE: upserts replace matching keys, inserts
    append, deletes drop — committed as a new version while the old
    version stays readable (snapshot isolation / undo log)."""
    from pyspark.sql import functions as F
    from sql_database_engine_spark.sources.snapshots import merge_snapshot
    eng = Engine(spark, SF_SMOKE)
    path = str(tmp_path / "merge_snap")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, val string")
    eng.write_snapshot(base, path)
    changes = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "id long, val string, is_delete boolean")
    v = merge_snapshot(spark, path, changes, "id", delete_col="is_delete")
    assert v == 2
    now = {r["id"]: r["val"] for r in eng.read_snapshot(path).collect()}
    assert now == {1: "a", 2: "B", 4: "d"}
    before = {r["id"]: r["val"] for r in eng.read_snapshot(path, 1).collect()}
    assert before == {1: "a", 2: "b", 3: "c"}


def test_ivm_second_phase_reads_stored_view(spark):
    """ivm_append_join_view must read the materialized base back from
    its scratch parquet (one scan of the stored view) and join ONLY
    the delta orders against customer."""
    from sql_database_engine_spark import operators
    from .conftest import SF_SMOKE
    operators.load_all()
    df = operators.QUERIES["ivm_append_join_view"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "spark_graft_ivm" in plan          # stored view scanned
    # The delta branch's orders scan carries the date pushdown.
    assert "PushedFilters" in plan and "o_orderdate" in plan
