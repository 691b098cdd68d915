"""Bucketed-table joins: the shuffle-free co-location story.

At 100 TB, a recurring fact-fact join (lineitem ⋈ orders on orderkey)
should read from tables bucketed on the join key so neither side
shuffles at query time — the bucket layout IS the exchange, paid once
at write time. This test materializes both tables bucketed and proves
the join plan contains no Exchange on either side, and that results
match the plain join.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a warehouse + catalog; the in-memory derby
    # catalog of the test session suffices.
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("li_bucketed"))
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("o_bucketed"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_exchange(warehouse):
    spark = warehouse
    joined = (spark.table("li_bucketed")
              .join(spark.table("o_bucketed"),
                    F.col("l_orderkey") == F.col("o_orderkey"))
              .groupBy("o_orderstatus")
              .agg(F.count(F.lit(1)).alias("n")))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_section = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    # Neither join input may re-shuffle: bucket layout satisfies the
    # join's distribution requirement.
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, join_section[:400]

    # And the results equal the plain (shuffling) join.
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    plain = (li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")))
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_registered_bucketed_query_plan_and_oracle_shape(spark):
    """The registry's join_bucketed_colocated must actually ride the
    bucket layout: no exchange on either join input even with
    broadcast disabled (AQE would otherwise hide the question by
    broadcasting the small test-SF orders side)."""
    from sql_database_engine_spark.operators import load_all, QUERIES
    load_all()
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = QUERIES["join_bucketed_colocated"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_stale_generation_gc_sweeps_only_committed_pattern(tmp_path, monkeypatch):
    """ADVICE r6: fingerprint-keyed bucket names strand the previous
    generation on every in-place testdata regeneration. The GC must
    sweep exactly the committed-name pattern for the same
    (table, sf_dir) with a DIFFERENT fingerprint — never the current
    generation, never in-flight .tmp./.aside. siblings, never another
    table's or another sf_dir's generations."""
    import os

    from sql_database_engine_spark.sources import bucketed as b

    wh = tmp_path / "bucketed"
    wh.mkdir()
    monkeypatch.setattr(b, "WAREHOUSE", str(wh))
    tag = b._tag("/data/sfX")
    current = f"lineitem_bkt_{tag}_111_222"
    keep = [
        current,                                 # the new generation
        f"lineitem_bkt_{tag}_111_222.tmp.ab12",  # rival build in flight
        f"lineitem_bkt_{tag}_111_222.aside.cd3",  # rename-aside in flight
        f"orders_bkt_{tag}_999_888",             # other table
        f"lineitem_bkt_{b._tag('/data/sfY')}_999_888",  # other sf_dir
    ]
    sweep = [f"lineitem_bkt_{tag}_999_888",      # superseded generation
             f"lineitem_bkt_{tag}_3_4"]
    for d in keep + sweep:
        (wh / d).mkdir()
        (wh / d / "part-0.parquet").write_bytes(b"x")
    # The sweeping builder's own name matches a fresh fingerprint of
    # the live source — the authority condition for sweeping at all.
    monkeypatch.setattr(b, "source_fingerprint", lambda *_: "111-222")
    b._gc_stale_generations("lineitem", "/data/sfX", current)
    left = set(os.listdir(wh))
    assert left == set(keep), f"GC swept wrongly: left={sorted(left)}"


def test_stale_builder_never_sweeps_newer_generation(tmp_path, monkeypatch):
    """The cross-generation race: a builder that fingerprinted BEFORE
    an in-place regen commits its stale generation after a rival
    committed the newer (current-source) one. 'Everything but mine is
    older' is inverted for that builder — it must sweep NOTHING, or it
    deletes the current generation out from under the rival's
    registered table. Authority is a sweep-time re-fingerprint; a
    vanished source likewise grants no authority."""
    import os

    from sql_database_engine_spark.sources import bucketed as b

    wh = tmp_path / "bucketed"
    wh.mkdir()
    monkeypatch.setattr(b, "WAREHOUSE", str(wh))
    tag = b._tag("/data/sfX")
    mine_stale = f"lineitem_bkt_{tag}_111_222"   # pre-regen fingerprint
    rival_new = f"lineitem_bkt_{tag}_333_444"    # current-source build
    for d in (mine_stale, rival_new):
        (wh / d).mkdir()
        (wh / d / "part-0.parquet").write_bytes(b"x")
    # Live source now fingerprints to the RIVAL's generation.
    monkeypatch.setattr(b, "source_fingerprint", lambda *_: "333-444")
    b._gc_stale_generations("lineitem", "/data/sfX", mine_stale)
    assert set(os.listdir(wh)) == {mine_stale, rival_new}, \
        "stale builder swept a newer generation"
    # No live source at all: no sweep authority either.
    def _raises(*_):
        raise FileNotFoundError("source gone")
    monkeypatch.setattr(b, "source_fingerprint", _raises)
    b._gc_stale_generations("lineitem", "/data/sfX", mine_stale)
    assert set(os.listdir(wh)) == {mine_stale, rival_new}
