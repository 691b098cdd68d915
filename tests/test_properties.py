"""Property-based tests (hypothesis) for the statement front-end, and
partitioning-invariance checks for the distributed plans
(SURVEY.md §5.2 items 3-4).
"""

from __future__ import annotations

from hypothesis import given, strategies as st

from sql_database_engine_spark.errors import PrepareError
from .conftest import SF_ORACLE
from sql_database_engine_spark.plans.statement import Statement, StatementType, prepare

# --- statement parser properties (no Spark needed) ---

token = st.text(
    alphabet=st.characters(blacklist_categories=("Zs", "Cc", "Cs")),
    min_size=1, max_size=300)


@given(st.integers(min_value=0, max_value=2**31 - 1),
       token.filter(lambda s: len(s) <= 32),
       token.filter(lambda s: len(s) <= 255))
def test_valid_insert_roundtrips(row_id, username, email):
    stmt = prepare(f"insert {row_id} {username} {email}")
    assert stmt == Statement(StatementType.INSERT, row_id, username, email)


@given(st.integers(min_value=-2**31, max_value=-1))
def test_negative_id_always_rejected(row_id):
    try:
        prepare(f"insert {row_id} u e@x")
        raise AssertionError("negative id accepted")
    except PrepareError as e:
        assert e.message == "ID must be positive."


@given(st.integers(min_value=0, max_value=100), st.integers(min_value=33, max_value=400))
def test_overlong_username_always_rejected(row_id, n):
    try:
        prepare(f"insert {row_id} {'a' * n} e@x")
        raise AssertionError("overlong username accepted")
    except PrepareError as e:
        assert e.message == "String is too long."


@given(st.text(max_size=40).filter(
    lambda s: not s.startswith("insert") and s != "select" and "\n" not in s))
def test_unrecognized_statements_echo_input(line):
    try:
        prepare(line)
        raise AssertionError("unexpectedly parsed")
    except PrepareError as e:
        assert e.message == f"Unrecognized keyword at start of '{line}'"


def test_length_boundaries_exact():
    # 32/33 and 255/256: the reference's exact validation fence
    # (db.cpp:416-419, spec/main_spec.rb:44-75).
    assert prepare(f"insert 1 {'a'*32} {'b'*255}").username == "a" * 32
    for bad in (f"insert 1 {'a'*33} x", f"insert 1 x {'b'*256}"):
        try:
            prepare(bad)
            raise AssertionError("boundary violated")
        except PrepareError as e:
            assert e.message == "String is too long."


# --- partitioning invariance: same results under different physical
#     parallelism (the distributed-correctness property) ---

def test_results_invariant_under_partitioning(spark):
    from sql_database_engine_spark import operators
    from .conftest import SF_ORACLE
    operators.load_all()

    names = ["pricing_summary", "flagship_revenue_by_region",
             "top_spenders_per_nation", "dedup_exact_keep_first",
             "events_sessionize", "curation_gate_report",
             "events_ohlc_hourly", "purchase_value_streaks",
             # continuation-wave exactness claims: fixed-point message
             # sums (pagerank), fixed-point TVD, 128-bit OLS moments,
             # chi-square fixed-point cell sums — all must survive any
             # partitioning bit-for-bit.
             "pagerank_brand_graph", "source_tvd_shift",
             "trend_daily_revenue_ols", "chi2_event_type_by_segment",
             # second-wave exactness claims: lossless prefix-filter
             # pruning, fixed-order BM25 chain, two-pass integer
             # moments, power-of-two decay sums, IVM merge identity.
             "setsim_prefix_join", "bm25_keyword_topk",
             "zscore_event_values", "decayed_user_value",
             "ivm_append_agg_view"]

    def snapshot():
        out = {}
        for n in names:
            df = operators.QUERIES[n](spark, SF_ORACLE)
            out[n] = sorted(map(tuple, df.collect()))
        return out

    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    base_bytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        few = snapshot()
        spark.conf.set("spark.sql.shuffle.partitions", "37")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
        many = snapshot()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_parts)
        spark.conf.set("spark.sql.files.maxPartitionBytes", base_bytes)
    assert few == many


def test_training_split_properties(spark):
    """Statistical + structural contracts of the hash split: exact
    partition of the corpus, stable under re-evaluation, proportions
    near 80/10/10 (binomial tolerance at n=500)."""
    from sql_database_engine_spark import operators
    operators.load_all()
    df = operators.QUERIES["train_val_test_split_hash"](spark, SF_ORACLE)
    rows = df.collect()
    n = len(rows)
    by = {}
    for r in rows:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    # exact partition: every doc in exactly one split
    assert sum(len(v) for v in by.values()) == n
    # ~80/10/10 within 5 sigma of binomial
    import math
    for split, p in (("train", 0.8), ("val", 0.1), ("test", 0.1)):
        got = len(by.get(split, ()))
        sigma = math.sqrt(n * p * (1 - p))
        assert abs(got - n * p) < 5 * sigma, (split, got, n)
    # determinism: second evaluation identical
    again = operators.QUERIES["train_val_test_split_hash"](spark, SF_ORACLE)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))


def test_sequence_packing_invariants(spark):
    """Bins are dense per language, every bin holds ≥1 doc, token
    totals are conserved, and no bin except a straddler's exceeds the
    budget by more than one document's tokens."""
    from sql_database_engine_spark import operators
    from sql_database_engine_spark.operators.training import PACK_BUDGET
    operators.load_all()
    rows = operators.QUERIES["pack_sequences_greedy"](spark, SF_ORACLE).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, bins in by_lang.items():
        idx = sorted(b["bin"] for b in bins)
        assert idx == list(range(len(idx))), f"{lang}: bins not dense {idx[:5]}"
        assert all(b["n_docs"] >= 1 for b in bins)
        # every bin but the last must have reached the budget (the doc
        # that crossed the boundary is counted in the bin it started in)
        ordered = sorted(bins, key=lambda b: b["bin"])
        cum = 0
        for b in ordered[:-1]:
            cum += b["total_tokens"]
            assert cum >= (b["bin"] + 1) * PACK_BUDGET, (lang, b["bin"])


def test_stratified_sample_rates(spark):
    """Per-language keep-rates land within binomial tolerance of the
    configured thresholds."""
    import math
    from sql_database_engine_spark import operators
    from sql_database_engine_spark.operators.training import STRATA_RATES, _BUCKETS
    operators.load_all()
    base = operators.QUERIES["train_val_test_split_hash"](spark, SF_ORACLE)
    totals = {r["lang"]: r["n"] for r in
              base.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    got = {r["lang"]: r["n"] for r in
           operators.QUERIES["stratified_sample_exact"](spark, SF_ORACLE)
           .groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    for lang, rate in STRATA_RATES.items():
        p = rate / _BUCKETS
        n = totals[lang]
        sigma = math.sqrt(n * p * (1 - p))
        assert abs(got.get(lang, 0) - n * p) <= 5 * sigma + 1, (lang, got.get(lang), n)


@given(st.lists(st.integers(min_value=-10_000, max_value=10_000),
                min_size=0, max_size=60))
def test_lindley_closed_form_equals_sequential_recurrence(deltas):
    """The window closed form in clamped_running_balance rests on the
    Lindley identity bal_t = S_t - min(0, running_min(S)_t); this
    pins it against the literal sequential recurrence for arbitrary
    delta sequences (pure Python on both sides, no Spark)."""
    # sequential truth
    bal = clamps = maxb = 0
    for d in deltas:
        nxt = bal + d
        if nxt < 0:
            clamps += 1
            nxt = 0
        bal = nxt
        maxb = max(maxb, bal)
    # closed form
    s = 0
    run_min = 0          # min(0, min of prefix sums so far)
    cf_clamps = 0
    cf_max = 0
    for d in deltas:
        prev_min = run_min
        s += d
        if s < prev_min:
            cf_clamps += 1       # strict new minimum below 0
        run_min = min(run_min, s)
        cf_max = max(cf_max, s - run_min)
    cf_bal = s - run_min
    assert (bal, clamps, maxb) == (cf_bal, cf_clamps, cf_max)


def test_sql_curation_manifest_invariants(spark):
    """Semantic invariants of the SQL-front-door curation manifest
    that the oracle hash asserts only indirectly: every surviving doc
    clears the quality gate, no content hash appears twice (the dedup
    stage's whole contract), no source exceeds the mix cap, split
    labels are exactly the md5-permille function of doc_id, and per
    (lang, split) the bins are non-decreasing in doc_id with every
    non-final bin's cumulative tokens reaching its boundary."""
    from sql_database_engine_spark import operators
    from sql_database_engine_spark.catalog import Catalog
    operators.load_all()
    name = "sql_curation_manifest_front_door"
    rows = operators.QUERIES[name](spark, SF_ORACLE).collect()
    assert rows, "manifest must be non-empty on the fixtures"
    docs = {r["doc_id"]: r for r in
            Catalog(spark, SF_ORACLE).documents.collect()}
    import hashlib
    seen_hashes = set()
    per_source = {}
    for r in rows:
        d = docs[r["doc_id"]]
        assert d["n_chars"] >= 100, r["doc_id"]
        h = hashlib.md5(d["text"].encode()).hexdigest()
        assert h not in seen_hashes, f"dup content survived: {r['doc_id']}"
        seen_hashes.add(h)
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
        bucket = int(hashlib.md5(str(r["doc_id"]).encode())
                     .hexdigest()[:4], 16) % 1000
        want = "train" if bucket < 800 else ("val" if bucket < 900
                                             else "test")
        assert r["split"] == want, (r["doc_id"], bucket, r["split"])
    assert max(per_source.values()) <= 20
    by_part = {}
    for r in rows:
        by_part.setdefault((r["lang"], r["split"]), []).append(r)
    for part, rs in by_part.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["bin"] == cum // 2048, (part, r["doc_id"])
            cum += r["n_toks"]


def test_sql_recursive_spine_invariants(spark):
    """The spine is a COMPLETE consecutive calendar over the observed
    span (that is the densification contract): first day = min order
    date, last = max, no holes, no duplicates; is_gap=0 exactly on
    days with at least one dated order, and revenue is 0 on gap
    days."""
    import datetime

    from sql_database_engine_spark import operators
    from sql_database_engine_spark.catalog import Catalog
    operators.load_all()
    rows = operators.QUERIES["sql_recursive_date_spine_gapfill"](
        spark, SF_ORACLE).collect()
    days = sorted(r["day"] for r in rows)
    assert len(days) == len(set(days))
    assert (days[-1] - days[0]).days + 1 == len(days), "holes in spine"
    order_days = {
        r["d"] for r in Catalog(spark, SF_ORACLE).orders
        .filter("o_orderdate IS NOT NULL")
        .selectExpr("CAST(o_orderdate AS DATE) AS d").distinct().collect()}
    assert days[0] == min(order_days) and days[-1] == max(order_days)
    for r in rows:
        if r["is_gap"]:
            assert r["day"] not in order_days
            assert r["revenue"] == 0
        else:
            assert r["day"] in order_days


def test_sql_recursive_spine_span_overflow_raises(spark):
    """A span at or over SPINE_CAP_DAYS must RAISE in BOTH engines —
    not silently truncate the calendar below MAX(o_orderdate)
    (ADVICE r10: oracle parity would hide identical truncation). Both
    query texts carry an in-query guard; drive them against a
    synthetic two-order table spanning cap+1 days."""
    import duckdb
    import pytest

    from sql_database_engine_spark.operators import timeseries as ts

    spark.createDataFrame(
        [("1992-01-01", 10.0), ("2005-01-01", 20.0)],
        "o_orderdate string, o_totalprice double",
    ).createOrReplaceTempView("orders")
    try:
        with pytest.raises(Exception, match="date spine span exceeds cap"):
            spark.sql(ts._SPINE_SQL,
                      args={"cap": ts.SPINE_CAP_DAYS}).collect()
    finally:
        spark.catalog.dropTempView("orders")

    con = duckdb.connect()
    con.execute("CREATE VIEW orders AS SELECT * FROM (VALUES "
                "(DATE '1992-01-01', 10.0), (DATE '2005-01-01', 20.0)) "
                "AS t(o_orderdate, o_totalprice)")
    with pytest.raises(Exception, match="date spine span exceeds cap"):
        con.execute(ts._SPINE_ORACLE_SQL).fetchall()
    con.close()
