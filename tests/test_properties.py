"""Property-based tests (hypothesis) for the statement front-end, and
partitioning-invariance checks for the distributed plans
(SURVEY.md §5.2 items 3-4).
"""

from __future__ import annotations

from hypothesis import given, strategies as st

from sql_database_engine_spark.errors import PrepareError
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
             "events_sessionize"]

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
