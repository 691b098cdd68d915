"""Round-11 Arrow-kernel bit-exactness pins.

The similarity family's scoring moved from Catalyst HOF folds
(``aggregate(zip_with(...))``, interpreted per element) to Arrow/NumPy
kernels. The optimization contract is BIT-IDENTICAL values: the
kernels replicate the fold's IEEE evaluation order (left-assoc from
0.0, per-element float→double cast, NULL→NULL, NaN flow). These tests
differentially pin each kernel against the retained JVM reference
fold on the real sf0.001 fixtures — any future kernel edit that
drifts a single ulp (or mishandles NULL vs NaN) fails here before the
oracle sweep ever runs.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _emb(spark):
    from sql_database_engine_spark.catalog import Catalog
    return Catalog(spark, SF_SMOKE).embeddings


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cos_pair_kernel_matches_jvm_fold_bitwise(spark):
    from sql_database_engine_spark.operators.similarity import (
        _as_double, _cos_pair, cosine)

    e = _emb(spark)
    q = (e.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qv")))
    pairs = e.crossJoin(F.broadcast(q))
    kern = pairs.select("vec_id", "qid",
                        _cos_pair(F.col("embedding"), F.col("qv"))
                        .alias("c"))
    ref = pairs.select("vec_id", "qid",
                       cosine(_as_double(F.col("embedding")),
                              _as_double(F.col("qv"))).alias("c"))
    # exact tuple compare: doubles must be BIT-identical (repr-exact),
    # NULLs must be NULL on both sides (not NaN)
    a = _rows(kern.select("vec_id", "qid",
                          F.col("c").cast("string").alias("s"),
                          F.isnull("c").alias("isn")))
    b = _rows(ref.select("vec_id", "qid",
                         F.col("c").cast("string").alias("s"),
                         F.isnull("c").alias("isn")))
    assert a == b and len(a) > 0


def test_dot_and_l2_kernels_match_jvm_folds(spark):
    from sql_database_engine_spark.operators.similarity import (
        _as_double, _dot_pair, _l2_pair, _l2d_pair, dot)

    e = _emb(spark).filter(F.col("embedding").isNotNull())
    q = (e.filter(F.col("vec_id") < 2)
         .select(F.col("vec_id").alias("qid"),
                 F.col("embedding").alias("qv")))
    pairs = e.crossJoin(F.broadcast(q))

    ref_dot = dot(_as_double(F.col("embedding")), _as_double(F.col("qv")))
    a = _rows(pairs.select(
        "vec_id", "qid",
        _dot_pair(F.col("embedding"), F.col("qv")).cast("string")))
    b = _rows(pairs.select("vec_id", "qid", ref_dot.cast("string")))
    assert a == b and len(a) > 0

    ref_l2d = F.aggregate(
        F.zip_with(_as_double(F.col("embedding")), _as_double(F.col("qv")),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)
    a = _rows(pairs.select(
        "vec_id", "qid",
        _l2d_pair(F.col("embedding"), F.col("qv")).cast("string")))
    b = _rows(pairs.select("vec_id", "qid", ref_l2d.cast("string")))
    assert a == b

    # integer micro lanes: exact int64, any order — still pin equality
    micro = F.expr("transform(embedding, x -> "
                   "CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
    lanes = (e.select("vec_id", micro.alias("e"))
             .crossJoin(F.broadcast(
                 e.filter(F.col("vec_id") < 2)
                 .select(F.col("vec_id").alias("qid"),
                         micro.alias("qe")))))
    ref_l2i = F.aggregate(
        F.zip_with(F.col("e"), F.col("qe"),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    a = _rows(lanes.select("vec_id", "qid",
                           _l2_pair(F.col("e"), F.col("qe"))))
    b = _rows(lanes.select("vec_id", "qid", ref_l2i))
    assert a == b and len(a) > 0


def test_plane_code_kernels_match_jvm_fold(spark):
    from sql_database_engine_spark.operators.similarity import (
        _ANN_PLANES, _NEARDUP_PLANES, _ann_bucket_code, _neardup_code)

    def jvm_code(vec, planes):
        code = F.lit(0).cast("long")
        for i, p in enumerate(planes):
            proj = F.aggregate(
                F.zip_with(vec,
                           F.array(*[F.lit(float(x)) for x in p]),
                           lambda x, y: x.cast("double") * y),
                F.lit(0.0), lambda acc, x: acc + x)
            code = code.bitwiseOR(
                F.shiftleft(F.when(proj > 0, 1).otherwise(0).cast("long"),
                            i))
        return code

    e = _emb(spark).filter(F.col("embedding").isNotNull())
    for kernel, planes in ((_neardup_code, _NEARDUP_PLANES),
                           (_ann_bucket_code, _ANN_PLANES)):
        a = _rows(e.select("vec_id", kernel(F.col("embedding"))))
        b = _rows(e.select("vec_id", jvm_code(F.col("embedding"), planes)))
        assert a == b and len(a) > 0


def test_lloyd_assign_matches_crossjoin_argmin(spark):
    from sql_database_engine_spark.operators.similarity import (
        _lloyd_assign, _micro_vectors)

    e = _micro_vectors(spark, SF_SMOKE)
    cents = (e.filter(F.col("vec_id") < 4)
             .select(F.col("vec_id").cast("long").alias("cid"),
                     F.col("e").alias("c")))
    got = _rows(_lloyd_assign(e, cents).select("vec_id", "cid"))

    dist = F.aggregate(
        F.zip_with(F.col("e"), F.col("c"),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    ref = (e.crossJoin(F.broadcast(cents))
           .select("vec_id", "cid", dist.alias("d"))
           .groupBy("vec_id")
           .agg(F.min(F.struct("d", "cid")).alias("m"))
           .select("vec_id", F.col("m.cid").alias("cid")))
    assert got == _rows(ref) and len(got) > 0


def test_lloyd_assign_empty_centroids_yields_no_rows(spark):
    from sql_database_engine_spark.operators.similarity import (
        _lloyd_assign, _micro_vectors)

    e = _micro_vectors(spark, SF_SMOKE)
    cents = (e.filter(F.lit(False))
             .select(F.col("vec_id").cast("long").alias("cid"),
                     F.col("e").alias("c")))
    out = _lloyd_assign(e, cents)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "e", "cid"]


def test_kernels_null_element_inside_vector_matches_fold(spark):
    """ADVICE r11: a NULL *element* inside a vector reaches the kernel
    as a NaN lane (Arrow list→float conversion), where the JVM fold
    returns SQL NULL — unfixed, the kernel's NaN would rank FIRST
    under ORDER BY DESC (and the int64 L2 kernel would cast NaN to
    INT64_MIN garbage). Pins every pair kernel against the fold on a
    frame that actually contains element nulls, plus cosine's 0/0 —
    legitimately NaN from clean input — which must STAY NaN."""
    from sql_database_engine_spark.operators.similarity import (
        _as_double, _cos_pair, _dot_pair, _l2_pair, _l2d_pair, cosine,
        dot)

    rows = [
        (0, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),      # clean
        (1, [1.0, None, 3.0], [4.0, 5.0, 6.0]),     # element null left
        (2, [1.0, 2.0, 3.0], [4.0, 5.0, None]),     # element null right
        (3, None, [4.0, 5.0, 6.0]),                 # whole-vector null
        (4, [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]),      # cosine 0/0 -> NaN
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<float>, b array<float>")
    a, b = F.col("a"), F.col("b")
    ad, bd = _as_double(a), _as_double(b)
    ref_l2d = F.aggregate(F.zip_with(ad, bd, lambda x, y: (x - y) * (x - y)),
                          F.lit(0.0), lambda acc, x: acc + x)
    # ANSI mode makes the JVM fold THROW on the 0/0 row (double
    # division by zero), so the fold reference only covers rows 0-3;
    # the kernel's 0/0 row is asserted NaN separately below.
    out = df.filter(F.col("id") < 4).select(
        "id",
        _dot_pair(a, b).alias("kd"), dot(ad, bd).alias("rd"),
        _cos_pair(a, b).alias("kc"), cosine(ad, bd).alias("rc"),
        _l2d_pair(a, b).alias("kl"), ref_l2d.alias("rl")).collect()
    for r in out:
        for k, ref in (("kd", "rd"), ("kc", "rc"), ("kl", "rl")):
            assert repr(r[k]) == repr(r[ref]), (r["id"], k, r[k], r[ref])
    got = {r["id"]: r["kc"] for r in out}
    assert got[1] is None and got[2] is None and got[3] is None
    z = (df.filter(F.col("id") == 4)
         .select(_cos_pair(a, b).alias("kc")).collect()[0]["kc"])
    assert z != z  # NaN preserved for clean 0/0 input

    idf = spark.createDataFrame(
        [(0, [1, 2], [3, 4]), (1, [1, None], [3, 4]), (2, None, [3, 4])],
        "id long, a array<bigint>, b array<bigint>")
    ref_l2 = F.aggregate(
        F.zip_with(F.col("a"), F.col("b"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    io = idf.select("id", _l2_pair(F.col("a"), F.col("b")).alias("k"),
                    ref_l2.alias("r")).collect()
    for r in io:
        assert r["k"] == r["r"], (r["id"], r["k"], r["r"])
    assert io[0]["k"] == 8 and io[1]["k"] is None and io[2]["k"] is None
