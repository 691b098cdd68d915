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
