"""Salted-join equivalence: salting must not change join semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_database_engine_spark.functions.skew import salted_join
from .conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet") \
        .withColumnRenamed("l_suppkey", "s_suppkey")
    supp = spark.read.parquet(f"{SF_SMOKE}/supplier.parquet")
    plain = li.join(supp, "s_suppkey").groupBy("s_suppkey") \
        .agg(F.count(F.lit(1)).alias("n")).collect()
    salted = salted_join(li, supp, "s_suppkey").groupBy("s_suppkey") \
        .agg(F.count(F.lit(1)).alias("n")).collect()
    assert sorted((r.s_suppkey, r.n) for r in plain) == \
        sorted((r.s_suppkey, r.n) for r in salted)
