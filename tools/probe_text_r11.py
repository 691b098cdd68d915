#!/usr/bin/env python
"""r11: attribute text near-dup family cost by noop-timing pipeline
prefixes (guide §1). Everything here is measurement-only."""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"{time.perf_counter() - t0:7.3f}  {label}", flush=True)


def main() -> None:
    from pyspark.sql import functions as F, Window as W
    from sql_database_engine_spark.session import get_spark
    from sql_database_engine_spark.catalog import Catalog
    from sql_database_engine_spark.operators import text as T

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_text")
    cat = Catalog(spark, sf_dir)
    d = cat.documents
    t("warm documents scan", d.select("doc_id", "text"))

    for rep in range(2):
        g0 = T._word_bigrams(d)
        t("word_bigrams (posexplode+window+distinct)", g0)
        t("word_bigrams + per-doc count window",
          T._word_bigrams(d, "source").withColumn(
              "n_grams", F.count(F.lit(1)).over(W.partitionBy("doc_id"))))
        signed = T._mh_signatures(d)
        t("mh_signatures (32 perm mins)", signed)
        t("mh_bands", T._mh_bands(signed))
        # setsim stages
        df_tbl = g0.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
        t("setsim df_tbl", df_tbl)
        ranked = (g0.join(df_tbl, "gram")
                  .withColumn("n", F.count(F.lit(1)).over(
                      W.partitionBy("doc_id")))
                  .withColumn("pos", F.row_number().over(
                      W.partitionBy("doc_id").orderBy("df", "gram"))))
        t("setsim ranked (join + 2 windows)", ranked)
        prefix_len = F.col("n") - F.ceil(F.lit(0.8) * F.col("n")) + 1
        n_par = spark.sparkContext.defaultParallelism
        p = (ranked.filter(F.col("pos") <= prefix_len)
             .select("doc_id", "n", "gram", "pos")
             .repartition(n_par, "gram"))
        a, b = p.alias("a"), p.alias("b")
        cand_raw = a.join(b, (F.col("a.gram") == F.col("b.gram"))
                          & (F.col("a.doc_id") < F.col("b.doc_id"))
                          & (F.col("b.n") >= F.ceil(F.lit(0.8) * F.col("a.n")))
                          & (F.col("b.n") <= F.floor(F.col("a.n") / F.lit(0.8))))
        t("setsim prefix self-join (raw pairs)", cand_raw)
        ub = (F.count(F.lit(1))
              + F.least(F.first(F.col("a.n")) - F.max(F.col("a.pos")),
                        F.first(F.col("b.n")) - F.max(F.col("b.pos"))))
        mo = F.floor((F.lit(4) * (F.first(F.col("a.n")) + F.first(F.col("b.n")))
                      + F.lit(8)) / F.lit(9))
        cand = (cand_raw.groupBy(F.col("a.doc_id").alias("doc_a"),
                                 F.col("b.doc_id").alias("doc_b"))
                .agg(ub.alias("ub"), mo.alias("mo"))
                .filter(F.col("ub") >= F.col("mo"))
                .select("doc_a", "doc_b")
                .repartition(n_par, "doc_a", "doc_b"))
        t("setsim candidates (agg+posfilter)", cand)
        arrs = g0.groupBy("doc_id").agg(
            F.collect_list("gram").alias("grams"),
            F.count(F.lit(1)).alias("n"))
        av = arrs.select(F.col("doc_id").alias("doc_a"),
                         F.col("grams").alias("grams_a"),
                         F.col("n").alias("na"))
        bv = arrs.select(F.col("doc_id").alias("doc_b"),
                         F.col("grams").alias("grams_b"),
                         F.col("n").alias("nb"))
        inter = (cand.join(av, "doc_a").join(bv, "doc_b")
                 .select("doc_a", "doc_b", "na", "nb",
                         F.size(F.array_intersect("grams_a", "grams_b"))
                         .cast("long").alias("n_common")))
        t("setsim verify (array_intersect)", inter)
    from sql_database_engine_spark.operators import QUERIES, load_all
    load_all()
    for q in ("setsim_prefix_join", "minhash_lsh_neardup",
              "simhash_neardup_pairs", "lsh_banding_tradeoff_sweep",
              "ngram_jaccard_neardup", "jaccard_threshold_sweep",
              "minhash_incremental_neardup", "minhash_quality_eval"):
        t0 = time.perf_counter()
        QUERIES[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"{time.perf_counter() - t0:7.3f}  FULL {q}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
