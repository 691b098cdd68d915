#!/usr/bin/env python
"""r11: attribute graph-family cost — edge derivation vs iteration
rounds — by noop-timing pipeline prefixes (guide §1: measure first)."""

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
    from pyspark.sql import functions as F
    from sql_database_engine_spark.session import get_spark
    from sql_database_engine_spark.catalog import Catalog
    from sql_database_engine_spark.operators import graph as G

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_graph")
    cat = Catalog(spark, sf_dir)
    # warm
    t("warm lineitem scan", cat.lineitem.select("l_orderkey", "l_partkey"))
    for rep in range(2):
        t("basket", G._basket(cat))
        t("undirected_edges", G._undirected_edges(cat))
        t("directed_edges", G._directed_edges(cat))
        e = G._directed_edges(cat).localCheckpoint(eager=False)
        t("edges localCheckpoint + count-ish", e)
        t("one pagerank-style round on checkpointed edges",
          e.join(e.groupBy(F.col("src").alias("node"))
                 .agg(F.count(F.lit(1)).alias("deg")),
                 e.src == F.col("node")).groupBy("dst").count())
    from sql_database_engine_spark.operators import QUERIES
    from sql_database_engine_spark.operators import load_all
    load_all()
    for q in ("pagerank_brand_graph", "triangle_count_brands",
              "scc_mutual_reach_brands", "kcore_decomposition",
              "label_propagation_communities", "community_modularity",
              "sssp_weighted_brands", "personalized_pagerank_brands",
              "graph_eccentricity_diameter",
              "link_prediction_common_neighbors",
              "basket_brand_pair_lift"):
        t(q, QUERIES[q](spark, sf_dir))
    spark.stop()


if __name__ == "__main__":
    main()
