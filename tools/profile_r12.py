#!/usr/bin/env python
"""Round-11 optimization profiler: isolate per-query cost + plans.

For each named query (or a preset list), this tool

  - captures ``df.explain("formatted")`` into ``plans/r12/<name>_<tag>.txt``
    (the judge-checkable artifact for plan claims), and
  - times N noop-sink materializations (guide §1.4: full computation,
    no driver collect, no output cost), printing per-rep seconds.

Warmups mirror bench.py exactly (codegen, streaming machinery, bucketed
/ clustered / staged-IVF layouts) so the first rep is not billed for
engine spin-up and the timings are comparable to the driver bench.

Usage:
    python tools/profile_r12.py --tag before --reps 3 <query> [<query> ...]
    python tools/profile_r12.py --tag before --top          # preset list
    python tools/profile_r12.py --time-only <query>         # no plan file
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

#: The round-11 examination list: every headline query >= ~1.5s in
#: BENCH_r10 plus the full subset-24 (the citable instrument).
TOP = [
    "minhash_quality_eval", "doc_winnowing_fingerprints",
    "neardup_cluster_assignment", "kmeans_cluster_profile",
    "lsh_banding_tradeoff_sweep", "personalized_pagerank_brands",
    "embedding_neardup_pairs", "setsim_prefix_join",
    "kmeans_lloyd_centroids", "sssp_weighted_brands",
    "knn_regression_eval", "training_manifest_end_to_end",
    "simhash_neardup_pairs", "knn_confusion_matrix",
    "graph_eccentricity_diameter", "kcore_decomposition",
    "neardup_canonical_docs", "minhash_lsh_neardup",
    "scc_mutual_reach_brands", "triangle_count_brands",
    "community_modularity", "pagerank_brand_graph",
    "ann_ivf_topk", "ngram_jaccard_neardup",
    "stream_click_purchase_full_join_settled", "ann_pq_topk",
    "minhash_incremental_neardup", "link_prediction_common_neighbors",
    "jaccard_threshold_sweep", "er_golden_records",
    "label_propagation_communities", "doc_novelty_fraction",
    "basket_brand_pair_lift", "mmr_diversified_topk",
    "sql_recursive_date_spine_gapfill", "stream_click_purchase_join",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--top", action="store_true", help="profile the preset list")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--time-only", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    names = list(args.queries) + (TOP if args.top else [])
    if not names:
        ap.error("no queries given")

    from sql_database_engine_spark.session import get_spark
    import __spark_entry__ as contract

    spark = get_spark("profile_r12")
    qs = contract.queries()
    sf_dir = args.sf_dir

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # Warmups: identical to bench.py (untimed engine/layout staging).
    noop(qs["full_scan"](spark, sf_dir))
    noop(qs["flagship_revenue_by_region"](spark, sf_dir))
    from sql_database_engine_spark.streaming import events_stream as _es
    _s = _es.events_stream(spark, sf_dir)
    _es.run_available_now(
        _es.tumbling_counts(_s), "bench_stream_warmup",
        output_mode="complete",
        state_partitions=_es.backlog_state_partitions(sf_dir))
    from sql_database_engine_spark.sources.bucketed import ensure_bucketed_facts
    ensure_bucketed_facts(spark, sf_dir)
    from sql_database_engine_spark.sources.clustering import (
        ensure_clustered_lineitem)
    ensure_clustered_lineitem(spark, sf_dir)
    from sql_database_engine_spark.operators.similarity import (
        _ivf_stage, _ivf_stage_incremental)
    _ivf_stage(spark, sf_dir)
    _ivf_stage_incremental(spark, sf_dir)

    plans_dir = os.path.join(ROOT, "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)

    results = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query: {name}")
            continue
        spark.sparkContext.setJobDescription(f"r12-profile: {name}")
        df = qs[name](spark, sf_dir)
        if not args.time_only:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            noop(qs[name](spark, sf_dir))
            ts.append(round(time.perf_counter() - t0, 3))
        results[name] = ts
        med = statistics.median(ts)
        print(f"{med:7.3f}  {name}  reps={ts}")
        spark.sparkContext.setJobDescription(None)
    print("== total median:", round(sum(
        statistics.median(t) for t in results.values()), 3))
    spark.stop()


if __name__ == "__main__":
    main()
