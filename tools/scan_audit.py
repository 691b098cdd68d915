#!/usr/bin/env python
"""Registry-wide same-table scan-count audit.

Counts how many times each physical plan scans the SAME parquet table
(a plan that re-references an expensive derived relation re-derives
it once per reference — results stay identical, small-scale timings
barely move, and at 100 TB the repeated fact join is catastrophic).
Round 4's run found the BFS plan scanning lineitem 188 times; the fix
is a lazy localCheckpoint on the reused relation.

Usage: python tools/scan_audit.py [--threshold 3]

Exit 0 when nothing exceeds the threshold outside the documented
allowlist (multi-stage index builds whose scans are distinct
algorithmic passes — see PERF.md "Round-4 scan-count audit").
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from collections import Counter

#: (query, table) pairs allowed above the default threshold: each
#: scan is a distinct algorithmic pass (index-build stages, composed
#: eval pipelines), not lineage re-derivation. Justifications in
#: PERF.md.
ALLOWED = {
    # ann_ivf_topk / ann_pq_topk left this list in r5: their integer-
    # lane conversion added lazy localCheckpoints at the build/probe
    # boundary, so the probe plan no longer re-derives the build.
    ("ann_lsh_topk", "embeddings"),
    ("ann_lsh_multiprobe_topk", "embeddings"),
    ("ann_recall_contract", "embeddings"),
    ("embedding_neardup_pairs", "embeddings"),
    ("centroid_cosine_matrix", "embeddings"),
    ("minhash_quality_eval", "documents"),
    ("minhash_lsh_neardup", "documents"),
    ("minhash_incremental_neardup", "documents"),
    ("setsim_prefix_join", "documents"),
    ("bm25_keyword_topk", "documents"),
    ("boolean_and_search", "documents"),
    ("hybrid_rrf_retrieval", "documents"),
    ("curation_gate_report", "documents"),
    ("importance_resample_weights", "documents"),
    ("length_dist_match_resample", "documents"),
    ("sample_allocation_largest_remainder", "documents"),
    ("generalize_to_k_anonymity", "documents"),
    ("source_tvd_shift", "documents"),
    ("growth_accounting_weekly", "events"),
    ("theil_sen_trend", "events"),
    ("event_value_mad_outliers", "events"),
    ("mad_outlier_census", "events"),
    ("bitmap_retention_churn", "events"),
    ("item_cf_similarity", "lineitem"),
    ("item_cf_similarity", "part"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=int, default=3,
                    help="flag same-table scan counts above this")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from sql_database_engine_spark import operators as ops
    from sql_database_engine_spark.session import get_spark

    ops.load_all()
    spark = get_spark("scan-audit", cpus=8)
    tag = re.escape(os.path.basename(args.sf.rstrip("/")))
    offenders = []
    for name, fn in ops.QUERIES.items():
        try:
            df = fn(spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # staging/streaming machinery quirks
            print(f"{name}: SKIP ({str(e)[:60]})")
            continue
        tables = re.findall(rf"{tag}/(\w+)\.parquet", plan)
        for t, c in Counter(tables).items():
            if c > args.threshold and (name, t) not in ALLOWED:
                offenders.append((name, t, c))
                print(f"{name}: {t} x{c}")
    spark.stop()
    print(f"\n{len(offenders)} offender(s) above threshold "
          f"{args.threshold} outside the allowlist")
    return 1 if offenders else 0


if __name__ == "__main__":
    raise SystemExit(main())
