#!/usr/bin/env python
"""Oracle-side cost probe: how expensive is the ASSURANCE, not the engine.

VERDICT r5 item 7: two oracles replay superlinear work on the DuckDB
side — `minhash_quality_eval` recomputes the exact pairwise truth set,
and the staged-IVF oracles replay the full k-means build through the
recursive-CTE Lloyd chain. The differential gate is only viable if the
oracle itself stays affordable at the gate SF, so this tool times the
ORACLE SQL ALONE (no Spark at all) at two SFs and reports the growth
exponent, giving each watched query a declared budget.

Usage:
    python tools/oracle_budget.py                       # default watch list
    python tools/oracle_budget.py --only name1,name2
    python tools/oracle_budget.py --budget-s 120

Writes SWEEPS/oracle_budget.json and prints a markdown table for
PERF.md. Exits nonzero if any watched oracle exceeds the per-query
budget at the LARGER SF — the signal to shrink the oracle (smaller
replay lane, tighter fixture) before the next SF bump, not after the
gate starts timing out.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

# The oracles whose cost is structurally superlinear (full pairwise
# truth, iterative build replay) — the ones worth a standing budget.
WATCH = [
    "minhash_quality_eval",       # exact pairwise Jaccard truth set
    "ann_ivf_staged_topk",        # full k-means build replay (recursive CTE)
    "ann_ivf_staged_append_probe",  # build replay + append merge
    "ann_ivf_topk",               # in-plan build, same Lloyd chain
    "ann_pq_topk",                # per-subspace codebook replay
    "doc_winnowing_fingerprints",  # recursive-CTE window walk
    # round-7 hex-replay conversions: the byte-sum oracle LATERAL-
    # unnests one row per corpus byte — linear by construction, but
    # it is the registry's largest constant-factor unnest, so it
    # earns a standing budget row.
    "multimodal_byte_features",
    "multimodal_frame_stub_sample",
    # round-9: the recursive-CTE closure oracle whose pre-closure
    # CTEs must stay AS MATERIALIZED (DuckDB re-inlines the edge
    # derivation into every recursive iteration otherwise — measured
    # 13.5 s -> 0.34 s at sf0.01); a standing row catches the
    # regression if the hint is ever lost.
    "scc_mutual_reach_brands",
]


def time_oracle(con, sql: str, reps: int = 3) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--sfs", default="/root/testdata/sf0.01,/root/testdata/sf0.1")
    ap.add_argument("--budget-s", type=float, default=120.0,
                    help="max oracle-side seconds per query at the larger SF")
    args = ap.parse_args()

    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as contract
    oracles = contract.oracle_sql()
    names = ([n for n in args.only.split(",") if n] if args.only else
             [n for n in WATCH if n in oracles])
    # Validate up front (ADVICE r6): a typo in --only otherwise
    # crashes mid-run with a bare KeyError at oracles[n].
    unknown = [n for n in names if n not in oracles]
    if unknown:
        ap.error(f"unknown query (not in the oracle registry): {unknown}")

    # Spark-free import (ADVICE r7): the view bootstrap lives in
    # tables.py, so this DuckDB-only tool's own machinery never pulls
    # pyspark. (Loading the oracle REGISTRY via __spark_entry__ above
    # still does — the oracles are registered alongside their Spark
    # query builders — but --help and arg validation stay instant.)
    from sql_database_engine_spark.tables import register_duck_views

    sf_dirs = args.sfs.split(",")

    # Validate --sfs up front too (review r7): these checks used to
    # run AFTER the full two-SF timing loop, so a reversed or
    # unparseable --sfs spent the entire run before erroring.
    def sf_of(d: str) -> float:
        import re
        m = re.search(r"sf([0-9.]+)", d)
        if not m:
            ap.error(f"no sfN segment in {d!r} — the growth exponent "
                     "needs two directories with parseable SFs")
        return float(m.group(1))

    scale = sf_of(sf_dirs[-1]) / sf_of(sf_dirs[0])
    if scale <= 1:
        ap.error(f"--sfs must go small,large (got scale {scale:g}; "
                 "a growth exponent needs scale > 1)")

    results: dict[str, dict] = {n: {} for n in names}
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        register_duck_views(con, sf_dir)
        for n in names:
            results[n][sf_dir] = round(time_oracle(con, oracles[n]), 3)
        con.close()

    lo, hi = sf_dirs[0], sf_dirs[-1]
    over = []
    rows = []
    for n in names:
        a, b = results[n][lo], results[n][hi]
        # growth exponent e such that cost ~ SF^e (scale > 1 is
        # guaranteed by the up-front --sfs validation)
        exp = math.log(max(b, 1e-3) / max(a, 1e-3)) / math.log(scale)
        ok = b <= args.budget_s
        if not ok:
            over.append(n)
        rows.append((n, a, b, round(exp, 2), "OK" if ok else "OVER"))

    out = {"budget_s": args.budget_s, "sf_lo": lo, "sf_hi": hi,
           "results": results,
           "rows": [{"query": r[0], "lo_s": r[1], "hi_s": r[2],
                     "exponent": r[3], "status": r[4]} for r in rows],
           "over_budget": over}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(here, "SWEEPS", "oracle_budget.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")

    print("| query | oracle s @ sf%.3g | oracle s @ sf%.3g | growth exp | budget |"
          % (sf_of(lo), sf_of(hi)))
    print("|---|---|---|---|---|")
    for n, a, b, e, s in rows:
        print(f"| `{n}` | {a} | {b} | {e} | {s} |")
    print(f"\nwrote {path}; budget {args.budget_s}s/query at {hi}")
    return 1 if over else 0


if __name__ == "__main__":
    raise SystemExit(main())
