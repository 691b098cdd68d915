#!/usr/bin/env python
"""Empty-input robustness sweep.

Every existing audit — oracle differential, determinism, fixture
shape, null injection — runs against POPULATED tables. No audit has
ever fed a single operator a zero-row input, yet at 100 TB empty
inputs are routine: a partition-pruned scan that eliminates every
file, a date filter beyond the data's range, a tenant with no rows,
an ingest batch that arrived empty. Operators built as driver-side
pipelines are structurally at risk in exactly this regime —
``.first()`` returning None, ``collect()[0]`` on nothing, min/max
seeds that come back NULL and poison arithmetic, Python kernels
handed a zero-row pandas batch, iterative loops whose convergence
check assumes a non-empty frame. SQL itself also diverges quietly:
global aggregates over zero rows return one row (COUNT=0, SUM=NULL)
while grouped aggregates return none — both engines implement the
standard, but only if the operator actually delegates to SQL.

This tool closes the class mechanically, in the null_sweep
tradition:

1. Stage a schema-exact replica of the testdata with zero rows —
   pyarrow ``table.slice(0, 0)`` preserves the arrow schema
   byte-for-byte, including the events TIMESTAMP(NANOS) encoding —
   for either EVERY table (tier ``all``) or just the fact-shaped
   tables (tier ``facts``: lineitem, orders, events, documents,
   embeddings), leaving dimensions populated. The ``facts`` tier is
   the sharper probe: dimension-driven plans still produce rows, so
   a divergence is a semantics bug, not trivially empty-vs-empty.
2. Run EVERY registered query — the Spark callable on the replica,
   the DuckDB oracle on views over the same replica — and require
   identical sorted-column row counts and value hashes. Rows-only
   queries run Spark-side only and must not raise. An ERROR on
   either side is a FAIL: an analytics engine must define every
   operator as a total function over the empty relation.

Perturbation proof (audit-of-the-audit): the sweep refuses to run
unless every emptied table has >0 source rows and exactly 0 replica
rows, and every non-emptied table kept its full row count.

Usage:
    python tools/empty_sweep.py --tier facts --tag r5d_empty_facts
    python tools/empty_sweep.py --tier all --only pricing_summary
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sql_database_engine_spark.catalog import (  # noqa: E402
    TABLE_NAMES as TABLES, register_duck_views)

_FACTS = {"orders", "lineitem", "events", "documents", "embeddings"}

#: tier -> {table: target row count}; tables absent copy as-is.
#: ``single`` is the OTHER sharp boundary: one row per table reaches
#: the n-1=0 sample-variance denominators, LAG/LEAD-over-one-row,
#: single-point interpolation, and no-pair joins that the zero-row
#: tiers short-circuit past (an operator guarded for n=0 is not
#: thereby guarded for n=1).
TIERS = {
    "all": {t: 0 for t in TABLES},
    "facts": {t: 0 for t in _FACTS},
    "single": {t: 1 for t in TABLES},
}

#: Queries whose docstring declares a non-empty-input contract; the
#: sweep still runs them and records the divergence without failing
#: the audit. Keep empty unless a docstring actually says so.
ALLOWED_EMPTY_CONTRACT: dict[str, str] = {}


def stage_replica(sf_dir: str, tier: str, root: str) -> tuple[str, dict]:
    """Schema-exact replica with the tier's tables truncated to zero
    rows; staged via pyarrow so physical encodings (nanos ts, binary)
    survive byte-for-byte. Returns (replica_dir, proof)."""
    import pyarrow.parquet as pq

    sys.path.insert(0, root)
    from sql_database_engine_spark.scratch import (scratch_dir,
                                                   source_fingerprint)
    key = "|".join(source_fingerprint(sf_dir, t + ".parquet")
                   for t in TABLES)
    replica = scratch_dir("empty_replica", sf_dir,
                          version=f"v2|{tier}|" + key)
    targets = TIERS[tier]
    proof: dict = {}
    for t in TABLES:
        src = os.path.join(sf_dir, t + ".parquet")
        dst = os.path.join(replica, t + ".parquet")
        tbl = pq.read_table(src)
        if not os.path.exists(dst):
            out = tbl.slice(0, targets[t]) if t in targets else tbl
            tmp = dst + f".tmp.{os.getpid()}"
            pq.write_table(out, tmp)
            os.rename(tmp, dst)
        proof[t] = {
            "rows_src": tbl.num_rows,
            "rows_dst": pq.read_table(dst).num_rows,
            "target": targets.get(t),
        }
    return replica, proof


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--tier", default="facts", choices=sorted(TIERS))
    ap.add_argument("--tag", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: all "
                         "registered; rows-only run Spark-side only)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    tag = args.tag or (f"empty_{args.tier}_"
                       f"{os.path.basename(args.sf.rstrip('/'))}_"
                       f"{os.getpid()}")
    outdir = os.path.join(root, "SWEEPS")
    os.makedirs(outdir, exist_ok=True)
    jsonl_path = os.path.join(outdir, f"{tag}.jsonl")
    summary_path = os.path.join(outdir, f"{tag}_summary.json")

    from cert_sweep import duck_rows, spark_rows, value_hash
    from sql_database_engine_spark import operators
    from sql_database_engine_spark.session import get_spark
    operators.load_all()

    replica, proof = stage_replica(args.sf, args.tier, root)
    perturbed = all(
        p["rows_dst"] == p["rows_src"] if p["target"] is None
        else (p["rows_dst"] == p["target"] and p["rows_src"] > p["target"])
        for p in proof.values())
    print(f"replica: {replica}", flush=True)
    print(f"perturbation proof -> {'OK' if perturbed else 'VACUOUS'}",
          flush=True)

    spark = get_spark("empty-sweep", cpus=args.cpus)
    import duckdb
    con = duckdb.connect()
    register_duck_views(con, replica)

    names = (args.only.split(",") if args.only
             else list(operators.ordered_queries()))
    n_pass = n_fail = n_rows_only = n_allowed = 0
    t_start = time.time()
    with open(jsonl_path, "w") as out:
        out.write(json.dumps({"query": "__perturbation_proof__",
                              "replica": replica, "tier": args.tier,
                              "tables": proof,
                              "perturbed": perturbed}) + "\n")
        out.flush()
        if not perturbed:
            with open(summary_path, "w") as f:
                json.dump({"tag": tag, "error": "VACUOUS"}, f)
            return 2
        for i, name in enumerate(names):
            rec: dict = {"query": name, "sf": args.sf, "tier": args.tier}
            t0 = time.time()
            try:
                a, a_cols = spark_rows(
                    operators.QUERIES[name](spark, replica))
                if name not in operators.ORACLES:
                    rec.update(status="RAN_ROWS_ONLY", spark_rows=len(a),
                               elapsed_s=round(time.time() - t0, 3))
                else:
                    b, b_cols = duck_rows(con, operators.ORACLES[name])
                    rec.update(
                        spark_rows=len(a), oracle_rows=len(b),
                        spark_cols=a_cols, oracle_cols=b_cols,
                        spark_hash=value_hash(a),
                        oracle_hash=value_hash(b),
                        elapsed_s=round(time.time() - t0, 3))
                    ok = (a_cols == b_cols and len(a) == len(b)
                          and rec["spark_hash"] == rec["oracle_hash"])
                    if ok:
                        rec["status"] = "PASS"
                    elif name in ALLOWED_EMPTY_CONTRACT:
                        rec["status"] = "ALLOWED_EMPTY_CONTRACT"
                        rec["contract"] = ALLOWED_EMPTY_CONTRACT[name]
                    else:
                        rec["status"] = "FAIL"
                    if not ok:
                        rec["mismatch"] = {
                            "rows_only_in_spark": sorted(
                                set(a) - set(b))[:20],
                            "rows_only_in_oracle": sorted(
                                set(b) - set(a))[:20],
                        }
            except Exception as exc:  # noqa: BLE001 — artifact, not control flow
                rec.update(status="ERROR",
                           # str() keeps the Java stack a bare
                           # repr(Py4JJavaError) hides
                           error=f"{type(exc).__name__}: {exc}"[:4000],
                           elapsed_s=round(time.time() - t0, 3))
            if rec["status"] in ("PASS", "ALLOWED_EMPTY_CONTRACT",
                                 "RAN_ROWS_ONLY"):
                n_pass += 1
                n_allowed += rec["status"] == "ALLOWED_EMPTY_CONTRACT"
                n_rows_only += rec["status"] == "RAN_ROWS_ONLY"
            else:
                n_fail += 1
            out.write(json.dumps(rec) + "\n")
            out.flush()
            os.fsync(out.fileno())
            print(f"[{i + 1}/{len(names)}] {rec['status']} {name} "
                  f"{rec.get('elapsed_s', '?')}s", flush=True)
    summary = {"tag": tag, "sf": args.sf, "tier": args.tier,
               "n_queries": len(names), "n_pass": n_pass,
               "n_fail": n_fail, "n_rows_only": n_rows_only,
               "n_allowed_contract": n_allowed,
               "total_s": round(time.time() - t_start, 1)}
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
