#!/usr/bin/env python
"""Determinism-under-partitioning sweep.

The r4 ``kcore_decomposition`` transient (ROUND4_NOTES.md:258, closed
in r5 as unreproduced-with-capture-proven) raised a defect class the
oracle differential can never catch: a query whose RESULT depends on
physical partitioning — float-sum accumulation order, ``first()``
without ordering, sketch merge order, top-k ties broken by task
arrival — can hash-green against DuckDB a hundred times and still
flake on the hundred-and-first, because the mismatch only appears
under a partition layout the gate never produces.

This tool hunts that class mechanically: every registered query
(INCLUDING the rows-only tier, which the oracle gate cannot touch)
runs twice in one session under two deliberately different physical
layouts, and the two canonical row sets must hash identically:

- layout A: the engine's defaults — ``spark.sql.shuffle.partitions``
  = SPARK_GRAFT_CPUS (32 in tests), 128 MB scan splits.
- layout B: ``spark.sql.shuffle.partitions = 7`` (odd, prime, not a
  divisor of anything), 256 KB ``maxPartitionBytes`` + 4 KB
  ``openCostInBytes`` so multi-row-group files split and small files
  stop coalescing — different scan tasks, different shuffle hash
  ranges, different AQE coalescing decisions.

Because ``session.tune()`` (run inside every public query callable)
re-derives shuffle parallelism from ``SPARK_GRAFT_CPUS``, the B
layout is injected through that env var, not ``spark.conf`` alone.

A PASS proves the query's values are a pure function of the DATA —
the property the exact-integer-lane design exists to guarantee. Any
FAIL is either a real nondeterminism bug or a documented
merge-order-dependent operator (sketch internals); both outcomes are
persisted with full diffs, streamed+fsynced per query like
cert_sweep.py, so a flake can never lose its evidence again.

Usage:
    python tools/determinism_sweep.py --sf /root/testdata/sf0.01 --tag r5_det
    python tools/determinism_sweep.py --only kcore_decomposition
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Layout B: everything that changes task boundaries without changing
# semantics. shuffle.partitions itself goes through SPARK_GRAFT_CPUS
# (see module docstring); these two are not in session.RUNTIME_CONFS
# so a plain conf.set sticks across tune().
B_CONFS = {
    "spark.sql.files.maxPartitionBytes": "262144",
    "spark.sql.files.openCostInBytes": "4096",
}
A_CONFS = {
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.files.openCostInBytes": "4194304",
}
B_CPUS = "7"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--tag", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: ALL "
                         "registered queries, rows-only included)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    tag = args.tag or f"det_{os.path.basename(args.sf.rstrip('/'))}_{os.getpid()}"
    outdir = os.path.join(root, "SWEEPS")
    os.makedirs(outdir, exist_ok=True)
    jsonl_path = os.path.join(outdir, f"{tag}.jsonl")
    summary_path = os.path.join(outdir, f"{tag}_summary.json")

    from cert_sweep import spark_rows, value_hash  # same canonicalization
    from sql_database_engine_spark import operators
    from sql_database_engine_spark.session import get_spark
    operators.load_all()
    spark = get_spark("determinism-sweep", cpus=args.cpus)

    names = (args.only.split(",") if args.only
             else list(operators.ordered_queries()))

    def layout_probe(cpus: str, confs: dict) -> dict:
        """Physical footprint of a layout: scan-split count for the
        biggest fact file and the shuffle parallelism a tune()'d
        callable actually sees. Used by the perturbation proof."""
        os.environ["SPARK_GRAFT_CPUS"] = cpus
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            from sql_database_engine_spark.session import tune
            tune(spark)
            scan = spark.read.parquet(os.path.join(args.sf, "lineitem.parquet"))
            return {
                "scan_splits": scan.rdd.getNumPartitions(),
                "shuffle_partitions": spark.conf.get(
                    "spark.sql.shuffle.partitions"),
            }
        finally:
            os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
            for k, v in A_CONFS.items():
                spark.conf.set(k, v)

    def run(name: str, cpus: str, confs: dict):
        os.environ["SPARK_GRAFT_CPUS"] = cpus
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            return spark_rows(operators.QUERIES[name](spark, args.sf))
        finally:
            os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
            for k, v in A_CONFS.items():
                spark.conf.set(k, v)

    # Perturbation proof — an invariance audit whose two layouts were
    # secretly identical would pass vacuously (the r4 vacuous-branch
    # lesson, applied to the audit itself). Refuse to run unless the
    # layouts demonstrably differ in physical execution.
    proof = {"a": layout_probe(str(args.cpus), A_CONFS),
             "b": layout_probe(B_CPUS, B_CONFS)}
    perturbed = (proof["a"]["scan_splits"] != proof["b"]["scan_splits"]
                 and proof["a"]["shuffle_partitions"]
                 != proof["b"]["shuffle_partitions"])
    print(f"perturbation proof: {json.dumps(proof)} "
          f"-> {'OK' if perturbed else 'VACUOUS'}", flush=True)

    n_pass = n_fail = 0
    t_start = time.time()
    with open(jsonl_path, "w") as out:
        out.write(json.dumps({"query": "__perturbation_proof__",
                              **proof, "perturbed": perturbed}) + "\n")
        out.flush()
        if not perturbed:
            summary = {"tag": tag, "sf": args.sf, "n_queries": 0,
                       "n_pass": 0, "n_fail": 0,
                       "error": "VACUOUS: layouts physically identical"}
            with open(summary_path, "w") as f:
                json.dump(summary, f, indent=1)
            return 2
        for i, name in enumerate(names):
            rec: dict = {"query": name, "sf": args.sf,
                         "layouts": {"a_cpus": args.cpus, "b_cpus": B_CPUS,
                                     "b_confs": B_CONFS}}
            t0 = time.time()
            try:
                a, a_cols = run(name, str(args.cpus), A_CONFS)
                b, b_cols = run(name, B_CPUS, B_CONFS)
                rec.update(
                    a_rows=len(a), b_rows=len(b),
                    a_cols=a_cols, b_cols=b_cols,
                    a_hash=value_hash(a), b_hash=value_hash(b),
                    elapsed_s=round(time.time() - t0, 3))
                ok = (a_cols == b_cols and len(a) == len(b)
                      and rec["a_hash"] == rec["b_hash"])
                rec["status"] = "PASS" if ok else "FAIL"
                if not ok:
                    rec["mismatch"] = {
                        "n_pairwise_diffs": sum(
                            sa != sb for sa, sb in zip(a, b)),
                        "first_pair_diffs": [
                            {"a": sa, "b": sb}
                            for sa, sb in zip(a, b) if sa != sb][:20],
                        "rows_only_in_a": sorted(set(a) - set(b))[:20],
                        "rows_only_in_b": sorted(set(b) - set(a))[:20],
                    }
            except Exception as exc:  # noqa: BLE001 — artifact, not control flow
                rec.update(status="ERROR",
                           # str() keeps the Java stack a bare
                           # repr(Py4JJavaError) hides
                           error=f"{type(exc).__name__}: {exc}"[:4000],
                           elapsed_s=round(time.time() - t0, 3))
            if rec["status"] == "PASS":
                n_pass += 1
            else:
                n_fail += 1
            out.write(json.dumps(rec) + "\n")
            out.flush()
            os.fsync(out.fileno())
            print(f"[{i+1}/{len(names)}] {rec['status']} {name} "
                  f"{rec.get('elapsed_s')}s", flush=True)
    summary = {"tag": tag, "sf": args.sf, "n_queries": len(names),
               "n_pass": n_pass, "n_fail": n_fail,
               "total_s": round(time.time() - t_start, 1)}
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
