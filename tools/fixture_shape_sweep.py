#!/usr/bin/env python
"""Fixture-shape invariance sweep.

The round-5 streaming work found a defect class no existing audit
could see: ``_stream_dir`` symlinked ``events.parquet`` into the
monitored directory as if it were a file, so a DIRECTORY-shaped
events table (the production layout — every real pipeline writes
parquet tables as directories of part files) listed zero files and
the drain silently streamed nothing. The oracle differential, the
determinism sweep, and the overflow sweeps all read the same
single-file fixtures the driver ships, so none of them could ever
produce that layout.

This tool hunts the class mechanically: stage a directory-shaped
replica of the testdata (each table rewritten as a 3-part parquet
directory, logically identical rows), then run EVERY registered
query (rows-only tier included) against both fixtures in one session
and require bit-identical canonical value hashes. A PASS proves the
query's result is a pure function of the LOGICAL data — independent
of whether a table arrives as one file or a directory of parts, and
(for events) independent of the physical timestamp encoding, because
the replica write converts the shipped TIMESTAMP(NANOS) file into a
plain BIGINT-nanos part set, exercising ``catalog._canonicalize``'s
other branch.

Perturbation proof (the audit-of-the-audit rule): the sweep refuses
to run unless every staged table is a real multi-part directory with
exactly the source's row count.

Usage:
    python tools/fixture_shape_sweep.py --sf /root/testdata/sf0.01 --tag r5_shape
    python tools/fixture_shape_sweep.py --only stream_tumbling_counts
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sql_database_engine_spark.catalog import (  # noqa: E402
    TABLE_NAMES as TABLES)
N_PARTS = 3

#: Queries whose VALUES are documented as physical-order/merge-order
#: dependent — the replica permutes row order (repartition), and these
#: are exactly the sketch internals the registry already declares
#: rows-only for that reason (their flanking error-bound contracts ARE
#: shape-invariant and stay in the strict set). The sweep still runs
#: them and records the divergence; it just doesn't fail the audit
#: over a documented boundary. First sweep at sf0.01 caught precisely
#: this one query (one p50 cell moved 53219.57 -> 53221.42, within the
#: kll_merge_quantile_contract's pinned error bound) — the audit
#: detecting the one declared-weak query is its positive control.
ALLOWED_ORDER_DEPENDENT: set = set()
# (Empty since round 8: the set's one entry, `agg_sketch_percentiles`
# — Spark approx_percentile QuantileSummaries, whose compression is
# merge-order-sensitive — was retired from the registry, VERDICT r7
# item 3. The historical positive control stands: the first sf0.01
# sweep caught exactly that declared-weak query and nothing else.)


def stage_replica(spark, sf_dir: str) -> tuple[str, dict]:
    """Directory-shaped replica of every table under scratch, keyed on
    the source fingerprints so regenerated testdata re-stages. Returns
    (replica_dir, proof) where proof records per-table part counts and
    row counts vs the source."""
    from sql_database_engine_spark.scratch import (scratch_dir,
                                                   source_fingerprint)

    key = "|".join(source_fingerprint(sf_dir, t + ".parquet")
                   for t in TABLES)
    replica = scratch_dir("shape_replica", sf_dir, version="v1|" + key)
    proof: dict = {}
    for t in TABLES:
        src = os.path.join(sf_dir, t + ".parquet")
        dst = os.path.join(replica, t + ".parquet")
        marker = os.path.join(replica, f"_STAGED_{t}")
        if not os.path.exists(marker):
            df = spark.read.parquet(src)
            df.repartition(N_PARTS).write.mode("overwrite").parquet(dst)
            open(marker, "w").close()
        parts = [f for f in os.listdir(dst)
                 if f.endswith(".parquet") and not f.startswith(".")]
        proof[t] = {
            "is_dir": os.path.isdir(dst),
            "n_parts": len(parts),
            "src_rows": spark.read.parquet(src).count(),
            "dst_rows": spark.read.parquet(dst).count(),
        }
    return replica, proof


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
    tag = args.tag or (
        f"shape_{os.path.basename(args.sf.rstrip('/'))}_{os.getpid()}")
    outdir = os.path.join(root, "SWEEPS")
    os.makedirs(outdir, exist_ok=True)
    jsonl_path = os.path.join(outdir, f"{tag}.jsonl")
    summary_path = os.path.join(outdir, f"{tag}_summary.json")

    from cert_sweep import spark_rows, value_hash  # same canonicalization
    from sql_database_engine_spark import operators
    from sql_database_engine_spark.session import get_spark
    operators.load_all()
    spark = get_spark("fixture-shape-sweep", cpus=args.cpus)

    names = (args.only.split(",") if args.only
             else list(operators.ordered_queries()))

    replica, proof = stage_replica(spark, args.sf)
    perturbed = all(
        p["is_dir"] and p["n_parts"] >= 2 and p["src_rows"] == p["dst_rows"]
        for p in proof.values())
    print(f"replica: {replica}", flush=True)
    print(f"perturbation proof: {json.dumps(proof)} "
          f"-> {'OK' if perturbed else 'VACUOUS'}", flush=True)

    n_pass = n_fail = n_allowed = 0
    t_start = time.time()
    with open(jsonl_path, "w") as out:
        out.write(json.dumps({"query": "__perturbation_proof__",
                              "replica": replica, "tables": proof,
                              "perturbed": perturbed}) + "\n")
        out.flush()
        if not perturbed:
            summary = {"tag": tag, "sf": args.sf, "n_queries": 0,
                       "n_pass": 0, "n_fail": 0,
                       "error": "VACUOUS: replica not multi-part or "
                                "row counts drifted"}
            with open(summary_path, "w") as f:
                json.dump(summary, f, indent=1)
            return 2
        for i, name in enumerate(names):
            rec: dict = {"query": name, "sf": args.sf, "replica": replica}
            t0 = time.time()
            try:
                a, a_cols = spark_rows(
                    operators.QUERIES[name](spark, args.sf))
                b, b_cols = spark_rows(
                    operators.QUERIES[name](spark, replica))
                rec.update(
                    a_rows=len(a), b_rows=len(b),
                    a_cols=a_cols, b_cols=b_cols,
                    a_hash=value_hash(a), b_hash=value_hash(b),
                    elapsed_s=round(time.time() - t0, 3))
                ok = (a_cols == b_cols and len(a) == len(b)
                      and rec["a_hash"] == rec["b_hash"])
                if ok:
                    rec["status"] = "PASS"
                elif (name in ALLOWED_ORDER_DEPENDENT
                      and a_cols == b_cols and len(a) == len(b)):
                    rec["status"] = "ALLOWED_DIVERGENCE"
                else:
                    rec["status"] = "FAIL"
                if not ok:
                    rec["mismatch"] = {
                        "n_pairwise_diffs": sum(
                            sa != sb for sa, sb in zip(a, b)),
                        "first_pair_diffs": [
                            {"a": sa, "b": sb}
                            for sa, sb in zip(a, b) if sa != sb][:20],
                        "rows_only_in_single_file": sorted(
                            set(a) - set(b))[:20],
                        "rows_only_in_dir_shape": sorted(
                            set(b) - set(a))[:20],
                    }
            except Exception as exc:  # noqa: BLE001 — artifact, not control flow
                rec.update(status="ERROR",
                           # str() keeps the Java stack a bare
                           # repr(Py4JJavaError) hides
                           error=f"{type(exc).__name__}: {exc}"[:4000],
                           elapsed_s=round(time.time() - t0, 3))
            if rec["status"] == "ALLOWED_DIVERGENCE":
                n_allowed += 1
            if rec["status"] in ("PASS", "ALLOWED_DIVERGENCE"):
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
               "n_allowed_divergence": n_allowed,
               "total_s": round(time.time() - t_start, 1)}
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
