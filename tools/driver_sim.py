#!/usr/bin/env python
"""Dress rehearsal of the external correctness driver.

The driver owns its own SparkSession (the brief's literal recipe —
``SparkSession.builder.master("local[N]").config(
"spark.sql.shuffle.partitions", N)`` — NOT this repo's ``get_spark``)
and runs the first 50 entries of ``ordered_queries()`` against their
``oracle_sql()`` twins at sf0.01. Every engine conf the queries need
(UTC timezone, nanosAsLong for events.parquet, Arrow, AQE) must
therefore come from ``session.tune()`` running INSIDE each callable,
not from session construction — which is exactly the coupling this
rehearsal exists to exercise. The r5 ANN conversions were checked
this way one-by-one; this tool does it for the whole prefix so a
conf-dependence regression can never reach the real gate first.

Usage:
    python tools/driver_sim.py [--sf /root/testdata/sf0.01] [--n 50]

Artifacts stream to SWEEPS/{tag}.jsonl exactly like cert_sweep.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--tag", default="driver_sim")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    outdir = os.path.join(root, "SWEEPS")
    os.makedirs(outdir, exist_ok=True)
    jsonl_path = os.path.join(outdir, f"{args.tag}.jsonl")
    summary_path = os.path.join(outdir, f"{args.tag}_summary.json")

    # The driver's session, per the brief — deliberately NOT get_spark.
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("driver-sim")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    import duckdb
    from sql_database_engine_spark.catalog import register_duck_views
    con = duckdb.connect()
    register_duck_views(con, args.sf)

    import __spark_entry__ as entry
    from cert_sweep import duck_rows, spark_rows, value_hash

    # The driver's smoke check first: entry() must run and return rows
    # with a stable schema.
    smoke = entry.entry(spark)
    print(f"entry() smoke: {smoke.count()} rows, "
          f"schema={[f.name for f in smoke.schema.fields]}", flush=True)

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = list(queries)[:args.n]

    n_pass = n_fail = 0
    t_start = time.time()
    with open(jsonl_path, "w") as out:
        for i, name in enumerate(names):
            rec: dict = {"query": name, "sf": args.sf,
                         "oracled": name in oracles}
            t0 = time.time()
            try:
                a, a_cols = spark_rows(queries[name](spark, args.sf))
                rec.update(spark_rows=len(a), spark_cols=a_cols,
                           spark_hash=value_hash(a))
                if name in oracles:
                    b, b_cols = duck_rows(con, oracles[name])
                    rec.update(oracle_rows=len(b), oracle_cols=b_cols,
                               oracle_hash=value_hash(b))
                    ok = (a_cols == b_cols and len(a) == len(b)
                          and rec["spark_hash"] == rec["oracle_hash"])
                    if not ok:
                        rec["mismatch"] = {
                            "rows_only_in_spark": sorted(set(a) - set(b))[:20],
                            "rows_only_in_oracle": sorted(set(b) - set(a))[:20],
                        }
                else:
                    ok = True  # driver records a weaker rows-only check
                rec["status"] = "PASS" if ok else "FAIL"
                rec["elapsed_s"] = round(time.time() - t0, 3)
            except Exception as exc:  # noqa: BLE001 — artifact, not control flow
                rec.update(status="ERROR", error=repr(exc)[:2000],
                           elapsed_s=round(time.time() - t0, 3))
            n_pass += rec["status"] == "PASS"
            n_fail += rec["status"] != "PASS"
            out.write(json.dumps(rec) + "\n")
            out.flush()
            os.fsync(out.fileno())
            print(f"[{i+1}/{len(names)}] {rec['status']} {name} "
                  f"{rec.get('elapsed_s')}s", flush=True)
    summary = {"tag": args.tag, "sf": args.sf, "n_queries": len(names),
               "n_pass": n_pass, "n_fail": n_fail,
               "total_s": round(time.time() - t_start, 1)}
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
