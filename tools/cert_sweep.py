#!/usr/bin/env python
"""Certification sweep with persisted failure artifacts.

Round 4's sf0.1 sweep recorded one `kcore_decomposition` failure whose
detail was LOST TO OUTPUT CAPTURE and which never reproduced — a flake
that could not be inspected, so it could not be closed (VERDICT r4
item 2). This tool makes that impossible to repeat: it runs the full
Spark-vs-DuckDB oracle differential (the same canonicalization and
comparison as tests/test_oracle_differential.py and the driver's
correctness gate) and STREAMS per-query results to a JSONL file,
flushed after every query, so a crash, a kill, or a lost terminal
never loses a failing diff. On any mismatch it persists:

  - row counts and sorted column lists from both engines,
  - a sha256 value-hash of each side's canonical row set,
  - the first 20 mismatching row pairs (spark vs oracle),
  - rows present on only one side (first 20 each way).

Usage:
    python tools/cert_sweep.py --sf /root/testdata/sf0.1 --tag r5_sweep1
    python tools/cert_sweep.py --only kcore_decomposition,bfs_brand_distances

Artifacts land in SWEEPS/{tag}.jsonl (per query, streamed) and
SWEEPS/{tag}_summary.json (totals); the sweep exits nonzero if any
query failed. Commit the SWEEPS files with the round notes.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time


def canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def spark_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(canon(r[c]) for c in cols) for r in df.collect()), cols


def duck_rows(con, sql):
    res = con.sql(sql)
    cols = res.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = res.fetchall()
    return (sorted(tuple(canon(r[i]) for i in order) for r in rows),
            [cols[i] for i in order])


def dtype_asymmetries(sdf, con, sql):
    """The driver canonicalizes through PANDAS dtypes, and this
    harness's raw-Python canon() was provably blinder (VERDICT r6
    item 3: the HUGEINT bin column stringified identically here and
    hash-failed there). Every sweep therefore also materializes both
    sides to pandas and compares per-column dtype FAMILIES via
    oracle_type_audit — a value-equal pair in a family-asymmetric
    column (int-vs-float, Decimal-vs-float) now FAILS the cert."""
    import os
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    if here not in sys.path:  # once per process, not once per query
        sys.path.insert(0, here)
    from oracle_type_audit import dtype_pairs

    return dtype_pairs(sdf.toPandas(), con.sql(sql).df())


def value_hash(rows) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default=None,
                    help="artifact name; default cert_<sfbase>_<pid>")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: all oracled)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--skip-dtypes", action="store_true",
                    help="skip the pandas dtype-family check (it "
                         "re-executes the oracle once; worth skipping "
                         "only on sf0.1+ sweeps dominated by the heavy "
                         "replay oracles)")
    ap.add_argument("--prove-capture", action="store_true",
                    help="run one query against a deliberately corrupted "
                         "oracle and verify the failure artifact persists — "
                         "the proof the r4 flake demanded")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    tag = args.tag or f"cert_{os.path.basename(args.sf.rstrip('/'))}_{os.getpid()}"
    outdir = os.path.join(root, "SWEEPS")
    os.makedirs(outdir, exist_ok=True)
    jsonl_path = os.path.join(outdir, f"{tag}.jsonl")
    summary_path = os.path.join(outdir, f"{tag}_summary.json")

    from sql_database_engine_spark import operators
    from sql_database_engine_spark.session import get_spark
    operators.load_all()
    spark = get_spark("cert-sweep", cpus=args.cpus)

    import duckdb
    from sql_database_engine_spark.catalog import register_duck_views
    con = duckdb.connect()
    register_duck_views(con, args.sf)

    if args.prove_capture:
        # Corrupt one oracle (drop a row) so the sweep MUST fail and
        # the artifact path is exercised end to end.
        victim = args.only.split(",")[0] if args.only else "setop_except_all"
        operators.ORACLES[victim] = (
            f"SELECT * FROM ({operators.ORACLES[victim]}) LIMIT 1")
        args.only = victim

    names = (args.only.split(",") if args.only
             else [n for n in operators.ordered_queries()
                   if n in operators.ORACLES])
    n_pass = n_fail = 0
    t_start = time.time()
    with open(jsonl_path, "w") as out:
        for i, name in enumerate(names):
            rec: dict = {"query": name, "sf": args.sf}
            t0 = time.time()
            sdf = None
            try:
                sdf = operators.QUERIES[name](spark, args.sf)
                if not args.skip_dtypes:
                    sdf = sdf.cache()  # one Spark execution feeds both reads
                a, a_cols = spark_rows(sdf)
                b, b_cols = duck_rows(con, operators.ORACLES[name])
                # The duck side deliberately executes twice in default
                # mode: a DuckDB result can only be fetched once, and
                # the two lanes need DIFFERENT native conversions —
                # fetchall (raw Python values, the historical value
                # lane) vs .df() (the driver's pandas dtype lane).
                # --skip-dtypes exists for sweeps where the replay
                # oracles make that second execution expensive.
                # A skipped check records None, never [] — an artifact
                # reader must be able to tell "checked clean" from
                # "not checked" (review r7).
                asym = (None if args.skip_dtypes else
                        dtype_asymmetries(sdf, con, operators.ORACLES[name]))
                rec.update(
                    spark_rows=len(a), oracle_rows=len(b),
                    spark_cols=a_cols, oracle_cols=b_cols,
                    spark_hash=value_hash(a), oracle_hash=value_hash(b),
                    dtype_asymmetries=asym,
                    elapsed_s=round(time.time() - t0, 3))
                ok = (a_cols == b_cols and len(a) == len(b)
                      and rec["spark_hash"] == rec["oracle_hash"]
                      and not asym)
                rec["status"] = "PASS" if ok else "FAIL"
                if not ok:
                    pair_diffs = [
                        {"spark": sa, "oracle": sb}
                        for sa, sb in zip(a, b) if sa != sb][:20]
                    only_spark = sorted(set(a) - set(b))[:20]
                    only_oracle = sorted(set(b) - set(a))[:20]
                    rec["mismatch"] = {
                        "n_pairwise_diffs": sum(
                            sa != sb for sa, sb in zip(a, b)),
                        "first_pair_diffs": pair_diffs,
                        "rows_only_in_spark": only_spark,
                        "rows_only_in_oracle": only_oracle,
                    }
            except Exception as exc:  # noqa: BLE001 — artifact, not control flow
                rec.update(status="ERROR",
                           # str() keeps the Java stack a bare
                           # repr(Py4JJavaError) hides
                           error=f"{type(exc).__name__}: {exc}"[:4000],
                           elapsed_s=round(time.time() - t0, 3))
            finally:
                # A failing query must not pin its cached partitions
                # in executor memory for the remaining sweep.
                if sdf is not None and not args.skip_dtypes:
                    try:
                        sdf.unpersist()
                    except Exception:  # noqa: BLE001 — cleanup only
                        pass
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
               # the summary must carry the same checked-vs-skipped
               # distinction as the per-query records: a citation of
               # "cert passed with the dtype gate active" has to be
               # checkable from the artifact alone
               "dtype_gate": "skipped" if args.skip_dtypes else "on",
               "total_s": round(time.time() - t_start, 1)}
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
