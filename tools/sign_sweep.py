#!/usr/bin/env python
"""Negative-measure (sign-coverage) differential sweep.

Every money/measure lane in the fixtures is ALL-POSITIVE at every SF
(verified mechanically: min(o_totalprice), min(l_extendedprice),
min(events.value), min(s_acctbal at most SFs) > 0 — only
customer.c_acctbal ships negatives). Real warehouses are not so
polite: refunds, chargebacks, reversals, and corrections make
negative amounts routine. The engines genuinely disagree in this
regime when code is careless:

- Spark's integer ``div`` truncates toward ZERO; DuckDB's ``//``
  floors toward NEGATIVE INFINITY — identical on positive operands,
  off-by-one on any negative numerator. The engine's exact-integer
  lanes defend with |num|·sign decompositions, but only where the
  author remembered.
- ``F.floor``/``%``/fixed-point scaling flip their bias with sign.
- Filters like ``x > 0`` silently change which rows exist — fine,
  both engines see the same rows; the audit hunts DIVERGENCE, not
  distribution drift.

The sweep stages a replica where a deterministic ~25% of rows (md5
rule on the row pk — same cells every run, every engine) have the
measure's SIGN FLIPPED in the data itself, then requires
Spark-vs-DuckDB hash equality over the replica for every oracled
query (rows-only queries run crash-checked). Magnitudes are
unchanged, so integer-overflow headroom is identical to the source.

Perturbation proof: every flipped column must have a negative
minimum in the replica and a non-negative one in the source, with
row counts equal; the sweep refuses to run otherwise (VACUOUS).

Usage:
    python tools/sign_sweep.py --tag r5e_sign
    python tools/sign_sweep.py --only decayed_user_value
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

#: table -> (pk expr seeding the md5 rule, [columns to sign-flip]).
FLIP = {
    "orders": ("o_orderkey", ["o_totalprice"]),
    "lineitem": ("concat(l_orderkey, '-', l_linenumber)",
                 ["l_extendedprice"]),
    "events": ("event_id", ["value"]),
    "supplier": ("s_suppkey", ["s_acctbal"]),
}

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sql_database_engine_spark.catalog import (  # noqa: E402
    TABLE_NAMES as TABLES, register_duck_views)

#: Queries whose docstring declares a positive-measure contract; the
#: sweep still runs them and records the divergence without failing
#: the audit. Keep empty unless a docstring actually says so.
ALLOWED_SIGN_CONTRACT: dict[str, str] = {}


def stage_replica(sf_dir: str, root: str) -> tuple[str, dict]:
    """Sign-flipped replica staged in DuckDB (engine-independent md5
    rule: ``substr(md5(pk || '|' || col), 1, 1) < '4'`` — 4/16 of the
    hex alphabet = 25% of rows)."""
    import duckdb

    sys.path.insert(0, root)
    from sql_database_engine_spark.scratch import (scratch_dir,
                                                   source_fingerprint)
    key = "|".join(source_fingerprint(sf_dir, t + ".parquet")
                   for t in TABLES)
    replica = scratch_dir("sign_replica", sf_dir, version="v1|" + key)
    con = duckdb.connect()
    proof: dict = {}
    for t in TABLES:
        src = os.path.join(sf_dir, t + ".parquet")
        dst = os.path.join(replica, t + ".parquet")
        pk, cols = FLIP.get(t, (None, []))
        marker = os.path.join(replica, f"_STAGED_{t}")
        if not os.path.exists(marker):
            desc = con.execute(
                f"SELECT * FROM read_parquet('{src}') LIMIT 0").description
            sel = []
            for name, *_ in desc:
                if name in cols:
                    cond = (f"substr(md5(concat(({pk})::VARCHAR,"
                            f" '|', '{name}')), 1, 1) < '4'")
                    sel.append(f'CASE WHEN {cond} THEN -"{name}" '
                               f'ELSE "{name}" END AS "{name}"')
                else:
                    sel.append(f'"{name}"')
            con.execute(
                f"COPY (SELECT {', '.join(sel)} FROM read_parquet('{src}'))"
                f" TO '{dst}' (FORMAT PARQUET)")
            open(marker, "w").close()
        mins = {}
        for c in cols:
            mins[c] = {
                "src_min": con.execute(
                    f'SELECT min("{c}") FROM read_parquet(\'{src}\')'
                ).fetchone()[0],
                "dst_min": con.execute(
                    f'SELECT min("{c}") FROM read_parquet(\'{dst}\')'
                ).fetchone()[0],
            }
        proof[t] = {
            "rows_src": con.execute(
                f"SELECT count(*) FROM read_parquet('{src}')").fetchone()[0],
            "rows_dst": con.execute(
                f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0],
            "mins": mins,
        }
    con.close()
    return replica, proof


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--tag", default=None)
    ap.add_argument("--only", default=None)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    tag = args.tag or (f"sign_{os.path.basename(args.sf.rstrip('/'))}_"
                       f"{os.getpid()}")
    outdir = os.path.join(root, "SWEEPS")
    os.makedirs(outdir, exist_ok=True)
    jsonl_path = os.path.join(outdir, f"{tag}.jsonl")
    summary_path = os.path.join(outdir, f"{tag}_summary.json")

    from cert_sweep import duck_rows, spark_rows, value_hash
    from sql_database_engine_spark import operators
    from sql_database_engine_spark.session import get_spark
    operators.load_all()

    replica, proof = stage_replica(args.sf, root)
    perturbed = all(
        p["rows_src"] == p["rows_dst"]
        and all(m["dst_min"] is not None and m["dst_min"] < 0
                and (m["src_min"] is None or m["src_min"] >= 0
                     or t == "supplier")
                for m in p["mins"].values())
        for t, p in proof.items() if p["mins"])
    print(f"replica: {replica}", flush=True)
    print(f"perturbation proof -> {'OK' if perturbed else 'VACUOUS'}",
          flush=True)

    spark = get_spark("sign-sweep", cpus=args.cpus)
    import duckdb
    con = duckdb.connect()
    register_duck_views(con, replica)

    names = (args.only.split(",") if args.only
             else list(operators.ordered_queries()))
    n_pass = n_fail = n_rows_only = n_allowed = 0
    t_start = time.time()
    with open(jsonl_path, "w") as out:
        out.write(json.dumps({"query": "__perturbation_proof__",
                              "replica": replica, "tables": proof,
                              "perturbed": perturbed}, default=str) + "\n")
        out.flush()
        if not perturbed:
            with open(summary_path, "w") as f:
                json.dump({"tag": tag, "error": "VACUOUS"}, f)
            return 2
        for i, name in enumerate(names):
            rec: dict = {"query": name, "sf": args.sf}
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
                    elif name in ALLOWED_SIGN_CONTRACT:
                        rec["status"] = "ALLOWED_SIGN_CONTRACT"
                        rec["contract"] = ALLOWED_SIGN_CONTRACT[name]
                    else:
                        rec["status"] = "FAIL"
                    if not ok:
                        rec["mismatch"] = {
                            "n_pairwise_diffs": sum(
                                sa != sb for sa, sb in zip(a, b)),
                            "first_pair_diffs": [
                                {"spark": sa, "oracle": sb}
                                for sa, sb in zip(a, b) if sa != sb][:20],
                            "rows_only_in_spark": sorted(
                                set(a) - set(b))[:20],
                            "rows_only_in_oracle": sorted(
                                set(b) - set(a))[:20],
                        }
            except Exception as exc:  # noqa: BLE001 — artifact, not control flow
                rec.update(status="ERROR",
                           error=f"{type(exc).__name__}: {exc}"[:4000],
                           elapsed_s=round(time.time() - t0, 3))
            if rec["status"] in ("PASS", "ALLOWED_SIGN_CONTRACT",
                                 "RAN_ROWS_ONLY"):
                n_pass += 1
                n_allowed += rec["status"] == "ALLOWED_SIGN_CONTRACT"
                n_rows_only += rec["status"] == "RAN_ROWS_ONLY"
            else:
                n_fail += 1
            out.write(json.dumps(rec) + "\n")
            out.flush()
            os.fsync(out.fileno())
            print(f"[{i + 1}/{len(names)}] {rec['status']} {name} "
                  f"{rec.get('elapsed_s', '?')}s", flush=True)
    summary = {"tag": tag, "sf": args.sf,
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
