#!/usr/bin/env python
"""NULL-semantics differential sweep.

The driver's fixtures contain ZERO nulls in any column of any table
(verified mechanically: count(*) - count(col) == 0 for all 10 tables
at every SF). Consequently the entire oracle differential — 397
queries, green at three SFs — has never exercised a single NULL code
path: null-ordering in window ORDER BY (where Spark's ASC default is
NULLS FIRST but DuckDB's is NULLS LAST), aggregate null-skipping,
concat vs || propagation, 3-valued filter logic, pandas-kernel None
handling. At 100 TB real data HAS nulls (failed scrapes, absent
measures, late-arriving attributes), so "hash-green on null-free
fixtures" is a weaker statement than it looks. This tool closes the
class mechanically, in the fixture_shape_sweep tradition:

1. Stage a null-injected replica of the testdata: for each table, a
   curated set of columns gets ~3.1% of its values replaced by NULL
   under a deterministic, engine-independent rule —
   ``substr(md5(concat(<pk>, '|', '<col>')), 1, 2) < '08'`` — so the
   same (row, column) cells are null on every run and every engine.
   Primary/foreign keys stay non-null in the default tier (referential
   structure is a property of upstream constraints, not luck); the
   ``full`` tier additionally nulls the big payload columns
   (documents.text, embeddings.embedding, events.user_id) to probe
   kernel robustness against absent payloads.
2. Run EVERY oracled query twice — the Spark callable against the
   replica dir, the DuckDB oracle against views over the same replica
   — and require identical sorted-column row counts and value hashes
   (the driver-gate comparison, imported from cert_sweep). Rows-only
   queries run Spark-side only and must not raise.

Perturbation proof (audit-of-the-audit): the sweep refuses to run
unless every injected column actually contains nulls in the replica
and every table's row count matches the source.

A PASS proves Spark and DuckDB agree on the query's semantics OVER
NULL-BEARING DATA — not merely on the null-free happy path.

Usage:
    python tools/null_sweep.py --sf /root/testdata/sf0.001 --tag r5c_null
    python tools/null_sweep.py --tier full --only bm25_keyword_topk
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

#: tier -> table -> (pk_expr, [columns to inject]).
#: The pk expression seeds the md5 rule; it must be non-null and
#: unique per row so injection is a pure function of row identity.
INJECT = {
    "measures": {
        "customer": ("c_custkey", ["c_name", "c_acctbal", "c_mktsegment"]),
        "supplier": ("s_suppkey", ["s_name", "s_acctbal"]),
        "part": ("p_partkey",
                 ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]),
        "orders": ("o_orderkey",
                   ["o_orderstatus", "o_totalprice", "o_orderdate",
                    "o_orderpriority"]),
        "lineitem": ("concat(l_orderkey, '-', l_linenumber)",
                     ["l_quantity", "l_extendedprice", "l_discount",
                      "l_tax", "l_returnflag", "l_linestatus",
                      "l_shipdate"]),
        "events": ("event_id", ["event_type", "value", "props"]),
        "documents": ("doc_id", ["lang", "source", "n_chars"]),
        "embeddings": ("vec_id", ["label"]),
    },
}
#: full = measures + payload columns (absent-payload robustness).
INJECT["full"] = {
    t: (pk, list(cols)) for t, (pk, cols) in INJECT["measures"].items()
}
INJECT["full"]["documents"][1].append("text")
INJECT["full"]["embeddings"][1].append("embedding")
INJECT["full"]["events"][1].append("user_id")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from sql_database_engine_spark.catalog import (  # noqa: E402
    TABLE_NAMES as TABLES, register_duck_views)

#: Queries documented as requiring non-null input on specific columns
#: (docstring contract) — the sweep still runs them and records the
#: divergence, it just doesn't fail the audit over a declared
#: boundary. Keep this empty unless a docstring actually says so.
ALLOWED_NULL_CONTRACT: dict[str, str] = {}


def stage_replica(sf_dir: str, tier: str, root: str) -> tuple[str, dict]:
    """Null-injected single-file-per-table replica under scratch,
    staged entirely in DuckDB (no Spark needed). Returns
    (replica_dir, proof): per injected column the replica null count
    (must be > 0) and per table the row count vs source."""
    import duckdb

    sys.path.insert(0, root)
    from sql_database_engine_spark.scratch import (scratch_dir,
                                                   source_fingerprint)
    key = "|".join(source_fingerprint(sf_dir, t + ".parquet")
                   for t in TABLES)
    replica = scratch_dir("null_replica", sf_dir,
                          version=f"v3|{tier}|" + key)
    spec = INJECT[tier]
    con = duckdb.connect()
    proof: dict = {}
    for t in TABLES:
        src = os.path.join(sf_dir, t + ".parquet")
        dst = os.path.join(replica, t + ".parquet")
        pk, cols = spec.get(t, (None, []))
        marker = os.path.join(replica, f"_STAGED_{t}")
        if not os.path.exists(marker):
            desc = con.execute(
                f"SELECT * FROM read_parquet('{src}') LIMIT 0").description
            sel = []
            for name, *_ in desc:
                if name in cols:
                    # ~3.1% of rows, plus ALWAYS the min-pk row so even
                    # a 10-row table deterministically exercises the
                    # null path in every injected column.
                    cond = (f"substr(md5(concat(({pk})::VARCHAR,"
                            f" '|', '{name}')), 1, 2) < '08'"
                            f" OR ({pk})::VARCHAR = (SELECT"
                            f" min(({pk})::VARCHAR) FROM"
                            f" read_parquet('{src}'))")
                    sel.append(f'CASE WHEN {cond} THEN NULL '
                               f'ELSE "{name}" END AS "{name}"')
                else:
                    sel.append(f'"{name}"')
            con.execute(
                f"COPY (SELECT {', '.join(sel)} FROM read_parquet('{src}'))"
                f" TO '{dst}' (FORMAT PARQUET)")
            open(marker, "w").close()
        nulls = {}
        for c in cols:
            nulls[c] = con.execute(
                f'SELECT count(*) - count("{c}") '
                f"FROM read_parquet('{dst}')").fetchone()[0]
        proof[t] = {
            "rows_src": con.execute(
                f"SELECT count(*) FROM read_parquet('{src}')").fetchone()[0],
            "rows_dst": con.execute(
                f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0],
            "nulls": nulls,
        }
    con.close()
    return replica, proof


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--tier", default="measures",
                    choices=sorted(INJECT))
    ap.add_argument("--tag", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: all "
                         "registered; rows-only run Spark-side only)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    tag = args.tag or (f"null_{args.tier}_"
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
        p["rows_src"] == p["rows_dst"]
        and all(n > 0 for n in p["nulls"].values())
        for p in proof.values())
    print(f"replica: {replica}", flush=True)
    print(f"perturbation proof -> {'OK' if perturbed else 'VACUOUS'}",
          flush=True)

    spark = get_spark("null-sweep", cpus=args.cpus)
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
                    elif name in ALLOWED_NULL_CONTRACT:
                        rec["status"] = "ALLOWED_NULL_CONTRACT"
                        rec["contract"] = ALLOWED_NULL_CONTRACT[name]
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
                           # str() keeps the Java stack a bare
                           # repr(Py4JJavaError) hides
                           error=f"{type(exc).__name__}: {exc}"[:4000],
                           elapsed_s=round(time.time() - t0, 3))
            if rec["status"] in ("PASS", "ALLOWED_NULL_CONTRACT",
                                 "RAN_ROWS_ONLY"):
                n_pass += 1
                n_allowed += rec["status"] == "ALLOWED_NULL_CONTRACT"
                n_rows_only += rec["status"] == "RAN_ROWS_ONLY"
            else:
                n_fail += 1
            out.write(json.dumps(rec) + "\n")
            out.flush()
            os.fsync(out.fileno())
            print(f"[{i+1}/{len(names)}] {rec['status']} {name} "
                  f"{rec.get('elapsed_s')}s", flush=True)
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
