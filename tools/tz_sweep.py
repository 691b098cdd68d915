#!/usr/bin/env python
"""DST-coverage (timezone) differential sweep.

The events fixture spans 2024-01-01..01-30 — deep midwinter, so no
timestamp has ever crossed a daylight-saving transition, and every
IANA-zone code path (``timezone_daily_rollup``'s America/New_York
business days, any local-calendar bucketing) has only been
differentially exercised in the fixed EST regime. DST is where
engines genuinely diverge when careless: Spark resolves zones via
Java tzdata, DuckDB via ICU, and the two disagree historically on
gap/ambiguity RESOLUTION (the nonexistent 02:30 on spring-forward
day; the twice-occurring 01:30 on fall-back day) even while agreeing
on well-defined instants.

The sweep stages a replica with every events.ts shifted by a
constant interval — all inter-event deltas, sessions, and windows
are preserved exactly; only the calendar mapping changes:

- tier ``spring``: +69 days → 2024-03-10..04-08, crossing the US
  spring-forward (2024-03-10 02:00 EST -> 03:00 EDT, an hour that
  does not exist locally).
- tier ``fall``: +307 days → 2024-11-03..12-02, crossing fall-back
  (2024-11-03 02:00 EDT -> 01:00 EST, a local hour that occurs
  twice).

Both engines read the SAME shifted replica; the audit hunts
cross-engine divergence in zone arithmetic, not distribution drift.

Perturbation proof: the replica must place rows on the transition
day AND the America/New_York UTC offset must take BOTH values
(-05:00 and -04:00) across the replica — otherwise the sweep refuses
to run (VACUOUS).

Usage:
    python tools/tz_sweep.py --tier spring --tag r5e_tz_spring
    python tools/tz_sweep.py --tier fall --only timezone_daily_rollup
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

#: tier -> (day shift, the transition day the shifted window covers).
TIERS = {
    "spring": (69, "2024-03-10"),
    "fall": (307, "2024-11-03"),
}


def stage_replica(sf_dir: str, tier: str, root: str) -> tuple[str, dict]:
    import duckdb

    sys.path.insert(0, root)
    from sql_database_engine_spark.scratch import (scratch_dir,
                                                   source_fingerprint)
    days, transition = TIERS[tier]
    key = "|".join(source_fingerprint(sf_dir, t + ".parquet")
                   for t in TABLES)
    replica = scratch_dir("tz_replica", sf_dir,
                          version=f"v1|{tier}|" + key)
    con = duckdb.connect()
    proof: dict = {}
    for t in TABLES:
        src = os.path.join(sf_dir, t + ".parquet")
        dst = os.path.join(replica, t + ".parquet")
        marker = os.path.join(replica, f"_STAGED_{t}")
        if not os.path.exists(marker):
            if t == "events":
                desc = con.execute(
                    f"SELECT * FROM read_parquet('{src}') LIMIT 0"
                ).description
                sel = [(f'CAST("ts" AS TIMESTAMP)'
                        f" + INTERVAL {days} DAY AS \"ts\"")
                       if name == "ts" else f'"{name}"'
                       for name, *_ in desc]
                con.execute(
                    f"COPY (SELECT {', '.join(sel)} "
                    f"FROM read_parquet('{src}'))"
                    f" TO '{dst}' (FORMAT PARQUET)")
            else:
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{src}'))"
                    f" TO '{dst}' (FORMAT PARQUET)")
            open(marker, "w").close()
    # Perturbation proof on the staged events replica.
    con.execute("SET TimeZone='UTC'")
    n_transition_day, n_offsets = con.execute(f"""
        SELECT
          count(*) FILTER (CAST(ts AS DATE) = DATE '{transition}'),
          count(DISTINCT
            CAST(CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC' AS TIMESTAMP)
            - CAST(timezone('America/New_York',
                            CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC')
                   AS TIMESTAMP))
        FROM read_parquet('{os.path.join(replica, "events.parquet")}')
    """).fetchone()
    proof["events"] = {"rows_on_transition_day": n_transition_day,
                       "distinct_ny_offsets": n_offsets,
                       "tier": tier, "shift_days": days}
    con.close()
    return replica, proof


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--tier", default="spring", choices=sorted(TIERS))
    ap.add_argument("--tag", default=None)
    ap.add_argument("--only", default=None)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    tag = args.tag or (f"tz_{args.tier}_"
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
    p = proof["events"]
    perturbed = (p["rows_on_transition_day"] > 0
                 and p["distinct_ny_offsets"] == 2)
    print(f"replica: {replica}", flush=True)
    print(f"perturbation proof -> {'OK' if perturbed else 'VACUOUS'} "
          f"({p})", flush=True)

    spark = get_spark("tz-sweep", cpus=args.cpus)
    import duckdb
    con = duckdb.connect()
    register_duck_views(con, replica)

    names = (args.only.split(",") if args.only
             else list(operators.ordered_queries()))
    n_pass = n_fail = n_rows_only = 0
    t_start = time.time()
    with open(jsonl_path, "w") as out:
        out.write(json.dumps({"query": "__perturbation_proof__",
                              "replica": replica, "tier": args.tier,
                              "proof": proof,
                              "perturbed": perturbed}, default=str) + "\n")
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
                    rec["status"] = "PASS" if ok else "FAIL"
                    if not ok:
                        rec["mismatch"] = {
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
            if rec["status"] in ("PASS", "RAN_ROWS_ONLY"):
                n_pass += 1
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
               "total_s": round(time.time() - t_start, 1)}
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
