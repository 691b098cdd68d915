#!/usr/bin/env python
"""Bind-time oracle output-type gate + pandas-dtype differential.

Round 6's one red driver row (`pack_sequences_greedy`) was an
oracle-side TYPE bug, not a value bug: DuckDB's `//` on a SUM(BIGINT)
yields HUGEINT, which the driver's pandas canonicalization renders as
float64 (`0.0`) while Spark's LONG stays int64 (`0`) — equal values,
different canonical reprs, hash mismatch. The builder's own harness
stringifies raw Python ints, so it was structurally blind to the class
(VERDICT r6 items 1–3). This tool closes the class two ways:

MODE 1 (default, seconds, no execution): bind every ``operators.ORACLES``
entry as a DuckDB relation and inspect ``.types``. Any output column
typed HUGEINT / UHUGEINT / DECIMAL wider than int64 (precision > 18)
fails the gate — those are exactly the types whose pandas conversion
diverges from the Spark side (HUGEINT→float64, wide DECIMAL→float64
vs Spark's Decimal objects). Run by ``tests/test_registry.py`` and at
round close next to ``scan_audit``.

MODE 2 (``--dtypes``, executes at a small SF): for the selected queries
(default: every oracled query with no prior driver row), run BOTH
engines to pandas and compare per-column dtype pairs — int-vs-float,
object-vs-numeric, or mismatched object value-classes flag the query.
This is the driver's exact failure surface, checked before the driver
samples it (VERDICT r6 item 7).

Usage:
    python tools/oracle_type_audit.py                      # bind gate
    python tools/oracle_type_audit.py --dtypes --tag r7_dtypes
    python tools/oracle_type_audit.py --dtypes --only q1,q2
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

#: DuckDB logical types whose pandas materialization diverges from any
#: Spark column type the queries emit. DECIMAL is parsed for width.
_BANNED = ("HUGEINT", "UHUGEINT")
_DEC_RE = re.compile(r"DECIMAL\((\d+),(\d+)\)")


def banned_types(types, cols):
    """Output columns of a bound DuckDB relation that cannot cross the
    driver's pandas canonicalization losslessly/symmetrically."""
    bad = []
    for col, t in zip(cols, types):
        s = str(t).upper()
        if any(b in s for b in _BANNED):
            bad.append((col, s))
            continue
        m = _DEC_RE.search(s)
        if m and int(m.group(1)) > 18:
            bad.append((col, s))
    return bad


def bind_gate(con, oracles):
    """Bind every oracle (no execution) and collect violations."""
    violations: dict[str, list] = {}
    errors: dict[str, str] = {}
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)
            bad = banned_types(rel.types, rel.columns)
        except Exception as exc:  # noqa: BLE001 — audit artifact
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            continue
        if bad:
            violations[name] = [list(b) for b in bad]
    return violations, errors


def _obj_class(series):
    """Value-class of the first non-null entry in an object column —
    'object' vs 'object' dtype pairs can still hide a Decimal-vs-str
    asymmetry, which dtype names alone cannot see."""
    for v in series:
        if v is not None and v == v:  # skips None and NaN
            return type(v).__name__
    return "<all-null>"


#: Dtype families whose per-value canonical strings are identical —
#: calibrated against driver-GREEN queries (gapfill_daily_interpolate,
#: cohort_ltv_curve, … are hash-green with object(date)-vs-datetime64
#: pairs, and integer widths stringify identically), so only pairs
#: that cross FAMILIES are the failure surface (int-vs-float was the
#: pack_sequences_greedy red row; object(Decimal)-vs-float the
#: t_closeness_audit latent).
def _family(dtype_str: str, series) -> str:
    s = dtype_str.lower()
    if s.startswith(("int", "uint")):  # covers nullable Int64 via lower()
        return "int"
    if s.startswith("float"):
        return "float"
    if s.startswith("datetime64"):
        return "datetime"
    if s.startswith("bool"):
        return "bool"
    if s == "object":
        cls = _obj_class(series)
        # date/datetime objects canonicalize like datetime64 cells
        # (driver-green calibration above)
        if cls in ("date", "datetime", "Timestamp"):
            return "datetime"
        return f"object:{cls}"
    return s


def dtype_pairs(spark_pdf, duck_pdf):
    """Per-column canonicalization-family asymmetries (spark vs duck)."""
    asym = []
    for col in sorted(set(spark_pdf.columns) | set(duck_pdf.columns)):
        if col not in spark_pdf.columns or col not in duck_pdf.columns:
            asym.append({"col": col, "kind": "missing-column"})
            continue
        s, d = str(spark_pdf[col].dtype), str(duck_pdf[col].dtype)
        fs = _family(s, spark_pdf[col])
        fd = _family(d, duck_pdf[col])
        if fs == fd or "object:<all-null>" in (fs, fd):
            continue
        asym.append({"col": col, "kind": "family", "spark": f"{s}({fs})",
                     "duck": f"{d}({fd})"})
    return asym


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001",
                    help="parquet dir for view binding / --dtypes runs")
    ap.add_argument("--dtypes", action="store_true",
                    help="also execute both engines and compare pandas "
                         "dtype pairs per column")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (validated)")
    ap.add_argument("--all", action="store_true",
                    help="--dtypes over every oracled query, not just "
                         "the never-driver-sampled backlog")
    ap.add_argument("--tag", default="type_audit")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)

    from sql_database_engine_spark import operators
    operators.load_all()

    import duckdb
    from sql_database_engine_spark.catalog import register_duck_views
    con = duckdb.connect()
    register_duck_views(con, args.sf)

    t0 = time.time()
    violations, errors = bind_gate(con, operators.ORACLES)
    print(f"bind gate: {len(operators.ORACLES)} oracles bound in "
          f"{time.time()-t0:.1f}s, {len(violations)} violations, "
          f"{len(errors)} bind errors", flush=True)
    for name, bad in violations.items():
        print(f"  WIDE-TYPE {name}: {bad}")
    for name, err in errors.items():
        print(f"  BIND-ERROR {name}: {err}")

    summary = {"tag": args.tag, "sf": args.sf,
               "n_oracles": len(operators.ORACLES),
               "bind_violations": violations, "bind_errors": errors}

    n_asym = 0
    if args.dtypes:
        if args.only:
            names = args.only.split(",")
            unknown = [n for n in names if n not in operators.ORACLES]
            if unknown:
                ap.error(f"unknown/rows-only query names: {unknown}")
        elif args.all:
            names = [n for n in operators.ordered_queries()
                     if n in operators.ORACLES]
        else:
            seen = operators._driver_checked()
            names = [n for n in operators.ordered_queries()
                     if n in operators.ORACLES and n not in seen]
        from sql_database_engine_spark.session import get_spark
        spark = get_spark("type-audit", cpus=args.cpus)
        outdir = os.path.join(root, "SWEEPS")
        os.makedirs(outdir, exist_ok=True)
        jsonl_path = os.path.join(outdir, f"{args.tag}.jsonl")
        with open(jsonl_path, "w") as out:
            for i, name in enumerate(names):
                rec: dict = {"query": name, "sf": args.sf}
                t0 = time.time()
                try:
                    spdf = operators.QUERIES[name](spark, args.sf).toPandas()
                    dpdf = con.sql(operators.ORACLES[name]).df()
                    asym = dtype_pairs(spdf, dpdf)
                    rec.update(status="ASYM" if asym else "OK",
                               asymmetries=asym,
                               elapsed_s=round(time.time() - t0, 3))
                except Exception as exc:  # noqa: BLE001 — audit artifact
                    rec.update(status="ERROR",
                               error=f"{type(exc).__name__}: {exc}"[:2000],
                               elapsed_s=round(time.time() - t0, 3))
                n_asym += rec["status"] != "OK"
                out.write(json.dumps(rec) + "\n")
                out.flush()
                print(f"[{i+1}/{len(names)}] {rec['status']} {name} "
                      f"{rec.get('asymmetries') or ''}", flush=True)
        summary.update(n_dtype_checked=len(names), n_dtype_flagged=n_asym)
        with open(os.path.join(outdir, f"{args.tag}_summary.json"), "w") as f:
            json.dump(summary, f, indent=1)

    print(json.dumps({k: v for k, v in summary.items()
                      if not isinstance(v, dict) or v}), flush=True)
    return 1 if (violations or errors or n_asym) else 0


if __name__ == "__main__":
    raise SystemExit(main())
