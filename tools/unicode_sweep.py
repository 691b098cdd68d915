#!/usr/bin/env python
"""Unicode (multibyte-text) differential sweep.

The documents fixture is pure ASCII (verified mechanically:
octet_length(text) = length(text) for every row at every SF), so the
entire text-operator family — tokenization, per-character BPE
spacing, winnowing's byte-level decode, simhash/minhash vocabulary
hashing, language-ID heuristics, PII masking — has never processed a
single multibyte character differentially. The engines CAN diverge
here: codepoint-vs-byte length semantics, per-character regex
(``(.)``) over non-BMP codepoints, case mapping, and UTF-8 hashing
all have dialect room (Spark = Java regex/JVM strings with UTF-16
surrogate pairs; DuckDB = RE2/UTF-8 — a non-BMP emoji is ONE
codepoint to RE2 and TWO UTF-16 code units to a careless JVM path).

The sweep stages a replica where a deterministic ~25% of documents
(md5 rule on doc_id) get their text unicode-augmented in the data
itself — vowels diacritic-folded (a->ä, e->é) plus an appended
mixed-script suffix with CJK, Greek, and a 4-byte non-BMP emoji —
then requires Spark-vs-DuckDB hash equality for every oracled query.

Perturbation proof: flagged rows must exist and the replica must
contain rows where octet_length(text) > length(text) (true multibyte
content), including at least one 4-byte (non-BMP) sequence.

Usage:
    python tools/unicode_sweep.py --tag r5e_unicode
    python tools/unicode_sweep.py --only bpe_apply_token_counts
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

#: Appended to flagged docs: CJK (3-byte UTF-8), Greek (2-byte),
#: combining-accent sequence, and a non-BMP emoji (4-byte).
SUFFIX = " δok 中文テスト café \U0001f600ok"


def stage_replica(sf_dir: str, root: str) -> tuple[str, dict]:
    import duckdb

    sys.path.insert(0, root)
    from sql_database_engine_spark.scratch import (scratch_dir,
                                                   source_fingerprint)
    key = "|".join(source_fingerprint(sf_dir, t + ".parquet")
                   for t in TABLES)
    replica = scratch_dir("unicode_replica", sf_dir, version="v1|" + key)
    con = duckdb.connect()
    proof: dict = {}
    for t in TABLES:
        src = os.path.join(sf_dir, t + ".parquet")
        dst = os.path.join(replica, t + ".parquet")
        marker = os.path.join(replica, f"_STAGED_{t}")
        if not os.path.exists(marker):
            if t == "documents":
                desc = con.execute(
                    f"SELECT * FROM read_parquet('{src}') LIMIT 0"
                ).description
                cond = ("substr(md5(concat(doc_id::VARCHAR, '|text')),"
                        " 1, 1) < '4'")
                aug = ("concat(replace(replace(text, 'a', 'ä'),"
                       f" 'e', 'é'), {SUFFIX!r})")
                sel = [f"CASE WHEN {cond} THEN {aug} ELSE text END AS text"
                       if name == "text" else f'"{name}"'
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
    d = os.path.join(replica, "documents.parquet")
    src_docs = os.path.join(sf_dir, "documents.parquet")
    n_mb, n_4byte, n_src_mb = con.execute(f"""
        SELECT
          (SELECT count(*) FROM read_parquet('{d}')
           WHERE octet_length(encode(text)) > length(text)),
          (SELECT count(*) FROM read_parquet('{d}')
           WHERE text LIKE '%\U0001f600%'),
          (SELECT count(*) FROM read_parquet('{src_docs}')
           WHERE octet_length(encode(text)) > length(text))
    """).fetchone()
    proof["documents"] = {"multibyte_rows": n_mb,
                          "non_bmp_rows": n_4byte,
                          "source_multibyte_rows": n_src_mb}
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
    tag = args.tag or (f"unicode_{os.path.basename(args.sf.rstrip('/'))}_"
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
    p = proof["documents"]
    perturbed = (p["multibyte_rows"] > 0 and p["non_bmp_rows"] > 0
                 and p["source_multibyte_rows"] == 0)
    print(f"replica: {replica}", flush=True)
    print(f"perturbation proof -> {'OK' if perturbed else 'VACUOUS'} "
          f"({p})", flush=True)

    spark = get_spark("unicode-sweep", cpus=args.cpus)
    import duckdb
    con = duckdb.connect()
    register_duck_views(con, replica)

    names = (args.only.split(",") if args.only
             else list(operators.ordered_queries()))
    n_pass = n_fail = n_rows_only = 0
    t_start = time.time()
    with open(jsonl_path, "w") as out:
        out.write(json.dumps({"query": "__perturbation_proof__",
                              "replica": replica, "proof": proof,
                              "perturbed": perturbed}) + "\n")
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
            out.write(json.dumps(rec, default=str) + "\n")
            out.flush()
            os.fsync(out.fileno())
            print(f"[{i + 1}/{len(names)}] {rec['status']} {name} "
                  f"{rec.get('elapsed_s', '?')}s", flush=True)
    summary = {"tag": tag, "sf": args.sf,
               "n_queries": len(names), "n_pass": n_pass,
               "n_fail": n_fail, "n_rows_only": n_rows_only,
               "total_s": round(time.time() - t_start, 1)}
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
