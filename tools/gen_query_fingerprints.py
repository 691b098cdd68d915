#!/usr/bin/env python
"""Per-query source fingerprints — the mechanical generalization of
``rewritten_since_sampled`` (VERDICT r7 item 4).

A green driver row vouches for the QUERY AS SAMPLED, not for its name
forever. Until round 7 the "code changed since its row landed" cases
were a hand-curated set in ``operators/__init__.py``; this tool makes
the invariant mechanical:

- ``QUERY_FINGERPRINTS.json`` (repo root, committed) maps each
  driver-sampled query name to a sha256 over (implementing function
  source, oracle SQL) recorded at the last moment the tree was known
  to be the one the driver verified.
- ``operators._driver_checked()`` drops any sampled name whose CURRENT
  fingerprint differs from its stamp, so an edited query re-enters the
  prefix automatically — no round-opening curation.

Round cadence (documented in SURVEY §8): run ``--stamp`` at ROUND
OPEN, immediately after the driver's new ``CORRECTNESS_r{N}.json``
lands and BEFORE any code edit — at that moment the working tree IS
the tree the driver sampled, so stamping current fingerprints is
sound. ``--stamp`` (a) re-stamps every query with a green row in the
newest correctness file, (b) stamps any sampled-but-unstamped name
that was hash-GREEN in its own latest sampled round (bootstrap case;
red or errored rows stay unstamped so the query keeps re-entering the
prefix until a green row lands — ADVICE r8), and (c) never touches
stamps of queries without new rows, so a stamp always describes code
that actually earned a green row.

Known approximation: the fingerprint covers the registered function's
own source plus its oracle SQL, not shared helpers it calls. An edit
to a shared helper (``functions/``, ``Catalog``, a streaming combinator)
still needs the manual ``rewritten_since_sampled`` escape hatch — that
set stays, it just goes empty in the steady state.

Usage:
  python tools/gen_query_fingerprints.py --stamp      # round-open chore
  python tools/gen_query_fingerprints.py --check      # list drifted names
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

STAMP_PATH = os.path.join(ROOT, "QUERY_FINGERPRINTS.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--stamp", action="store_true",
                      help="stamp green rows from the newest CORRECTNESS "
                           "file plus any sampled-but-unstamped names")
    mode.add_argument("--check", action="store_true",
                      help="report sampled queries whose current "
                           "fingerprint drifted from their stamp")
    args = ap.parse_args()

    from sql_database_engine_spark import operators as ops
    ops.load_all()

    sampled = ops._sampled_rounds()  # name -> latest round with any row
    current = {n: ops.query_fingerprint(n) for n in ops.QUERIES}

    try:
        with open(STAMP_PATH) as fh:
            stamps: dict[str, str] = json.load(fh)
    except (OSError, ValueError):
        stamps = {}
    # Names that left the registry (retired queries) leave the file too.
    stamps = {n: fp for n, fp in stamps.items() if n in ops.QUERIES}

    if args.check:
        drifted = sorted(n for n, fp in stamps.items()
                         if current.get(n) != fp)
        unstamped = sorted(n for n in sampled
                           if n in ops.QUERIES and n not in stamps)
        print(json.dumps({"drifted": drifted, "unstamped": unstamped},
                         indent=1))
        return

    newest = max(sampled.values(), default=0)
    green = ops._green_in_round(newest) if newest else set()
    restamped, added, skipped_red = [], [], []
    for n in sorted(sampled):
        if n not in ops.QUERIES:
            continue
        if n in green:
            if stamps.get(n) != current[n]:
                restamped.append(n)
            stamps[n] = current[n]
        elif n not in stamps:
            # Bootstrap branch: stamp only names that were hash-GREEN
            # in their own latest sampled round. A red/errored row must
            # NOT be stamped (ADVICE r8): the stamp's meaning is "this
            # code earned a green row", and stamping a red-rowed query
            # would stop it from mechanically re-entering the prefix
            # after a shared-helper fix that leaves its own source
            # unchanged.
            if n in ops._green_in_round(sampled[n]):
                stamps[n] = current[n]
                added.append(n)
            else:
                skipped_red.append(n)
    with open(STAMP_PATH, "w") as fh:
        json.dump(dict(sorted(stamps.items())), fh, indent=1)
        fh.write("\n")
    detail = f": {skipped_red}" if skipped_red else ""
    print(f"wrote {STAMP_PATH}: {len(stamps)} stamps "
          f"({len(restamped)} re-stamped from round {newest}, "
          f"{len(added)} newly stamped, "
          f"{len(skipped_red)} left unstamped as red-rowed{detail})")


if __name__ == "__main__":
    main()
