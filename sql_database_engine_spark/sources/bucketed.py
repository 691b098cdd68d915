"""Bucketed fact tables: pay the big-join exchange once, at write time.

At 100 TB the recurring ``lineitem ⋈ orders`` join shuffles both fact
tables on every query. Bucketing both tables on the join key (same
bucket count) makes the on-disk layout itself satisfy the join's
distribution requirement: every bucket pair joins locally, no
Exchange, and with ``sortBy`` on the key the sort-merge join skips its
sorts too. The write is the one-time exchange; every subsequent query
rides it for free.

The bucket files live under the repo's ``spark-warehouse`` via an
explicit ``path`` option, so the layout does not depend on the session
owner's working directory (the correctness driver owns its session and
its cwd). Table *metadata* (the bucketing spec) lives in the session's
in-memory catalog; a fresh session re-REGISTERS (``CREATE TABLE …
CLUSTERED BY … LOCATION``) over the committed files — it never
rewrites them, because a concurrent session may be mid-scan on those
exact files (the ``scratch.stage_atomic`` race class). The one-time
write itself commits by atomic rename. On a real deployment a
persistent metastore holds the spec and registration disappears.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

from ..catalog import load_table
from ..scratch import source_fingerprint, stage_atomic

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
WAREHOUSE = os.path.join(_REPO_ROOT, "spark-warehouse", "bucketed")

#: (table, bucket column) — the engine's co-located fact-join pair.
FACTS = (("lineitem", "l_orderkey"), ("orders", "o_orderkey"))


def _tag(sf_dir: str) -> str:
    return re.sub(r"\W+", "_", sf_dir.strip("/"))


def _gc_stale_generations(table: str, sf_dir: str, current: str) -> None:
    """Drop superseded bucket generations (ADVICE r6): fingerprint-
    keyed names mean every in-place testdata regeneration strands the
    previous ``{table}_bkt_{tag}_*`` directory forever — unbounded
    disk growth. Swept lazily AFTER the new generation commits: any
    reader of an old generation keyed on the old fingerprint, i.e. it
    fingerprinted before the in-place regen — a session already
    reading retracted data, so reclaiming its files loses nothing the
    regen didn't already invalidate. In-flight ``.tmp.`` / ``.aside.``
    siblings contain dots and never match the committed-name pattern,
    so rival builds of the CURRENT generation are never touched.

    Sweep authority is re-checked at sweep time: a builder that
    fingerprinted BEFORE an in-place regen can commit its (now stale)
    generation after a rival already committed the newer one — "every
    sibling but mine is older" is exactly inverted for that builder,
    and sweeping would delete the current generation out from under
    the rival's registered table. So only a builder whose own name
    still matches a fresh fingerprint of the live source may sweep.
    The residual window (a regen landing between this re-check and
    the rmtree) is the same unavoidable minimum documented at
    ``scratch.stage_atomic``."""
    import logging
    import shutil

    log = logging.getLogger(__name__)
    try:
        fp_now = re.sub(r"\W+", "_",
                        source_fingerprint(sf_dir, table + ".parquet"))
    except OSError:
        # No live source to authorize a sweep. Logged (ADVICE r7) so
        # operators can tell "sweep refused, stale generations remain
        # until a current-generation build runs" from "nothing to
        # sweep" when chasing warehouse disk growth.
        log.debug("bucketed GC: sweep declined for %s (%s): source "
                  "unreadable — no authority", table, sf_dir)
        return
    if current != f"{table}_bkt_{_tag(sf_dir)}_{fp_now}":
        log.debug("bucketed GC: sweep declined for %s (%s): source "
                  "re-fingerprinted to a newer generation — this "
                  "builder is the stale one", table, sf_dir)
        return  # source changed since we fingerprinted: WE are stale
    prefix = f"{table}_bkt_{_tag(sf_dir)}_"
    pat = re.compile(re.escape(prefix) + r"\d+_\d+$")
    try:
        entries = os.listdir(WAREHOUSE)
    except OSError:
        return
    for d in entries:
        if d != current and pat.fullmatch(d):
            shutil.rmtree(os.path.join(WAREHOUSE, d), ignore_errors=True)


def ensure_bucketed_facts(spark: SparkSession, sf_dir: str,
                          buckets: int = 16) -> dict[str, str]:
    """Materialize lineitem/orders bucketed on orderkey — write-once
    across ALL sessions on the host, register-per-session; returns
    {base table name: bucketed table name}.

    The data write goes through :func:`stage_atomic` (build into a
    tmp sibling, publish by one ``os.rename``), so concurrent
    sessions can never destroy files another session is scanning.
    Registration is metadata-only: the bucket spec is re-attached via
    ``CREATE TABLE … CLUSTERED BY`` with the schema read from the
    committed parquet footers, which keeps the bucketed-scan physical
    properties (no Exchange under a groupBy/join on the key —
    plan-pinned in tests/test_plan_quality.py) without ever
    rewriting data a rival session may hold open.
    """
    names: dict[str, str] = {}
    for table, key in FACTS:
        # ADVICE r5: the artifact identity must include the SOURCE
        # fingerprint, not just the sf_dir path — write-once staging
        # keyed on path alone serves stale bucketed data (and a
        # mismatched CREATE TABLE schema) forever after the testdata
        # is regenerated in place. Same keying as _ivf_stage and
        # ensure_clustered_lineitem.
        fp = re.sub(r"\W+", "_",
                    source_fingerprint(sf_dir, table + ".parquet"))
        name = f"{table}_bkt_{_tag(sf_dir)}_{fp}"
        names[table] = name
        if spark.catalog.tableExists(name):
            continue
        path = os.path.join(WAREHOUSE, name)

        def build(tmp: str, table: str = table, key: str = key) -> None:
            # bucketBy requires saveAsTable; stage under a throwaway
            # name whose EXTERNAL path is the tmp dir, then drop the
            # metadata (files survive — external table).
            build_name = f"{name}__build_{os.getpid()}"
            (load_table(spark, sf_dir, table).write
             .bucketBy(buckets, key).sortBy(key)
             .option("path", tmp)
             .mode("overwrite").format("parquet").saveAsTable(build_name))
            spark.sql(f"DROP TABLE `{build_name}`")

        stage_atomic(path, build, marker="_SUCCESS")
        _gc_stale_generations(table, sf_dir, name)
        # Schema from the SOURCE table, not inference over the staged
        # files: an empty source writes zero data files (just
        # _SUCCESS), and inference over a data-less dir throws
        # UNABLE_TO_INFER_SCHEMA. The staged layout is by construction
        # the source projection, so the source schema IS its schema.
        ddl = load_table(spark, sf_dir, table).schema.toDDL()
        spark.sql(
            f"CREATE TABLE `{name}` ({ddl}) USING parquet "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) "
            f"INTO {buckets} BUCKETS LOCATION '{path}'")
    return names
