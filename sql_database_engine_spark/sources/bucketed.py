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
in-memory catalog, so a fresh session re-registers by rewriting —
cheap at test SFs, and on a real deployment a persistent metastore
would hold the spec instead.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

from ..catalog import load_table

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
WAREHOUSE = os.path.join(_REPO_ROOT, "spark-warehouse", "bucketed")

#: (table, bucket column) — the engine's co-located fact-join pair.
FACTS = (("lineitem", "l_orderkey"), ("orders", "o_orderkey"))


def _tag(sf_dir: str) -> str:
    return re.sub(r"\W+", "_", sf_dir.strip("/"))


def ensure_bucketed_facts(spark: SparkSession, sf_dir: str,
                          buckets: int = 16) -> dict[str, str]:
    """Materialize lineitem/orders bucketed on orderkey (idempotent
    per session); returns {base table name: bucketed table name}."""
    names: dict[str, str] = {}
    for table, key in FACTS:
        name = f"{table}_bkt_{_tag(sf_dir)}"
        names[table] = name
        if not spark.catalog.tableExists(name):
            (load_table(spark, sf_dir, table).write
             .bucketBy(buckets, key).sortBy(key)
             .option("path", os.path.join(WAREHOUSE, name))
             .mode("overwrite").format("parquet").saveAsTable(name))
    return names
