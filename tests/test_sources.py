"""Round-trip tests for the ingest/egress connectors."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sql_database_engine_spark import schemas
from sql_database_engine_spark.sources.readers import read_source, write_sink
from .conftest import SF_SMOKE


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_documents_roundtrip(spark, tmp_path, fmt):
    src = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = str(tmp_path / f"docs_{fmt}")
    write_sink(src, fmt, out)
    back = read_source(spark, fmt, out, schemas.DOCUMENTS)
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    a = sorted(tuple(r[c] for c in cols) for r in src.collect())
    b = sorted(tuple(r[c] for c in cols) for r in back.collect())
    assert a == b


def test_partitioned_write_prunes(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = str(tmp_path / "docs_part")
    write_sink(src, "parquet", out, partition_by=("lang",))
    pruned = read_source(spark, "parquet", out, schemas.DOCUMENTS) \
        .filter(F.col("lang") == "de")
    # Partition pruning must appear in the physical plan.
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan, plan[:500]
    want = src.filter(F.col("lang") == "de").count()
    assert pruned.count() == want


def test_explicit_schema_enforced(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    out = str(tmp_path / "region_csv")
    write_sink(src, "csv", out)
    back = read_source(spark, "csv", out, schemas.REGION)
    assert [f.dataType for f in back.schema.fields] == \
        [f.dataType for f in schemas.REGION.fields]
