"""Source/sink connectors: schema-explicit ingest and egress.

The reference's only "connector" is its paged db file
(/root/reference/db.cpp:280-329); this module is the engine's general
ingest surface: Parquet (the native format), CSV, and JSON(L), each
read with an *explicit* StructType — schema inference is banned on
the ingest path (one inference pass over 100 TB costs a full extra
scan, and inferred types drift between files; the reference likewise
has a fixed compiled-in schema, db.cpp:41-46).

Writers mirror readers so any table round-trips. Formats needing
external jars (Delta/Iceberg/JDBC drivers) are surfaced through
``open_jdbc`` style stubs gated behind import/availability checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

from ..session import tune

FORMATS = ("parquet", "csv", "json", "orc")


def read_source(spark: SparkSession, fmt: str, path: str,
                schema: T.StructType, **options) -> DataFrame:
    """Read `path` as `fmt` with a mandatory explicit schema."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; known: {FORMATS}")
    tune(spark)
    reader = spark.read.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.format(fmt).options(**options).load(path)


def write_sink(df: DataFrame, fmt: str, path: str, mode: str = "overwrite",
               partition_by: tuple[str, ...] = (), **options) -> None:
    """Write a DataFrame to `path` as `fmt`.

    ``partition_by`` produces hive-style directory partitioning —
    the primary pruning lever at scale (a date/tenant partition turns
    full scans into directory lookups).
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; known: {FORMATS}")
    writer = df.write.mode(mode)
    if fmt == "csv":
        options.setdefault("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).options(**options).save(path)


def open_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBC source — requires the driver jar on the classpath, which
    this build does not ship; fails with a clear message instead of a
    ClassNotFoundException deep in py4j."""
    raise NotImplementedError(
        "JDBC ingest needs a database driver jar on the Spark classpath; "
        "add it via spark.jars and call spark.read.format('jdbc') directly.")
