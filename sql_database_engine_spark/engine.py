"""Engine facade: the one object a user needs.

A user of the reference interacts through its REPL; a user of this
engine gets the same surface plus the full analytical API:

    from sql_database_engine_spark.engine import Engine

    eng = Engine.open(sf_dir="/root/testdata/sf0.1")
    eng.table("lineitem")                    # catalog DataFrame
    eng.sql("SELECT count(*) FROM orders")   # SQL front door
    eng.query("pricing_summary")             # named operator inventory
    eng.users("/tmp/my.db")                  # reference-parity table
    eng.stream_events()                      # unbounded events stream

Everything delegates to the focused modules; this class only wires a
session + catalog together and keeps the import surface to one name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import operators
from .catalog import DEFAULT_SF_DIR, Catalog, register_views
from .session import get_spark, tune
from .storage import UsersTable


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = tune(spark)
        self.sf_dir = sf_dir
        self.catalog = Catalog(self.spark, sf_dir)
        operators.load_all()

    @classmethod
    def open(cls, sf_dir: str = DEFAULT_SF_DIR,
             spark: SparkSession | None = None) -> "Engine":
        return cls(spark or get_spark("sql-database-engine"), sf_dir)

    # --- tables & SQL ---

    def table(self, name: str) -> DataFrame:
        return self.catalog.table(name)

    def sql(self, statement: str) -> DataFrame:
        """SQL over the registered catalog views, with the engine's
        SQL macros (cosine_sim, vec_dot, token_count, ...) installed."""
        from .functions.sql_macros import install_sql_functions
        install_sql_functions(self.spark)
        register_views(self.spark, self.sf_dir)
        return self.spark.sql(statement)

    # --- named operator inventory ---

    def queries(self) -> tuple[str, ...]:
        return tuple(sorted(operators.QUERIES))

    def query(self, name: str) -> DataFrame:
        return operators.QUERIES[name](self.spark, self.sf_dir)

    # --- reference-parity users table ---

    def users(self, path: str) -> UsersTable:
        return UsersTable(self.spark, path)

    # --- materialization ---

    def create_table(self, name: str, df: DataFrame, path: str,
                     partition_by: tuple[str, ...] = ()) -> DataFrame:
        """CTAS: persist a query result as a parquet table and register
        it as a view. Partition columns are the pruning lever — pick
        the column queries filter on."""
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        # Read back with the source schema: partition-directory values
        # would otherwise be re-inferred (a string partition column of
        # numeric-looking values silently becomes int).
        out = self.spark.read.schema(df.schema).parquet(path)
        out.createOrReplaceTempView(name)
        return out

    def compact_table(self, path: str, target_files: int = 1) -> int:
        """Small-file compaction: rewrite a parquet table into at most
        `target_files` files per partition directory. Streaming sinks
        and frequent appends accrete small files whose per-file
        overhead (footers, open costs, task scheduling) eventually
        dominates scans; periodic compaction is the maintenance op
        that keeps read plans healthy. Returns the file count after.

        Hive-partitioned tables keep their layout: partition columns
        are re-derived from the key=value directory levels and the
        rewrite goes back through partitionBy, repartitioned on
        (partition cols, row-hash bucket) so every directory gets at
        most `target_files` files — each (value, bucket) pair maps to
        one reduce task. A flat coalesce here would silently flatten
        the table and lose partition pruning.

        The rewrite stages to a scratch path then swaps. Stale scratch
        dirs from a crashed prior run are recovered first (a backup
        with no live table is renamed back; leftovers are removed).
        The swap itself is two renames — POSIX has no directory
        exchange — so there is a microsecond window where the path is
        absent; concurrent readers should retry-on-missing, and the
        crash-recovery above makes the window safe across restarts.
        """
        import glob
        import os
        import shutil

        from pyspark.sql import functions as F

        scratch = path.rstrip("/") + "__compacting"
        backup = path.rstrip("/") + "__precompact"
        if os.path.exists(backup) and not os.path.exists(path):
            os.rename(backup, path)  # crashed between the two renames
        for stale in (scratch, backup):
            if os.path.exists(stale):
                shutil.rmtree(stale)

        if not glob.glob(os.path.join(path, "**", "*.parquet"),
                         recursive=True):
            # Zero data files (an empty CTAS writes only _SUCCESS):
            # nothing to compact — and nothing to infer a schema from,
            # so the read below would throw UNABLE_TO_INFER_SCHEMA.
            # Maintenance ops must be total over empty tables.
            return 0

        df = self.spark.read.parquet(path)
        # Partition columns live in directory names, not data files.
        part_cols: list[str] = []
        probe = path
        while True:
            subs = [d for d in os.listdir(probe)
                    if "=" in d and os.path.isdir(os.path.join(probe, d))]
            if not subs:
                break
            part_cols.append(subs[0].split("=", 1)[0])
            probe = os.path.join(probe, subs[0])

        if part_cols:
            data_cols = [c for c in df.columns if c not in part_cols]
            bucket = F.pmod(F.xxhash64(*data_cols), F.lit(target_files))
            (df.repartition(*[F.col(c) for c in part_cols], bucket)
             .write.mode("overwrite").partitionBy(*part_cols)
             .parquet(scratch))
        else:
            df.coalesce(target_files).write.mode("overwrite").parquet(scratch)
        os.rename(path, backup)
        os.rename(scratch, path)
        shutil.rmtree(backup)
        return len(glob.glob(os.path.join(path, "**", "*.parquet"),
                             recursive=True))

    def zorder_table(self, df: DataFrame, path: str, cols: tuple[str, str],
                     files: int = 8, curve: str = "zorder") -> DataFrame:
        """Rewrite a table space-filling-curve-clustered on two columns
        so parquet min/max footer stats prune files for predicates on
        either (or both). ``curve='hilbert'`` gives tighter, balanced
        envelopes at the same file count — see ``sources/clustering.py``
        and PERF.md for measurements."""
        from .sources.clustering import hilbert_write, zorder_write
        write = {"zorder": zorder_write, "hilbert": hilbert_write}[curve]
        write(df, path, cols, files=files)
        return self.spark.read.schema(df.schema).parquet(path)

    # --- snapshot versioning (time travel) ---

    def write_snapshot(self, df: DataFrame, path: str) -> int:
        """Commit `df` as the next immutable version of a snapshot
        table (metadata-pointer commit: the manifest rename is the
        atomic commit point). See ``sources/snapshots.py``."""
        from .sources.snapshots import write_snapshot
        return write_snapshot(df, path)

    def read_snapshot(self, path: str, version: int | None = None) -> DataFrame:
        """Latest committed snapshot, or time-travel to `version`."""
        from .sources.snapshots import read_snapshot
        return read_snapshot(self.spark, path, version)

    def snapshots(self, path: str) -> list[dict]:
        from .sources.snapshots import snapshots
        return snapshots(path)

    def vacuum_snapshots(self, path: str, keep: int = 1) -> list[int]:
        from .sources.snapshots import vacuum
        return vacuum(path, keep)

    # --- streaming ---

    def stream_events(self) -> DataFrame:
        from .streaming.events_stream import events_stream
        return events_stream(self.spark, self.sf_dir)

    def continuous_rollup(self, store_path: str, checkpoint: str):
        """Hypertable-style incrementally-maintained time rollup."""
        from .streaming.rollup import continuous_rollup
        return continuous_rollup(self.spark, self.sf_dir, store_path, checkpoint)
