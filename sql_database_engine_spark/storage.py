"""Persistent `users` table: the reference's single table on Parquet.

Reference storage is a 4 KB-paged single file with a one-leaf B-tree
(/root/reference/db.cpp:23-92); that is *mechanism*, and Parquet +
Spark's reader replaces it wholesale. What we preserve is the tested
*capability contract*:

- durable inserts that survive a close/reopen (spec/main_spec.rb:91-110)
- durability point on clean close ONLY (db.cpp:245-278 is called just
  from `.exit`, db.cpp:517-521): inserts buffer in memory and reach
  disk at :meth:`close` — a crash loses the buffer, exactly like the
  reference's unflushed pages
- insertion-order scans with duplicate keys allowed (db.cpp:478,
  spec/main_spec.rb:131-150): an explicit ``insertion_seq`` column
  gives a distributed store the total order the reference gets for
  free from its single file
- a declared capacity rule: we use TABLE_MAX_ROWS = 1400, the
  reference's own vestigial cap (db.cpp:57-59) that its table-full
  spec was written against (spec/main_spec.rb:35-42). (The code as
  written actually dies at 13 rows — an unsplit leaf, db.cpp:350-355;
  reproducing that would be reproducing a bug.)

At scale: appends land as new parquet files (no rewrite), the seq
counter makes ordering explicit instead of file-order-dependent, and
`select` is an ordinary pruned scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Row, SparkSession, functions as F

from . import schemas
from .errors import TableFullError
from .session import tune

#: Reference's vestigial array-layout capacity (db.cpp:57-59).
TABLE_MAX_ROWS = 1400


class UsersTable:
    """One open users table bound to a directory of parquet files."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = tune(spark)
        self.path = os.path.abspath(path)
        self._pending: list[tuple[int, str, str]] = []
        os.makedirs(self.path, exist_ok=True)
        if self._has_data():
            stats = (self.spark.read.parquet(self.path)
                     .agg(F.count(F.lit(1)).alias("n"),
                          F.max("insertion_seq").alias("mx"))
                     .collect()[0])
            self._persisted_rows = stats["n"]
            self._next_seq = (stats["mx"] or -1) + 1
        else:
            self._persisted_rows = 0
            self._next_seq = 0

    def _has_data(self) -> bool:
        return any(name.endswith(".parquet") for name in os.listdir(self.path))

    @property
    def row_count(self) -> int:
        return self._persisted_rows + len(self._pending)

    def insert(self, row_id: int, username: str, email: str) -> None:
        """Buffer one row (validated upstream by plans.statement)."""
        if self.row_count >= TABLE_MAX_ROWS:
            raise TableFullError()
        self._pending.append((row_id, username, email))

    def dataframe(self) -> DataFrame:
        """The table as a DataFrame in insertion order: persisted
        parquet unioned with the unflushed buffer (the reference's
        select equally sees unflushed pages)."""
        parts = []
        if self._persisted_rows:
            parts.append(self.spark.read.parquet(self.path))
        if self._pending:
            parts.append(self.spark.createDataFrame(
                [Row(id=i, username=u, email=e,
                     insertion_seq=self._next_seq + k)
                 for k, (i, u, e) in enumerate(self._pending)],
                schema=schemas.USERS))
        if not parts:
            return self.spark.createDataFrame([], schema=schemas.USERS)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df.orderBy("insertion_seq")

    def select_rows(self) -> list[tuple[int, str, str]]:
        """All rows in insertion order (executeSelect, db.cpp:487-502)."""
        return [(r["id"], r["username"], r["email"])
                for r in self.dataframe().collect()]

    def keys_in_order(self) -> list[int]:
        """Leaf-introspection analog: key column in insertion order
        (print_leaf_node, db.cpp:448-457)."""
        return [r["id"] for r in self.dataframe().select("id", "insertion_seq").collect()]

    def flush(self) -> None:
        """Append the buffer to parquet (pager_flush analog,
        db.cpp:220-243 — but atomic per batch, not per page)."""
        if not self._pending:
            return
        (self.spark.createDataFrame(
            [Row(id=i, username=u, email=e,
                 insertion_seq=self._next_seq + k)
             for k, (i, u, e) in enumerate(self._pending)],
            schema=schemas.USERS)
         .coalesce(1)
         .write.mode("append").parquet(self.path))
        self._persisted_rows += len(self._pending)
        self._next_seq += len(self._pending)
        self._pending.clear()

    def close(self) -> None:
        """db_close analog (db.cpp:245-278): the one durability point."""
        self.flush()
