"""Custom Python DataSource (Spark 4 DataSource API).

The escape hatch for systems with no built-in connector: a Python
class declares schema, PARTITIONS (the parallelism contract — each
becomes one task), and a per-partition row generator; Spark plans it
like any other source. This module ships a deterministic arithmetic
sequence source ("seqgen") so the mechanism itself is oracle-checkable
— a real connector swaps the generator for API/queue reads and keeps
the partitioning shape.

Scale notes: the cluster parallelism equals ``partitions()`` — a
production connector derives one partition per shard/offset-range of
the backing system (the Kafka/JDBC-partitioning discipline), never a
single monolithic read. Rows stream through Arrow batches; no driver
materialization.
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader,
                                    DataSourceWriter,
                                    WriterCommitMessage)

#: Generator contract (shared with the oracle): N_ROWS ids, value
#: cents = (id * 37) % 10000, bucket = id % 10.
SEQ_ROWS = 2000
SEQ_PARTS = 8


class _SeqPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SeqReader(DataSourceReader):
    def partitions(self):
        step = SEQ_ROWS // SEQ_PARTS
        return [_SeqPartition(i * step, (i + 1) * step)
                for i in range(SEQ_PARTS)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield (i, i % 10, (i * 37) % 10000)


class SeqDataSource(DataSource):
    """``spark.read.format("seqgen")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "seqgen"

    def schema(self) -> str:
        return "id bigint, bucket bigint, cents bigint"

    def reader(self, schema) -> SeqReader:
        return SeqReader()


def register(spark) -> None:
    """Idempotent registration of the custom source."""
    spark.dataSource.register(SeqDataSource)


#: Streaming variant: N_STREAM_TOTAL rows arriving in BATCH-sized
#: micro-batches; value lane shared with the oracle.
N_STREAM_TOTAL = 600
STREAM_BATCH = 200


class SeqStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked micro-batch reader: each planning cycle serves
    the next STREAM_BATCH ids and advances the committed offset —
    the Kafka shape (initialOffset / read / replay-between-offsets)
    over a deterministic generator."""

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        s = start["pos"]
        if s >= N_STREAM_TOTAL:
            return iter([]), start
        e = min(s + STREAM_BATCH, N_STREAM_TOTAL)
        return (iter([(i, i % 10, (i * 37) % 10000)
                      for i in range(s, e)]), {"pos": e})

    def readBetweenOffsets(self, start, end):
        # Replay path for recovery: must regenerate EXACTLY the rows
        # between two committed offsets.
        return iter([(i, i % 10, (i * 37) % 10000)
                     for i in range(start["pos"], end["pos"])])


class SeqStreamSource(DataSource):
    """``spark.readStream.format("seqstream")`` after registration."""

    @classmethod
    def name(cls) -> str:
        return "seqstream"

    def schema(self) -> str:
        return "id bigint, bucket bigint, cents bigint"

    def simpleStreamReader(self, schema) -> SeqStreamReader:
        return SeqStreamReader()


def register_stream(spark) -> None:
    """Idempotent registration of the custom streaming source."""
    spark.dataSource.register(SeqStreamSource)


class _LineCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path, self.n_rows = path, n_rows


class LinesWriter(DataSourceWriter):
    """Per-partition pipe-delimited line files with the two-phase
    commit every real sink needs: executors write to temp names and
    report a commit message; the DRIVER renames winners on commit and
    deletes strays on abort — a speculative or failed task's file can
    never appear in the committed output."""

    def __init__(self, options):
        self.path = options.get("path")

    def write(self, rows):
        import os
        import uuid
        tmp = os.path.join(self.path, f"_tmp_{uuid.uuid4().hex}.txt")
        n = 0
        with open(tmp, "w") as f:
            for r in rows:
                f.write("|".join(str(v) for v in r) + "\n")
                n += 1
        return _LineCommit(path=tmp, n_rows=n)

    def commit(self, messages):
        import os
        for m in messages:
            if m is None:
                continue
            if m.n_rows:
                os.rename(m.path, m.path.replace("_tmp_", "part_"))
            else:
                os.remove(m.path)

    def abort(self, messages):
        import os
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class LinesSink(DataSource):
    """``df.write.format("lineswriter").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "lineswriter"

    def writer(self, schema, overwrite):
        return LinesWriter(self.options)


def register_sink(spark) -> None:
    """Idempotent registration of the custom sink."""
    spark.dataSource.register(LinesSink)
