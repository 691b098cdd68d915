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
                                    InputPartition)

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
