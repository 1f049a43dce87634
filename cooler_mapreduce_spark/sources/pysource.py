"""Custom connector via the Python DataSource API (Spark 4).

The reference's "connector surface" is one hand-rolled text-file splitter:
the coordinator plans byte-range splits aligned to newline boundaries
(coordinator/server.py:209-243) and each worker scans its range
(task_executor.py:103-183). This module is the Spark-native form of that
machinery: a ``DataSource`` subclass plans ``InputPartition``s (the split
step) and a ``DataSourceReader`` yields each partition's rows (the scan
step) — except the planning composes with Catalyst (schema known up
front, readers run wherever the scheduler places them) instead of a
bespoke coordinator RPC.

The concrete source here generates deterministic synthetic events (a
seedable LCG per global row index), which makes it a load/soak data
generator that never materializes input files — reading N partitions of
M rows streams rows straight into the scan, at any scale, with zero I/O.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

#: Knuth's multiplicative-hash constant — full-period odd multiplier.
_MIX = 2654435761


def _row(gid: int) -> tuple[int, int, str, float]:
    h = (gid * _MIX) % (1 << 32)
    return (gid, h % 1000, _EVENT_TYPES[h % 5], float(h % 10_000) / 100.0)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_partitions = int(options.get("partitions", "4"))
        self.rows_per = int(options.get("rowsPerPartition", "1000"))

    def partitions(self) -> list[InputPartition]:
        # split planning: the coordinator's byte-range step, minus the I/O
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        base = partition.value * self.rows_per
        for j in range(self.rows_per):
            yield _row(base + j)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotently register the source; afterwards
    ``spark.read.format("synthetic_events")`` works anywhere in the
    session."""
    spark.dataSource.register(SyntheticEventsDataSource)
