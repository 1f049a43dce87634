"""Custom connector via the Python DataSource API (Spark 4) — all four
faces: batch read, batch write, stream read, stream write.

READ side — the reference's "connector surface" is one hand-rolled
text-file splitter: the coordinator plans byte-range splits aligned to
newline boundaries (coordinator/server.py:209-243) and each worker scans
its range (task_executor.py:103-183). This module is the Spark-native
form of that machinery: a ``DataSource`` subclass plans
``InputPartition``s (the split step) and a ``DataSourceReader`` yields
each partition's rows (the scan step) — except the planning composes
with Catalyst (schema known up front, readers run wherever the scheduler
places them) instead of a bespoke coordinator RPC.

The concrete source here generates deterministic synthetic events (a
seedable LCG per global row index), which makes it a load/soak data
generator that never materializes input files — reading N partitions of
M rows streams rows straight into the scan, at any scale, with zero I/O.

WRITE side — the reference's sink writes its TSV part files *in place*
with no commit protocol, so a mid-write worker crash leaves torn output
(reference task_executor.py:244-250). :class:`TsvDirDataSource` is the
same ``str(key)\\tstr(value)`` part-file contract re-expressed through
``DataSourceWriter``'s two-phase commit, Hadoop-committer style: each
task writes into a ``_temporary/`` staging dir (invisible to
Spark/Hadoop readers) and returns a :class:`TsvPartCommit`; only if
every task succeeds does the driver's ``commit()`` rename the staged
files into visible ``part-NNNNN.tsv`` + ``_SUCCESS``; any task failure
routes to ``abort()``, which drops the staging dir wholesale — covering
tasks killed mid-write that never got to return a message. Readers
therefore never observe a torn or partial sink — the exact gap the
reference leaves open. The target directory must be on a shared
filesystem for multi-node runs (same contract as
sinks.SCRATCH_DIR_CONF).
"""

from __future__ import annotations

import os
import re
import shutil
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

#: Knuth's multiplicative-hash constant — full-period odd multiplier.
_MIX = 2654435761


def _row(gid: int) -> tuple[int, int, str, float]:
    h = (gid * _MIX) % (1 << 32)
    return (gid, h % 1000, _EVENT_TYPES[h % 5], float(h % 10_000) / 100.0)


class SyntheticEventsReader(DataSourceReader):
    """Batch face of the generator, WITH filter pushdown (the Spark 4.1
    Python-DataSource capability a real database/API connector uses to
    ship predicates to the remote system):

    - range predicates on ``event_id`` (=, <, <=, >, >=) shrink the
      generated id range at PLAN time — partitions whose row range
      empties are never scheduled at all (split-level pruning, the
      connector analogue of partition pruning);
    - ``event_type`` equality/IN is applied inside ``read()`` at
      generation (row-level pushdown).

    Both filter kinds are fully honored, so they are CONSUMED (not
    yielded back) and Spark plans no residual Filter for them — the
    test asserts the post-scan filter disappears from the physical plan
    and the scheduled partition count drops.

    Sharp edge (Spark-side, observed on 4.1): the JVM caches the
    planned read state on the DataSourceV2 relation, so after a
    FILTERED query plans against a ``load()`` DataFrame, subsequent
    actions on that same shared DataFrame (or new filters derived from
    it) reuse the narrowed scan. Each query that calls its own
    ``spark.read.format(...).load()`` is fully isolated — do that, as
    the engine's own queries do; the test pins both the pushdown and
    this per-load isolation.
    """

    def __init__(self, options: dict) -> None:
        self.n_partitions = int(options.get("partitions", "4"))
        self.rows_per = int(options.get("rowsPerPartition", "1000"))
        # pushed-filter state: an id window [id_lo, id_hi] and an
        # event-type allowlist (None = all)
        self.id_lo = 0
        self.id_hi = self.n_partitions * self.rows_per - 1
        self.types: frozenset[str] | None = None

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col == "event_id" and isinstance(f, EqualTo):
                self.id_lo = max(self.id_lo, int(f.value))
                self.id_hi = min(self.id_hi, int(f.value))
            elif col == "event_id" and isinstance(f, GreaterThan):
                self.id_lo = max(self.id_lo, int(f.value) + 1)
            elif col == "event_id" and isinstance(f, GreaterThanOrEqual):
                self.id_lo = max(self.id_lo, int(f.value))
            elif col == "event_id" and isinstance(f, LessThan):
                self.id_hi = min(self.id_hi, int(f.value) - 1)
            elif col == "event_id" and isinstance(f, LessThanOrEqual):
                self.id_hi = min(self.id_hi, int(f.value))
            elif col == "event_type" and isinstance(f, EqualTo):
                s = frozenset([f.value])
                self.types = s if self.types is None else self.types & s
            elif col == "event_type" and isinstance(f, In):
                s = frozenset(f.value)
                self.types = s if self.types is None else self.types & s
            else:
                yield f  # unsupported → Spark evaluates it post-scan

    def partitions(self) -> list[InputPartition]:
        # split planning: the coordinator's byte-range step, minus the
        # I/O — and with the pushed id window applied, so fully-pruned
        # splits are never scheduled
        out = []
        for i in range(self.n_partitions):
            lo, hi = i * self.rows_per, (i + 1) * self.rows_per - 1
            if hi >= self.id_lo and lo <= self.id_hi:
                out.append(InputPartition(i))
        # Spark requires ≥1 partition; an empty window keeps one split
        # whose read() yields nothing
        return out or [InputPartition(0)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        base = partition.value * self.rows_per
        lo = max(base, self.id_lo)
        hi = min(base + self.rows_per - 1, self.id_hi)
        for g in range(lo, hi + 1):
            row = _row(g)
            if self.types is None or row[2] in self.types:
                yield row


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same generator: a bounded replay source.

    Offsets are row indices ({"row": n}); each micro-batch advances by
    ``rowsPerBatch`` until ``maxRows``, after which read() reports no
    new data — so ``processAllAvailable()`` terminates and tests can
    drain it deterministically. Because rows come from the identical
    LCG as the batch reader, stream output is bit-equal to a batch read
    of the same row range: the streaming connector inherits the batch
    connector's oracle (pysource_event_mix) transitively. Exactly-once
    across restarts follows from the offset log: readBetweenOffsets
    regenerates any committed range verbatim on recovery.
    """

    def __init__(self, options: dict) -> None:
        self.rows_per_batch = int(options.get("rowsPerBatch", "500"))
        self.max_rows = int(options.get("maxRows", "2000"))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        s = start["row"]
        e = min(s + self.rows_per_batch, self.max_rows)
        return iter([_row(g) for g in range(s, e)]), {"row": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(g) for g in range(start["row"], end["row"])])


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


@dataclass
class TsvPartCommit(WriterCommitMessage):
    """One task's commit message: where its temp part landed, how many
    rows it holds. Serialized executor → driver by the runner."""

    tmp_path: str
    rows: int


class TsvDirWriter(DataSourceWriter):
    """Task-side TSV part writer + driver-side rename commit.

    Constructed on the driver (directory creation / overwrite cleanup
    happen once, at plan time), pickled to executors for ``write``;
    ``commit``/``abort`` run back on the driver with every task's
    message.

    Rendering matches the reference's ``str(value)`` contract verbatim —
    including its limitation: values containing tabs or newlines corrupt
    the row framing (the reference has no quoting either, reference
    task_executor.py:249-250). Payloads with control characters belong
    in the parquet sink; this format exists for reference compatibility.
    """

    #: Staging subdirectory for uncommitted task temps — underscore-
    #: prefixed, so Spark/Hadoop readers never list its contents (the
    #: same convention as Hadoop's FileOutputCommitter). Staging INSIDE
    #: the target keeps the final promotion a same-filesystem rename.
    STAGING = "_temporary"

    def __init__(self, options: dict, overwrite: bool) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tsv_dir writer requires a path (…save(path))")
        self.path = path
        self.overwrite = overwrite
        self.staging = os.path.join(path, self.STAGING)
        os.makedirs(self.staging, exist_ok=True)
        # Plan time touches ONLY the staging dir (sweeping temps a
        # crashed previous job left behind). Deleting pre-existing
        # visible parts is deferred to commit() so an aborted overwrite
        # job leaves the destination exactly as it found it — the
        # atomicity contract abort() documents.
        for f in os.listdir(self.staging):
            os.remove(os.path.join(self.staging, f))

    def write(self, iterator: Iterator[Row]) -> TsvPartCommit:
        tmp = os.path.join(self.staging, f"attempt-{uuid.uuid4().hex}.tsv")
        n = 0
        try:
            with open(tmp, "w", encoding="utf-8") as f:
                for row in iterator:
                    f.write("\t".join("None" if v is None else str(v) for v in row))
                    f.write("\n")
                    n += 1
        except BaseException:
            # task-local cleanup for plain row-evaluation errors (there
            # is no per-task abort hook in the Python DataSource API);
            # tasks KILLED mid-write can't run this, which is exactly why
            # temps live under the staging dir the driver removes
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        return TsvPartCommit(tmp_path=tmp, rows=n)

    def commit(self, messages) -> None:
        if self.overwrite:
            # old parts are removed only now, with every new part staged
            # and fsync'd — the window where the directory mixes old and
            # new is the promotion loop itself, and an abort before this
            # point leaves the old output fully intact
            for f in os.listdir(self.path):
                if f == "_SUCCESS" or (f.startswith("part-") and f.endswith(".tsv")):
                    os.remove(os.path.join(self.path, f))
            base = 0
        else:
            # append: number new parts after the largest existing index
            # so a second job never clobbers a first job's files
            existing = [
                int(m.group(1))
                for f in os.listdir(self.path)
                if (m := re.fullmatch(r"part-(\d+)\.tsv", f))
            ]
            base = max(existing, default=-1) + 1
        for i, m in enumerate(m for m in messages if m is not None):
            os.replace(m.tmp_path, os.path.join(self.path, f"part-{base + i:05d}.tsv"))
        with open(os.path.join(self.path, "_SUCCESS"), "w", encoding="utf-8"):
            pass
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages) -> None:
        # Drop the whole staging dir: this covers committed-then-failed
        # messages AND tasks killed mid-write that never returned one.
        # Stragglers still dying on the executors may momentarily
        # recreate staging files after this sweep — harmless, because
        # nothing ever promotes them and readers can't see _temporary;
        # the VISIBLE directory (part-*.tsv, _SUCCESS) is exactly as the
        # job found it, which is the atomicity contract — and since
        # overwrite now defers old-part deletion to commit(), that
        # contract holds for overwrite-of-existing-output too.
        shutil.rmtree(self.staging, ignore_errors=True)


class TsvDirStreamWriter(DataSourceStreamWriter):
    """Streaming face of the TSV sink: one committed part file per
    epoch, named ``part-<batchId>-NNNNN.tsv`` — the same staging-dir
    two-phase commit as the batch writer, plus exactly-once across
    restarts for free: Spark's offset log replays a failed epoch with
    the SAME batchId, and the epoch-stamped rename simply overwrites
    the partial promotion instead of appending a duplicate."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("tsv_dir stream writer requires a path")
        self.path = path
        self.staging = os.path.join(path, TsvDirWriter.STAGING)
        os.makedirs(self.staging, exist_ok=True)

    # task-side: identical temp-part protocol to the batch writer
    write = TsvDirWriter.write

    def commit(self, messages, batchId: int) -> None:
        # A replayed epoch may plan FEWER partitions than a previously
        # partially-committed attempt (restart with different
        # parallelism): promotion-by-enumeration-index would then leave
        # higher-indexed stale part-<batchId>-NNNNN.tsv files behind,
        # duplicating rows. Clear every part of THIS batchId first so
        # the promoted set is exactly this attempt's.
        prefix = f"part-{batchId:05d}-"
        for f in os.listdir(self.path):
            if f.startswith(prefix) and f.endswith(".tsv"):
                os.remove(os.path.join(self.path, f))
        promoted = set()
        for i, m in enumerate(m for m in messages if m is not None):
            os.replace(
                m.tmp_path,
                os.path.join(self.path, f"part-{batchId:05d}-{i:05d}.tsv"),
            )
            promoted.add(m.tmp_path)
        # success path previously never swept staging: temps from an
        # interrupted earlier attempt of this epoch would accumulate
        # forever — remove everything this attempt didn't just promote
        for f in os.listdir(self.staging):
            p = os.path.join(self.staging, f)
            if p not in promoted:
                os.remove(p)

    def abort(self, messages, batchId: int) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)
        os.makedirs(self.staging, exist_ok=True)


class TsvDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tsv_dir"

    def writer(self, schema: StructType, overwrite: bool) -> TsvDirWriter:
        return TsvDirWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> TsvDirStreamWriter:
        return TsvDirStreamWriter(self.options)


def register(spark: SparkSession) -> None:
    """Idempotently register both connectors; afterwards
    ``spark.read.format("synthetic_events")`` and
    ``df.write.format("tsv_dir")`` work anywhere in the session."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(TsvDirDataSource)
    # the reader implements pushFilters(); the runtime asserts if that
    # capability is present while this conf is off
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
