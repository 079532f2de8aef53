"""Custom Python Data Source (Spark 4 DataSource API) — §2.1 breadth.

The reference reads its corpus with ad-hoc driver-side loops
(src/pdf_extractor.py:246-253 os.listdir). Spark 4's Python DataSource
API is the engine-native way to bring such a custom source INTO the scan
layer: the source declares its schema and its partition list, and each
partition's ``read`` runs in an executor task — so a bespoke format gets
distributed scanning, column pruning downstream, and plan integration
for free, instead of a driver-side collect-and-parallelize.

``SyntheticEventsDataSource`` is a deterministic generator shaped like
the ``events`` fixture table: ``spark.read.format("synthetic_events")
.option("rows", N).option("partitions", P)`` yields N rows split across
P independent tasks; every value derives from the row id via the same
Knuth-multiplicative hash used elsewhere in the engine, so any (rows,
partitions) split produces identical data — the partitioning is pure
parallelism, invisible in the results (a test pins P=1 equal to P=8).
At scale this is the pattern for load generators and for wrapping
external systems (REST cursors, proprietary file formats) as first-class
scan nodes.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
)

EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)
_T0 = datetime(2024, 1, 1, 0, 0, 0)


def _h(i: int) -> int:
    """Deterministic 32-bit mix of the row id (Knuth multiplicative)."""
    return (i * 2654435761) % 4294967296


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 4)))

    def partitions(self) -> Sequence[InputPartition]:
        step = -(-self.n_rows // self.n_parts)  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            h = _h(i)
            yield (
                i,
                _T0 + timedelta(seconds=i * 7, microseconds=h % 1_000_000),
                h % 150,
                EVENT_TYPES[h % len(EVENT_TYPES)],
                round((h % 100_000) / 100.0, 2),
                '{"k": %d}' % (h % 100),
            )


class _SyntheticEventsStreamReader:
    """SimpleDataSourceStreamReader leg: offsets are plain row counters;
    each micro-batch admits up to ``rows_per_batch`` new rows until
    ``rows`` is exhausted, after which latest == current and the stream
    idles — so processAllAvailable() terminates deterministically. The
    rows are THE SAME deterministic function of row id as the batch
    reader: replaying an offset range (checkpoint recovery) regenerates
    identical data, which is what makes a source replayable and the
    pipeline exactly-once."""

    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.per_batch = max(1, int(options.get("rowsPerBatch", 100)))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        lo = start["row"]
        hi = min(lo + self.per_batch, self.n_rows)
        # iter(list), not a generator: the runtime pickles the prefetched
        # iterator (list_iterator pickles, generators don't) and also
        # calls next() on it for empty-batch validation
        rows = list(
            _SyntheticEventsReader({"rows": self.n_rows}).read(
                _RangePartition(lo, hi)
            )
        )
        return iter(rows), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay path (recovery): regenerate the exact committed range
        return list(
            _SyntheticEventsReader({"rows": self.n_rows}).read(
                _RangePartition(start["row"], end["row"])
            )
        )

    def commit(self, end: dict) -> None:
        pass


class _JsonlWriter(DataSourceWriter):
    """Write-side of the DataSource API (X83): each executor task
    serializes its partition to one JSON-lines part file and returns a
    commit message (path, row count); the driver's ``commit`` gets the
    full message list — the two-phase pattern any transactional sink
    builds on. Files land under ``path`` as ``part-<uuid>.jsonl``.

    LOCAL-MODE CONTRACT (ADVICE r4): ``write()`` runs on executors and
    emits executor-local filesystem paths, while ``commit``/``abort``
    run on the driver and manifest/delete by those same paths — correct
    only when driver and executors share one filesystem (local mode, or
    ``path`` on a shared mount / object store via a fuse layer). On a
    real multi-node cluster, port this by (a) pointing ``path`` at
    shared storage reachable from every node, or (b) having ``write()``
    upload to an object store and return the REMOTE key in its commit
    message; the two-phase structure itself is deployment-agnostic —
    only the path namespace must be shared. Do not copy this class onto
    a cluster with node-local ``path`` as-is."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires .option('path', ...)")
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark.sql.datasource import WriterCommitMessage

        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(out, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1

        class _Msg(WriterCommitMessage):
            pass

        m = _Msg()
        m.path, m.rows = out, n
        return m

    def commit(self, messages):
        import json
        import os

        # driver-side manifest = the commit point (readers that honor
        # the manifest see old-or-new, never a torn write)
        manifest = {
            "files": sorted(m.path for m in messages if m is not None),
            "rows": sum(m.rows for m in messages if m is not None),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        import os

        for m in messages or []:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return _SyntheticEventsStreamReader(self.options)


class JsonlSinkDataSource(DataSource):
    """Registerable write-capable source: ``df.write.format("jsonl_sink")
    .option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def schema(self) -> str:  # pragma: no cover - required by ABC
        return "value STRING"

    def writer(self, schema, overwrite: bool):
        if overwrite:
            # driver-side, before any task writes: clear prior parts +
            # manifest so glob readers can't mix old and new rows
            # (single-writer contract, same as the _rewrite swap ops)
            import glob as _glob
            import os

            path = self.options.get("path")
            if path and os.path.isdir(path):
                for f in _glob.glob(os.path.join(path, "part-*.jsonl")):
                    os.remove(f)
                m = os.path.join(path, "_MANIFEST.json")
                if os.path.exists(m):
                    os.remove(m)
        return _JsonlWriter(self.options, overwrite)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlSinkDataSource)
