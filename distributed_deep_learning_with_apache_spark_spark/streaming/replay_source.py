"""Custom streaming Data Source (Spark 4 `SimpleDataSourceStreamReader`):
deterministic micro-batch replay of the events fixture — the streaming
half of the connector story (sources/pngv_datasource.py is the batch
half).

``spark.readStream.format("events_replay")`` replays `events.parquet`
in event-id order, `batch_rows` per micro-batch. Offsets are plain row
positions, so the source is exactly-once replayable: readBetweenOffsets
re-serves any committed range bit-identically after a restart — the
contract a Kafka-backed source provides via (topic, partition, offset),
realized here over a parquet fixture.

Two readers, two scale postures:
- `events_replay` (SimpleDataSourceStreamReader) serves from the driver —
  the API's design for low-volume control streams; kept as the demo of
  the position-offset contract.
- `events_replay_parallel` (DataSourceStreamReader, r5) is the
  high-volume form: the driver tracks offsets only, `partitions()` tiles
  each micro-batch's id range, and executors read their slice via pyarrow
  predicate-pushdown scans yielding Arrow RecordBatches.
The pipeline shapes either feeds (watermarks, sessionization,
stream-static joins) are the same — streaming/events.py exercises them on
the built-in sources.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

try:  # pragma: no cover - import location varies across pyspark versions
    from pyspark import cloudpickle as _cp
except ImportError:
    import cloudpickle as _cp
_cp.register_pickle_by_value(sys.modules[__name__])

REPLAY_SCHEMA = "event_id long, user_id long, event_type string, ts_micros long"


class EventsReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("events_replay requires a path (events.parquet)")
        self.batch_rows = int(options.get("batch_rows", "1000"))
        self._rows = None

    def _load(self):
        # Driver-side read of the fixture via pyarrow (deterministic order
        # by event_id). Loaded lazily once per reader instance.
        if self._rows is None:
            import pyarrow.parquet as pq

            t = pq.read_table(
                self.path, columns=["event_id", "user_id", "event_type", "ts"]
            )
            cols = t.to_pydict()
            ts = cols["ts"]
            # ts may be timestamp (us/ns) or raw int64 nanos depending on
            # fixture generation; normalize to microseconds.
            norm = []
            for v in ts:
                if hasattr(v, "timestamp"):
                    norm.append(int(v.timestamp() * 1_000_000))
                else:
                    iv = int(v)
                    norm.append(iv // 1000 if iv > 10**16 else iv)
            rows = sorted(
                zip(cols["event_id"], cols["user_id"], cols["event_type"], norm)
            )
            self._rows = rows
        return self._rows

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        rows = self._load()
        lo = start["pos"]
        hi = min(lo + self.batch_rows, len(rows))
        return iter(rows[lo:hi]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = self._load()
        return iter(rows[start["pos"] : end["pos"]])

    def commit(self, end: dict) -> None:
        pass  # offsets are positions into an immutable fixture


class EventsReplayDataSource(DataSource):
    @classmethod
    def name(cls):
        return "events_replay"

    def schema(self):
        return REPLAY_SCHEMA

    def simpleStreamReader(self, schema):
        return EventsReplayStreamReader(self.options)


# ---------------------------------------------------------------------------
# Partition-parallel form: the scale-true member of the custom-source family
# ---------------------------------------------------------------------------
PARALLEL_SCHEMA = (
    "event_id long, user_id long, event_type string, ts_micros long, part_id int"
)


class _IdRangePartition(InputPartition):
    """One contiguous event_id sub-range of a micro-batch; executors read
    their slice of the parquet file directly (predicate pushdown on
    event_id), never the driver."""

    def __init__(self, part_id: int, path: str, lo: int, hi: int):
        self.part_id = part_id
        self.path = path
        self.lo = lo
        self.hi = hi


class EventsReplayParallelStreamReader(DataSourceStreamReader):
    """Partition-parallel `DataSourceStreamReader` (vs the driver-served
    `SimpleDataSourceStreamReader` demo above): offsets are event_id
    positions in the fixture's dense id space, `partitions()` splits each
    micro-batch's id range into `partitions` contiguous slices, and
    `read()` runs ON EXECUTORS, reading only its slice via a pyarrow
    predicate-pushdown scan and yielding Arrow RecordBatches — no
    row-at-a-time Python and no driver data path. This is the shape a
    Kafka/Kinesis-class source takes at scale: driver tracks offsets only;
    executors fetch data.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("events_replay_parallel requires a path (events.parquet)")
        self.batch_rows = int(options.get("batch_rows", "1000"))
        self.n_parts = int(options.get("partitions", "4"))
        self._id_hi = None  # max event_id + 1, read once from footer stats

    def _bounds(self) -> int:
        if self._id_hi is None:
            import pyarrow.parquet as pq

            # Footer statistics only — the driver never reads data pages.
            pf = pq.ParquetFile(self.path)
            idx = pf.schema_arrow.names.index("event_id")
            hi = 0
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                hi = max(hi, int(st.max))
            self._id_hi = hi + 1
        return self._id_hi

    def initialOffset(self) -> dict:
        return {"id": 0}

    def latestOffset(self) -> dict:
        # Advance one batch per trigger, capped at the fixture's end.
        cur = getattr(self, "_cur", 0)
        self._cur = min(cur + self.batch_rows, self._bounds())
        return {"id": self._cur}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["id"], end["id"]
        n = max(1, self.n_parts)
        span = max(1, -(-(hi - lo) // n))  # ceil
        return [
            _IdRangePartition(i, self.path, lo + i * span, min(lo + (i + 1) * span, hi))
            for i in range(n)
            if lo + i * span < hi
        ]

    def read(self, partition: _IdRangePartition):
        # Executor-side: predicate-pushdown scan of this partition's id
        # slice; emit Arrow RecordBatches (zero-copy into Spark).
        import pyarrow as pa
        import pyarrow.dataset as ds

        t = (
            ds.dataset(partition.path, format="parquet")
            .to_table(
                columns=["event_id", "user_id", "event_type", "ts"],
                filter=(ds.field("event_id") >= partition.lo)
                & (ds.field("event_id") < partition.hi),
            )
            .sort_by("event_id")
        )
        ts = t.column("ts")
        if pa.types.is_timestamp(ts.type):
            ts_us = ts.cast(pa.timestamp("us")).cast(pa.int64())
        else:
            iv = ts.cast(pa.int64())
            import pyarrow.compute as pc

            first = iv[0].as_py() if len(iv) else 0
            ts_us = pc.divide(iv, 1000) if first and first > 10**16 else iv
        out = pa.table(
            {
                "event_id": t.column("event_id").cast(pa.int64()),
                "user_id": t.column("user_id").cast(pa.int64()),
                "event_type": t.column("event_type"),
                "ts_micros": ts_us,
                "part_id": pa.array([partition.part_id] * len(t), pa.int32()),
            }
        )
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets index an immutable fixture


class EventsReplayParallelDataSource(DataSource):
    @classmethod
    def name(cls):
        return "events_replay_parallel"

    def schema(self):
        return PARALLEL_SCHEMA

    def streamReader(self, schema):
        return EventsReplayParallelStreamReader(self.options)


def register_events_replay_source(spark) -> None:
    spark.dataSource.register(EventsReplayDataSource)
    spark.dataSource.register(EventsReplayParallelDataSource)
