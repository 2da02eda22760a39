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

Scale posture: this simple reader serves from the driver (the API's
design for low-volume control streams); a partitioned
DataSourceStreamReader is the high-volume form. The pipeline shapes it
feeds (watermarks, sessionization, stream-static joins) are the same
either way — streaming/events.py exercises them on the built-in sources.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

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


def register_events_replay_source(spark) -> None:
    spark.dataSource.register(EventsReplayDataSource)
