"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API) that
exposes the PNGV video corpus as a partitioned TABLE of decoded frames —
the connector-style packaging of the video path: users run
``spark.read.format("pngv").load(dir)`` instead of wiring binaryFile +
mapInPandas themselves.

Connector design (the part that matters at 100 TB):
- one InputPartition per video FILE → Spark schedules each container to
  one task; a million-video corpus parallelizes across every executor
  with no shuffle (same planning contract as FileSourceScan).
- the reader seeks via the PNGV index and decodes only what it emits —
  `frame_step` pushes keyframe sampling INTO the source, the
  connector-level analogue of predicate pushdown (I/O ∝ frames kept).
- all decode logic is self-contained in this module; Spark pickles the
  DataSourceReader itself to executors, so no package import is needed
  worker-side (same constraint as every kernel in sources/binary.py —
  enforced here by module-level pickle-by-value registration).

Reference parity: packages `chapter_4/MnistClassification.java:61-63`'s
record-reader pattern (`ImageRecordReader`) as a first-class Spark
source instead of driver-side iteration.
"""

from __future__ import annotations

import os
import struct
import sys

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

try:  # pragma: no cover - import location varies across pyspark versions
    from pyspark import cloudpickle as _cp
except ImportError:
    import cloudpickle as _cp
_cp.register_pickle_by_value(sys.modules[__name__])

PNGV_SCHEMA = (
    "path string, frame_idx int, n_frames int, width int, height int, "
    "mean_px double, max_px int"
)


class _VideoPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PngvDataSourceReader(DataSourceReader):
    def __init__(self, options):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("pngv source requires a path")
        self.frame_step = int(options.get("frame_step", "1"))

    def partitions(self):
        files = sorted(
            os.path.join(self.root, f)
            for f in os.listdir(self.root)
            if f.endswith(".pngv")
        )
        return [_VideoPartition(p) for p in files]

    def read(self, partition):
        # Self-contained decode: PNGV index walk + the pure-stdlib PNG
        # decoder logic (same algorithms as pngcodec.py, pickled by value
        # with this module).
        import zlib

        with open(partition.path, "rb") as f:
            buf = f.read()
        if buf[:4] != b"PNGV":
            raise ValueError(f"not a PNGV container: {partition.path}")
        (n,) = struct.unpack(">I", buf[4:8])
        raw = struct.unpack(f">{n + 1}I", buf[8 : 8 + 4 * (n + 1)])
        base = 8 + 4 * (n + 1)

        def decode_png(data: bytes):
            assert data[:8] == b"\x89PNG\r\n\x1a\n"
            pos, width, height, idat = 8, 0, 0, b""
            while pos < len(data):
                (length,) = struct.unpack(">I", data[pos : pos + 4])
                tag = data[pos + 4 : pos + 8]
                payload = data[pos + 8 : pos + 8 + length]
                if tag == b"IHDR":
                    width, height = struct.unpack(">II", payload[:8])
                elif tag == b"IDAT":
                    idat += payload
                pos += 12 + length
            rawpx = zlib.decompress(idat)
            stride = width + 1
            px, prev = [], [0] * width
            for y in range(height):
                line = rawpx[y * stride : (y + 1) * stride]
                ftype, cur = line[0], list(line[1:])
                for x in range(width):
                    a = cur[x - 1] if x else 0
                    b = prev[x]
                    c = prev[x - 1] if x else 0
                    if ftype == 0:
                        pred = 0
                    elif ftype == 1:
                        pred = a
                    elif ftype == 2:
                        pred = b
                    elif ftype == 3:
                        pred = (a + b) // 2
                    else:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    cur[x] = (cur[x] + pred) & 0xFF
                px.extend(cur)
                prev = cur
            return width, height, px

        for i in range(0, n, self.frame_step):
            off, end = raw[i], raw[i + 1]
            w, h, px = decode_png(buf[base + off : base + end])
            yield (
                partition.path,
                i,
                n,
                w,
                h,
                sum(px) / len(px),
                max(px),
            )


class PngvDataSource(DataSource):
    @classmethod
    def name(cls):
        return "pngv"

    def schema(self):
        return PNGV_SCHEMA

    def reader(self, schema):
        return PngvDataSourceReader(self.options)


def register_pngv_source(spark) -> None:
    """Idempotently register the connector on a session."""
    spark.dataSource.register(PngvDataSource)


# ---------------------------------------------------------------------------
# Registry entry: the connector exercised end-to-end
# ---------------------------------------------------------------------------
from ..registry import register  # noqa: E402


@register(
    "source_pngv_connector",
    oracle=None,  # inputs are container files, not a DuckDB-visible table
    tags=("source", "multimodal", "video", "ext"),
)
def source_pngv_connector(spark, sf_dir: str):
    """spark.read.format("pngv") over the seeded video corpus with
    source-level keyframe pushdown (frame_step=3). Decoded stats must
    match the mapInPandas pipeline bit-for-bit
    (tests/test_video_decode.py pins the parity)."""
    from .videocodec import ensure_video_corpus

    register_pngv_source(spark)
    return (
        spark.read.format("pngv")
        .option("frame_step", "3")
        .load(ensure_video_corpus())
    )
