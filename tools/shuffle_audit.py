#!/usr/bin/env python
"""Per-query shuffle-volume audit for the headline set.

Runs each bench-tagged query at $SPARK_GRAFT_SF_DIR (default sf0.1) with
the Spark UI's REST API enabled and reports, per query: shuffle write
bytes, shuffle read bytes, input bytes, and output rows. Shuffle volume
is the quantity that actually decides 100 TB behavior — wall-clock on
local[32] can hide an exchange that becomes the bottleneck on a cluster —
so SCALE.md cites these numbers.

Usage: python tools/shuffle_audit.py
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from distributed_deep_learning_with_apache_spark_spark.registry import load_all


def _stage_totals(ui: str) -> tuple[int, int, int]:
    """Sum (shuffle_write, shuffle_read, input_bytes) over all completed
    stages of the app via the UI REST API."""
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    sw = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    sr = sum(s.get("shuffleReadBytes", 0) for s in stages)
    ib = sum(s.get("inputBytes", 0) for s in stages)
    return sw, sr, ib


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("shuffle_audit")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # same driver heap as session.py's get_spark: without it the
        # default 1g driver OOMs on AQE runtime broadcasts when auditing
        # the scaled-up /tmp universes (hit at 10x in r8).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = "http://localhost:4050"

    reg = load_all()
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = sys.argv[2].split(",")
    if only:
        headline = {n: reg[n] for n in only}
    else:
        headline = {n: q for n, q in reg.items() if q.bench}
    report = {}
    for name, q in sorted(headline.items()):
        before = _stage_totals(ui)
        rows = q.fn(spark, sf_dir).count()
        after = _stage_totals(ui)
        report[name] = {
            "shuffle_write_mb": round((after[0] - before[0]) / 1e6, 2),
            "shuffle_read_mb": round((after[1] - before[1]) / 1e6, 2),
            "input_mb": round((after[2] - before[2]) / 1e6, 2),
            "out_rows": rows,
        }
    print(json.dumps({"sf_dir": sf_dir, "queries": report}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
