"""Adjudicate multi-batch streaming lifecycle timings (r7 verdict #3).

The two tier-2 streaming lifecycles (`stream_custom_source_parallel`,
`stream_stream_left_outer_join`) rose r6->r7 on quiet hosts with unchanged
code, and the two r7 solo artifacts disagreed with EACH OTHER by >13% —
multi-batch checkpoint lifecycles carry inherent variance (temp checkpoint
dir creation, Python-datasource worker spin-up, micro-batch scheduling)
that the single-batch ±15% band doesn't cover.

This tool measures them the way the verdict asked: a FRESH session, N reps
each, reporting every rep + the median, plus a leak probe (reps must not
drift monotonically — a per-rep slope beyond noise would indicate
checkpoint/listener accumulation inside one session, which min-of-2 in the
long-lived bench process would misread as a regression).

Usage: python tools/stream_adjudicate.py [reps]   (default 5)
Prints one JSON line; run it twice back-to-back for the two-consecutive-
artifacts requirement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["stream_custom_source_parallel", "stream_stream_left_outer_join"]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load0 = os.getloadavg()

    from distributed_deep_learning_with_apache_spark_spark.registry import load_all
    from distributed_deep_learning_with_apache_spark_spark.session import get_spark

    spark = get_spark("stream_adjudicate", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reg = load_all()
    out: dict[str, dict] = {}
    for name in QUERIES:
        fn = reg[name].fn
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 4))
        s = sorted(runs)
        med = s[len(s) // 2] if reps % 2 else (s[reps // 2 - 1] + s[reps // 2]) / 2
        # leak probe: slope of rep time vs rep index (simple least squares)
        n = len(runs)
        xbar, ybar = (n - 1) / 2, sum(runs) / n
        slope = sum((i - xbar) * (y - ybar) for i, y in enumerate(runs)) / sum(
            (i - xbar) ** 2 for i in range(n)
        )
        out[name] = {
            "runs": runs,
            "median": round(med, 4),
            "min": s[0],
            "slope_s_per_rep": round(slope, 4),
        }
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "loadavg_start": [round(x, 2) for x in load0],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                "results": out,
            }
        )
    )


if __name__ == "__main__":
    main()
