"""Repeat-time individual workloads with the noop sink.

Usage: python tools/time_workload.py [-n REPS] wl1 [wl2 ...]

Runs each named workload REPS times (default 3) sequentially on one
shared session, noop sink (guide §1.4), and prints per-workload
min/median — min-of-N is the contention-robust number on a box with
intermittent external CPU steal (r13-opt measurement protocol; single
walls on this box vary 1.5-2x with host noise).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from component_duckdb_transformation_spark.session import build_spark_session  # noqa: E402
from component_duckdb_transformation_spark.workloads import (  # noqa: E402
    WORKLOADS,
    register_tables,
)


def main() -> int:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark_session(app_name="cdts-time", threads=None)
    register_tables(spark, sf_dir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    for name in args:
        wl = WORKLOADS[name]
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.perf_counter()
            wl.make(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(times):.3f}s "
            f"median={statistics.median(times):.3f}s "
            f"all={[round(t, 3) for t in times]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
