"""Benchmark harness: run every registered workload at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Mirrors the reference's own instrumentation (per-query + total wall time,
reference src/query_orchestrator.py:83-101, 322-333).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from component_duckdb_transformation_spark.session import build_spark_session  # noqa: E402
from component_duckdb_transformation_spark.workloads import (  # noqa: E402
    WORKLOADS,
    register_tables,
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    only = set(sys.argv[1:])
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    spark = build_spark_session(app_name="cdts-bench", threads=cpus)
    # Warm the JVM + register views once; per-query timing then measures the
    # query, not session bootstrap (registration is also what a resident
    # engine would amortize).
    register_tables(spark, sf_dir)
    spark.sql("SELECT count(*) AS n FROM lineitem").collect()

    timings: dict[str, float] = {}
    failures: list[str] = []
    t_all = time.perf_counter()
    for name, wl in WORKLOADS.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = wl.make(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 4)
            print(f"# {name}: {timings[name]:.3f}s rows={n}", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"# {name}: FAILED {str(exc)[:200]}", file=sys.stderr)
    total = round(time.perf_counter() - t_all, 4)

    result = {
        "metric": "workload_suite_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "failures": failures,
    }
    print(json.dumps(result))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
