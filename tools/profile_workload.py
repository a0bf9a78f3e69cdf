"""Per-stage profile of one or more workloads via the UI REST API.

Usage: python tools/profile_workload.py wl1 [wl2 ...]

Runs each workload twice (first run warms JIT/IO), profiles the second:
prints per-stage task counts, executor run time, input/shuffle bytes —
the local stand-in for the Spark UI stage table (guide §7.1) on a
driver-created session. Stages with zero task time are skipped.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from component_duckdb_transformation_spark.session import build_spark_session  # noqa: E402
from component_duckdb_transformation_spark.workloads import (  # noqa: E402
    WORKLOADS,
    register_tables,
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark_session(
        app_name="cdts-profile", threads=None,
        extra_conf={"spark.ui.enabled": "true"},
    )
    register_tables(spark, sf_dir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    for name in sys.argv[1:]:
        wl = WORKLOADS[name]
        wl.make(spark, sf_dir).write.format("noop").mode("overwrite").save()
        group = f"profile-{name}"
        spark.sparkContext.setJobGroup(group, group)
        t0 = time.perf_counter()
        wl.make(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobGroup(None, None)

        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/jobs"
        ) as r:
            jobs = json.loads(r.read())
        sids = sorted(
            s
            for j in jobs
            if j.get("jobGroup") == group
            for s in j["stageIds"]
        )
        print(f"== {name}: wall={wall:.3f}s jobs="
              f"{sum(1 for j in jobs if j.get('jobGroup') == group)}")
        total = 0.0
        for sid in sids:
            try:
                with urllib.request.urlopen(
                    f"{base}/api/v1/applications/{app}/stages/{sid}"
                ) as r:
                    st = json.loads(r.read())[0]
            except Exception:
                continue
            dur = (st.get("executorRunTime") or 0) / 1000
            total += dur
            if dur < 0.05:
                continue
            print(
                f"  stage {sid}: tasks={st['numCompleteTasks']} "
                f"taskTime={dur:.2f}s "
                f"in={st.get('inputBytes', 0) >> 10}KB "
                f"sh={st.get('shuffleReadBytes', 0) >> 10}KB"
            )
        print(f"  total task time {total:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
