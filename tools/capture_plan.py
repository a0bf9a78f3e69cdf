"""Capture .explain('formatted') for named workloads into plans/r13/.

Usage: python tools/capture_plan.py <suffix> wl1 [wl2 ...]
Writes plans/r13/<workload>_<suffix>.txt for each workload.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from component_duckdb_transformation_spark.session import build_spark_session  # noqa: E402
from component_duckdb_transformation_spark.workloads import WORKLOADS, register_tables  # noqa: E402


def main() -> int:
    suffix, names = sys.argv[1], sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark_session(app_name="cdts-plans", threads=None)
    register_tables(spark, sf_dir)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = WORKLOADS[name].make(spark, sf_dir)
        txt = spark._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print("wrote", path)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
