"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ``component_duckdb_transformation_spark.workloads`` — the
single registry of every implemented operator/query from SURVEY.md §2
(core SQL surface q01-q25) plus the LLM-pipeline extensions (dedup,
similarity, text analysis, as-of, multimodal: x01-x10).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from component_duckdb_transformation_spark import workloads  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return workloads.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return workloads.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for hash-based ops)."""
    return workloads.oracle_sql()
