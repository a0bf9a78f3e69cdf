"""Driver contract for the spark-graft builder (PySpark target).

Delegates to ``component_duckdb_transformation_spark.workloads`` — the
single registry of every implemented operator/query from SURVEY.md §2
(core SQL + dialect surface q01-q69, incl. product/entropy/whole-table-
mad two-phase rewrites, COLUMNS() expansion, GROUP/ORDER BY ALL,
recursive CTEs, ASOF JOIN, window frame EXCLUDE, distributed
POSITIONAL JOIN, TIME midnight-wrap, variant-exact JSON ->, fmt-exact
double rendering, schema-hinted type dispatch from dependency
schemas, the round-9 surfaces: built-in window mad, dynamic-scale
round(), runtime-regexp no-op parity, DISTINCT mad/entropy, and the
round-10 surfaces: JVM window-aggregate frame folds with O(n log n)
running-entropy/quantile-extreme lowerings, alias static typing,
fmt-exact printf/format float directives incl. the 'general'
presentation, NULL/render edges, split_part never-NULL semantics,
and the round-11 surfaces: compiled-core O(1) exact rendering
[jvm/duckspark], fused percentile_cont arrays, DuckDB's
negative-scale DECIMAL round width-clamp for literal chains,
and the round-12 surfaces: the streaming order-statistics window
core [DuckWinOS — O(log^2 frame)/row running/trailing mad and
quantile_cont incl. DuckDB's exact weighted interpolation], the
compiled double-round core [DuckRound], nested-round width
propagation through the chain parser's call leaves, DECIMAL-typed
quantile/median results, positional enum inheritance through set-op
CTAS, and candidate-volume-adaptive exact Jaccard)
plus the LLM-pipeline extensions (dedup, similarity,
sampling, temporal, text analysis, multimodal, streaming, connected
components, PII redaction, sequence packing, decontamination,
SemDeDup semantic dedup, streaming LSH dedup, bigram-LM quality,
training-mix assembly, domain capping: x01-x44) and the executor
statement pipelines (x15
CTAS/INSERT/UPDATE/DELETE, x25 ALTER + UPDATE..FROM, x26 MERGE INTO,
x27 dynamic PIVOT, x29 PRIMARY KEY upserts with UPDATE-time
constraint re-validation, x30 sequences + positional ENUM +
RETURNING). Every workload carries a DuckDB oracle —
the hash/ANN pipelines use engine-portable md5/integer arithmetic so
even MinHash-LSH, SimHash, hyperplane-LSH, and IVF (k-means training
included) are replayed exactly in SQL; the post-MERGE-era statements
are replayed by equivalent pre-MERGE SQL. Registry policy: every
workload returns scalar columns only (the driver canonicalizer cannot
sort ndarray cells) — enforced by tests/test_registry_policy.py.
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
    """DuckDB-runnable oracle SQL per query (every registered workload)."""
    return workloads.oracle_sql()
