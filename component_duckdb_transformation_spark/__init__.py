"""PySpark-native analytics engine with the query and data-processing
capabilities of keboola/component-duckdb-transformation.

The reference (read-only at /root/reference) is a Python orchestration shell
around an embedded DuckDB: table import/export (CSV/Parquet <-> named SQL
views), a SQL-dependency-driven DAG scheduler, and delegation of all query
execution to DuckDB (reference src/query_orchestrator.py:351).

This package re-expresses that Spark-first:

- ``session``        SparkSession factory (replaces duckdb_client.py)
- ``configuration``  config model (port of src/configuration.py)
- ``sources``        manifest-driven CSV/sliced-CSV/Parquet import as temp
                     views (replaces src/in_tables_creator.py)
- ``sinks``          quoted-CSV/Parquet export + manifests (replaces the
                     export half of src/component.py)
- ``plans``          SQL statement parsing, dependency extraction, DAG
                     batching and the parallel executor (replaces
                     src/sql_parser.py + src/query_orchestrator.py)
- ``functions``      DuckDB->Spark SQL dialect translation + column
                     function library (text analysis, vector math)
- ``operators``      large-scale data-pipeline operators beyond the
                     reference surface: dedup, similarity search,
                     multimodal columns, as-of joins
- ``streaming``      Structured Streaming variants of the event pipeline
- ``validators``     SQL lint/validation (port of validators/sql_validator.py)
- ``actions``        sync actions: lineage, execution plan, expected inputs

Query execution itself is Catalyst: every relational operator (scans,
joins, aggregation, windows, set ops) is declared via ``spark.sql`` /
DataFrame and optimized by Spark, exactly as the reference delegates to
DuckDB's optimizer.
"""

__version__ = "0.1.0"

ENGINE_NAME = "component-duckdb-transformation-spark"


def engine_version_string() -> str:
    """Engine identification, the analogue of DuckDB's ``version()``
    (reference tests/functional/version-1-5-2: ``SELECT version()``)."""
    return f"{ENGINE_NAME} {__version__}"
