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


# Engine-compat version table, mirroring reference src/versions.py:19-38
# (SUPPORTED_VERSIONS / DEFAULT_VERSION / the "latest" UI alias). The
# reference routes the selection to a whole interpreter (venv os.execv,
# src/launcher.py:25-30) so it is process-global there; here one PySpark
# runtime serves every version and the selection only changes what
# ``version()`` reports.
SUPPORTED_COMPAT_VERSIONS: set = {"1.5.2", "1.4.4"}
DEFAULT_COMPAT_VERSION = "1.5.2"  # semantically highest
LATEST_ALIAS = "latest"

_REQUESTED_ENGINE_VERSION: "str | None" = None


def set_requested_engine_version(version: "str | None") -> None:
    """Record the config-pinned engine version (``duckdb_version``)."""
    global _REQUESTED_ENGINE_VERSION
    _REQUESTED_ENGINE_VERSION = version


def requested_engine_version() -> "str | None":
    """The raw config-pinned ``duckdb_version`` (None when unpinned)."""
    return _REQUESTED_ENGINE_VERSION


def resolve_compat_version(version: "str | None" = None) -> str:
    """'latest'/None -> DEFAULT_COMPAT_VERSION; real versions pass through
    (reference src/versions.py::resolve_version)."""
    if version is None or version == LATEST_ALIAS:
        return DEFAULT_COMPAT_VERSION
    return version


def engine_version_string() -> str:
    """What ``version()`` reports — the analogue of DuckDB's version().

    Matches the reference goldens exactly: a config pinning
    ``duckdb_version: 1.4.4`` sees ``v1.4.4``
    (tests/functional/version-1-4-4); an unpinned config sees the
    default runtime ``v1.5.2`` (tests/functional/version-1-5-2).
    """
    return f"v{resolve_compat_version(_REQUESTED_ENGINE_VERSION)}"
