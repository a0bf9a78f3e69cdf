"""Lint-level validator checks (no SparkSession needed).

Mirrors the reference's heuristic lint tests
(reference src/validators/sql_validator.py:104-145); the
3-arg regexp_replace warning is engine-specific: DuckDB replaces the
FIRST match, Spark replaces ALL (documented divergence, COVERAGE.md).
"""

from __future__ import annotations

from component_duckdb_transformation_spark.validators.sql_validator import (
    check_common_sql_errors,
)


def test_three_arg_regexp_replace_warns():
    msgs = check_common_sql_errors(
        "SELECT regexp_replace(s, '[aeiou]', '_') FROM t"
    )
    assert any("FIRST match" in m for m in msgs)


def test_four_arg_regexp_replace_clean():
    msgs = check_common_sql_errors(
        "SELECT regexp_replace(s, '[aeiou]', '_', 'g') FROM t"
    )
    assert not any("FIRST match" in m for m in msgs)


def test_regexp_replace_nested_args_counted_top_level():
    # commas inside nested calls must not inflate the arg count
    msgs = check_common_sql_errors(
        "SELECT regexp_replace(concat(a, b), 'x', 'y', 'g') FROM t"
    )
    assert not any("FIRST match" in m for m in msgs)
    msgs3 = check_common_sql_errors(
        "SELECT regexp_replace(concat(a, b), 'x', 'y') FROM t"
    )
    assert any("FIRST match" in m for m in msgs3)
