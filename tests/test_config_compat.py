"""Reference-config compatibility: `duckdb_version` passthrough and the
version() report (reference src/configuration.py:30-38 validates against
src/versions.py:19-38's SUPPORTED_VERSIONS; one PySpark runtime serves
every requested version, changing only what version() returns)."""

from __future__ import annotations

import pytest

from component_duckdb_transformation_spark import (
    DEFAULT_COMPAT_VERSION,
    engine_version_string,
    set_requested_engine_version,
)
from component_duckdb_transformation_spark.configuration import Configuration


def _minimal(**extra):
    return Configuration(blocks=[], **extra)


def test_duckdb_version_accepted_supported():
    assert _minimal(duckdb_version="1.4.4").duckdb_version == "1.4.4"
    assert _minimal(duckdb_version="1.5.2").duckdb_version == "1.5.2"


def test_duckdb_version_accepted_latest():
    assert _minimal(duckdb_version="latest").duckdb_version == "latest"


def test_duckdb_version_default_none():
    assert _minimal().duckdb_version is None


def test_duckdb_version_rejected_unsupported():
    # same contract as the reference: only SUPPORTED_VERSIONS | {latest}
    with pytest.raises(Exception):
        _minimal(duckdb_version="1.1.3")
    with pytest.raises(Exception):
        _minimal(duckdb_version="not-a-version")


def test_version_report_follows_request():
    try:
        set_requested_engine_version("1.4.4")
        assert engine_version_string() == "v1.4.4"
        set_requested_engine_version("latest")
        assert engine_version_string() == f"v{DEFAULT_COMPAT_VERSION}"
        set_requested_engine_version(None)
        assert engine_version_string() == f"v{DEFAULT_COMPAT_VERSION}"
    finally:
        set_requested_engine_version(None)
