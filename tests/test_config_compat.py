"""Reference-config compatibility: `duckdb_version` passthrough
(reference src/configuration.py:33-38, src/versions.py:19-38 route it
to a venv; here one PySpark runtime serves every requested version)."""

from __future__ import annotations

import pytest

from component_duckdb_transformation_spark.configuration import Configuration


def _minimal(**extra):
    return Configuration(blocks=[], **extra)


def test_duckdb_version_accepted_dotted():
    cfg = _minimal(duckdb_version="1.1.3")
    assert cfg.duckdb_version == "1.1.3"


def test_duckdb_version_accepted_latest():
    assert _minimal(duckdb_version="latest").duckdb_version == "latest"


def test_duckdb_version_default_none():
    assert _minimal().duckdb_version is None


def test_duckdb_version_rejected_garbage():
    with pytest.raises(Exception):
        _minimal(duckdb_version="not-a-version")
