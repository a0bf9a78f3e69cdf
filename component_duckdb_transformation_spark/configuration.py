"""Configuration model — port of reference ``src/configuration.py:14-79``.

The reference's user-facing program is a list of Blocks, each a list of
Codes, each a list of SQL script strings, plus resource/engine knobs and
the surrounding Keboola storage input/output mappings. This model is pure
config-level dataflow; it carries no Spark dependency.
"""

from __future__ import annotations

import logging
from typing import Any, List, Optional

from pydantic import BaseModel, Field, field_validator

from . import __version__
from .system_resources import detect_cpu_count, detect_memory_limit_mb

LOG = logging.getLogger(__name__)

SUPPORTED_ENGINE_VERSIONS = {"latest", __version__}


class Code(BaseModel):
    """One named list of SQL scripts (reference src/configuration.py:14-16)."""

    name: str
    script: List[str] = Field(default_factory=list)


class Block(BaseModel):
    """One named list of codes (reference src/configuration.py:19-21)."""

    name: str
    codes: List[Code] = Field(default_factory=list)


class Configuration(BaseModel):
    """Engine parameters (reference src/configuration.py:24-38)."""

    blocks: List[Block] = Field(default_factory=list)
    threads: Optional[int] = None
    max_memory_mb: Optional[int] = None
    dtypes_infer: bool = False
    debug: bool = False
    syntax_check_on_startup: bool = False
    # Replaces `duckdb_version` venv routing (reference src/launcher.py:25-30);
    # a single PySpark runtime serves all versions.
    engine_version: str = "latest"
    # Compatibility: reference configs carry `duckdb_version` to pick a
    # venv (reference src/versions.py:19-38). Accepted and validated so
    # those configs load unmodified; the single runtime serves them all.
    duckdb_version: Optional[str] = None
    # Spark-specific extras (no reference analogue):
    spark_master: Optional[str] = None
    warehouse_dir: Optional[str] = None
    sliced_output: bool = False

    @field_validator("engine_version")
    @classmethod
    def _check_engine_version(cls, value: str) -> str:
        if value not in SUPPORTED_ENGINE_VERSIONS:
            raise ValueError(
                f"Unsupported engine version '{value}'. "
                f"Supported: {sorted(SUPPORTED_ENGINE_VERSIONS)}"
            )
        return value

    @field_validator("duckdb_version")
    @classmethod
    def _check_duckdb_version(cls, value: Optional[str]) -> Optional[str]:
        from . import LATEST_ALIAS, SUPPORTED_COMPAT_VERSIONS

        if value is None:
            return value
        if value == LATEST_ALIAS or value in SUPPORTED_COMPAT_VERSIONS:
            LOG.info(
                "Config requests duckdb_version=%s; served by the single "
                "PySpark runtime (version() reports the requested version)",
                value,
            )
            return value
        # same contract as reference src/configuration.py:34-38
        raise ValueError(
            "duckdb_version must be one of: "
            f"{sorted(SUPPORTED_COMPAT_VERSIONS | {LATEST_ALIAS})}"
        )

    def model_post_init(self, __context: Any) -> None:
        # cgroup autodetect, mirroring reference src/configuration.py:54-79
        if self.threads is None:
            self.threads = detect_cpu_count()
            LOG.info("Autodetected threads=%s", self.threads)
        if self.max_memory_mb is None:
            self.max_memory_mb = detect_memory_limit_mb()
            LOG.info("Autodetected max_memory_mb=%s", self.max_memory_mb)


class ColumnSchema(BaseModel):
    """Typed column from a table manifest (KBC base types)."""

    name: str
    base_type: Optional[str] = None
    nullable: bool = True


class InputTable(BaseModel):
    """One storage input mapping entry (reference src/component.py:143-150)."""

    source: str
    destination: str
    file_type: str = "csv"  # "csv" | "parquet"
    full_path: Optional[str] = None
    delimiter: str = ","
    enclosure: str = '"'
    has_header: Optional[bool] = None
    column_names: List[str] = Field(default_factory=list)
    schema_: List[ColumnSchema] = Field(default_factory=list, alias="schema")

    model_config = {"populate_by_name": True}


class OutputTable(BaseModel):
    """One storage output mapping entry (reference src/component.py:158-171)."""

    source: str
    destination: str = ""
    primary_key: List[str] = Field(default_factory=list)
    incremental: bool = False
    file_type: str = "csv"
