"""Parquet reading with nanosecond-timestamp tolerance.

Spark's parquet reader rejects ``TIMESTAMP(NANOS)`` columns
(PARQUET_TYPE_ILLEGAL) — files written by pandas/arrow with ns
precision (e.g. the driver's events table) need handling. Strategy:

1. inspect the footer schema with pyarrow (driver-side, metadata only),
2. if ns timestamps exist, read with
   ``spark.sql.legacy.parquet.nanosAsLong`` (ns arrive as BIGINT),
3. convert ns -> us distributed (``DIV 1000`` + timestamp_micros) and
   cast to TIMESTAMP_NTZ — microsecond truncation, matching how
   DuckDB converts ns parquet to its us TIMESTAMP.

The conf is a runtime SQLConf; ``read_parquet`` sets it itself so any
caller-supplied session (not just the repo's factory) can read the data.
"""

from __future__ import annotations

import os
from typing import List

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _first_parquet_file(path: str) -> str:
    if os.path.isdir(path):
        for name in sorted(os.listdir(path)):
            if name.endswith((".parquet", ".parq")) and not name.startswith("_"):
                return os.path.join(path, name)
    return path


def _listing_stamp(path: str):
    """Cache stamp covering the WHOLE directory listing — (file count,
    max mtime) over every parquet part — so adding or replacing any
    file in a multi-file directory invalidates cached schemas, not just
    rewrites of the first part (r13 ADVICE). Single files stamp on
    their own mtime. Raises OSError for paths stat cannot resolve
    (globs), which callers treat as "don't cache"."""
    if not os.path.isdir(path):
        return os.stat(path).st_mtime_ns
    n = 0
    newest = 0
    with os.scandir(path) as it:
        for entry in it:
            if entry.name.startswith("_") or not entry.name.endswith(
                (".parquet", ".parq")
            ):
                continue
            n += 1
            mt = entry.stat().st_mtime_ns
            if mt > newest:
                newest = mt
    if n == 0:
        raise OSError(f"no parquet parts under {path}")
    return (n, newest)


_NS_COLS_CACHE: dict = {}
_SCHEMA_CACHE: dict = {}


def nanos_timestamp_columns(path: str) -> List[str]:
    """Column names with ns-precision timestamps (footer-only read,
    cached per path — the testdata/warehouse files this reads are
    write-once)."""
    first = _first_parquet_file(path)
    try:
        key = (path, _listing_stamp(path))
    except OSError:
        key = None
    if key is not None:
        cached = _NS_COLS_CACHE.get(key)
        if cached is not None:
            return cached
    try:
        schema = pq.read_schema(first)
    except Exception:
        return []
    cols = [
        field.name
        for field in schema
        if pa.types.is_timestamp(field.type) and field.type.unit == "ns"
    ]
    if key is not None:
        _NS_COLS_CACHE[key] = cols
    return cols


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with ns-timestamp fixup (distributed cast).

    Works on ANY session: ``nanosAsLong`` is a runtime SQLConf, so it is
    set here (not only in the repo's session factory) the moment an
    ns-precision column is detected in the footer — a vanilla
    ``SparkSession.builder.getOrCreate()`` can read pandas/arrow files.

    The inferred Spark schema is cached per (applicationId, path):
    schema inference is a driver-side footer-reading JOB per call, and
    the bench's per-workload ``newSession()`` clones re-bind the same
    ten read-only tables — passing the known schema skips ~10 jobs per
    clone (~1s each clone, r13-opt). Keyed by applicationId so a new
    JVM (new files possible) never reuses a stale schema; callers that
    mutate a path in-place within one application re-register through
    TableStore, which never routes here.
    """
    ns_cols = nanos_timestamp_columns(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        # the listing stamp (file count + max mtime) guards in-place
        # rewrites AND added/replaced parts of multi-file dirs (glob
        # paths, which stat cannot resolve, skip caching)
        stamp = _listing_stamp(path)
        key = (spark.sparkContext.applicationId, path, stamp)
    except OSError:
        key = None
    known = _SCHEMA_CACHE.get(key) if key else None
    if known is not None:
        df = spark.read.schema(known).parquet(path)
    else:
        df = spark.read.parquet(path)
        if key:
            _SCHEMA_CACHE[key] = df.schema
    for c in ns_cols:
        # nanosAsLong gives BIGINT nanos; integer-DIV to us (truncation,
        # same as DuckDB's ns->us conversion), then NTZ timestamp
        df = df.withColumn(
            c,
            F.timestamp_micros(F.expr(f"`{c}` DIV 1000")).cast("timestamp_ntz"),
        )
    return df
