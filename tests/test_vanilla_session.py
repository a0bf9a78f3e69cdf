"""Regression: the engine must work under a CALLER-BUILT vanilla
SparkSession with no repo confs (VERDICT r1 root cause: the driver
harness builds its own session, and round-1 `read_parquet` only worked
when `session.py` had pre-set `spark.sql.legacy.parquet.nanosAsLong`).

These tests deliberately avoid the repo's session factory.
"""

import os

import pytest
from pyspark.sql import SparkSession

from component_duckdb_transformation_spark.sources.parquet_io import read_parquet
from component_duckdb_transformation_spark.workloads import WORKLOADS, register_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def vanilla_spark():
    # Tear down any session the rest of the suite built, so getOrCreate
    # really constructs a conf-free one (mirrors the driver harness).
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("vanilla-harness-mirror")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_vanilla_session_reads_ns_timestamp_parquet(vanilla_spark):
    # Force the conf OFF (a fresh driver-harness session has it unset;
    # in-process JVM reuse may have leaked it on) and prove read_parquet
    # enables it itself rather than relying on session bootstrap.
    vanilla_spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    df = read_parquet(vanilla_spark, f"{SF_DIR}/events.parquet")
    row = df.limit(1).collect()
    assert row, "events table should not be empty"
    assert dict(df.dtypes)["ts"].startswith("timestamp")


def test_vanilla_session_runs_flagship_query(vanilla_spark):
    register_tables(vanilla_spark, SF_DIR)
    out = WORKLOADS["q01_pricing_summary"].make(vanilla_spark, SF_DIR).collect()
    assert len(out) > 0


def test_sequential_sessions_both_get_views():
    """register_tables must not be fooled by id() reuse across sessions."""
    s1 = (
        SparkSession.builder.master("local[4]").appName("seq-a").getOrCreate()
    )
    register_tables(s1, SF_DIR)
    assert s1.catalog.tableExists("lineitem")
    s1.stop()
    s2 = (
        SparkSession.builder.master("local[4]").appName("seq-b").getOrCreate()
    )
    register_tables(s2, SF_DIR)
    assert s2.catalog.tableExists("lineitem")
    assert s2.sql("SELECT count(*) AS n FROM lineitem").collect()[0]["n"] > 0
    s2.stop()


def test_vanilla_session_nonutc_timezone_streaming_and_python_paths():
    """A harness session in a non-UTC timezone must still match the
    timezone-naive oracles: register_tables pins the session timezone on
    first registration, and the Python-boundary ops (mapInPandas /
    cogroup) need no repo confs."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("vanilla-nonutc")
        .config("spark.sql.session.timeZone", "Asia/Kolkata")
        .getOrCreate()
    )
    try:
        register_tables(spark, SF_DIR)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        hourly = WORKLOADS["x11_stream_hourly_windows"].make(spark, SF_DIR)
        batch = spark.sql(
            "SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n "
            "FROM events GROUP BY 1, 2"
        )
        got = {
            (r.hour, r.event_type, r.n)
            for r in hourly.select("hour", "event_type", "n").collect()
        }
        want = {(r.hour, r.event_type, r.n) for r in batch.collect()}
        assert got == want
        assert WORKLOADS["x14_ann_ivf_topk"].make(spark, SF_DIR).count() > 0
    finally:
        spark.stop()
