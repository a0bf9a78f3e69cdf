"""Streaming operator tests: AvailableNow-drained pipelines must equal
their batch equivalents (SURVEY notes the reference is batch-only;
streaming is a driver-mandated extension)."""

from __future__ import annotations

from pyspark.sql import functions as F

from component_duckdb_transformation_spark.streaming import streaming_ops as so

SF = "/root/testdata/sf0.001"


def test_stream_hourly_equals_batch(spark):
    stream = so.read_events_stream(spark, SF)
    result = so.run_stream_to_batch(so.hourly_windowed_aggregate(stream))

    from component_duckdb_transformation_spark.sources.parquet_io import read_parquet

    batch = (
        read_parquet(spark, f"{SF}/events.parquet")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    assert result.count() == batch.count()
    sr = {tuple(map(str, r)) for r in result.collect()}
    br = {tuple(map(str, r)) for r in batch.collect()}
    assert sr == br


def test_session_windows_gap_semantics(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(user_id=1, ts="2024-01-01 00:00:00", value=1.0),
            Row(user_id=1, ts="2024-01-01 00:20:00", value=2.0),  # merges (<30m)
            Row(user_id=1, ts="2024-01-01 00:50:00", value=3.0),  # merges
            Row(user_id=1, ts="2024-01-01 01:20:00", value=4.0),  # exactly 30m: merges
            Row(user_id=1, ts="2024-01-01 01:50:01", value=6.0),  # 30m1s -> new
            Row(user_id=2, ts="2024-01-01 05:00:00", value=5.0),
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    out = so.session_window_stats(df, gap="30 minutes").orderBy(
        "user_id", "session_start"
    )
    rows = out.collect()
    # Spark merges at diff <= gap (inclusive boundary)
    assert [(r.user_id, r.n_events, r.total_value) for r in rows] == [
        (1, 4, 10.0),
        (1, 1, 6.0),
        (2, 1, 5.0),
    ]


def test_stateful_user_stats(spark):
    stream = so.read_events_stream(spark, SF)
    result = so.run_stream_to_batch(
        so.stateful_user_stats(stream), output_mode="update"
    )
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("tv"))
    )
    got = {(r.user_id, r.n_events, r.total_value) for r in result.collect()}
    want = {(r.user_id, r.n_events, r.tv) for r in batch.collect()}
    assert got == want


def test_stream_stream_attribution_join(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, event_type="click", ts="2024-01-01 10:00:00", value=0.0),
            Row(event_id=2, user_id=1, event_type="purchase", ts="2024-01-01 10:30:00", value=9.0),
            Row(event_id=3, user_id=1, event_type="click", ts="2024-01-01 09:20:00", value=0.0),  # >1h before
            Row(event_id=4, user_id=2, event_type="click", ts="2024-01-01 10:10:00", value=0.0),  # other user
            Row(event_id=5, user_id=1, event_type="click", ts="2024-01-01 10:40:00", value=0.0),  # after purchase
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    out = so.stream_stream_attribution_join(df)
    got = {(r.purchase_id, r.click_id) for r in out.collect()}
    assert got == {(2, 1)}


def test_stream_ingest_to_store_exactly_once(spark, tmp_path):
    from component_duckdb_transformation_spark.plans.executor import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    ck = str(tmp_path / "ck")
    stream = so.read_events_stream(spark, SF).select("event_id", "event_type")
    so.stream_ingest_to_store(stream, store, "ing", ck)
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert spark.table("ing").count() == n_events
    # re-drain with the same checkpoint: no new data -> no duplicates
    so.stream_ingest_to_store(stream, store, "ing", ck)
    assert spark.table("ing").count() == n_events


def test_commit_stream_batch_replay_idempotent(spark, tmp_path):
    """A foreachBatch replay (same batch_id) must overwrite, not append
    — the crash-between-write-and-checkpoint-commit scenario."""
    from component_duckdb_transformation_spark.plans.executor import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    batch = spark.range(10).withColumnRenamed("id", "v")
    store.commit_stream_batch("t", batch, 0)
    store.commit_stream_batch("t", batch, 0)  # replay
    assert spark.table("t").count() == 10
    store.commit_stream_batch("t", batch, 1)
    assert spark.table("t").count() == 20
    # the batch partition key never leaks into the table schema
    assert spark.table("t").columns == ["v"]


def test_insert_into_stream_table_converts(spark, tmp_path):
    from component_duckdb_transformation_spark.plans.executor import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    store.commit_stream_batch("t2", spark.range(5).withColumnRenamed("id", "v"), 0)
    store.insert_into("t2", spark.range(3).withColumnRenamed("id", "v"))
    assert spark.table("t2").count() == 8
    assert spark.table("t2").columns == ["v"]
    # further inserts take the plain append path
    store.insert_into("t2", spark.range(2).withColumnRenamed("id", "v"))
    assert spark.table("t2").count() == 10
