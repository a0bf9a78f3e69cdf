"""Temporal operators (range join, gap-fill) and deterministic
sampling/splitting: semantics + plan-shape guards."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from component_duckdb_transformation_spark.exceptions import UserException
from component_duckdb_transformation_spark.operators import sampling, temporal


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def events_df(spark):
    rows = [
        (1, _ts(0, 30), 10.0),
        (2, _ts(1, 15), 20.0),
        (3, _ts(5, 0), 30.0),
        (4, _ts(9, 45), 40.0),
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, value double")


def test_range_join_semantics(spark, events_df):
    intervals = spark.createDataFrame(
        [
            (100, _ts(0), _ts(2)),      # catches events 1, 2
            (200, _ts(1), _ts(6)),      # catches events 2, 3
            (300, _ts(9, 45), _ts(10)), # inclusive start: catches 4
            (400, _ts(20), _ts(21)),    # empty
        ],
        "interval_id long, start_ts timestamp, end_ts timestamp",
    )
    out = temporal.range_join(
        events_df, intervals, "ts", "start_ts", "end_ts", bucket_seconds=3600
    )
    got = {(r.interval_id, r.event_id) for r in out.collect()}
    assert got == {(100, 1), (100, 2), (200, 2), (200, 3), (300, 4)}


def test_range_join_end_exclusive(spark, events_df):
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(0, 30))], "interval_id long, start_ts timestamp, end_ts timestamp"
    )
    excl = temporal.range_join(
        events_df, intervals, "ts", "start_ts", "end_ts", bucket_seconds=3600
    )
    incl = temporal.range_join(
        events_df, intervals, "ts", "start_ts", "end_ts", 3600, end_exclusive=False
    )
    assert excl.count() == 0
    assert {r.event_id for r in incl.collect()} == {1}


def test_range_join_is_equi_join_not_nested_loop(spark, events_df):
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(2))], "interval_id long, start_ts timestamp, end_ts timestamp"
    )
    out = temporal.range_join(
        events_df, intervals, "ts", "start_ts", "end_ts", bucket_seconds=3600
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_gapfill_dense_and_locf(spark, events_df):
    out = temporal.time_bucket_gapfill(
        events_df,
        [],
        "ts",
        "hour",
        aggs=[F.round(F.avg("value"), 2).alias("v"), F.count("*").alias("n")],
        locf_cols=["v"],
    ).orderBy("bucket")
    rows = out.collect()
    # global range 00:00..09:00 hourly = 10 buckets, no gaps in output
    assert len(rows) == 10
    by_hour = {r.bucket.hour: r for r in rows}
    # hour 0 has event 1 only (00:30); hour 1 has event 2
    assert by_hour[0].v == 10.0 and by_hour[0].n == 1
    assert by_hour[1].v == 20.0
    # gap hours carry the last observation; their count stays NULL
    assert by_hour[3].v == 20.0 and by_hour[3].n is None
    assert by_hour[6].v == 30.0
    assert by_hour[9].v == 40.0


def test_deterministic_split_stable_and_complete(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = sampling.deterministic_split(df, "doc_id")
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert sum(counts.values()) == 2000
    # pure function of the id: same assignment on re-run / different data
    again = sampling.deterministic_split(df.filter(F.col("doc_id") < 100), "doc_id")
    a = {r.doc_id: r.split for r in again.collect()}
    b = {r.doc_id: r.split for r in out.filter(F.col("doc_id") < 100).collect()}
    assert a == b


def test_deterministic_split_rejects_bad_weights(spark):
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(UserException):
        sampling.deterministic_split(df, "doc_id", {"a": 0.5, "b": 0.2})


def test_deterministic_sample_nested(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    ten = {r.doc_id for r in sampling.deterministic_sample(df, 0.10, "doc_id").collect()}
    one = {r.doc_id for r in sampling.deterministic_sample(df, 0.01, "doc_id").collect()}
    assert one <= ten  # nested: the 1% sample is inside the 10% sample
    assert 300 <= len(ten) <= 700 and len(one) <= 120


def test_stratified_sample_per_stratum(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(4000)], "doc_id long, lang string"
    )
    out = sampling.stratified_sample(df, {"en": 0.5, "de": 0.1}, "lang", "doc_id")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 800 <= counts["en"] <= 1200
    assert 120 <= counts["de"] <= 280
    # unlisted strata use default_fraction=0.0 -> dropped entirely
    df2 = df.withColumn("lang", F.when(F.col("doc_id") < 100, "fr").otherwise(F.col("lang")))
    out2 = sampling.stratified_sample(df2, {"en": 0.5}, "lang", "doc_id")
    assert out2.filter(F.col("lang") == "fr").count() == 0


def test_pack_sequences_invariants(spark):
    from component_duckdb_transformation_spark.operators.packing import (
        pack_sequences,
    )
    from pyspark.sql import functions as F

    rows = [(i, "en" if i % 3 else "de", 50 + (i * 37) % 400) for i in range(1, 301)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "tokens"])
    packed = pack_sequences(df, "tokens", "doc_id", ("lang",), budget=1000, shard=64)
    out = packed.collect()
    # every row assigned; shard = doc_id // 64
    assert all(r["shard"] == r["doc_id"] // 64 for r in out)
    # bins are contiguous from 0 within each (lang, shard) and bin token
    # sums exceed the budget by at most one straddling document
    from collections import defaultdict

    bins = defaultdict(list)
    for r in out:
        bins[(r["lang"], r["shard"], r["bin"])].append(r)
    for (lang, shard, b), rs in bins.items():
        assert b >= 0
        tot = sum(r["tokens"] for r in rs)
        assert tot < 1000 + max(r["tokens"] for r in rs)
    # deterministic: same input -> same assignment
    again = {r["doc_id"]: r["bin"] for r in pack_sequences(
        df, "tokens", "doc_id", ("lang",), budget=1000, shard=64).collect()}
    assert all(again[r["doc_id"]] == r["bin"] for r in out)
