"""Temporal operators Spark lacks as built-ins: interval (range) join
and time-bucket gap-fill. Companions to ``operators.asof``.

Both are expressed as compositions of DataFrame ops (no Python in the
hot path) with shuffle-bounded plans:

- ``range_join``: a naive ``l.ts BETWEEN r.start AND r.end`` join has
  no equi-key, so Spark would broadcast-nested-loop it (quadratic).
  Instead each right interval is exploded to the fixed-width time
  buckets it covers and each left row to its single bucket; the join is
  then an equi-join on bucket followed by the exact range filter. A
  (left, right) pair meets in exactly one bucket (the left row's), so
  no dedup is needed. Cost: |R| * ceil(len/bucket) replicated rows and
  one hash shuffle — the standard scale path for interval joins.
- ``time_bucket_gapfill``: dense per-group time series from sparse
  aggregates — bucket sequence generation (no driver collect), left
  join, and last-observation-carried-forward via an ignore-nulls
  window. The TimescaleDB ``time_bucket_gapfill + locf`` analogue.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _epoch(ts: Column) -> Column:
    """Epoch seconds of a timestamp column (NTZ tolerated: cast through
    LTZ — both join sides use the same conversion, so bucketing stays
    consistent regardless of session timezone)."""
    return F.unix_timestamp(ts.cast("timestamp"))


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int,
    end_exclusive: bool = True,
) -> DataFrame:
    """Join left rows to every right interval containing their timestamp.

    ``bucket_seconds`` should be on the order of the typical interval
    length: too small replicates intervals across many buckets, too
    large packs unrelated rows into one bucket. Output: all left columns
    + all right columns (names must not collide).
    """
    lb = left.withColumn("_bucket", F.floor(_epoch(F.col(left_ts)) / bucket_seconds))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(_epoch(F.col(right_start)) / bucket_seconds),
                F.floor(_epoch(F.col(right_end)) / bucket_seconds),
            )
        ),
    )
    upper = (
        F.col(left_ts) < F.col(right_end)
        if end_exclusive
        else F.col(left_ts) <= F.col(right_end)
    )
    return (
        lb.join(rb, "_bucket")
        .filter((F.col(left_ts) >= F.col(right_start)) & upper)
        .drop("_bucket")
    )


def time_bucket_gapfill(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    bucket: str,
    aggs: Sequence[Column],
    locf_cols: Sequence[str] = (),
) -> DataFrame:
    """Aggregate into ``bucket``-sized windows ('hour', 'day', ...) per
    group, then densify: every group gets a row for every bucket in the
    GLOBAL [min, max] time range, missing aggregates NULL, and columns
    in ``locf_cols`` forward-filled within the group.

    Plan shape: one partial-agg shuffle for the bucketing, a 1-row
    global-bounds aggregate broadcast against the distinct groups (no
    driver collect), a left join back, and one window per group for the
    fill. Works unchanged when groups x buckets is huge — the dense
    frame is generated distributed.
    """
    step = F.expr(f"INTERVAL 1 {bucket}")
    bucketed = df.withColumn("_b", F.date_trunc(bucket, F.col(ts_col)))
    g = bucketed.groupBy(*group_cols, F.col("_b").alias("bucket")).agg(*aggs)
    bounds = bucketed.agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    groups = df.select(*group_cols).distinct()
    dense = groups.crossJoin(F.broadcast(bounds)).select(
        *group_cols,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias("bucket"),
    )
    out = dense.join(g, [*group_cols, "bucket"], "left")
    if locf_cols:
        w = (
            Window.partitionBy(*group_cols)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in locf_cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
