"""Sequence packing for training-batch construction.

A pretraining pipeline concatenates documents into fixed token-budget
sequences ("packing"). At 100 TB a single global greedy pass is
inherently serial, so the practical (and industry-standard) contract is
pack WITHIN bounded shards: deterministic shard = order_key // shard
docs, then an in-order running-token-sum inside each (group, shard)
window assigns every document the bin of its START offset. Each window
partition holds at most ``shard`` rows regardless of corpus size, so
the one shuffle this plans (hash partition by (group, shard)) has
bounded, skew-free tasks, and the result is a pure function of the
data — re-runs, engine swaps, and appends past the last shard never
repack existing bins.

Engine-portable: the same arithmetic is expressible in ANSI SQL
(integer floor-div + windowed SUM), which is how the x35 oracle
replays it in DuckDB bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..exceptions import UserException


def pack_sequences(
    df: DataFrame,
    tokens_col: str = "tokens",
    order_col: str = "doc_id",
    group_cols: Sequence[str] = ("lang",),
    budget: int = 4096,
    shard: int = 512,
    shard_col: str = "shard",
    bin_col: str = "bin",
) -> DataFrame:
    """Assign each row a packing bin: rows are taken in ``order_col``
    order within (group_cols, shard) and a row lands in the bin that
    contains its cumulative-token START offset (``(cum - tokens) //
    budget``) — first-fit-in-order where a straddling document closes
    its bin. A bin's token sum therefore exceeds ``budget`` by at most
    one document's length; callers that need a hard cap truncate the
    straddler downstream."""
    if budget <= 0 or shard <= 0:
        raise UserException("pack_sequences: budget and shard must be > 0")
    shard_expr = F.floor(F.col(order_col) / F.lit(shard)).cast("bigint")
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols], shard_expr)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    start = cum - F.col(tokens_col)
    return df.withColumn(shard_col, shard_expr).withColumn(
        bin_col, F.floor(start / F.lit(budget)).cast("bigint")
    )
