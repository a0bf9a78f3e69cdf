"""Deterministic sampling/splitting for training-data pipelines.

A 100 TB corpus cannot be split with ``df.randomSplit`` (seed-stable
only for a fixed partitioning — any upstream change reshuffles the
split) or sampled with per-row RNG (not reproducible across engines or
re-runs). Every operator here derives its decision from a portable
md5 hash of a stable row key, so:

- the split/sample is a pure function of the data (re-runs, engine
  swaps, and incremental re-processing all agree),
- adding rows never moves existing rows between splits,
- results are verifiable against an ANSI-SQL oracle bit-for-bit.

All map-only column expressions — zero shuffle, trivially scalable.
The hash is the same 60-bit md5 family as ``operators.dedup._md5_60``
(DuckDB: ``('0x' || substr(md5(s),1,15))::BIGINT``).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..exceptions import UserException

_BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "split") -> Column:
    """Deterministic bucket in [0, 10000): 60-bit md5 of ``salt:key``
    mod 10000. Non-negative in every engine (the 60-bit value fits
    int64), so ``%`` semantics cannot diverge."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (h % _BUCKETS).cast("int")


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Mapping[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row a stable split label (e.g. train/val/test).

    ``weights`` maps label -> fraction (must sum to ~1); boundaries are
    cumulative-fraction bucket thresholds, so a row's label depends only
    on its own id — never on the rest of the dataset.
    """
    weights = dict(weights or {"train": 0.8, "val": 0.1, "test": 0.1})
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise UserException(f"split weights must sum to 1, got {weights}")
    bucket = hash_bucket(F.col(id_col), salt)
    expr: Column | None = None
    cum = 0.0
    labels = list(weights)
    for label in labels[:-1]:
        cum += weights[label]
        cond = bucket < int(round(cum * _BUCKETS))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    out = labels[-1] if expr is None else expr.otherwise(labels[-1])
    return df.withColumn(out_col, out)


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep a stable ``fraction`` of rows: hash_bucket(id) < f*10000.
    Nested samples compose: a 1% sample is a subset of a 10% sample
    under the same salt."""
    return df.filter(hash_bucket(F.col(id_col), salt) < int(round(fraction * _BUCKETS)))


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "sample",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages).

    ``fractions`` maps stratum value -> keep fraction; strata not listed
    keep ``default_fraction``. Map-only: the threshold is a CASE over
    the stratum column, the decision is the row's own hash bucket.
    """
    thr: Column = F.lit(int(round(default_fraction * _BUCKETS)))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, int(round(frac * _BUCKETS))).otherwise(thr)
    return df.filter(hash_bucket(F.col(id_col), salt) < thr)


def split_oracle_case(id_expr: str, weights: Sequence[tuple[str, float]], salt: str = "split") -> str:
    """The DuckDB CASE expression equivalent of deterministic_split —
    exposed so workload oracles replay the exact boundary arithmetic."""
    bucket = (
        f"CAST(('0x' || substr(md5('{salt}:' || CAST({id_expr} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {_BUCKETS}"
    )
    parts, cum = [], 0.0
    for label, frac in weights[:-1]:
        cum += frac
        parts.append(f"WHEN {bucket} < {int(round(cum * _BUCKETS))} THEN '{label}'")
    return "CASE " + " ".join(parts) + f" ELSE '{weights[-1][0]}' END"


def cap_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    id_col: str = "doc_id",
    salt: str = "cap",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic per-key frequency capping: keep at most ``cap``
    rows per ``key_col`` value (the domain-capping step of web-corpus
    curation — one domain must not dominate the mix), selected in md5
    order of the id so the kept SET is stable across re-runs, engines,
    and row order.

    Scale-safe the same way as ``assemble_training_mix``: a naive
    ``row_number() OVER (PARTITION BY key)`` sorts an entire key in
    one task (a hot domain is ~90% of a web corpus). Instead:

    1. split each key into ``n_buckets`` contiguous md5-order ranges;
    2. per-(key, bucket) COUNTS — partial-aggregable, output is the
       tiny (keys x buckets) stats frame;
    3. exclusive cumulative offsets over that tiny frame, broadcast
       back;
    4. buckets wholly past the cap (offset >= cap) drop BEFORE any
       shuffle; buckets wholly under it (offset + count <= cap) pass
       WITHOUT ranking — only the one boundary bucket per key gets a
       row_number window, whose partition holds ~key_size/n_buckets
       rows regardless of corpus size.

    Row-identical to ``row_number() OVER (PARTITION BY key ORDER BY
    hash_bucket(id), id) <= cap`` — fully SQL-replayable."""
    if cap < 0:
        raise UserException(f"cap must be >= 0, got {cap}")
    hb = hash_bucket(F.col(id_col), salt)
    base = df.withColumn("__hb", hb).withColumn(
        "__bkt", F.floor(F.col("__hb") * n_buckets / _BUCKETS).cast("int")
    )
    counts = base.groupBy(key_col, "__bkt").agg(F.count("*").alias("__cnt"))
    ow = (
        Window.partitionBy(key_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        key_col,
        "__bkt",
        F.coalesce(F.sum("__cnt").over(ow), F.lit(0)).cast("bigint").alias("__off"),
        F.col("__cnt"),
    )
    # NULL is a partition like any other (row_number() PARTITION BY
    # semantics), so the offsets join must be null-safe on the key — a
    # plain equi-join would silently drop every NULL-key row.
    off = offsets.select(
        F.col(key_col).alias("__key_o"),
        F.col("__bkt").alias("__bkt_o"),
        "__off",
        "__cnt",
    )
    joined = (
        base.join(
            F.broadcast(off),
            F.col(key_col).eqNullSafe(F.col("__key_o"))
            & (F.col("__bkt") == F.col("__bkt_o")),
        )
        .drop("__key_o", "__bkt_o")
        .filter(F.col("__off") < cap)
    )
    whole = joined.filter((F.col("__off") + F.col("__cnt")) <= cap)
    boundary = joined.filter((F.col("__off") + F.col("__cnt")) > cap)
    bw = Window.partitionBy(key_col, "__bkt").orderBy(
        F.col("__hb").asc(), F.col(id_col).asc()
    )
    boundary_kept = boundary.withColumn("__rn", F.row_number().over(bw)).filter(
        (F.col("__off") + F.col("__rn")) <= cap
    )
    drop = ["__hb", "__bkt", "__off", "__cnt"]
    return whole.drop(*drop).unionByName(boundary_kept.drop(*drop, "__rn"))


def assemble_training_mix(
    df: DataFrame,
    weights: Mapping[str, float],
    token_budget: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic training-mix assembly: select documents per
    stratum until each stratum's whitespace-token running total reaches
    its share of ``token_budget`` (the data-mixing step of LLM
    pretraining — per-source weights like the published LLaMA/Pile
    mixes). Selection order inside a stratum is the md5 hash of the id
    — deterministic and engine-portable; like any budgeted selection,
    the selected SET is a function of the whole corpus (re-assemble
    after corpus growth).

    The per-stratum running sum is DISTRIBUTED (a real pretraining mix
    has one stratum — "web" — holding ~90% of the corpus, so a window
    partitioned by stratum alone is one task sorting 90 TB). Two-pass
    prefix-sum instead:

    1. split each stratum into ``n_buckets`` contiguous md5-order
       ranges (``hb // width`` — monotone in the selection order);
    2. per-(stratum, bucket) token sums — a partial-aggregable groupBy
       whose output is the tiny (strata x buckets) stats frame;
    3. exclusive cumulative offsets over that tiny frame, broadcast
       back;
    4. buckets whose offset already meets the budget are dropped
       BEFORE the shuffle (every row's exclusive prefix >= the bucket
       offset), so the ordered window only ever carries ~budget tokens
       of data regardless of corpus size;
    5. running sum within (stratum, bucket) + offset = exact global
       cumsum; task size is bounded by stratum_size / n_buckets.

    The boundary document that CROSSES the budget is included (budgets
    are met, never undershot). Fully SQL-replayable; output
    (id, stratum, n_tokens, budget, cum_tokens)."""
    quota: Column = F.lit(0).cast("bigint")
    for value, wgt in sorted(weights.items()):
        quota = F.when(
            F.col(strata_col) == value,
            F.lit(int(round(wgt * token_budget))).cast("bigint"),
        ).otherwise(quota)
    toks = F.size(F.split(F.col(text_col), " ")).cast("bigint")
    hb = hash_bucket(F.col(id_col), salt)
    base = df.select(
        F.col(id_col),
        F.col(strata_col),
        toks.alias("n_tokens"),
        quota.alias("budget"),
        hb.alias("__hb"),
        F.floor(hb * n_buckets / _BUCKETS).cast("int").alias("__bkt"),
    ).filter(F.col("budget") > 0)
    sums = base.groupBy(strata_col, "__bkt").agg(F.sum("n_tokens").alias("__bsum"))
    ow = (
        Window.partitionBy(strata_col)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sums.select(
        strata_col,
        "__bkt",
        F.coalesce(F.sum("__bsum").over(ow), F.lit(0)).cast("bigint").alias("__off"),
    )
    pruned = base.join(F.broadcast(offsets), [strata_col, "__bkt"]).filter(
        F.col("__off") < F.col("budget")
    )
    bw = Window.partitionBy(strata_col, "__bkt").orderBy(
        F.col("__hb").asc(), F.col(id_col).asc()
    )
    return (
        pruned.withColumn(
            "cum_tokens",
            (F.col("__off") + F.sum("n_tokens").over(bw)).cast("bigint"),
        )
        .filter((F.col("cum_tokens") - F.col("n_tokens")) < F.col("budget"))
        .select(id_col, strata_col, "n_tokens", "budget", "cum_tokens")
    )
