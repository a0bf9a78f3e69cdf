"""Scale guards flagged in VERDICT r1: x02's posting-list cap and x08's
driver-collect bound."""

import pytest

from component_duckdb_transformation_spark.exceptions import UserException
from component_duckdb_transformation_spark.operators import dedup, similarity


def test_ngram_jaccard_shingle_cap_bounds_posting_list(spark):
    # 8 docs all share one hot 3-gram prefix; only docs 0/1 share a full
    # tail. With the hot shingle capped out, only the 0/1 pair survives.
    hot = "the quick brown"
    rows = [(i, f"{hot} tail{i} a b c d") for i in range(8)]
    rows[1] = (1, rows[0][1])  # doc 1 duplicates doc 0's text
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = dedup.ngram_jaccard_pairs(df, threshold=0.2, max_shingle_freq=2)
    pairs = {(r["d1"], r["d2"]) for r in capped.collect()}
    assert pairs == {(0, 1)}
    # uncapped, the hot shingle creates cross-pairs below/above threshold
    uncapped = dedup.ngram_jaccard_pairs(df, threshold=0.05)
    assert uncapped.count() > 1


def test_embedding_near_dup_guard_trips_on_oversized_corpus(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(UserException, match="lsh_bucketed_topk"):
        similarity.embedding_near_duplicates(df, threshold_q=0, max_driver_rows=5)
    # under the bound it still works
    out = similarity.embedding_near_duplicates(df, threshold_q=0, max_driver_rows=100)
    assert out.count() > 0


def test_blocked_near_dup_matches_broadcast_variant(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((30, 8)).astype("float32") * 0.3
    vecs[7] = vecs[2] * 1.01  # a genuine near-dup pair
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    broadcasted = {
        (r.v1, r.v2, r.qdot)
        for r in similarity.embedding_near_duplicates(df, threshold_q=100).collect()
    }
    blocked = {
        (r.v1, r.v2, r.qdot)
        for r in similarity.embedding_near_duplicates_blocked(
            df, threshold_q=100, n_blocks=4
        ).collect()
    }
    assert blocked == broadcasted
    assert (2, 7) in {(a, b) for a, b, _ in blocked}


def test_blocked_near_dup_has_no_cartesian_plan(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.embedding_near_duplicates_blocked(df, threshold_q=0, n_blocks=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_jaccard_prefix_filter_equivalence(spark):
    """The AllPairs/PPJoin prefix-filtered path (r12 default) returns
    the identical pair set as the unfiltered inverted-index join across
    thresholds, near-dup structure, and the hot-shingle cap."""
    import random

    from component_duckdb_transformation_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    g = random.Random(9)
    vocab = [f"w{i}" for i in range(40)]
    rows, did = [], 0
    for t in range(25):
        base = [vocab[g.randrange(40)] for _ in range(14)]
        for _ in range(4):
            words = list(base)
            for _ in range(g.randrange(0, 3)):
                words[g.randrange(14)] = vocab[g.randrange(40)]
            rows.append((did, " ".join(words)))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for thr in (0.15, 0.5, 0.85):
        for cap in (None, 5):
            a = sorted(
                map(tuple, ngram_jaccard_pairs(
                    df, threshold=thr, max_shingle_freq=cap
                ).collect())
            )
            b = sorted(
                map(tuple, ngram_jaccard_pairs(
                    df, threshold=thr, max_shingle_freq=cap,
                    prefix_filter=False,
                ).collect())
            )
            assert a == b, (thr, cap, len(a), len(b))


def test_ngram_jaccard_auto_regime(spark):
    """'auto' picks naive below the measured-candidate ceiling and the
    prefix path above it; both give identical pairs."""
    from unittest import mock

    from component_duckdb_transformation_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rows = [(i, f"a b c d e tail{i} x y z") for i in range(20)]
    rows[1] = (1, rows[0][1])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lo = sorted(map(tuple, ngram_jaccard_pairs(
        df, threshold=0.9, max_naive_candidates=10**9
    ).collect()))
    hi = sorted(map(tuple, ngram_jaccard_pairs(
        df, threshold=0.9, max_naive_candidates=0
    ).collect()))
    assert lo == hi == [(0, 1, 7, 7, 1.0)]


def test_ngram_jaccard_hot_key_overflow_fallback(spark):
    """When the hot-shingle key list exceeds _HOT_KEY_BOUND the InSet
    shortcut must fall back to the broadcast anti join with identical
    results (r13-opt: hot removal + regime estimate share one pass)."""
    from unittest import mock

    from component_duckdb_transformation_spark.operators import dedup

    # "a b c d e f" shingles are corpus-wide hot (freq 12 > cap 6);
    # each trio of docs shares a sub-hot tail (freq 3) that survives
    rows = [
        (i, f"a b c d e f g{i // 3} h{i // 3} k{i // 3} m{i // 3}")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        df, threshold=0.2, max_shingle_freq=6
    ).collect()))
    with mock.patch.object(dedup, "_HOT_KEY_BOUND", 0):
        slow = sorted(map(tuple, dedup.ngram_jaccard_pairs(
            df, threshold=0.2, max_shingle_freq=6
        ).collect()))
    assert fast == slow and fast  # hot shingles removed on both paths
    unfiltered = sorted(map(tuple, dedup.ngram_jaccard_pairs(
        df, threshold=0.2, max_shingle_freq=None
    ).collect()))
    assert unfiltered != fast  # the cap really removed hot shingles
