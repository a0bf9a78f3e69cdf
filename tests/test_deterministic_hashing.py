"""Engine-portable (md5-based) hash modes: the deterministic variants of
MinHash-LSH, SimHash, and hyperplane LSH used by the oracle-verified
workloads. The cross-engine bit-identity itself is covered by
tools/diff_check.py; these tests lock the Spark-side semantics."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from component_duckdb_transformation_spark.operators import dedup, similarity


def test_md5_seed_matches_hashlib():
    assert dedup.md5_seed(0) == int(hashlib.md5(b"0").hexdigest()[:15], 16)
    assert 0 <= dedup.md5_seed(63) < 2 ** 60


def test_integer_hyperplanes_deterministic_and_bounded():
    a = similarity.integer_hyperplanes(dim=8, n_planes=4)
    b = similarity.integer_hyperplanes(dim=8, n_planes=4)
    assert a == b
    assert all(-1000 <= v <= 1000 for row in a for v in row)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup
        (3, "completely different text about databases and spark engines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_md5_mode_finds_exact_dup(spark):
    out = dedup.minhash_lsh_pairs(_docs(spark), hash_mode="md5").collect()
    pairs = {(r.d1, r.d2): r.jaccard for r in out}
    assert pairs.get((1, 2)) == 1.0
    assert all(d in (1, 2) for p in pairs for d in p)


def test_simhash_md5_mode_is_60_bit(spark):
    sigs = dedup.simhash_signatures(_docs(spark), hash_mode="md5").collect()
    assert all(0 <= r.simhash < 2 ** 60 for r in sigs)
    out = dedup.simhash_near_pairs(_docs(spark), hash_mode="md5").collect()
    assert {(r.d1, r.d2) for r in out} == {(1, 2)}
    assert all(r.hamming == 0 for r in out)


def test_trunc_div_matches_duckdb_semantics():
    assert similarity._trunc_div(-7, 2) == -3  # DuckDB // truncates
    assert similarity._trunc_div(7, 2) == 3
    assert similarity._trunc_div(0, 5) == 0


def test_ivf_quantized_self_is_top1(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((40, 8)).astype("float32") * 0.4
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    queries = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.ivf_topk_quantized(
        df, queries, k=5, n_clusters=4, n_probe=2, n_iters=2, dim=8
    ).collect()

    # independent numpy replica of the deterministic pipeline
    scaled = vecs.astype(np.float64) * 1000
    qv = np.trunc(scaled + np.copysign(0.5, scaled)).astype(np.int64)
    cent = qv[:4].copy()
    for _ in range(2):
        d2 = ((qv[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argsort(d2, axis=1, kind="stable")[:, 0]
        for c in range(4):
            m = qv[assign == c]
            if len(m):
                s = m.sum(axis=0)
                cent[c] = np.where(s < 0, -((-s) // len(m)), s // len(m))
    d2 = ((qv[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    cell = np.argsort(d2, axis=1, kind="stable")[:, 0]
    expected = set()
    for qid in range(3):
        probes = np.argsort(d2[qid], kind="stable")[:2]
        cand = [v for v in range(40) if cell[v] in probes]
        ranked = sorted(cand, key=lambda v: (-int(qv[qid] @ qv[v]), v))[:5]
        for r, v in enumerate(ranked, 1):
            expected.add((qid, v, int(qv[qid] @ qv[v]), r))
    assert {(r.query_id, r.vec_id, r.score, r.rnk) for r in out} == expected


def test_lsh_quantized_self_is_top1(spark):
    emb = spark.table if False else None  # noqa: F841 - keep flake quiet
    df = spark.createDataFrame(
        [(i, [float(i == j) for j in range(8)]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.lsh_bucketed_topk(
        df, queries, k=3, n_planes=4, dim=8, n_probe=2, quantize=1000
    )
    top1 = {r.query_id: r.vec_id for r in out.filter(F.col("rank") == 1).collect()}
    # each query's own vector shares its bucket and has the max dot
    assert top1 == {0: 0, 1: 1}


def test_lsh_bucket_vectorized_matches_expr(spark):
    """The numpy mapInPandas bucketizer must be bit-identical to the
    Column-expression form (same quantization, same sign bits) — the
    oracle replays the latter's arithmetic in SQL."""
    from pyspark.sql import functions as F

    from component_duckdb_transformation_spark.operators import similarity

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(500)
    planes = similarity.integer_hyperplanes(64, 8)
    expr_rows = emb.select(
        "vec_id",
        similarity._bucket_expr_quantized(
            F.col("embedding"), planes, 1000
        ).alias("bucket"),
    ).collect()
    vec_rows = similarity._with_quantized_bucket(
        emb.select("vec_id", "embedding"), "embedding", planes, 1000
    ).select("vec_id", "bucket").collect()
    assert {(r.vec_id, r.bucket) for r in expr_rows} == {
        (r.vec_id, r.bucket) for r in vec_rows
    }
