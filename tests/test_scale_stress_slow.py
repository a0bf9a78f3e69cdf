"""10x-corpus stress for the dedup/ANN scale paths (slow-marked).

The sf0.1 gate verifies correctness but its absolute sizes (15k docs)
can't hit memory cliffs: an accidentally-quadratic candidate stage or a
driver-side collect would still finish there. This test explodes the
sf0.1 corpus 10x executor-side (crossJoin with a 10-row replica dim; no
data is generated on the driver) and asserts the three bucketed scale
paths — MinHash+LSH (x03), SimHash (x04), triangle-block embedding
near-dup (x21) — both COMPLETE at 10x and keep their plan shape: no
CartesianProduct / BroadcastNestedLoopJoin anywhere, and the LSH
signature aggregation stays map-side combinable (VERDICT r5 item 6).

Run explicitly: ``python -m pytest -m slow tests/test_scale_stress_slow.py``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
REPLICAS = 10


def _plan(df) -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)


def _no_scale_killers(plan: str, where: str) -> None:
    assert "CartesianProduct" not in plan, f"{where}: cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, f"{where}: nested-loop join"


def _exploded_documents(spark):
    """10x the corpus executor-side: replica r keeps doc identity
    distinct via the id offset and perturbs the tail token so replicas
    are near- (not exact-) duplicates — the candidate structure stays
    LSH-shaped instead of collapsing into 10-deep exact-dup buckets."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    # map-only replication (explode of a literal sequence): the stress
    # corpus itself must not introduce a join into the plans under test
    return (
        docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(n * 2))
        .withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" rep"), F.col("rep"))
            ),
        )
        .drop("rep")
    )


@pytest.mark.slow
def test_minhash_lsh_10x_completes_with_clean_plan(spark):
    from component_duckdb_transformation_spark.operators import dedup

    docs = _exploded_documents(spark)
    pairs = dedup.minhash_lsh_pairs(
        docs, num_hashes=64, bands=16, threshold=0.4, hash_mode="xxhash64"
    )
    plan = _plan(pairs)
    _no_scale_killers(plan, "minhash-lsh 10x")
    # map-side combine on the signature aggregation must survive 10x
    assert plan.count("HashAggregate") >= 2
    n = pairs.count()
    # every replica family (10 near-identical docs) must surface pairs
    assert n > 0


@pytest.mark.slow
def test_simhash_10x_completes_with_clean_plan(spark):
    from component_duckdb_transformation_spark.operators import dedup

    docs = _exploded_documents(spark)
    pairs = dedup.simhash_near_pairs(docs, max_hamming=3)
    plan = _plan(pairs)
    _no_scale_killers(plan, "simhash 10x")
    assert pairs.count() >= 0  # completion is the assertion


@pytest.mark.slow
def test_embedding_blocked_10x_completes_with_clean_plan(spark):
    from component_duckdb_transformation_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = emb.count()
    id_col = emb.columns[0]
    emb10 = (
        emb.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1)))
        )
        .withColumn(id_col, F.col(id_col) + F.col("rep") * F.lit(n * 2))
        .drop("rep")
    )
    pairs = similarity.embedding_near_duplicates_blocked(
        emb10, threshold_q=400000, n_blocks=16
    )
    plan = _plan(pairs)
    _no_scale_killers(plan, "embedding-blocked 10x")
    # identical replicas are exact near-dups: pairs must be found
    assert pairs.count() > 0


@pytest.mark.slow
def test_connected_components_10x_chains(spark):
    """CC at 10x node count: 1.5M-node per-customer chains (replicated
    with disjoint key offsets) must converge in the O(log diameter)
    round budget and keep every per-round shuffle a hash join (no
    cartesian/nested-loop)."""
    from pyspark.sql.window import Window

    from component_duckdb_transformation_spark.operators.graph import (
        connected_components,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    rep = spark.range(REPLICAS).withColumnRenamed("id", "r")
    big = orders.crossJoin(rep).select(
        (F.col("o_orderkey") + F.col("r") * F.lit(10_000_000)).alias("k"),
        (F.col("o_custkey") + F.col("r") * F.lit(10_000_000)).alias("c"),
    )
    w = Window.partitionBy("c").orderBy("k")
    edges = (
        big.withColumn("nxt", F.lead("k").over(w))
        .where(F.col("nxt").isNotNull())
        .select(F.col("k").alias("src"), F.col("nxt").alias("dst"))
    )
    cc = connected_components(edges, max_iter=10, max_driver_edges=0)
    _no_scale_killers(_plan(cc), "cc-10x")
    # components = replicated customers; every label is a chain minimum
    n_clusters = cc.select("cluster").distinct().count()
    n_customers = big.join(
        edges.select(F.col("src").alias("k")), "k", "left_semi"
    ).select("c").distinct().count()
    assert n_clusters == n_customers


def test_decontamination_10x_completes_with_clean_plan(spark):
    """x38 at 10x: one corpus scan, map-side shingle dedup, broadcast
    probe — no corpus-side distinct shuffle, no cartesian anywhere."""
    import re

    from component_duckdb_transformation_spark.operators.decontam import (
        ngram_contamination,
    )

    big = _exploded_documents(spark)
    bench = big.filter(F.col("doc_id") % 97 == 0)
    train = big.filter(F.col("doc_id") % 97 != 0)
    out = ngram_contamination(train, bench, "doc_id", "text", n=3)
    plan = _plan(out)
    _no_scale_killers(plan, "decontam-10x")
    assert "BroadcastHashJoin" in plan
    # KEYED corpus-side shuffles: the groupBy(doc) only; the
    # benchmark-side distinct is the other — nothing else may
    # hash-shuffle at 10x. The narrow-input fan-out (r13-opt,
    # skew.fan_out_narrow) may add at most one ROUND-ROBIN exchange of
    # the compact (id, text) rows ahead of the hashing map stage; it
    # must never be a keyed repartition and never more than one.
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    # formatted mode lists partitioning in the details section
    rr = re.findall(r"RoundRobinPartitioning", plan)
    assert len(rr) <= 1, plan
    assert len(exchanges) - len(rr) <= 2, exchanges
    assert out.count() > 0


def test_repetition_signals_10x_map_only(spark):
    """x37 at 10x: per-doc counters stay pure column expressions — the
    only Exchange in the whole profile is the final groupBy(lang)."""
    import re

    from component_duckdb_transformation_spark.operators.text_analysis import (
        repetition_signals,
    )

    big = _exploded_documents(spark)
    sig = repetition_signals(big, "text", ns=(2, 3))
    agg = sig.groupBy("lang").agg(
        F.sum("ngrams_3").alias("g3"), F.sum("distinct_3").alias("d3")
    )
    plan = _plan(agg)
    _no_scale_killers(plan, "repetition-10x")
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, exchanges
    assert agg.count() > 0


@pytest.mark.slow
def test_semantic_dedup_one_hot_cluster_blocked(spark):
    """Semantic dedup with ~ALL rows in one k-means cell — the
    SemDeDup hot-cluster worst case. The triangle blocking must key
    the pair join by (cluster, ba, bb) so the quadratic splits across
    block-pair tasks instead of funneling through the one hot cluster
    key; plan stays equi-join (no cartesian), and the result still
    matches the unblocked keep-lowest rule computed independently."""
    from component_duckdb_transformation_spark.operators.similarity import (
        semantic_dedup,
    )

    # 4k near-identical vectors (one cluster) + 16 far-away seeds so
    # training still spreads centroids
    base = spark.range(4000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda d: (F.col("id") % 7).cast("float") / 1000.0
            + d.cast("float"),
        ).alias("embedding"),
    )
    out = semantic_dedup(
        base, threshold_q=0, n_clusters=4, n_iters=1, dim=8, n_blocks=8
    )
    plan = _plan(out)
    _no_scale_killers(plan, "semantic_dedup hot cluster")
    assert "ba" in plan and "bb" in plan  # block-pair join keys
    rows = out.collect()
    assert len(rows) == 4000
    # threshold 0 and near-identical vectors: every positive-dot pair
    # collides, so exactly the per-cluster minimum ids keep
    keeps = sorted(r.vec_id for r in rows if r.keep)
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r.vec_id)
    assert keeps == sorted(min(v) for v in by_cluster.values())


@pytest.mark.slow
def test_connected_components_regime_switch_above_threshold(spark):
    """A skewed pair graph just ABOVE max_driver_edges must engage the
    DISTRIBUTED regime (never the driver collect) and still converge:
    one star hub holding half the edges (the hot-label shape) plus
    disjoint chains. Just BELOW the threshold the driver regime
    engages. Regime choice is observed by stubbing the driver path."""
    from unittest import mock

    import component_duckdb_transformation_spark.operators.graph as G

    # ~120k symmetrized edges: 30k-star at hub 0 + 30k chain links
    star = spark.range(1, 30_001).select(
        F.lit(0).alias("src"), F.col("id").alias("dst")
    )
    chains = spark.range(30_000).select(
        (F.lit(1_000_000) + F.col("id") * 2).alias("src"),
        (F.lit(1_000_000) + F.col("id") * 2 + 1).alias("dst"),
    )
    edges = star.union(chains)
    n_sym = 2 * 60_000

    # above threshold: the driver path must NOT be touched
    with mock.patch.object(
        G, "_driver_union_find", side_effect=AssertionError("driver regime engaged")
    ):
        cc = G.connected_components(
            edges, max_iter=12, max_driver_edges=n_sym - 1
        )
        labs = cc.collect()
    star_labels = {r.cluster for r in labs if r.node <= 30_000}
    assert star_labels == {0}
    assert sum(1 for r in labs if r.node >= 1_000_000) == 60_000

    # below threshold: driver regime engages (stub observes the call)
    called = {}
    real = G._driver_union_find

    def spy(*a, **k):
        called["yes"] = True
        return real(*a, **k)

    with mock.patch.object(G, "_driver_union_find", side_effect=spy):
        G.connected_components(
            edges, max_iter=12, max_driver_edges=n_sym + 1
        ).collect()
    assert called.get("yes")


@pytest.mark.slow
def test_streaming_window_mad_large_partitions(spark):
    """Running mad over 100k-row partitions — infeasible under the
    O(frame)-per-row fold (~5e9 element-ops per partition), seconds
    under the streaming order-statistics core. Spot-checks the result
    against the fold on a truncated prefix of one partition."""
    from component_duckdb_transformation_spark.functions.dialect import (
        translate,
    )
    from component_duckdb_transformation_spark.functions.jvm_udfs import (
        register_jvm_udfs,
    )

    register_jvm_udfs(spark)
    spark.sql(
        "SELECT id % 8 AS p, id AS o, CAST(rand(7) * 1000 AS DOUBLE) AS v"
        " FROM range(800000)"
    ).createOrReplaceTempView("bigw")
    t = translate(
        "SELECT p, o, mad(v) OVER (PARTITION BY p ORDER BY o) AS m"
        " FROM bigw"
    )
    assert "__duck_win_os" in t
    out = spark.sql(t)
    assert out.count() == 800000
    # fold-check the first 3000 rows of one partition
    probe = spark.sql(
        "SELECT o, v FROM bigw WHERE p = 3 ORDER BY o LIMIT 3000"
    )
    probe.createOrReplaceTempView("bigw_probe")
    fold = spark.sql(
        "SELECT o, element_at(transform(array(CAST((collect_list(v)"
        " OVER (ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING AND"
        " CURRENT ROW)) AS ARRAY<DOUBLE>)), __s0 ->"
        " __duck_mad_j(__s0, 'double')), 1) AS m FROM bigw_probe"
    )
    want = {r.o: r.m for r in fold.collect()}
    got = {
        r.o: r.m
        for r in out.filter("p = 3").orderBy("o").limit(3000).collect()
    }
    assert got == want


def test_streaming_window_one_million_row_partition(spark):
    """r13: ONE 1M-row window partition through the streaming core —
    running quantile_cont + a FOLLOWING-bounded mad in the same
    statement (shared WindowExec). The fold would be ~5e11
    element-ops; the treap streams it in seconds."""
    from component_duckdb_transformation_spark.functions.dialect import (
        translate,
    )
    from component_duckdb_transformation_spark.functions.jvm_udfs import (
        register_jvm_udfs,
    )

    register_jvm_udfs(spark)
    spark.sql(
        "SELECT CAST(0 AS INT) AS p, id AS o,"
        " CAST(rand(13) * 1e6 AS DOUBLE) AS v FROM range(1000000)"
    ).createOrReplaceTempView("bigw1m")
    t = translate(
        "SELECT p, o,"
        " quantile_cont(v, 0.9) OVER (PARTITION BY p ORDER BY o) AS q,"
        " mad(v) OVER (PARTITION BY p ORDER BY o"
        "   ROWS BETWEEN 50 PRECEDING AND 10 FOLLOWING) AS m"
        " FROM bigw1m"
    )
    assert t.count("__duck_win_os") == 2 and "_folw#" in t
    out = spark.sql(t)
    assert out.count() == 1000000
    # fold-check a 2000-row prefix (running q) and a mid-stream window
    # slice (folw mad)
    probe = spark.sql("SELECT o, v FROM bigw1m ORDER BY o LIMIT 2000")
    probe.createOrReplaceTempView("bigw1m_probe")
    fold = spark.sql(
        "SELECT o,"
        " percentile(v, 0.9) OVER (ORDER BY o ROWS BETWEEN UNBOUNDED"
        "   PRECEDING AND CURRENT ROW) AS q,"
        " element_at(transform(array(CAST((collect_list(v) OVER"
        "   (ORDER BY o ROWS BETWEEN 50 PRECEDING AND 10 FOLLOWING))"
        "   AS ARRAY<DOUBLE>)), __s0 -> __duck_mad_j(__s0, 'double')),"
        "   1) AS m"
        " FROM bigw1m_probe"
    ).collect()
    want = {r.o: (r.q, r.m) for r in fold}
    got = {
        r.o: (r.q, r.m)
        for r in out.orderBy("o").limit(2000).collect()
    }
    # the last 10 rows of the probe see a clipped fold frame (the full
    # stream keeps going) — exclude them
    for o in sorted(want)[:-10]:
        assert got[o] == want[o], (o, got[o], want[o])


def test_streaming_window_all_ties_range_peers(spark):
    """Adversarial all-ties RANGE ordering: every row in a partition is
    one peer group, so the first peer ingests the WHOLE partition and
    the rest replay the cached answer — and the answer must equal the
    full-frame aggregate."""
    from component_duckdb_transformation_spark.functions.dialect import (
        translate,
    )
    from component_duckdb_transformation_spark.functions.jvm_udfs import (
        register_jvm_udfs,
    )

    register_jvm_udfs(spark)
    spark.sql(
        "SELECT id % 4 AS p, CAST(1 AS INT) AS o,"
        " CAST(id % 997 AS DOUBLE) AS v FROM range(200000)"
    ).createOrReplaceTempView("tiesw")
    t = translate(
        "SELECT p, quantile_cont(v, 0.25) OVER"
        " (PARTITION BY p ORDER BY o) AS q FROM tiesw"
    )
    assert "__duck_win_os" in t
    rows = spark.sql(t).collect()
    assert len(rows) == 200000
    per_p = {}
    for r in rows:
        per_p.setdefault(r.p, set()).add(r.q)
    # one constant answer per partition (RANGE frame = whole partition)
    assert all(len(v) == 1 for v in per_p.values())
    want = {
        r.p: r.q
        for r in spark.sql(
            "SELECT p, percentile(v, 0.25) AS q FROM tiesw GROUP BY p"
        ).collect()
    }
    assert {p: next(iter(v)) for p, v in per_p.items()} == want


def test_streaming_window_state_bound_raises_loudly(spark):
    """The buffered-value bound must raise, not degrade. The bound is
    -Dduckspark.winos.maxBuffer (default 2^26) read at stream start;
    a small override triggers the documented IllegalStateException
    without a 67M-row run (verified once at the real bound: 15m51s,
    raise confirmed)."""
    import pytest as _pytest

    from component_duckdb_transformation_spark.functions.dialect import (
        translate,
    )
    from component_duckdb_transformation_spark.functions.jvm_udfs import (
        register_jvm_udfs,
    )

    register_jvm_udfs(spark)
    jvm = spark._jvm
    jvm.java.lang.System.setProperty("duckspark.winos.maxBuffer", "5000")
    try:
        spark.sql(
            "SELECT CAST(0 AS INT) AS p, id AS o, CAST(id AS DOUBLE) AS v"
            " FROM range(6000)"
        ).createOrReplaceTempView("bigw_over")
        t = translate(
            "SELECT count(*) AS n FROM (SELECT mad(v) OVER"
            " (PARTITION BY p ORDER BY o) AS m FROM bigw_over) s"
            " WHERE m IS NOT NULL"
        )
        with _pytest.raises(Exception, match="exceeds"):
            spark.sql(t).collect()
    finally:
        jvm.java.lang.System.clearProperty("duckspark.winos.maxBuffer")
