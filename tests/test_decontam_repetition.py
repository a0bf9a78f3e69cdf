"""Unit tests for repetition quality signals and n-gram benchmark
decontamination (operators/text_analysis.py, operators/decontam.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from component_duckdb_transformation_spark.operators.decontam import (
    ngram_contamination,
)
from component_duckdb_transformation_spark.operators.text_analysis import (
    duplicate_ngram_fraction,
    repetition_signals,
    word_ngrams,
)


def _texts(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_word_ngrams_values_and_short_text(spark):
    df = _texts(spark, "a b c d", "a b", "a")
    out = df.select(
        word_ngrams(F.col("text"), 3).alias("g3"),
        word_ngrams(F.col("text"), 2).alias("g2"),
    ).collect()
    assert out[0].g3 == ["a b c", "b c d"]
    assert out[0].g2 == ["a b", "b c", "c d"]
    assert out[1].g3 == []  # 2 words < n=3: empty, not sequence(1,0)
    assert out[2].g2 == []


def test_duplicate_ngram_fraction(spark):
    # "a b a b a": 2-grams = [a b, b a, a b, b a] -> 4 total, 2 distinct
    df = _texts(spark, "a b a b a", "x y z")
    out = df.select(
        duplicate_ngram_fraction(F.col("text"), 2).alias("f")
    ).collect()
    assert out[0].f == 0.5
    assert out[1].f == 0.0


def test_repetition_signals_counters(spark):
    df = _texts(spark, "a a a a")
    row = repetition_signals(df, "text", ns=(2, 3)).collect()[0]
    assert (row.n_words, row.n_distinct_words) == (4, 1)
    assert (row.ngrams_2, row.distinct_2) == (3, 1)
    assert (row.ngrams_3, row.distinct_3) == (2, 1)


def test_ngram_contamination_counts(spark):
    train = _texts(
        spark,
        "the quick brown fox jumps",   # shares "quick brown fox" 3-gram
        "completely clean document here",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox appears")], "doc_id bigint, text string"
    )
    out = ngram_contamination(train, bench, "doc_id", "text", n=3).collect()
    assert len(out) == 1
    row = out[0]
    assert row.doc_id == 0
    # doc 0 has 3 distinct 3-gram shingles, 1 matched
    assert (row.matched_shingles, row.total_shingles) == (1, 3)
    assert abs(row.contamination - 1 / 3) < 1e-15


def test_ngram_contamination_broadcasts_benchmark(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    out = ngram_contamination(train, bench, "doc_id", "text", n=3)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = out._jdf.queryExecution().explainString(jmode)
    # benchmark hash set must reach the corpus probe as a broadcast —
    # the training side is never shuffled for the contamination probe
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_repetition_signals_tokenization_edges(spark):
    """The compiled DuckNgramStats pass must reproduce split-on-space
    semantics exactly on the edges: consecutive spaces yield empty
    words, leading/trailing spaces yield boundary empties, '' is one
    empty word — byte-matched against DuckDB's string_split spelling
    (the x37 oracle)."""
    import duckdb

    texts = [
        "",            # one empty word
        " ",           # two empty words
        "a  b",        # interior empty word
        " a b ",       # boundary empties
        "a a a a",     # all-duplicate 1/2/3-grams
        "x",           # single word, no n-grams
        "a b a b a",   # overlapping repeated 2-grams
    ]
    df = _texts(spark, *texts)
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_distinct_words"],
            r["ngrams_2"], r["distinct_2"],
            r["ngrams_3"], r["distinct_3"],
        )
        for r in repetition_signals(df, "text", ns=(2, 3)).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        lit = t.replace("'", "''")
        want = con.execute(
            f"""
            SELECT len(w), len(list_distinct(w)),
                   len(g2), len(list_distinct(g2)),
                   len(g3), len(list_distinct(g3))
            FROM (SELECT w,
                    list_transform(generate_series(1, len(w) - 1),
                                   i -> array_to_string(w[i:i+1], ' ')) AS g2,
                    list_transform(generate_series(1, len(w) - 2),
                                   i -> array_to_string(w[i:i+2], ' ')) AS g3
                  FROM (SELECT string_split('{lit}', ' ') AS w))
            """
        ).fetchone()
        assert got[i] == tuple(want), (repr(t), got[i], tuple(want))
