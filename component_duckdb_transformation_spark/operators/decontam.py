"""Benchmark decontamination for training corpora.

Finds training documents that share word-shingle overlap with a
(small) benchmark/test set — the standard pre-training hygiene step
(n-gram collision decontamination a la GPT-3 appendix C / PaLM): any
training document containing a full n-word shingle that also appears
in an evaluation document is flagged (and usually dropped).

Scale shape (the benchmark side is SMALL, the training side is the
100 TB corpus):

- both sides explode to distinct ``(id, shingle-hash)`` pairs — the
  hash is the portable 60-bit md5 family used across the repo, so an
  ANSI-SQL oracle replays it bit-for-bit;
- the benchmark side reduces to DISTINCT hashes (tiny: |eval corpus|
  x words) and is explicitly ``broadcast()`` — the training corpus is
  never shuffled, the whole probe is map-side;
- per-training-doc contamination counts come from one partial-agg
  groupBy over the (rare) matched pairs only.

The reference engine has no decontamination surface (its scope is
delegated SQL); this extends the repo's training-pipeline north star
alongside dedup (operators/dedup.py) and sampling (sampling.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text_analysis import word_ngrams


def _shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Distinct (id, 60-bit md5 shingle hash) pairs per document.
    DuckDB replay: ``('0x' || substr(md5(shingle), 1, 15))::BIGINT``."""
    h: Column = (
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10)
        .cast("long")
        .alias("shingle_h")
    )
    return (
        df.select(
            F.col(id_col),
            F.explode(word_ngrams(F.col(text_col), n)).alias("shingle"),
        )
        .select(id_col, h)
        .distinct()
    )


def ngram_contamination(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-training-document contamination report against ``benchmark``.

    Returns one row per CONTAMINATED training document:
    ``(id_col, matched_shingles, total_shingles, contamination)`` where
    ``matched_shingles`` counts distinct shingle hashes shared with any
    benchmark document and ``contamination`` = matched/total (one double
    division over exact integer counts — engine-portable). Clean
    documents are absent (anti-join them against this result to keep).

    The benchmark hash set is broadcast: the training side sees a
    map-side hash-join probe, no shuffle of corpus data. Distinct
    per-doc shingles are computed with a partial-aggregable
    ``groupBy`` keyed by (doc, hash) — no whole-corpus collect anywhere.
    """
    train_sh = _shingle_hashes(train, id_col, text_col, n)
    bench_sh = (
        _shingle_hashes(benchmark, id_col, text_col, n)
        .select("shingle_h")
        .distinct()
    )
    totals = train_sh.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("total_shingles")
    )
    matched = (
        train_sh.join(F.broadcast(bench_sh), "shingle_h")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("matched_shingles"))
    )
    return matched.join(totals, id_col).select(
        id_col,
        "matched_shingles",
        "total_shingles",
        (
            F.col("matched_shingles").cast("double")
            / F.col("total_shingles")
        ).alias("contamination"),
    )
