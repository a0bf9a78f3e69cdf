"""Benchmark decontamination for training corpora.

Finds training documents that share word-shingle overlap with a
(small) benchmark/test set — the standard pre-training hygiene step
(n-gram collision decontamination a la GPT-3 appendix C / PaLM): any
training document containing a full n-word shingle that also appears
in an evaluation document is flagged (and usually dropped).

Scale shape (the benchmark side is SMALL, the training side is the
100 TB corpus):

- per-document shingle hashes are deduped MAP-SIDE with
  ``array_distinct`` before exploding, so the corpus is scanned ONCE
  and no distinct-shuffle of (doc, shingle) pairs ever happens — the
  hash is the portable 60-bit md5 family used across the repo, so an
  ANSI-SQL oracle replays it bit-for-bit;
- the benchmark side reduces to DISTINCT hashes (tiny: |eval corpus|
  x words) and is explicitly ``broadcast()`` — the probe is a
  map-side left join, the corpus is never shuffled for it;
- the only corpus shuffle is the final partial-aggregable
  ``groupBy(doc)`` counting total vs matched shingles.

The reference engine has no decontamination surface (its scope is
delegated SQL); this extends the repo's training-pipeline north star
alongside dedup (operators/dedup.py) and sampling (sampling.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text_analysis import word_ngrams


def _hash60(s: Column) -> Column:
    """Portable 60-bit md5 hash. DuckDB replay:
    ``('0x' || substr(md5(s), 1, 15))::BIGINT``."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _doc_shingle_hashes(text: Column, n: int) -> Column:
    """Per-document DISTINCT shingle-hash array — a pure column
    expression, so deduplication happens map-side inside the scan
    stage instead of a corpus-wide DISTINCT shuffle."""
    return F.array_distinct(
        F.transform(word_ngrams(text, n), lambda s: _hash60(s))
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

    One scan of the corpus: per-doc hashes dedupe map-side, the
    benchmark hash set arrives as a broadcast, and a single
    partial-aggregable groupBy(doc) produces both counters. The
    shingling+hash map stage is the whole cost and runs inside the scan
    stage — a narrow (single-split) corpus is fanned out to the
    session's cores first (no-op when the scan already parallelizes).
    """
    from .skew import fan_out_narrow

    train = fan_out_narrow(train)
    train_sh = train.select(
        F.col(id_col),
        F.explode(_doc_shingle_hashes(F.col(text_col), n)).alias("shingle_h"),
    )
    bench_sh = (
        benchmark.select(
            F.explode(
                _doc_shingle_hashes(F.col(text_col), n)
            ).alias("shingle_h")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    probed = train_sh.join(F.broadcast(bench_sh), "shingle_h", "left")
    return (
        probed.groupBy(id_col)
        .agg(
            F.count("__hit").cast("bigint").alias("matched_shingles"),
            F.count("*").cast("bigint").alias("total_shingles"),
        )
        .filter(F.col("matched_shingles") > 0)
        .select(
            id_col,
            "matched_shingles",
            "total_shingles",
            (
                F.col("matched_shingles").cast("double")
                / F.col("total_shingles")
            ).alias("contamination"),
        )
    )
