"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure column expressions over built-in
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen friendly, no
Python UDFs in the hot path — so they scale linearly with input splits
(no shuffle at all: these are map-only).

The reference has no text operators (its surface is delegated SQL);
these extend the engine per the driver's north star (BASELINE.json).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small multilingual stopword marker sets for the heuristic language id
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "nicht"),
    "fr": ("le", "la", "les", "et", "des"),
    "es": ("el", "los", "las", "que", "y"),
}

_STOPWORDS = ("the", "a", "of", "and", "or", "to", "in", "is", "on", "for")

HASH_MOD = 1_000_000_007


def words(text: Column) -> Column:
    return F.split(text, " ")


def word_count(text: Column) -> Column:
    return F.size(words(text))


def avg_word_length(text: Column) -> Column:
    wc = word_count(text)
    total = F.length(text) - (wc - F.lit(1))  # minus separator spaces
    return F.when(wc > 0, total.cast("double") / wc).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    w = words(text)
    hits = F.size(F.filter(w, lambda x: x.isin(*_STOPWORDS)))
    return F.when(F.size(w) > 0, hits.cast("double") / F.size(w)).otherwise(F.lit(0.0))


def unique_word_ratio(text: Column) -> Column:
    w = words(text)
    return F.when(
        F.size(w) > 0, F.size(F.array_distinct(w)).cast("double") / F.size(w)
    ).otherwise(F.lit(0.0))


def non_alpha_ratio(text: Column) -> Column:
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z ]", ""))
    return F.when(
        F.length(text) > 0,
        (F.length(text) - alpha).cast("double") / F.length(text),
    ).otherwise(F.lit(0.0))


def token_count_whitespace(text: Column) -> Column:
    return word_count(text).cast("bigint")


def token_count_bpe_ish(text: Column) -> Column:
    """Approximate subword token count: alpha runs count ~ceil(len/4)
    tokens each (BPE-ish), plus digit runs and symbols."""
    alpha_chars = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    # regexp_count's pattern arg is ColumnOrName — a bare str is a column ref
    digit_runs = F.regexp_count(text, F.lit(r"[0-9]+"))
    symbols = F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]"))
    # floor, not cast-truncate: DuckDB CAST(double AS BIGINT) rounds while
    # Spark truncates — floor() agrees in both engines
    return (F.floor((alpha_chars + F.lit(3)) / F.lit(4)) + digit_runs + symbols).cast(
        "bigint"
    )


def quality_score(text: Column) -> Column:
    """Composite 0-1 quality heuristic: long-enough, diverse, low-symbol."""
    wc = word_count(text).cast("double")
    length_part = F.least(wc / F.lit(50.0), F.lit(1.0))
    diversity = unique_word_ratio(text)
    cleanliness = F.lit(1.0) - F.least(non_alpha_ratio(text) * 5, F.lit(1.0))
    return F.round((length_part + diversity + cleanliness) / 3, 6)


def language_id(text: Column) -> Column:
    """Heuristic marker-word language id. Deterministic greatest-hits
    vote with fixed tie order en > de > fr > es."""
    w = words(F.lower(text))

    def marker_score(markers):
        # NB: closure, not a default-arg lambda — pyspark counts lambda
        # params to decide (x) vs (x, i) higher-order signatures
        return F.size(F.filter(w, lambda x: x.isin(*markers)))

    scores = {lang: marker_score(markers) for lang, markers in _LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    result = F.lit("unknown")
    for lang in ("es", "fr", "de", "en"):  # reversed priority: later wins ties
        result = F.when(scores[lang] == best, F.lit(lang)).otherwise(result)
    return F.when(best > 0, result).otherwise(F.lit("unknown"))


def doc_fingerprint(text: Column) -> Column:
    """Order-sensitive 63-bit document fingerprint: polynomial rolling
    hash over per-word codes, exact integer arithmetic (reproducible in
    any engine: same formula is expressible in DuckDB as
    list_reduce(list_prepend(0, list_transform(...))))."""
    codes = F.transform(
        words(text),
        lambda w: (F.ascii(w) * 31 + F.length(w)).cast("bigint"),
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 131 + x) % HASH_MOD,
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; empty list when the text
    has fewer than ``n`` words. Pure column expression (map-only).

    NB: Spark's ``sequence(1, stop)`` DESCENDS when stop < 1 (it never
    returns an empty array), so the short-text case needs an explicit
    empty-array branch — DuckDB's ``generate_series`` returns [] there.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = words(text)
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def duplicate_ngram_fraction(text: Column, n: int) -> Column:
    """Gopher-style repetition signal: fraction of word n-gram
    occurrences that are repeats of an earlier one (0 when the text has
    fewer than ``n`` words). 1 - distinct/total over the n-gram list;
    both counts are exact integers so the single double division is
    bit-identical in any engine."""
    g = word_ngrams(text, n)
    return F.when(
        F.size(g) > 0,
        F.lit(1.0) - F.size(F.array_distinct(g)).cast("double") / F.size(g),
    ).otherwise(F.lit(0.0))


def repetition_signals(
    df: DataFrame, text_col: str = "text", ns: Sequence[int] = (2, 3)
) -> DataFrame:
    """Per-document repetition counters for quality filtering
    (Gopher/MassiveText-style): for each n in ``ns``, total n-gram
    occurrences and distinct n-grams (``ngrams_{n}``/``distinct_{n}``),
    plus word totals. Counters are exact BIGINTs so downstream
    corpus-level fractions (1 - sum(distinct)/sum(total)) are
    aggregation-order-independent — summing doubles would make the
    result depend on partial-aggregation order at scale. Map-only.

    Hot path: all counters come from ONE compiled JVM pass per document
    (jvm/duckspark/DuckNgramStats.java — word-boundary offsets plus a
    substring hash set; an n-gram's space-join is literally a substring
    of the document, so nothing is assembled per gram). The retired
    pure-column spelling (word_ngrams + array_distinct per n) built and
    hashed every concatenated n-gram string in the plan — 10x slower at
    sf0.1 — and stays only as the fallback when the session cannot ADD
    JAR."""
    text = F.col(text_col)
    try:
        from ..functions.jvm_udfs import register_jvm_udfs

        register_jvm_udfs(df.sparkSession)
    except Exception:  # noqa: BLE001 — no-ADD-JAR session: column path
        # NULL text must yield NULL counters in BOTH regimes: the JVM
        # core returns NULL, but F.size(NULL array) is -1 under
        # spark.sql.legacy.sizeOfNull=true — gate every counter on
        # text.isNotNull() so the regimes never silently differ
        def _nn(col):
            return F.when(text.isNotNull(), col).cast("bigint")

        w = words(text)
        out = df.withColumn("n_words", _nn(F.size(w))).withColumn(
            "n_distinct_words", _nn(F.size(F.array_distinct(w)))
        )
        for n in ns:
            g = word_ngrams(text, n)
            out = out.withColumn(
                f"ngrams_{n}", _nn(F.size(g))
            ).withColumn(f"distinct_{n}", _nn(F.size(F.array_distinct(g))))
        return out
    ns_all = (1, *ns)
    st = F.call_udf(
        "__duck_ngram_stats", text, F.lit(",".join(map(str, ns_all)))
    )
    out = df.withColumn("__ngs", st)
    out = out.withColumn("n_words", F.col("__ngs")[0]).withColumn(
        "n_distinct_words", F.col("__ngs")[1]
    )
    for k, n in enumerate(ns, start=1):
        out = out.withColumn(f"ngrams_{n}", F.col("__ngs")[2 * k]).withColumn(
            f"distinct_{n}", F.col("__ngs")[2 * k + 1]
        )
    return out.drop("__ngs")


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, term, tf, df, tfidf, rnk).

    Classic corpus weighting, all shuffle-light: term frequencies are one
    explode + partial-aggregated groupBy; document frequencies aggregate
    the same exploded rows (docs x distinct-terms cardinality); the join
    back is keyed on the term. ``tfidf = tf * ln(N / df)`` with exact
    integer tf/df so the score is engine-reproducible. Ties resolve by
    (tfidf desc, term asc).
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    n_docs = df.count()  # scalar; the only driver-side value
    words_df = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = words_df.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    docfreq = (
        words_df.distinct().groupBy("term").agg(F.count("*").alias("df"))
    )
    scored = tf.join(docfreq, "term").withColumn(
        "tfidf",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rnk")
    )


def token_entropy(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group base-2 Shannon entropy of the TOKEN distribution:
    (group, n_tokens, n_distinct, entropy) — vocabulary-concentration
    measure for corpus slices (low entropy flags templated/spammy text).

    The 100 TB-safe entropy shape (contrast with the dialect layer's
    ``entropy()`` rewrite, which gathers a group's values into one
    array): two chained partial-aggregated groupBys — token counts per
    (group, token), then per-group ``log2(N) - sum(c*log2(c))/N`` —
    every stage map-side combinable, state per key is one counter, no
    per-group array materialization at any cardinality.
    """
    tokens = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = tokens.groupBy("grp", "tok").agg(F.count("*").alias("c"))
    return (
        counts.groupBy("grp")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.sum(F.col("c") * F.log2("c")).alias("_clgc"),
        )
        .select(
            F.col("grp").alias(group_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
            F.round(
                F.log2("n_tokens") - F.col("_clgc") / F.col("n_tokens"), 6
            ).alias("entropy"),
        )
    )


def with_text_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full metric set as columns (map-only, no shuffle)."""
    t = F.col(text_col)
    return df.select(
        "*",
        word_count(t).alias("n_words"),
        F.round(avg_word_length(t), 6).alias("avg_word_len"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(unique_word_ratio(t), 6).alias("unique_ratio"),
        quality_score(t).alias("quality"),
        language_id(t).alias("lang_pred"),
        doc_fingerprint(t).alias("fingerprint"),
        token_count_whitespace(t).alias("n_tokens_ws"),
        token_count_bpe_ish(t).alias("n_tokens_bpe"),
    )


# PII scrubbing: conservative patterns valid in BOTH Java regex (Spark)
# and RE2-ish DuckDB regex, so the operator is oracle-replayable. The
# patterns are deliberately high-precision (training-data scrubbing
# wants no false positives on code/math tokens); swap in stricter
# corpora-specific patterns at the call site.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(text: Column, patterns: dict | None = None) -> Column:
    """Replace every PII match with a ``<KIND>`` sentinel — map-only,
    chained JVM ``regexp_replace`` (no Python in the hot path)."""
    out = text
    for kind, pat in (patterns or PII_PATTERNS).items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out


def pii_counts(text: Column, patterns: dict | None = None) -> dict:
    """One count column per PII kind (``size(regexp_extract_all(...))``,
    vectorized JVM-side)."""
    return {
        kind: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for kind, pat in (patterns or PII_PATTERNS).items()
    }


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_words: int = 50,
) -> DataFrame:
    """CCNet-style statistical quality scoring (Wenzek et al. 2020
    filter web text by LM perplexity): train a word-bigram model on
    the corpus itself in ONE aggregation pass, then score each
    document by its mean bigram log-probability. The in-corpus bigram
    model stands in for CCNet's pretrained KenLM — the distributed
    scoring shape (corpus-level count aggregation, broadcast-or-hash
    join back onto the per-doc bigrams, per-doc mean) is identical,
    and every step is ANSI-SQL-replayable.

    Shuffles: one explode (map-side), two keyed count aggregations
    with partial aggregation, joins keyed by the bigram/unigram —
    counts are unique per key so the join never fans out. Common-word
    hot keys only widen a count row's match set (standard hash-join
    skew, no row explosion). Output: (doc_id, n_bigrams, avg_logp),
    docs with >= 2 words among their first ``max_words``.
    """
    # NOTE (r13-opt, measured): fan_out_narrow(docs) here made the
    # whole workload SLOWER (2.6s -> 4.5s at sf0.1): the three consumer
    # branches each inherit 32-partition shuffles whose task overhead
    # exceeds the parallelized explode win. Fan-out pays off on
    # map-only pipelines (decontam, banding), not join-heavy ones.
    w = docs.selectExpr(
        f"{id_col} AS doc_id",
        f"slice(split({text_col}, ' '), 1, {max_words}) AS w",
    ).filter(F.expr("size(w) >= 2"))
    bi = w.selectExpr(
        "doc_id",
        "explode(transform(sequence(1, size(w) - 1), "
        "i -> struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2)"
        ")) AS bg",
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c12 = bi.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    c1 = bi.groupBy("w1").agg(F.count("*").alias("n"))
    scored = (
        bi.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .withColumn(
            "lp", F.log(F.col("c").cast("double") / F.col("n"))
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logp"),
    )
