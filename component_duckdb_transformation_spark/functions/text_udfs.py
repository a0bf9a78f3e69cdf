"""String-similarity functions DuckDB ships natively but Spark lacks:
``jaro_similarity``, ``jaro_winkler_similarity``, ``damerau_levenshtein``
(reference exposes them through DuckDB's function library; e.g. DuckDB
docs list them under text functions).

No Spark builtin exists, and the algorithms are per-pair dynamic
programming — not expressible in vectorized SQL. They are registered as
Arrow-batched pandas UDFs: batches cross the Python boundary via Arrow,
the DP runs per row in Python. That makes them the ONLY per-row Python
compute in the engine; they are documented as such (COVERAGE.md) and
cost ~1-5 us/pair, fine for match/dedup workloads, and they distribute
like any other UDF (no driver collect, no shuffle of their own).

Semantics verified differentially against DuckDB in
tests/test_text_udfs.py, including the full (unrestricted)
Damerau-Levenshtein — DuckDB's ``damerau_levenshtein('ca','abc') = 2``
rules out the cheaper OSA variant.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf


def jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0  # DuckDB: empty input is 0, even for ('','')
    if s1 == s2:
        return 1.0
    match_dist = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(l2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, p: float = 0.1, threshold: float = 0.7) -> float:
    j = jaro(s1, s2)
    if j <= threshold:
        return j
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def damerau_levenshtein(a: str, b: str) -> int:
    """Full (unrestricted) Damerau-Levenshtein — transpositions may have
    intervening edits, matching DuckDB."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    da: dict[str, int] = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - 1 - k) + 1 + (j - 1 - l),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def levenshtein(a: bytes, b: bytes) -> int:
    """Plain Levenshtein over bytes (no transpositions) — the non-ASCII
    fallback for DuckDB's byte-based builtin; the dialect layer
    dispatches ASCII pairs to Spark's JVM builtin."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ai = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ai != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def _pairwise(fn, a: pd.Series, b: pd.Series, null):
    # DuckDB runs these over UTF-8 BYTES, not codepoints ('résumé' vs
    # 'resume' gives the 8-vs-6-length jaro) — encode before the DP
    return pd.Series(
        [
            null
            if x is None or y is None
            else fn(x.encode("utf-8"), y.encode("utf-8"))
            for x, y in zip(a, b)
        ],
        dtype="object",
    )


def age_interval(dt1, dt2) -> str:
    """Postgres/DuckDB ``age(dt1, dt2)``: field-wise calendar difference
    with unit borrowing (days borrow days-in-month of the EARLIER
    operand's month), rendered as DuckDB's INTERVAL->VARCHAR text
    ('43 years 9 months 27 days', '-1 month -22:44:45.123456',
    '00:00:00' for equal inputs). Verified differentially against
    DuckDB in tests/test_text_udfs.py."""
    import calendar

    neg = dt1 < dt2
    a, b = (dt2, dt1) if neg else (dt1, dt2)
    us = a.microsecond - b.microsecond
    s = a.second - b.second
    mi = a.minute - b.minute
    h = a.hour - b.hour
    d = a.day - b.day
    mo = a.month - b.month
    y = a.year - b.year
    if us < 0:
        us += 1_000_000
        s -= 1
    if s < 0:
        s += 60
        mi -= 1
    if mi < 0:
        mi += 60
        h -= 1
    if h < 0:
        h += 24
        d -= 1
    while d < 0:
        d += calendar.monthrange(b.year, b.month)[1]
        mo -= 1
    while mo < 0:
        mo += 12
        y -= 1
    sign = "-" if neg else ""
    parts = []
    if y:
        parts.append(f"{sign}{y} year" + ("s" if y != 1 else ""))
    if mo:
        parts.append(f"{sign}{mo} month" + ("s" if mo != 1 else ""))
    if d:
        parts.append(f"{sign}{d} day" + ("s" if d != 1 else ""))
    if h or mi or s or us or not parts:
        frac = f".{us:06d}".rstrip("0") if us else ""
        parts.append(f"{sign}{h:02d}:{mi:02d}:{s:02d}{frac}")
    return " ".join(parts)


def register_text_udfs(spark: SparkSession) -> None:
    """Idempotent per-session registration (called from the session
    factory so every engine session resolves the names in plain SQL)."""

    @pandas_udf("double")
    def _jaro_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return _pairwise(jaro, a, b, None).astype("float64")

    @pandas_udf("double")
    def _jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return _pairwise(jaro_winkler, a, b, None).astype("float64")

    @pandas_udf("long")
    def _dl_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return _pairwise(damerau_levenshtein, a, b, None).astype("Int64")

    @pandas_udf("long")
    def _lev_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return _pairwise(levenshtein, a, b, None).astype("Int64")

    import math

    def _num_pairwise(fn, a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if x is None or y is None else fn(int(x), int(y))
                for x, y in zip(a, b)
            ],
            dtype="object",
        )

    @pandas_udf("long")
    def _gcd_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return _num_pairwise(math.gcd, a, b).astype("Int64")

    @pandas_udf("long")
    def _lcm_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return _num_pairwise(math.lcm, a, b).astype("Int64")

    @pandas_udf("double")
    def _gamma_udf(x: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else math.gamma(v) for v in x],
            dtype="object",
        ).astype("float64")

    @pandas_udf("double")
    def _lgamma_udf(x: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None else math.lgamma(v) for v in x],
            dtype="object",
        ).astype("float64")

    import unicodedata

    @pandas_udf("string")
    def _strip_accents_udf(x: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if v is None
                else "".join(
                    c
                    for c in unicodedata.normalize("NFD", v)
                    if not unicodedata.combining(c)
                )
                for v in x
            ],
            dtype="object",
        )

    @pandas_udf("double")
    def _nextafter_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        # IEEE next representable double toward b (DuckDB nextafter)
        return pd.Series(
            [
                None if (x is None or y is None) else math.nextafter(x, y)
                for x, y in zip(a, b)
            ],
            dtype="object",
        ).astype("float64")

    @pandas_udf("string")
    def _nfc_normalize_udf(x: pd.Series) -> pd.Series:
        # DuckDB nfc_normalize(): Unicode NFC composition
        return pd.Series(
            [
                None if v is None else unicodedata.normalize("NFC", v)
                for v in x
            ],
            dtype="object",
        )

    @pandas_udf("string")
    def _age_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        # DATE inputs arrive as datetime.date objects; normalize so the
        # field algorithm sees uniform timestamp-like values
        def _norm(v):
            if v is None or v is pd.NaT:
                return None
            return pd.Timestamp(v)

        return pd.Series(
            [
                None
                if (x := _norm(x0)) is None or (y := _norm(y0)) is None
                else age_interval(x, y)
                for x0, y0 in zip(a, b)
            ],
            dtype="object",
        )

    # engine settings surfaced through DuckDB's current_setting();
    # values reflect THIS engine's live session, captured at registration
    _settings = {
        "timezone": spark.conf.get("spark.sql.session.timeZone", "UTC"),
        "calendar": "gregorian",
        "threads": str(spark.sparkContext.defaultParallelism),
    }

    @pandas_udf("string")
    def _current_setting_udf(name: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if v is None else _settings.get(str(v).lower())
                for v in name
            ],
            dtype="object",
        )

    spark.udf.register("age", _age_udf)
    spark.udf.register("current_setting", _current_setting_udf)
    spark.udf.register("strip_accents", _strip_accents_udf)
    spark.udf.register("nfc_normalize", _nfc_normalize_udf)
    spark.udf.register("nextafter", _nextafter_udf)
    spark.udf.register("jaro_similarity", _jaro_udf)
    spark.udf.register("jaro_winkler_similarity", _jw_udf)
    spark.udf.register("damerau_levenshtein", _dl_udf)
    spark.udf.register("levenshtein_bytes", _lev_udf)
    spark.udf.register("gcd", _gcd_udf)
    spark.udf.register("lcm", _lcm_udf)
    spark.udf.register("gamma", _gamma_udf)
    spark.udf.register("lgamma", _lgamma_udf)
