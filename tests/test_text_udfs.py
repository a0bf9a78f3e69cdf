"""Differential tests for the named-function gap closers: the
string-similarity pandas UDFs (functions/text_udfs.py) and the
bar/timezone/histogram dialect shims — every case compared against
DuckDB's native implementation."""

from __future__ import annotations

import duckdb
import pytest

from component_duckdb_transformation_spark.functions.dialect import translate

PAIRS = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("", ""),
    ("", "abc"),
    ("abc", ""),
    ("equal", "equal"),
    ("ca", "abc"),
    ("a cat", "an abct"),
    ("abcd", "acbd"),
    ("kitten", "sitting"),
    ("résumé", "resume"),
    ("x", "y"),
]


@pytest.mark.parametrize(
    "fn", ["jaro_similarity", "jaro_winkler_similarity", "damerau_levenshtein"]
)
def test_similarity_functions_match_duckdb(spark, fn):
    con = duckdb.connect()
    for a, b in PAIRS:
        expected = con.execute(f"SELECT {fn}(?, ?)", [a, b]).fetchone()[0]
        got = spark.sql(
            "SELECT {fn}('{a}', '{b}') AS r".format(
                fn=fn, a=a.replace("'", "''"), b=b.replace("'", "''")
            )
        ).collect()[0][0]
        if isinstance(expected, float):
            assert got == pytest.approx(expected, abs=1e-12), (fn, a, b)
        else:
            assert got == expected, (fn, a, b)


def test_similarity_null_propagation(spark):
    row = spark.sql(
        "SELECT jaro_similarity(CAST(NULL AS STRING), 'x') AS a, "
        "damerau_levenshtein('x', CAST(NULL AS STRING)) AS b"
    ).collect()[0]
    assert row.a is None and row.b is None


def test_bar_matches_duckdb(spark):
    con = duckdb.connect()
    cases = [
        "bar(3, 0, 10, 8)",
        "bar(3.3, 0, 10)",
        "bar(0, 0, 10, 12)",
        "bar(10, 0, 10, 12)",
        "bar(15, 0, 10, 12)",  # clamp above
        "bar(-2, 0, 10, 12)",  # clamp below
        "bar(7, 2, 12, 5)",
        "bar(1, 0, 3, 40)",
    ]
    for c in cases:
        expected = con.execute(f"SELECT {c}").fetchone()[0]
        got = spark.sql(translate(f"SELECT {c} AS r")).collect()[0][0]
        assert got == expected, (c, got, expected)


def test_timezone_matches_duckdb(spark):
    con = duckdb.connect()
    con.execute("SET timezone = 'UTC'")
    for tz, ts in [
        ("America/New_York", "2024-06-01 12:00:00"),
        ("America/New_York", "2024-01-15 12:00:00"),  # not DST
        ("Asia/Tokyo", "2024-06-01 00:30:00"),
        ("UTC", "2024-06-01 00:30:00"),
    ]:
        expected = con.execute(
            f"SELECT timezone('{tz}', TIMESTAMP '{ts}')"
        ).fetchone()[0]
        got = spark.sql(
            translate(f"SELECT timezone('{tz}', TIMESTAMP '{ts}') AS r")
        ).collect()[0][0]
        assert got.replace(tzinfo=None) == expected.replace(tzinfo=None), (tz, ts)


def test_histogram_matches_duckdb(spark):
    con = duckdb.connect()
    sql = (
        "SELECT g, histogram(v) AS h FROM (VALUES "
        "('x', 'a'), ('x', 'b'), ('x', 'a'), ('x', NULL), "
        "('y', 'c'), ('y', 'c'), ('y', 'c')) t(g, v) GROUP BY g ORDER BY g"
    )
    expected = {
        r[0]: dict(zip(r[1]["key"], r[1]["value"]))
        for r in con.execute(sql).fetchall()
    }
    got = {r.g: dict(r.h) for r in spark.sql(translate(sql)).collect()}
    assert got == expected
    # integer keys too
    sql2 = (
        "SELECT histogram(v) AS h FROM (VALUES (1), (2), (1), (3)) t(v)"
    )
    exp2 = con.execute(sql2).fetchone()[0]
    got2 = spark.sql(translate(sql2)).collect()[0][0]
    assert dict(got2) == dict(zip(exp2["key"], exp2["value"]))


def test_age_interval_differential(spark):
    """age(a, b) matches DuckDB's INTERVAL->VARCHAR rendering exactly
    (Postgres field algorithm: day borrow uses the earlier operand's
    month length)."""
    import duckdb

    from component_duckdb_transformation_spark.functions.dialect import translate

    pairs = [
        ("2001-04-10 00:00:00", "1957-06-13 00:00:00"),
        ("1957-06-13 00:00:00", "2001-04-10 00:00:00"),
        ("2001-04-10 12:30:15.123456", "2001-03-09 13:45:30"),
        ("2001-03-09 13:45:30", "2001-04-10 12:30:15.123456"),
        ("2020-03-31 00:00:00", "2020-01-31 00:00:00"),
        ("2020-03-30 00:00:00", "2020-01-31 00:00:00"),
        ("2020-02-29 00:00:00", "2019-02-28 00:00:00"),
        ("2020-01-01 00:00:00.5", "2020-01-01 00:00:00"),
        ("2020-01-01 00:00:00", "2020-01-01 00:00:00.5"),
        ("2020-01-01 00:00:00", "2020-01-01 00:00:00"),
        ("2021-01-01 05:00:00", "2020-01-01 00:00:00"),
        ("2020-03-01 00:00:00", "2020-02-29 12:00:00"),
        ("2020-01-02 00:00:00", "2020-01-01 23:59:59.999999"),
    ]
    for a, b in pairs:
        q = f"SELECT (age(TIMESTAMP '{a}', TIMESTAMP '{b}'))::VARCHAR AS r"
        expected = duckdb.sql(q).fetchone()[0]
        got = spark.sql(translate(f"SELECT age(TIMESTAMP '{a}', TIMESTAMP '{b}') AS r")).collect()[0][0]
        assert got == expected, (a, b, got, expected)
    # DATE inputs and the 1-arg form execute (1-arg is current_date-
    # relative; only shape-checked to avoid midnight flake)
    q = "SELECT age(DATE '2001-04-10', DATE '1957-06-13') AS r"
    assert spark.sql(translate(q)).collect()[0][0] == "43 years 9 months 27 days"
    one = spark.sql(translate("SELECT age(TIMESTAMP '2020-01-01') AS r")).collect()[0][0]
    assert "year" in one


def test_current_setting(spark):
    from component_duckdb_transformation_spark.functions.dialect import translate

    got = spark.sql(translate("SELECT current_setting('TimeZone') AS tz")).collect()[0][0]
    assert got == "UTC"
    assert (
        spark.sql(translate("SELECT current_setting('calendar') AS c")).collect()[0][0]
        == "gregorian"
    )
    # unknown setting -> NULL (engine has no such state)
    assert (
        spark.sql(translate("SELECT current_setting('nope') AS x")).collect()[0][0]
        is None
    )


def test_printf_twin_randomized_vs_duckdb():
    """Randomized (seeded) parity of the printf float-directive twin
    against DuckDB itself, no Spark session — locks tie rounding,
    beyond-shortest digits, C-%g notation switches, sign/width/zero
    flags, and the nan/inf zero-right-pad quirk. The documented
    fixed-notation boundary (|x| past ~1e66, fmt's grisu64
    approximation digits) stays out of the draw."""
    import math
    import random

    import duckdb

    from component_duckdb_transformation_spark.functions.text_udfs import (
        _duck_printf_py,
    )

    g = random.Random(20260816)
    specials = [float("nan"), float("inf"), float("-inf"), 0.0, -0.0,
                5e-324, 1.005, 0.5, 2.5, 1.255, 1e20, 2.5e-7]
    cases = []
    for _ in range(400):
        flags = "".join(
            f for f in ["-", "+", " ", "0"] if g.random() < 0.2
        )
        if "-" in flags and "0" in flags:
            flags = flags.replace("0", "")
        width = str(g.randint(1, 14)) if g.random() < 0.5 else ""
        prec = f".{g.randint(0, 22)}" if g.random() < 0.7 else ""
        typ = g.choice(list("fFeEgG"))
        spec = f"%{flags}{width}{prec}{typ}"
        r = g.random()
        if r < 0.2:
            v = g.choice(specials)
        elif r < 0.6:
            v = g.uniform(-1e4, 1e4)
        else:
            v = math.copysign(
                math.exp(g.uniform(math.log(1e-30), math.log(1e30))),
                g.choice([-1.0, 1.0]),
            )
        if typ in "fF" and abs(v) >= 1e60 and math.isfinite(v):
            continue  # documented grisu64 boundary
        cases.append((spec, v, False))
    # fmt 'general' draws: typeless brace {:W.P} (zeros-capped
    # placement, P=0 tie-keep) — ties and cap-region values weighted
    gen_specials = [3.5, 45.0, 6500.0, 0.25, 1.5e15, 4.5e16, 0.125,
                    -0.0049, 0.00012345, 2.5, 0.0, -0.0,
                    float("nan"), float("inf")]
    for _ in range(200):
        P = g.choice([0, 0, 1, 2, 3, 7, 12])
        W = g.choice(["", "", "", "3", "8", "012"])
        v = (
            g.choice(gen_specials) if g.random() < 0.5
            else g.uniform(-1e5, 1e5)
        )
        cases.append(("{:" + W + "." + str(P) + "}", v, True))
    con = duckdb.connect()
    bad = []
    for spec, v, brace in cases:
        fn = "format" if brace else "printf"
        want = con.execute(
            f"SELECT {fn}(?, CAST(? AS DOUBLE))", [spec, repr(v)]
        ).fetchone()[0]
        got = _duck_printf_py(spec, v)
        if got != want:
            bad.append((spec, v, got, want))
    assert not bad, bad[:5]


def test_memo_map_keeps_signed_zero_distinct():
    """r14 (r13 ADVICE): -0.0 == 0.0 and they hash alike, so a naive
    memo would replay the first-seen rendering for both — the memo key
    must carry the sign of zero for float inputs."""
    import pandas as pd

    from component_duckdb_transformation_spark.functions.text_udfs import (
        _memo_map,
    )

    s = pd.Series([0.0, -0.0, 0.0, -0.0, None], dtype="object")
    out = _memo_map(repr, s)
    assert list(out) == ["0.0", "-0.0", "0.0", "-0.0", None]
    # float64 dtype path too
    f = pd.Series([0.0, -0.0, 1.5], dtype="float64")
    out2 = _memo_map(repr, f)
    assert list(out2) == ["0.0", "-0.0", "1.5"]
    # multi-column keys keep the sign as well
    k = pd.Series([2, 2, 2], dtype="object")
    out3 = _memo_map(lambda v, n: repr(v) * int(n), pd.Series(
        [0.0, -0.0, 0.0], dtype="object"), k)
    assert list(out3) == ["0.00.0", "-0.0-0.0", "0.00.0"]
