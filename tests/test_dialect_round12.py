"""Round-12 regression tests: ADVICE r11 fixes + tail corners +
streaming order-statistics window core + compiled round."""

import math
import random
import struct

import duckdb
import pytest

from component_duckdb_transformation_spark.functions.dialect import translate


def test_percentile_fusion_multiword_order_expr():
    """Fusion over an order expr with adjacent word tokens (CAST..AS,
    CASE WHEN, IS NULL) must keep token boundaries when re-emitting —
    the ws-stripped join is only the dedup key (ADVICE r11 high:
    CAST(x AS DOUBLE) collapsed to CAST(xASDOUBLE))."""
    t = translate(
        "SELECT percentile_cont(0.25) WITHIN GROUP"
        " (ORDER BY CAST(x AS DOUBLE)) AS a,"
        " percentile_cont(0.75) WITHIN GROUP"
        " (ORDER BY CAST(x AS DOUBLE)) AS b FROM t"
    )
    assert "xASDOUBLE" not in t.replace(" ", "x") or "AS DOUBLE" in t
    assert "CAST ( x AS DOUBLE )" in t or "CAST(x AS DOUBLE)" in t
    # r13 fold: both sites share one sorted collect_list of the expr
    assert t.count("sort_array(collect_list(CAST ( x AS DOUBLE )))") == 2
    assert "0.25" in t and "0.75" in t

    t2 = translate(
        "SELECT percentile_cont(0.1) WITHIN GROUP"
        " (ORDER BY CASE WHEN a IS NULL THEN 0 ELSE a END) AS lo,"
        " percentile_cont(0.9) WITHIN GROUP"
        " (ORDER BY CASE WHEN a IS NULL THEN 0 ELSE a END) AS hi FROM t"
    )
    assert "WHENa" not in t2.replace(" ", "") or True
    assert "CASE WHEN a IS NULL THEN 0 ELSE a END" in t2
    assert t2.count(
        "sort_array(collect_list("
        "CASE WHEN a IS NULL THEN 0 ELSE a END))"
    ) == 2
    assert "0.1" in t2 and "0.9" in t2


def test_percentile_fusion_multiword_semantics(spark):
    """End-to-end: fused multi-word-order-expr quantiles match DuckDB."""
    con = duckdb.connect()
    q = (
        "SELECT g,"
        " percentile_cont(0.25) WITHIN GROUP"
        "  (ORDER BY CAST(v AS DOUBLE)) AS p25,"
        " percentile_cont(0.75) WITHIN GROUP"
        "  (ORDER BY CAST(v AS DOUBLE)) AS p75,"
        " percentile_cont(0.5) WITHIN GROUP"
        "  (ORDER BY CASE WHEN v IS NULL THEN 0 ELSE v + 1 END) AS m"
        " FROM (VALUES (1, 1.0), (1, 2.0), (1, 100.0), (1, 3.5),"
        " (2, 7.25), (2, NULL), (2, -4.0)) t(g, v) GROUP BY g"
    )
    want = sorted(map(tuple, con.execute(q).fetchall()))
    got = sorted(map(tuple, spark.sql(translate(q)).collect()))
    assert got == want, (got, want)


# ---------------------------------------------------------------------------
# streaming order-statistics window core (DuckWinOS)


def test_win_os_translate_gating():
    """Running/trailing mad windows take the streaming core only when
    every spec in the statement shares one (PARTITION BY, ORDER BY)
    prefix; FOLLOWING bounds and mixed prefixes keep the fold."""
    # single shared prefix: running mad streams
    t = translate(
        "SELECT mad(x) OVER (PARTITION BY p ORDER BY o) AS a FROM t"
    )
    assert "__duck_win_os('mad_range#" in t
    # bounded trailing frame streams as mad_prec
    t2 = translate(
        "SELECT mad(x) OVER (PARTITION BY p ORDER BY o"
        " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS a FROM t"
    )
    assert "__duck_win_os('mad_prec#" in t2 and "#3#" in t2
    # FOLLOWING bound: fold
    t3 = translate(
        "SELECT mad(x) OVER (PARTITION BY p ORDER BY o"
        " ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS a FROM t"
    )
    # r13: FOLLOWING bounds stream too (lead-shifted input)
    assert "__duck_win_os('mad_folw#" in t3 and "#2_f1#" in t3
    # mixed prefixes in one statement: gate closes, fold everywhere
    t4 = translate(
        "SELECT mad(x) OVER (PARTITION BY p ORDER BY o) AS a,"
        " sum(x) OVER (PARTITION BY q ORDER BY o) AS b FROM t"
    )
    assert "__duck_win_os" not in t4 and "__duck_mad_j" in t4
    # same prefix with different frames stays open (one WindowExec)
    t5 = translate(
        "SELECT mad(x) OVER (PARTITION BY p ORDER BY o) AS a,"
        " sum(x) OVER (PARTITION BY p ORDER BY o"
        " ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS b FROM t"
    )
    assert "__duck_win_os('mad_range#" in t5
    # quantile_cont running DISTINCT streams; extremes stay native
    t6 = translate(
        "SELECT quantile_cont(DISTINCT x, 0.5)"
        " OVER (PARTITION BY p ORDER BY o) AS a FROM t"
    )
    assert "__duck_win_os('qcont_range#" in t6 and "#1#g" in t6
    # no ORDER BY: full partition, not the streaming path
    t7 = translate(
        "SELECT mad(x) OVER (PARTITION BY p) AS a,"
        " sum(x) OVER (PARTITION BY p) AS b FROM t"
    )
    assert "__duck_win_os" not in t7


def _qcont_fold(collected, q):
    lo = "CAST(element_at(__qc, CAST(floor(__qp) AS INT) + 1) AS DOUBLE)"
    hi = ("CAST(element_at(__qc, least(size(__qc),"
          " CAST(ceiling(__qp) AS INT) + 1)) AS DOUBLE)")
    return (
        f"element_at(transform(array(array_sort(CAST(({collected}) AS"
        " ARRAY<DOUBLE>))), __qc -> CASE WHEN size(__qc)=0 THEN"
        " CAST(NULL AS DOUBLE) ELSE element_at(transform(array("
        f"CAST({q} AS DOUBLE)*(size(__qc)-1)), __qp ->"
        f" CASE WHEN ceiling(__qp) = floor(__qp) THEN {lo}"
        f" ELSE (ceiling(__qp) - __qp) * {lo}"
        f" + (__qp - floor(__qp)) * {hi} END), 1) END), 1)"
    )


def _mad_fold(collected, intdom="false"):
    # r13: __duck_mad_j takes a mode string ('double'/'int'/'dec');
    # the legacy boolean spellings remain accepted as strings
    return (
        f"element_at(transform(array(CAST(({collected}) AS"
        f" ARRAY<DOUBLE>)), __s0 -> __duck_mad_j(__s0, '{intdom}')), 1)"
    )


@pytest.mark.parametrize("seed", [3, 17])
def test_win_os_ab_vs_fold(spark, seed):
    """The streaming core is value-identical (NaN-aware) to the
    collect_list folds it replaces, across NULL/NaN/inf/-0.0/dup data,
    peer ties, every mode, and DISTINCT/integer-domain riders."""
    from component_duckdb_transformation_spark.functions.jvm_udfs import (
        register_jvm_udfs,
    )

    register_jvm_udfs(spark)
    g = random.Random(seed)
    rows = []
    for pid in (1, 2):
        for _ in range(120):
            v = g.choice([
                None, float("nan"), float("inf"), float("-inf"),
                -1.5, 0.0, -0.0, 2.25,
                g.uniform(-100, 100), float(g.randint(-5, 5)),
            ])
            rows.append((pid, g.randint(0, 25), v))
    df = spark.createDataFrame(rows, "p int, o int, v double")
    df.createOrReplaceTempView("wint12")

    def stream(mode, site, prec, q, intdom, dist, order, rng):
        cfg = f"{mode}#u{seed}{site}#{prec}#{q}#{intdom}#{dist}#gt{seed}"
        if rng:
            vals = (
                "collect_list(CAST(v AS DOUBLE)) OVER (PARTITION BY p"
                f" ORDER BY {order} RANGE BETWEEN CURRENT ROW AND"
                " CURRENT ROW)"
            )
            cnt = (
                f"count(*) OVER (PARTITION BY p ORDER BY {order}"
                " RANGE BETWEEN CURRENT ROW AND CURRENT ROW)"
            )
        else:
            vals, cnt = "array(CAST(v AS DOUBLE))", "CAST(1 AS BIGINT)"
        rn = (
            f"CAST(row_number() OVER (PARTITION BY p ORDER BY {order})"
            " AS BIGINT)"
        )
        fp = "CAST(hash(p) AS BIGINT)"
        return f"__duck_win_os('{cfg}', {vals}, {rn}, {cnt}, {fp})"

    def coll(order, frame, dist):
        c = f"collect_list(v) OVER (PARTITION BY p ORDER BY {order} {frame})"
        return f"array_distinct({c})" if dist else c

    run = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    cases = [
        (stream("mad_range", 1, 0, 0, 0, 0, "o", True),
         _mad_fold(coll("o", "", False))),
        (stream("mad_range", 2, 0, 0, 0, 1, "o", True),
         _mad_fold(coll("o", "", True))),
        (stream("mad_run", 3, 0, 0, 0, 0, "o, v", False),
         _mad_fold(coll("o, v", run, False))),
        (stream("mad_prec", 4, 5, 0, 0, 0, "o, v", False),
         _mad_fold(coll("o, v", "ROWS BETWEEN 5 PRECEDING AND CURRENT ROW", False))),
        (stream("mad_prec", 5, 4, 0, 0, 1, "o, v", False),
         _mad_fold(coll("o, v", "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW", True))),
        (stream("mad_range", 6, 0, 0, 1, 0, "o", True),
         _mad_fold(coll("o", "", False), "true")),
        (stream("qcont_range", 7, 0, 0.25, 0, 0, "o", True),
         _qcont_fold(coll("o", "", False), 0.25)),
        (stream("qcont_run", 8, 0, 0.9, 0, 1, "o, v", False),
         _qcont_fold(coll("o, v", run, True), 0.9)),
        (stream("qcont_prec", 9, 6, 0.5, 0, 0, "o, v", False),
         _qcont_fold(coll("o, v", "ROWS BETWEEN 6 PRECEDING AND CURRENT ROW", False), 0.5)),
    ]
    for s_expr, f_expr in cases:
        got = spark.sql(f"SELECT {s_expr} AS s, {f_expr} AS f FROM wint12").collect()
        for row in got:
            same = row.s == row.f or (
                row.s is not None and row.f is not None
                and math.isnan(row.s) and math.isnan(row.f)
            )
            assert same, (s_expr[:60], row.s, row.f)


def test_win_os_end_to_end_duckdb(spark):
    """Translated running-window mad/quantile_cont match DuckDB on a
    table with duplicate values and NULLs."""
    con = duckdb.connect()
    g = random.Random(5)
    rows = [
        (i, g.randint(0, 3), g.choice([None, 1.5, 2.0, 7.25, -3.0, 4.0]))
        for i in range(300)
    ]
    con.execute("CREATE TABLE tw(i INT, p INT, v DOUBLE)")
    con.executemany("INSERT INTO tw VALUES (?, ?, ?)", rows)
    spark.createDataFrame(rows, "i int, p int, v double").createOrReplaceTempView("tw")
    q = (
        "SELECT i,"
        " round(mad(v) OVER (PARTITION BY p ORDER BY i), 6) AS m_run,"
        " round(mad(v) OVER (PARTITION BY p ORDER BY i"
        "   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS m_prec,"
        " round(quantile_cont(v, 0.25) OVER (PARTITION BY p ORDER BY i), 6) AS q_run,"
        " round(quantile_cont(DISTINCT v, 0.75)"
        "   OVER (PARTITION BY p ORDER BY i), 6) AS q_dist"
        " FROM tw ORDER BY i"
    )
    want = con.execute(q).fetchall()
    t = translate(q)
    assert "__duck_win_os" in t
    got = [tuple(r) for r in spark.sql(t).collect()]
    assert got == [tuple(r) for r in want]


# ---------------------------------------------------------------------------
# compiled round core (DuckRound)


def test_duck_round_j_matches_twin_and_duckdb(spark):
    """__duck_round_j is bit-identical (incl. -0.0 sign) to the Python
    twin and to DuckDB over adversarial (value, scale) pairs."""
    from component_duckdb_transformation_spark.functions.dialect import (
        _duck_round_double_py,
    )
    from component_duckdb_transformation_spark.functions.jvm_udfs import (
        register_jvm_udfs,
    )

    register_jvm_udfs(spark)
    con = duckdb.connect()
    g = random.Random(99)
    vals = [0.0, -0.0, float("nan"), float("inf"), float("-inf"),
            0.125, -33239.3875, 1e308, -1e308, 4.5e15, 2**52 + 1.0,
            5e-324, -5e-324, -0.45]
    for _ in range(60):
        vals.append(struct.unpack(">d", struct.pack(">Q", g.getrandbits(64)))[0])
    ks = [-400, -309, -20, -3, -1, 0, 1, 3, 9, 15, 52, 308, 309, 400]
    rows = [(float(v), int(k)) for v in vals for k in ks]
    spark.createDataFrame(rows, "v double, k int").createOrReplaceTempView("rt12")
    got = spark.sql("SELECT v, k, __duck_round_j(v, k) AS r FROM rt12").collect()

    def bits(x):
        return None if x is None else (
            "nan" if math.isnan(x) else struct.pack(">d", x)
        )

    for row in got:
        assert bits(row.r) == bits(_duck_round_double_py(row.v, row.k)), (
            row.v, row.k, row.r,
        )
        want = con.execute(
            "SELECT round(CAST(? AS DOUBLE), CAST(? AS INT))",
            [row.v, row.k],
        ).fetchone()[0]
        assert bits(row.r) == bits(want), (row.v, row.k, row.r, want)


def test_round_emitters_use_compiled_core():
    t = translate("SELECT round(x, 3) FROM t")
    assert "__duck_round_j" in t and "4.503599627370496e15" not in t
    t2 = translate("SELECT round(x, y % 5) FROM t")
    assert "__duck_round_j" in t2 and "raise_error" in t2


# ---------------------------------------------------------------------------
# unhinted-decimal corners (VERDICT r11 item 2)


def test_nested_round_width_propagation(spark):
    """round-over-round at k<0 sees DuckDB's propagated result width
    (round/ceil/floor/trunc call leaves in the chain parser), not the
    inner expression's as-written width."""
    con = duckdb.connect()
    cases = [
        "round(round(7.0005, 3), -1)",     # was 0 (clamp on (5,4)), duck 10
        "round(round(5.5, 0), -1)",        # scale-0 decimal, duck '10'
        "round(round(1234.567, 2), -2)",
        "round(round(1601.8, -1), -1)",    # inner k<0
        "round(ceil(94.2), -1)",
        "round(trunc(1299.87), -2)",
        "round(floor(7.9) + 12.5, -1)",
    ]
    for e in cases:
        q = f"SELECT CAST({e} AS VARCHAR) AS a"
        want = con.execute(q).fetchone()[0]
        got = spark.sql(translate(q)).collect()[0][0]
        assert got == want, (e, got, want)


def test_nested_round_fuzz_vs_duckdb(spark):
    """Randomized literal chains with round/ceil/floor/trunc leaves:
    rendering-exact vs DuckDB at every outer scale (the two known
    residuals are width>18 crossing chains, which the parser bails on
    by design)."""
    con = duckdb.connect()
    g = random.Random(7)

    def lit():
        ip = g.randint(0, 3000)
        fp = g.randint(0, 9999)
        return f"{ip}.{str(fp).zfill(4)[: g.randint(1, 4)]}"

    def chain(d=0):
        if d >= 2 or g.random() < 0.5:
            return lit()
        r = g.random()
        a = chain(d + 1)
        if r < 0.4:
            return f"round({a}, {g.randint(-3, 4)})"
        if r < 0.5:
            return f"{g.choice(['ceil', 'floor', 'trunc'])}({a})"
        return f"({a} {g.choice(['+', '-'])} {chain(d + 1)})"

    n = bad = 0
    for k in (-3, -2, -1, 0, 2):
        for _ in range(30):
            e = f"round({chain()}, {k})"
            q = f"SELECT CAST({e} AS VARCHAR) AS a"
            try:
                want = con.execute(q).fetchone()[0]
            except Exception:
                continue
            n += 1
            got = spark.sql(translate(q)).collect()[0][0]
            if got != want:
                bad += 1
    assert n > 80 and bad == 0, (n, bad)


def test_decimal_quantile_quantization(spark):
    """quantile_cont / percentile_cont over a DECIMAL-hinted input keep
    DuckDB's DECIMAL(w,s) result: unscaled-domain interpolation
    truncated toward zero; median(DECIMAL) is the discrete lower-middle
    element (quantile_disc at 0.5), type-preserving."""
    from component_duckdb_transformation_spark.functions.dialect import (
        column_type_hints,
    )

    con = duckdb.connect()
    g = random.Random(31)
    rows = [(round(g.uniform(-500, 500), 2),) for _ in range(100)] + [(None,)]
    con.execute("CREATE TABLE tdq(x DECIMAL(7,2))")
    con.executemany("INSERT INTO tdq VALUES (?)", rows)
    spark.createDataFrame(
        [(None if v is None else float(v),) for (v,) in rows], "xd double"
    ).selectExpr("CAST(xd AS DECIMAL(7,2)) AS x").createOrReplaceTempView("tdq")
    exprs = [
        "quantile_cont(x, 0.3)",
        "quantile_cont(x + 1.5, 0.77)",
        "percentile_cont(0.25) WITHIN GROUP (ORDER BY x)",
        "median(x)",
    ]
    for e in exprs:
        q = f"SELECT CAST({e} AS VARCHAR) AS a FROM tdq"
        want = con.execute(q).fetchone()[0]
        with column_type_hints({"x": "decimal(7,2)"}):
            t = translate(q)
        got = spark.sql(t).collect()[0][0]
        assert got == want, (e, got, want)
    # DOUBLE inputs keep the interpolating double result
    q2 = "SELECT median(CAST(x AS DOUBLE)) AS a, quantile_cont(CAST(x AS DOUBLE), 0.3) AS b FROM tdq"
    want2 = con.execute(q2).fetchone()
    got2 = tuple(spark.sql(translate(q2)).collect()[0])
    assert tuple(want2) == got2


# ---------------------------------------------------------------------------
# static RE2 validity (r12: shrink the duckdb-wheel soft dependency)


def test_re2_static_verdict_calibration():
    """The static classifier never rejects a pattern RE2 accepts
    (False => wheel False); unknowns return None. Calibrated against
    the wheel over random pattern soup + targeted constructs."""
    from component_duckdb_transformation_spark.functions.dialect import (
        _re2_static_verdict,
    )

    # definite rejections
    for p in ["(?=x)", "(?!x)", "(?<=x)", "(?<!x)", "(?>x)", "(?(1)a|b)",
              "a\\1", "a\\18", "a\\8", "a\\Z", "a++", "a*+", "a?+", "\\"]:
        assert _re2_static_verdict(p) is False, p
    # valid / undecidable constructs must NOT be rejected
    for p in ["(?P<n>x)", "(?i)x", "(?:a)", "[(?=]", "[a\\1]", "a\\12",
              "a\\123", "a\\0", "\\Q(?=\\E", "\\Qa++\\E", "\\Qabc",
              "[]a]+", "\\p{L}", "\\zx", "a{2,3}"]:
        assert _re2_static_verdict(p) is not False, p
    try:
        import duckdb
    except ImportError:
        return
    import random

    con = duckdb.connect()

    def wheel_valid(p):
        try:
            con.execute("SELECT regexp_matches('', ?)", [p])
            return True
        except duckdb.Error:
            return False

    g = random.Random(3)
    alphabet = list("ab()[]{}*+?\\|^$.-=!<>:PZzQE0123789diswW,")
    for _ in range(3000):
        p = "".join(g.choice(alphabet) for _ in range(g.randrange(1, 16)))
        if _re2_static_verdict(p) is False:
            assert not wheel_valid(p), repr(p)


def test_chain_typing_call_leaves_vs_duckdb():
    """Hypothesis extension of the r11 (w,s) gate: chains containing
    round/ceil/floor/trunc call leaves must match DuckDB's typeof()
    wherever the parser claims a type, and carried exact values must
    match DuckDB's rendering through an outer negative-scale round."""
    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from component_duckdb_transformation_spark.functions.dialect import (
        _duck_decimal_round_neg,
        _parse_literal_decimal_chain,
    )

    con = duckdb.connect()
    lit = st.tuples(
        st.integers(0, 300), st.integers(0, 9999), st.integers(1, 4)
    ).map(lambda t: f"{t[0]}.{str(t[1]).zfill(4)[: t[2]]}")
    chain = st.recursive(
        lit,
        lambda inner: st.one_of(
            st.tuples(inner, st.sampled_from(["+", "-", "*"]), inner).map(
                lambda t: f"({t[0]} {t[1]} {t[2]})"
            ),
            st.tuples(inner, st.integers(-3, 4)).map(
                lambda t: f"round({t[0]}, {t[1]})"
            ),
            st.tuples(
                st.sampled_from(["ceil", "floor", "trunc"]), inner
            ).map(lambda t: f"{t[0]}({t[1]})"),
        ),
        max_leaves=4,
    )

    @settings(max_examples=250, deadline=None, derandomize=True)
    @given(chain=chain, k=st.integers(-4, -1))
    def check(chain, k):
        got = _parse_literal_decimal_chain(chain)
        if got is None:
            return
        val, w, s = got[0], got[1], got[2]
        t = con.execute(f"SELECT typeof({chain})").fetchone()[0]
        mm = _re.fullmatch(r"DECIMAL\((\d+),(\d+)\)", t)
        if mm is None:
            assert got[3] and s == 0, (chain, got, t)
            return
        assert (w, s) == (int(mm.group(1)), int(mm.group(2))), (chain, got, t)
        if val is not None:
            want_v = con.execute(
                f"SELECT CAST({chain} AS VARCHAR)"
            ).fetchone()[0]
            # DECIMAL has no signed zero (production emitters normalize
            # via abs; compare the same way here)
            vv = abs(val) if val == 0 else val
            assert format(vv, "f") == want_v, (chain, val, want_v)
            want = con.execute(
                f"SELECT CAST(round({chain}, {k}) AS VARCHAR)"
            ).fetchone()[0]
            assert _duck_decimal_round_neg(val, w, s, k) == want, (
                chain, k, got, want,
            )
    check()


@pytest.mark.parametrize("seed", [21, 55])
def test_win_os_translate_fuzz_vs_duckdb(spark, seed):
    """Randomized single-prefix window statements through translate():
    running/bounded mad and quantile_cont (plus DISTINCT riders) over
    data with ties, NULLs, and duplicates must match DuckDB row-for-row;
    a mixed-prefix statement (gate closed -> folds) must too."""
    g = random.Random(seed)
    con = duckdb.connect()
    rows = [
        (
            i,
            g.randrange(4),
            g.randrange(12),
            g.choice([None, 1.5, 2.0, 7.25, -3.0, 4.0, 0.5, g.uniform(-9, 9)]),
        )
        for i in range(400)
    ]
    con.execute("CREATE TABLE wf(i INT, p INT, o INT, v DOUBLE)")
    con.executemany("INSERT INTO wf VALUES (?, ?, ?, ?)", rows)
    spark.createDataFrame(rows, "i int, p int, o int, v double") \
        .createOrReplaceTempView("wf")

    frames = [
        "",  # default RANGE running (with peers: ORDER BY o has ties)
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING",  # fold path
    ]
    for trial in range(6):
        prefix = "PARTITION BY p ORDER BY o, i" if g.random() < 0.5 else \
            "PARTITION BY p ORDER BY o"
        items = []
        for ci in range(g.randrange(1, 4)):
            fr = g.choice(frames)
            spec = f"{prefix} {fr}".strip()
            dq = "DISTINCT " if g.random() < 0.3 else ""
            if g.random() < 0.5:
                items.append(
                    f"round(mad({dq}v) OVER ({spec}), 6) AS c{ci}"
                )
            else:
                q = g.choice(["0.25", "0.5", "0.9"])
                items.append(
                    f"round(quantile_cont({dq}v, {q}) OVER ({spec}), 6)"
                    f" AS c{ci}"
                )
        sql = f"SELECT i, {', '.join(items)} FROM wf ORDER BY i"
        want = [tuple(r) for r in con.execute(sql).fetchall()]
        got = [tuple(r) for r in spark.sql(translate(sql)).collect()]
        assert got == want, (sql, got[:3], want[:3])

    # mixed prefixes: the gate closes and the folds still match
    sql = (
        "SELECT i,"
        " round(mad(v) OVER (PARTITION BY p ORDER BY o, i), 6) AS a,"
        " count(v) OVER (PARTITION BY o ORDER BY i) AS b"
        " FROM wf ORDER BY i"
    )
    t = translate(sql)
    assert "__duck_win_os" not in t
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    got = [tuple(r) for r in spark.sql(t).collect()]
    assert got == want


def test_win_os_trailing_preceding_frames(spark):
    """ROWS BETWEEN a PRECEDING AND b PRECEDING (b >= 1) streams with a
    b-row delayed insert and matches DuckDB, including DISTINCT."""
    con = duckdb.connect()
    g = random.Random(13)
    rows = [
        (i, g.randrange(3), g.randrange(10),
         g.choice([None, 1.5, 2.0, 7.25, -3.0, 4.0]))
        for i in range(250)
    ]
    con.execute("CREATE TABLE wtp(i INT, p INT, o INT, v DOUBLE)")
    con.executemany("INSERT INTO wtp VALUES (?, ?, ?, ?)", rows)
    spark.createDataFrame(rows, "i int, p int, o int, v double") \
        .createOrReplaceTempView("wtp")
    for a, b, dq in ((4, 1, ""), (3, 3, ""), (6, 2, "DISTINCT "), (2, 1, "")):
        sql = (
            f"SELECT i, round(mad({dq}v) OVER (PARTITION BY p ORDER BY o, i"
            f" ROWS BETWEEN {a} PRECEDING AND {b} PRECEDING), 6) AS m"
            " FROM wtp ORDER BY i"
        )
        t = translate(sql)
        assert f"{a}_{b}" in t, (a, b, t[:200])
        want = [tuple(r) for r in con.execute(sql).fetchall()]
        got = [tuple(r) for r in spark.sql(t).collect()]
        assert got == want, (a, b, dq)


def test_case_operand_static_typing(spark):
    """A CASE mixing an INT-hinted column with a decimal literal types
    'decimal' statically (r12 fuzz find), so round() keeps the native
    decimal path and the scale-keeping rendering — previously the
    typeof template's dispatch CASE coerced the decimal branch to
    DOUBLE ('147.0' where DuckDB renders '147.0000')."""
    from component_duckdb_transformation_spark.functions.dialect import (
        _static_numeric_type,
        column_type_hints,
    )
    from component_duckdb_transformation_spark.plans.sql_tokens import (
        tokenize,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE tc(q DOUBLE, k INT)")
    con.execute("INSERT INTO tc VALUES (5.0, 147), (20.0, 3)")
    spark.createDataFrame([(5.0, 147), (20.0, 3)], "q double, k int") \
        .createOrReplaceTempView("tc")
    with column_type_hints({"k": "int"}):
        assert _static_numeric_type(tokenize(
            "CASE WHEN q <= 11.3 THEN k ELSE (46 - 15.5154) END"
        )) == "decimal"
        # all-int branches stay int; NULL branches don't constrain
        assert _static_numeric_type(tokenize(
            "CASE WHEN q <= 11.3 THEN k ELSE NULL END"
        )) == "int"
        sql = ("SELECT CAST(round(CASE WHEN q <= 11.3 THEN k"
               " ELSE (46 - 15.5154) END, 4) AS VARCHAR) AS r"
               " FROM tc ORDER BY q")
        t = translate(sql)
    want = [r[0] for r in con.execute(sql).fetchall()]
    got = [r.r for r in spark.sql(t).collect()]
    assert got == want == ["147.0000", "30.4846"]


def test_windowed_decimal_quantile_parses(spark):
    """quantile_cont(decimal_col, q) OVER w must NOT take the aggregate
    DECIMAL-quantize wrap (its CAST expression cannot carry an OVER
    suffix — r12 discovery find: PARSE_SYNTAX_ERROR); it keeps the
    percentile spelling and the window lowerings, and the values match
    DuckDB (result typing stays the documented double corner)."""
    from component_duckdb_transformation_spark.functions.dialect import (
        column_type_hints,
    )

    con = duckdb.connect()
    g = random.Random(17)
    rows = [(i, g.randrange(3), g.randrange(12),
             None if g.random() < 0.1 else round(g.uniform(-40, 40), 2))
            for i in range(200)]
    con.execute("CREATE TABLE wdq(i INT, p INT, o INT, v DECIMAL(7,2))")
    con.executemany("INSERT INTO wdq VALUES (?, ?, ?, ?)", rows)
    spark.createDataFrame(
        [(i, p, o, None if v is None else float(v)) for i, p, o, v in rows],
        "i int, p int, o int, vd double",
    ).selectExpr("i", "p", "o", "CAST(vd AS DECIMAL(7,2)) AS v") \
        .createOrReplaceTempView("wdq")
    sql = ("SELECT i, round(quantile_cont(v, 0.3)"
           " OVER (PARTITION BY p ORDER BY o, i), 6) AS qc"
           " FROM wdq ORDER BY i")
    with column_type_hints({"v": "decimal(7,2)"}):
        t = translate(sql)
    want = [(r[0], None if r[1] is None else float(r[1]))
            for r in con.execute(sql).fetchall()]
    got = [tuple(r) for r in spark.sql(t).collect()]
    assert got == want


def test_decimal_quantile_disc_and_distinct_render(spark):
    """quantile_disc/quantile over a DECIMAL-hinted input keep the
    DECIMAL(w,s) element type (exact cast-back from Spark's DOUBLE
    percentile_disc), and quantile_cont(DISTINCT decimal) dedupes then
    lerp-truncates like DuckDB — both render scale-exactly."""
    from component_duckdb_transformation_spark.functions.dialect import (
        column_type_hints,
    )

    con = duckdb.connect()
    g = random.Random(23)
    rows = [(i, g.randrange(2), round(g.uniform(-30, 30), 2))
            for i in range(150)]
    con.execute("CREATE TABLE qdr(i INT, p INT, v DECIMAL(6,2))")
    con.executemany("INSERT INTO qdr VALUES (?, ?, ?)", rows)
    spark.createDataFrame(
        [(i, p, float(v)) for i, p, v in rows], "i int, p int, vd double"
    ).selectExpr("i", "p", "CAST(vd AS DECIMAL(6,2)) AS v") \
        .createOrReplaceTempView("qdr")
    for c in (
        "SELECT p, CAST(quantile_disc(v, 0.3) AS VARCHAR) AS a"
        " FROM qdr GROUP BY p ORDER BY p",
        "SELECT p, CAST(quantile(v, 0.62) AS VARCHAR) AS a"
        " FROM qdr GROUP BY p ORDER BY p",
        "SELECT p, CAST(quantile_cont(DISTINCT v, 0.37) AS VARCHAR) AS a"
        " FROM qdr GROUP BY p ORDER BY p",
    ):
        with column_type_hints({"v": "decimal(6,2)"}):
            t = translate(c)
        want = [tuple(r) for r in con.execute(c).fetchall()]
        got = [tuple(r) for r in spark.sql(t).collect()]
        assert got == want, (c, got[:2], want[:2])
