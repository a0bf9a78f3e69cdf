"""Round-11 dialect surfaces: DuckDB's negative-scale DECIMAL round
replicated exactly for literal operands/chains (the r9/r10 'internally
inconsistent' corner decoded as a deterministic width clamp)."""

import duckdb
import pytest

from component_duckdb_transformation_spark.functions.dialect import (
    _parse_literal_decimal_chain,
    translate,
)


def test_literal_decimal_chain_typing():
    """Chain typing mirrors DuckDB's DECIMAL arithmetic rules."""
    cases = {
        "0.5": (2, 1),
        "000.5": (4, 1),
        "7.0005": (5, 4),
        "1.5 + 2.25": (4, 2),
        "1.5 * 2.25": (5, 3),
        "15.0 + 100": (12, 1),
        "2.5 * 4": (12, 1),
        "1.5 * 1.5 * 1.5": (6, 3),
        "(1.5 + 2.25) * 2.0": (6, 3),
    }
    for text, (w, s) in cases.items():
        got = _parse_literal_decimal_chain(text)
        assert got is not None and (got[1], got[2]) == (w, s), (
            text, got, w, s,
        )
    # non-literal leaves, exponents, and width overflow all bail
    assert _parse_literal_decimal_chain("x + 1.5") is None
    assert _parse_literal_decimal_chain("1.5e2") is None
    assert _parse_literal_decimal_chain("1.5 / 2") is None
    assert (
        _parse_literal_decimal_chain("1.0" + " * 99999999999999999999" * 2)
        is None
    )


def test_negative_scale_decimal_round_semantics(spark):
    """round(<fractional literal/chain>, k<0): width clamp to 0 when
    |k| >= w - s, half-away otherwise, DECIMAL(w,0) rendering (no
    '.0'), exactly like DuckDB."""
    con = duckdb.connect()
    cases = [
        "round(7.0005, -1)",      # clamp: DECIMAL(5,4), 1 >= 1
        "round(15.0, -1)",        # no clamp: 20
        "round(-15.0, -1)",       # half-away: -20
        "round(5.0, -1)",         # clamp: DECIMAL(2,1)
        "round(95.00, -1)",       # 100
        "round(94.99, -1)",       # 90
        "round(1.5 + 2.25, -1)",  # 3.75 -> 0 (rounding, not clamp)
        "round(15.0 + 100, -1)",  # int leaf joins as DECIMAL(10,0)
        "round(123.45 - 23.45, -2)",
        "round(55.0 + 0.5, -1)",
        "round(1.5 * 2.25, -3)",
        "round(9999.99, -3)",
    ]
    for c in cases:
        q = f"SELECT concat('v=', {c}) AS r"
        want = con.execute(q).fetchone()[0]
        got = spark.sql(translate(q)).collect()[0][0]
        assert got == want, (c, got, want)


def test_negative_scale_round_fuzz_sample(spark):
    """Seeded micro-campaign over the fuzzer's chain grammar at
    k in [-4, -1] (VERDICT r10 item 6 — the draws now live in
    tools/fuzz_diff.py's r9_scalar_item)."""
    import random

    con = duckdb.connect()
    g = random.Random(20260816)

    def lit(dec):
        return (
            f"{g.uniform(0.05, 200):.{g.randint(1, 4)}f}"
            if dec
            else str(g.randint(1, 300))
        )

    for _ in range(60):
        k = g.randint(-4, -1)
        if g.random() < 0.4:
            expr = lit(True)
        else:
            expr = f"({lit(True)} {g.choice(['+', '-', '*'])} {lit(g.random() < 0.5)})"
        q = f"SELECT concat('v=', round({expr}, {k})) AS r"
        want = con.execute(q).fetchone()[0]
        got = spark.sql(translate(q)).collect()[0][0]
        assert got == want, (q, got, want)


def test_percentile_cont_fusion_rewrite():
    """percentile_cont/percentile_disc WITHIN GROUP over an ascending
    order expr fold onto ONE shared sort_array(collect_list(expr))
    (r13-opt: replaces both the native value-count maps AND the old
    percentile(expr, array(...)) fusion — one collected array, one JVM
    sort, exact Percentile.getPercentile arithmetic per site); DESC,
    OVER, and FILTER spellings keep the native form."""
    t = translate(
        "SELECT g, percentile_cont(0.25) WITHIN GROUP (ORDER BY x) AS a,"
        " percentile_cont(0.75) WITHIN GROUP (ORDER BY x) AS b"
        " FROM t GROUP BY g"
    )
    assert "percentile_cont" not in t
    # both sites share the IDENTICAL collected-array text (Catalyst
    # dedup + subexpression elimination need textual equality)
    assert t.count("sort_array(collect_list(x))") == 2
    assert "0.25" in t and "0.75" in t
    # single percentage folds too (the map path is slower even alone)
    t1 = translate(
        "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY x) FROM t"
    )
    assert "percentile_cont" not in t1
    assert "sort_array(collect_list(x))" in t1
    # percentile_disc folds onto the same shared array as cont sites
    t1d = translate(
        "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY x) AS a,"
        " percentile_disc(0.9) WITHIN GROUP (ORDER BY x) AS b FROM t"
    )
    assert "percentile_disc" not in t1d
    assert t1d.count("sort_array(collect_list(x))") == 2
    # DESC ordering keeps native
    t2 = translate(
        "SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY x DESC) AS a,"
        " percentile_cont(0.75) WITHIN GROUP (ORDER BY x DESC) AS b FROM t"
    )
    assert t2.count("percentile_cont") == 2
    # window spelling keeps native (handled by the window machinery)
    t3 = translate(
        "SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY x) OVER () AS a,"
        " percentile_cont(0.75) WITHIN GROUP (ORDER BY x) OVER () AS b FROM t"
    )
    assert "collect_list" not in t3
    # FILTER rider keeps native
    t4 = translate(
        "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY x)"
        " FILTER (WHERE y > 0) FROM t"
    )
    assert "collect_list" not in t4 and "percentile_cont" in t4


def test_percentile_cont_fusion_semantics(spark):
    """Fused quantiles are value-identical to DuckDB's percentile_cont
    (PercentileCont is RuntimeReplaceable to Percentile in Spark, so
    the interpolation is the same formula)."""
    import duckdb

    con = duckdb.connect()
    q = (
        "SELECT g,"
        " percentile_cont(0.25) WITHIN GROUP (ORDER BY v) AS p25,"
        " percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS p50,"
        " percentile_cont(0.9) WITHIN GROUP (ORDER BY v) AS p90"
        " FROM (SELECT g, CAST(v AS DOUBLE) AS v FROM (VALUES"
        " (1, 1.0), (1, 2.0), (1, 100.0), (1, 3.5),"
        " (2, 7.25), (2, NULL), (2, -4.0)) t(g, v)) GROUP BY g"
    )
    want = sorted(map(tuple, con.execute(q).fetchall()))
    got = sorted(map(tuple, spark.sql(translate(q)).collect()))
    assert got == want, (got, want)


def test_negative_scale_round_hinted_decimal_column(spark):
    """A DECIMAL(p,s)-hinted COLUMN at a literal negative scale takes
    DuckDB's statically-decidable width clamp: |k| >= p-s sites emit
    the constant 0 (ABSOLUTE — DuckDB returns 0 there even for NULL
    input, probed), non-clamped sites keep native Spark round (decimal
    HALF_UP = DuckDB half-away, DECIMAL(_,0) rendering)."""
    import duckdb

    from component_duckdb_transformation_spark.functions.dialect import (
        column_type_hints,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT CAST(v AS DECIMAL(5,4)) AS nv,"
        " CAST(w AS DECIMAL(4,2)) AS wv FROM (VALUES"
        " (7.0005, 95.00), (4.9999, 94.99), (NULL, NULL)) s(v, w)"
    )
    spark.sql(
        "SELECT CAST(v AS DECIMAL(5,4)) AS nv, CAST(w AS DECIMAL(4,2)) AS wv"
        " FROM (VALUES (7.0005, 95.00), (4.9999, 94.99),"
        " (NULL, NULL)) s(v, w)"
    ).createOrReplaceTempView("t")
    q = (
        "SELECT concat('a=', round(nv, -1), ' b=', round(wv, -1),"
        " ' c=', round(wv, -2)) AS r FROM t"
    )
    want = sorted(r[0] for r in con.execute(q).fetchall())
    with column_type_hints({"nv": "decimal(5,4)", "wv": "decimal(4,2)"}):
        got = sorted(r[0] for r in spark.sql(translate(q)).collect())
    assert got == want, (got, want)


def test_negative_scale_round_mixed_hinted_chains(spark):
    """+ - * chains MIXING hinted DECIMAL/INT columns with literals at
    k<0: the chain's DuckDB (w,s) is statically derivable from the
    hints, so the width clamp applies — clamped sites are the constant
    0 (even on NULL), non-clamped sites keep native Spark round."""
    import duckdb

    from component_duckdb_transformation_spark.functions.dialect import (
        column_type_hints,
    )

    con = duckdb.connect()
    setup = (
        "SELECT CAST(v AS DECIMAL(5,4)) AS nv, CAST(w AS DECIMAL(4,2)) AS"
        " wv, CAST(i AS INT) AS iv FROM (VALUES (7.0005, 95.00, 3),"
        " (4.9999, 94.99, 250), (NULL, NULL, NULL)) s(v, w, i)"
    )
    con.execute(f"CREATE TABLE t AS {setup}")
    spark.sql(setup).createOrReplaceTempView("t")
    hints = {"nv": "decimal(5,4)", "wv": "decimal(4,2)", "iv": "int"}
    cases = [
        "round(nv + 100.0, -1)",  # mixed literal+col, no clamp
        "round(nv * wv, -3)",     # (9,6): clamp
        "round(wv + iv, -1)",     # INT col leaf joins as DECIMAL(10,0)
        "round(wv - 90.0, -1)",
        "round(-nv, -1)",         # signed column leaf: clamp
        "round(nv + wv, -2)",
    ]
    for c in cases:
        q = f"SELECT concat('v=', {c}) AS r FROM t"
        want = sorted(r[0] for r in con.execute(q).fetchall())
        with column_type_hints(hints):
            got = sorted(r[0] for r in spark.sql(translate(q)).collect())
        assert got == want, (c, got, want)


def test_chain_typing_property_vs_duckdb():
    """Property check: wherever _parse_literal_decimal_chain claims a
    (width, scale), DuckDB's own typeof() agrees, and where it also
    carries an exact value, the negative-scale fold matches DuckDB's
    round rendering. Randomized chains over literals with +-*,
    parens, and unary minus (seeded; hypothesis shrinks failures)."""
    import re as _re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from component_duckdb_transformation_spark.functions.dialect import (
        _duck_decimal_round_neg,
    )

    con = duckdb.connect()

    lit = st.one_of(
        st.integers(0, 500).map(str),
        st.tuples(
            st.integers(0, 300), st.integers(0, 9999), st.integers(1, 4)
        ).map(lambda t: f"{t[0]}.{str(t[1]).zfill(4)[: t[2]]}"),
    )

    chain = st.recursive(
        lit,
        lambda inner: st.one_of(
            st.tuples(inner, st.sampled_from(["+", "-", "*"]), inner).map(
                lambda t: f"({t[0]} {t[1]} {t[2]})"
            ),
            inner.map(lambda s: f"(-{s})"),
        ),
        max_leaves=5,
    )

    # derandomize: the discovery campaigns ran randomized (14 x 300
    # examples, which caught the int-subtree and width-crossing rules
    # live); the committed gate replays a fixed corpus so CI is
    # reproducible
    @settings(max_examples=300, deadline=None, derandomize=True)
    @given(chain=chain, k=st.integers(-4, -1))
    def check(chain, k):
        got = _parse_literal_decimal_chain(chain)
        if got is None:
            return
        val, w, s = got[0], got[1], got[2]  # r12: 4th elem = is_integer
        t = con.execute(f"SELECT typeof({chain})").fetchone()[0]
        mm = _re.fullmatch(r"DECIMAL\((\d+),(\d+)\)", t)
        if mm is None:
            # INTEGER-typed chain (no fractional leaf): parser says s=0
            assert s == 0, (chain, got, t)
            return
        assert (w, s) == (int(mm.group(1)), int(mm.group(2))), (
            chain, got, t,
        )
        if s > 0 and val is not None:
            want = con.execute(
                f"SELECT CAST(round({chain}, {k}) AS VARCHAR)"
            ).fetchone()[0]
            assert _duck_decimal_round_neg(val, w, s, k) == want, (
                chain, k, want,
            )

    check()


def test_percentile_fold_oracle_battery(spark):
    """r13-opt focused gate: the sorted-array fold behind
    percentile_cont/percentile_disc WITHIN GROUP is value-identical to
    DuckDB on adversarial multisets — ties, single element, negatives,
    duplicates-only, boundary percentages hitting exact integer
    positions, and grouped inputs with an empty-ish group."""
    con = duckdb.connect()
    batteries = [
        [1.0, 2.0, 3.0, 4.0],
        [5.0],
        [2.0, 2.0, 2.0, 7.0],
        [-3.5, -1.25, 0.0, 0.0, 9.75],
        [0.1] * 5 + [0.3] * 3,
        [-1e9, 1e-9, 42.42, 42.42, 7.0, -7.0],
    ]
    qs = [0.0, 0.25, 1.0 / 3.0, 0.5, 0.75, 0.9, 1.0]
    for vals in batteries:
        lits = ", ".join(f"(CAST({v!r} AS DOUBLE))" for v in vals)
        for q in qs:
            sql = (
                f"SELECT round(percentile_cont({q!r}) WITHIN GROUP "
                f"(ORDER BY x), 10) AS c, "
                f"round(percentile_disc({q!r}) WITHIN GROUP "
                f"(ORDER BY x), 10) AS d "
                f"FROM (VALUES {lits}) AS t(x)"
            )
            want = con.execute(sql).fetchone()
            t = translate(sql)
            assert "percentile_cont" not in t and "collect_list" in t
            got = tuple(spark.sql(t).collect()[0])
            assert got == tuple(want), (vals, q, got, want)
    # grouped: group b is filtered empty upstream -> no row (both
    # engines drop empty groups); group a keeps exact quantiles
    gsql = (
        "SELECT g, percentile_cont(0.5) WITHIN GROUP (ORDER BY x) AS c "
        "FROM (VALUES ('a', CAST(1.0 AS DOUBLE)), ('a', CAST(2.0 AS "
        "DOUBLE)), ('b', CAST(9.0 AS DOUBLE))) AS t(g, x) "
        "WHERE x < 5 GROUP BY g ORDER BY g"
    )
    want = con.execute(gsql).fetchall()
    got = [tuple(r) for r in spark.sql(translate(gsql)).collect()]
    assert got == [tuple(w) for w in want], (got, want)
