"""Round-13 regression tests: r12 ADVICE fixes (FILTER riders on the
DECIMAL quantile/median shims, list-valued quantile quantization) and
the streaming window-core extensions."""

import duckdb
import pytest

from component_duckdb_transformation_spark.functions.dialect import (
    column_type_hints,
    translate,
)

_HINTS = {"g": "int", "d": "decimal(9,2)"}


def _both(spark, q, hints=_HINTS):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT CAST(i AS INT) AS g,"
        " CAST(i * 1.37 AS DECIMAL(9,2)) AS d FROM range(1, 101) r(i)"
    )
    pdf = con.execute("SELECT * FROM t").df()
    spark.createDataFrame(pdf).createOrReplaceTempView("t")
    with column_type_hints(hints):
        tq = translate(q)
    got = spark.sql(tq).toPandas()
    want = con.execute(q).df()
    return got, want, tq


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(None if x is None else float(x) for x in v)
    try:
        f = float(v)
        return None if f != f else f
    except (TypeError, ValueError):
        return str(v)


def _assert_match(got, want):
    assert sorted(got.columns) == sorted(want.columns)
    g = [
        tuple(_norm_cell(r[c]) for c in sorted(got.columns))
        for r in got.to_dict("records")
    ]
    w = [
        tuple(_norm_cell(r[c]) for c in sorted(want.columns))
        for r in want.to_dict("records")
    ]
    assert sorted(g, key=str) == sorted(w, key=str), (g, w)


# ---------------------------------------------------------------------------
# r12 ADVICE medium: FILTER riders after the DECIMAL-typed shims used
# to emit `CAST(...) FILTER (...)` — a Spark parse error


@pytest.mark.parametrize(
    "q",
    [
        "SELECT median(d) FILTER (WHERE g % 3 = 0) AS m FROM t",
        "SELECT quantile_cont(d, 0.3) FILTER (WHERE g % 3 = 0) AS q FROM t",
        "SELECT quantile_disc(d, 0.3) FILTER (WHERE g % 3 = 0) AS q FROM t",
        "SELECT quantile(d, 0.7) FILTER (WHERE g > 50) AS q FROM t",
        "SELECT percentile_cont(0.4) WITHIN GROUP (ORDER BY d)"
        " FILTER (WHERE g % 3 = 0) AS p FROM t",
        "SELECT g % 2 AS k, median(d) FILTER (WHERE g % 3 = 0) AS m,"
        " quantile_disc(d, 0.6) FILTER (WHERE g % 2 = 1) AS q"
        " FROM t GROUP BY k ORDER BY k",
    ],
)
def test_decimal_shim_filter_rider(spark, q):
    got, want, _ = _both(spark, q)
    _assert_match(got, want)


def test_decimal_shim_filter_translation_shape():
    """The FILTER rider must land INSIDE the CAST wrap, attached to the
    aggregate — never trailing the CAST."""
    with column_type_hints(_HINTS):
        t = translate("SELECT median(d) FILTER (WHERE g = 1) FROM t")
    assert ") FILTER" in t
    assert "AS DECIMAL(9,2))" in t.replace(" ", "").replace(
        "AS DECIMAL", "AS DECIMAL"
    ) or "DECIMAL(9,2)" in t
    # the CAST closes AFTER the FILTER clause
    assert t.index("FILTER") < t.index("DECIMAL(9,2)")


# ---------------------------------------------------------------------------
# r12 ADVICE medium: list-valued quantile_cont over DECIMAL emitted
# CAST(array AS DOUBLE); now quantizes per element like DuckDB


@pytest.mark.parametrize(
    "q",
    [
        "SELECT quantile_cont(d, [0.25, 0.75]) AS q FROM t",
        "SELECT quantile_cont(d, [0.25, 0.75])"
        " FILTER (WHERE g % 3 = 0) AS q FROM t",
        "SELECT g % 2 AS k, quantile_cont(d, [0.1, 0.9]) AS q"
        " FROM t GROUP BY k ORDER BY k",
        # empty group: NULL list on both engines
        "SELECT quantile_cont(d, [0.25, 0.75]) AS q FROM t WHERE g > 1000",
    ],
)
def test_decimal_list_quantile_quantizes(spark, q):
    got, want, _ = _both(spark, q)
    _assert_match(got, want)


def test_decimal_list_quantile_keeps_decimal_type(spark):
    got, _, _ = _both(
        spark, "SELECT quantile_cont(d, [0.25, 0.75]) AS q FROM t"
    )
    # element type survives as DECIMAL(9,2), not DOUBLE
    assert "decimal(9,2)" in str(got.dtypes.iloc[0]) or str(
        type(got["q"].iloc[0][0])
    ).find("Decimal") >= 0


def test_windowed_filter_rider_passthrough():
    """quantile_cont(dec, q) FILTER (...) OVER (...) keeps the stream
    untouched after the percentile spelling (pre-r12 behavior) —
    the decimal wrap must not swallow the rider."""
    with column_type_hints(_HINTS):
        t = translate(
            "SELECT quantile_cont(d, 0.5) FILTER (WHERE g > 2)"
            " OVER (PARTITION BY g) FROM t"
        )
    assert "FILTER" in t and "OVER" in t
