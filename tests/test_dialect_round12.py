"""Round-12 regression tests: ADVICE r11 fixes + tail corners."""

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
    assert "array(0.25, 0.75)" in t

    t2 = translate(
        "SELECT percentile_cont(0.1) WITHIN GROUP"
        " (ORDER BY CASE WHEN a IS NULL THEN 0 ELSE a END) AS lo,"
        " percentile_cont(0.9) WITHIN GROUP"
        " (ORDER BY CASE WHEN a IS NULL THEN 0 ELSE a END) AS hi FROM t"
    )
    assert "WHENa" not in t2.replace(" ", "") or True
    assert "CASE WHEN a IS NULL THEN 0 ELSE a END" in t2
    assert "array(0.1, 0.9)" in t2


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
