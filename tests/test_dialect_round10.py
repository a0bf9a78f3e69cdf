"""Round-10 closing surfaces: bounded/running-frame window mad() off
the pandas UDAF — the last Python crossing in the window path — via
the in-place collect_list frame-median template
(functions/dialect.py::_rewrite_mad_window_inplace).

Reference behaviors verified against DuckDB in-process (the same
oracle the driver uses)."""

from __future__ import annotations

import duckdb
import pytest

from component_duckdb_transformation_spark.functions.dialect import (
    column_type_hints,
    translate,
)

SF = "/root/testdata/sf0.01"


def _duck(sf=SF):
    con = duckdb.connect()
    for t in ("part", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con


def _spark_views(spark, sf=SF):
    for t in ("part", "orders", "lineitem"):
        spark.read.parquet(f"{sf}/{t}.parquet").createOrReplaceTempView(t)


@pytest.mark.parametrize(
    "sql",
    [
        # bounded ROWS frame
        "SELECT p_partkey, mad(p_retailprice) OVER (PARTITION BY p_brand "
        "ORDER BY p_partkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m "
        "FROM part ORDER BY p_partkey",
        # both-sided ROWS frame, expression argument
        "SELECT p_partkey, mad(p_retailprice * 2) OVER (PARTITION BY "
        "p_type ORDER BY p_partkey ROWS BETWEEN 3 PRECEDING AND "
        "1 FOLLOWING) AS m FROM part WHERE p_size > 10 ORDER BY p_partkey",
        # running frame (ORDER BY, default frame)
        "SELECT p_partkey, mad(p_size) OVER (PARTITION BY p_brand "
        "ORDER BY p_partkey) AS m FROM part ORDER BY p_partkey",
        # RANGE frame over a numeric key
        "SELECT o_orderkey, mad(o_totalprice) OVER (ORDER BY o_orderkey "
        "RANGE BETWEEN 10 PRECEDING AND 10 FOLLOWING) AS m FROM orders "
        "WHERE o_orderkey < 2000 ORDER BY o_orderkey",
        # alongside other window functions and a running sum
        "SELECT p_partkey, sum(p_size) OVER (PARTITION BY p_brand ORDER "
        "BY p_partkey) AS s, mad(p_retailprice) OVER (PARTITION BY "
        "p_brand ORDER BY p_partkey ROWS BETWEEN 4 PRECEDING AND CURRENT "
        "ROW) AS m FROM part ORDER BY p_partkey",
    ],
)
def test_window_mad_bounded_frame_parity(spark, sql):
    con = _duck()
    _spark_views(spark)
    want = con.execute(sql).fetchall()
    got = [tuple(r) for r in spark.sql(translate(sql)).collect()]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            if isinstance(wv, float):
                assert gv == pytest.approx(float(wv), abs=1e-9)
            else:
                assert gv == wv


def test_window_mad_bounded_grouped_statement_parity(spark):
    # window mad over GROUPED output: the full-partition restructure
    # bails on GROUP BY statements; r9 kept the pandas UDAF here, the
    # in-place template now lowers it
    con = _duck()
    _spark_views(spark)
    sql = (
        "SELECT p_brand, mad(sum(p_size)) OVER (ORDER BY p_brand "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m FROM part "
        "GROUP BY p_brand ORDER BY p_brand"
    )
    want = con.execute(sql).fetchall()
    got = [tuple(r) for r in spark.sql(translate(sql)).collect()]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0]
        assert g[1] == pytest.approx(float(w[1]), abs=1e-9)


def test_window_mad_no_shape_is_pandas(spark):
    # VERDICT r9 done-criterion: NO window-mad shape crosses into
    # Python — bounded, running, grouped, or full-partition-bailed
    _spark_views(spark)
    shapes = [
        "SELECT p_partkey, mad(p_retailprice) OVER (PARTITION BY p_brand "
        "ORDER BY p_partkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m "
        "FROM part",
        "SELECT p_partkey, mad(p_size) OVER (PARTITION BY p_brand "
        "ORDER BY p_partkey) AS m FROM part",
        "SELECT p_brand, mad(sum(p_size)) OVER () AS m FROM part "
        "GROUP BY p_brand",
        "SELECT part.p_partkey, mad(p_size) OVER () AS m FROM part",
    ]
    for sql in shapes:
        plan = (
            spark.sql(translate(sql))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "InPandas" not in plan and "ArrowEvalPython" not in plan, sql


def test_window_mad_temporal_bounded_frame(spark):
    # hinted temporal bounded-frame window mad: r9 failed at Spark parse
    # (make_dt_interval(...) OVER w); now lowered with DuckDB's integer-
    # micros median rounding
    con = _duck()
    _spark_views(spark)
    sql = (
        "SELECT o_orderkey, mad(o_orderdate) OVER (PARTITION BY "
        "o_orderpriority ORDER BY o_orderkey ROWS BETWEEN 5 PRECEDING "
        "AND CURRENT ROW) AS m FROM orders WHERE o_orderkey <= 2000 "
        "ORDER BY o_orderkey"
    )
    want = con.execute(sql).fetchall()
    with column_type_hints({"o_orderdate": "date"}):
        out = translate(sql)
    got = [tuple(r) for r in spark.sql(out).collect()]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[1] == w[1], (g, w)


@pytest.mark.parametrize(
    "frame",
    [
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
        "",  # full-partition DISTINCT: the restructure bails, in-place
        # catches it (Spark rejects DISTINCT window aggregates, DuckDB
        # computes them over the frame's distinct values)
    ],
)
def test_window_mad_distinct_parity(spark, frame):
    con = _duck()
    _spark_views(spark)
    sql = (
        "SELECT p_partkey, mad(DISTINCT p_size) OVER (PARTITION BY "
        f"p_brand ORDER BY p_partkey {frame}) AS m FROM part "
        "ORDER BY p_partkey"
    )
    if not frame:
        sql = sql.replace("ORDER BY p_partkey)", ")", 1)
    want = con.execute(sql).fetchall()
    got = [tuple(r) for r in spark.sql(translate(sql)).collect()]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(float(w[1]), abs=1e-9), (g, w)


def test_window_mad_exclude_no_others_lowered(spark):
    # EXCLUDE NO OTHERS is a frame no-op: stripped and lowered
    con = _duck()
    _spark_views(spark)
    sql = (
        "SELECT p_partkey, mad(p_retailprice) OVER (PARTITION BY p_brand "
        "ORDER BY p_partkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW "
        "EXCLUDE NO OTHERS) AS m FROM part ORDER BY p_partkey"
    )
    want = con.execute(sql).fetchall()
    out = translate(sql)
    assert "EXCLUDE" not in out.upper()
    got = [tuple(r) for r in spark.sql(out).collect()]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(float(w[1]), abs=1e-9)
