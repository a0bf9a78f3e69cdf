"""Function-parity battery from the round-6 catalog sweep
(tools/fn_parity_sweep.py): every shim/rename added there, diffed
against DuckDB on the same literal inputs. One test per family keeps
failure output readable."""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from component_duckdb_transformation_spark.functions.dialect import translate


def _check(spark, con, cases):
    for q in cases:
        want = con.execute(q).fetchone()[0]
        got = spark.sql(translate(q)).collect()[0][0]
        if isinstance(want, datetime.datetime) and isinstance(
            got, datetime.datetime
        ):
            assert want.replace(tzinfo=None) == got.replace(tzinfo=None), q
        elif want is None or got is None:
            assert want is None and got is None, (q, want, got)
        else:
            try:
                assert math.isclose(
                    float(want), float(got), rel_tol=1e-9
                ), (q, want, got)
            except (TypeError, ValueError):
                assert str(want) == str(got), (q, want, got)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_date_part_shims(spark, con):
    _check(spark, con, [
        "SELECT dayofweek(DATE '2024-03-05') AS v",
        "SELECT weekday(DATE '2024-03-03') AS v",
        "SELECT century(DATE '2024-03-05') AS v",
        "SELECT decade(DATE '2024-03-05') AS v",
        "SELECT millennium(DATE '2024-03-05') AS v",
        "SELECT era(DATE '2024-03-05') AS v",
        "SELECT isoyear(DATE '2021-01-01') AS v",
        "SELECT isoyear(DATE '2024-12-30') AS v",
        "SELECT julian(TIMESTAMP '2024-03-05 12:00:00') AS v",
        "SELECT julian(DATE '2024-03-05') AS v",
        "SELECT microsecond(TIMESTAMP '2024-03-05 10:30:15.123456') AS v",
        "SELECT millisecond(TIMESTAMP '2024-03-05 10:30:15.123456') AS v",
        "SELECT timezone_hour(TIMESTAMP '2024-03-05 10:30:15') AS v",
        "SELECT epoch_ns(TIMESTAMP '2024-03-05 10:30:00.123456') AS v",
        "SELECT make_timestamp(1709634600000000) AS v",
        "SELECT to_timestamp(1709634600.5) AS v",
        "SELECT TIMESTAMP '2024-01-01 00:00:00' + to_days(7) AS v",
        "SELECT TIMESTAMP '2024-01-01 00:00:00' + to_months(2) AS v",
        "SELECT TIMESTAMP '2024-01-01 00:00:00' + to_seconds(90.5) AS v",
    ])


def test_numeric_and_string_shims(spark, con):
    _check(spark, con, [
        "SELECT trunc(CAST(-2.7 AS DOUBLE)) AS v",
        "SELECT trunc(CAST(2.7 AS DOUBLE)) AS v",
        "SELECT trunc(7) AS v",
        "SELECT signbit(-2.5) AS v",
        "SELECT signbit(-0.0) AS v",
        "SELECT strlen('héllo') AS v",
        "SELECT ord('héllo') AS v",
        "SELECT to_base64(encode('ab~c')) AS v",
        "SELECT to_binary(7) AS v",
        "SELECT prefix('abcdef', 'abc') AS v",
        "SELECT suffix('abcdef', 'def') AS v",
        "SELECT greatest_common_divisor(12, 18) AS v",
        "SELECT least_common_multiple(4, 6) AS v",
        "SELECT regexp_extract_all('a1b2', '[0-9]') AS v",
    ])


def test_aggregate_shims(spark, con):
    _check(spark, con, [
        "SELECT count() AS v FROM (VALUES (1), (2)) t(i)",
        "SELECT count_star() AS v FROM (VALUES (1), (2)) t(i)",
        "SELECT sem(x) AS v FROM (VALUES (1.0),(2.0),(4.0)) t(x)",
        "SELECT fsum(x) AS v FROM (VALUES (1.5),(2.5)) t(x)",
        "SELECT favg(x) AS v FROM (VALUES (1.5),(2.5)) t(x)",
        "SELECT kahan_sum(x) AS v FROM (VALUES (1.5),(2.5)) t(x)",
        "SELECT arbitrary(x) AS v FROM (VALUES (5),(5)) t(x)",
        "SELECT list(x) AS v FROM (VALUES (1),(1)) t(x)",
        "SELECT kurtosis_pop(x) AS v FROM (VALUES (1.0),(2.0),(5.0),(9.0)) t(x)",
        "SELECT string_agg(x) AS v FROM (VALUES ('a'), ('b')) t(x)",
        "SELECT string_agg(x ORDER BY x DESC) AS v FROM (VALUES ('a'), ('b')) t(x)",
        "SELECT group_concat(x, '|') AS v FROM (VALUES ('a'), ('b')) t(x)",
        "SELECT listagg(x) AS v FROM (VALUES ('a'), ('b')) t(x)",
    ])


def test_degenerate_moment_aggregates_return_null(spark, con):
    """Zero-variance / tiny groups: DuckDB returns NULL where naive
    Spark translations raise DIVIDE_BY_ZERO under ANSI mode."""
    _check(spark, con, [
        "SELECT corr(x, y) AS v FROM (VALUES (1.5, 2.0), (1.5, 3.0)) t(x, y)",
        "SELECT corr(x, y) AS v FROM (VALUES (1.0, 2.0), (2.0, 3.0), (3.0, 5.0)) t(x, y)",
        "SELECT corr(x, y) AS v FROM (VALUES (1.5, 2.0)) t(x, y)",
        "SELECT skewness(x) AS v FROM (VALUES (1.0), (2.0)) t(x)",
        "SELECT skewness(x) AS v FROM (VALUES (1.0), (2.0), (4.0)) t(x)",
        "SELECT kurtosis(x) AS v FROM (VALUES (1.0), (2.0), (3.0)) t(x)",
        "SELECT kurtosis(x) AS v FROM (VALUES (1.0), (2.0), (3.0), (7.0)) t(x)",
    ])


def test_list_vector_shims(spark, con):
    _check(spark, con, [
        "SELECT list_dot_product([1.0, 2.0], [3.0, 4.0]) AS v",
        "SELECT list_inner_product([1.0, 2.0], [3.0, 4.0]) AS v",
        "SELECT list_cosine_similarity([1.0, 2.0], [2.0, 4.0]) AS v",
        "SELECT list_distance([1.0, 2.0], [4.0, 6.0]) AS v",
        "SELECT list_select([10, 20, 30], [3, 1]) AS v",
        "SELECT grade_up([30, 10, 20]) AS v",
        "SELECT grade_up([2, 1, 2]) AS v",
        "SELECT array_cat([1,2],[3]) AS v",
        "SELECT array_has([1,2],2) AS v",
        "SELECT array_indexof([1,2,3],2) AS v",
    ])


def test_json_and_bit_shims(spark, con):
    _check(spark, con, [
        "SELECT json_valid('{\"a\":1}') AS v",
        "SELECT json_valid('nope{') AS v",
        "SELECT json_array_length('[1,2,3]') AS v",
        "SELECT json_array_length('{}') AS v",
        "SELECT json_array(1, 2) AS v",
        "SELECT json_object('k', 1, 'j', 2) AS v",
        "SELECT get_bit(bitstring('0101011', 12), 6) AS v",
        "SELECT set_bit(bitstring('0101011', 8), 2, 1) AS v",
        "SELECT bit_position(bitstring('11', 2), bitstring('0110', 8)) AS v",
    ])


def test_strftime_literal_quoting(spark, con):
    _check(spark, con, [
        "SELECT strftime(TIMESTAMP '2024-03-05 10:30:00', '%Y-%m-%dT%H:%M') AS v",
        "SELECT strftime(DATE '2024-03-05', '%-d/%-m/%Y') AS v",
        "SELECT strftime(TIMESTAMP '2024-03-05 10:30:00.123456', '%H:%M:%S.%f') AS v",
        "SELECT strptime('2024-03-05T10', '%Y-%m-%dT%H') AS v",
        "SELECT strftime(DATE '2024-03-05', '%d it''s %m') AS v",
    ])


def test_operator_fn_aliases(spark, con):
    _check(spark, con, [
        "SELECT add(7, 3) AS v",
        "SELECT subtract(7, 3) AS v",
        "SELECT subtract(3) AS v",
        "SELECT multiply(7, 3) AS v",
        "SELECT divide(7, 2) AS v",
        "SELECT divide(7, 0) AS v",
        "SELECT add(multiply(2, 3), 1) AS v",
    ])


def test_arg_max_null_semantics(spark, con):
    """DuckDB arg_max/arg_min SKIP rows whose value argument is NULL;
    the *_null variants keep them. Spark max_by keeps them, so arg_max
    masks the ordering key."""
    _check(spark, con, [
        "SELECT arg_max(x, y) AS v FROM (VALUES ('a', 1), (NULL, 5)) t(x, y)",
        "SELECT arg_min(x, y) AS v FROM (VALUES ('a', 1), (NULL, 0)) t(x, y)",
        "SELECT arg_max_null(x, y) AS v FROM (VALUES ('a', 1), (NULL, 5)) t(x, y)",
        "SELECT argmax(x, y) AS v FROM (VALUES ('a', 1), ('b', 5)) t(x, y)",
    ])


def test_misc_second_batch(spark, con):
    _check(spark, con, [
        "SELECT generate_series(4) AS v",
        "SELECT greatest(5) AS v",
        "SELECT least(5) AS v",
        "SELECT array_reverse_sort([2, 3, 1]) AS v",
        "SELECT array_unique([1, 2, 2]) AS v",
        "SELECT regexp_escape('a.b*c') AS v",
        "SELECT regexp_escape('a-b_c 1') AS v",
        "SELECT parse_filename('a/b/c.txt') AS v",
        "SELECT parse_filename('a/b/c.txt', true) AS v",
        "SELECT parse_dirpath('a/b/c.txt') AS v",
        "SELECT parse_dirname('a/b/c.txt') AS v",
        "SELECT parse_dirpath('abc') AS v",
        "SELECT parse_dirname('abc') AS v",
        "SELECT md5_number_lower('abc') AS v",
        "SELECT md5_number_upper('abc') AS v",
        "SELECT nextafter(1.5, 2.0) AS v",
        "SELECT nextafter(1.5, -2.0) AS v",
        "SELECT try_strptime('xx', '%Y') AS v",
        "SELECT try_strptime('2024', '%Y') AS v",
        "SELECT json_extract('{\"a\": 1, \"b\": [5, 2]}', ['a', '$.b[0]']) AS v",
    ])


def test_size_formatting_truncates(spark, con):
    """format_bytes / formatReadable[Decimal]Size: one decimal,
    TRUNCATED toward zero (1.9502 -> '1.9 KiB', verified)."""
    _check(spark, con, [
        "SELECT format_bytes(1997) AS v",
        "SELECT format_bytes(1280) AS v",
        "SELECT format_bytes(123456789) AS v",
        "SELECT format_bytes(-2048) AS v",
        "SELECT format_bytes(1152921504606846976) AS v",
        "SELECT formatReadableSize(2038) AS v",
        "SELECT formatReadableDecimalSize(123456789) AS v",
        "SELECT formatReadableDecimalSize(1990) AS v",
        "SELECT formatReadableDecimalSize(-1990) AS v",
        "SELECT formatReadableDecimalSize(999) AS v",
    ])


def test_bar_degenerate_range(spark, con):
    """bar() with min == max: full bar above, spaces at-or-below
    (DuckDB, verified) — not a DIVIDE_BY_ZERO."""
    _check(spark, con, [
        "SELECT bar(1.5, 1.5, 1.5, 10) AS v",
        "SELECT bar(2.0, 1.5, 1.5, 10) AS v",
        "SELECT bar(1.0, 1.5, 1.5, 10) AS v",
        "SELECT bar(3.0, 0.0, 4.0, 12) AS v",
    ])


def test_strptime_year_defaults(spark, con):
    """strptime parse-side year semantics: no year directive -> base
    1900 (not Spark's 1970); %y pivots 69-99 into the 1900s like C
    (not Java's always-20yy)."""
    _check(spark, con, [
        "SELECT strptime('05/03', '%d/%m') AS v",
        "SELECT strptime('10:30', '%H:%M') AS v",
        "SELECT strptime('99', '%y') AS v",
        "SELECT strptime('68', '%y') AS v",
        "SELECT strptime('69', '%y') AS v",
        "SELECT strptime('05/03/99', '%d/%m/%y') AS v",
        "SELECT strptime('2024-03-05', '%Y-%m-%d') AS v",
        "SELECT try_strptime('xx', '%y') AS v",
    ])


def test_struct_map_shims(spark, con):
    _check(spark, con, [
        "SELECT struct_extract({'a': 1, 'b': 'x'}, 'b') AS v",
        "SELECT map_extract(MAP {'k': 5}, 'k') AS v",
        "SELECT map_extract(MAP {'k': 5}, 'nope') AS v",
        "SELECT map_keys(MAP {'k': 5}) AS v",
        "SELECT map_values(MAP {'k': 5}) AS v",
        "SELECT cardinality(MAP {'k': 5, 'j': 6}) AS v",
        "SELECT ({'a': 1}).a AS v",
    ])


def test_lexical_forms(spark, con):
    """Numeric underscore separators, dollar-quoted strings ($$ and
    $tag$), and e'...' escape strings (round-6 lexical parity)."""
    _check(spark, con, [
        "SELECT 1_000_000 AS v",
        "SELECT 1_000.5 AS v",
        "SELECT 1_000_000 + 2_000 AS v",
        "SELECT $$he's 'quoted'$$ AS v",
        "SELECT $tag$nested $$ inner$tag$ AS v",
        "SELECT e'a\\tb' AS v",
        "SELECT E'line1\\nline2' AS v",
        "SELECT e'back\\\\slash' AS v",
        "SELECT length($$x;y$$) AS v",
    ])


def test_collate_nocase(spark, con):
    _check(spark, con, [
        "SELECT 'B' COLLATE NOCASE = 'b' AS v",
        "SELECT min(x COLLATE NOCASE) AS v FROM (VALUES ('b'), ('A')) t(x)",
    ])


def test_glob_operator(spark, con):
    _check(spark, con, [
        "SELECT 'file.txt' GLOB '*.txt' AS v",
        "SELECT 'file.txt' GLOB 'f?le.*' AS v",
        "SELECT 'a1' GLOB 'a[0-9]' AS v",
        "SELECT 'a.b' GLOB 'a.b' AS v",
        "SELECT 'axb' GLOB 'a.b' AS v",
        "SELECT NOT ('file.txt' GLOB '*.csv') AS v",
    ])


def test_like_escape_family_and_json_keys(spark, con):
    _check(spark, con, [
        "SELECT not_like_escape('A_C', 'a!_c', '!') AS v",
        "SELECT not_ilike_escape('A_C', 'a!_c', '!') AS v",
        "SELECT ilike_escape('AbC', 'a!_c', '!') AS v",
        "SELECT json_keys('{\"a\":1,\"b\":2}') AS v",
        "SELECT decode(from_base64('YWJj')) AS v",
        "SELECT position('b' IN 'abc') AS v",
    ])


def test_json_type_and_integer_paths(spark, con):
    _check(spark, con, [
        "SELECT json_type('{\"a\":1}') AS v",
        "SELECT json_type('[1]') AS v",
        "SELECT json_type('42') AS v",
        "SELECT json_type('-42') AS v",
        "SELECT json_type('-4.2') AS v",
        "SELECT json_type('\"s\"') AS v",
        "SELECT json_type('true') AS v",
        "SELECT json_type('null') AS v",
        "SELECT timezone(TIMESTAMP '2024-03-05 10:30:00') AS v",
        "SELECT json_extract_path('[10, 20, 30]', 1) AS v",
        "SELECT json_extract_path_text('[10, 20, 30]', 2) AS v",
    ])
