"""Property-based guarantees for the SQL tokenizer the whole engine
rests on (parser, dialect, validator all consume its output)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from component_duckdb_transformation_spark.plans.sql_tokens import (
    split_statements,
    tokenize,
)

sql_text = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ019 \n\t_.,;()[]{}<>=+-*/%:'\"`|&^!?#~\\")
    ),
    max_size=200,
)


@given(sql_text)
@settings(max_examples=300, deadline=None)
def test_tokenize_is_lossless(sql):
    # concatenating token texts reproduces the input byte-for-byte
    assert "".join(t.text for t in tokenize(sql)) == sql


@given(sql_text)
@settings(max_examples=300, deadline=None)
def test_split_statements_preserves_code(sql):
    # joining split statements loses only separators/whitespace/comments,
    # never identifier or literal characters
    parts = split_statements(sql)
    joined = " ".join(parts)
    for ch in "abcXYZ019":
        assert joined.count(ch) <= sql.count(ch)


@given(st.lists(st.sampled_from(["SELECT 1", "SELECT ';' AS s", "-- c;\nSELECT 2"]), min_size=1, max_size=5))
@settings(max_examples=100, deadline=None)
def test_split_statements_respects_strings_and_comments(stmts):
    script = ";".join(stmts)
    parts = split_statements(script)
    # a ';' inside a string literal or comment never splits a statement
    assert len(parts) == len([s for s in stmts])


def test_dollar_quotes_normalize_to_standard_strings():
    # the ONE intended losslessness exception: $tag$...$tag$ becomes a
    # standard single-quoted literal (content preserved, quotes doubled)
    toks = [t for t in tokenize("SELECT $$a'b$$, $t$x$t$") if t.kind == "string"]
    assert [t.text for t in toks] == ["'a''b'", "'x'"]
    # a bare $ that opens nothing stays verbatim
    assert "".join(t.text for t in tokenize("SELECT $1 + 2")) == "SELECT $1 + 2"
