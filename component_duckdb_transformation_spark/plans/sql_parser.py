"""SQL statement classification and dependency/output extraction.

Engine-neutral scheduling metadata, re-implementing the behavior of
reference ``src/sql_parser.py:14-128`` (which uses sqlglot) with the
local tokenizer:

- statement type: CREATE TABLE / CREATE VIEW / INSERT / UPDATE / DELETE /
  SELECT / OTHER (reference src/sql_parser.py:14-17, 26-46)
- outputs: tables written by CREATE / INSERT / UPDATE / DELETE
  (reference src/sql_parser.py:89-102)
- dependencies: tables read (FROM/JOIN), minus CTE aliases, minus the
  statement's own outputs (reference src/sql_parser.py:48-128; CTE-alias
  exclusion at 104-107 — load-bearing for scheduling, see unit
  expectation tests/unit/test_expected_input_tables_action.py:25-33)

Identifier canonicalization follows DuckDB semantics (reference
README.md:105-121): unquoted names lowercase; quoted/string-literal
names keep case.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum
from typing import List, Optional, Sequence, Set

from .sql_tokens import Token, code_tokens, split_statements, tokenize, unquote_name

_NAME_KINDS = ("word", "qident", "bident", "string")
# words that may directly follow FROM/JOIN but are not table names
_NOT_A_TABLE = {
    "SELECT", "LATERAL", "UNNEST", "VALUES", "WITH",
}
_JOIN_PRECEDERS = {"JOIN"}


class StatementType(str, Enum):
    CREATE_TABLE = "CREATE_TABLE"
    CREATE_VIEW = "CREATE_VIEW"
    INSERT = "INSERT"
    UPDATE = "UPDATE"
    DELETE = "DELETE"
    DROP = "DROP"
    ALTER = "ALTER"
    MERGE = "MERGE"
    SELECT = "SELECT"
    OTHER = "OTHER"

    @property
    def is_create(self) -> bool:
        return self in (StatementType.CREATE_TABLE, StatementType.CREATE_VIEW)

    @property
    def mutates(self) -> bool:
        return self in (
            StatementType.INSERT,
            StatementType.UPDATE,
            StatementType.DELETE,
            StatementType.DROP,
            StatementType.ALTER,
            StatementType.MERGE,
        )


@dataclass
class ParsedStatement:
    sql: str
    statement_type: StatementType
    outputs: Set[str] = field(default_factory=set)
    dependencies: Set[str] = field(default_factory=set)
    cte_aliases: Set[str] = field(default_factory=set)
    # terminal ORDER BY present in a CREATE TABLE/VIEW body — tracked so
    # the export layer can re-apply ordering (Spark temp views do not
    # persist order; see SURVEY §7 hard-part 2)
    has_order_by: bool = False


def parse_script(script: str) -> List[ParsedStatement]:
    """Parse a (possibly multi-statement) script string."""
    return [parse_statement(stmt) for stmt in split_statements(script)]


def parse_statement(sql: str) -> ParsedStatement:
    tokens = tokenize(sql)
    code = list(code_tokens(tokens))
    stype = _classify(code)
    ctes = _collect_cte_aliases(code)
    outputs = _collect_outputs(code, stype)
    deps = _collect_dependencies(code)
    deps -= ctes
    # Reference semantics (src/sql_parser.py:104-124): CREATE outputs and
    # the INSERT target are excluded from dependencies; UPDATE/DELETE
    # targets REMAIN dependencies (they read the table being mutated), so
    # the scheduler orders them after the table's producer.
    if stype.is_create or stype == StatementType.INSERT:
        deps -= outputs
    elif stype in (
        StatementType.UPDATE,
        StatementType.DELETE,
        StatementType.DROP,
        StatementType.ALTER,
        StatementType.MERGE,
    ):
        # the target must exist first: order after its producer
        deps |= outputs
    elif stype == StatementType.OTHER and code:
        # SUMMARIZE/DESCRIBE/SHOW read their subject table: order after
        # its producer (the subject is not FROM-introduced, so the
        # generic dependency scan misses it)
        head = code[0][1].upper
        if head in ("SUMMARIZE", "DESCRIBE", "SHOW") and len(code) > 1:
            if not code[1][1].is_kw(
                "TABLES", "SELECT", "WITH", "FROM", "VALUES", "TABLE"
            ):
                name, _ = _dotted_name(code, 1)
                if name:
                    deps.add(name)
    # sequence statements: CREATE/DROP SEQUENCE writes the sequence
    # name; nextval advances it (read-modify-write), so it is an output
    # too — writer-serialization edges then order concurrent users
    seq_m = re.match(
        r"(?is)\s*(CREATE|DROP)\s+(?:OR\s+REPLACE\s+)?(?:TEMP\w*\s+)?"
        r"SEQUENCE\s+(?:IF\s+(?:NOT\s+)?EXISTS\s+)?([\w`\"\.]+)", sql
    )
    if seq_m:
        outputs = {seq_m.group(2).strip('`"').lower()}
        deps = set()
        stype = StatementType.OTHER
    else:
        # token-shaped scan: a string literal containing the pattern
        # (e.g. VALUES ('uses nextval(''s'')')) must not add phantom
        # sequence edges
        for pos, (_, tok) in enumerate(code):
            if tok.kind != "word" or tok.text.lower() not in (
                "nextval",
                "currval",
            ):
                continue
            if (
                pos + 2 < len(code)
                and code[pos + 1][1].kind == "op"
                and code[pos + 1][1].text == "("
                and code[pos + 2][1].kind == "string"
            ):
                seq_name = code[pos + 2][1].text[1:-1].replace("''", "'")
                target = (
                    outputs if tok.text.lower() == "nextval" else deps
                )
                target.add(seq_name.strip('`"').lower())
        if stype in (
            StatementType.INSERT, StatementType.UPDATE, StatementType.DELETE
        ) and re.search(r"(?i)\breturning\b", sql):
            # INSERT/UPDATE/DELETE ... RETURNING registers the
            # `returning` view (added after the mutation branch above
            # folded outputs into deps, so no self-dependency appears)
            outputs.add("returning")
    has_order = _has_top_level_order_by(code)
    return ParsedStatement(
        sql=sql,
        statement_type=stype,
        outputs=outputs,
        dependencies=deps,
        cte_aliases=ctes,
        has_order_by=has_order,
    )


def _classify(code: Sequence[tuple[int, Token]]) -> StatementType:
    if not code:
        return StatementType.OTHER
    words = [t for _, t in code]
    first = words[0].upper
    if first == "CREATE":
        uppers = [w.upper for w in words[1:8]]
        if "VIEW" in uppers:
            return StatementType.CREATE_VIEW
        if "TABLE" in uppers:
            return StatementType.CREATE_TABLE
        return StatementType.OTHER
    if first == "INSERT":
        return StatementType.INSERT
    if first == "UPDATE":
        return StatementType.UPDATE
    if first == "DELETE":
        return StatementType.DELETE
    if first == "DROP":
        return StatementType.DROP
    if first == "ALTER":
        return StatementType.ALTER
    if first == "MERGE":
        return StatementType.MERGE
    if first in ("SELECT", "WITH"):
        # WITH ... INSERT / WITH ... CREATE TABLE|VIEW are valid in
        # DuckDB (the reference's sqlglot classifies them by the inner
        # statement; its own unit fixtures use the CREATE form)
        for w in words:
            if w.is_kw("INSERT"):
                return StatementType.INSERT
        if first == "WITH":
            for j, w in enumerate(words):
                if w.is_kw("CREATE"):
                    uppers = [x.upper for x in words[j + 1 : j + 8]]
                    if "VIEW" in uppers:
                        return StatementType.CREATE_VIEW
                    if "TABLE" in uppers:
                        return StatementType.CREATE_TABLE
        return StatementType.SELECT
    return StatementType.OTHER


def _dotted_name(code: Sequence[tuple[int, Token]], pos: int) -> tuple[Optional[str], int]:
    """Read a possibly-dotted table name starting at code index ``pos``.

    Returns (canonical_name, next_pos); (None, pos) when not a name or a
    table-function call (``word (``).
    """
    if pos >= len(code):
        return None, pos
    _, tok = code[pos]
    if tok.kind not in _NAME_KINDS:
        return None, pos
    if tok.kind == "word" and tok.upper in _NOT_A_TABLE:
        return None, pos
    # table function like read_parquet('x') — not a named table
    if pos + 1 < len(code):
        _, nxt = code[pos + 1]
        if tok.kind == "word" and nxt.kind == "op" and nxt.text == "(":
            return None, pos
    parts = [unquote_name(tok)]
    i = pos + 1
    while i + 1 < len(code):
        _, dot = code[i]
        _, part = code[i + 1]
        if dot.kind == "op" and dot.text == "." and part.kind in _NAME_KINDS:
            parts.append(unquote_name(part))
            i += 2
        else:
            break
    return ".".join(parts), i


def _collect_cte_aliases(code: Sequence[tuple[int, Token]]) -> Set[str]:
    aliases: Set[str] = set()
    i = 0
    n = len(code)
    while i < n:
        _, tok = code[i]
        if tok.is_kw("WITH"):
            j = i + 1
            if j < n and code[j][1].is_kw("RECURSIVE"):
                j += 1
            # alias loop: name [(cols)] AS [NOT|MATERIALIZED] ( ... ) [, ...]
            while j < n:
                name_tok = code[j][1]
                if name_tok.kind not in _NAME_KINDS or name_tok.is_kw(*_NOT_A_TABLE):
                    break
                alias = unquote_name(name_tok)
                j += 1
                if j < n and code[j][1].text == "(":  # column list
                    j = _skip_parens(code, j)
                if j >= n or not code[j][1].is_kw("AS"):
                    break
                j += 1
                while j < n and code[j][1].is_kw("NOT", "MATERIALIZED"):
                    j += 1
                if j >= n or code[j][1].text != "(":
                    break
                aliases.add(alias)
                j = _skip_parens(code, j)
                if j < n and code[j][1].text == ",":
                    j += 1
                    continue
                break
            i = j
        else:
            i += 1
    return aliases


def _skip_parens(code: Sequence[tuple[int, Token]], pos: int) -> int:
    """pos points at '('; return index just past the matching ')'."""
    depth = 0
    i = pos
    while i < len(code):
        t = code[i][1]
        if t.kind == "op" and t.text == "(":
            depth += 1
        elif t.kind == "op" and t.text == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return i


def _collect_outputs(code: Sequence[tuple[int, Token]], stype: StatementType) -> Set[str]:
    outputs: Set[str] = set()
    n = len(code)
    if stype.is_create:
        # CREATE [OR REPLACE] [TEMP|TEMPORARY] TABLE|VIEW [IF NOT EXISTS] name
        i = 1
        while i < n and not code[i][1].is_kw("TABLE", "VIEW"):
            i += 1
        i += 1
        while i < n and code[i][1].is_kw("IF", "NOT", "EXISTS"):
            i += 1
        name, _ = _dotted_name(code, i)
        if name is None and i < n:
            # CTAS target may still be a table-function-looking `name (`
            # when followed by a column list: CREATE TABLE t (a int, ...)
            tok = code[i][1]
            if tok.kind in _NAME_KINDS:
                name = unquote_name(tok)
        if name:
            outputs.add(name)
    elif stype == StatementType.INSERT:
        for i, (_, tok) in enumerate(code):
            if tok.is_kw("INTO") and i + 1 < n:
                name, _ = _dotted_name(code, i + 1)
                if name is None and code[i + 1][1].kind in _NAME_KINDS:
                    name = unquote_name(code[i + 1][1])
                if name:
                    outputs.add(name)
                break
    elif stype == StatementType.UPDATE:
        name, _ = _dotted_name(code, 1)
        if name:
            outputs.add(name)
    elif stype == StatementType.MERGE:
        for i, (_, tok) in enumerate(code):
            if tok.is_kw("INTO") and i + 1 < n:
                name, _ = _dotted_name(code, i + 1)
                if name:
                    outputs.add(name)
                break
    elif stype == StatementType.ALTER:
        # ALTER TABLE name <action>; RENAME TO also writes the new name
        i = 1
        while i < n and code[i][1].is_kw("TABLE", "IF", "EXISTS"):
            i += 1
        name, after = _dotted_name(code, i)
        if name:
            outputs.add(name)
            if (
                after + 1 < n
                and code[after][1].is_kw("RENAME")
                and code[after + 1][1].is_kw("TO")
                and after + 2 < n
            ):
                new_name, _ = _dotted_name(code, after + 2)
                if new_name:
                    outputs.add(new_name)
    elif stype == StatementType.DROP:
        # DROP TABLE|VIEW [IF EXISTS] name
        i = 1
        while i < n and code[i][1].is_kw("TABLE", "VIEW", "IF", "EXISTS"):
            i += 1
        name, _ = _dotted_name(code, i)
        if name is None and i < n and code[i][1].kind in _NAME_KINDS:
            name = unquote_name(code[i][1])
        if name:
            outputs.add(name)
    elif stype == StatementType.DELETE:
        for i, (_, tok) in enumerate(code):
            if tok.is_kw("FROM") and i + 1 < n:
                name, _ = _dotted_name(code, i + 1)
                if name:
                    outputs.add(name)
                break
    elif stype == StatementType.OTHER and n:
        # schema/profile statements register result views the scheduler
        # must sequence like any other producer (executor registers
        # them: SUMMARIZE -> `summarize`, DESCRIBE / SHOW t ->
        # `describe`, SHOW TABLES -> `show_tables`)
        head = code[0][1].upper
        if head == "SUMMARIZE":
            outputs.add("summarize")
        elif head == "DESCRIBE":
            outputs.add("describe")
        elif head == "SHOW":
            nxt = code[1][1].upper if n > 1 else ""
            outputs.add("show_tables" if nxt == "TABLES" else "describe")
    return outputs


# SQL-standard functions whose argument list contains a FROM keyword —
# `EXTRACT(DOW FROM ts)`, `substring(s FROM 2)` — which must NOT be
# treated as a table-list introducer (it would yield phantom deps like
# 'order_date' or '2' and can mis-batch or fake a circular dependency).
_FROM_ARG_FUNCS = {"EXTRACT", "SUBSTRING", "SUBSTR", "TRIM", "POSITION", "OVERLAY"}


def _collect_dependencies(code: Sequence[tuple[int, Token]]) -> Set[str]:
    deps: Set[str] = set()
    n = len(code)
    i = 0
    # paren stack: True = this paren is a FROM-taking function's arg list
    fn_paren: list[bool] = []
    while i < n:
        _, tok = code[i]
        if tok.kind == "op" and tok.text == "(":
            prev = code[i - 1][1] if i > 0 else None
            fn_paren.append(
                prev is not None
                and prev.kind == "word"
                and prev.upper in _FROM_ARG_FUNCS
            )
            i += 1
            continue
        if tok.kind == "op" and tok.text == ")":
            if fn_paren:
                fn_paren.pop()
            i += 1
            continue
        if tok.is_kw("FROM") and not (fn_paren and fn_paren[-1]):
            # DELETE FROM — target, not a read; _collect_outputs handles it
            if code and code[0][1].is_kw("DELETE"):
                prev_idx = i - 1
                if prev_idx == 0:
                    i += 1
                    continue
            i = _capture_from_list(code, i + 1, deps)
        elif tok.is_kw("JOIN"):
            name, nxt = _dotted_name(code, i + 1)
            if name:
                deps.add(name)
                i = nxt
            else:
                i += 1
        elif tok.is_kw("COPY") and i == 0 and i + 1 < n:
            # COPY <table> TO 'path': the table is read
            name, nxt = _dotted_name(code, 1)
            if name is None and code[1][1].kind == "string":
                name, nxt = code[1][1].text[1:-1], 2
            if name:
                deps.add(name)
                i = nxt
            else:
                i += 1
        elif tok.is_kw("PIVOT") and i + 1 < n and code[i + 1][1].kind in _NAME_KINDS:
            # DuckDB statement-level `PIVOT tbl ON ...`: tbl is read
            name, nxt = _dotted_name(code, i + 1)
            if name:
                deps.add(name)
                i = nxt
            else:
                i += 1
        elif tok.is_kw("USING") and i + 1 < n and code[i + 1][1].kind in _NAME_KINDS:
            # `MERGE ... USING src` / duckdb `FROM x USING SAMPLE` — only
            # capture for MERGE-style (name after USING, not '(')
            if code[0][1].is_kw("MERGE"):
                name, nxt = _dotted_name(code, i + 1)
                if name:
                    deps.add(name)
                    i = nxt
                    continue
            i += 1
        else:
            i += 1
    return deps


def _capture_from_list(code: Sequence[tuple[int, Token]], pos: int, deps: Set[str]) -> int:
    """Capture comma-separated table refs after FROM."""
    i = pos
    n = len(code)
    while i < n:
        tok = code[i][1]
        if tok.kind == "op" and tok.text == "(":
            # derived table / subquery: its internal FROMs are found by
            # the outer scan loop; return AT the paren so the outer
            # loop's paren-stack bookkeeping stays balanced
            return i
        name, nxt = _dotted_name(code, i)
        if name is None:
            return i
        deps.add(name)
        i = nxt
        # optional alias: [AS] alias
        if i < n and code[i][1].is_kw("AS") and i + 1 < n:
            i += 2
        elif i < n and code[i][1].kind == "word" and not code[i][1].is_kw(
            "WHERE", "GROUP", "ORDER", "LIMIT", "HAVING", "JOIN", "ON", "USING",
            "LEFT", "RIGHT", "FULL", "INNER", "OUTER", "CROSS", "NATURAL", "UNION",
            "INTERSECT", "EXCEPT", "QUALIFY", "WINDOW", "SELECT", "SEMI", "ANTI",
        ):
            i += 1
        if i < n and code[i][1].kind == "op" and code[i][1].text == ",":
            i += 1
            continue
        return i
    return i


def _has_top_level_order_by(code: Sequence[tuple[int, Token]]) -> bool:
    depth = 0
    for idx, (_, tok) in enumerate(code):
        if tok.kind == "op" and tok.text == "(":
            depth += 1
        elif tok.kind == "op" and tok.text == ")":
            depth -= 1
        elif depth <= 1 and tok.is_kw("ORDER"):
            nxt = idx + 1
            if nxt < len(code) and code[nxt][1].is_kw("BY"):
                return True
    return False
