"""Spark statement execution: the engine half the reference delegates to
DuckDB (``cursor.execute(sql)``, reference src/query_orchestrator.py:351).

Statement routing:

- ``CREATE [OR REPLACE] VIEW``  -> Spark temporary view (lazy, like the
  reference's CSV-input views)
- ``CREATE [OR REPLACE] TABLE`` -> materialized Parquet table in the
  session warehouse dir + temp view over it. Materialization matches
  DuckDB CTAS semantics (computed once, then mutable) and is the sane
  100 TB behavior: downstream readers re-scan Parquet instead of
  re-computing the plan.
- ``INSERT INTO``               -> Parquet append + view refresh
- ``UPDATE`` / ``DELETE``       -> SQL rewrite to a full-table SELECT
  (CASE-projection / negated-predicate filter), written as a new table
  version and re-bound — copy-on-write over plain Parquet, the same
  model table formats use, minus manifests
- anything else                 -> ``spark.sql`` + noop-format write
  (executes the plan distributed, discards rows — the analogue of
  DuckDB executing a bare SELECT)

All SQL passes through functions.dialect.translate first.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import re
import threading
import uuid
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

from ..exceptions import UserException
from ..functions.dialect import (
    _alias_expr_hint,
    _matching_paren,
    _pop_operand,
    _scan_stable_primary,
    _split_top_commas,
    _split_top_level_args,
    column_type_hints,
    expand_columns_macro,
    expand_union_by_name,
    mark_scan_stable,
    mark_scan_unstable,
    scan_stability_scope,
    translate,
)
from .orchestrator import Query
from .sql_parser import ParsedStatement, StatementType, parse_statement
from .sql_tokens import Token, code_tokens, tokenize, unquote_name

LOG = logging.getLogger(__name__)


_DUCK_TYPE_NAMES = {
    "string": "VARCHAR",
    "int": "INTEGER",
    "binary": "BLOB",
    "timestamp_ntz": "TIMESTAMP",
}


def _duck_type_name(dt) -> str:
    """Spark type -> DuckDB's DESCRIBE type spelling (VARCHAR, BLOB,
    ``T[]`` arrays, MAP(K, V), STRUCT(name T, ...))."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ArrayType):
        return _duck_type_name(dt.elementType) + "[]"
    if isinstance(dt, T.MapType):
        return (
            f"MAP({_duck_type_name(dt.keyType)}, "
            f"{_duck_type_name(dt.valueType)})"
        )
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name} {_duck_type_name(f.dataType)}" for f in dt.fields
        )
        return f"STRUCT({inner})"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    s = dt.simpleString()
    return _DUCK_TYPE_NAMES.get(s, s.upper())


def _as_read_schema(schema):
    """The written DataFrame's schema, nullability-normalized the way
    parquet inference reports it (every level nullable) — pinning the
    writer's nullable=False on the read side would claim a guarantee
    the file format does not carry."""
    from pyspark.sql.types import ArrayType, MapType, StructField, StructType

    def conv(dt):
        if isinstance(dt, StructType):
            return StructType(
                [
                    StructField(f.name, conv(f.dataType), True, f.metadata)
                    for f in dt.fields
                ]
            )
        if isinstance(dt, ArrayType):
            return ArrayType(conv(dt.elementType), True)
        if isinstance(dt, MapType):
            return MapType(conv(dt.keyType), conv(dt.valueType), True)
        return dt

    return conv(schema)


def _bt(name: str) -> str:
    """Backtick-quote a (possibly dotted / dashed) logical table name."""
    return "`" + name.replace("`", "``") + "`"


@dataclass
class TableState:
    name: str
    version: int = 0
    path: Optional[str] = None
    order_by: Optional[str] = None  # terminal ORDER BY clause text, for export
    # True for tables fed by streaming ingest: data lives in
    # ingest_batch=<id> partition dirs (idempotent micro-batch commits)
    stream: bool = False
    # True while the table is KNOWN row-free (bare-DDL create, nothing
    # inserted yet): the first keyed INSERT's clash probe can skip its
    # join against current keys — no row can clash (r13-opt). Any
    # mutation conservatively clears it.
    empty: bool = False
    # the written Spark schema (nullability normalized the way parquet
    # inference would): lets the view bind as a schema-pinned DataFrame
    # read, so per-statement re-resolutions never pay a footer-reading
    # schema-inference job (r14 driver-floor work, guide §1.2)
    schema: object = None


# partition-style directory key for streaming micro-batch commits;
# projected away by the table view
_BATCH_COL = "ingest_batch"


class TableStore:
    """Materialized-table catalog over a Parquet warehouse directory.

    Replaces the reference's persistent ``.duck.db`` working database
    (reference src/component.py:58-66): every CREATE TABLE lands here,
    versioned per mutation, always exposed as a temp view under its
    logical name.
    """

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self.tables: Dict[str, TableState] = {}
        # session-private scan-stability registry (shared with the
        # owning executor via scan_stability_scope): two engines in one
        # process must not cross-contaminate stability marks
        self.scan_registry: set = set()
        self._lock = threading.Lock()
        # per-table write locks: concurrent appends to ONE directory can
        # race on the FileOutputCommitter _temporary staging dir (one
        # job's commit cleanup deletes the other's in-flight files), so
        # same-table writers serialize here; different tables still
        # write fully in parallel
        self._write_locks: Dict[str, threading.Lock] = {}
        os.makedirs(warehouse_dir, exist_ok=True)

    def _write_lock(self, name: str) -> threading.Lock:
        with self._lock:
            lock = self._write_locks.get(name)
            if lock is None:
                lock = self._write_locks[name] = threading.Lock()
            return lock

    def _safe_dir(self, name: str) -> str:
        slug = re.sub(r"[^A-Za-z0-9_.-]", "_", name)
        return os.path.join(self.warehouse_dir, slug)

    def _bind_view(self, state: TableState) -> None:
        if (
            state.stream
            or state.schema is None
            or not re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", state.name)
        ):
            # stream tables carry a partition column the schema-pinned
            # path would have to model; they stay on the re-resolving
            # text view (appends land as new partition dirs)
            projection = (
                f"* EXCEPT ({_BATCH_COL})" if state.stream else "*"
            )
            self.spark.sql(
                f"CREATE OR REPLACE TEMPORARY VIEW {_bt(state.name)} "
                f"AS SELECT {projection} FROM parquet.`{state.path}`"
            )
        else:
            # schema-pinned DataFrame bind: resolving the view reuses
            # this analyzed relation, so statements referencing the
            # table never pay the footer-reading schema-inference job
            # the text view re-ran on every resolution (~2 driver jobs
            # per statement on the executor pipelines, r14). The
            # listing is taken fresh here — every mutation re-binds.
            self.spark.read.schema(state.schema).parquet(
                state.path
            ).createOrReplaceTempView(state.name)
        # parquet-backed: file-split scan order is deterministic
        mark_scan_stable(state.name, self.scan_registry)

    def create_table(
        self,
        name: str,
        df: DataFrame,
        order_by: str | None = None,
        empty: bool = False,
    ) -> None:
        with self._lock:
            state = self.tables.get(name) or TableState(name=name)
            state.version += 1
            state.order_by = order_by
            state.empty = empty
            state.path = os.path.join(self._safe_dir(name), f"v{state.version}")
            self.tables[name] = state
        df.write.mode("overwrite").parquet(state.path)
        state.schema = _as_read_schema(df.schema)
        self._bind_view(state)

    def insert_into(
        self, name: str, df: DataFrame, columns: Optional[List[str]] = None
    ) -> None:
        state = self.tables.get(name)
        if state is None:
            raise UserException(f"INSERT INTO unknown table '{name}'")
        target = self.spark.table(_bt(name))
        if columns:
            aligned = _align_by_name(df, target, columns)
        else:
            aligned = _align_by_position(df, target)
        if state.stream:
            # batch-partitioned layout can't take root-level appends
            # (conflicting directory structures): fold the insert in via
            # copy-on-write, converting to a plain versioned table
            state.stream = False
            self.rewrite(name, target.unionAll(aligned))
            return
        state.empty = False
        with self._write_lock(name):
            aligned.write.mode("append").parquet(state.path)
            # the view is a schema-pinned DataFrame whose file listing
            # was taken at bind time: re-bind so the appended files are
            # visible. This is ONE py4j call + a driver-side listing —
            # far cheaper than the schema-inference job every statement
            # paid to re-resolve the old text view (r14; the r13 note
            # about refresh-only applied to the text-view spelling)
            self._bind_view(state)

    def commit_stream_batch(self, name: str, df: DataFrame, batch_id: int) -> None:
        """Idempotent micro-batch commit for streaming ingest: batch
        ``b`` always lands at ``<table>/ingest_batch=b`` with overwrite
        semantics, so a ``foreachBatch`` replay after a crash between
        the data write and the checkpoint commit overwrites the same
        directory instead of appending duplicates — exactly-once at the
        data layout level (the checkpoint and the table directory share
        one lifecycle: reuse both or neither). First batch creates the
        table."""
        with self._lock:
            state = self.tables.get(name)
            created = state is None
            if created:
                state = TableState(name=name, version=1, stream=True)
                state.path = os.path.join(self._safe_dir(name), "stream_v1")
                self.tables[name] = state
            elif not state.stream:
                raise UserException(
                    f"stream ingest into non-stream table '{name}'"
                )
        df.write.mode("overwrite").parquet(
            os.path.join(state.path, f"{_BATCH_COL}={int(batch_id)}")
        )
        self.spark.catalog.refreshByPath(state.path)
        if created:
            # later batches only add ingest_batch=N partition dirs under
            # the same root: refreshByPath invalidates the file index
            # and re-resolution rediscovers partitions — the per-batch
            # view re-bind was redundant (r13-opt)
            self._bind_view(state)

    def rewrite(self, name: str, df: DataFrame) -> None:
        """Copy-on-write: write a new version, re-bind the view."""
        state = self.tables.get(name)
        if state is None:
            raise UserException(f"UPDATE/DELETE on unknown table '{name}'")
        with self._lock:
            state.version += 1
            state.empty = False
            new_path = os.path.join(self._safe_dir(name), f"v{state.version}")
        df.write.mode("overwrite").parquet(new_path)
        state.path = new_path
        state.schema = _as_read_schema(df.schema)
        self._bind_view(state)

    def order_by_clause(self, name: str) -> Optional[str]:
        state = self.tables.get(name)
        return state.order_by if state else None

    def rename_table(self, old: str, new: str) -> None:
        """Metadata-only rename: same parquet files, new view name."""
        with self._lock:
            state = self.tables.pop(old, None)
            if state is None:
                raise UserException(f"RENAME: unknown table '{old}'")
            state.name = new
            self.tables[new] = state
        self.spark.catalog.dropTempView(old)
        self._bind_view(state)


def _align_by_position(df: DataFrame, target: DataFrame) -> DataFrame:
    """Positionally align INSERT source columns to the target schema."""
    t_fields = target.schema.fields
    if len(df.columns) != len(t_fields):
        raise UserException(
            f"INSERT column count {len(df.columns)} does not match target {len(t_fields)}"
        )
    from pyspark.sql import functions as F

    # backtick-quote source names: auto-generated ones like `2.5`
    # contain dots that unquoted resolution parses as struct access
    return df.select(
        *[
            F.col(_bt(src)).cast(fld.dataType).alias(fld.name)
            for src, fld in zip(df.columns, t_fields)
        ]
    )


def _align_by_name(df: DataFrame, target: DataFrame, columns: List[str]) -> DataFrame:
    """Align an explicit `INSERT INTO t (b, a) ...` column list by NAME:
    listed target columns take the source values in list order, unlisted
    target columns are filled with NULL (DuckDB semantics; the reference
    inherits them — reference src/query_orchestrator.py executes the
    statement verbatim in DuckDB)."""
    from pyspark.sql import functions as F

    if len(columns) != len(df.columns):
        raise UserException(
            f"INSERT column list has {len(columns)} names but source "
            f"provides {len(df.columns)} columns"
        )
    t_by_lower = {fld.name.lower(): fld for fld in target.schema.fields}
    src_for = {}
    for src, col in zip(df.columns, columns):
        key = col.lower()
        if key not in t_by_lower:
            raise UserException(f"INSERT column '{col}' not in target table")
        src_for[key] = src
    out = []
    for fld in target.schema.fields:
        src = src_for.get(fld.name.lower())
        if src is not None:
            out.append(F.col(_bt(src)).cast(fld.dataType).alias(fld.name))
        else:
            out.append(F.lit(None).cast(fld.dataType).alias(fld.name))
    return df.select(*out)


class SparkStatementExecutor:
    """Executes parsed scripts against a SparkSession."""

    def __init__(self, spark: SparkSession, store: TableStore):
        self.spark = spark
        self.store = store
        # view ORDER BY clauses for export-time re-sort (SURVEY §7.2)
        self.view_order_by: Dict[str, str] = {}
        # PRIMARY KEY / UNIQUE columns from bare-DDL CREATE TABLE,
        # lowercase table name -> lowercase key columns. Drives DuckDB
        # constraint semantics on INSERT (duplicate-key errors,
        # OR REPLACE / OR IGNORE / ON CONFLICT)
        self.primary_keys: Dict[str, List[str]] = {}
        # NOT NULL columns and CHECK expressions (bare-DDL tables);
        # enforced at INSERT time and re-validated on UPDATE for the
        # assigned columns (_validate_update_constraints)
        self.not_null: Dict[str, List[str]] = {}
        self.checks: Dict[str, List[str]] = {}
        # scalar macros: name -> (params, body text), inlined at use
        self._macros: Dict[str, tuple[List[str], str]] = {}
        # temp views already bound (and fresh) for file-reading table
        # functions, plus abspath -> ALL view names ever bound for that
        # path (one per distinct option set). A COPY TO must invalidate
        # every view of the written path, not just the first one
        # re-registered — each cached view pins the OLD data and
        # inferred schema.
        self._file_read_views: set[str] = set()
        self._path_read_views: Dict[str, set] = {}
        # sequences: name -> {next, curr, inc, minv, maxv, cycle, used}
        self._sequences: Dict[str, dict] = {}
        # scratch parquet materializations for nextval over shuffled
        # sources (_seq_materialize_shuffled)
        self._seq_mat_counter = 0
        # ENUM types: lowercase name -> ordered value list
        self._enum_types: Dict[str, List[str]] = {}
        # DDL-declared ENUM columns: table -> {col -> enum name}, for
        # ordinal comparison/sort semantics (DuckDB orders enums by
        # declaration position, not lexically)
        self._enum_columns: Dict[str, Dict[str, str]] = {}
        # DDL-declared TIME columns: table -> {col}; stored as
        # epoch-day TIMESTAMP (Spark has no TIME), the declaration is
        # what keeps the 24 h modular-arithmetic wrap working when the
        # value reaches arithmetic through the column (published as
        # the 'time' pseudo-hint to the translator)
        self._time_columns: Dict[str, set] = {}
        # dep-table schema cache for the hint publisher; entries for a
        # statement's outputs/dependencies are invalidated after every
        # non-SELECT statement (see _execute_statement)
        self._hint_schema_cache: Dict[str, list] = {}
        # Ambient job group at construction time (job groups are
        # thread-local and the orchestrator fans queries out to pool
        # threads, which would otherwise lose the caller's tag): nest
        # per-query groups under it as "<parent>/<query>" so harnesses
        # keyed on the parent group (bench.py::_active_times) can still
        # attribute the pipeline's jobs.
        try:
            self._parent_job_group = spark.sparkContext.getLocalProperty(
                "spark.jobGroup.id"
            )
        except Exception:  # noqa: BLE001 — attribution is best-effort
            self._parent_job_group = None

    def _expand_dynamic_pivot(self, sql: str, max_values: int = 200) -> str:
        """DuckDB statement-level dynamic pivot — ``PIVOT tbl ON col
        USING agg(x) GROUP BY keys [ORDER BY ...]`` — discovers the
        pivot values at plan time, like DuckDB does. Expanded to
        conditional aggregation (``agg FILTER (WHERE col = v) AS v``,
        values sorted ascending, NULLs excluded — DuckDB's column set)
        rather than Spark's PIVOT operator, so the USING expression
        passes through whole. Supports the explicit-GROUP BY form with
        one ON column and one USING aggregate; other shapes are left
        untouched (Spark-style ``PIVOT (... FOR ... IN ...)`` already
        parses natively). Value discovery caps at ``max_values`` —
        beyond that a pivot is almost certainly a mistake."""
        tokens = tokenize(sql)
        code = list(code_tokens(tokens))
        n = len(code)
        p_ci = None
        depth = 0
        for ci, (_, tok) in enumerate(code):
            if tok.kind == "op" and tok.text == "(":
                depth += 1
            elif tok.kind == "op" and tok.text == ")":
                depth -= 1
            elif (
                depth == 0
                and tok.is_kw("PIVOT")
                and ci + 1 < n
                and code[ci + 1][1].kind in ("word", "bident", "qident")
            ):
                p_ci = ci
                break
        if p_ci is None:
            return sql
        name = unquote_name(code[p_ci + 1][1])

        def _find(kw: str, from_ci: int) -> Optional[int]:
            d = 0
            for j in range(from_ci, n):
                t = code[j][1]
                if t.kind == "op" and t.text == "(":
                    d += 1
                elif t.kind == "op" and t.text == ")":
                    d -= 1
                elif d == 0 and t.is_kw(kw):
                    return j
            return None

        on_ci = _find("ON", p_ci + 2)
        using_ci = _find("USING", p_ci + 2)
        group_ci = _find("GROUP", p_ci + 2)
        if on_ci is None or using_ci is None or group_ci is None:
            return sql
        order_ci = _find("ORDER", group_ci + 1)
        limit_ci = _find("LIMIT", group_ci + 1)
        tail_ci = min(x for x in (order_ci, limit_ci, n) if x is not None)

        raw = lambda ci: code[ci][0]  # noqa: E731
        on_expr = "".join(
            t.text for t in tokens[raw(on_ci) + 1: raw(using_ci)]
        ).strip()
        agg_expr = "".join(
            t.text for t in tokens[raw(using_ci) + 1: raw(group_ci)]
        ).strip()
        by_ci = group_ci + 1
        if by_ci < n and code[by_ci][1].is_kw("BY"):
            by_ci += 1
        keys = "".join(
            t.text
            for t in tokens[raw(by_ci): raw(tail_ci) if tail_ci < n else len(tokens)]
        ).strip()
        tail = (
            "".join(t.text for t in tokens[raw(tail_ci):]) if tail_ci < n else ""
        )
        if not on_expr or not agg_expr or not keys:
            return sql
        # ON col IN (v1, v2, ...): explicit value list, no discovery
        on_expr, in_values = _split_pivot_in_list(on_expr)
        if in_values is not None:
            values = in_values  # [(literal_sql, column_name)] as listed
        else:
            discovered = [
                r[0]
                for r in self.spark.sql(
                    f"SELECT DISTINCT {translate(on_expr)} AS v "
                    f"FROM {_bt(name)} "
                    f"WHERE ({translate(on_expr)}) IS NOT NULL ORDER BY 1 "
                    f"LIMIT {max_values + 1}"
                ).collect()
            ]
            if len(discovered) > max_values:
                raise UserException(
                    f"PIVOT ON {on_expr}: more than {max_values} "
                    "distinct values"
                )
            values = [(_pivot_value_literal(v), str(v)) for v in discovered]
        aggs = _split_pivot_aggs(agg_expr)
        cols = []
        for lit, vname in values:
            for expr, alias in aggs:
                if alias is None and len(aggs) > 1:
                    raise UserException(
                        "PIVOT with multiple USING aggregates requires "
                        "AS aliases (DuckDB's column-naming rule)"
                    )
                cname = (
                    vname if alias is None else f"{vname}_{alias}"
                ).replace("`", "``")
                filtered = _attach_agg_filter(
                    expr, f"({on_expr}) = {lit}"
                )
                if filtered is None:
                    raise UserException(
                        f"PIVOT USING expression has no aggregate call: {expr}"
                    )
                cols.append(f"{filtered} AS `{cname}`")
        head = "".join(t.text for t in tokens[: raw(p_ci)])
        return (
            f"{head}SELECT {keys}, {', '.join(cols)} FROM {_bt(name)} "
            f"GROUP BY {keys} {tail}"
        )

    def _summarize(self, name: str) -> DataFrame:
        """DuckDB ``SUMMARIZE t`` — per-column profile with DuckDB's
        column set (column_name, column_type, min, max, approx_unique,
        avg, std, q25/q50/q75, count, null_percentage). ONE distributed
        aggregation pass over the table (all columns' metrics in a
        single agg row); only that one row reaches the driver, where it
        pivots into the per-column result. Numeric-only metrics are
        NULL for other types, like DuckDB."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        name = name.strip().strip('`"')
        df = self.spark.table(_bt(name))
        numeric = (T.IntegralType, T.FractionalType, T.DecimalType)
        aggs = [F.count(F.lit(1)).alias("__n")]
        for i, fld in enumerate(df.schema.fields):
            c = F.col(_bt(fld.name))
            aggs += [
                F.min(c).cast("string").alias(f"min_{i}"),
                F.max(c).cast("string").alias(f"max_{i}"),
                F.approx_count_distinct(c).alias(f"au_{i}"),
                F.count(c).alias(f"cnt_{i}"),
            ]
            if isinstance(fld.dataType, numeric):
                d = c.cast("double")
                aggs += [
                    F.avg(d).alias(f"avg_{i}"),
                    F.stddev(d).alias(f"std_{i}"),
                    F.expr(
                        f"percentile_approx({_bt(fld.name)}, "
                        "array(0.25, 0.5, 0.75))"
                    ).alias(f"q_{i}"),
                ]
        row = df.agg(*aggs).collect()[0].asDict()
        n = row["__n"]
        out = []
        for i, fld in enumerate(df.schema.fields):
            is_num = isinstance(fld.dataType, numeric)
            q = row.get(f"q_{i}") or [None, None, None]
            out.append(
                (
                    fld.name,
                    fld.dataType.simpleString().upper(),
                    row[f"min_{i}"],
                    row[f"max_{i}"],
                    int(row[f"au_{i}"]),
                    float(row[f"avg_{i}"]) if is_num and row.get(f"avg_{i}") is not None else None,
                    float(row[f"std_{i}"]) if is_num and row.get(f"std_{i}") is not None else None,
                    str(q[0]) if q[0] is not None else None,
                    str(q[1]) if q[1] is not None else None,
                    str(q[2]) if q[2] is not None else None,
                    int(n),
                    round(100.0 * (n - row[f"cnt_{i}"]) / n, 2) if n else 0.0,
                )
            )
        return self.spark.createDataFrame(
            out,
            "column_name string, column_type string, min string, "
            "max string, approx_unique bigint, avg double, std double, "
            "q25 string, q50 string, q75 string, count bigint, "
            "null_percentage double",
        )

    def _describe(self, rest: str) -> DataFrame:
        """DuckDB ``DESCRIBE t`` / ``DESCRIBE SELECT ...`` — schema
        report with DuckDB's column set (column_name, column_type,
        null, key, default, extra). Metadata-only: a DESCRIBE'd query
        is analyzed (Catalyst schema), never executed. Types render
        with DuckDB's names (VARCHAR, BLOB, ``T[]`` arrays,
        STRUCT(...))."""
        rest = rest.strip()
        head = rest.split(None, 1)[0].upper() if rest else ""
        if head in ("SELECT", "WITH", "FROM", "VALUES", "TABLE"):
            schema = self.spark.sql(translate(rest)).schema
        else:
            schema = self.spark.table(_bt(rest.strip().strip('`"'))).schema
        rows = [
            (
                f.name,
                _duck_type_name(f.dataType),
                "YES" if f.nullable else "NO",
                None,
                None,
                None,
            )
            for f in schema.fields
        ]
        return self.spark.createDataFrame(
            rows,
            "column_name string, column_type string, null string, "
            "key string, default string, extra string",
        )

    # ------------------------------------------------------------------
    # ENUM types (DuckDB CREATE TYPE ... AS ENUM)
    # ------------------------------------------------------------------

    def _type_ddl(self, sql: str) -> None:
        """``CREATE TYPE name AS ENUM ('a', ...)`` / ``DROP TYPE``.
        ENUM columns map to STRING plus an insert-time CHECK on the
        value set; casts validate via ``_bind_enum_casts``. Divergence
        (documented, COVERAGE.md): comparisons and ORDER BY on an ENUM
        column are lexical (VARCHAR), not positional. Non-ENUM CREATE
        TYPE (aliases, structs) is unsupported and raises."""
        m = re.match(
            r"(?is)\s*CREATE\s+TYPE\s+([\w`\"]+)\s+AS\s+ENUM\s*\(", sql
        )
        if m:
            name = m.group(1).strip('`"').lower()
            tokens = tokenize(sql)
            open_idx = next(
                i for i, t in enumerate(tokens)
                if t.kind == "op" and t.text == "("
            )
            close = _matching_paren(tokens, open_idx)
            vals: List[str] = []
            for arg in _split_top_level_args(tokens, open_idx, close):
                code = [t for t in arg if t.kind not in ("ws", "comment")]
                if len(code) != 1 or code[0].kind != "string":
                    raise UserException(
                        "CREATE TYPE AS ENUM: values must be string "
                        f"literals: {sql[:80]}"
                    )
                vals.append(code[0].text[1:-1].replace("''", "'"))
            if name in self._enum_types:
                raise UserException(f'Type "{name}" already exists')
            self._enum_types[name] = vals
            return
        m = re.match(
            r"(?is)\s*DROP\s+TYPE\s+(IF\s+EXISTS\s+)?([\w`\"]+)", sql
        )
        if m:
            name = m.group(2).strip('`"').lower()
            if name not in self._enum_types and not m.group(1):
                raise UserException(
                    f"Catalog Error: Type with name {name} does not exist!"
                )
            self._enum_types.pop(name, None)
            return
        raise UserException(
            f"Only CREATE TYPE ... AS ENUM is supported: {sql[:80]}"
        )

    def _enum_check_expr(self, ename: str, operand: str) -> str:
        vals = ", ".join(
            "'" + v.replace("'", "''") + "'" for v in self._enum_types[ename]
        )
        return (
            f"(CASE WHEN ({operand}) IS NULL OR ({operand}) IN ({vals}) "
            f"THEN CAST(({operand}) AS STRING) ELSE "
            f"CAST(raise_error(concat('Conversion Error: Could not "
            f"convert string ''', CAST(({operand}) AS STRING), "
            f"''' to ENUM {ename}')) AS STRING) END)"
        )

    def _bind_enum_casts(self, sql: str) -> str:
        """Rewrite ``enum_range(NULL::name)`` to the value-array
        literal, and ``x::name`` / ``CAST(x AS name)`` to a validating
        STRING expression, for every registered ENUM name."""
        low = sql.lower()
        if not any(n in low for n in self._enum_types):
            return sql
        tokens = tokenize(sql)
        out: List[Token] = []
        i = 0
        n = len(tokens)
        changed = False
        while i < n:
            tok = tokens[i]
            nxt = _next_code_idx(tokens, i)
            # enum_range(NULL::name) — before the :: pass eats the name
            if (
                tok.kind == "word"
                and tok.text.lower() == "enum_range"
                and nxt < n
                and tokens[nxt].kind == "op" and tokens[nxt].text == "("
            ):
                close = _matching_paren(tokens, nxt)
                inner = [
                    t for t in tokens[nxt + 1: close]
                    if t.kind not in ("ws", "comment")
                ]
                ename = (
                    inner[-1].text.lower()
                    if inner and inner[-1].kind == "word" else None
                )
                if ename in self._enum_types:
                    vals = ", ".join(
                        "'" + v.replace("'", "''") + "'"
                        for v in self._enum_types[ename]
                    )
                    out.extend(tokenize(f"array({vals})"))
                    i = close + 1
                    changed = True
                    continue
            if (
                tok.kind == "op" and tok.text == "::"
                and nxt < n and tokens[nxt].kind == "word"
                and tokens[nxt].text.lower() in self._enum_types
            ):
                operand = "".join(t.text for t in _pop_operand(out)).strip()
                expr = self._enum_check_expr(
                    tokens[nxt].text.lower(), operand
                )
                out.extend(tokenize(expr))
                i = nxt + 1
                changed = True
                continue
            if (
                tok.kind == "word" and tok.upper == "CAST"
                and nxt < n and tokens[nxt].kind == "op"
                and tokens[nxt].text == "("
            ):
                close = _matching_paren(tokens, nxt)
                body = tokens[nxt + 1: close]
                code = [
                    (k, t) for k, t in enumerate(body)
                    if t.kind not in ("ws", "comment")
                ]
                if (
                    len(code) >= 3
                    and code[-2][1].is_kw("AS")
                    and code[-1][1].kind == "word"
                    and code[-1][1].text.lower() in self._enum_types
                ):
                    operand = "".join(
                        t.text for t in body[: code[-2][0]]
                    ).strip()
                    expr = self._enum_check_expr(
                        code[-1][1].text.lower(), operand
                    )
                    out.extend(tokenize(expr))
                    i = close + 1
                    changed = True
                    continue
            out.append(tok)
            i += 1
        return "".join(t.text for t in out) if changed else sql

    def _check_enum_member(self, ename: str, lit_tok: str) -> None:
        """A positional rewrite of a 'lit'::ename operand bypasses the
        cast pass's validating CASE, so validate the literal here —
        DuckDB raises a Conversion Error for a non-member (and a silent
        array_position miss would return 0, comparing as before-first
        instead of erroring)."""
        val = lit_tok[1:-1].replace("''", "'")
        if val not in self._enum_types[ename]:
            raise UserException(
                f"Conversion Error: Could not convert string '{val}' "
                f"to ENUM {ename}"
            )

    def _expand_star_replace(self, sql: str) -> str:
        """Schema-aware ``SELECT * [EXCLUDE (...)] REPLACE (expr AS c)``
        expansion preserving DuckDB's column ORDER (the replaced column
        stays in its original position). The dialect's schema-free
        fallback (`_rewrite_star_replace`) moves replaced columns to
        the END of the projection — identical column SET, wrong order
        for positional consumers (INSERT by position, UNION, CSV
        export). Applies when the star's scope is a single known
        table/view at depth-0 FROM (optionally aliased); other shapes
        keep the fallback."""
        tokens = tokenize(sql)
        n = len(tokens)
        # single-table FROM resolution
        from_tbl = from_alias = None
        depth = 0
        k = 0
        while k < n:
            t = tokens[k]
            if t.kind == "op" and t.text in ("(", "["):
                depth += 1
            elif t.kind == "op" and t.text in (")", "]"):
                depth -= 1
            elif depth == 0 and t.is_kw("FROM"):
                j = _next_code_idx(tokens, k)
                if j < n and tokens[j].kind in ("word", "bident", "qident"):
                    from_tbl = unquote_name(tokens[j])
                    from_alias = from_tbl
                    j2 = _next_code_idx(tokens, j)
                    if j2 < n and tokens[j2].is_kw("AS"):
                        j3 = _next_code_idx(tokens, j2)
                        if j3 < n and tokens[j3].kind in (
                            "word", "bident", "qident"
                        ):
                            from_alias = unquote_name(tokens[j3])
                            j2 = _next_code_idx(tokens, j3)
                    elif j2 < n and tokens[j2].kind in (
                        "word", "bident", "qident"
                    ) and tokens[j2].upper not in (
                        "WHERE", "GROUP", "ORDER", "LIMIT", "HAVING",
                        "UNION", "EXCEPT", "INTERSECT", "QUALIFY",
                        "WINDOW", "OFFSET", "JOIN", "INNER", "LEFT",
                        "RIGHT", "FULL", "CROSS", "ON", "USING",
                    ):
                        from_alias = unquote_name(tokens[j2])
                        j2 = _next_code_idx(tokens, j2)
                    if j2 < n and (
                        tokens[j2].is_kw(
                            "JOIN", "INNER", "LEFT", "RIGHT", "FULL",
                            "CROSS", "ASOF", "POSITIONAL",
                        )
                        or (tokens[j2].kind == "op" and tokens[j2].text == ",")
                    ):
                        from_tbl = None  # multi-table scope: fallback
                break
            k += 1
        if from_tbl is None:
            return sql
        cols = self._table_columns(from_tbl)
        if not cols:
            return sql
        out: List[Token] = []
        i = 0
        changed = False
        depth2 = 0
        while i < n:
            tok = tokens[i]
            # only depth-0 stars belong to the resolved FROM scope — a
            # star inside a nested subquery/CTE body has its own FROM
            # and is left to the dialect fallback
            if tok.kind == "op" and tok.text in ("(", "["):
                depth2 += 1
            elif tok.kind == "op" and tok.text in (")", "]"):
                depth2 -= 1
            if depth2 > 0:
                out.append(tok)
                i += 1
                continue
            star_lo = i
            if (
                tok.kind in ("word", "bident", "qident")
                and unquote_name(tok).lower() == from_alias.lower()
            ):
                d = _next_code_idx(tokens, i)
                s2 = _next_code_idx(tokens, d) if d < n else n
                if not (
                    d < n
                    and tokens[d].kind == "op" and tokens[d].text == "."
                    and s2 < n
                    and tokens[s2].kind == "op" and tokens[s2].text == "*"
                ):
                    out.append(tok)
                    i += 1
                    continue
                star = s2
            elif tok.kind == "op" and tok.text == "*":
                star = i
            else:
                out.append(tok)
                i += 1
                continue
            # optional EXCLUDE/EXCEPT (cols)
            excl: set = set()
            k2 = _next_code_idx(tokens, star)
            if (
                k2 < n
                and tokens[k2].kind == "word"
                and tokens[k2].upper in ("EXCLUDE", "EXCEPT")
            ):
                p = _next_code_idx(tokens, k2)
                if p < n and tokens[p].text == "(":
                    c = _matching_paren(tokens, p)
                    for part in _split_top_level_args(tokens, p, c):
                        code = [
                            x for x in part
                            if x.kind not in ("ws", "comment")
                        ]
                        if len(code) == 1:
                            excl.add(unquote_name(code[0]).lower())
                    k2 = _next_code_idx(tokens, c)
            if not (
                k2 < n
                and tokens[k2].kind == "word"
                and tokens[k2].upper == "REPLACE"
            ):
                out.append(tok)
                i += 1
                continue
            p_open = _next_code_idx(tokens, k2)
            if not (p_open < n and tokens[p_open].text == "("):
                out.append(tok)
                i += 1
                continue
            close = _matching_paren(tokens, p_open)
            repl: Dict[str, str] = {}
            ok = True
            for part in _split_top_level_args(tokens, p_open, close):
                code = [
                    (ci, x) for ci, x in enumerate(part)
                    if x.kind not in ("ws", "comment")
                ]
                as_pos = None
                d2 = 0
                for ci, x in code:
                    if x.kind == "op" and x.text in ("(", "["):
                        d2 += 1
                    elif x.kind == "op" and x.text in (")", "]"):
                        d2 -= 1
                    elif d2 == 0 and x.is_kw("AS"):
                        as_pos = ci
                if (
                    as_pos is None
                    or code[-1][0] <= as_pos
                    or code[-1][1].kind not in ("word", "bident", "qident")
                ):
                    ok = False
                    break
                name = unquote_name(code[-1][1]).lower()
                expr = "".join(x.text for x in part[:as_pos]).strip()
                repl[name] = expr
            if not ok or not set(repl) <= {c.lower() for c in cols}:
                out.append(tok)
                i += 1
                continue
            items = []
            for c in cols:
                cl = c.lower()
                if cl in excl:
                    continue
                if cl in repl:
                    items.append(f"({repl[cl]}) AS {_bt(c)}")
                else:
                    items.append(f"{_bt(from_alias)}.{_bt(c)}")
            out.extend(tokenize(", ".join(items)))
            changed = True
            i = close + 1
            continue
        # unreachable: loop always advances via continue/append
        return "".join(t.text for t in out) if changed else sql

    def _bind_enum_ordinals(self, sql: str, deps) -> str:
        """DuckDB orders ENUM values by declaration position, not
        lexically; this engine stores enum columns as STRING, so plain
        ORDER BY / range comparisons / min-max over them would sort
        alphabetically — a silent wrong answer for value lists like
        ('low', 'medium', 'high'). Rewrite the positional operations on
        DDL-declared enum columns of the statement's referenced tables
        to ``array_position(<declaration array>, col)``:

        - ORDER BY items (statement-level and window OVER) that are a
          bare/qualified enum column ref
        - ``< > <= >=`` comparisons where one simple operand is an enum
          column ref (the other side joins via array_position too —
          string literals behave like DuckDB's cast-to-enum)
        - ``min(col)`` / ``max(col)`` round-trip through the ordinal

        A column name that resolves to different value lists (or to a
        plain column) across the referenced tables is ambiguous without
        full name resolution and keeps lexical semantics; equality and
        grouping are value-based and never rewritten. Compound
        comparison operands (``x || col < 'v'``) are left lexical —
        boundary-token checks keep the rewrite from splitting a larger
        expression."""
        colmap: Dict[str, List[str]] = {}
        drop: set = set()
        for tbl in deps or []:
            for c, ename in self._enum_columns.get(tbl, {}).items():
                vals = self._enum_types.get(ename)
                if vals is None:
                    continue
                if c in colmap and colmap[c] != vals:
                    drop.add(c)
                else:
                    colmap[c] = vals
        for tbl in deps or []:
            emap = self._enum_columns.get(tbl, {})
            for c in self._table_columns(tbl) or []:
                cl = c.lower()
                if cl not in colmap:
                    continue
                ename = emap.get(cl)
                if ename is None or self._enum_types.get(ename) != colmap[cl]:
                    drop.add(cl)
        colmap = {c: v for c, v in colmap.items() if c not in drop}
        if not colmap:
            return sql

        tokens = tokenize(sql)
        n = len(tokens)

        def arr(col: str) -> str:
            vals = ", ".join(
                "'" + v.replace("'", "''") + "'" for v in colmap[col]
            )
            return f"array({vals})"

        def ref_at(i: int):
            """(lo, hi_exclusive, col_lower, text) when tokens[i] starts
            a bare or single-qualified identifier whose FINAL segment is
            an enum column; else None."""
            if i >= n or tokens[i].kind not in ("word", "bident", "qident"):
                return None
            j = _next_code_idx(tokens, i)
            if j < n and tokens[j].kind == "op" and tokens[j].text == ".":
                k = _next_code_idx(tokens, j)
                if k < n and tokens[k].kind in ("word", "bident", "qident"):
                    col = unquote_name(tokens[k]).lower()
                    if col in colmap:
                        # not a deeper dotted path
                        m = _next_code_idx(tokens, k)
                        if m < n and tokens[m].kind == "op" and tokens[
                            m
                        ].text in (".", "("):
                            return None
                        txt = "".join(t.text for t in tokens[i: k + 1])
                        return (i, k + 1, col, txt)
                return None
            col = unquote_name(tokens[i]).lower()
            if col in colmap:
                m = _next_code_idx(tokens, i)
                if m < n and tokens[m].kind == "op" and tokens[m].text in (
                    ".",
                    "(",
                ):
                    return None
                return (i, i + 1, col, tokens[i].text)
            return None

        _BOUND_BEFORE = {
            "SELECT", "WHERE", "AND", "OR", "NOT", "WHEN", "THEN", "ELSE",
            "BY", "ON", "HAVING", "CASE",
        }

        out: List[Token] = []
        i = 0
        while i < n:
            tok = tokens[i]
            # min(col) / max(col)
            if tok.kind == "word" and tok.text.lower() in ("min", "max"):
                p = _next_code_idx(tokens, i)
                if p < n and tokens[p].kind == "op" and tokens[p].text == "(":
                    close = _matching_paren(tokens, p)
                    inner_lo = _next_code_idx(tokens, p)
                    r = ref_at(inner_lo)
                    if (
                        r is not None
                        and _next_code_idx(tokens, r[1] - 1) == close
                    ):
                        _, _, col, txt = r
                        fn = tok.text.lower()
                        out.extend(tokenize(
                            f"element_at({arr(col)}, CAST({fn}("
                            f"array_position({arr(col)}, {txt})) AS INT))"
                        ))
                        i = close + 1
                        continue
            # ORDER BY items
            if tok.is_kw("ORDER"):
                p = _next_code_idx(tokens, i)
                if p < n and tokens[p].is_kw("BY"):
                    out.extend(tokens[i:p + 1])
                    j = p + 1
                    depth = 0
                    item_lo = j
                    while j <= n:
                        t = tokens[j] if j < n else None
                        ends = t is None or (
                            depth == 0
                            and (
                                (t.kind == "op" and t.text in (")", ","))
                                or t.is_kw(
                                    "LIMIT", "OFFSET", "FETCH", "ROWS",
                                    "RANGE", "GROUPS", "UNION", "EXCEPT",
                                    "INTERSECT", "HAVING", "WINDOW",
                                    "QUALIFY", "EXCLUDE", "USING",
                                )
                            )
                        )
                        if ends:
                            item = tokens[item_lo:j]
                            code = [
                                (k, x) for k, x in enumerate(item)
                                if x.kind not in ("ws", "comment")
                            ]
                            tail0 = len(code)
                            while tail0 and code[tail0 - 1][1].is_kw(
                                "ASC", "DESC", "FIRST", "LAST", "NULLS"
                            ):
                                tail0 -= 1
                            r = (
                                ref_at(item_lo + code[0][0])
                                if code[:tail0]
                                else None
                            )
                            if (
                                r is not None
                                and tail0 >= 1
                                and r[1] - item_lo == code[tail0 - 1][0] + 1
                            ):
                                _, _, col, txt = r
                                out.extend(tokenize(
                                    f" array_position({arr(col)}, {txt})"
                                ))
                                out.extend(item[code[tail0 - 1][0] + 1:])
                            else:
                                out.extend(item)
                            if t is None:
                                i = j
                                break
                            if t.kind == "op" and t.text == ",":
                                out.append(t)
                                j += 1
                                item_lo = j
                                continue
                            i = j
                            break
                        if t.kind == "op" and t.text in ("(", "["):
                            depth += 1
                        elif t.kind == "op" and t.text in (")", "]"):
                            depth -= 1
                        j += 1
                    continue
            # range comparisons — positional ONLY when BOTH sides are
            # enum-typed (col ref or 'lit'::ename cast) with the same
            # value list; DuckDB compares enum-vs-bare-VARCHAR
            # LEXICALLY (the enum side casts to varchar), which the
            # stored-as-STRING representation already matches
            if tok.kind == "op" and tok.text in ("<", ">", "<=", ">="):
                lref = None  # (lo_k, values, text)
                k = len(out) - 1
                while k >= 0 and out[k].kind in ("ws", "comment"):
                    k -= 1
                if k >= 0 and out[k].kind in ("word", "bident", "qident"):
                    k2 = k - 1
                    while k2 >= 0 and out[k2].kind in ("ws", "comment"):
                        k2 -= 1
                    if (
                        k2 >= 0
                        and out[k2].kind == "op"
                        and out[k2].text == "::"
                    ):
                        # 'lit'::ename
                        ename = unquote_name(out[k]).lower()
                        k3 = k2 - 1
                        while k3 >= 0 and out[k3].kind in ("ws", "comment"):
                            k3 -= 1
                        if (
                            k3 >= 0
                            and out[k3].kind == "string"
                            and ename in self._enum_types
                        ):
                            self._check_enum_member(
                                ename, out[k3].text
                            )
                            lref = (
                                k3,
                                self._enum_types[ename],
                                out[k3].text,
                            )
                    else:
                        lo_k = k
                        if (
                            k2 >= 0
                            and out[k2].kind == "op"
                            and out[k2].text == "."
                        ):
                            k3 = k2 - 1
                            while k3 >= 0 and out[k3].kind in (
                                "ws", "comment"
                            ):
                                k3 -= 1
                            if k3 >= 0 and out[k3].kind in (
                                "word", "bident", "qident"
                            ):
                                lo_k = k3
                        col = unquote_name(out[k]).lower()
                        before = lo_k - 1
                        while before >= 0 and out[before].kind in (
                            "ws", "comment"
                        ):
                            before -= 1
                        bound_ok = before < 0 or (
                            out[before].kind == "op"
                            and out[before].text in ("(", ",")
                        ) or out[before].is_kw(*_BOUND_BEFORE)
                        if col in colmap and bound_ok:
                            lref = (
                                lo_k,
                                colmap[col],
                                "".join(
                                    t.text for t in out[lo_k:]
                                ).strip(),
                            )
                # right operand: enum col ref or 'lit'::ename, followed
                # by a boundary
                rlo = _next_code_idx(tokens, i)
                rref = None  # (values, text)
                rend = None
                if rlo < n and tokens[rlo].kind == "string":
                    c2 = _next_code_idx(tokens, rlo)
                    if (
                        c2 < n
                        and tokens[c2].kind == "op"
                        and tokens[c2].text == "::"
                    ):
                        c3 = _next_code_idx(tokens, c2)
                        if c3 < n and tokens[c3].kind in (
                            "word", "bident", "qident"
                        ):
                            ename = unquote_name(tokens[c3]).lower()
                            if ename in self._enum_types:
                                self._check_enum_member(
                                    ename, tokens[rlo].text
                                )
                                rend = c3 + 1
                                rref = (
                                    self._enum_types[ename],
                                    tokens[rlo].text,
                                )
                else:
                    r = ref_at(rlo)
                    if r is not None and r[2] in colmap:
                        rend = r[1]
                        rref = (colmap[r[2]], r[3])
                if rend is not None:
                    after = _next_code_idx(tokens, rend - 1)
                    if not (
                        after >= n
                        or (
                            tokens[after].kind == "op"
                            and tokens[after].text in (")", ",", ";")
                        )
                        or tokens[after].is_kw(
                            "AND", "OR", "THEN", "ELSE", "END", "ORDER",
                            "GROUP", "HAVING", "LIMIT", "WHERE", "ASC",
                            "DESC", "NULLS", "UNION", "EXCEPT",
                            "INTERSECT", "QUALIFY",
                        )
                    ):
                        rref = None
                if (
                    lref is not None
                    and rref is not None
                    and lref[1] == rref[0]
                ):
                    vals = ", ".join(
                        "'" + v.replace("'", "''") + "'" for v in lref[1]
                    )
                    varr = f"array({vals})"
                    lo_k = lref[0]
                    del out[lo_k:]
                    out.extend(tokenize(
                        f"array_position({varr}, {lref[2]})"
                    ))
                    out.append(tok)
                    out.extend(tokenize(
                        f" array_position({varr}, {rref[1]})"
                    ))
                    i = rend
                    continue
            out.append(tok)
            i += 1
        return "".join(t.text for t in out)

    # ------------------------------------------------------------------
    # sequences (DuckDB CREATE SEQUENCE / nextval / currval)
    # ------------------------------------------------------------------

    @staticmethod
    def _seq_call_spans(tokens: List[Token], fname: str):
        """Spans of ``fname('literal')`` calls over the FULL token list:
        (word_idx, close_idx, literal_or_None). Token-shaped, so string
        literals and comments containing the pattern never spoof a call
        (a raw-regex scan would treat ``'uses nextval(''s'')'`` as a
        real sequence call)."""
        spans = []
        n = len(tokens)
        for i, t in enumerate(tokens):
            if t.kind != "word" or t.text.lower() != fname:
                continue
            j = _next_code_idx(tokens, i)
            if j >= n or tokens[j].kind != "op" or tokens[j].text != "(":
                continue
            close = _matching_paren(tokens, j)
            inner = [
                x for x in tokens[j + 1: close]
                if x.kind not in ("ws", "comment")
            ]
            lit = (
                inner[0].text[1:-1].replace("''", "'")
                if len(inner) == 1 and inner[0].kind == "string"
                else None
            )
            spans.append((i, close, lit))
        return spans

    def _scan_order_rank_sql(self, query_sql: str) -> Optional[str]:
        """Distributed 1-based scan-order rank expression for the rows
        ``query_sql`` produces, or None when it can't be built safely.

        ``monotonically_increasing_id()`` packs (partition << 33) |
        row-offset-within-partition, so a dense rank is per-partition
        offset + local index — the offsets come from one probe pass
        counting rows per partition (the same count job
        ``rdd.zipWithIndex`` runs), inlined as a literal map. Only
        partition STATS reach the driver; the data path stays map-side
        with no single-partition exchange.

        Probe/real-run agreement requires reproducible per-partition
        counts, which holds for shuffle-free plans (file-split
        determinism); a plan with an Exchange (AQE may re-coalesce
        differently between runs) returns None and the caller keeps
        the single-task window fallback."""
        try:
            probe = self.spark.sql(translate(query_sql))
            plan = probe._jdf.queryExecution().executedPlan().toString()
            if "Exchange" in plan:
                return None
            cnt = self.spark.sql(
                "SELECT __pid, count(*) AS __cnt FROM (SELECT "
                "shiftright(monotonically_increasing_id(), 33) AS __pid "
                f"FROM ({translate(query_sql)}) __q) __p GROUP BY __pid"
            ).collect()
        except Exception:  # noqa: BLE001 — any probe failure keeps fallback
            return None
        if not cnt:
            return "CAST(1 AS BIGINT)"  # zero rows: never evaluated
        pids, offs, off = [], [], 0
        for pid, c in sorted((r["__pid"], r["__cnt"]) for r in cnt):
            pids.append(f"{pid}L")
            offs.append(f"{off}L")
            off += c
        mid = "monotonically_increasing_id()"
        # map_from_arrays literal (NOT 2-arg map(): this text passes
        # through translate(), whose DuckDB map(keys, values) rewrite
        # would mangle a variadic pair)
        return (
            f"(element_at(map_from_arrays(array({', '.join(pids)}), "
            f"array({', '.join(offs)})), "
            f"shiftright({mid}, 33)) + ({mid} & 8589934591) + 1)"
        )

    def _sequence_step(self, st: ParsedStatement) -> bool:
        """Handle sequence DDL and nextval/currval statements. Returns
        True when the statement was fully handled here.

        ``nextval('s')`` values are assigned in scan order — the same
        physical-order contract as POSITIONAL JOIN (COVERAGE.md).
        Position assignment avoids the single-task global window
        wherever possible: FROM-less statements (single row) inline the
        literal next value; shuffle-free FROM queries get the
        distributed per-partition-offset rank (see
        ``_scan_order_rank_sql``); only shuffled sources keep
        ``row_number() OVER (ORDER BY monotonically_increasing_id())``
        (reproducible per-partition counts can't be guaranteed across
        the probe and the real run there). Supported where surrogate
        keys are actually minted: CREATE TABLE AS / INSERT / plain
        SELECT, one nextval call per statement; the sequence advances
        by the statement's row count after it runs (a bounds violation
        therefore surfaces after execution, not mid-scan like DuckDB —
        documented). currval inlines the last value and errors if the
        sequence was never advanced, like DuckDB.

        All routing is token-shaped ('sequence' is NOT a reserved word
        in DuckDB: ``CREATE TABLE t (sequence INT)`` or the word inside
        a string literal/comment must not land here)."""
        toks = _code_toks(st.sql)
        if not toks:
            return False
        if toks[0].is_kw("CREATE"):
            k = 1
            if k < len(toks) and toks[k].is_kw("OR"):
                k += 2  # OR REPLACE
            if k < len(toks) and toks[k].is_kw("TEMP", "TEMPORARY"):
                k += 1
            if k < len(toks) and toks[k].is_kw("SEQUENCE"):
                self._create_sequence(st.sql)
                return True
        if toks[0].is_kw("DROP") and len(toks) > 1 and toks[1].is_kw(
            "SEQUENCE"
        ):
            m = re.search(
                r"(?is)\bSEQUENCE\s+(IF\s+EXISTS\s+)?([\w`\"\.]+)", st.sql
            )
            if not m:
                raise UserException(f"Unsupported DROP form: {st.sql[:80]}")
            name = m.group(2).strip('`"').lower()
            if name not in self._sequences and not m.group(1):
                raise UserException(
                    f"Catalog Error: Sequence with name {name} does not exist!"
                )
            self._sequences.pop(name, None)
            return True
        full = tokenize(st.sql)
        has_curr = bool(self._seq_call_spans(full, "currval"))
        next_spans = self._seq_call_spans(full, "nextval")
        if not has_curr and not next_spans:
            return False
        sql = self._inline_currval(st.sql) if has_curr else st.sql
        if not next_spans:
            self._execute_statement(parse_statement(sql))
            return True
        if len(next_spans) > 1:
            raise UserException(
                "nextval: one call per statement is supported "
                "(row-order value assignment cannot model several "
                "independent advances per row)"
            )
        if next_spans[0][2] is None:
            raise UserException(
                "nextval: only a literal sequence name is supported"
            )
        name = next_spans[0][2].strip('`"').lower()
        seq = self._sequences.get(name)
        if seq is None:
            raise UserException(
                f"Catalog Error: Sequence with name {name} does not exist!"
            )
        base, inc = seq["next"], seq["inc"]

        # pick the rank strategy on the (possibly currval-inlined) text
        sql_toks = tokenize(sql)
        depth = 0
        has_from = False
        has_row_filter = False
        has_values = False
        saw_body = False  # a depth-0 SELECT or VALUES was seen at all
        for t in sql_toks:
            if t.kind == "op" and t.text in ("(", "["):
                depth += 1
            elif t.kind == "op" and t.text in (")", "]"):
                depth -= 1
            elif depth == 0 and t.is_kw("FROM"):
                has_from = True
                break
            elif depth == 0 and t.is_kw("WHERE", "QUALIFY", "LIMIT"):
                has_row_filter = True
            elif depth == 0 and t.is_kw("VALUES"):
                has_values = True  # may carry multiple row groups
                saw_body = True
            elif depth == 0 and t.is_kw("SELECT"):
                saw_body = True
        rank_sql = None
        mat_view = None
        # a FROM-less, filter-less, conflict-mode-less INSERT inserts
        # exactly one row (or raises): the post-execute sequence advance
        # is statically n=1 — skips the two full-table count() jobs the
        # general path pays (r13-opt). Conflict modes keep the counted
        # path: their count-delta semantics (no advance on an ignored /
        # replaced row) are the shipped, oracle-tested behavior.
        # Fully parenthesized bodies (``INSERT INTO t (SELECT ... FROM
        # x)`` — no depth-0 SELECT or VALUES at all) keep the counted
        # path: their row count is the inner query's, not 1. Depth-0
        # set operations and OFFSET deliberately STAY static: DuckDB
        # evaluates the single nextval span exactly once per FROM-less
        # branch row and advances by 1 even when EXCEPT/OFFSET then
        # drops the row (differentially pinned in
        # test_sequence_setop_insert_counted — the r13-ADVICE proposal
        # to route them to the counted path would diverge).
        static_single_row = (
            not has_from
            and not has_row_filter
            and not has_values
            and saw_body
            and re.search(
                r"(?i)\bOR\s+(REPLACE|IGNORE)\b|\bON\s+CONFLICT\b", sql
            )
            is None
        )
        if not has_from:
            rank_sql = "CAST(1 AS BIGINT)"  # single-row statement
        else:
            # probe on the query part (first top-level SELECT/VALUES,
            # minus any INSERT tail clauses), with nextval neutralized
            qlo = qhi = None
            depth = 0
            for k, t in enumerate(sql_toks):
                if t.kind == "op" and t.text in ("(", "["):
                    depth += 1
                elif t.kind == "op" and t.text in (")", "]"):
                    depth -= 1
                elif depth == 0 and t.is_kw("SELECT", "VALUES"):
                    qlo = k
                    break
            if qlo is not None:
                qhi = len(sql_toks)
                depth = 0
                for k in range(qlo, len(sql_toks)):
                    t = sql_toks[k]
                    if t.kind == "op" and t.text in ("(", "["):
                        depth += 1
                    elif t.kind == "op" and t.text in (")", "]"):
                        depth -= 1
                    elif depth == 0 and t.is_kw("RETURNING"):
                        qhi = k
                        break
                    elif depth == 0 and t.is_kw("ON"):
                        nk = _next_code_idx(sql_toks, k)
                        if nk < len(sql_toks) and sql_toks[nk].is_kw(
                            "CONFLICT"
                        ):
                            qhi = k
                            break
                qtext = "".join(t.text for t in sql_toks[qlo:qhi])
                probe_q = self._replace_nextval_once(
                    qtext, "CAST(0 AS BIGINT)"
                )
                rank_sql = self._scan_order_rank_sql(probe_q)
                if rank_sql is None:
                    # shuffled source: materialize the non-sequence
                    # columns to scratch parquet (deterministic file
                    # order) and number the parquet scan distributedly.
                    # Positional INSERT never reads output column
                    # names, so unaliased expression items may be
                    # auto-aliased into the rebuild
                    prefix = "".join(
                        t.text for t in sql_toks[:qlo]
                    ).upper()
                    mat = self._seq_materialize_shuffled(
                        qtext,
                        allow_rename=prefix.lstrip().startswith("INSERT")
                        and "BY NAME" not in prefix,
                    )
                    if mat is not None:
                        outer_q, mat_view = mat
                        sql = (
                            "".join(t.text for t in sql_toks[:qlo])
                            + outer_q
                            + "".join(t.text for t in sql_toks[qhi:])
                        )
                        rank_sql = self._scan_order_rank_sql(
                            f"SELECT * FROM {_bt(mat_view)}"
                        )
        if rank_sql is None:
            # unrebuildable shuffled shape: serialization point,
            # documented (COVERAGE.md)
            rank_sql = (
                "row_number() OVER (ORDER BY "
                "monotonically_increasing_id())"
            )
        if seq["cycle"]:
            span = seq["maxv"] - seq["minv"] + 1
            expr = (
                f"(pmod(CAST({base - seq['minv']} AS BIGINT) + "
                f"({rank_sql} - 1) * "
                f"CAST({inc} AS BIGINT), CAST({span} AS BIGINT)) + "
                f"CAST({seq['minv']} AS BIGINT))"
            )
        else:
            expr = (
                f"(CAST({base} AS BIGINT) + ({rank_sql} - 1) * "
                f"CAST({inc} AS BIGINT))"
            )
        new_sql = self._replace_nextval_once(sql, expr)
        new_st = parse_statement(new_sql)
        stype = new_st.statement_type
        target = self._target_table(new_st)
        # NOTE: a scratch __seq_mat_N view stays registered — the
        # RETURNING view (and any lazy consumer of this statement's
        # result) may still reference it; names are unique per counter
        # and the backing parquet lives in the warehouse scratch dir.
        if stype == StatementType.CREATE_TABLE:
            self._execute_statement(new_st)
            n = self.spark.table(_bt(target)).count()
        elif stype == StatementType.INSERT:
            if static_single_row:
                self._execute_statement(new_st)
                n = 1  # raised otherwise; no count jobs needed
            else:
                before = self.spark.table(_bt(target)).count()
                self._execute_statement(new_st)
                n = self.spark.table(_bt(target)).count() - before
        elif stype == StatementType.SELECT:
            n = self.spark.sql(translate(new_sql)).count()
        else:
            raise UserException(
                "nextval is supported in CREATE TABLE AS / INSERT / "
                f"SELECT statements, not: {st.sql[:80]}"
            )
        if n > 0:
            last = base + (n - 1) * inc
            if not seq["cycle"]:
                if inc > 0 and last > seq["maxv"]:
                    raise UserException(
                        f'nextval: reached maximum value of sequence '
                        f'"{name}" ({seq["maxv"]})'
                    )
                if inc < 0 and last < seq["minv"]:
                    raise UserException(
                        f'nextval: reached minimum value of sequence '
                        f'"{name}" ({seq["minv"]})'
                    )
                seq["curr"] = last
                seq["next"] = last + inc
            else:
                span = seq["maxv"] - seq["minv"] + 1
                seq["curr"] = (last - seq["minv"]) % span + seq["minv"]
                seq["next"] = (last + inc - seq["minv"]) % span + seq["minv"]
            seq["used"] = True
        return True

    # select-item residue allowed around a hoisted nextval call: the
    # rebuilt item re-evaluates over the materialized scan, so it may
    # reference nothing but the call itself and constant scaffolding
    _SEQ_ITEM_CONST_WORDS = frozenset({
        "cast", "as", "bigint", "int", "integer", "smallint", "tinyint",
        "hugeint", "ubigint", "uinteger", "varchar", "text", "string",
        "double", "decimal", "numeric", "concat", "lpad", "rpad", "abs",
        "format", "printf", "null",
    })

    def _seq_materialize_shuffled(self, qtext: str, allow_rename: bool = False):
        """nextval over a SHUFFLED source: materialize the query's
        non-sequence columns to scratch parquet (scan order of the
        materialization is deterministic file order — parquet part
        files are listed name-sorted in write order), then rebuild the
        query as a scan of that table so the existing distributed
        partition-stats numbering applies. Returns ``(outer_query_sql,
        mat_view_name)`` with the nextval call left intact for the
        caller's value substitution, or None when the statement shape
        can't be safely rebuilt (the caller keeps the documented
        single-task window fallback).

        Supported shape: plain SELECT list where the nextval item
        references only the call plus constants, every other item is a
        bare ``*``, an ``AS``-aliased expression, a (dotted) column
        ref, or — under ``allow_rename`` (positional INSERT, where
        output column names are irrelevant) — any expression
        (auto-aliased into the materialization). GROUP BY / ORDER BY
        ordinals are renumbered for the dropped sequence item; ALL
        group keys still bail (their expansion shifts)."""
        toks = tokenize(qtext)
        code = [k for k, t in enumerate(toks) if t.kind not in ("ws", "comment")]
        if not code or not toks[code[0]].is_kw("SELECT"):
            return None
        sel0 = code[0]
        first_item = _next_code_idx(toks, sel0)
        if first_item < len(toks) and toks[first_item].is_kw(
            "DISTINCT", "ALL"
        ):
            return None
        # depth-0 FROM + ordinal/ALL guard on GROUP/ORDER bodies
        depth = 0
        from_idx = None
        guard = False  # inside a GROUP BY / ORDER BY body
        ordinal_idxs: List[int] = []
        for k, t in enumerate(toks):
            if t.kind == "op" and t.text in ("(", "["):
                depth += 1
            elif t.kind == "op" and t.text in (")", "]"):
                depth -= 1
            elif depth == 0 and t.kind == "word":
                u = t.upper
                if u == "FROM" and from_idx is None:
                    from_idx = k
                elif u in ("GROUP", "ORDER"):
                    guard = True
                elif u in ("HAVING", "LIMIT", "OFFSET", "WHERE", "QUALIFY"):
                    guard = False
                elif guard and u == "ALL":
                    return None
                elif guard and re.fullmatch(r"\d+", t.text):
                    # ordinal — renumbered after the sequence item's
                    # position is known
                    ordinal_idxs.append(k)
        if from_idx is None or from_idx <= sel0:
            return None
        items = _split_top_commas(toks, first_item, from_idx)
        seq_pos = None
        for idx, (lo, hi) in enumerate(items):
            if any(
                toks[k].kind == "word"
                and toks[k].text.lower() == "nextval"
                for k in range(lo, hi)
            ):
                if seq_pos is not None:
                    return None
                seq_pos = idx
        if seq_pos is None:
            return None
        outer_items: List[str] = []
        mat_items: List[str] = []
        for idx, (lo, hi) in enumerate(items):
            seg = toks[lo:hi]
            text = "".join(t.text for t in seg).strip()
            scode = [t for t in seg if t.kind not in ("ws", "comment")]
            if idx == seq_pos:
                spans = self._seq_call_spans(seg, "nextval")
                if len(spans) != 1:
                    return None
                w, close, _ = spans[0]
                residue = [
                    t
                    for k, t in enumerate(seg)
                    if t.kind not in ("ws", "comment")
                    and not (w <= k <= close)
                ]
                # strip optional trailing "AS alias"
                if (
                    len(residue) >= 2
                    and residue[-2].is_kw("AS")
                    and residue[-1].kind in ("word", "bident", "qident")
                ):
                    residue = residue[:-2]
                for t in residue:
                    if t.kind in ("number", "string", "op"):
                        continue
                    if t.kind == "word" and (
                        t.text.lower() in self._SEQ_ITEM_CONST_WORDS
                        or re.fullmatch(
                            r"\d+(\.\d+)?([eE][+-]?\d+)?", t.text
                        )
                    ):
                        continue
                    return None
                outer_items.append(text)
                continue
            if len(scode) == 1 and scode[0].kind == "op" and scode[0].text == "*":
                outer_items.append("*")
                mat_items.append(text)
                continue
            if (
                len(scode) >= 3
                and scode[-2].is_kw("AS")
                and scode[-1].kind in ("word", "bident", "qident")
            ):
                outer_items.append(_bt(unquote_name(scode[-1])))
                mat_items.append(text)
                continue
            # bare (dotted) column ref
            if len(scode) % 2 == 1 and all(
                (
                    t.kind in ("word", "bident", "qident")
                    if k % 2 == 0
                    else (t.kind == "op" and t.text == ".")
                )
                for k, t in enumerate(scode)
            ):
                outer_items.append(_bt(unquote_name(scode[-1])))
                mat_items.append(text)
                continue
            if allow_rename:
                # positional INSERT: output names are irrelevant, so
                # any expression item auto-aliases into the scan
                mat_items.append(f"({text}) AS __seq_c{idx}")
                outer_items.append(f"__seq_c{idx}")
                continue
            return None
        if ordinal_idxs:
            # renumber bare GROUP/ORDER ordinals for the dropped
            # sequence item; anything not a BARE list element (a number
            # inside an expression) keeps the conservative bail
            repl: Dict[int, str] = {}
            code_set = {k for k, _ in code_tokens(toks)}
            ordered = sorted(code_set)
            for k in ordinal_idxs:
                pos = ordered.index(k)
                prev_t = toks[ordered[pos - 1]] if pos > 0 else None
                next_t = (
                    toks[ordered[pos + 1]] if pos + 1 < len(ordered) else None
                )
                prev_ok = prev_t is not None and (
                    prev_t.is_kw("BY")
                    or (prev_t.kind == "op" and prev_t.text == ",")
                )
                next_ok = next_t is None or (
                    next_t.kind == "op" and next_t.text == ","
                ) or next_t.is_kw(
                    "ASC", "DESC", "NULLS", "LIMIT", "OFFSET", "HAVING",
                    "ORDER", "GROUP", "QUALIFY",
                )
                if not (prev_ok and next_ok):
                    return None
                val = int(toks[k].text)
                if val == seq_pos + 1:
                    return None  # references the sequence item itself
                if val > seq_pos + 1:
                    repl[k] = str(val - 1)
            if repl:
                toks = [
                    Token(t.kind, repl[k]) if k in repl else t
                    for k, t in enumerate(toks)
                ]
        if not mat_items:
            mat_items = ["1 AS __seq_one"]
        tail = "".join(t.text for t in toks[from_idx:])
        mat_sql = "SELECT " + ", ".join(mat_items) + " " + tail
        self._seq_mat_counter += 1
        view = f"__seq_mat_{self._seq_mat_counter}"
        path = os.path.join(
            self.store.warehouse_dir, "__seq_mat", f"m{self._seq_mat_counter}"
        )
        try:
            mat_df = self.spark.sql(translate(mat_sql))
            mat_df.write.mode("overwrite").parquet(path)
            # pass the known schema: skips the driver-side parquet
            # schema-inference job on the read-back (~0.15 s per
            # sequence statement, r13-opt)
            self.spark.read.schema(mat_df.schema).parquet(
                path
            ).createOrReplaceTempView(view)
        except Exception:  # noqa: BLE001 — any failure keeps the fallback
            return None
        outer = "SELECT " + ", ".join(outer_items) + f" FROM {_bt(view)}"
        return outer, view

    def _replace_nextval_once(self, sql: str, repl: str) -> str:
        """Replace the first token-shaped ``nextval('...')`` call with
        ``repl`` (string literals containing the pattern untouched)."""
        tokens = tokenize(sql)
        spans = self._seq_call_spans(tokens, "nextval")
        if not spans:
            return sql
        w, close, _ = spans[0]
        return (
            "".join(t.text for t in tokens[:w])
            + repl
            + "".join(t.text for t in tokens[close + 1:])
        )

    def _inline_currval(self, sql: str) -> str:
        """Inline every token-shaped ``currval('s')`` call with the
        sequence's current value (DuckDB errors when never advanced)."""
        tokens = tokenize(sql)
        spans = self._seq_call_spans(tokens, "currval")
        if not spans:
            return sql
        out: List[str] = []
        pos = 0
        for w, close, lit in spans:
            out.append("".join(t.text for t in tokens[pos:w]))
            if lit is None:
                raise UserException(
                    "currval: only a literal sequence name is supported"
                )
            name = lit.strip('`"').lower()
            seq = self._sequences.get(name)
            if seq is None:
                raise UserException(
                    f"Catalog Error: Sequence with name {name} "
                    "does not exist!"
                )
            if not seq["used"]:
                raise UserException(
                    "currval: sequence is not yet defined in this session"
                )
            out.append(f"CAST({seq['curr']} AS BIGINT)")
            pos = close + 1
        out.append("".join(t.text for t in tokens[pos:]))
        return "".join(out)

    def _create_sequence(self, sql: str) -> None:
        m = re.match(
            r"(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?(?:TEMP\w*\s+)?SEQUENCE\s+"
            r"(IF\s+NOT\s+EXISTS\s+)?([\w`\"\.]+)\s*(.*?);?\s*$",
            sql,
        )
        if not m:
            raise UserException(f"Unsupported CREATE SEQUENCE: {sql[:80]}")
        replace, if_not_exists = bool(m.group(1)), bool(m.group(2))
        name = m.group(3).strip('`"').lower()
        rest = m.group(4) or ""
        if name in self._sequences:
            if if_not_exists:
                return
            if not replace:
                raise UserException(
                    f'Sequence "{name}" already exists (use OR REPLACE)'
                )
        def num(pat, default):
            mm = re.search(pat, rest, re.I)
            return int(mm.group(1)) if mm else default

        inc = num(r"\bINCREMENT\s+(?:BY\s+)?(-?\d+)", 1)
        if inc == 0:
            raise UserException("CREATE SEQUENCE: increment cannot be 0")
        # DuckDB defaults: ascending 1..huge starting 1; descending
        # -huge..-1 starting -1
        minv = num(r"\bMINVALUE\s+(-?\d+)",
                   1 if inc > 0 else -(2 ** 62))
        maxv = num(r"\bMAXVALUE\s+(-?\d+)",
                   2 ** 62 if inc > 0 else -1)
        start = num(r"\bSTART\s+(?:WITH\s+)?(-?\d+)",
                    minv if inc > 0 else maxv)
        cycle = bool(re.search(r"(?i)(?<!NO\s)\bCYCLE\b", rest))
        if re.search(r"(?i)\bNO\s+CYCLE\b", rest):
            cycle = False
        leftover = re.sub(
            r"(?is)\b(INCREMENT\s+(BY\s+)?-?\d+|MINVALUE\s+-?\d+|"
            r"MAXVALUE\s+-?\d+|START\s+(WITH\s+)?-?\d+|NO\s+MINVALUE|"
            r"NO\s+MAXVALUE|NO\s+CYCLE|CYCLE)\b", "", rest,
        ).strip()
        if leftover:
            raise UserException(
                f"Unsupported CREATE SEQUENCE options: {leftover[:60]}"
            )
        self._sequences[name] = {
            "next": start, "curr": None, "inc": inc, "minv": minv,
            "maxv": maxv, "cycle": cycle, "used": False,
        }

    _FILE_READ_FNS = {
        "read_csv", "read_csv_auto", "read_json", "read_json_auto",
        "read_ndjson", "read_ndjson_auto",
    }

    def _bind_file_reads(self, sql: str) -> str:
        """DuckDB file-reading table functions over literal paths
        (reference: user scripts read staged ``in/files`` data with
        ``read_csv_auto(...)`` etc. through the same cursor as any
        query). Each call is bound to a deterministic temp view on the
        live session (``spark.read.csv/json`` — header + schema
        inference approximate DuckDB's sniffer) and the call text is
        replaced by the view name. Supported named options: header,
        delim/sep, all_varchar, format='newline_delimited'|'array'
        (json), compression/sample_size/ignore_errors are accepted and
        ignored; anything else raises (loud, no silent divergence).
        ``read_parquet`` stays in the dialect layer (direct
        ``parquet.`path``` scan needs no options)."""
        import hashlib

        tokens = tokenize(sql)
        out: List[Token] = []
        i = 0
        n = len(tokens)
        changed = False
        while i < n:
            tok = tokens[i]
            nxt = i + 1
            while nxt < n and tokens[nxt].kind in ("ws", "comment"):
                nxt += 1
            if (
                tok.kind == "word"
                and tok.text.lower() in self._FILE_READ_FNS
                and nxt < n
                and tokens[nxt].kind == "op"
                and tokens[nxt].text == "("
            ):
                close = _matching_paren(tokens, nxt)
                args = [
                    [t for t in arg if t.kind not in ("ws", "comment")]
                    for arg in _split_top_level_args(tokens, nxt, close)
                ]
                view = self._register_file_read(
                    tok.text.lower(), args, hashlib
                )
                out.append(Token("word", view))
                i = close + 1
                changed = True
                continue
            out.append(tok)
            i += 1
        return "".join(t.text for t in out) if changed else sql

    def _register_file_read(self, fn: str, args, hashlib) -> str:
        if not args or not args[0] or args[0][0].kind != "string":
            raise UserException(
                f"{fn}: only a literal path argument is supported"
            )
        path = args[0][0].text[1:-1].replace("''", "'")
        opts: Dict[str, str] = {}
        for arg in args[1:]:
            # named argument: name = value | name := value
            if (
                len(arg) >= 3
                and arg[0].kind == "word"
                and arg[1].kind == "op"
                and arg[1].text in ("=", ":=")
            ) or (
                len(arg) >= 4
                and arg[0].kind == "word"
                and arg[1].kind == "op" and arg[1].text == ":"
                and arg[2].kind == "op" and arg[2].text == "="
            ):
                name = arg[0].text.lower()
                val = "".join(
                    t.text for t in (arg[2:] if arg[1].text in ("=", ":=")
                                     else arg[3:])
                ).strip().strip("'")
                opts[name] = val
            else:
                raise UserException(
                    f"{fn}: unsupported argument form "
                    f"{''.join(t.text for t in arg)!r}"
                )
        ignored = {"compression", "sample_size", "ignore_errors",
                   "auto_detect", "filename", "union_by_name"}
        known = {"header", "delim", "sep", "all_varchar", "format"}
        unknown = set(opts) - known - ignored
        if unknown:
            raise UserException(
                f"{fn}: unsupported options {sorted(unknown)} "
                "(supported: header, delim/sep, all_varchar, format)"
            )
        key = f"{fn}|{path}|{sorted(opts.items())}"
        view = "__file_read_" + hashlib.md5(key.encode()).hexdigest()[:10]
        if view in self._file_read_views:
            return view
        if fn.startswith("read_csv"):
            header = opts.get("header", "true").lower() != "false"
            reader = (
                self.spark.read.option("header", header)
                .option("inferSchema", opts.get("all_varchar", "").lower()
                        not in ("true", "1"))
                .option("sep", opts.get("delim", opts.get("sep", ",")))
            )
            df = reader.csv(path)
        else:
            reader = self.spark.read
            if opts.get("format") == "array":
                reader = reader.option("multiLine", True)
            df = reader.json(path)
        df.createOrReplaceTempView(view)
        self._file_read_views.add(view)
        self._path_read_views.setdefault(
            os.path.abspath(path), set()
        ).add(view)
        return view

    def _create_macro(self, st: ParsedStatement) -> None:
        """``CREATE [OR REPLACE] MACRO name(params) AS expr`` — DuckDB
        scalar macros, kept as (params, body-token) templates and
        inlined into later statements at the call site (Spark SQL
        temporary functions can't be defined from SQL text without a
        JVM class, so expansion-at-use is the faithful equivalent;
        DuckDB macros are also inlined by its binder). Macros defined
        in one script are visible to subsequent statements; table
        macros and default parameters are not supported."""
        parsed = _parse_macro(st.sql)
        if parsed is None:
            raise UserException(f"Unsupported MACRO form: {st.sql[:120]}")
        name, params, body = parsed
        self._macros[name.lower()] = (params, body)

    def _expand_macros(self, sql: str, depth: int = 0) -> str:
        """Inline every known-macro call; recurses for macros calling
        macros (depth-capped)."""
        if depth > 5:
            raise UserException("Macro expansion too deep (cycle?)")
        tokens = tokenize(sql)
        out: List[Token] = []
        changed = False
        i = 0
        n = len(tokens)
        while i < n:
            tok = tokens[i]
            if (
                tok.kind == "word"
                and tok.text.lower() in self._macros
            ):
                j = i + 1
                while j < n and tokens[j].kind in ("ws", "comment"):
                    j += 1
                if j < n and tokens[j].kind == "op" and tokens[j].text == "(":
                    close = _matching_paren(tokens, j)
                    params, body = self._macros[tok.text.lower()]
                    args = [
                        a.strip()
                        for a in _split_csv_tokens(tokens[j + 1: close])
                    ]
                    if len(args) == len(params):
                        sub = {p.lower(): a for p, a in zip(params, args)}
                        out.append(Token("op", "("))
                        for bt in tokenize(body):
                            if bt.kind == "word" and bt.text.lower() in sub:
                                out.append(
                                    Token("word", f"({sub[bt.text.lower()]})")
                                )
                            else:
                                out.append(bt)
                        out.append(Token("op", ")"))
                        changed = True
                        i = close + 1
                        continue
            out.append(tok)
            i += 1
        expanded = "".join(t.text for t in out)
        return self._expand_macros(expanded, depth + 1) if changed else expanded

    def _table_columns(self, name: str) -> Optional[List[str]]:
        """Schema lookup for COLUMNS() expansion; None when unknown."""
        try:
            return self.spark.table(_bt(name)).columns
        except Exception:  # noqa: BLE001 — unknown table: leave unexpanded
            return None

    def _resolve_query_columns(self, sql: str) -> Optional[List[str]]:
        """Column names of a DuckDB-dialect query for UNION BY NAME
        alignment — lazy analysis only, no job runs."""
        try:
            return self.spark.sql(translate(sql)).columns
        except Exception:  # noqa: BLE001 — unresolvable: leave unexpanded
            return None

    # -- public entry -----------------------------------------------------
    def execute_query(self, query: Query) -> None:
        """Run one script (possibly multiple statements, sequentially),
        inside a named Spark job group so batch failure can cancel it."""
        sc = self.spark.sparkContext
        group = (
            f"{self._parent_job_group}/{query.name}"
            if self._parent_job_group
            else query.name
        )
        sc.setJobGroup(group, query.sql[:120], interruptOnCancel=True)
        sc.setLocalProperty("spark.scheduler.pool", query.block_name)
        try:
            for st in query.statements:
                self._execute_statement(st)
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    # -- routing ----------------------------------------------------------
    def _statement_type_hints(self, st: ParsedStatement):
        shadowed: set = set()
        hints = statement_type_hints(
            self.spark,
            st.sql,
            st.dependencies,
            self._time_columns,
            self._hint_schema_cache,
            shadowed_out=shadowed,
        )
        return hints, shadowed

    def _execute_statement(self, st: ParsedStatement) -> None:
        try:
            hints, shadowed = self._statement_type_hints(st)
            with column_type_hints(hints, shadowed), scan_stability_scope(
                self.store.scan_registry
            ):
                self._execute_statement_hinted(st)
        finally:
            # any non-SELECT statement may have changed the schemas it
            # touched (CTAS/INSERT/ALTER/DROP/COPY re-register views)
            if st.statement_type != StatementType.SELECT:
                for name in set(st.outputs) | set(st.dependencies):
                    self._hint_schema_cache.pop(name.lower(), None)

    def _execute_statement_hinted(self, st: ParsedStatement) -> None:
        upper = st.sql.upper()
        if "MACRO" in upper:
            head = st.sql.lstrip().split(None, 1)
            first = head[0].upper() if head else ""
            if first == "CREATE" and re.search(r"\bMACRO\b", upper):
                self._create_macro(st)
                return
            if first == "DROP" and re.search(r"\bMACRO\b", upper):
                name = st.sql.split()[-1].rstrip(";").strip('`"').lower()
                self._macros.pop(name, None)
                return
        if self._macros:
            expanded = self._expand_macros(st.sql)
            if expanded != st.sql:
                st = dataclasses.replace(st, sql=expanded)
        if "columns" in st.sql.lower():
            # schema-aware COLUMNS() expansion: upstream tables exist by
            # the time the statement runs, so the live session resolves
            # the projection the schema-free translator can't
            expanded = expand_columns_macro(st.sql, self._table_columns)
            if expanded != st.sql:
                st = dataclasses.replace(st, sql=expanded)
        if "replace" in st.sql.lower() and "*" in st.sql:
            # schema-aware star-REPLACE expansion preserving DuckDB's
            # column order (dialect fallback appends replaced cols)
            expanded = self._expand_star_replace(st.sql)
            if expanded != st.sql:
                st = dataclasses.replace(st, sql=expanded)
        if "union" in st.sql.lower():
            # schema-aware UNION BY NAME expansion (same live-session
            # resolution as COLUMNS(); the translator is schema-free)
            expanded = expand_union_by_name(st.sql, self._resolve_query_columns)
            if expanded != st.sql:
                st = dataclasses.replace(st, sql=expanded)
        if "read_" in st.sql.lower():
            # file-reading table functions (read_csv/read_json...):
            # bind each literal-path call to a temp view on the live
            # session, then substitute the view name
            expanded = self._bind_file_reads(st.sql)
            if expanded != st.sql:
                st = dataclasses.replace(st, sql=expanded)
        if "pivot" in st.sql.lower():
            expanded = self._expand_dynamic_pivot(st.sql)
            if expanded != st.sql:
                st = dataclasses.replace(st, sql=expanded)
        low = st.sql.lower()
        if "sequence" in low or "nextval" in low or "currval" in low:
            if self._sequence_step(st):
                return
        if re.match(r"(?is)\s*(CREATE|DROP)\s+TYPE\b", st.sql):
            self._type_ddl(st.sql)
            return
        if self._enum_columns:
            # ordinals BEFORE casts: the positional rewrite needs the
            # 'lit'::ename form intact (the cast pass lowers it to a
            # validating CASE expression)
            expanded = self._bind_enum_ordinals(st.sql, st.dependencies)
            if expanded != st.sql:
                st = dataclasses.replace(st, sql=expanded)
        if self._enum_types:
            expanded = self._bind_enum_casts(st.sql)
            if expanded != st.sql:
                st = dataclasses.replace(st, sql=expanded)
        stype = st.statement_type

        if stype == StatementType.CREATE_VIEW:
            if re.search(r"(?i)\bIF\s+NOT\s+EXISTS\b", st.sql):
                name = next(iter(st.outputs), None)
                try:
                    self.spark.table(_bt(name))
                    return  # exists: no-op, not a replace
                except Exception:  # noqa: BLE001 — create below
                    pass
            self._create_view(st)
        elif stype == StatementType.CREATE_TABLE:
            self._create_table(st)
        elif stype == StatementType.INSERT:
            self._insert(st)
        elif stype == StatementType.UPDATE:
            self._update(st)
        elif stype == StatementType.DELETE:
            self._delete(st)
        elif stype == StatementType.DROP:
            drop = _parse_drop(st.sql)
            if drop is None:
                raise UserException(f"Unsupported DROP form: {st.sql[:100]}")
            self._drop(*drop)
        elif stype == StatementType.ALTER:
            self._alter(st)
        elif stype == StatementType.MERGE:
            self._merge(st)
        else:
            first = st.sql.lstrip().split(None, 1)
            head = first[0].upper().rstrip(";") if first else ""
            if head == "COPY":
                self._copy(st)
                return
            if head == "TRUNCATE":
                # TRUNCATE [TABLE] t = DELETE FROM t (empty rewrite)
                rest = first[1].strip().rstrip(";") if len(first) > 1 else ""
                parts = rest.split()
                if parts and parts[0].upper() == "TABLE":
                    parts = parts[1:]
                if not parts:
                    raise UserException(f"TRUNCATE without table: {st.sql[:80]}")
                tname = parts[0].strip('`"')
                self.store.rewrite(
                    tname, self.spark.table(_bt(tname)).limit(0)
                )
                return
            if head == "SUMMARIZE":
                # DuckDB profiling statement; result registered as the
                # summarize view so scripts can SELECT from it
                rest = first[1].strip().rstrip(";") if len(first) > 1 else ""
                if rest:
                    self._summarize(rest).createOrReplaceTempView(
                        "summarize"
                    )
                return
            if head == "DESCRIBE":
                # DuckDB schema statement; result registered as the
                # describe view so scripts can SELECT from it
                rest = first[1].strip().rstrip(";") if len(first) > 1 else ""
                if rest:
                    self._describe(rest).createOrReplaceTempView(
                        "describe"
                    )
                return
            if head == "SHOW":
                # DuckDB: SHOW TABLES lists relations (single `name`
                # column); SHOW <t> is DESCRIBE <t>
                rest = first[1].strip().rstrip(";") if len(first) > 1 else ""
                if rest.upper() == "TABLES":
                    names = sorted(
                        t.name for t in self.spark.catalog.listTables()
                    )
                    self.spark.createDataFrame(
                        [(n,) for n in names], "name string"
                    ).createOrReplaceTempView("show_tables")
                elif rest:
                    self._describe(rest).createOrReplaceTempView(
                        "describe"
                    )
                return
            if head in ("PRAGMA", "CHECKPOINT", "VACUUM", "ANALYZE"):
                # DuckDB engine-maintenance/resource statements: no
                # Spark equivalent at statement level (session sizing
                # comes from session.py); scripts keep running
                LOG.warning(
                    "Ignoring DuckDB engine statement (no-op here): %s",
                    st.sql[:80],
                )
                return
            if head == "SET":
                # DuckDB SET configures the engine (memory_limit,
                # threads, TimeZone...). Try Spark's own SET (harmless
                # for spark.* keys); ignore unknown engine knobs.
                try:
                    self.spark.sql(st.sql)
                except Exception:  # noqa: BLE001
                    LOG.warning(
                        "Ignoring engine SET (no Spark equivalent): %s",
                        st.sql[:80],
                    )
                return
            df = self.spark.sql(translate(st.sql))
            if df.columns:
                # execute fully, discard rows — distributed, no driver collect
                df.write.format("noop").mode("overwrite").save()

    def _merge(self, st: ParsedStatement) -> None:
        """``MERGE INTO target USING source ON cond WHEN MATCHED [AND c]
        THEN UPDATE SET ...|DELETE WHEN NOT MATCHED [AND c] THEN INSERT
        ...`` (DuckDB 1.4+). Spark plan: one (target x source) join
        evaluates every clause condition and SET expression, a LEFT join
        stitches the winners back onto the row-id-tagged target
        (first-matching clause wins, rows chosen by a DELETE clause drop
        out), and a LEFT ANTI join computes the INSERT rows — then one
        copy-on-write rewrite. A target row matching multiple source
        rows raises, per the SQL standard (checked inside the plan with
        a window count, no extra pass). ``WHEN NOT MATCHED BY SOURCE
        THEN UPDATE|DELETE`` applies to target rows without a match,
        evaluated in the stitch phase over target columns."""
        from pyspark.sql import functions as F

        parsed = _parse_merge(st.sql)
        if parsed is None:
            raise UserException(f"Unsupported MERGE form: {st.sql[:140]}")
        name = parsed["target"]
        if name not in self.store.tables:
            raise UserException(f"MERGE INTO unknown table '{name}'")
        current = self.spark.table(_bt(name))
        fields = current.schema.fields
        t_alias = parsed["target_alias"] or name
        src = translate(parsed["source"])
        on = translate(parsed["on"])
        join_cl = [
            c for c in parsed["clauses"]
            if c["kind"] in ("update", "delete") and not c.get("by_source")
        ]
        bs_cl = [c for c in parsed["clauses"] if c.get("by_source")]
        inserts = [c for c in parsed["clauses"] if c["kind"] == "insert"]

        tagged_view = f"__mrg_{uuid.uuid4().hex[:10]}"
        tagged = current.withColumn("__rid", F.monotonically_increasing_id())
        tagged.persist()
        tagged.createOrReplaceTempView(tagged_view)
        try:
            # the stitch frame carries the statement's target alias, so
            # BY SOURCE conditions/SET expressions (target-column scope,
            # possibly alias-qualified) resolve directly
            kept = self.spark.table(_bt(tagged_view)).alias(t_alias)

            def tcol(fname: str) -> F.Column:
                return F.col(f"{t_alias}.{_bt(fname)}")

            if join_cl or bs_cl:
                sel = [
                    f"{_bt(t_alias)}.__rid AS __rid",
                    f"count(*) OVER (PARTITION BY {_bt(t_alias)}.__rid) AS __nm",
                ]
                for ci, cl in enumerate(join_cl):
                    cond = translate(cl["cond"]) if cl["cond"] else "true"
                    sel.append(f"({cond}) AS __c{ci}")
                    for j, (_, expr) in enumerate(cl.get("sets", [])):
                        sel.append(f"({translate(expr)}) AS __s{ci}_{j}")
                matches = self.spark.sql(
                    f"SELECT {', '.join(sel)} "
                    f"FROM {_bt(tagged_view)} AS {_bt(t_alias)} JOIN {src} ON {on}"
                )
                if not join_cl:
                    # only matched-ness is needed; dedupe so multi-match
                    # rows aren't duplicated by the stitch join
                    matches = matches.select("__rid").distinct()
                joined = kept.join(matches.alias("__m"), on="__rid", how="left")
                if join_cl:
                    joined = joined.filter(
                        F.when(
                            F.col("__m.__nm") > 1,
                            F.expr(
                                "raise_error('MERGE: a target row matched "
                                "multiple source rows') IS NULL"
                            ),
                        ).otherwise(F.lit(True))
                    )
                # first applicable clause per row, separately for the
                # matched (join) and unmatched (BY SOURCE) populations
                clause_idx = F.lit(None).cast("int")
                for ci in reversed(range(len(join_cl))):
                    clause_idx = F.when(
                        F.col("__m.__rid").isNotNull() & F.col(f"__m.__c{ci}"),
                        F.lit(ci),
                    ).otherwise(clause_idx)
                bs_idx = F.lit(None).cast("int")
                for ci in reversed(range(len(bs_cl))):
                    cond = (
                        F.expr(translate(bs_cl[ci]["cond"]))
                        if bs_cl[ci]["cond"]
                        else F.lit(True)
                    )
                    bs_idx = F.when(
                        F.col("__m.__rid").isNull() & cond, F.lit(ci)
                    ).otherwise(bs_idx)
                joined = joined.withColumn("__clause", clause_idx).withColumn(
                    "__bs", bs_idx
                )
                for ci, cl in enumerate(join_cl):
                    if cl["kind"] == "delete":
                        joined = joined.filter(
                            F.col("__clause").isNull() | (F.col("__clause") != ci)
                        )
                for ci, cl in enumerate(bs_cl):
                    if cl["kind"] == "delete":
                        joined = joined.filter(
                            F.col("__bs").isNull() | (F.col("__bs") != ci)
                        )
                cols = []
                for fld in fields:
                    value = tcol(fld.name)
                    for ci, cl in enumerate(join_cl):
                        if cl["kind"] != "update":
                            continue
                        set_map = {
                            c.lower(): j for j, (c, _) in enumerate(cl["sets"])
                        }
                        j = set_map.get(fld.name.lower())
                        if j is not None:
                            value = F.when(
                                F.col("__clause") == ci,
                                F.col(f"__m.__s{ci}_{j}").cast(fld.dataType),
                            ).otherwise(value)
                    for ci, cl in enumerate(bs_cl):
                        if cl["kind"] != "update":
                            continue
                        set_map = {
                            c.lower(): (c, e)
                            for c, e in cl["sets"]
                        }
                        hit = set_map.get(fld.name.lower())
                        if hit is not None:
                            value = F.when(
                                F.col("__bs") == ci,
                                F.expr(translate(hit[1])).cast(fld.dataType),
                            ).otherwise(value)
                    cols.append(value.alias(fld.name))
                result = joined.select(*cols)
            else:
                result = kept.select(
                    *[tcol(f.name).alias(f.name) for f in fields]
                )

            earlier_conds: List[str] = []
            for cl in inserts:
                # first-match-wins across NOT MATCHED clauses: exclude
                # rows already taken by an earlier clause's condition
                preds = [f"NOT ({c})" for c in earlier_conds]
                if cl["cond"]:
                    this = translate(cl["cond"])
                    preds.append(f"({this})")
                    earlier_conds.append(this)
                else:
                    earlier_conds.append("true")
                cond = f" WHERE {' AND '.join(preds)}" if preds else ""
                proj = _merge_insert_projection(cl, fields)
                ins = self.spark.sql(
                    f"SELECT {proj} FROM {src} LEFT ANTI JOIN "
                    f"{_bt(tagged_view)} AS {_bt(t_alias)} ON {on}{cond}"
                )
                result = result.unionAll(ins)
            self.store.rewrite(name, result)
        finally:
            self.spark.catalog.dropTempView(tagged_view)
            tagged.unpersist()

    def _copy(self, st: ParsedStatement) -> None:
        """User-script ``COPY <table|(query)> TO 'path' [(options)]``
        (the reference executes these verbatim in DuckDB). CSV (HEADER /
        DELIMITER / FORCE_QUOTE *) and PARQUET formats; DuckDB writes
        ONE file, so the write coalesces to a single part streamed into
        the target path — the component-level export path
        (sinks/table_export) stays the scale route for sliced output."""
        import glob
        import shutil
        import tempfile

        parsed = _parse_copy(st.sql)
        if parsed is None:
            raise UserException(f"Unsupported COPY form: {st.sql[:120]}")
        source, path, opts = parsed
        if source.lstrip().startswith("("):
            df = self.spark.sql(translate(source.strip()[1:-1]))
        else:
            df = self.spark.table(_bt(source))
        fmt = opts.get("format")
        if fmt is None:
            fmt = "parquet" if path.lower().endswith(".parquet") else "csv"
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = tempfile.mkdtemp(prefix="cdts-copy-")
        try:
            if fmt == "parquet":
                df.coalesce(1).write.mode("overwrite").parquet(tmp)
                parts = sorted(glob.glob(os.path.join(tmp, "part-*.parquet")))
            else:
                writer = df.coalesce(1).write.mode("overwrite").options(
                    header=opts.get("header", True),
                    sep=opts.get("delimiter", ","),
                    quoteAll=opts.get("force_quote_all", False),
                    nullValue="",
                    emptyValue='""',
                )
                writer.csv(tmp)
                parts = sorted(glob.glob(os.path.join(tmp, "part-*.csv")))
            if not parts:
                raise UserException(f"COPY to {path} produced no data file")
            shutil.move(parts[0], path)
            # a later read_csv/read_json on this path must not reuse
            # ANY stale cached view of it — every option-set variant
            # re-registers on next use (see _register_file_read)
            for v in self._path_read_views.get(os.path.abspath(path), ()):
                self._file_read_views.discard(v)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def _alter(self, st: ParsedStatement) -> None:
        """ALTER TABLE (DuckDB supports it on its working database;
        reference scripts use it for light schema evolution):

        - ``ADD [COLUMN] [IF NOT EXISTS] c type [DEFAULT expr]``
        - ``DROP [COLUMN] [IF EXISTS] c``
        - ``RENAME [COLUMN] a TO b``
        - ``RENAME TO new_name``
        - ``ALTER [COLUMN] c [SET DATA] TYPE type``

        Column changes are copy-on-write rewrites (a new Parquet version
        with the projected schema). RENAME TO is metadata-only. At lake
        scale a format with schema evolution (Delta/Iceberg) would make
        the column ops metadata-only too; plain Parquet versioning keeps
        the engine dependency-free."""
        parsed = _parse_alter(st.sql)
        if parsed is None:
            raise UserException(f"Unsupported ALTER form: {st.sql[:120]}")
        name, if_exists, action, args = parsed
        if name not in self.store.tables:
            if if_exists:
                return
            raise UserException(f"ALTER TABLE: unknown table '{name}'")
        from pyspark.sql import functions as F

        if action == "rename_table":
            self.store.rename_table(name, args["to"])
            for reg in (
                self.primary_keys,
                self.not_null,
                self.checks,
                self._enum_columns,
            ):
                v = reg.pop(name.lower(), None)
                if v:
                    reg[args["to"].lower()] = v
            return
        current = self.spark.table(_bt(name))
        have = {c.lower() for c in current.columns}
        if action == "add_column":
            col, type_text, default = args["col"], args["type"], args["default"]
            if col.lower() in have:
                if args["if_not_exists"]:
                    return
                raise UserException(f"ALTER TABLE: column '{col}' exists")
            value = F.expr(
                translate(f"CAST(({default or 'NULL'}) AS {type_text})")
            )
            new_df = current.withColumn(col, value)
        elif action == "drop_column":
            col = args["col"]
            if col.lower() not in have:
                if args["if_exists"]:
                    return
                raise UserException(f"ALTER TABLE: unknown column '{col}'")
            cl, key = col.lower(), name.lower()
            # DuckDB refuses to drop a PK/UNIQUE-constrained column; a
            # CHECK that references it is dropped along with the
            # column, and NOT NULL/enum metadata follows the column out
            if cl in (k.lower() for k in self.primary_keys.get(key, [])):
                raise UserException(
                    f'Catalog Error: Cannot drop column "{col}" because '
                    "there is a UNIQUE constraint that depends on it"
                )
            if key in self.not_null:
                self.not_null[key] = [
                    c for c in self.not_null[key] if c.lower() != cl
                ]
            if key in self.checks:
                self.checks[key] = [
                    e for e in self.checks[key]
                    if not any(
                        t.kind in ("word", "bident", "qident")
                        and t.text.strip('`"').lower() == cl
                        for t in tokenize(e)
                    )
                ]
            self._enum_columns.get(key, {}).pop(cl, None)
            new_df = current.drop(col)
        elif action == "rename_column":
            col, to = args["col"], args["to"]
            if col.lower() not in have:
                raise UserException(f"ALTER TABLE: unknown column '{col}'")
            cl, key = col.lower(), name.lower()
            # constraints follow the renamed column, like DuckDB
            if key in self.primary_keys:
                self.primary_keys[key] = [
                    to.lower() if k.lower() == cl else k
                    for k in self.primary_keys[key]
                ]
            if key in self.not_null:
                self.not_null[key] = [
                    to.lower() if c.lower() == cl else c
                    for c in self.not_null[key]
                ]
            if key in self.checks:
                self.checks[key] = [
                    "".join(
                        _bt(to)
                        if t.kind in ("word", "bident", "qident")
                        and t.text.strip('`"').lower() == cl
                        else t.text
                        for t in tokenize(e)
                    )
                    for e in self.checks[key]
                ]
            emap = self._enum_columns.get(key)
            if emap and cl in emap:
                emap[to.lower()] = emap.pop(cl)
            new_df = current.withColumnRenamed(col, to)
        elif action == "set_type":
            col, type_text = args["col"], args["type"]
            if col.lower() not in have:
                raise UserException(f"ALTER TABLE: unknown column '{col}'")
            new_df = current.withColumn(
                col,
                F.expr(translate(f"CAST({_bt(col)} AS {type_text})")),
            )
        else:  # pragma: no cover
            raise UserException(f"Unsupported ALTER action: {action}")
        self.store.rewrite(name, new_df)

    def _drop(self, name: str, if_exists: bool) -> None:
        """DROP TABLE/VIEW: both kinds live as temp views here (store
        tables are parquet-backed temp views), so Spark's strict
        DROP TABLE-vs-VIEW distinction must not leak through."""
        existed = self.spark.catalog.dropTempView(name)
        mark_scan_unstable(name)  # forget any stability registration
        self.store.tables.pop(name, None)
        self.view_order_by.pop(name, None)
        self.primary_keys.pop(name.lower(), None)
        self.not_null.pop(name.lower(), None)
        self.checks.pop(name.lower(), None)
        self._enum_columns.pop(name.lower(), None)
        self._time_columns.pop(name.lower(), None)
        if not existed and not if_exists:
            raise UserException(f"DROP: table or view '{name}' does not exist")

    # -- CREATE -----------------------------------------------------------
    def _create_view(self, st: ParsedStatement) -> None:
        name = next(iter(st.outputs), None)
        if name is None:
            raise UserException(f"Cannot determine view name in: {st.sql[:100]}")
        body = _body_after_as(st.sql)
        self.spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW {_bt(name)} AS {translate(body)}"
        )
        # a view whose body may shuffle is not scan-order stable: a
        # later POSITIONAL JOIN referencing it by name must take the
        # rebalance-CTE numbering, not the two-scan wrap
        if _scan_stable_primary("(" + body + ")"):
            mark_scan_stable(name)
        else:
            mark_scan_unstable(name)
        order_clause = _terminal_order_by(body)
        if order_clause:
            self.view_order_by[name] = order_clause
        # views inherit TIME/enum column bindings like CTAS outputs
        time_cols, enum_cols = self._body_special_columns(
            body, st.dependencies
        )
        if time_cols:
            self._time_columns[name.lower()] = time_cols
        else:
            self._time_columns.pop(name.lower(), None)
        if enum_cols:
            self._enum_columns[name.lower()] = enum_cols
        else:
            self._enum_columns.pop(name.lower(), None)

    def _target_table(self, st: ParsedStatement):
        """The statement's target TABLE from its outputs set, skipping
        bookkeeping outputs the parser adds for scheduling (the
        `returning` view, sequence names advanced by nextval)."""
        cands = [
            o for o in st.outputs
            if o != "returning" and o not in self._sequences
        ]
        if cands:
            return cands[0]
        return next(iter(st.outputs), None)

    def _body_special_columns(self, body: str, deps):
        """(time_cols, enum_cols) a CTAS/VIEW output inherits from its
        body's TOP-LEVEL select items (VERDICT r9 item 3: TIME values
        previously lost TIME-ness through a CTAS hop and landed on the
        next epoch day; ENUM ordinal semantics likewise dropped).
        Handled shapes: bare/dotted column refs (inherit the 'time'
        pseudo-hint / the dep's enum binding), ``expr AS name`` items
        whose expression is statically TIME-typed (plain time-column
        renames, ``CAST(x AS TIME)`` — via the r10 alias typer), and a
        lone ``*`` over a SINGLE dependency (whole-set inheritance).
        Set operations, multi-dep stars, and computed TIME arithmetic
        items conservatively inherit nothing (COVERAGE.md)."""
        time_cols: set = set()
        enum_cols: Dict[str, str] = {}
        code = [
            t for t in tokenize(body) if t.kind not in ("ws", "comment")
        ]
        n = len(code)
        depth = 0
        sel = None
        for i, t in enumerate(code):
            if t.kind == "op" and t.text in ("(", "["):
                depth += 1
            elif t.kind == "op" and t.text in (")", "]"):
                depth -= 1
            elif depth == 0 and t.kind == "word" and t.upper == "SELECT":
                sel = i
                break
        if sel is None:
            return time_cols, enum_cols
        # depth-0 set operation: analyze every branch and inherit a
        # column only where ALL branches agree POSITIONALLY (DuckDB:
        # enum UNION same-enum stays enum, enum UNION varchar decays
        # to VARCHAR; names come from the first branch). UNION BY NAME
        # matches by name, not position — inherit nothing there (r12).
        depth = 0
        ops: List[int] = []
        for k, t in enumerate(code[sel + 1 :], start=sel + 1):
            if t.kind == "op" and t.text in ("(", "["):
                depth += 1
            elif t.kind == "op" and t.text in (")", "]"):
                depth -= 1
            elif depth == 0 and t.kind == "word" and t.upper in (
                "UNION",
                "EXCEPT",
                "INTERSECT",
            ):
                ops.append(k)
        if ops:
            return self._setop_special_columns(code, sel, ops, deps)
        lo = sel + 1
        if lo < n and code[lo].kind == "word" and code[lo].upper in (
            "DISTINCT",
            "ALL",
        ):
            lo += 1
        hi = lo
        depth = 0
        while hi < n:
            t = code[hi]
            if t.kind == "op" and t.text in ("(", "["):
                depth += 1
            elif t.kind == "op" and t.text in (")", "]"):
                depth -= 1
            elif depth == 0 and t.kind == "word" and t.upper == "FROM":
                break
            hi += 1
        # split items on depth-0 commas
        items: List[List[Token]] = [[]]
        depth = 0
        for t in code[lo:hi]:
            if t.kind == "op" and t.text in ("(", "["):
                depth += 1
            elif t.kind == "op" and t.text in (")", "]"):
                depth -= 1
            if depth == 0 and t.kind == "op" and t.text == ",":
                items.append([])
            else:
                items[-1].append(t)
        dep_enums: Dict[str, str] = {}
        dep_enum_conflict: set = set()
        dep_times: set = set()
        for dep in deps:
            for c, e in self._enum_columns.get(dep.lower(), {}).items():
                if e not in self._enum_types:
                    continue  # type dropped since binding
                if dep_enums.get(c, e) != e:
                    dep_enum_conflict.add(c)
                dep_enums[c] = e
            dep_times |= self._time_columns.get(dep.lower(), set())
        for item in items:
            if not item:
                continue
            if (
                len(item) == 1
                and item[0].kind == "op"
                and item[0].text == "*"
            ):
                only = [d for d in deps if d != "returning"]
                if len(only) == 1:
                    key = only[0].lower()
                    time_cols |= self._time_columns.get(key, set())
                    enum_cols.update(
                        (c, e)
                        for c, e in self._enum_columns.get(key, {}).items()
                        if e in self._enum_types
                    )
                continue
            name = None
            expr = item
            if (
                len(item) >= 3
                and item[-2].kind == "word"
                and item[-2].upper == "AS"
                and item[-1].kind in ("word", "bident", "qident")
            ):
                name = unquote_name(item[-1]).lower()
                expr = item[:-2]
            elif item[-1].kind in ("word", "bident", "qident") and all(
                t.kind in ("word", "bident", "qident")
                or (t.kind == "op" and t.text == ".")
                for t in item
            ):
                name = unquote_name(item[-1]).lower()
            if name is None:
                continue
            hint = _alias_expr_hint(list(expr))
            if hint == "time":
                time_cols.add(name)
            # enum inheritance: a plain (dotted) ref to an unambiguous
            # dependency enum column
            ecode = [t for t in expr if t.kind not in ("ws", "comment")]
            if ecode and all(
                t.kind in ("word", "bident", "qident")
                or (t.kind == "op" and t.text == ".")
                for t in ecode
            ):
                src = unquote_name(ecode[-1]).lower()
                if src in dep_enums and src not in dep_enum_conflict:
                    enum_cols[name] = dep_enums[src]
        return time_cols, enum_cols

    def _dep_special_maps(self, deps):
        """(enum bindings, ambiguous-name set, time columns) merged
        over the statement's dependencies."""
        dep_enums: Dict[str, str] = {}
        conflict: set = set()
        dep_times: set = set()
        for dep in deps:
            for c, e in self._enum_columns.get(dep.lower(), {}).items():
                if e not in self._enum_types:
                    continue
                if dep_enums.get(c, e) != e:
                    conflict.add(c)
                dep_enums[c] = e
            dep_times |= self._time_columns.get(dep.lower(), set())
        return dep_enums, conflict, dep_times

    def _setop_special_columns(self, code, sel, ops, deps):
        """Positional (time, enum) inheritance across set-operation
        branches (r12): names come from the FIRST branch; a column
        stays enum only when EVERY branch's item at that position is a
        ref to the SAME enum (DuckDB decays enum-vs-varchar and
        enum-vs-other-enum unions to VARCHAR). Star items, UNION BY
        NAME (name-matched, not positional), unparenthesized shapes,
        and item-count mismatches conservatively inherit nothing."""
        n = len(code)
        starts = [sel]
        for op in ops:
            j = op + 1
            while j < n and code[j].kind == "word" and code[j].upper in (
                "ALL",
                "DISTINCT",
            ):
                j += 1
            if j < n and code[j].kind == "word" and code[j].upper == "BY":
                return set(), {}  # UNION BY NAME
            if not (
                j < n and code[j].kind == "word" and code[j].upper == "SELECT"
            ):
                return set(), {}
            starts.append(j)
        dep_enums, conflict, _ = self._dep_special_maps(deps)
        anns = []
        for bi, st_i in enumerate(starts):
            end = ops[bi] if bi < len(ops) else n
            ann = self._branch_item_annotations(
                code, st_i, end, dep_enums, conflict
            )
            if ann is None:
                return set(), {}
            anns.append(ann)
        if len({len(a) for a in anns}) != 1:
            return set(), {}
        time_cols: set = set()
        enum_cols: Dict[str, str] = {}
        for i, (name, _e, _t) in enumerate(anns[0]):
            if not name:
                continue
            enums = {a[i][1] for a in anns}
            if len(enums) == 1 and None not in enums:
                enum_cols[name] = enums.pop()
            if all(a[i][2] for a in anns):
                time_cols.add(name)
        return time_cols, enum_cols

    def _branch_item_annotations(self, code, sel, end, dep_enums, conflict):
        """``[(output_name | None, enum | None, is_time)]`` for one
        SELECT branch's top-level items; None when a star item makes
        positions unknowable."""
        n = end
        lo = sel + 1
        if lo < n and code[lo].kind == "word" and code[lo].upper in (
            "DISTINCT",
            "ALL",
        ):
            lo += 1
        hi = lo
        depth = 0
        while hi < n:
            t = code[hi]
            if t.kind == "op" and t.text in ("(", "["):
                depth += 1
            elif t.kind == "op" and t.text in (")", "]"):
                depth -= 1
            elif depth == 0 and t.kind == "word" and t.upper == "FROM":
                break
            hi += 1
        items: List[List[Token]] = [[]]
        depth = 0
        for t in code[lo:hi]:
            if t.kind == "op" and t.text in ("(", "["):
                depth += 1
            elif t.kind == "op" and t.text in (")", "]"):
                depth -= 1
            if depth == 0 and t.kind == "op" and t.text == ",":
                items.append([])
            else:
                items[-1].append(t)
        out = []
        for item in items:
            if not item:
                continue
            if any(t.kind == "op" and t.text == "*" for t in item):
                return None  # star: positions unknowable
            name = None
            expr = item
            if (
                len(item) >= 3
                and item[-2].kind == "word"
                and item[-2].upper == "AS"
                and item[-1].kind in ("word", "bident", "qident")
            ):
                name = unquote_name(item[-1]).lower()
                expr = item[:-2]
            elif item[-1].kind in ("word", "bident", "qident") and all(
                t.kind in ("word", "bident", "qident")
                or (t.kind == "op" and t.text == ".")
                for t in item
            ):
                name = unquote_name(item[-1]).lower()
            enum = None
            is_time = _alias_expr_hint(list(expr)) == "time"
            ecode = [t for t in expr if t.kind not in ("ws", "comment")]
            if ecode and all(
                t.kind in ("word", "bident", "qident")
                or (t.kind == "op" and t.text == ".")
                for t in ecode
            ):
                src = unquote_name(ecode[-1]).lower()
                if src in dep_enums and src not in conflict:
                    enum = dep_enums[src]
            out.append((name, enum, is_time))
        return out

    def _create_table(self, st: ParsedStatement) -> None:
        name = self._target_table(st)
        if name is None:
            raise UserException(f"Cannot determine table name in: {st.sql[:100]}")
        if re.search(r"(?i)\bIF\s+NOT\s+EXISTS\b", st.sql):
            try:
                self.spark.table(_bt(name))
                return  # exists: IF NOT EXISTS is a no-op, not a replace
            except Exception:  # noqa: BLE001 — not there: create below
                pass
        body = _body_after_as(st.sql, allow_missing=True)
        if body is None:
            # bare DDL: CREATE TABLE t (col type, ...) -> empty table
            enum_cols: Dict[str, str] = {}
            time_cols: List[str] = []
            schema_sql = _ddl_column_schema(
                st.sql, self._enum_types, enum_cols, time_cols
            )
            if time_cols:
                self._time_columns[name.lower()] = {
                    c.lower() for c in time_cols
                }
            else:
                self._time_columns.pop(name.lower(), None)
            df = self.spark.sql(f"SELECT {schema_sql} LIMIT 0")
            keys = _ddl_primary_key(st.sql)
            if keys:
                self.primary_keys[name.lower()] = keys
            else:
                self.primary_keys.pop(name.lower(), None)
            nn = _ddl_not_null(st.sql)
            if nn:
                self.not_null[name.lower()] = nn
            else:
                self.not_null.pop(name.lower(), None)
            chk = _ddl_checks(st.sql)
            for col, ename in enum_cols.items():
                vals = ", ".join(
                    "'" + v.replace("'", "''") + "'"
                    for v in self._enum_types[ename]
                )
                chk.append(f"{_bt(col)} IS NULL OR {_bt(col)} IN ({vals})")
            if chk:
                self.checks[name.lower()] = chk
            else:
                self.checks.pop(name.lower(), None)
            if enum_cols:
                self._enum_columns[name.lower()] = {
                    c.lower(): e for c, e in enum_cols.items()
                }
            else:
                self._enum_columns.pop(name.lower(), None)
        else:
            df = self.spark.sql(translate(body))
            self.primary_keys.pop(name.lower(), None)
            self.not_null.pop(name.lower(), None)
            self.checks.pop(name.lower(), None)
            # persist TIME pseudo-hints and enum bindings the CTAS
            # output inherits from its defining statement, so TIME
            # values wrap at midnight and enum ordinals survive a
            # materialization hop (VERDICT r9 item 3)
            time_cols, enum_cols = self._body_special_columns(
                body, st.dependencies
            )
            if time_cols:
                self._time_columns[name.lower()] = time_cols
            else:
                self._time_columns.pop(name.lower(), None)
            if enum_cols:
                self._enum_columns[name.lower()] = enum_cols
                # inherited enum columns stay ENUM-typed in DuckDB:
                # later INSERTs must validate against the value set
                chk = []
                for col, ename in enum_cols.items():
                    vals = ", ".join(
                        "'" + v.replace("'", "''") + "'"
                        for v in self._enum_types[ename]
                    )
                    chk.append(
                        f"{_bt(col)} IS NULL OR {_bt(col)} IN ({vals})"
                    )
                self.checks[name.lower()] = chk
            else:
                self._enum_columns.pop(name.lower(), None)
        self.store.create_table(
            name,
            df,
            order_by=_terminal_order_by(body or ""),
            empty=body is None,  # bare DDL creates a known-row-free table
        )

    # -- DML --------------------------------------------------------------
    def _insert(self, st: ParsedStatement) -> None:
        name = self._target_table(st)
        sql = st.sql
        sql, returning = _split_returning(sql)
        # DuckDB constraint-aware forms: OR REPLACE / OR IGNORE
        # modifiers and a trailing ON CONFLICT upsert clause
        mode: object = None
        m = re.match(r"\s*INSERT\s+OR\s+(REPLACE|IGNORE)\s+", sql, re.IGNORECASE)
        if m:
            mode = m.group(1).lower()
            sql = re.sub(
                r"(?i)^\s*INSERT\s+OR\s+(REPLACE|IGNORE)\s+",
                "INSERT ", sql, count=1,
            )
        sql, conflict = _split_on_conflict(sql)
        if conflict is not None:
            mode = (
                "ignore"
                if conflict["action"] == "nothing"
                else ("update", conflict["sets"], conflict["where"])
            )
        tail = _insert_source_sql(sql)
        df = self.spark.sql(translate(tail))
        cols = _insert_column_list(sql)
        if cols is None and _insert_is_by_name(sql):
            # DuckDB `INSERT INTO t BY NAME select`: the SELECT's output
            # names pick the target columns; missing ones get NULL
            cols = df.columns
        keys = (
            (conflict or {}).get("cols")
            or self.primary_keys.get((name or "").lower())
        )
        if mode is not None and not keys:
            # exactly DuckDB's binder complaint
            raise UserException(
                "There are no UNIQUE/PRIMARY KEY Indexes that refer to "
                f"this table, ON CONFLICT is a no-op for '{name}'"
            )
        nn = self.not_null.get((name or "").lower())
        chk = self.checks.get((name or "").lower())
        if returning is not None and (mode is not None or keys or nn or chk):
            raise UserException(
                "INSERT ... RETURNING is not supported together with "
                "constraint handling (ON CONFLICT / keyed tables)"
            )
        if mode is None and not keys and not nn and not chk:
            if returning is not None:
                # DuckDB returns the inserted rows (target-aligned);
                # registered as the `returning` view, like SUMMARIZE.
                # Materialize BEFORE the append: the source plan may
                # read the table being inserted into (INSERT INTO t
                # SELECT ... FROM t RETURNING *) or be
                # non-deterministic, and a lazy view would re-execute
                # it against the post-append state
                target = self.spark.table(_bt(name)).limit(0)
                aligned = (
                    _align_by_name(df, target, cols)
                    if cols is not None
                    else _align_by_position(df, target)
                )
                aligned = aligned.localCheckpoint(eager=True)
                self.store.insert_into(name, aligned)
                aligned.createOrReplaceTempView("__returning_src")
                self.spark.sql(translate(
                    f"SELECT {returning} FROM __returning_src"
                )).createOrReplaceTempView("returning")
                return
            self.store.insert_into(name, df, columns=cols)
            return
        self._keyed_insert(name, df, cols, keys, mode, nn, chk)

    def _keyed_insert(
        self, name, df, cols, keys, mode, nn=None, chk=None
    ) -> None:
        """INSERT into a PRIMARY KEY/UNIQUE table with DuckDB
        constraint semantics: duplicate keys (within the batch, or vs
        the table for plain INSERT) raise; OR REPLACE copy-on-writes
        matching rows out; OR IGNORE / ON CONFLICT DO NOTHING anti-joins
        the incoming side; ON CONFLICT DO UPDATE lowers onto the MERGE
        executor with the source aliased ``excluded``. All paths are
        joins on the key columns — no collects beyond a fused 1-row
        constraint probe.

        All constraint probes run as ONE aggregate pass over the
        incoming frame: every NOT NULL flag, every CHECK violation,
        the within-batch duplicate count, and (for plain keyed INSERT)
        a table-clash flag via a LEFT join against the current keys —
        instead of 3+N separate LIMIT-1 jobs each re-scanning the
        frame. Violations re-run a targeted probe only on the failure
        path to recover the offending key text."""
        from pyspark.sql import functions as F

        if name not in self.store.tables:
            raise UserException(f"INSERT INTO unknown table '{name}'")
        current = self.spark.table(_bt(name))
        aligned = (
            _align_by_name(df, current, cols)
            if cols
            else _align_by_position(df, current)
        )
        by_lower = {f.name.lower(): f.name for f in current.schema.fields}
        key_cols = None
        if keys:
            try:
                key_cols = [by_lower[k] for k in keys]
            except KeyError as exc:
                raise UserException(
                    f"ON CONFLICT key column {exc} not in table '{name}'"
                )
        nn_actual = [
            by_lower[c] for c in (nn or []) if by_lower.get(c) is not None
        ]
        chk = list(chk or [])
        # a known-row-free target (bare-DDL create, nothing inserted
        # yet) cannot clash: the probe skips its join against current
        # keys — one shuffle less on the pipeline-opening INSERT
        probe_clash = (
            bool(key_cols)
            and mode is None
            and not self.store.tables[name].empty
        )
        aggs: List = []
        for i, c in enumerate(nn_actual):
            aggs.append(
                F.expr(
                    f"max(CASE WHEN {_bt(c)} IS NULL THEN 1 ELSE 0 END)"
                ).alias(f"__nn_{i}")
            )
        for i, e in enumerate(chk):
            # DuckDB: a CHECK violates only when the predicate is FALSE
            # (NULL passes)
            aggs.append(
                F.expr(
                    f"max(CASE WHEN ({translate(e)}) = FALSE "
                    f"THEN 1 ELSE 0 END)"
                ).alias(f"__ck_{i}")
            )
        if key_cols:
            # struct-wrapped so NULL key fields still count as rows
            # (matching the groupBy-equality the error path reports)
            ks = ", ".join(_bt(k) for k in key_cols)
            aggs.append(
                F.expr(
                    f"count(*) - count(DISTINCT struct({ks}))"
                ).alias("__dup")
            )
        if probe_clash:
            aggs.append(F.max(F.col("__clash")).alias("__clash"))
        # NOTE (r13-opt, measured): persisting ``aligned`` across the
        # probe collect and the mutation (each executes the source plan
        # once) was tried and reverted — the cache materialization cost
        # exceeded the saved re-scan at bench scale and added a job per
        # statement. The re-execution is a second scan of the same
        # pruned parquet source; the COW model re-scans ``current``
        # every statement anyway, so it is proportionally minor.
        if aggs:
            probe_df = aligned
            if probe_clash:
                marker = current.select(
                    *[F.col(_bt(k)) for k in key_cols]
                ).withColumn("__clash", F.lit(1))
                probe_df = aligned.join(marker, on=key_cols, how="left")
            flags = probe_df.agg(*aggs).collect()[0]
            for i, c in enumerate(nn_actual):
                if flags[f"__nn_{i}"]:
                    raise UserException(
                        f'Constraint Error: NOT NULL constraint failed: '
                        f'{name}.{c}'
                    )
            for i, e in enumerate(chk):
                if flags[f"__ck_{i}"]:
                    raise UserException(
                        f"Constraint Error: CHECK constraint failed on "
                        f"table {name}: ({e})"
                    )
            if key_cols and flags["__dup"]:
                dup = (
                    aligned.groupBy(*[_bt(k) for k in key_cols])
                    .count()
                    .where("count > 1")
                    .limit(1)
                    .collect()
                )
                key_txt = ", ".join(str(v) for v in list(dup[0])[:-1])
                raise UserException(
                    "Constraint Error: PRIMARY KEY or UNIQUE constraint "
                    f'violated: duplicate key "{key_txt}"'
                )
            if probe_clash and flags["__clash"]:
                raise UserException(
                    "Constraint Error: Duplicate key violates primary "
                    f"key constraint on '{name}'"
                )
        if not keys:
            self.store.insert_into(name, aligned)
            return
        if mode is None:
            self.store.insert_into(name, aligned)
            return
        if mode == "replace":
            survivors = current.join(
                aligned.select(*key_cols), on=key_cols, how="left_anti"
            )
            self.store.rewrite(name, survivors.unionByName(aligned))
            return
        if mode == "ignore":
            fresh = aligned.join(
                current.select(*key_cols), on=key_cols, how="left_anti"
            )
            self.store.rewrite(name, current.unionByName(fresh))
            return
        # ON CONFLICT DO UPDATE SET ... [WHERE c] -> MERGE (source
        # aliased `excluded`, matching DuckDB's pseudo-table)
        _, sets, where = mode
        src_view = f"__ins_src_{uuid.uuid4().hex[:10]}"
        aligned.createOrReplaceTempView(src_view)
        try:
            on = " AND ".join(
                f"{_bt(name)}.{_bt(k)} = excluded.{_bt(k)}"
                for k in key_cols
            )
            guard = f"AND ({where}) " if where else ""
            merge_sql = (
                f"MERGE INTO {_bt(name)} USING {src_view} AS excluded "
                f"ON {on} WHEN MATCHED {guard}THEN UPDATE SET {sets} "
                f"WHEN NOT MATCHED THEN INSERT *"
            )
            self._merge(
                ParsedStatement(
                    sql=merge_sql,
                    statement_type=StatementType.OTHER,
                    outputs={name},
                )
            )
        finally:
            self.spark.catalog.dropTempView(src_view)

    def _validate_update_constraints(
        self, name: str, new_df: DataFrame, assigned_lower: set
    ) -> None:
        """Re-validate constraints an UPDATE can break — DuckDB
        enforces NOT NULL / CHECK / PRIMARY KEY on update, and skipping
        it lets an UPDATE silently write a NULL into a NOT NULL column.
        Cost-proportional: only constraints whose columns are actually
        assigned are probed, in ONE fused aggregate pass over the
        post-update frame (the COW rewrite scans it anyway)."""
        from pyspark.sql import functions as F

        key = (name or "").lower()
        by_lower = {f.name.lower(): f.name for f in new_df.schema.fields}
        nn_hit = [
            by_lower[c]
            for c in (self.not_null.get(key) or [])
            if c in assigned_lower and c in by_lower
        ]
        chk_hit = [
            e
            for e in (self.checks.get(key) or [])
            if any(
                t.kind in ("word", "bident", "qident")
                and t.text.strip('`"').lower() in assigned_lower
                for t in tokenize(e)
            )
        ]
        keys = self.primary_keys.get(key)
        key_hit = bool(keys) and any(k in assigned_lower for k in keys)
        if not nn_hit and not chk_hit and not key_hit:
            return
        aggs: List = []
        for i, c in enumerate(nn_hit):
            aggs.append(
                F.expr(
                    f"max(CASE WHEN {_bt(c)} IS NULL THEN 1 ELSE 0 END)"
                ).alias(f"__nn_{i}")
            )
        for i, e in enumerate(chk_hit):
            aggs.append(
                F.expr(
                    f"max(CASE WHEN ({translate(e)}) = FALSE "
                    f"THEN 1 ELSE 0 END)"
                ).alias(f"__ck_{i}")
            )
        if key_hit:
            ks = ", ".join(_bt(by_lower[k]) for k in keys if k in by_lower)
            aggs.append(
                F.expr(
                    f"count(*) - count(DISTINCT struct({ks}))"
                ).alias("__dup")
            )
        flags = new_df.agg(*aggs).collect()[0]
        for i, c in enumerate(nn_hit):
            if flags[f"__nn_{i}"]:
                raise UserException(
                    f'Constraint Error: NOT NULL constraint failed: '
                    f'{name}.{c}'
                )
        for i, e in enumerate(chk_hit):
            if flags[f"__ck_{i}"]:
                raise UserException(
                    f"Constraint Error: CHECK constraint failed on "
                    f"table {name}: ({e})"
                )
        if key_hit and flags["__dup"]:
            raise UserException(
                "Constraint Error: PRIMARY KEY or UNIQUE constraint "
                f"violated by UPDATE on '{name}'"
            )

    def _update(self, st: ParsedStatement) -> None:
        name = self._target_table(st)
        sql, returning = _split_returning(st.sql)
        assignments, from_text, where = _parse_update(sql)
        if from_text is not None:
            if returning is not None:
                raise UserException(
                    "UPDATE ... FROM with RETURNING is not supported"
                )
            self._update_from(name, assignments, from_text, where)
            return
        current = self.spark.table(_bt(name))
        cols = []
        pred = f"coalesce(({translate(where)}), false)" if where else "true"
        assigned = {c.lower(): e for c, e in assignments}
        # a stale column (e.g. renamed away) must fail like DuckDB's
        # binder, not silently no-op (round-6 mutation-fuzz find)
        field_names = {f.name.lower() for f in current.schema.fields}
        for col, _ in assignments:
            if col.lower() not in field_names:
                raise UserException(
                    f"UPDATE: referenced update column '{col}' not found "
                    f"in table '{name}'"
                )
        for fld in current.schema.fields:
            expr = assigned.get(fld.name.lower())
            if expr is not None:
                cols.append(
                    f"CASE WHEN {pred} THEN CAST(({translate(expr)}) AS "
                    f"{fld.dataType.simpleString()}) ELSE {_bt(fld.name)} END AS {_bt(fld.name)}"
                )
            else:
                cols.append(_bt(fld.name))
        new_df = self.spark.table(_bt(name)).selectExpr(*cols)
        self._validate_update_constraints(
            name, new_df, set(assigned)
        )
        if returning is not None:
            # post-update values of the matched rows (pre-image filter,
            # assignments applied — the captured plan reads the
            # pre-rewrite COW version)
            ret_cols = []
            for fld in current.schema.fields:
                expr = assigned.get(fld.name.lower())
                if expr is not None:
                    ret_cols.append(
                        f"CAST(({translate(expr)}) AS "
                        f"{fld.dataType.simpleString()}) AS {_bt(fld.name)}"
                    )
                else:
                    ret_cols.append(_bt(fld.name))
            matched = current.filter(pred).selectExpr(*ret_cols)
            matched.createOrReplaceTempView("__returning_src")
            ret_df = self.spark.sql(translate(
                f"SELECT {returning} FROM __returning_src"
            ))
        self.store.rewrite(name, new_df)
        if returning is not None:
            ret_df.createOrReplaceTempView("returning")

    def _update_from(
        self,
        name: str,
        assignments: List[tuple[str, str]],
        from_text: str,
        where: Optional[str],
    ) -> None:
        """``UPDATE t SET c = expr FROM src [WHERE pred]`` — Postgres/
        DuckDB join-update (reference scripts use it for dimension
        backfills). Spark plan: tag the target with a synthetic row id,
        evaluate the assignment expressions in the (target x FROM
        sources) join that WHERE filters, keep one match per row id
        (multi-match picks an arbitrary winner, matching
        Postgres/DuckDB), then stitch the matches back with a LEFT
        join — one shuffle on the row id, copy-on-write rewrite like
        every other mutation."""
        from pyspark.sql import functions as F

        current = self.spark.table(_bt(name))
        fields = {f.name.lower(): f for f in current.schema.fields}
        for col, _ in assignments:
            if col.lower() not in fields:
                raise UserException(f"UPDATE: unknown column '{col}'")
        tagged_view = f"__upd_{uuid.uuid4().hex[:10]}"
        # persist: the tagged subtree appears twice in the final plan
        # (match probe + stitch base); materializing it once pins the
        # synthetic row ids so both sides agree
        tagged = current.withColumn("__rid", F.monotonically_increasing_id())
        tagged.persist()
        tagged.createOrReplaceTempView(tagged_view)
        try:
            set_exprs = ", ".join(
                f"({translate(expr)}) AS __set_{i}"
                for i, (_, expr) in enumerate(assignments)
            )
            pred = f"WHERE {translate(where)}" if where else ""
            matches = self.spark.sql(
                f"SELECT * FROM ("
                f"SELECT {_bt(name)}.__rid AS __rid, {set_exprs}, "
                f"row_number() OVER (PARTITION BY {_bt(name)}.__rid "
                f"ORDER BY 1) AS __mn "
                f"FROM {_bt(tagged_view)} AS {_bt(name)}, {translate(from_text)} "
                f"{pred}) WHERE __mn = 1"
            ).drop("__mn")
            joined = self.spark.table(_bt(tagged_view)).alias("t").join(
                matches.alias("m"), on="__rid", how="left"
            )
            cols = []
            set_idx = {c.lower(): i for i, (c, _) in enumerate(assignments)}
            for fld in current.schema.fields:
                i = set_idx.get(fld.name.lower())
                if i is not None:
                    cols.append(
                        F.when(
                            F.col("m.__rid").isNotNull(),
                            F.col(f"m.__set_{i}").cast(fld.dataType),
                        )
                        .otherwise(F.col(f"t.{_bt(fld.name)}"))
                        .alias(fld.name)
                    )
                else:
                    cols.append(F.col(f"t.{_bt(fld.name)}"))
            result = joined.select(*cols)
            self._validate_update_constraints(
                name, result, {c.lower() for c, _ in assignments}
            )
            self.store.rewrite(name, result)
        finally:
            self.spark.catalog.dropTempView(tagged_view)
            tagged.unpersist()

    def _delete(self, st: ParsedStatement) -> None:
        name = self._target_table(st)
        sql, returning = _split_returning(st.sql)
        using, where = _delete_using_where(sql)
        if returning is not None and using is not None:
            raise UserException(
                "DELETE ... USING with RETURNING is not supported"
            )
        if using is not None:
            # DELETE FROM t USING src WHERE pred: delete target rows
            # with ANY qualifying source match — an anti-join (NOT
            # EXISTS), the plan Catalyst turns into a hash LeftAnti
            pred = translate(where) if where else "true"
            new_df = self.spark.sql(
                f"SELECT {_bt(name)}.* FROM {_bt(name)} "
                f"WHERE NOT EXISTS (SELECT 1 FROM {translate(using)} "
                f"WHERE coalesce(({pred}), false))"
            )
        elif where is None:
            new_df = self.spark.table(_bt(name)).limit(0)
        else:
            new_df = self.spark.table(_bt(name)).filter(
                f"NOT coalesce(({translate(where)}), false)"
            )
        if returning is not None:
            # the deleted rows (pre-image, captured before the rewrite)
            current = self.spark.table(_bt(name))
            deleted = (
                current
                if where is None
                else current.filter(
                    f"coalesce(({translate(where)}), false)"
                )
            )
            deleted.createOrReplaceTempView("__returning_src")
            ret_df = self.spark.sql(translate(
                f"SELECT {returning} FROM __returning_src"
            ))
        self.store.rewrite(name, new_df)
        if returning is not None:
            ret_df.createOrReplaceTempView("returning")


# -- statement-text helpers (tokenizer-based, string/comment safe) --------

def _code(sql: str) -> List[tuple[int, Token]]:
    return list(code_tokens(tokenize(sql)))


def _body_after_as(sql: str, allow_missing: bool = False) -> Optional[str]:
    """Text after the top-level AS in CREATE ... AS <select>.
    Handles DuckDB's `CREATE TABLE t AS FROM x` and parenthesized bodies."""
    tokens = tokenize(sql)
    depth = 0
    seen_create_name = False
    for i, tok in enumerate(tokens):
        if tok.kind == "op" and tok.text == "(":
            depth += 1
        elif tok.kind == "op" and tok.text == ")":
            depth -= 1
        elif depth == 0 and tok.is_kw("AS"):
            body = "".join(t.text for t in tokens[i + 1:]).strip()
            if body.startswith("(") and body.endswith(")"):
                inner = body[1:-1].strip()
                if inner.upper().startswith(("SELECT", "WITH", "FROM", "VALUES")):
                    body = inner
            # DuckDB `AS FROM t [SELECT ...]` bodies are handled by the
            # dialect layer's FROM-first rewrite at translate() time
            return body
    if allow_missing:
        return None
    raise UserException(f"Missing AS <select> body in: {sql[:100]}")


def _terminal_order_by(body: str) -> Optional[str]:
    """Top-level 'ORDER BY ...' clause text (without LIMIT tail), if any."""
    tokens = tokenize(body)
    depth = 0
    order_start = None
    limit_start = None
    code = list(code_tokens(tokens))
    for pos, (idx, tok) in enumerate(code):
        if tok.kind == "op" and tok.text == "(":
            depth += 1
        elif tok.kind == "op" and tok.text == ")":
            depth -= 1
        elif depth == 0 and tok.is_kw("ORDER"):
            if pos + 1 < len(code) and code[pos + 1][1].is_kw("BY"):
                order_start = idx
        elif depth == 0 and tok.is_kw("LIMIT") and order_start is not None:
            limit_start = idx
            break
    if order_start is None:
        return None
    end = limit_start if limit_start is not None else len(tokens)
    clause = "".join(t.text for t in tokens[order_start:end]).strip()
    # strip leading ORDER BY
    return re.sub(r"(?is)^ORDER\s+BY\s+", "", clause)


# column constraints that terminate the type text in a DDL column def
_COL_CONSTRAINT_KWS = {
    "PRIMARY", "NOT", "NULL", "DEFAULT", "UNIQUE", "REFERENCES",
    "CHECK", "COLLATE", "GENERATED",
}
# table-level constraint entries to skip entirely
_TABLE_CONSTRAINT_KWS = {"PRIMARY", "FOREIGN", "UNIQUE", "CHECK", "CONSTRAINT"}

# DuckDB type names Spark lacks -> Spark cast targets. Parameterized
# types (VARCHAR(n), DECIMAL(p,s)) pass through untouched — Spark
# accepts those forms; only the BARE names below need mapping.
_DDL_TYPE_MAP = {
    "VARCHAR": "STRING", "TEXT": "STRING", "CHAR": "STRING",
    "BPCHAR": "STRING", "JSON": "STRING", "UUID": "STRING",
    "HUGEINT": "DECIMAL(38,0)", "UHUGEINT": "DECIMAL(38,0)",
    "UBIGINT": "DECIMAL(20,0)", "UINTEGER": "BIGINT",
    "USMALLINT": "INT", "UTINYINT": "SMALLINT",
    "BLOB": "BINARY", "BYTEA": "BINARY",
    "TIMESTAMPTZ": "TIMESTAMP", "DOUBLE_PRECISION": "DOUBLE",
    "REAL": "FLOAT", "INT1": "TINYINT", "INT2": "SMALLINT",
    "INT4": "INT", "INT8": "BIGINT", "SIGNED": "BIGINT",
    "LOGICAL": "BOOLEAN", "BIT": "STRING",
}


def _split_top_level(tokens: List[Token]) -> List[List[Token]]:
    """Split a token run on top-level commas."""
    parts: List[List[Token]] = []
    part: List[Token] = []
    depth = 0
    for tok in tokens:
        if tok.kind == "op" and tok.text == "(":
            depth += 1
        elif tok.kind == "op" and tok.text == ")":
            depth -= 1
        if depth == 0 and tok.kind == "op" and tok.text == ",":
            parts.append(part)
            part = []
        else:
            part.append(tok)
    if part:
        parts.append(part)
    return parts


def _unquote_ident(tok: Token) -> str:
    if tok.kind == "qident":
        return tok.text[1:-1].replace('""', '"')
    if tok.kind == "bident":
        return tok.text[1:-1].replace("``", "`")
    return tok.text


def _column_list_span(sql: str) -> Optional[tuple[List[Token], int, int]]:
    """(tokens, open_idx, close_idx) of the first top-level paren group,
    provided it appears before any SELECT/WITH/VALUES/FROM keyword."""
    tokens = tokenize(sql)
    depth = 0
    for i, tok in enumerate(tokens):
        if tok.is_kw("SELECT", "WITH", "VALUES", "FROM") and depth == 0:
            return None
        if tok.kind == "op" and tok.text == "(":
            # find matching close
            d = 0
            for j in range(i, len(tokens)):
                t = tokens[j]
                if t.kind == "op" and t.text == "(":
                    d += 1
                elif t.kind == "op" and t.text == ")":
                    d -= 1
                    if d == 0:
                        return tokens, i, j
            return None
    return None


# Words that can never be an (AS-less) alias candidate when computing
# hint invalidation: clause keywords, operators-as-words, DDL/DML
# syntax. Conservative in the SAFE direction — a keyword wrongly kept
# here just keeps a name un-droppable via the bare-alias rule, and the
# statement almost certainly binds it as syntax, not as a column.
_HINT_NONALIAS_KWS = frozenset({
    "SELECT", "FROM", "WHERE", "GROUP", "BY", "HAVING", "ORDER",
    "LIMIT", "OFFSET", "QUALIFY", "WINDOW", "UNION", "EXCEPT",
    "INTERSECT", "ALL", "DISTINCT", "AS", "ON", "USING", "JOIN",
    "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "NATURAL", "ASOF",
    "POSITIONAL", "LATERAL", "OUTER", "SEMI", "ANTI", "AND", "OR",
    "NOT", "IN", "IS", "NULL", "LIKE", "ILIKE", "SIMILAR", "GLOB",
    "BETWEEN", "EXISTS", "CASE", "WHEN", "THEN", "ELSE", "END",
    "CAST", "TRY_CAST", "INTERVAL", "ASC", "DESC", "NULLS", "OVER",
    "PARTITION", "ROWS", "RANGE", "GROUPS", "PRECEDING", "FOLLOWING",
    "UNBOUNDED", "CURRENT", "FILTER", "WITHIN", "VALUES",
    "WITH", "RECURSIVE", "SAMPLE", "TABLESAMPLE", "REPEATABLE",
    "FETCH", "ONLY", "TIES", "ESCAPE", "COLLATE", "TO", "FOR",
    "IGNORE", "RESPECT", "EXCLUDE", "NO", "OTHERS", "MATERIALIZED",
    "TRUE", "FALSE", "GROUPING", "ROLLUP", "CUBE",
    "INSERT", "INTO", "UPDATE", "DELETE", "MERGE", "SET", "CREATE",
    "TABLE", "VIEW", "REPLACE", "TEMP", "TEMPORARY", "IF", "DROP",
    "ALTER", "ADD", "RENAME", "CONSTRAINT", "PRIMARY",
    "UNIQUE", "CHECK", "DEFAULT", "REFERENCES", "RETURNING",
    "CONFLICT", "DO", "NOTHING", "MATCHED",
    "PIVOT", "UNPIVOT", "COPY", "EXTRACT",
    # NOTE deliberately absent: NAME/VALUE/KEY/ROW/COLUMN/SOURCE/
    # TARGET/SETS and the interval unit words (DAY/HOUR/...). They are
    # common COLUMN names, and membership here would prevent dropping
    # a stale hint when such a name is rebound by a bare alias — the
    # unsafe direction. Their syntax positions are already guarded by
    # the PRECEDING keyword (PRIMARY KEY, CURRENT ROW, GROUPING SETS,
    # INTO NAME, NOT MATCHED BY SOURCE, INTERVAL 3 DAY...): a
    # keyword-preceded token is never an alias candidate, and at worst
    # a syntax word gets its (nonexistent) hint dropped — harmless.
})
# keywords that DO end an expression (so a bare identifier after them
# can still be an alias) — CASE ends and literals; the interval unit
# words are plain words now (absent from the non-alias set above), so
# they end expressions without needing an exemption
_HINT_EXPR_END_KWS = frozenset({"END", "NULL", "TRUE", "FALSE"})


def statement_type_hints(
    spark: SparkSession,
    sql: str,
    dependencies,
    time_columns: Optional[Dict[str, set]] = None,
    schema_cache: Optional[Dict[str, list]] = None,
    shadowed_out: Optional[set] = None,
) -> Dict[str, str]:
    """``lowercase column name -> Spark simpleString type`` for a
    statement's dependency tables (lazy catalog lookups, no jobs).
    Names typed differently across tables, or re-bound by an
    ``AS name`` alias anywhere in the statement (a type-changing
    expression must alias to keep a name), are dropped so a surviving
    hint is unambiguous. Published via ``column_type_hints`` so the
    schema-free translator can dispatch ``len(col)`` / ``col[i]`` /
    ``col || x`` by type; DDL-declared TIME columns (``time_columns``:
    table -> {col}) publish the ``time`` pseudo-hint."""
    hints: Dict[str, str] = {}
    drop: set = set()
    for dep in dependencies:
        key = dep.lower()
        fields = schema_cache.get(key) if schema_cache is not None else None
        if fields is None:
            try:
                fields = [
                    (f.name, f.dataType.simpleString())
                    for f in spark.table(_bt(dep)).schema.fields
                ]
            except Exception:  # noqa: BLE001 — unknown table: no hints
                continue
            if schema_cache is not None:
                schema_cache[key] = fields
        declared_time = (time_columns or {}).get(key, set())
        for fname, t in fields:
            col = fname.lower()
            if col in declared_time and t in (
                "timestamp", "timestamp_ntz",
            ):
                t = "time"  # DDL-declared TIME pseudo-hint
            if hints.get(col, t) != t:
                drop.add(col)
            hints[col] = t
    if hints:
        code = [t for _, t in code_tokens(tokenize(sql))]
        n = len(code)
        for idx in range(n):
            t = code[idx]
            if t.kind not in ("word", "bident", "qident"):
                continue
            if t.kind == "word" and (
                t.upper in _HINT_NONALIAS_KWS or t.text[0].isdigit()
            ):
                continue
            prev = code[idx - 1] if idx > 0 else None
            nxt = code[idx + 1] if idx + 1 < n else None
            # 'AS name' rebind (any position)
            if prev is not None and prev.is_kw("AS"):
                drop.add(unquote_name(t).lower())
                continue
            # DuckDB also allows AS-less select-item aliases
            # ('SELECT expr name'): a name preceded by something that
            # ENDS an expression and followed by an item terminator is
            # a rebind too (conservative: over-dropping only loses a
            # hint, never mis-dispatches)
            prev_ends_expr = prev is not None and (
                (prev.kind == "op" and prev.text in (")", "]"))
                or prev.kind in ("string", "bident", "qident")
                or (
                    prev.kind == "word"
                    and (
                        prev.upper not in _HINT_NONALIAS_KWS
                        or prev.upper in _HINT_EXPR_END_KWS
                    )
                )
            )
            if prev_ends_expr and (
                nxt is None
                or (nxt.kind == "op" and nxt.text == ",")
                or nxt.is_kw("FROM")
            ):
                drop.add(unquote_name(t).lower())
                continue
            # FROM-alias column lists ('FROM src t(a, b)' /
            # '(SELECT ...) AS t(a, b)') rebind every listed name
            if (
                nxt is not None
                and nxt.kind == "op"
                and nxt.text == "("
                and prev is not None
                and (
                    (prev.kind == "op" and prev.text == ")")
                    or prev.is_kw("AS")
                    or prev.kind in ("bident", "qident")
                    or (
                        prev.kind == "word"
                        and prev.upper not in _HINT_NONALIAS_KWS
                    )
                )
            ):
                cols: List[str] = []
                ok = False
                expect_ident = True
                j = idx + 2
                while j < n:
                    c = code[j]
                    if c.kind == "op" and c.text == ")":
                        ok = not expect_ident and bool(cols)
                        break
                    if (
                        expect_ident
                        and c.kind in ("word", "bident", "qident")
                        and not (
                            c.kind == "word"
                            and (
                                c.upper in _HINT_NONALIAS_KWS
                                or c.text[0].isdigit()
                            )
                        )
                    ):
                        cols.append(unquote_name(c).lower())
                        expect_ident = False
                    elif (
                        not expect_ident
                        and c.kind == "op"
                        and c.text == ","
                    ):
                        expect_ident = True
                    else:
                        break
                    j += 1
                if ok:
                    drop.update(cols)
    if shadowed_out is not None:
        # names that ARE real dependency columns but lost their hint
        # (rebound or cross-table-ambiguous): the translator's alias
        # typer must not re-derive a type for them
        shadowed_out.update(k for k in drop if k in hints)
    for k in drop:
        hints.pop(k, None)
    return hints


def _ddl_column_schema(
    sql: str, enum_types=None, enum_cols=None, time_cols=None
) -> str:
    """Column list of a bare-DDL ``CREATE TABLE t (col type, ...)`` as
    select-item text ``CAST(NULL AS type) AS name, ...`` (the reference
    passes the DDL verbatim to DuckDB; here the empty typed relation is
    materialized so a later INSERT has a schema to align against).
    Column constraints and table-level constraints are skipped. A
    column typed with a registered ENUM (``enum_types`` name -> values)
    maps to STRING and lands in ``enum_cols`` (name -> enum name) for
    the caller's insert-time CHECK."""
    span = _column_list_span(sql)
    if span is None:
        raise UserException(
            f"CREATE TABLE without AS body or column list: {sql[:100]}"
        )
    tokens, open_idx, close_idx = span
    items: List[str] = []
    for part in _split_top_level(tokens[open_idx + 1: close_idx]):
        code = [t for t in part if t.kind not in ("ws", "comment")]
        if not code:
            continue
        first = code[0]
        if first.kind == "word" and first.upper in _TABLE_CONSTRAINT_KWS:
            continue  # table-level constraint entry
        name = _unquote_ident(first)
        type_toks: List[Token] = []
        depth = 0
        for tok in code[1:]:
            if tok.kind == "op" and tok.text == "(":
                depth += 1
            elif tok.kind == "op" and tok.text == ")":
                depth -= 1
            if depth == 0 and tok.kind == "word" and tok.upper in _COL_CONSTRAINT_KWS:
                break
            type_toks.append(tok)
        if not type_toks:
            raise UserException(f"Column '{name}' has no type in: {sql[:100]}")
        type_text = " ".join(t.text for t in type_toks)
        upper = type_text.upper().replace(" ", "")
        if upper == "DOUBLEPRECISION":
            type_text = "DOUBLE"
        elif (
            enum_types
            and len(type_toks) == 1
            and type_toks[0].text.lower() in enum_types
        ):
            if enum_cols is not None:
                enum_cols[name] = type_toks[0].text.lower()
            type_text = "STRING"
        elif len(type_toks) == 1 and type_toks[0].upper == "TIME":
            # Spark has no TIME: epoch-day TIMESTAMP representation
            # (same as TIME literals); the declaration is tracked so
            # the 'time' pseudo-hint keeps 24 h wrap arithmetic
            if time_cols is not None:
                time_cols.append(name)
            type_text = "TIMESTAMP"
        elif len(type_toks) == 1 and type_toks[0].upper in _DDL_TYPE_MAP:
            type_text = _DDL_TYPE_MAP[type_toks[0].upper]
        items.append(f"CAST(NULL AS {type_text}) AS {_bt(name)}")
    if not items:
        raise UserException(f"Empty column list in: {sql[:100]}")
    return ", ".join(items)


def _ddl_primary_key(sql: str) -> Optional[List[str]]:
    """PRIMARY KEY (or, failing that, UNIQUE) columns of a bare-DDL
    ``CREATE TABLE``, lowercase: column-level ``a INT PRIMARY KEY`` and
    table-level ``PRIMARY KEY (a, b)`` / ``CONSTRAINT n PRIMARY KEY
    (...)`` forms. None when the DDL declares neither."""
    span = _column_list_span(sql)
    if span is None:
        return None
    tokens, open_idx, close_idx = span
    pk: List[str] = []
    unique: List[str] = []
    for part in _split_top_level(tokens[open_idx + 1: close_idx]):
        code = [t for t in part if t.kind not in ("ws", "comment")]
        if not code:
            continue
        first = code[0]
        uppers = [t.upper if t.kind == "word" else t.text for t in code]
        if first.kind == "word" and first.upper in _TABLE_CONSTRAINT_KWS:
            # table-level: find the parenthesized column list
            kind = None
            for k, u in enumerate(uppers):
                if u == "PRIMARY" and k + 1 < len(uppers) and uppers[k + 1] == "KEY":
                    kind = "pk"
                elif u == "UNIQUE":
                    kind = kind or "unique"
            try:
                p = next(
                    k for k, t in enumerate(code)
                    if t.kind == "op" and t.text == "("
                )
            except StopIteration:
                continue
            cols = [
                _unquote_ident(t).lower()
                for t in code[p + 1:]
                if t.kind in ("word", "bident", "qident")
            ]
            if kind == "pk" and cols:
                pk = cols
            elif kind == "unique" and cols and not unique:
                unique = cols
            continue
        # column-level constraint on this column
        name = _unquote_ident(first).lower()
        for k, u in enumerate(uppers[1:], start=1):
            if u == "PRIMARY" and k + 1 < len(uppers) and uppers[k + 1] == "KEY":
                pk = pk or [name]
            elif u == "UNIQUE":
                unique = unique or [name]
    return pk or unique or None


def _ddl_not_null(sql: str) -> List[str]:
    """Columns declared NOT NULL (or PRIMARY KEY, which implies it) in
    a bare-DDL CREATE TABLE, lowercase."""
    span = _column_list_span(sql)
    if span is None:
        return []
    tokens, open_idx, close_idx = span
    out: List[str] = []
    for part in _split_top_level(tokens[open_idx + 1: close_idx]):
        code = [t for t in part if t.kind not in ("ws", "comment")]
        if not code:
            continue
        first = code[0]
        if first.kind == "word" and first.upper in _TABLE_CONSTRAINT_KWS:
            continue
        uppers = [t.upper if t.kind == "word" else "" for t in code]
        name = _unquote_ident(first).lower()
        for k in range(1, len(uppers)):
            if uppers[k] == "NOT" and k + 1 < len(uppers) and uppers[k + 1] == "NULL":
                out.append(name)
                break
            if uppers[k] == "PRIMARY" and k + 1 < len(uppers) and uppers[k + 1] == "KEY":
                out.append(name)
                break
    pk = _ddl_primary_key(sql) or []
    for c in pk:
        if c not in out:
            out.append(c)
    return out


def _ddl_checks(sql: str) -> List[str]:
    """CHECK (...) expressions (column- and table-level) of a bare-DDL
    CREATE TABLE, as raw DuckDB-dialect expression text."""
    span = _column_list_span(sql)
    if span is None:
        return []
    tokens, open_idx, close_idx = span
    out: List[str] = []
    for part in _split_top_level(tokens[open_idx + 1: close_idx]):
        j = 0
        while j < len(part):
            t = part[j]
            if t.kind == "word" and t.upper == "CHECK":
                k = j + 1
                while k < len(part) and part[k].kind in ("ws", "comment"):
                    k += 1
                if k < len(part) and part[k].kind == "op" and part[k].text == "(":
                    depth = 0
                    m = k
                    while m < len(part):
                        if part[m].kind == "op" and part[m].text == "(":
                            depth += 1
                        elif part[m].kind == "op" and part[m].text == ")":
                            depth -= 1
                            if depth == 0:
                                break
                        m += 1
                    out.append(
                        "".join(x.text for x in part[k + 1: m]).strip()
                    )
                    j = m
            j += 1
    return out


def _split_on_conflict(sql: str):
    """(sql_without_clause, conflict) — conflict is None or a dict
    {cols: Optional[list], action: 'nothing'|'update', sets: str,
    where: Optional[str]} for a trailing DuckDB upsert clause
    ``ON CONFLICT [(cols)] DO NOTHING | DO UPDATE SET ... [WHERE c]``.
    """
    tokens = tokenize(sql)
    n = len(tokens)
    depth = 0
    at = None
    for i, t in enumerate(tokens):
        if t.kind == "op" and t.text == "(":
            depth += 1
        elif t.kind == "op" and t.text == ")":
            depth -= 1
        elif depth == 0 and t.is_kw("ON"):
            j = _next_code_idx(tokens, i)
            if j < n and tokens[j].is_kw("CONFLICT"):
                at = (i, j)
                break
    if at is None:
        return sql, None
    pre = "".join(t.text for t in tokens[: at[0]])
    k = _next_code_idx(tokens, at[1])
    cols = None
    if k < n and tokens[k].kind == "op" and tokens[k].text == "(":
        close = k
        d = 0
        while close < n:
            t = tokens[close]
            if t.kind == "op" and t.text == "(":
                d += 1
            elif t.kind == "op" and t.text == ")":
                d -= 1
                if d == 0:
                    break
            close += 1
        cols = [
            _unquote_ident(t).lower()
            for t in tokens[k + 1: close]
            if t.kind in ("word", "bident", "qident")
        ]
        k = _next_code_idx(tokens, close)
    if not (k < n and tokens[k].is_kw("DO")):
        raise UserException(f"Unsupported ON CONFLICT form: {sql[:120]}")
    k = _next_code_idx(tokens, k)
    if k < n and tokens[k].is_kw("NOTHING"):
        return pre, {"cols": cols, "action": "nothing", "sets": "", "where": None}
    if not (
        k < n
        and tokens[k].is_kw("UPDATE")
        and _next_code_idx(tokens, k) < n
        and tokens[_next_code_idx(tokens, k)].is_kw("SET")
    ):
        raise UserException(f"Unsupported ON CONFLICT form: {sql[:120]}")
    k = _next_code_idx(tokens, k)  # SET
    rest = tokens[k + 1:]
    # split a trailing top-level WHERE off the SET list
    d = 0
    where = None
    for i, t in enumerate(rest):
        if t.kind == "op" and t.text == "(":
            d += 1
        elif t.kind == "op" and t.text == ")":
            d -= 1
        elif d == 0 and t.is_kw("WHERE"):
            where = "".join(x.text for x in rest[i + 1:]).strip()
            rest = rest[:i]
            break
    sets = "".join(t.text for t in rest).strip()
    return pre, {"cols": cols, "action": "update", "sets": sets, "where": where}


def _split_returning(sql: str):
    """Split a trailing top-level ``RETURNING <exprs>`` off an INSERT.
    Returns (sql_without_returning, exprs_text_or_None)."""
    tokens = tokenize(sql)
    depth = 0
    for i, t in enumerate(tokens):
        if t.kind == "op" and t.text == "(":
            depth += 1
        elif t.kind == "op" and t.text == ")":
            depth -= 1
        elif depth == 0 and t.is_kw("RETURNING"):
            exprs = "".join(x.text for x in tokens[i + 1:]).strip().rstrip(";")
            head = "".join(x.text for x in tokens[:i]).rstrip()
            return head, exprs or "*"
    return sql, None


def _next_code_idx(tokens: List[Token], i: int) -> int:
    j = i + 1
    while j < len(tokens) and tokens[j].kind in ("ws", "comment"):
        j += 1
    return j


def _code_toks(sql: str) -> List[Token]:
    """Code tokens of ``sql`` (whitespace/comments stripped)."""
    return [t for _, t in code_tokens(tokenize(sql))]


def _insert_column_list(sql: str) -> Optional[List[str]]:
    """Explicit column list of ``INSERT INTO t (c1, c2) ...``, or None.
    The paren group must appear before the source keyword — ``INSERT
    INTO t VALUES (...)`` has none."""
    span = _column_list_span(sql)
    if span is None:
        return None
    tokens, open_idx, close_idx = span
    cols: List[str] = []
    for part in _split_top_level(tokens[open_idx + 1: close_idx]):
        code = [t for t in part if t.kind not in ("ws", "comment")]
        if len(code) != 1 or code[0].kind not in ("word", "qident", "bident"):
            return None  # not a plain column list
        cols.append(_unquote_ident(code[0]))
    return cols or None


def _insert_is_by_name(sql: str) -> bool:
    """True for ``INSERT INTO t BY NAME <source>``."""
    code = _code(sql)
    for pos in range(2, min(len(code) - 1, 8)):
        tok = code[pos][1]
        if tok.is_kw("SELECT", "WITH", "VALUES", "FROM"):
            return False
        if tok.is_kw("BY") and code[pos + 1][1].is_kw("NAME"):
            return True
    return False


def _insert_source_sql(sql: str) -> str:
    """SELECT/VALUES tail of an INSERT statement."""
    code = _code(sql)
    for pos, (idx, tok) in enumerate(code):
        if tok.is_kw("SELECT", "WITH", "VALUES", "FROM") and pos >= 2:
            tokens = tokenize(sql)
            tail = "".join(t.text for t in tokens[idx:]).strip()
            if tail.upper().startswith("FROM"):
                tail = "SELECT * " + tail
            if tail.upper().startswith("VALUES"):
                tail = "SELECT * FROM " + tail
            return tail
    raise UserException(f"Unsupported INSERT form: {sql[:100]}")


def _parse_update(
    sql: str,
) -> tuple[List[tuple[str, str]], Optional[str], Optional[str]]:
    """Parse `UPDATE t SET c = expr[, ...] [FROM sources] [WHERE pred]`
    into ([(col, expr)], from_text, pred)."""
    tokens = tokenize(sql)
    set_idx = from_idx = where_idx = None
    depth = 0
    for i, tok in enumerate(tokens):
        if tok.kind == "op" and tok.text == "(":
            depth += 1
        elif tok.kind == "op" and tok.text == ")":
            depth -= 1
        elif depth == 0 and tok.is_kw("SET") and set_idx is None:
            set_idx = i
        elif depth == 0 and tok.is_kw("FROM") and set_idx is not None and from_idx is None:
            from_idx = i
        elif depth == 0 and tok.is_kw("WHERE"):
            where_idx = i
            break
    if set_idx is None:
        raise UserException(f"UPDATE without SET: {sql[:100]}")
    set_end = min(
        x for x in (from_idx, where_idx, len(tokens)) if x is not None
    )
    set_text_tokens = tokens[set_idx + 1: set_end]
    assignments: List[tuple[str, str]] = []
    # split on top-level commas
    part: List[Token] = []
    depth = 0
    parts: List[List[Token]] = []
    for tok in set_text_tokens:
        if tok.kind == "op" and tok.text == "(":
            depth += 1
        elif tok.kind == "op" and tok.text == ")":
            depth -= 1
        if depth == 0 and tok.kind == "op" and tok.text == ",":
            parts.append(part)
            part = []
        else:
            part.append(tok)
    if part:
        parts.append(part)
    for ptoks in parts:
        text = "".join(t.text for t in ptoks)
        col, _, expr = text.partition("=")
        col_name = col.strip().strip('"`')
        assignments.append((col_name, expr.strip()))
    from_text = None
    if from_idx is not None:
        from_end = where_idx if where_idx is not None else len(tokens)
        from_text = "".join(t.text for t in tokens[from_idx + 1: from_end]).strip()
    where = None
    if where_idx is not None:
        where = "".join(t.text for t in tokens[where_idx + 1:]).strip()
    return assignments, from_text, where


def _parse_alter(sql: str):
    """Parse supported ALTER TABLE forms into
    ``(table, if_exists, action, args)``; None for unsupported forms."""
    code = _code(sql)
    n = len(code)
    if n < 3 or code[0][1].upper != "ALTER" or code[1][1].upper != "TABLE":
        return None
    i = 2
    if_exists = False
    if i + 1 < n and code[i][1].is_kw("IF") and code[i + 1][1].is_kw("EXISTS"):
        if_exists = True
        i += 2
    if i >= n or code[i][1].kind not in ("word", "bident", "qident"):
        return None
    name = unquote_name(code[i][1])
    i += 1
    if i >= n:
        return None
    verb = code[i][1].upper

    def _name_at(j):
        return unquote_name(code[j][1]) if j < n else None

    if verb == "RENAME":
        i += 1
        if i < n and code[i][1].is_kw("TO"):
            return name, if_exists, "rename_table", {"to": _name_at(i + 1)}
        if i < n and code[i][1].is_kw("COLUMN"):
            i += 1
        col = _name_at(i)
        if col and i + 1 < n and code[i + 1][1].is_kw("TO"):
            return name, if_exists, "rename_column", {
                "col": col, "to": _name_at(i + 2),
            }
        return None
    if verb == "ADD":
        i += 1
        if i < n and code[i][1].is_kw("COLUMN"):
            i += 1
        if_not = False
        if (
            i + 2 < n
            and code[i][1].is_kw("IF")
            and code[i + 1][1].is_kw("NOT")
            and code[i + 2][1].is_kw("EXISTS")
        ):
            if_not = True
            i += 3
        col = _name_at(i)
        if col is None or i + 1 >= n:
            return None
        # remaining text = type [DEFAULT expr]
        start = code[i + 1][0]
        tokens = tokenize(sql)
        rest = tokens[start:]
        default = None
        depth = 0
        for j, t in enumerate(rest):
            if t.kind == "op" and t.text == "(":
                depth += 1
            elif t.kind == "op" and t.text == ")":
                depth -= 1
            elif depth == 0 and t.is_kw("DEFAULT"):
                default = "".join(x.text for x in rest[j + 1:]).strip()
                rest = rest[:j]
                break
        type_text = "".join(t.text for t in rest).strip().rstrip(";").strip()
        if not type_text:
            return None
        return name, if_exists, "add_column", {
            "col": col, "type": type_text, "default": default,
            "if_not_exists": if_not,
        }
    if verb == "DROP":
        i += 1
        if i < n and code[i][1].is_kw("COLUMN"):
            i += 1
        col_if_exists = False
        if i + 1 < n and code[i][1].is_kw("IF") and code[i + 1][1].is_kw("EXISTS"):
            col_if_exists = True
            i += 2
        col = _name_at(i)
        if col is None:
            return None
        return name, if_exists, "drop_column", {
            "col": col, "if_exists": col_if_exists,
        }
    if verb == "ALTER":
        i += 1
        if i < n and code[i][1].is_kw("COLUMN"):
            i += 1
        col = _name_at(i)
        if col is None:
            return None
        i += 1
        # [SET DATA] TYPE <type>
        if i + 1 < n and code[i][1].is_kw("SET") and code[i + 1][1].is_kw("DATA"):
            i += 2
        if i >= n or not code[i][1].is_kw("TYPE"):
            return None
        if i + 1 >= n:
            return None
        start = code[i + 1][0]
        tokens = tokenize(sql)
        type_text = (
            "".join(t.text for t in tokens[start:]).strip().rstrip(";").strip()
        )
        if not type_text:
            return None
        return name, if_exists, "set_type", {"col": col, "type": type_text}
    return None


def _split_assignment_tokens(toks: List[Token]) -> List[tuple[str, str]]:
    """Split `c = expr[, ...]` token runs into [(col, expr)]."""
    parts: List[List[Token]] = []
    part: List[Token] = []
    depth = 0
    for tok in toks:
        if tok.kind == "op" and tok.text == "(":
            depth += 1
        elif tok.kind == "op" and tok.text == ")":
            depth -= 1
        if depth == 0 and tok.kind == "op" and tok.text == ",":
            parts.append(part)
            part = []
        else:
            part.append(tok)
    if part:
        parts.append(part)
    out: List[tuple[str, str]] = []
    for ptoks in parts:
        text = "".join(t.text for t in ptoks)
        col, _, expr = text.partition("=")
        out.append((col.strip().strip('"`'), expr.strip()))
    return out


def _parse_merge(sql: str):
    """Parse supported MERGE INTO forms; None for unsupported shapes.

    Returns {target, target_alias, source, on, clauses:[{kind, cond,
    sets | cols/values}]}. kind in update/delete/insert."""
    tokens = tokenize(sql)
    code = _code(sql)
    n = len(code)
    if n < 4 or code[0][1].upper != "MERGE" or code[1][1].upper != "INTO":
        return None
    i = 2
    target = unquote_name(code[i][1])
    i += 1
    target_alias = None
    if i < n and code[i][1].is_kw("AS"):
        i += 1
    if i < n and code[i][1].kind in ("word", "bident", "qident") and not code[i][
        1
    ].is_kw("USING"):
        target_alias = unquote_name(code[i][1])
        i += 1
    if i >= n or not code[i][1].is_kw("USING"):
        return None
    # spans in RAW token indices, tracked at depth 0
    using_start = code[i][0] + 1

    def _find_kw(kw: str, from_code_idx: int) -> Optional[int]:
        depth = 0
        for j in range(from_code_idx, n):
            t = code[j][1]
            if t.kind == "op" and t.text == "(":
                depth += 1
            elif t.kind == "op" and t.text == ")":
                depth -= 1
            elif depth == 0 and t.is_kw(kw):
                return j
        return None

    on_ci = _find_kw("ON", i + 1)
    if on_ci is None:
        return None
    first_when_ci = _find_kw("WHEN", on_ci + 1)
    if first_when_ci is None:
        return None
    source = "".join(
        t.text for t in tokens[using_start: code[on_ci][0]]
    ).strip()
    on = "".join(
        t.text for t in tokens[code[on_ci][0] + 1: code[first_when_ci][0]]
    ).strip()

    # WHEN-clause spans
    when_cis = []
    ci = first_when_ci
    while ci is not None:
        when_cis.append(ci)
        ci = _find_kw("WHEN", ci + 1)
    clauses = []
    for k, wci in enumerate(when_cis):
        end_ci = when_cis[k + 1] if k + 1 < len(when_cis) else n
        j = wci + 1
        negated = False
        if j < end_ci and code[j][1].is_kw("NOT"):
            negated = True
            j += 1
        if j >= end_ci or not code[j][1].is_kw("MATCHED"):
            return None
        j += 1
        by_source = False
        if j < end_ci and code[j][1].is_kw("BY"):
            if j + 1 < end_ci and code[j + 1][1].is_kw("SOURCE") and negated:
                by_source = True
                j += 2
            elif j + 1 < end_ci and code[j + 1][1].is_kw("TARGET") and negated:
                j += 2  # NOT MATCHED BY TARGET == plain NOT MATCHED
            else:
                return None
        cond = None
        if j < end_ci and code[j][1].is_kw("AND"):
            then_ci = _find_kw("THEN", j)
            if then_ci is None or then_ci >= end_ci:
                return None
            cond = "".join(
                t.text for t in tokens[code[j][0] + 1: code[then_ci][0]]
            ).strip()
            j = then_ci
        if j >= end_ci or not code[j][1].is_kw("THEN"):
            return None
        j += 1
        if j >= end_ci:
            return None
        action = code[j][1].upper
        end_raw = code[end_ci][0] if end_ci < n else len(tokens)
        if action == "DELETE":
            if negated and not by_source:
                return None
            clauses.append(
                {"kind": "delete", "cond": cond, "by_source": by_source}
            )
        elif action == "UPDATE":
            if negated and not by_source:
                return None
            j += 1
            if j >= end_ci or not code[j][1].is_kw("SET"):
                return None
            set_toks = tokens[code[j][0] + 1: end_raw]
            clauses.append(
                {
                    "kind": "update",
                    "cond": cond,
                    "sets": _split_assignment_tokens(set_toks),
                    "by_source": by_source,
                }
            )
        elif action == "INSERT":
            if not negated or by_source:
                return None
            j += 1
            cols = None
            values = None
            star = False
            if j < end_ci and code[j][1].kind == "op" and code[j][1].text == "*":
                star = True
            elif j < end_ci:
                if code[j][1].kind == "op" and code[j][1].text == "(":
                    close_raw = _matching_paren(tokens, code[j][0])
                    cols = [
                        p.strip().strip('"`')
                        for p in "".join(
                            t.text for t in tokens[code[j][0] + 1: close_raw]
                        ).split(",")
                    ]
                    while j < end_ci and code[j][0] <= close_raw:
                        j += 1
                if j < end_ci and code[j][1].is_kw("VALUES"):
                    jj = j + 1
                    if jj >= end_ci or code[jj][1].text != "(":
                        return None
                    close_raw = _matching_paren(tokens, code[jj][0])
                    values = _split_csv_tokens(
                        tokens[code[jj][0] + 1: close_raw]
                    )
                else:
                    return None
            clauses.append(
                {
                    "kind": "insert",
                    "cond": cond,
                    "cols": cols,
                    "values": values,
                    "star": star,
                }
            )
        else:
            return None
    return {
        "target": target,
        "target_alias": target_alias,
        "source": source,
        "on": on,
        "clauses": clauses,
    }


def _split_csv_tokens(toks: List[Token]) -> List[str]:
    parts: List[str] = []
    cur: List[Token] = []
    depth = 0
    for tok in toks:
        if tok.kind == "op" and tok.text in ("(", "["):
            depth += 1
        elif tok.kind == "op" and tok.text in (")", "]"):
            depth -= 1
        if depth == 0 and tok.kind == "op" and tok.text == ",":
            parts.append("".join(t.text for t in cur).strip())
            cur = []
        else:
            cur.append(tok)
    if cur:
        parts.append("".join(t.text for t in cur).strip())
    return [p for p in parts if p]


def _merge_insert_projection(clause, fields) -> str:
    """SELECT list (target column order, typed) for a WHEN NOT MATCHED
    INSERT clause."""
    if clause["star"]:
        return ", ".join(
            f"CAST({_bt(f.name)} AS {f.dataType.simpleString()}) AS {_bt(f.name)}"
            for f in fields
        )
    values = [translate(v) for v in (clause["values"] or [])]
    if clause["cols"] is None:
        if len(values) != len(fields):
            raise UserException(
                f"MERGE INSERT values count {len(values)} does not match "
                f"target column count {len(fields)}"
            )
        by_name = dict(zip([f.name.lower() for f in fields], values))
    else:
        if len(values) != len(clause["cols"]):
            raise UserException("MERGE INSERT column/value count mismatch")
        by_name = {c.lower(): v for c, v in zip(clause["cols"], values)}
    out = []
    for f in fields:
        expr = by_name.get(f.name.lower(), "NULL")
        out.append(
            f"CAST(({expr}) AS {f.dataType.simpleString()}) AS {_bt(f.name)}"
        )
    return ", ".join(out)


_AGG_FN_NAMES = {
    "sum", "count", "avg", "mean", "min", "max", "median", "mode",
    "stddev", "stddev_samp", "stddev_pop", "variance", "var_samp",
    "var_pop", "corr", "covar_pop", "covar_samp", "first", "last",
    "string_agg", "listagg", "array_agg", "collect_list", "collect_set",
    "approx_count_distinct", "percentile", "percentile_cont",
    "percentile_disc", "bool_and", "bool_or", "any_value",
}


def _parse_macro(sql: str):
    """(name, [params], body_text) for ``CREATE [OR REPLACE] MACRO
    name(p1, p2) AS expr``; None otherwise."""
    tokens = tokenize(sql)
    code = _code(sql)
    n = len(code)
    i = 0
    if i >= n or code[i][1].upper != "CREATE":
        return None
    i += 1
    if i + 1 < n and code[i][1].is_kw("OR") and code[i + 1][1].is_kw("REPLACE"):
        i += 2
    if i >= n or not code[i][1].is_kw("MACRO", "FUNCTION"):
        return None
    i += 1
    if i >= n or code[i][1].kind not in ("word", "bident", "qident"):
        return None
    name = unquote_name(code[i][1])
    i += 1
    if i >= n or code[i][1].text != "(":
        return None
    close_raw = _matching_paren(tokens, code[i][0])
    params = [
        p.strip().strip('`"')
        for p in _split_csv_tokens(tokens[code[i][0] + 1: close_raw])
    ]
    while i < n and code[i][0] <= close_raw:
        i += 1
    if i >= n or not code[i][1].is_kw("AS"):
        return None
    body = "".join(t.text for t in tokens[code[i][0] + 1:]).strip().rstrip(";")
    # table macro: AS TABLE <select> — the inline expansion already
    # parenthesizes, and a parenthesized SELECT is a valid derived
    # table, so only the TABLE keyword needs stripping
    if body.upper().startswith("TABLE"):
        body = body[5:].strip()
    if not body:
        return None
    return name, params, body


def _pivot_value_literal(v) -> str:
    """Typed SQL literal for a discovered PIVOT ON value: a bare
    ``str(date)`` would reach Spark as integer subtraction
    (``(col) = 1998-01-02``)."""
    import datetime
    import decimal

    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, (int, float, decimal.Decimal)):
        return str(v)
    raise UserException(
        f"PIVOT ON column has unsupported value type "
        f"{type(v).__name__}: {v!r}"
    )


def _split_pivot_in_list(on_expr: str):
    """Split ``col IN (v1, v2)`` -> (``col``, [(lit_sql, name), ...]);
    (on_expr, None) when there is no top-level IN list."""
    tokens = tokenize(on_expr)
    n = len(tokens)
    depth = 0
    for i, tok in enumerate(tokens):
        if tok.kind == "op" and tok.text == "(":
            depth += 1
        elif tok.kind == "op" and tok.text == ")":
            depth -= 1
        elif depth == 0 and tok.is_kw("IN"):
            j = i + 1
            while j < n and tokens[j].kind in ("ws", "comment"):
                j += 1
            if j < n and tokens[j].kind == "op" and tokens[j].text == "(":
                close = _matching_paren(tokens, j)
                vals = []
                for part in _split_csv_tokens(tokens[j + 1: close]):
                    text = part.strip()
                    name = (
                        text[1:-1].replace("''", "'")
                        if text.startswith("'") and text.endswith("'")
                        else text
                    )
                    vals.append((text, name))
                col = "".join(t.text for t in tokens[:i]).strip()
                return col, vals
    return on_expr, None


def _split_pivot_aggs(agg_expr: str):
    """Split a USING clause on top-level commas into
    [(expr, alias|None)] pairs (``sum(x) AS s, count(*) AS c``)."""
    tokens = tokenize(agg_expr)
    out = []
    for part_text in _split_csv_tokens(tokens):
        ptoks = tokenize(part_text)
        as_pos = _top_level_as(ptoks)
        if as_pos is None:
            out.append((part_text.strip(), None))
        else:
            expr = "".join(t.text for t in ptoks[:as_pos]).strip()
            alias = "".join(t.text for t in ptoks[as_pos + 1:]).strip().strip('"`')
            out.append((expr, alias))
    return out


def _top_level_as(tokens: List[Token]) -> Optional[int]:
    depth = 0
    for i, tok in enumerate(tokens):
        if tok.kind == "op" and tok.text == "(":
            depth += 1
        elif tok.kind == "op" and tok.text == ")":
            depth -= 1
        elif depth == 0 and tok.is_kw("AS"):
            return i
    return None


# aggregates whose dialect rewrite replaces the call with a composite
# expression that can't carry a trailing FILTER clause — the pivot
# predicate goes into the ARGUMENT instead (both skip nulls, so
# CASE WHEN pred THEN arg END is equivalent to FILTER)
_ARG_WRAPPED_AGGS = {"product", "entropy", "histogram"}


def _attach_agg_filter(expr: str, predicate: str) -> Optional[str]:
    """Apply a pivot-cell predicate to every aggregate call inside an
    expression: ``FILTER (WHERE pred)`` after the call
    (``CAST(count(*) AS INT)`` -> ``CAST(count(*) FILTER (...) AS
    INT)``), AND-merged into an existing FILTER clause rather than
    doubled; product/entropy get a CASE-wrapped argument instead.
    Returns None when no aggregate call is found."""
    tokens = tokenize(expr)
    n = len(tokens)
    out: List[Token] = []
    found = False

    def _next(k: int) -> int:
        while k < n and tokens[k].kind in ("ws", "comment"):
            k += 1
        return k

    def _existing_filter(k: int):
        """(filter_close, body) when tokens[k:] start with a FILTER
        clause; else None."""
        k = _next(k)
        if k < n and tokens[k].kind == "word" and tokens[k].upper == "FILTER":
            p = _next(k + 1)
            if p < n and tokens[p].kind == "op" and tokens[p].text == "(":
                fclose = _matching_paren(tokens, p)
                body = "".join(t.text for t in tokens[p + 1 : fclose]).strip()
                if body.upper().startswith("WHERE"):
                    body = body[5:].strip()
                return fclose, body
        return None

    i = 0
    while i < n:
        tok = tokens[i]
        low = tok.text.lower() if tok.kind == "word" else ""
        if low in _AGG_FN_NAMES or low in _ARG_WRAPPED_AGGS:
            j = _next(i + 1)
            if j < n and tokens[j].kind == "op" and tokens[j].text == "(":
                close = _matching_paren(tokens, j)
                found = True
                existing = _existing_filter(close + 1)
                if low in _ARG_WRAPPED_AGGS:
                    arg = "".join(
                        t.text for t in tokens[j + 1 : close]
                    ).strip()
                    pred = predicate
                    if existing is not None:
                        pred = f"({existing[1]}) AND {predicate}"
                    out.append(tok)
                    out.extend(
                        tokenize(f"(CASE WHEN {pred} THEN {arg} END)")
                    )
                    i = (existing[0] if existing is not None else close) + 1
                    continue
                out.append(tok)
                out.extend(tokens[i + 1 : close + 1])
                out.append(Token("ws", " "))
                if existing is not None:
                    out.extend(
                        tokenize(
                            f"FILTER (WHERE ({existing[1]}) AND {predicate})"
                        )
                    )
                    i = existing[0] + 1
                else:
                    out.extend(tokenize(f"FILTER (WHERE {predicate})"))
                    i = close + 1
                continue
        out.append(tok)
        i += 1
    if not found:
        return None
    return "".join(t.text for t in out)


def _parse_copy(sql: str):
    """(source_text, path, options) for ``COPY src TO 'path' [(opts)]``;
    None for unsupported shapes (COPY FROM import is not supported —
    inputs arrive via the data-dir mapping)."""
    tokens = tokenize(sql)
    code = _code(sql)
    n = len(code)
    if n < 4 or code[0][1].upper != "COPY":
        return None
    i = 1
    if code[i][1].kind == "op" and code[i][1].text == "(":
        close_raw = _matching_paren(tokens, code[i][0])
        source = "".join(
            t.text for t in tokens[code[i][0]: close_raw + 1]
        )
        while i < n and code[i][0] <= close_raw:
            i += 1
    elif code[i][1].kind in ("word", "bident", "qident", "string"):
        tok = code[i][1]
        source = tok.text[1:-1] if tok.kind == "string" else unquote_name(tok)
        i += 1
    else:
        return None
    if i >= n or not code[i][1].is_kw("TO"):
        return None
    i += 1
    if i >= n or code[i][1].kind != "string":
        return None
    path = code[i][1].text[1:-1].replace("''", "'")
    i += 1
    opts: dict = {}
    if i < n and code[i][1].kind == "op" and code[i][1].text == "(":
        close_raw = _matching_paren(tokens, code[i][0])
        inner = [
            (j, t) for j, t in code[i + 1:]
            if j < close_raw
        ]
        words = [t for _, t in inner]
        for k, t in enumerate(words):
            u = t.upper if t.kind == "word" else ""
            if u == "FORMAT" and k + 1 < len(words):
                opts["format"] = words[k + 1].text.strip("'").lower()
            elif u == "HEADER":
                val = True
                if k + 1 < len(words) and words[k + 1].upper in ("FALSE", "0"):
                    val = False
                opts["header"] = val
            elif u == "DELIMITER" and k + 1 < len(words):
                if words[k + 1].kind == "string":
                    opts["delimiter"] = words[k + 1].text[1:-1]
            elif u == "FORCE_QUOTE":
                opts["force_quote_all"] = True
    return source, path, opts


def _parse_drop(sql: str) -> Optional[tuple[str, bool]]:
    """(name, if_exists) for ``DROP TABLE|VIEW [IF EXISTS] name``, else
    None."""
    code = _code(sql)
    if not code or code[0][1].upper != "DROP":
        return None
    i = 1
    if i < len(code) and code[i][1].upper in ("TABLE", "VIEW"):
        i += 1
    else:
        return None
    if_exists = False
    if (
        i + 1 < len(code)
        and code[i][1].upper == "IF"
        and code[i + 1][1].upper == "EXISTS"
    ):
        if_exists = True
        i += 2
    if i >= len(code):
        return None
    tok = code[i][1]
    name = unquote_name(tok) if tok.kind != "string" else tok.text[1:-1]
    return name, if_exists


def _delete_where(sql: str) -> Optional[str]:
    return _delete_using_where(sql)[1]


def _delete_using_where(sql: str) -> tuple[Optional[str], Optional[str]]:
    """Split ``DELETE FROM t [USING sources] [WHERE pred]`` into
    (using_text, where_text)."""
    tokens = tokenize(sql)
    depth = 0
    using_idx = where_idx = None
    for i, tok in enumerate(tokens):
        if tok.kind == "op" and tok.text == "(":
            depth += 1
        elif tok.kind == "op" and tok.text == ")":
            depth -= 1
        elif depth == 0 and tok.is_kw("USING") and using_idx is None:
            using_idx = i
        elif depth == 0 and tok.is_kw("WHERE"):
            where_idx = i
            break
    where = (
        "".join(t.text for t in tokens[where_idx + 1:]).strip()
        if where_idx is not None
        else None
    )
    using = None
    if using_idx is not None:
        end = where_idx if where_idx is not None else len(tokens)
        using = "".join(t.text for t in tokens[using_idx + 1: end]).strip()
    return using, where
