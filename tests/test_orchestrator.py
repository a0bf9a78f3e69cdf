"""DAG scheduling semantics (reference src/query_orchestrator.py)."""

import pytest

from component_duckdb_transformation_spark.configuration import Block, Code
from component_duckdb_transformation_spark.exceptions import UserException
from component_duckdb_transformation_spark.plans.orchestrator import (
    BlockOrchestrator,
    build_execution_plan,
    build_queries,
)


def _plan(blocks):
    return build_execution_plan(build_queries(blocks))


def _batch_names(plan):
    return [[sorted(q.name for q in batch) for batch in block.batches] for block in plan]


def test_chained_ctas_ordering():
    # reference tests/functional/query_dependencies config.json:12-18
    blocks = [Block(name="b", codes=[Code(name="c", script=[
        "CREATE OR REPLACE TABLE t1 AS SELECT 1 AS x",
        "CREATE OR REPLACE TABLE t2 AS SELECT * FROM t1",
        "CREATE OR REPLACE TABLE t3 AS SELECT * FROM t2",
        'CREATE OR REPLACE TABLE "t4-new" AS SELECT * FROM t1',
        'CREATE OR REPLACE TABLE t5 AS SELECT * FROM "t4-new"',
    ])])]
    assert _batch_names(_plan(blocks)) == [
        [["c_0"], ["c_1", "c_3"], ["c_2", "c_4"]]
    ]


def test_insert_overrides_create_as_producer():
    # reference src/query_orchestrator.py:247-251
    blocks = [Block(name="b", codes=[Code(name="c", script=[
        "CREATE TABLE t AS SELECT 1 AS x",
        "INSERT INTO t SELECT 2",
        "CREATE TABLE reader AS SELECT * FROM t",
    ])])]
    assert _batch_names(_plan(blocks)) == [[["c_0"], ["c_1"], ["c_2"]]]


def test_blocks_execute_consecutively():
    blocks = [
        Block(name="b1", codes=[Code(name="a", script=["CREATE TABLE x AS SELECT 1 AS v"])]),
        Block(name="b2", codes=[Code(name="b", script=["CREATE TABLE y AS SELECT * FROM x"])]),
    ]
    plan = _plan(blocks)
    assert [b.name for b in plan] == ["b1", "b2"]


def test_independent_queries_batch_together():
    blocks = [Block(name="b", codes=[Code(name="c", script=[
        "CREATE TABLE a AS SELECT 1 AS x",
        "CREATE TABLE b AS SELECT 2 AS x",
    ])])]
    assert _batch_names(_plan(blocks)) == [[["c_0", "c_1"]]]


def test_cycle_detection():
    blocks = [Block(name="b", codes=[Code(name="c", script=[
        "CREATE TABLE a AS SELECT * FROM b",
        "CREATE TABLE b AS SELECT * FROM a",
    ])])]
    orch = BlockOrchestrator(execute_script=lambda q: None)
    orch.add_queries_from_blocks(blocks)
    with pytest.raises(UserException, match="Circular dependency"):
        orch.build_block_execution_plan()


def test_fail_fast_raises_user_exception():
    def boom(query):
        raise RuntimeError("nope")

    blocks = [Block(name="b", codes=[Code(name="c", script=["SELECT 1"])])]
    orch = BlockOrchestrator(execute_script=boom)
    orch.add_queries_from_blocks(blocks)
    with pytest.raises(UserException, match="failed"):
        orch.execute()


def test_mutation_chain_serialized():
    blocks = [Block(name="b", codes=[Code(name="c", script=[
        "CREATE TABLE t AS SELECT 1 AS x",
        "INSERT INTO t SELECT 2",
        "UPDATE t SET x = 3 WHERE x = 2",
        "DELETE FROM t WHERE x = 1",
    ])])]
    assert _batch_names(_plan(blocks)) == [[["c_0"], ["c_1"], ["c_2"], ["c_3"]]]


def test_catalog_ddl_barrier_serializes_block():
    # CREATE TYPE / CREATE SEQUENCE have no table-level outputs, so the
    # dependency extractor can't order them; they must act as barriers
    # or CREATE TABLE custt (tier tier) races the type registration
    # (observed flaky at sf0.1 in x30)
    blocks = [Block(name="b", codes=[Code(name="p", script=[
        "CREATE TYPE tier AS ENUM ('a', 'b')",
        "CREATE SEQUENCE sid START 1000",
        "CREATE TABLE custt (k BIGINT, tier tier, sid BIGINT)",
        "INSERT INTO custt SELECT 1, 'a', nextval('sid')",
    ])])]
    names = _batch_names(_plan(blocks))
    # every batch is a singleton, in config order
    assert names == [[["p_0"], ["p_1"], ["p_2"], ["p_3"]]]


def test_catalog_ddl_barrier_leaves_plain_blocks_parallel():
    blocks = [Block(name="b", codes=[Code(name="p", script=[
        "CREATE TABLE a AS SELECT 1 AS x",
        "CREATE TABLE b AS SELECT 2 AS y",
    ])])]
    names = _batch_names(_plan(blocks))
    assert names == [[["p_0", "p_1"]]]
