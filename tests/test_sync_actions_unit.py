"""Unit ports of the reference's sync-action test matrix
(/root/reference/tests/unit/test_*_action.py): success, empty, error,
CTE-alias filtering, and create-without-inputs behaviors."""

from __future__ import annotations

from component_duckdb_transformation_spark.actions import sync_actions
from component_duckdb_transformation_spark.actions.results import MessageType
from component_duckdb_transformation_spark.configuration import Block, Code


def _blocks(*scripts: str) -> list[Block]:
    return [Block(name="B1", codes=[Code(name="C1", script=list(scripts))])]


def test_expected_input_tables_success_multi_block():
    # mirrors test_expected_input_tables_success: CTE aliases filtered,
    # tables created by earlier scripts are not external
    blocks = [
        Block(
            name="B1",
            codes=[
                Code(
                    name="C1",
                    script=[
                        "WITH base_data AS (SELECT * FROM in_a)\n"
                        "CREATE TABLE out_a AS SELECT * FROM base_data bd "
                        "JOIN in_b USING(id);",
                        "CREATE VIEW v1 AS SELECT * FROM out_a;",
                    ],
                )
            ],
        ),
        Block(
            name="B2",
            codes=[
                Code(
                    name="C2",
                    script=[
                        "WITH temp_data AS (SELECT * FROM in_c)\n"
                        "SELECT * FROM v1 JOIN temp_data USING(id);",
                    ],
                )
            ],
        ),
    ]
    res = sync_actions.expected_input_tables(blocks)
    assert res.type == MessageType.SUCCESS
    assert res.message == "in_a, in_b, in_c"


def test_expected_input_tables_empty():
    res = sync_actions.expected_input_tables([])
    assert res.type == MessageType.SUCCESS
    assert res.message == ""


def test_expected_input_tables_error(monkeypatch):
    def boom(_):
        raise RuntimeError("boom")

    monkeypatch.setattr(sync_actions, "iterate_blocks", boom)
    res = sync_actions.expected_input_tables([])
    assert res.type == MessageType.DANGER
    assert "Error analyzing expected input tables" in res.message


def test_expected_input_tables_filters_cte_aliases_only():
    blocks = _blocks(
        "WITH base_data AS (SELECT * FROM raw_data),\n"
        "     temp_data AS (SELECT * FROM base_data)\n"
        "SELECT * FROM temp_data;"
    )
    res = sync_actions.expected_input_tables(blocks)
    assert res.type == MessageType.SUCCESS
    assert res.message == "raw_data"


def test_expected_input_tables_create_without_inputs():
    blocks = _blocks("CREATE TABLE t AS SELECT 1 AS one;")
    res = sync_actions.expected_input_tables(blocks)
    assert res.type == MessageType.SUCCESS
    assert res.message == ""


def test_lineage_visualization_success():
    blocks = _blocks("CREATE TABLE out_t AS SELECT * FROM in_t;")
    res = sync_actions.lineage_visualization(blocks)
    assert res.type == MessageType.SUCCESS
    assert "in_t" in res.message and "out_t" in res.message
    assert "Read by" in res.message and "Created by" in res.message


def test_lineage_visualization_empty():
    res = sync_actions.lineage_visualization([])
    assert res.type == MessageType.SUCCESS
    assert "Data Lineage" in res.message


def test_lineage_visualization_handles_no_tables():
    res = sync_actions.lineage_visualization(_blocks("SELECT 1;"))
    assert res.type == MessageType.SUCCESS


def test_lineage_visualization_error(monkeypatch):
    def boom(_):
        raise RuntimeError("boom")

    monkeypatch.setattr(sync_actions, "iterate_blocks", boom)
    res = sync_actions.lineage_visualization([])
    assert res.type == MessageType.DANGER
    assert "Error generating lineage visualization" in res.message


def test_execution_plan_success():
    blocks = _blocks(
        "CREATE TABLE a AS SELECT 1 AS x;",
        "CREATE TABLE b AS SELECT * FROM a;",
    )
    res = sync_actions.execution_plan_visualization(blocks, max_workers=4)
    assert res.type == MessageType.SUCCESS
    assert "Execution Plan" in res.message
    assert "Total Queries:** 2" in res.message


def test_execution_plan_error():
    # circular dependency -> planner raises -> DANGER, not a crash
    blocks = _blocks(
        "CREATE TABLE a AS SELECT * FROM b;",
        "CREATE TABLE b AS SELECT * FROM a;",
    )
    res = sync_actions.execution_plan_visualization(blocks, max_workers=4)
    assert res.type == MessageType.DANGER
    assert "Error generating execution plan" in res.message
