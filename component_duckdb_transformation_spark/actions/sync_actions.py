"""Sync actions: lineage visualization, execution-plan visualization,
expected input tables (reference ``src/actions/*.py``; SURVEY §2.A
A13-A15, §3.3). All three are pure metadata — no SparkSession needed,
exactly as the reference builds its orchestrator with ``connection=None``
(reference src/actions/execution_plan_visualization.py:26-30)."""

from __future__ import annotations

from typing import Optional, Sequence

from ..configuration import Block, InputTable
from ..plans.orchestrator import (
    BlockOrchestrator,
    iterate_blocks,
    query_name,
)
from ..plans.sql_parser import parse_script
from .results import MessageType, ValidationResult


def _script_deps_outputs(script: str) -> tuple[set[str], set[str]]:
    deps: set[str] = set()
    outs: set[str] = set()
    for st in parse_script(script):
        deps |= st.dependencies
        outs |= st.outputs
    return deps, outs


# ---------------------------------------------------------------------------
# expected_input_tables (reference src/actions/expected_input_tables.py:19-73)
# ---------------------------------------------------------------------------

def expected_input_tables(
    blocks: Sequence[Block], available_tables: Optional[Sequence[InputTable]] = None
) -> ValidationResult:
    """External deps = all dependencies − all outputs; optional validation
    against the actual input mapping (suffix-stripped)."""
    all_deps: set[str] = set()
    all_outputs: set[str] = set()
    try:
        for _, _, script, _ in iterate_blocks(blocks):
            deps, outs = _script_deps_outputs(script)
            all_deps |= deps
            all_outputs |= outs
    except Exception as exc:  # analysis failure -> DANGER, never a crash
        # (reference src/actions/expected_input_tables.py error contract)
        return ValidationResult(
            f"Error analyzing expected input tables: {exc}", MessageType.DANGER
        )
    external = all_deps - all_outputs

    if available_tables is None:
        return ValidationResult(
            ", ".join(sorted(external)) if external else "", MessageType.SUCCESS
        )

    available = {
        t.destination.removesuffix(".csv").removesuffix(".parquet").removesuffix(".parq")
        for t in available_tables
    }
    missing = external - available
    extra = available - external

    lines: list[str] = []
    if not external:
        return ValidationResult(
            "✅ No input tables required by SQL queries", MessageType.SUCCESS
        )
    lines.append("📋 **Input Tables Validation Report**")
    lines.append("")
    lines.append(f"**Required tables ({len(external)}):**")
    for t in sorted(external):
        lines.append(f"  {'✅' if t in available else '❌'} `{t}`")
    lines.append("")
    lines.append(f"**Available tables ({len(available)}):**")
    for t in sorted(available):
        lines.append(f"  {'✅' if t in external else '⚠️'} `{t}`")
    lines.append("")
    if missing or extra:
        lines.append("**Issues found:**")
        if missing:
            lines.append(
                f"❌ **Missing tables ({len(missing)}):** "
                + ", ".join(f"`{t}`" for t in sorted(missing))
            )
        if extra:
            lines.append(
                f"⚠️ **Unused tables ({len(extra)}):** "
                + ", ".join(f"`{t}`" for t in sorted(extra))
            )
    mtype = (
        MessageType.DANGER
        if missing
        else MessageType.WARNING
        if extra
        else MessageType.SUCCESS
    )
    return ValidationResult("\n".join(lines), mtype)


# ---------------------------------------------------------------------------
# lineage_visualization (reference src/actions/lineage_visualization.py:19-102)
# ---------------------------------------------------------------------------

def lineage_visualization(blocks: Sequence[Block]) -> ValidationResult:
    """Per-table read-by / created-by markdown report."""
    queries = []
    try:
        for block, code, script, script_index in iterate_blocks(blocks):
            deps, outs = _script_deps_outputs(script)
            queries.append(
                {
                    "name": query_name(code, script_index),
                    "block": block.name,
                    "code": code.name,
                    "dependencies": deps,
                    "outputs": outs,
                    "sql": script,
                }
            )
    except Exception as exc:  # analysis failure -> DANGER, never a crash
        return ValidationResult(
            f"Error generating lineage visualization: {exc}", MessageType.DANGER
        )
    md = "# 📊 Data Lineage Visualization\n\n"
    all_tables: set[str] = set()
    for q in queries:
        all_tables |= q["dependencies"] | q["outputs"]
    md += "## 🔗 Table Dependencies\n\n"
    for table in sorted(all_tables):
        md += f"### 📋 {table}\n\n"
        readers = [q for q in queries if table in q["dependencies"]]
        if readers:
            md += "**Read by:**\n"
            for r in readers:
                md += f"- `{r['name']}` (Block: {r['block']}, Code: {r['code']})\n"
            md += "\n"
        creators = [q for q in queries if table in q["outputs"]]
        if creators:
            md += "**Created by:**\n"
            for c in creators:
                md += f"- `{c['name']}` (Block: {c['block']}, Code: {c['code']})\n"
            md += "\n"
    md += "## 📈 Query Flow\n\n"
    by_block: dict[str, list[dict]] = {}
    for q in queries:
        by_block.setdefault(q["block"], []).append(q)
    for block_name, qs in by_block.items():
        md += f"### 🧱 {block_name}\n\n"
        for q in qs:
            md += f"#### 🔧 {q['name']}\n\n**Code:** {q['code']}\n\n"
            if q["dependencies"]:
                md += "**Inputs:**\n"
                for d in sorted(q["dependencies"]):
                    md += f"- `{d}`\n"
                md += "\n"
            if q["outputs"]:
                md += "**Outputs:**\n"
                for o in sorted(q["outputs"]):
                    md += f"- `{o}`\n"
                md += "\n"
            md += f"**SQL:**\n```sql\n{q['sql']}\n```\n\n"
    return ValidationResult(md, MessageType.SUCCESS)


# ---------------------------------------------------------------------------
# execution_plan_visualization
# (reference src/actions/execution_plan_visualization.py:19-91)
# ---------------------------------------------------------------------------

def execution_plan_visualization(
    blocks: Sequence[Block], max_workers: int
) -> ValidationResult:
    """Markdown of blocks / batches / parallelism — planner only, no engine."""
    try:
        orch = BlockOrchestrator(execute_script=None, max_workers=max_workers)
        orch.add_queries_from_blocks(blocks)
        plan = orch.build_block_execution_plan()
    except Exception as exc:
        return ValidationResult(
            f"Error generating execution plan visualization: {exc}",
            MessageType.DANGER,
        )
    md = "# 🚀 Execution Plan Visualization\n\n## 📊 Execution Summary\n\n"
    md += f"- **Total Queries:** {plan.total_queries}\n"
    md += f"- **Total Batches:** {plan.total_batches}\n"
    md += f"- **Total Blocks:** {len(plan)}\n"
    md += f"- **Max Parallel Workers:** {max_workers}\n\n"
    md += "## 🔄 Execution Flow\n\n"
    for bi, block in enumerate(plan, 1):
        md += f"### 🧱 Block {bi}: {block.name}\n\n"
        md += (
            f"**Block contains {len(block)} batches with "
            f"{block.total_queries} queries total**\n\n"
        )
        for xi, batch in enumerate(block, 1):
            if len(batch) == 1:
                md += f"#### 🔄 Batch {xi} (Sequential - 1 query)\n\n"
            else:
                md += f"#### ⚡ Batch {xi} (Parallel - {len(batch)} queries)\n\n"
            for q in batch:
                md += f"- **{q.name}** (Code: {q.code_name})\n"
                if q.dependencies:
                    md += f"  - Dependencies: `{', '.join(sorted(q.dependencies))}`\n"
                if q.outputs:
                    md += f"  - Outputs: `{', '.join(sorted(q.outputs))}`\n"
                md += "\n"
        md += "---\n\n"
    md += "## 🔍 Dependency Analysis\n\n"
    for q in orch.queries:
        md += f"### 📋 {q.name}\n\n**Block:** {q.block_name}\n**Code:** {q.code_name}\n\n"
        if q.dependencies:
            md += "**Dependencies:**\n"
            for d in sorted(q.dependencies):
                md += f"- `{d}`\n"
            md += "\n"
        if q.outputs:
            md += "**Outputs:**\n"
            for o in sorted(q.outputs):
                md += f"- `{o}`\n"
            md += "\n"
    return ValidationResult(md, MessageType.SUCCESS)
