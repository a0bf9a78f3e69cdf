"""Reference-golden parity: run the reference's own functional datadir
case (tests/functional/simple) through OUR component and compare against
the reference's expected golden outputs.

The reference tree is read at runtime from /root/reference (never copied
into this repo); skipped when unavailable. This is the strongest parity
evidence: same config, same inputs, byte-comparable outputs
(reference tests/test_functional.py:43-54 runs the same comparison
against its DuckDB engine).
"""

from __future__ import annotations

import csv
import json
import os
import shutil

import pytest

from component_duckdb_transformation_spark.component import Component

REF_ROOT = "/root/reference/tests/functional"
REF_CASE = os.path.join(REF_ROOT, "simple")


def _make_datadir(case: str, tmp_path) -> str:
    src = os.path.join(REF_ROOT, case, "source", "data")
    if not os.path.isdir(src):
        pytest.skip("reference tree not available")
    data = tmp_path / "data"
    shutil.copytree(src, data)
    return str(data)


@pytest.fixture()
def ref_datadir(tmp_path):
    return _make_datadir("simple", tmp_path)


def _rows(path: str) -> list[list[str]]:
    with open(path, newline="", encoding="utf-8") as fh:
        return list(csv.reader(fh))


def test_reference_simple_case_parity(spark, ref_datadir):
    Component(data_dir=ref_datadir, spark=spark).run()
    expected_dir = os.path.join(REF_CASE, "expected", "data", "out", "tables")
    out_dir = os.path.join(ref_datadir, "out", "tables")

    for name in ("week.csv", "weekend.csv", "joined.csv", "out-table.csv"):
        got = _rows(os.path.join(out_dir, name))
        want = _rows(os.path.join(expected_dir, name))
        assert got[0] == want[0], f"{name}: header mismatch"
        # reference goldens are ordered only where the view had ORDER BY;
        # compare as multisets of rows plus explicit order where defined
        assert sorted(map(tuple, got[1:])) == sorted(map(tuple, want[1:])), (
            f"{name}: data mismatch"
        )
        if name in ("joined.csv", "out-table.csv"):  # ORDER BY id in config
            ids_got = [r[0] for r in got[1:]]
            assert ids_got == sorted(ids_got, key=lambda x: int(x)), (
                f"{name}: ORDER BY id not applied"
            )

    # manifest schema parity (typed via DuckDB sniffer there, inference here)
    with open(os.path.join(out_dir, "joined.csv.manifest"), encoding="utf-8") as fh:
        got_manifest = json.load(fh)
    with open(
        os.path.join(expected_dir, "joined.csv.manifest"), encoding="utf-8"
    ) as fh:
        want_manifest = json.load(fh)
    got_types = {c["name"]: c["data_type"]["base"]["type"] for c in got_manifest["schema"]}
    want_types = {c["name"]: c["data_type"]["base"]["type"] for c in want_manifest["schema"]}
    assert got_types == want_types
    assert got_manifest["destination"] == want_manifest["destination"]


@pytest.mark.parametrize(
    "case",
    [
        "dtypes",
        "simple_parquet",
        "query_dependencies",
        "sync_action_execution_plan",
        "version-1-4-4",
        "version-1-5-2",
    ],
)
def test_reference_case_parity(spark, tmp_path, case):
    """Generic golden comparison: every expected out-table must match as a
    row multiset, and manifests must agree on destination + base types."""
    data_dir = _make_datadir(case, tmp_path)
    Component(data_dir=data_dir, spark=spark).run()
    expected_dir = os.path.join(REF_ROOT, case, "expected", "data", "out", "tables")
    out_dir = os.path.join(data_dir, "out", "tables")

    for entry in sorted(os.listdir(expected_dir)):
        if entry.endswith(".manifest"):
            with open(os.path.join(expected_dir, entry), encoding="utf-8") as fh:
                want_m = json.load(fh)
            with open(os.path.join(out_dir, entry), encoding="utf-8") as fh:
                got_m = json.load(fh)
            assert got_m["destination"] == want_m["destination"], entry
            if "schema" in want_m:
                got_t = {c["name"]: c["data_type"]["base"]["type"] for c in got_m["schema"]}
                want_t = {c["name"]: c["data_type"]["base"]["type"] for c in want_m["schema"]}
                for col, want_type in want_t.items():
                    got_type = got_t.get(col)
                    # date_trunc('month'|..., ts) returned TIMESTAMP in the
                    # reference's pinned DuckDB 1.4/1.5 but returns DATE in
                    # current DuckDB; we match current (= the oracle engine)
                    if {got_type, want_type} == {"DATE", "TIMESTAMP"}:
                        continue
                    assert got_type == want_type, f"{entry}: {col}"
        else:
            got = _rows(os.path.join(out_dir, entry))
            want = _rows(os.path.join(expected_dir, entry))
            assert got[0] == want[0], f"{case}/{entry}: header mismatch"
            assert sorted(map(tuple, got[1:])) == sorted(map(tuple, want[1:])), (
                f"{case}/{entry}: data mismatch"
            )
