"""Registry-wide output policy: every workload must return only scalar
columns.

The driver's correctness canonicalizer sorts EVERY output column with
pandas (``Categorical`` factorize under the hood); an ArrayType /
MapType / StructType column arrives as ndarray/dict cells, which are
unhashable, and the whole row goes red with
``TypeError: unhashable type: 'numpy.ndarray'`` — on BOTH engines, so
the failure is invisible to the value compare and only shows up on the
driver board (round-6 q58 post-mortem; VERDICT.md "What's wrong" #1).

Workloads that exercise list/struct surface must stringify
(``array_to_string`` with a NULL sentinel, ``CAST(... AS VARCHAR)``)
before returning.

Schema inspection is lazy for the SQL workloads (no job runs), so the
sweep is cheap; serial workloads (streaming drains that mutate session
conf and execute eagerly in ``make``) are covered by the slow-marked
variant.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from component_duckdb_transformation_spark.workloads import WORKLOADS

SF = "/root/testdata/sf0.001"

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _complex_cols(df):
    return [f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)]


@pytest.mark.parametrize(
    "name", [n for n, w in WORKLOADS.items() if not w.serial]
)
def test_workload_output_is_scalar(spark, name):
    df = WORKLOADS[name].make(spark, SF)
    bad = _complex_cols(df)
    assert not bad, (
        f"{name} returns non-scalar output columns {bad}; the driver "
        "canonicalizer cannot sort ndarray cells — stringify them "
        "(array_to_string with a NULL sentinel / CAST AS VARCHAR)"
    )


@pytest.mark.slow
@pytest.mark.parametrize("name", [n for n, w in WORKLOADS.items() if w.serial])
def test_serial_workload_output_is_scalar(spark, name):
    df = WORKLOADS[name].make(spark, SF)
    bad = _complex_cols(df)
    assert not bad, f"{name} returns non-scalar output columns {bad}"
