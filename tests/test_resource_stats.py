"""Debug-mode engine introspection, the Spark analogue of the
reference's duckdb_memory()/duckdb_temporary_files() dumps
(reference src/duckdb_client.py:34-48)."""

from __future__ import annotations

from component_duckdb_transformation_spark.system_resources import (
    spark_resource_stats,
)


def test_spark_resource_stats_shape(spark):
    stats = spark_resource_stats(spark)
    assert stats["jvm_heap_used_mb"] >= 0
    assert stats["jvm_heap_max_mb"] >= stats["jvm_heap_used_mb"]
    # local mode still reports the driver as an executor
    assert isinstance(stats["executors"], list)
    assert isinstance(stats["scratch_dirs"], list)
    for ex in stats["executors"]:
        assert ex["storage_max_mb"] >= ex["storage_free_mb"] >= 0
