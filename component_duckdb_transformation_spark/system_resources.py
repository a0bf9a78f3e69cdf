"""Container resource autodetection (cgroup v1/v2).

Re-implements the behavior of reference ``src/system_resources.py:11-106``:
detect the CPU quota and memory limit the container actually has, so the
engine can size ``local[N]`` parallelism and driver memory to the cgroup
rather than the host. Pure Python, no Spark dependency.
"""

from __future__ import annotations

import logging
import os

LOG = logging.getLogger(__name__)

DEFAULT_CPU_COUNT = 4
DEFAULT_MEMORY_MB = 4096
# Reserve for the Python driver process itself, mirroring the reference's
# 256 MB subtraction (reference src/system_resources.py:8).
PYTHON_RESERVE_MB = 256

_CGROUP_V2_CPU = "/sys/fs/cgroup/cpu.max"
_CGROUP_V1_QUOTA = "/sys/fs/cgroup/cpu/cpu.cfs_quota_us"
_CGROUP_V1_PERIOD = "/sys/fs/cgroup/cpu/cpu.cfs_period_us"
_CGROUP_V2_MEM = "/sys/fs/cgroup/memory.max"
_CGROUP_V1_MEM = "/sys/fs/cgroup/memory/memory.limit_in_bytes"


def _read_first_line(path: str) -> str | None:
    try:
        with open(path, "r", encoding="utf-8") as fh:
            return fh.readline().strip()
    except OSError:
        return None


def detect_cpu_count() -> int:
    """CPU count from cgroup v2 ``cpu.max``, then cgroup v1 quota/period,
    then ``os.cpu_count()``, else 4 (reference src/system_resources.py:11-49)."""
    line = _read_first_line(_CGROUP_V2_CPU)
    if line:
        parts = line.split()
        if len(parts) == 2 and parts[0] != "max":
            try:
                quota, period = int(parts[0]), int(parts[1])
                if quota > 0 and period > 0:
                    return max(1, quota // period)
            except ValueError:
                pass
    quota_s = _read_first_line(_CGROUP_V1_QUOTA)
    period_s = _read_first_line(_CGROUP_V1_PERIOD)
    if quota_s and period_s:
        try:
            quota, period = int(quota_s), int(period_s)
            if quota > 0 and period > 0:
                return max(1, quota // period)
        except ValueError:
            pass
    return os.cpu_count() or DEFAULT_CPU_COUNT


def spark_resource_stats(spark) -> dict:
    """Engine memory + spill introspection, the Spark analogue of the
    reference's debug-mode ``duckdb_memory()`` /
    ``duckdb_temporary_files()`` dumps (reference src/duckdb_client.py:34-48).

    Returns JVM heap numbers, per-executor storage-memory status, and the
    on-disk bytes of Spark's shuffle/spill scratch directories.
    """
    jvm_rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()  # noqa: SLF001
    stats: dict = {
        "jvm_heap_used_mb": (jvm_rt.totalMemory() - jvm_rt.freeMemory()) // (1 << 20),
        "jvm_heap_total_mb": jvm_rt.totalMemory() // (1 << 20),
        "jvm_heap_max_mb": jvm_rt.maxMemory() // (1 << 20),
        "executors": [],
        "scratch_dirs": [],
    }
    try:
        mem_status = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()  # noqa: SLF001
        it = mem_status.iterator()
        while it.hasNext():
            entry = it.next()
            stats["executors"].append(
                {
                    "executor": str(entry._1()),
                    "storage_max_mb": int(entry._2()._1()) // (1 << 20),
                    "storage_free_mb": int(entry._2()._2()) // (1 << 20),
                }
            )
    except Exception:  # pragma: no cover - py4j surface may change
        pass
    local_dirs = spark.conf.get(
        "spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/tmp")
    )
    for root in local_dirs.split(","):
        for entry in sorted(os.listdir(root)) if os.path.isdir(root) else []:
            if entry.startswith(("blockmgr-", "spark-")):
                path = os.path.join(root, entry)
                size = 0
                for dirpath, _dirnames, filenames in os.walk(path):
                    for fname in filenames:
                        try:
                            size += os.path.getsize(os.path.join(dirpath, fname))
                        except OSError:
                            pass
                stats["scratch_dirs"].append(
                    {"path": path, "bytes": size}
                )
    return stats


def detect_memory_limit_mb() -> int:
    """Memory limit in MB from cgroup v2/v1, minus the Python reserve;
    defaults to 4096 (reference src/system_resources.py:88-106)."""
    for path in (_CGROUP_V2_MEM, _CGROUP_V1_MEM):
        line = _read_first_line(path)
        if line and line != "max":
            try:
                limit_bytes = int(line)
            except ValueError:
                continue
            # cgroup v1 reports a huge number when unlimited
            if 0 < limit_bytes < 1 << 60:
                return max(512, limit_bytes // (1024 * 1024) - PYTHON_RESERVE_MB)
    return DEFAULT_MEMORY_MB
