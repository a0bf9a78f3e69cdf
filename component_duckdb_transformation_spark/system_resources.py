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
