"""CI hook for the adversarial dialect fuzzer (tools/fuzz_diff.py).

Deterministic seed; 150 expressions keeps it under a minute on top of
the session fixture. Other seeds can surface the two DOCUMENTED
floating-point-boundary divergences (COVERAGE.md): round() on DOUBLE at
scaled-half representation boundaries (DuckDB scaled-multiply vs Spark
exact-decimal HALF_UP), and numeric->integral CAST of a DOUBLE landing
exactly on .5 (DuckDB half-to-even vs the decimal route's half-away).
Everything else is a translator bug and fails here.
"""

from __future__ import annotations

import subprocess
import sys


def test_fuzz_diff_default_seed():
    proc = subprocess.run(
        [sys.executable, "/root/repo/tools/fuzz_diff.py", "--n", "150"],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    tail = "\n".join(proc.stdout.splitlines()[-15:])
    assert proc.returncode == 0, f"fuzz_diff found mismatches:\n{tail}"
