"""Paired c8/c32 bench at the CURRENT tree with per-side steal jiffies.

Runs bench.py twice back-to-back — SPARK_GRAFT_CPUS=8 then 32 (order
alternates per pair) — and prints one JSON line per side. The r13
verdict's most valuable diagnostic was the c8-beats-c32 inversion
(demand pathology at local[32]); this tool lets a round prove its fix
locally: a healthy tree has wall(c8) >= wall(c32), and the map-heavy
per-query ratios move toward >1, not <=1 (guide §1: measure first).

Usage: python tools/pair_c8_c32.py [n_pairs]  (default 1)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _calm(limit: int = 60, window: float = 8.0, tries: int = 40) -> None:
    for _ in range(tries):
        s0 = _steal()
        time.sleep(window)
        if _steal() - s0 < limit:
            return


def run_once(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    s0 = _steal()
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    s1 = _steal()
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    return {
        "cpus": cpus,
        "wall": payload["value"],
        "steal": s1 - s0,
        "failures": payload.get("failures", []),
        "queries": payload.get("queries", {}),
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    for i in range(n):
        order = (8, 32) if i % 2 == 0 else (32, 8)
        sides = {}
        for cpus in order:
            _calm()
            sides[cpus] = run_once(cpus)
        ratio = {
            q: round(sides[8]["queries"][q] / t32, 2)
            for q, t32 in sides[32]["queries"].items()
            if q in sides[8]["queries"] and t32 > 0.3
        }
        print(json.dumps({
            "pair": i,
            "wall_c8": sides[8]["wall"],
            "steal_c8": sides[8]["steal"],
            "wall_c32": sides[32]["wall"],
            "steal_c32": sides[32]["steal"],
            "failures": sides[8]["failures"] + sides[32]["failures"],
            "ratio_c8_over_c32": dict(
                sorted(ratio.items(), key=lambda kv: -kv[1])[:15]
            ),
        }))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
