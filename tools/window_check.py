"""Quick co-tenant window check (~40 s): sample the two hardware-ceiling
controls the scaling protocol uses — the perfectly-parallel html-parse
kernel (memory-bound) and the integer-loop kernel (cache-resident) — at
N and 4N multiprocessing workers, WITHOUT starting any JVM.

This box's co-tenant interference is memory-bus-shaped and swings on a
minutes scale (BENCH/BASELINE.md); protocol runs launched into a dirty
window land raw efficiencies far below even the window's own ceiling. Use
this probe to decide WHEN to spend 30 minutes on a full
tools/bench_scaling.py run: a parse-kernel ceiling >= ~0.7 alongside a cpu
ceiling >= ~0.85 marks a window worth measuring in.

Usage: python tools/window_check.py [N_cpus] [4N_cpus]
Prints one JSON line {"kernel": eff, "cpu": eff}.
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from bench_scaling import ceiling_sample  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n4 = int(sys.argv[2]) if len(sys.argv) > 2 else 4 * n
    print(json.dumps(ceiling_sample(n, n4)))


if __name__ == "__main__":
    main()
