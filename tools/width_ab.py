"""Same-window A/B of the pin/fetch-join width at the 4N level.

Two persistent JVMs at the SAME cpu count (local[32]), one at the fixed
historical width (32), one at the level-proportional auto default
(pin_width_factor x cores = 96 at 32 threads); reps alternate
fixed,auto,fixed,auto so both widths share each few-minute slice of box
speed. Reports per-rep walls, medians, the dominant-superstep walls, and
the order-hash equality across widths (crawl ordering must be
width-independent — the determinism contract).

Usage: python tools/width_ab.py [n_urls] [cpus] [reps] [auto_width]
  auto_width: 0 = the engine auto default (factor x cores); any other
  value pins the B side to that width (e.g. 96).
"""

from __future__ import annotations

import json
import statistics
import sys

from bench_scaling import Level  # same tools/ directory


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    auto_w = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    fixed = Level(cpus, n_urls, True, 32)
    auto = Level(cpus, n_urls, True, auto_w)
    try:
        fixed.warm()
        auto.warm()
        jit_f = fixed.rep()["wall_s"]
        jit_a = auto.rep()["wall_s"]
        rf, ra = [], []
        for i in range(reps):
            want = i == reps - 1
            rf.append(fixed.rep(with_hash=want))
            ra.append(auto.rep(with_hash=want))
    finally:
        fixed.quit()
        auto.quit()

    wf = [r["wall_s"] for r in rf]
    wa = [r["wall_s"] for r in ra]
    df = [max(r["per_superstep"]) for r in rf]
    da = [max(r["per_superstep"]) for r in ra]
    out = {
        "ab": "pin_width 32 vs auto",
        "n_urls": n_urls,
        "cpus": cpus,
        "jit_warmup": {"fixed": jit_f, "auto": jit_a},
        "walls_fixed32": wf,
        "walls_auto": wa,
        "median_fixed32": statistics.median(wf),
        "median_auto": statistics.median(wa),
        "speedup_auto_over_fixed": round(
            statistics.median(wf) / statistics.median(wa), 3),
        "dominant_ss_fixed32": df,
        "dominant_ss_auto": da,
        "dominant_speedup": round(
            statistics.median(df) / statistics.median(da), 3),
        "order_hash_equal_across_widths": (
            rf[-1].get("order_hash") == ra[-1].get("order_hash")
            and rf[-1].get("order_hash") is not None),
        "order_rows": rf[-1].get("order_rows"),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
