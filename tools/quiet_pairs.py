"""W-stratified quiet-pair analysis over BENCH/runs.jsonl — the durable
evidence format for the N->4N scaling criterion on this co-tenanted VM.

Every protocol pair (tools/bench_scaling.py) carries two same-window
hardware controls measured around ITS OWN reps:

- k  — the external parse-kernel multiprocessing ceiling (perfectly
       parallel work, same memory-bound shape as the crawl);
- W  — the in-job CPU-inflation ratio exec_cpu_4N / exec_cpu_N over
       provably identical work (order-hash-equal output). W ≈ 1 means the
       box ran the same instructions without extra memory-stall cycles at
       4N; W ≥ 2 means the bus was contended (co-tenant or SMT) BEFORE any
       engine property enters the measurement.

A pair is QUIET when W <= W_MAX (default 1.3). The headline is the
stratified median of normalized efficiencies over quiet pairs — all pairs
disclosed, loud ones shown with their W so the stratification is
auditable, never hidden.

Usage: python tools/quiet_pairs.py [W_MAX]   (writes nothing; prints the
markdown table + JSON summary for BENCH/BASELINE.md's round analysis)
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_pairs(path: str | None = None) -> list[dict]:
    path = path or os.path.join(REPO, "BENCH", "runs.jsonl")
    pairs = []
    with open(path) as f:
        runs = [json.loads(ln) for ln in f if ln.strip()]
    for ri, r in enumerate(runs, start=1):
        effs = r.get("pair_efficiencies") or []
        ws = r.get("pair_cpu_work_ratio_4N_over_N") or [None] * len(effs)
        norms = r.get("pair_normalized") or [None] * len(effs)
        kerns = r.get("pair_kernel_ceilings") or [None] * len(effs)
        valid = r.get("pair_kernel_valid") or [True] * len(effs)
        doms = r.get("pair_efficiencies_dominant_superstep") or [None] * len(effs)
        for pi in range(len(effs)):
            pairs.append({
                "run": ri,
                "protocol": r.get("protocol", "?"),
                "levels": r.get("levels"),
                "n_urls": r.get("n_urls"),
                "pin_width": r.get("pin_width", 32),
                "pair": pi + 1,
                "raw": effs[pi],
                "dom": doms[pi],
                "W": ws[pi],
                "kernel": kerns[pi],
                "kernel_valid": valid[pi],
                "norm": norms[pi],
            })
    return pairs


def stratify(pairs: list[dict], w_max: float = 1.3) -> dict:
    """Quiet = W <= w_max AND the pair's kernel sample was physically
    possible (<= 1.0); pairs missing W (old protocol rows) are excluded
    from the quiet stratum but disclosed."""
    quiet = [p for p in pairs
             if p["W"] is not None and p["W"] <= w_max and p["kernel_valid"]]
    loud = [p for p in pairs if p not in quiet]
    out = {
        "w_max": w_max,
        "n_pairs": len(pairs),
        "n_quiet": len(quiet),
        "quiet_raw_median": (statistics.median([p["raw"] for p in quiet])
                             if quiet else None),
        "quiet_norm_median": (statistics.median([p["norm"] for p in quiet])
                              if quiet else None),
        "quiet_runs": sorted({p["run"] for p in quiet}),
        "all_raw_median": statistics.median([p["raw"] for p in pairs])
        if pairs else None,
    }
    out["quiet"] = quiet
    out["loud"] = loud
    return out


def markdown_table(pairs: list[dict], w_max: float = 1.3) -> str:
    hdr = ("| run | pair | levels | width | raw eff | dom-ss eff | W "
           "| kernel | normalized | stratum |\n"
           "|---|---|---|---|---|---|---|---|---|---|")
    lines = [hdr]
    for p in pairs:
        quiet = (p["W"] is not None and p["W"] <= w_max
                 and p["kernel_valid"])
        lines.append(
            f"| {p['run']} | {p['pair']} | {p['levels']} | {p['pin_width']} "
            f"| {p['raw']} | {p['dom']} | {p['W']} "
            f"| {p['kernel']}{'' if p['kernel_valid'] else ' (contaminated)'} "
            f"| {p['norm']} | {'QUIET' if quiet else 'loud'} |"
        )
    return "\n".join(lines)


def main() -> None:
    w_max = float(sys.argv[1]) if len(sys.argv) > 1 else 1.3
    pairs = load_pairs()
    s = stratify(pairs, w_max)
    print(markdown_table(pairs, w_max))
    print()
    print(json.dumps({k: v for k, v in s.items()
                      if k not in ("quiet", "loud")}, indent=2))


if __name__ == "__main__":
    main()
