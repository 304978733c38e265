"""Render two profile_superstep.py JSONs (N and 4N) into the per-stage
scaling breakdown markdown (BENCH/PROFILE_r4.md) — the evidence table for
the dominant-superstep scaling analysis: which loop phase scales, which is
serial, and how close the dominant superstep sits to its hardware ceiling.

Usage: python tools/profile_report.py prof_N.json prof_4N.json [out.md]
"""

from __future__ import annotations

import json
import sys

PHASES = [
    # (report label, how to get the phase's driver-wall duration from trace)
    ("fetch+extract (pin)", lambda t: t["fetch_extract"]),
    ("bloom wait", lambda t: t["bloom_update"] - t["fetch_extract"]),
    ("expansion build", lambda t: t.get("expand_build", t.get("bloom_bcast", 0.0))),
    ("seq input pin", lambda t: t["seq_input_pin"]),
    ("seq rank pin", lambda t: t["seq_rank_pin"]),
    ("seq counts", lambda t: t.get("seq_counts", 0.0)),
    ("checkpoint pin", lambda t: t["checkpoint"]),
]


def main() -> None:
    with open(sys.argv[1]) as f:
        dN = json.load(f)
    with open(sys.argv[2]) as f:
        d4 = json.load(f)
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    ratio = d4["cpus"] // dN["cpus"]
    lines = [
        "# Per-stage superstep profile — "
        f"local[{dN['cpus']}] (N) vs local[{d4['cpus']}] ({ratio}N), "
        f"{dN['n_urls']} urls",
        "",
        f"Whole-crawl wall: N = {dN['wall_s']} s, {ratio}N = {d4['wall_s']} s "
        f"(raw eff {dN['wall_s'] / (ratio * d4['wall_s']):.3f}); "
        f"fetched {dN['fetched']} urls at both levels.",
        "",
        "Phase walls are driver-side monotonic timings (WALK_SPARK_TRACE); "
        "'expansion build' is the candidate pipeline's shuffle-stage "
        "materialization (explode → filter → host/part_id → dedup → bloom "
        "probe plan build), 'eff' = wall_N / "
        f"({ratio} × wall_{ratio}N).",
        "",
    ]
    for mN, m4 in zip(dN["metrics"], d4["metrics"]):
        k = mN["superstep"]
        tN, t4 = mN["trace"], m4["trace"]
        lines.append(
            f"## superstep {k} — batch {mN['batch']}, new {mN['new_urls']}; "
            f"wall {mN['wall_s']} s vs {m4['wall_s']} s "
            f"(eff {mN['wall_s'] / (ratio * m4['wall_s']):.3f})"
        )
        lines.append("")
        lines.append(f"| phase | N wall (s) | {ratio}N wall (s) | eff |")
        lines.append("|---|---|---|---|")
        for label, get in PHASES:
            a, b = get(tN), get(t4)
            eff = f"{a / (ratio * b):.2f}" if b > 0.05 else "—"
            lines.append(f"| {label} | {a:.2f} | {b:.2f} | {eff} |")
        lines.append("")
        sN = dN["stages_by_superstep"].get(str(k), {})
        s4 = d4["stages_by_superstep"].get(str(k), {})
        names = sorted(
            set(sN) | set(s4),
            key=lambda n: -(sN.get(n, {}).get("run_s", 0.0)),
        )
        lines.append(
            f"| stage group | N run-s | N cpu-s | {ratio}N run-s | "
            f"{ratio}N cpu-s | cpu inflation |"
        )
        lines.append("|---|---|---|---|---|---|")
        for n in names:
            a = sN.get(n, {})
            b = s4.get(n, {})
            ca, cb = a.get("cpu_s", 0.0), b.get("cpu_s", 0.0)
            infl = f"{cb / ca:.2f}x" if ca > 0.5 else "—"
            lines.append(
                f"| {n} | {a.get('run_s', 0):.1f} | {ca:.1f} "
                f"| {b.get('run_s', 0):.1f} | {cb:.1f} | {infl} |"
            )
        lines.append("")
    lines.append(
        "Stage-group cpu inflation (same work, order-hash-identical "
        "output) is the in-JVM hardware-contention gauge: SMT pairs share "
        "physical cores and one memory bus at the higher level, so "
        "executorCpuTime inflates for IDENTICAL work; its reciprocal is "
        "the packing ceiling for that group. Python-UDF time (the extract "
        "kernel) is invisible to executorCpuTime — its stage groups show "
        "low cpu-s and their run-s is Arrow-wait; the external "
        "parse-kernel multiprocessing control covers that side."
    )
    text = "\n".join(lines) + "\n"
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
