"""Two-cluster-size scaling evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the N -> 4N executor criterion is
evidenced per BASELINE.md's protocol: the SAME crawl job on the SAME
deterministic input at two local parallelism levels (local[8] = N,
local[32] = 4N), reporting throughput at both, scaling efficiency, and a
crawl-order hash equality check (byte-identical ordering across parallelism).

Each level runs in its own subprocess (one JVM per master setting).
Writes BENCH/BASELINE.md and prints a JSON summary.

Usage: python tools/bench_scaling.py [n_urls]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time, hashlib
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

cpus, n_urls = int(sys.argv[1]), int(sys.argv[2])
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .appName("walk_spark-scaling")
         .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from walk_spark.config import CrawlConfig
from walk_spark.plans.crawl import crawl
from walk_spark.sources.pages import skewed_corpus

n_hosts = 64
pages = skewed_corpus(spark, n_urls=n_urls, n_hosts=n_hosts, out_degree=8,
                      partitions=max(cpus, 8))
pages = pages.localCheckpoint(eager=True)
cfg = CrawlConfig(seeds=["http://host0.test/p/0.html"],
                  domains=[f"http://host{{h}}.test" for h in range(n_hosts)],
                  record_redirects=False, seen_partitions=32)
t0 = time.monotonic()
r = crawl(spark, pages, cfg)
fetched = sum(m["batch"] for m in r.metrics)
dt = time.monotonic() - t0
order = r.order.orderBy("superstep", "discovery_seq", "url").collect()
h = hashlib.sha256()
for x in order:
    h.update(f'{{x["superstep"]}}|{{x["discovery_seq"]}}|{{x["url"]}}\n'.encode())
print(json.dumps({{
    "cpus": cpus, "n_urls": n_urls, "fetched": fetched,
    "wall_s": round(dt, 2), "urls_per_sec": round(fetched / dt, 1),
    "supersteps": len(r.metrics),
    "per_superstep": [m["wall_s"] for m in r.metrics],
    "order_rows": len(order), "order_hash": h.hexdigest(),
}}))
spark.stop()
"""


def run_level(cpus: int, n_urls: int) -> dict:
    script = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(n_urls)],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed: {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    r8 = run_level(8, n_urls)
    r32 = run_level(32, n_urls)
    eff = r32["urls_per_sec"] / (4 * r8["urls_per_sec"])
    same_order = r8["order_hash"] == r32["order_hash"]
    summary = {
        "n_urls": n_urls,
        "throughput_N_local8": r8["urls_per_sec"],
        "throughput_4N_local32": r32["urls_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "order_identical_across_parallelism": same_order,
        "detail": {"local8": r8, "local32": r32},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — two-cluster-size scaling evidence

Protocol (BASELINE.md "Sandbox evidencing protocol"): same crawl job, same
deterministic synthetic input ({n_urls} urls, 64 hosts, hot host 0 holding
~50%, out-degree 8), run at local[8] (N) and local[32] (4N), one JVM each.

| level | cpus | urls fetched | wall (s) | urls/sec | supersteps |
|---|---|---|---|---|---|
| N  | 8  | {r8['fetched']} | {r8['wall_s']} | {r8['urls_per_sec']} | {r8['supersteps']} |
| 4N | 32 | {r32['fetched']} | {r32['wall_s']} | {r32['urls_per_sec']} | {r32['supersteps']} |

- **scaling efficiency (urls_per_sec_4N / (4 × urls_per_sec_N)) = {eff:.3f}**
  (target ≥ 0.8; note local-mode caveat below)
- **crawl order byte-identical across parallelism: {same_order}**
  (sha256 over the canonical (superstep, discovery_seq, url) sequence:
  `{r8['order_hash'][:16]}…` at both levels)

Per-superstep wall (s), local[8]:  {r8['per_superstep']}
Per-superstep wall (s), local[32]: {r32['per_superstep']}

Caveat: local-mode threads share one JVM, one driver, and one Python-worker
pool, so fixed per-superstep costs (driver scheduling, Arrow batch setup)
don't shrink with more threads the way a real 4× cluster's scan/shuffle
bandwidth grows; the efficiency number here is a LOWER bound on cluster
scaling for the data-parallel stages (fetch join, extraction UDF, dedup
anti-join), which are embarrassingly partition-parallel. Run with larger
n_urls (`python tools/bench_scaling.py 200000`) to amortize fixed costs.
""")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
