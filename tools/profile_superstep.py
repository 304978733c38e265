"""Per-stage profile of the crawl superstep loop at one parallelism level.

Round-4 instrumentation (VERDICT.md next-round #1): the dominant superstep
scales 1.6x from 8->32 threads where the in-window parse-kernel ceiling
permits ~2.4x — this tool localizes the gap INSIDE the superstep. It runs
the protocol crawl (same corpus/config as tools/bench_scaling.py) with
``WALK_SPARK_TRACE`` on and the Spark UI REST API enabled, then attributes
every completed Spark stage to the superstep whose wall-clock window it was
submitted in, reporting per superstep and per stage-name:

  - wall attribution (driver trace: fetch_extract / seq pins / checkpoint),
  - executorRunTime (sum of task wall — the distributed-work denominator),
  - executorCpuTime (actual CPU — the bus-contention-free numerator),
  - task count and max task time (straggler visibility).

Run it at two levels and diff: a stage whose executorRunTime grows at 4N
is contending (memory bus / Python workers); a superstep whose wall gap to
max(stage walls) grows is driver-serialized.

Usage: python tools/profile_superstep.py [cpus] [n_urls] [out.json]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _parse_ts(s: str) -> float:
    # REST format: '2026-08-17T12:34:56.789GMT'
    return dt.datetime.strptime(
        s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
    ).timestamp()


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    os.environ["WALK_SPARK_TRACE"] = "1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("walk_spark-profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from walk_spark.config import CrawlConfig
    from walk_spark.plans import crawl as C
    from walk_spark.sources.pages import skewed_corpus, skewed_url

    n_hosts = 64
    pages = skewed_corpus(
        spark, n_urls=n_urls, n_hosts=n_hosts, out_degree=8, partitions=32
    )

    def mk_cfg():
        return CrawlConfig(
            seeds=[skewed_url(i, n_hosts) for i in range(1000)],
            domains=[f"http://host{h}.test" for h in range(n_hosts)],
            record_redirects=False, seen_partitions=32,
            use_bloom=True, dedup_pages=False,
        )

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def fetch_stages() -> list[dict]:
        url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url) as r:
            return json.loads(r.read())

    def stage_descriptions() -> dict[int, str]:
        """stageId -> job description (set by Crawler._jd per loop phase)."""
        url = f"{ui}/api/v1/applications/{app_id}/jobs"
        with urllib.request.urlopen(url) as r:
            jobs = json.loads(r.read())
        out: dict[int, str] = {}
        for j in jobs:
            desc = j.get("description") or j["name"].split(" at ")[0]
            for sid in j.get("stageIds", []):
                out[sid] = desc
        return out

    # record superstep wall-clock start times for stage attribution
    starts: list[tuple[int, float]] = []
    orig = C.Crawler._superstep

    def wrapped(self, batch):
        # run() increments self.superstep BEFORE calling _superstep
        starts.append((self.superstep, time.time()))
        return orig(self, batch)

    C.Crawler._superstep = wrapped

    Crawler = C.Crawler
    Crawler(spark, pages, mk_cfg()).warm()

    # one discarded JIT-warmup rep (protocol: first crawl pays compilation)
    t0 = time.monotonic()
    Crawler(spark, pages, mk_cfg()).run()
    jit_wall = round(time.monotonic() - t0, 2)
    seen_stage_ids = {s["stageId"] for s in fetch_stages()}
    starts.clear()

    t0 = time.monotonic()
    c = Crawler(spark, pages, mk_cfg())
    result = c.run()
    wall = round(time.monotonic() - t0, 2)
    t_end = time.time()

    stages = [s for s in fetch_stages() if s["stageId"] not in seen_stage_ids]
    descs = stage_descriptions()

    # superstep windows: [start_k, start_{k+1}) — checkpoint stages of k
    # land before k+1 starts, so they attribute correctly
    windows = [
        (k, t0s, starts[i + 1][1] if i + 1 < len(starts) else t_end)
        for i, (k, t0s) in enumerate(starts)
    ]

    def superstep_of(sub_ts: float) -> int:
        for k, a, b in windows:
            if a <= sub_ts < b:
                return k
        return -1

    per: dict[int, dict[str, dict]] = {}
    for s in stages:
        sub = _parse_ts(s["submissionTime"])
        k = superstep_of(sub)
        name = descs.get(s["stageId"], s["name"].split(" at ")[0])
        # phase label carries its own superstep (ssK:phase) — strip it so
        # attribution comes from the wall-clock window, then verify match
        if ":" in name and name.startswith("ss"):
            name = name.split(":", 1)[1]
        d = per.setdefault(k, {}).setdefault(
            name,
            {"n_stages": 0, "tasks": 0, "run_s": 0.0, "cpu_s": 0.0,
             "wall_s": 0.0, "in_bytes": 0, "shuffle_w": 0},
        )
        d["n_stages"] += 1
        d["tasks"] += s["numCompleteTasks"]
        d["run_s"] += s["executorRunTime"] / 1e3
        d["cpu_s"] += s["executorCpuTime"] / 1e9
        if s.get("completionTime"):
            d["wall_s"] += _parse_ts(s["completionTime"]) - sub
        d["in_bytes"] += s.get("inputBytes", 0)
        d["shuffle_w"] += s.get("shuffleWriteBytes", 0)

    for k in per:
        for d in per[k].values():
            for f in ("run_s", "cpu_s", "wall_s"):
                d[f] = round(d[f], 2)

    out = {
        "cpus": cpus,
        "n_urls": n_urls,
        "jit_warmup_wall_s": jit_wall,
        "wall_s": wall,
        "fetched": sum(m["batch"] for m in result.metrics),
        "metrics": result.metrics,
        "stages_by_superstep": {str(k): per.get(k, {}) for k in sorted(per)},
        "totals": {
            "run_s": round(sum(s["executorRunTime"] for s in stages) / 1e3, 2),
            "cpu_s": round(sum(s["executorCpuTime"] for s in stages) / 1e9, 2),
        },
    }
    text = json.dumps(out, indent=1)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
    print(text)
    spark.stop()


if __name__ == "__main__":
    main()
