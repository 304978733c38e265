"""Bench harness — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline components:
- crawl            — full BFS crawl of a deterministic 20k-url skewed corpus
                     (the engine's flagship path); also reported as
                     urls_per_sec (fetched+deduped URLs / crawl seconds,
                     the BASELINE.json metric shape)
- q1_pricing_summary, jaccard/minhash/simhash dedup, embedding top-k,
  token_stats — the relational + training-data operators at sf.

Scaling evidence across two parallelism levels is produced by
tools/bench_scaling.py (writes BENCH/BASELINE.md); this file is the
per-round feedback loop.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402


def make_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("walk_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def bench_crawl(spark: SparkSession, n_urls: int = 20000) -> tuple[float, dict]:
    from walk_spark.config import CrawlConfig
    from walk_spark.plans.crawl import crawl
    from walk_spark.sources.pages import skewed_corpus, skewed_url

    n_hosts = 64
    pages = skewed_corpus(spark, n_urls=n_urls, n_hosts=n_hosts, out_degree=8)
    # the Crawler disk-persists its prepped projection — one corpus copy
    cfg = CrawlConfig(
        # 1000-seed list (walk's real shape, readme.md:52) — BFS from one
        # seed spends its first supersteps on unparallelizable tiny batches
        seeds=[skewed_url(i, n_hosts) for i in range(1000)],
        domains=[f"http://host{h}.test" for h in range(n_hosts)],
        record_redirects=False,
        seen_partitions=32,
    )
    t0 = time.monotonic()
    r = crawl(spark, pages, cfg)
    fetched = sum(m["batch"] for m in r.metrics)
    dt = time.monotonic() - t0
    return dt, {
        "urls_fetched": fetched,
        "supersteps": len(r.metrics),
        "urls_per_sec": round(fetched / dt, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = make_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qfns = entry.queries()
    headline = [
        "q1_pricing_summary", "argmax_latest", "last_write_wins",
        "dedup_exact", "token_stats", "quality_score", "jaccard_pairs",
        "minhash_lsh_dedup", "simhash_dedup", "embedding_cosine_topk",
        "ann_lsh_topk", "embedding_dup_pairs",
    ]
    times: dict[str, float] = {}
    for name in headline:
        t0 = time.monotonic()
        df = qfns[name](spark, sf_dir)
        n = df.count()
        times[name] = round(time.monotonic() - t0, 3)
        _ = n

    crawl_s, crawl_stats = bench_crawl(spark)
    times["crawl"] = round(crawl_s, 3)

    total = round(sum(times.values()), 3)
    out = {
        "metric": "total_sec_headline_queries_plus_crawl",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "crawl": crawl_stats,
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
