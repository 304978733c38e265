"""Traced bench-shape crawl — per-superstep phase timings (guide §1).

Runs the exact bench.py crawl construction (20k-url skewed corpus,
1000 seeds, bloom on) with WALK_SPARK_TRACE=1 and prints each superstep's
trace dict plus the total. Not the driver metric; a measurement harness
for the fixed-cost breakdown of the superstep loop.

Usage: python tools/trace_crawl.py [reps]
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("WALK_SPARK_TRACE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_crawl, make_session  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = make_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    for rep in range(reps):
        dt, stats = bench_crawl(spark, use_bloom=True)
        print(f"rep {rep}: wall {dt:.2f}s "
              f"{stats['urls_fetched']} urls {stats['supersteps']} ss")
    # metrics live on the last Crawler; bench_crawl returns only summary —
    # rerun once holding the Crawler to get traces
    from walk_spark.config import CrawlConfig
    from walk_spark.plans.crawl import Crawler
    from walk_spark.sources.pages import skewed_corpus, skewed_url

    n_urls, n_hosts = 20000, 64
    pages = skewed_corpus(spark, n_urls=n_urls, n_hosts=n_hosts, out_degree=8)
    cfg = CrawlConfig(
        seeds=[skewed_url(i, n_hosts) for i in range(1000)],
        domains=[f"http://host{h}.test" for h in range(n_hosts)],
        record_redirects=False,
        seen_partitions=32,
        dedup_pages=False,
        use_bloom=True,
        bloom_expected_items=n_urls,
        bloom_num_bits=max(10 * n_urls // 32, 65536),
    )
    c = Crawler(spark, pages, cfg)
    c.warm()
    import time
    t0 = time.monotonic()
    r = c.run()
    wall = time.monotonic() - t0
    print(f"traced run: wall {wall:.2f}s")
    for m in r.metrics:
        print(json.dumps(m))
    spark.stop()


if __name__ == "__main__":
    main()
