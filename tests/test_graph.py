"""Link-graph analytics: degrees + PageRank vs a numpy reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from walk_spark.operators.graph import degrees, pagerank, top_pages


@pytest.fixture(scope="module")
def edges(spark):
    # 0->1, 0->2, 1->2, 2->0, 3->2 (3 is unreachable-from, 1 dangling? no:
    # every node has out-edges except none — add dangling node 4: 2->4)
    E = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (2, 4)]
    rows = [(f"u{a}", f"u{b}") for a, b in E]
    return spark.createDataFrame(rows, ["src", "dst"]), E


def _numpy_pagerank(E, n, alpha=0.85, iters=10):
    out = np.zeros(n)
    for a, _ in E:
        out[a] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        for a, b in E:
            nxt[b] += alpha * r[a] / out[a]
        dangling = alpha * r[out == 0].sum()
        nxt += (1 - alpha) / n + dangling / n
        r = nxt
    return r


def test_degrees(edges):
    df, E = edges
    got = {r["url"]: (r["out_degree"], r["in_degree"])
           for r in degrees(df).collect()}
    assert got["u0"] == (2, 1)
    assert got["u2"] == (2, 3)
    assert got["u4"] == (0, 1)
    assert got["u3"] == (1, 0)


def test_pagerank_matches_numpy(edges):
    df, E = edges
    got = {r["url"]: r["rank"] for r in pagerank(df, iters=10).collect()}
    ref = _numpy_pagerank(E, 5, iters=10)
    assert abs(sum(got.values()) - 1.0) < 1e-9  # probability vector
    for i in range(5):
        assert abs(got[f"u{i}"] - ref[i]) < 1e-9, (i, got[f"u{i}"], ref[i])


def test_top_pages(edges):
    df, E = edges
    top = [r["url"] for r in top_pages(df, k=2).collect()]
    ref = _numpy_pagerank(E, 5, iters=10)
    assert top == [f"u{i}" for i in np.argsort(-ref)[:2]]


def test_pagerank_on_crawl_output(spark):
    from walk_spark.config import CrawlConfig
    from walk_spark.operators.queries import link_edges
    from walk_spark.plans.crawl import crawl
    from walk_spark.sources.pages import self_linking_pages
    r = crawl(
        spark, self_linking_pages(spark),
        CrawlConfig(seeds=["http://self.test"], domains=["http://self.test"]),
    )
    e = link_edges(r.ok_resources()).select("src", "dst")
    pr = pagerank(e, iters=5)
    # symmetric complete-ish graph -> near-uniform ranks
    vals = [x["rank"] for x in pr.collect()]
    assert abs(sum(vals) - 1.0) < 1e-9
    assert max(vals) - min(vals) < 0.05