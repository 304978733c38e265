"""Crawler.forget_urls — retract urls from the crawl state so they can be
fetched again (forced re-fetch, an extension beyond the reference's
request-store API). With ``seen_filter='cuckoo'`` the standing filters
drop the urls' fingerprints in place (the deletion capability the cuckoo
kind exists for); with bloom bitsets the filters are rebuilt from the
reduced frontier (shared bits — no per-item delete)."""

from pyspark.sql import functions as F

from walk_spark.config import CrawlConfig
from walk_spark.operators.frontier import STATUS_QUEUED
from walk_spark.plans.crawl import Crawler
from walk_spark.sources.pages import tree_site_pages


def _cfg(kind):
    return CrawlConfig(
        seeds=["http://qri.test/"], domains=["http://qri.test"],
        use_bloom=True, seen_filter=kind,
        bloom_num_bits=65536, seen_partitions=4,
    )


def _run_forget_refetch(spark, kind):
    c = Crawler(spark, tree_site_pages(spark), _cfg(kind))
    r1 = c.run()
    first = {x["url"]: x["superstep"] for x in r1.order.collect()}
    target = sorted(u for u in first if u != "http://qri.test/")[0]
    n_rows = c.frontier.count()

    removed = c.forget_urls([target])
    assert removed == 1
    assert c.frontier.count() == n_rows - 1
    assert c.frontier.filter(F.col("url") == target).count() == 0

    # the url is no longer "seen": re-seeding it fetches it again, once,
    # and nothing else is re-fetched
    c.add_seeds([target])
    r2 = c.run()
    c.close()
    order = [(x["url"], x["superstep"]) for x in r2.order.collect()]
    refetches = [s for (u, s) in order if u == target]
    assert len(refetches) == 2  # original fetch + the forced re-fetch
    assert max(refetches) > max(first.values())
    for u, s in order:
        if u != target:
            assert s <= max(first.values()), f"{u} unexpectedly re-fetched"
    # and the frontier holds the url exactly once, done again
    rows = c.frontier.filter(F.col("url") == target).collect()
    assert len(rows) == 1


def test_forget_refetch_cuckoo(spark):
    _run_forget_refetch(spark, "cuckoo")


def test_forget_refetch_bloom(spark):
    _run_forget_refetch(spark, "bloom")


def test_forget_queued_url_dequeues_then_rediscovers_once(spark):
    """Forgetting a QUEUED url removes it from the frontier immediately;
    it is fetched later only if another fetched page re-links it — and
    then exactly once, with a discovery_seq assigned at re-discovery
    (no duplicate rows, no stale seq)."""
    cfg = _cfg("cuckoo")
    cfg.max_supersteps = 1
    c = Crawler(spark, tree_site_pages(spark), cfg)
    c.run()
    queued = {r["url"]: r["discovery_seq"] for r in
              c.frontier.filter(F.col("status") == STATUS_QUEUED).collect()}
    assert queued, "superstep cap should leave queued urls"
    victim = sorted(queued)[0]
    assert c.forget_urls([victim]) == 1
    assert c.frontier.filter(F.col("url") == victim).count() == 0
    c.cfg.max_supersteps = 100
    r = c.run()
    c.close()
    # re-discovered through other pages' links: fetched exactly once,
    # one frontier row, with a NEW (later) discovery sequence
    assert r.order.filter(F.col("url") == victim).count() == 1
    rows = c.frontier.filter(F.col("url") == victim).collect()
    assert len(rows) == 1
    assert rows[0]["discovery_seq"] > queued[victim]


def test_forget_unknown_url_is_noop(spark):
    c = Crawler(spark, tree_site_pages(spark), _cfg("bloom"))
    c.run()
    n = c.frontier.count()
    assert c.forget_urls(["http://qri.test/never-existed.html"]) == 0
    assert c.frontier.count() == n
    c.close()
