"""Checkpoint/resume (F17): kill mid-crawl, resume, byte-identical state."""

import tempfile

from pyspark.sql import functions as F

from walk_spark.config import CrawlConfig
from walk_spark.plans.crawl import Crawler, crawl
from walk_spark.sources.pages import tree_site_pages


def _cfg(**kw):
    base = dict(
        seeds=["http://qri.test/"], domains=["http://qri.test"],
        host_budget_per_superstep=5,
    )
    base.update(kw)
    return CrawlConfig(**base)


def _order_tuples(r):
    return [
        (x["superstep"], x["discovery_seq"], x["url"])
        for x in r.order.orderBy("superstep", "discovery_seq", "url").collect()
    ]


def test_kill_and_resume_is_identical(spark):
    wd = tempfile.mkdtemp()
    pages = tree_site_pages(spark)
    # "kill" after 2 supersteps
    c = Crawler(spark, pages, _cfg(max_supersteps=2), workdir=wd)
    c.run()
    assert c.superstep == 2
    # resume with the full config and finish
    c2 = Crawler.resume(spark, pages, _cfg(), wd)
    assert c2.superstep == 2
    r_resumed = c2.run()
    # uninterrupted reference run
    r_full = crawl(spark, pages, _cfg())
    assert _order_tuples(r_resumed) == _order_tuples(r_full)
    a = {(x["url"], x["status"], x["attempts"], x["discovery_seq"])
         for x in r_resumed.frontier.collect()}
    b = {(x["url"], x["status"], x["attempts"], x["discovery_seq"])
         for x in r_full.frontier.collect()}
    assert a == b
    # resources parts reassembled completely (ok rows match)
    assert (
        r_resumed.ok_resources().count() == r_full.ok_resources().count()
    )


def test_resume_of_finished_crawl_is_noop(spark):
    wd = tempfile.mkdtemp()
    pages = tree_site_pages(spark)
    c = Crawler(spark, pages, _cfg(), workdir=wd)
    r1 = c.run()
    n_metrics = len(r1.metrics)
    c2 = Crawler.resume(spark, pages, _cfg(), wd)
    r2 = c2.run()
    assert len(r2.metrics) == n_metrics  # no extra supersteps ran
    assert r2.frontier.filter(F.col("status") == "queued").count() == 0
