"""Priority-queue frontier pick (north rule: "priority queue") —
``queue_mode='priority'``: the budgeted pick orders by a user priority
expression (higher first) with the canonical FIFO order as tie-break,
instead of pure canonical order."""

from pyspark.sql import functions as F

from walk_spark.config import CrawlConfig
from walk_spark.operators import politeness as P
from walk_spark.operators.frontier import ORDER_COLS
from walk_spark.plans.crawl import crawl
from walk_spark.sources.pages import tree_site_pages


def _queued(spark):
    return spark.range(0, 300).select(
        F.concat(F.lit("http://h"), (F.col("id") % 3).cast("string"),
                 F.lit(".test/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 3).cast("string"),
                 F.lit(".test")).alias("host"),
        (F.col("id") % 4).cast("int").alias("depth"),
        F.col("id").alias("discovery_seq"),
        (F.col("id") % 7).cast("double").alias("score"),
    )


def test_pick_budget_priority_order(spark):
    """With a priority order, the per-host pick takes the TOP-k by the
    priority expression (desc), ties broken by canonical order — verified
    against a pandas recomputation, on both window paths (salted two-phase
    and single-window)."""
    q = _queued(spark)
    order = [F.col("score").desc()] + [F.col(c) for c in ORDER_COLS]
    pdf = q.toPandas()
    expect = set()
    for _, g in pdf.groupby("host"):
        g = g.sort_values(
            ["score", "depth", "discovery_seq", "url"],
            ascending=[False, True, True, True])
        expect.update(g.head(5)["url"])
    two_phase = {r["url"] for r in
                 P.pick_budget_window(q, 5, order=order).collect()}
    single = {r["url"] for r in
              P.pick_budget_window(q, 5, order=order,
                                   approx_queued=300).collect()}
    assert two_phase == expect == single


def test_cap_batch_priority_order(spark):
    q = _queued(spark)
    order = [F.col("score").desc()] + [F.col(c) for c in ORDER_COLS]
    got = P.cap_batch(q, 10, order=order).toPandas().sort_values("url")
    pdf = q.toPandas().sort_values(
        ["score", "depth", "discovery_seq", "url"],
        ascending=[False, True, True, True]).head(10).sort_values("url")
    assert list(got["url"]) == list(pdf["url"])


def test_priority_crawl_same_visit_set_different_order(spark):
    """A priority crawl under a tight per-host budget visits the SAME url
    set as FIFO once drained (the frontier is exhaustive either way) but
    schedules deep urls first when the priority expression says so."""
    pages = tree_site_pages(spark)
    base = dict(seeds=["http://qri.test/"], domains=["http://qri.test"],
                host_budget_per_superstep=3, seen_partitions=4)
    fifo = crawl(spark, pages, CrawlConfig(**base))
    prio = crawl(spark, pages, CrawlConfig(
        **base, queue_mode="priority", priority_expr="depth"))
    f_set = {r["url"] for r in fifo.frontier.collect()}
    p_set = {r["url"] for r in prio.frontier.collect()}
    assert f_set == p_set
    # depth-desc priority: whenever depth-2 urls are queued alongside
    # depth-1, the picked batch prefers the deeper ones -> the fetch order
    # (superstep of fetch per url) must differ from FIFO's
    f_fetch = {r["url"]: r["superstep"]
               for r in fifo.order.collect()}
    p_fetch = {r["url"]: r["superstep"]
               for r in prio.order.collect()}
    assert f_fetch.keys() == p_fetch.keys()
    assert f_fetch != p_fetch
