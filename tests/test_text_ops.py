"""Text-analysis kernels + offline queries (sitemap golden, inbound links)."""

import json

import pytest
from pyspark.sql import functions as F

from walk_spark.config import CrawlConfig
from walk_spark.functions import text as T
from walk_spark.operators import queries as Q
from walk_spark.operators.sitemap import (
    cdxj_index, render_sitemap_json, sitemap_entries, sorted_index_page,
)
from walk_spark.plans.crawl import crawl
from walk_spark.sources.pages import (
    self_linking_pages, tree_site_pages, two_page_pages,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "Hello, world! 42 times"), (1, ""), (2, "  spaced   out  ")],
        ["doc_id", "text"],
    )
    got = df.select(
        "doc_id",
        T.token_count_ws(F.col("text")).alias("ws"),
        T.token_count_bpe(F.col("text")).alias("bpe"),
    ).collect()
    by = {r["doc_id"]: (r["ws"], r["bpe"]) for r in got}
    assert by[0] == (4, 6)  # Hello , world ! 42 times
    assert by[1] == (0, 0)
    assert by[2] == (2, 2)


def test_lang_id_and_quality(spark):
    en = ("the cat sat on the mat and it was happy to be in the sun "
          "for a while with the dog")
    junk = "zzz qqq 12345 !!!! @@@@"
    df = spark.createDataFrame([(0, en), (1, junk)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in df.select(
        "doc_id",
        T.lang_id(F.col("text")).alias("lang"),
        T.quality_score(F.col("text")).alias("q"),
    ).collect()}
    assert got[0]["lang"] == "en" and got[1]["lang"] == "unknown"
    assert got[0]["q"] > got[1]["q"]


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "hello worlds")],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", T.fingerprint_md5(F.col("text")).alias("fp")).collect()}
    assert fps[0] == fps[1] != fps[2]


def test_shingles(spark):
    df = spark.createDataFrame([(0, "a b c d")], ["doc_id", "text"])
    got = df.select(T.shingles(F.col("text"), 3).alias("s")).first()["s"]
    assert sorted(got) == ["a b c", "b c d"]


# -- sitemap golden (the reference's own oracle, byte-for-byte) ---------------

# verbatim from lib/sitemap_test.go:52-76 (the reference feeds
# exampleResourceA/Aa directly to the generator; an invalid-url resource is
# dropped; keys are normalized, entries keep raw urls and raw links)
GOLDEN_SITEMAP_BYTES = """{
  "http://a.com": {
    "url": "https://www.a.com",
    "title": "",
    "timestamp": "1999-11-30T00:00:00Z",
    "status": 200,
    "redirects": null,
    "resources": null,
    "links": [
      "https://www.a.com/a",
      "https://www.a.com/b"
    ]
  },
  "http://a.com/a": {
    "url": "https://www.a.com/a",
    "title": "",
    "timestamp": "1999-11-30T00:00:00Z",
    "status": 200,
    "redirects": null,
    "resources": null,
    "links": [
      "https://www.a.com"
    ]
  }
}"""


def test_sitemap_golden_byte_identical(spark):
    """Replicates TestSitemapGenerator (lib/sitemap_test.go:19-81) exactly:
    feed the two fixture resources plus one invalid-url resource, render,
    byte-compare against the reference's inline golden."""
    import datetime as dt
    ts = dt.datetime(1999, 11, 30)
    rows = [
        ("https://www.a.com", "", ts, 200,
         ["https://www.a.com/a", "https://www.a.com/b"], 1),
        ("https://www.a.com/a", "", ts, 200, ["https://www.a.com"], 1),
        (":::::", "", ts, 200, [], 1),  # invalid url -> dropped (bad key)
    ]
    res = spark.createDataFrame(
        rows, "url string, title string, warc_ts timestamp, status int, "
              "links array<string>, superstep int"
    )
    got = render_sitemap_json(sitemap_entries(res))
    assert got == GOLDEN_SITEMAP_BYTES


def test_sitemap_last_write_wins(spark):
    cfg = CrawlConfig(seeds=["https://www.a.com"], domains=["https://www.a.com"])
    r = crawl(spark, two_page_pages(spark), cfg)
    entries = sitemap_entries(r.ok_resources())
    by_key = {x["key"]: x for x in entries.collect()}
    # the normalized twin (fetched later) wins the http://a.com key
    assert by_key["http://a.com"]["url"] == "http://a.com"
    assert set(by_key) == {"http://a.com", "http://a.com/a"}


def test_inbound_links(spark):
    cfg = CrawlConfig(seeds=["http://self.test"], domains=["http://self.test"])
    r = crawl(spark, self_linking_pages(spark), cfg)
    got = [x["url"] for x in
           Q.inbound_links(r.ok_resources(), "http://self.test/a.html").collect()]
    # every page links to a.html
    assert got == sorted([
        "http://self.test", "http://self.test/a.html",
        "http://self.test/b.html", "http://self.test/c.html",
    ])


def test_cdxj_index_surt_sorted(spark):
    cfg = CrawlConfig(seeds=["http://self.test"], domains=["http://self.test"])
    r = crawl(spark, self_linking_pages(spark), cfg)
    idx = cdxj_index(r.ok_resources()).collect()
    keys = [x["surt_url"] for x in idx]
    assert keys == sorted(keys)
    assert keys[0].startswith("test,self)")
    page = sorted_index_page(r.ok_resources(), limit=2, offset=1).collect()
    assert [x["surt_url"] for x in page] == keys[1:3]


def test_collection_latest(spark):
    cfg = CrawlConfig(seeds=["http://self.test"], domains=["http://self.test"])
    r1 = crawl(spark, self_linking_pages(spark), cfg)
    r2 = crawl(spark, self_linking_pages(spark), cfg)
    merged = Q.collection_latest(r1.ok_resources(), r2.ok_resources())
    assert merged.count() == 4  # one winner per url across both walks


def test_timespan_and_clean(spark):
    cfg = CrawlConfig(seeds=["http://self.test"], domains=["http://self.test"])
    r = crawl(spark, self_linking_pages(spark), cfg)
    ts = Q.timespan(r.ok_resources()).first()
    assert ts["start"] <= ts["end"]
    entries = sitemap_entries(r.ok_resources())
    kept, stats = Q.clean(entries, "http://self.test/a")
    assert stats["removed"] == 1 and stats["kept"] == stats["total"] - 1
    assert kept.filter(F.col("url") == "http://self.test/a.html").count() == 0


def test_get_capture(spark):
    """Archive point lookup + redirect resolution (lib/walk.go:167-210,
    api/collection_handlers.go:164-187)."""
    from walk_spark.sources.pages import redirect_chain_pages
    cfg = CrawlConfig(
        seeds=["http://redir.test/r0"], domains=["http://redir.test"],
        record_redirects=True,
    )
    r = crawl(spark, redirect_chain_pages(spark), cfg)
    raw = Q.get_capture(r.resources, "http://redir.test/r0")
    assert raw is not None and raw["redirect_to"] == "http://redir.test/r1"
    resolved = Q.get_capture(
        r.resources, "http://redir.test/r0", follow_redirects=True
    )
    assert resolved["url"] == "http://redir.test/final"
    assert resolved["status"] == 200
    assert Q.get_capture(r.resources, "http://nowhere.test/") is None


def test_find_index(spark):
    cfg = CrawlConfig(seeds=["http://self.test"], domains=["http://self.test"])
    r = crawl(spark, self_linking_pages(spark), cfg)
    pos = Q.find_index(r.ok_resources(), "http://self.test/a.html")
    assert 0 <= pos < 4
    assert Q.find_index(r.ok_resources(), "http://nowhere.test/") == -1


def test_collection_latest_tie_is_one_whole_row(spark):
    """Two walks tie on (warc_ts, superstep) for the same url: the winner
    must be ONE row (the later-listed walk), never a column mix."""
    import datetime as dt
    ts = dt.datetime(2000, 1, 1)
    schema = "url string, warc_ts timestamp, superstep int, title string, hash string"
    w1 = spark.createDataFrame([("http://a/", ts, 1, "t1", "h1")], schema)
    w2 = spark.createDataFrame([("http://a/", ts, 1, "t2", "h2")], schema)
    row = Q.collection_latest(w1, w2).first()
    assert (row["title"], row["hash"]) == ("t2", "h2")
    row = Q.collection_latest(w2, w1).first()
    assert (row["title"], row["hash"]) == ("t1", "h1")


def test_distributed_sitemap_table_equals_single_file(spark, tmp_path):
    """write_sitemap_table parts, concatenated in filename order, are
    byte-identical to render_sitemap_json — the archive-scale finalize
    (mirrors the CDXJ auto-switch); finalize_sitemap picks the path by
    entry count (forced both ways here) and the golden fixture round-trips
    through the distributed writer too."""
    import datetime as dt
    from walk_spark.operators.sitemap import (
        concat_sitemap_table, finalize_sitemap, write_sitemap_table,
    )

    cfg = CrawlConfig(seeds=["http://qri.test/"], domains=["http://qri.test"])
    r = crawl(spark, tree_site_pages(spark), cfg)
    entries = sitemap_entries(r.ok_resources())
    single = render_sitemap_json(entries)
    d = str(tmp_path / "sitemap.d")
    write_sitemap_table(entries, d, partitions=7)
    assert concat_sitemap_table(d) == single

    # the golden fixture through the distributed writer (escapes, nulls,
    # link arrays all byte-exact)
    ts = dt.datetime(1999, 11, 30)
    res = spark.createDataFrame(
        [("https://www.a.com", "", ts, 200,
          ["https://www.a.com/a", "https://www.a.com/b"], 1),
         ("https://www.a.com/a", "", ts, 200, ["https://www.a.com"], 1)],
        "url string, title string, warc_ts timestamp, status int, "
        "links array<string>, superstep int")
    g = str(tmp_path / "golden.d")
    write_sitemap_table(sitemap_entries(res), g, partitions=3)
    assert concat_sitemap_table(g) == GOLDEN_SITEMAP_BYTES

    # finalize_sitemap: forced single file vs forced table agree
    p1 = finalize_sitemap(entries, str(tmp_path / "s.json"), partitions=0)
    assert open(p1).read() == single
    p2 = finalize_sitemap(entries, str(tmp_path / "s2.json"), partitions=5)
    assert p2.endswith(".d") and concat_sitemap_table(p2) == single

    # re-finalizing the SAME out_path in the other form removes the stale
    # sibling artifact (a consumer must never read a leftover), and
    # read_sitemap_json falls back to the .d table when only it exists
    import os
    from walk_spark.operators.sitemap import read_sitemap_json
    base = str(tmp_path / "swap.json")
    finalize_sitemap(entries, base, partitions=0)
    finalize_sitemap(entries, base, partitions=5)
    assert os.path.isdir(base + ".d") and not os.path.exists(base)
    got = {r["key"] for r in read_sitemap_json(spark, base).collect()}
    want = {r["key"] for r in entries.collect()}
    assert got == want
    finalize_sitemap(entries, base, partitions=0)
    assert os.path.isfile(base) and not os.path.exists(base + ".d")
