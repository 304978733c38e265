"""Read-path API surface (O4-O6): path parsing, pagination, point reads."""

import datetime as dt

import pytest

from walk_spark.api import (
    ZERO_TIME, get_resource, list_requests, list_resources,
    path_timestamp_url,
)
from walk_spark.config import CrawlConfig
from walk_spark.plans.crawl import crawl
from walk_spark.sources.pages import self_linking_pages


def test_path_timestamp_url_parse():
    t, u = path_timestamp_url(
        "/collection", "/collection/2000-01-02T03:04:05Z/http://a.com/x"
    )
    assert t == dt.datetime(2000, 1, 2, 3, 4, 5)
    assert u == "http://a.com/x"
    t, u = path_timestamp_url("/c", "/c/zero/http://a.com")
    assert t == ZERO_TIME and u == "http://a.com"
    t, _ = path_timestamp_url("/c", "/c/now/http://a.com")
    assert t.year >= 2026
    for bad in ("/c", "/c/", "/c/2000-01-01T00:00:00Z",
                "/c/2000-01-01T00:00:00Z/"):
        with pytest.raises(ValueError):
            path_timestamp_url("/c", bad)
    with pytest.raises(ValueError):
        path_timestamp_url("/c", "/c/not-a-time/http://a.com")


@pytest.fixture(scope="module")
def small_crawl(spark):
    cfg = CrawlConfig(seeds=["http://self.test"], domains=["http://self.test"])
    return crawl(spark, self_linking_pages(spark), cfg)


def test_list_resources_pagination(small_crawl):
    p0 = list_resources(small_crawl.ok_resources(), page=0, page_size=3).collect()
    p1 = list_resources(small_crawl.ok_resources(), page=1, page_size=3).collect()
    assert len(p0) == 3 and len(p1) == 1
    keys = [x["surt_url"] for x in p0 + p1]
    assert keys == sorted(keys)


def test_list_requests_pagination_and_filter(small_crawl):
    p0 = list_requests(small_crawl.frontier, page=0, page_size=2).collect()
    p1 = list_requests(small_crawl.frontier, page=1, page_size=2).collect()
    assert [x["discovery_seq"] for x in p0 + p1] == [0, 1, 2, 3]
    done = list_requests(small_crawl.frontier, status="done").collect()
    assert len(done) == 4
    assert list_requests(small_crawl.frontier, status="queued").count() == 0


def test_get_resource_raw(small_crawl):
    r = get_resource(small_crawl.resources, "http://self.test/a.html")
    assert r is not None and r["status"] == 200
    assert get_resource(small_crawl.resources, "http://nowhere/") is None
