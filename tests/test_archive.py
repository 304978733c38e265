"""CBOR archive + CDXJ index (S4/S5): codec vectors, layout, round-trip."""

import base64
import datetime as dt
import json
import os
import tempfile

from walk_spark.sources.archive import (
    cbor_decode, cbor_encode, read_cbor_meta, read_cdxj,
    resource_meta_dict, write_cbor_archive,
)


def test_cbor_rfc8949_vectors():
    """Known encodings from RFC 8949 Appendix A."""
    vectors = [
        (0, "00"), (1, "01"), (10, "0a"), (23, "17"), (24, "1818"),
        (100, "1864"), (1000, "1903e8"), (-1, "20"), (-100, "3863"),
        (1.1, "fb3ff199999999999a"),
        ("", "60"), ("a", "6161"), ("IETF", "6449455446"),
        (b"\x01\x02\x03\x04", "4401020304"),
        ([1, 2, 3], "83010203"),
        ({"a": 1, "b": [2, 3]}, "a26161016162820203"),
        (None, "f6"), (True, "f5"), (False, "f4"),
    ]
    for obj, hx in vectors:
        assert cbor_encode(obj).hex() == hx, obj
        assert cbor_decode(bytes.fromhex(hx)) == obj


def test_cbor_canonical_map_ordering_and_roundtrip():
    # canonical: keys sorted by encoded bytes — shorter-first then bytewise
    e1 = cbor_encode({"bb": 2, "a": 1})
    e2 = cbor_encode({"a": 1, "bb": 2})
    assert e1 == e2
    obj = {"url": "http://a/", "n": -5, "f": 2.5, "xs": ["a", b"\x00"],
           "none": None, "ok": True}
    assert cbor_decode(cbor_encode(obj)) == obj


def test_meta_dict_omitempty():
    row = {"job_id": "1", "url": "http://a/", "status": 200,
           "content_length": 0, "title": "", "links": [],
           "error": None, "hash": "Qm", "warc_ts": dt.datetime(2000, 1, 1)}
    m = resource_meta_dict(row)
    assert m == {"jobID": "1", "url": "http://a/", "status": 200,
                 "hash": "Qm", "timestamp": "2000-01-01T00:00:00Z"}


def test_archive_write_read_roundtrip(spark):
    from walk_spark.config import CrawlConfig
    from walk_spark.plans.crawl import crawl
    from walk_spark.sources.pages import self_linking_pages
    cfg = CrawlConfig(seeds=["http://self.test"], domains=["http://self.test"],
                      record_headers=True)
    r = crawl(spark, self_linking_pages(spark), cfg)
    base = tempfile.mkdtemp()
    write_cbor_archive(r.ok_resources(), base)
    # layout: meta/<b64[:12]>/<b64[12:]> (resource_handler.go:99-102)
    b64 = base64.standard_b64encode(b"http://self.test").decode()
    meta_file = os.path.join(base, "meta", b64[:12], b64[12:])
    assert os.path.isfile(meta_file)
    m = cbor_decode(open(meta_file, "rb").read())
    assert m["url"] == "http://self.test"
    assert m["status"] == 200
    assert m["headers"] == ["Content-Type", "text/html; charset=utf-8"]
    assert m["hash"].startswith("Qm")
    # distributed read-back: every meta row survives byte-exact fields
    back = {x["url"]: x for x in read_cbor_meta(spark, base).collect()}
    src = {x["url"]: x for x in r.ok_resources().collect()}
    assert set(back) == set(src)
    for u in src:
        assert back[u]["hash"] == src[u]["hash"]
        assert back[u]["links"] == list(src[u]["links"] or []) or None
        assert back[u]["status"] == src[u]["status"]
    # index.cdxj: SURT-sorted lines, record json carries hash/size/url
    lines = open(os.path.join(base, "index.cdxj")).read().splitlines()
    assert lines == sorted(lines) and len(lines) == 4
    surt_url, ts, rtype, rec = lines[0].split(" ", 3)
    assert surt_url.startswith("test,self)") and rtype == "response"
    assert json.loads(rec)["url"].startswith("http://self.test")
    idx = read_cdxj(spark, os.path.join(base, "index.cdxj")).collect()
    assert len(idx) == 4
    assert all(x["record_type"] == "response" for x in idx)


def test_meta_roundtrip_url_with_slash_in_b64_tail(spark):
    """Regression: standard base64 includes '/' in its alphabet, so some
    URLs (e.g. http://a.test/?q=1 -> tail 'dGVzdC8/cT0x') nest their meta
    file one directory deeper than meta/<head>/<tail>. read_cbor_meta must
    recurse (recursiveFileLookup), not glob meta/*/* — the fixed glob
    silently dropped these resources on read-back."""
    url = "http://a.test/?q=1"
    b64 = base64.standard_b64encode(url.encode()).decode()
    assert "/" in b64[12:]  # the property under test
    rows = [(None, url, dt.datetime(2020, 1, 2), 200, "text/html",
             "text/html", 5, "t", None, "QmHash", ["http://a.test/x"],
             None, None),
            (None, "http://b.test/", dt.datetime(2020, 1, 2), 200,
             "text/html", "text/html", 3, "u", None, "QmOther", [],
             None, None)]
    schema = ("job_id string, url string, warc_ts timestamp, status int, "
              "content_type string, content_sniff string, "
              "content_length long, title string, headers array<string>, "
              "hash string, links array<string>, redirect_to string, "
              "error string")
    df = spark.createDataFrame(rows, schema)
    base = tempfile.mkdtemp()
    write_cbor_archive(df, base)
    # the file really is nested 3 deep for the slash-bearing URL
    deep = os.path.join(base, "meta", b64[:12], *b64[12:].split("/"))
    assert os.path.isfile(deep)
    back = {x["url"]: x for x in read_cbor_meta(spark, base).collect()}
    assert set(back) == {url, "http://b.test/"}
    assert back[url]["hash"] == "QmHash"
    assert back[url]["links"] == ["http://a.test/x"]


def test_distributed_cdxj_table_equals_single_file(spark):
    """write_cdxj_table: concatenating the ranged+sorted text parts in
    filename order is byte-equal to the driver-rendered index.cdxj."""
    import glob
    from walk_spark.config import CrawlConfig
    from walk_spark.plans.crawl import crawl
    from walk_spark.sources.archive import write_cdxj_table
    from walk_spark.sources.pages import self_linking_pages
    cfg = CrawlConfig(seeds=["http://self.test"],
                      domains=["http://self.test"])
    r = crawl(spark, self_linking_pages(spark), cfg)
    base = tempfile.mkdtemp()
    write_cbor_archive(r.ok_resources(), base)          # single-file render
    single = open(os.path.join(base, "index.cdxj"), "rb").read()

    tbl = os.path.join(base, "index.cdxj.d")
    write_cdxj_table(r.ok_resources(), tbl, partitions=3)
    parts = sorted(glob.glob(os.path.join(tbl, "part-*")))
    concat = b"".join(open(p, "rb").read() for p in parts)
    assert concat == single and single
    # and the distributed read path sees the same records
    idx = read_cdxj(spark, tbl).collect()
    assert len(idx) == len(single.splitlines())


def test_auto_distributed_index_switch(spark, monkeypatch):
    """write_cbor_archive auto-engages the distributed CDXJ table above
    AUTO_INDEX_THRESHOLD records (no caller knowledge needed) and keeps
    the single-file parity render below it."""
    import glob
    from walk_spark.config import CrawlConfig
    from walk_spark.plans.crawl import crawl
    from walk_spark.sources import archive as A
    from walk_spark.sources.pages import self_linking_pages
    cfg = CrawlConfig(seeds=["http://self.test"],
                      domains=["http://self.test"])
    r = crawl(spark, self_linking_pages(spark), cfg)

    # below threshold: single-file render
    base_small = tempfile.mkdtemp()
    A.write_cbor_archive(r.ok_resources(), base_small)
    assert os.path.isfile(os.path.join(base_small, "index.cdxj"))
    assert not os.path.isdir(os.path.join(base_small, "index.cdxj.d"))

    # above (patched) threshold: distributed table, byte-equal concat
    monkeypatch.setattr(A, "AUTO_INDEX_THRESHOLD", 2)
    base_big = tempfile.mkdtemp()
    A.write_cbor_archive(r.ok_resources(), base_big)
    assert not os.path.exists(os.path.join(base_big, "index.cdxj"))
    tbl = os.path.join(base_big, "index.cdxj.d")
    parts = sorted(glob.glob(os.path.join(tbl, "part-*")))
    concat = b"".join(open(p, "rb").read() for p in parts)
    single = open(os.path.join(base_small, "index.cdxj"), "rb").read()
    assert concat == single and single
