"""Extraction kernel unit tests (pure Python; Spark integration in test_crawl)."""

from walk_spark.functions.extract import parse_page
from walk_spark.functions.hashing import base58btc, multihash_sha256_b58
from walk_spark.functions.sniff import detect_content_type

SELF_LINKING_INDEX = b"""<!DOCTYPE html>
<html>
<head>
  <title>Self-Linking Test</title>
</head>
<body>
    <a href="./">Link to Self</a>
    <a href="a.html">Link to A</a>
    <a href="b.html">Link to B</a>
    <a href="c.html">Link to C</a>
</body>
</html>"""


def test_parse_self_linking_index():
    title, links, text, sniff, chash = parse_page(
        "http://self.test/index.html", SELF_LINKING_INDEX
    )
    assert title == "Self-Linking Test"
    assert sniff == "text/html; charset=utf-8"
    # first-seen document order, normalized (index.html stripped by dir-index)
    assert links == [
        "http://self.test",
        "http://self.test/a.html",
        "http://self.test/b.html",
        "http://self.test/c.html",
    ]
    assert text == "Link to Self Link to A Link to B Link to C"
    assert chash.startswith("Qm")  # 0x12 0x20 multihash prefix in base58


def test_non_anchor_hrefs_extracted():
    # <link> hrefs ARE links in the reference (lib/resource.go:168)
    html = (
        b'<html><head><link rel="stylesheet" href="/css/site.css">'
        b'<link rel="alternate" href="feed.xml"></head>'
        b'<body><a href="/page">x</a></body></html>'
    )
    _, links, _, _, _ = parse_page("http://h.test/d/p.html", html)
    assert links == [
        "http://h.test/css/site.css",
        "http://h.test/d/feed.xml",
        "http://h.test/page",
    ]


def test_per_page_dedup_first_seen_order():
    html = (
        b'<body><a href="/b">1</a><a href="/a">2</a>'
        b'<a href="/b">3</a><a href="/a#f">4</a></body>'
    )
    _, links, _, _, _ = parse_page("http://h.test/", html)
    assert links == ["http://h.test/b", "http://h.test/a"]


def test_non_html_not_parsed():
    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
    title, links, text, sniff, _ = parse_page("http://h.test/i.png", png)
    assert sniff == "image/png"
    assert title == "" and links == [] and text == ""


def test_script_style_excluded_from_text():
    html = (
        b"<html><head><title>T</title><style>p{color:red}</style></head>"
        b"<body><script>var x=1;</script><p>hello</p> <p>world</p></body></html>"
    )
    title, _, text, _, _ = parse_page("http://h.test/", html)
    assert title == "T"
    assert text == "hello world"


def test_sniff_table():
    assert detect_content_type(b"  <!DOCTYPE html><html>") == "text/html; charset=utf-8"
    assert detect_content_type(b"<HtMl>") == "text/html; charset=utf-8"
    assert detect_content_type(b'<?xml version="1.0"?>') == "text/xml; charset=utf-8"
    assert detect_content_type(b"%PDF-1.4") == "application/pdf"
    assert detect_content_type(b"plain words") == "text/plain; charset=utf-8"
    assert detect_content_type(b"\x00\x01binary") == "application/octet-stream"
    assert detect_content_type(b"GIF89a....") == "image/gif"
    assert detect_content_type(None) == "text/plain; charset=utf-8"


def test_base58():
    assert base58btc(b"\x00\x00a") == "112g"
    h = multihash_sha256_b58(b"hello")
    # sha256 multihash of a known input is 46 chars starting Qm
    assert len(h) == 46 and h.startswith("Qm")


def test_base58_known_vector():
    # canonical Bitcoin base58check test vector
    assert (
        base58btc(bytes.fromhex("00010966776006953D5567439E5E39F86A0D273BEED61967F6"))
        == "16UwLL9Risc3QfPqBUvKofHmBQ7wMtjvM"
    )


def test_hash_deterministic():
    # multihash(sha2-256("")) — pinned golden for cross-run stability
    assert (
        multihash_sha256_b58(b"")
        == "QmdfTbBqBPQ7VNxZEYEj14VmRuZBkqFbiwReogJgS1zR1n"
    )
