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


def test_fast_scanner_equivalence_fuzz():
    """The regex fast scanner must be byte-equivalent to _PageParser on
    every page it accepts (it returns None -> parser fallback otherwise).
    Generative fuzz over tags/attrs/entities/comments/script-cdata plus
    the deliberate quirk triggers (bare '<', quotes-in-values, unclosed
    titles) that must route to fallback rather than diverge."""
    import random
    from walk_spark.functions.extract import _PageParser, _scan_page

    def ref(h):
        p = _PageParser()
        try:
            p.feed(h)
            p.close()
        except Exception:
            pass
        return (p.hrefs, p.title_parts, p.text_parts)

    rnd = random.Random(20260817)
    tags = ["a", "p", "div", "span", "link", "title", "script", "style",
            "em", "b", "head", "body", "ul", "li"]

    def gen_doc():
        parts = []
        for _ in range(rnd.randrange(1, 30)):
            c = rnd.random()
            if c < 0.30:
                t = rnd.choice(tags)
                attrs = ""
                for _ in range(rnd.randrange(0, 4)):
                    name = rnd.choice(
                        ["href", "src", "class", "HREF", "data-x"])
                    style = rnd.random()
                    val = rnd.choice(
                        ["x", "a b", "x&amp;y", "http://h/p?a=1&b=2", "",
                         "with'q", 'do"q', "α", "../rel", "#f", "a=b"])
                    if style < 0.5:
                        attrs += f' {name}="{val}"'
                    elif style < 0.7:
                        attrs += f" {name}='{val}'"
                    elif style < 0.9:
                        attrs += f" {name}={val.split(' ')[0]}"
                    else:
                        attrs += f" {name}"
                self_c = "/" if rnd.random() < 0.15 else ""
                parts.append(f"<{t}{attrs}{self_c}>")
                if not self_c and rnd.random() < 0.85:
                    if t in ("script", "style"):
                        parts.append(rnd.choice(
                            ["var a=1;", "a < b", "<div>in</div>",
                             "s='</div>'"]))
                    else:
                        parts.append(rnd.choice(
                            ["text", "a &amp; b", "  sp  ", "&#65;b",
                             "&lt;t&gt;", "&nbsp;y"]))
                    if rnd.random() < 0.9:
                        parts.append(f"</{t}>")
            elif c < 0.40:
                parts.append(rnd.choice(
                    ["<!-- c -->", "<!-- a<b> -->", "<!DOCTYPE html>",
                     "<?pi d?>", "<![CDATA[x]]>", "<!decl>"]))
            else:
                parts.append(rnd.choice(
                    ["plain", " \n ", "&amp;", "end.", "a<b", "<", "ü"]))
        return "".join(parts)

    fast = 0
    for _ in range(8000):
        h = gen_doc()
        s = _scan_page(h)
        if s is None:
            continue  # fallback path IS the reference parser
        fast += 1
        assert tuple(s) == ref(h), h
    assert fast > 500  # the fast path must actually engage


def test_fast_scanner_takes_fixture_pages():
    """The corpora the engine actually crawls must ride the fast path."""
    from walk_spark.functions.extract import _scan_page
    from walk_spark.sources.pages import _page_html
    h = _page_html(
        "t", [("http://a.test/x", "x"), ("rel/y.html", "y")], ["para"]
    ).decode()
    assert _scan_page(h) == (
        ["http://a.test/x", "rel/y.html"], ["t"], ["x", "y", "para"]
    )
