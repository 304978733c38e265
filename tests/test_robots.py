"""robots.txt parsing + live acquisition + gate integration (F5 Polite)."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from walk_spark.sources.robots import (
    fetch_robots_rules, parse_robots_txt, rules_from_bodies,
)

SAMPLE = """
# global rules
User-agent: *
Disallow: /private/
Disallow: /tmp/
Disallow:

User-agent: walk_spark
User-agent: otherbot
Disallow: /walk-only/
Crawl-delay: 2

User-agent: evilbot
Disallow: /
"""


def test_parse_star_group():
    assert parse_robots_txt(SAMPLE, "somebot/1.0") == ["/private/", "/tmp/"]


def test_parse_specific_group_unioned_with_star():
    got = parse_robots_txt(SAMPLE, "walk_spark/0.1")
    assert got == ["/private/", "/tmp/", "/walk-only/"]


def test_parse_empty_and_garbage():
    assert parse_robots_txt("", "x") == []
    assert parse_robots_txt("not a robots file\n\n::\n", "x") == []
    assert parse_robots_txt(None, "x") == []


def test_rules_from_bodies_and_gate(spark):
    from pyspark.sql import functions as F
    from walk_spark.operators.politeness import apply_robots
    bodies = spark.createDataFrame(
        [("a.test", SAMPLE), ("b.test", "")],
        "host string, robots_txt string",
    )
    rules = rules_from_bodies(bodies, "walk_spark/0.1")
    got = sorted((r["host"], r["disallow_prefix"]) for r in rules.collect())
    assert got == [("a.test", "/private/"), ("a.test", "/tmp/"),
                   ("a.test", "/walk-only/")]
    cands = spark.createDataFrame(
        [("http://a.test/private/x", "a.test"),
         ("http://a.test/ok", "a.test"),
         ("http://b.test/private/x", "b.test")],
        "url string, host string",
    )
    kept = {r["url"] for r in apply_robots(cands, rules).collect()}
    assert kept == {"http://a.test/ok", "http://b.test/private/x"}


class _RobotsHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):  # noqa: N802
        if self.path == "/robots.txt":
            body = b"User-agent: *\nDisallow: /secret/\n"
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()


def test_fetch_robots_rules_live(spark):
    srv = HTTPServer(("127.0.0.1", 0), _RobotsHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        hosts = spark.createDataFrame(
            [(f"127.0.0.1:{srv.server_port}",), ("127.0.0.1:9",)],
            "host string",
        )
        rules = fetch_robots_rules(hosts, timeout_s=2.0)
        got = [(r["host"], r["disallow_prefix"]) for r in rules.collect()]
        assert got == [(f"127.0.0.1:{srv.server_port}", "/secret/")]
    finally:
        srv.shutdown()


ALLOW_SAMPLE = """
User-agent: *
Disallow: /
Allow: /public/
Allow: /blog
Disallow: /public/secret/
"""


def test_parse_allow_rules():
    from walk_spark.sources.robots import parse_robots_rules
    got = parse_robots_rules(ALLOW_SAMPLE, "anybot/1")
    assert got == [("/", False), ("/public/", True), ("/blog", True),
                   ("/public/secret/", False)]
    # legacy disallow-only view unchanged
    assert parse_robots_txt(ALLOW_SAMPLE, "anybot/1") == \
        ["/", "/public/secret/"]


def test_allow_precedence_longest_match(spark):
    """RFC 9309 §2.2.2: longest matching prefix wins, Allow wins ties —
    the reference case: Allow:/public/ under Disallow:/ admits /public/*
    but Disallow:/public/secret/ (longer) re-blocks its subtree."""
    from walk_spark.operators.politeness import apply_robots
    bodies = spark.createDataFrame(
        [("a.test", ALLOW_SAMPLE)], "host string, robots_txt string"
    )
    rules = rules_from_bodies(bodies, "walk_spark/0.1")
    cands = spark.createDataFrame(
        [("http://a.test/", "a.test"),              # Disallow:/ wins
         ("http://a.test/private/x", "a.test"),     # only / matches -> deny
         ("http://a.test/public/page", "a.test"),   # Allow:/public/ wins
         ("http://a.test/public/secret/x", "a.test"),  # longer Disallow
         ("http://a.test/blog/post", "a.test"),     # Allow:/blog wins
         ("http://b.test/anything", "b.test")],     # no rules -> allowed
        "url string, host string",
    )
    kept = {r["url"] for r in apply_robots(cands, rules).collect()}
    assert kept == {"http://a.test/public/page", "http://a.test/blog/post",
                    "http://b.test/anything"}


def test_allow_tie_goes_to_allow(spark):
    from walk_spark.operators.politeness import apply_robots
    rules = spark.createDataFrame(
        [("a.test", "/p", False), ("a.test", "/p", True)],
        "host string, disallow_prefix string, allow boolean",
    )
    cands = spark.createDataFrame(
        [("http://a.test/p/x", "a.test")], "url string, host string"
    )
    assert apply_robots(cands, rules).count() == 1


WILDCARD_SAMPLE = """
User-agent: *
Disallow: /*.pdf$
Disallow: /private*/
Allow: /private-ok/
Disallow: /tmp$
"""


def test_compile_robots_pattern():
    """RFC 9309 §2.2.3 translation: '*' -> any sequence, trailing '$' ->
    end anchor, everything else literal (Java-regex \\Q..\\E quoting so
    rlike is safe for regex metachars in paths)."""
    from walk_spark.sources.robots import compile_robots_pattern
    assert compile_robots_pattern("/plain") is None  # prefix fast path
    assert compile_robots_pattern("/*.pdf$") == "^\\Q/\\E.*\\Q.pdf\\E$"
    assert compile_robots_pattern("/fish*") == "^\\Q/fish\\E.*"
    assert compile_robots_pattern("/x$") == "^\\Q/x\\E$"
    # '$' mid-pattern is a literal
    assert compile_robots_pattern("/a$b*") == "^\\Q/a$b\\E.*"


def test_wildcard_gate(spark):
    """Wildcard rules gate like fetchbot/RFC 9309: '$' anchors end-of-path,
    '*' spans segments, and longest-match precedence uses the PATTERN
    length (Allow:/private-ok/ is longer than Disallow:/private*/)."""
    from walk_spark.operators.politeness import apply_robots
    bodies = spark.createDataFrame(
        [("a.test", WILDCARD_SAMPLE)], "host string, robots_txt string"
    )
    rules = rules_from_bodies(bodies, "walk_spark/0.1")
    cands = spark.createDataFrame(
        [("http://a.test/doc.pdf", "a.test"),        # /*.pdf$ -> deny
         ("http://a.test/doc.pdfx", "a.test"),       # $ anchor -> allow
         ("http://a.test/a/b/doc.pdf", "a.test"),    # * spans segments -> deny
         ("http://a.test/private2/x", "a.test"),     # /private*/ -> deny
         ("http://a.test/private-ok/x", "a.test"),   # longer Allow wins
         ("http://a.test/tmp", "a.test"),            # /tmp$ exact -> deny
         ("http://a.test/tmp/x", "a.test"),          # anchored -> allow
         ("http://a.test/ok.html", "a.test")],
        "url string, host string",
    )
    got = {r["url"] for r in apply_robots(cands, rules).collect()}
    assert got == {"http://a.test/doc.pdfx", "http://a.test/private-ok/x",
                   "http://a.test/tmp/x", "http://a.test/ok.html"}


def test_ua_substring_direction():
    """RFC 9309 §2.2.1: a group applies when ITS token is a substring of
    the crawler's product token — not the reverse (a 'googlebot-images'
    group must not capture plain 'googlebot')."""
    from walk_spark.sources.robots import parse_robots_rules
    body = """
User-agent: googlebot-images
Disallow: /images/

User-agent: google
Disallow: /general/
"""
    # crawler 'googlebot' matches the 'google' group (group token is a
    # substring of the product token) but NOT 'googlebot-images'
    got = parse_robots_rules(body, "googlebot/2.1")
    assert got == [("/general/", False)]


def test_parse_crawl_delay():
    """Crawl-delay extraction (fetchbot honors a host's robots delay when
    Polite — lib/worker.go:79-90): group-scoped, specific group wins over
    *, conservative max among equal-specificity groups, malformed and
    negative values ignored, rule extraction unaffected."""
    from walk_spark.sources.robots import (
        parse_robots_crawl_delay as cd, parse_robots_rules,
    )
    body = (
        "User-agent: *\nCrawl-delay: 2\nDisallow: /tmp\n\n"
        "User-agent: walkbot\nCrawl-delay: 0.5\n"
    )
    assert cd(body, "other/1.0") == 2.0
    assert cd(body, "walkbot/0.1") == 0.5   # specific beats the * group
    assert cd("User-agent: *\nDisallow: /x", "any") is None
    assert cd("User-agent: *\nCrawl-delay: soon", "any") is None
    assert cd("User-agent: *\nCrawl-delay: -1", "any") is None
    two = ("User-agent: walkbot\nCrawl-delay: 1\n\n"
           "User-agent: walk\nCrawl-delay: 3\n")
    assert cd(two, "walkbot/1") == 3.0      # max of matching specifics
    # a Crawl-delay line terminates the agent list like a rule does: the
    # next User-agent starts a NEW group
    split = ("User-agent: a\nCrawl-delay: 7\nUser-agent: b\nDisallow: /q\n")
    assert cd(split, "b/1") is None
    assert cd(split, "a/1") == 7.0
    assert parse_robots_rules(body, "other") == [("/tmp", False)]


def test_crawl_delays_from_bodies(spark):
    from walk_spark.sources.robots import crawl_delays_from_bodies
    bodies = spark.createDataFrame(
        [("a.test", "User-agent: *\nCrawl-delay: 1.5\nDisallow: /p"),
         ("b.test", "User-agent: *\nDisallow: /x"),
         ("c.test", None)],
        "host string, robots_txt string")
    rows = {r["host"]: r["crawl_delay_ms"]
            for r in crawl_delays_from_bodies(bodies).collect()}
    assert rows == {"a.test": 1500}


def test_robots_crawl_delay_budget_override(spark):
    """The BSP reading of the robots Crawl-delay: with superstep_seconds
    modeling the round, a host declaring delay = 2x the configured one gets
    HALF the per-superstep picks; declaring delay = half the configured one
    RAISES its budget (fetchbot: the robots delay wins in both directions).
    The visit SET never changes — only the schedule."""
    from walk_spark.config import CrawlConfig
    from walk_spark.plans.crawl import crawl
    from walk_spark.sources.pages import tree_site_pages
    from walk_spark.sources.robots import crawl_delays_from_bodies

    pages = tree_site_pages(spark, breadth=3, depth=2)  # ~15 urls: the
    # budget-2 run stays ~8 supersteps instead of ~44 on the full tree

    def run(delay_s: float | None):
        cfg = CrawlConfig(
            seeds=["http://qri.test/"], domains=["http://qri.test"],
            superstep_seconds=2, delay_milli=500,  # default budget = 4
        )
        delays = None
        if delay_s is not None:
            bodies = spark.createDataFrame(
                [("qri.test", f"User-agent: *\nCrawl-delay: {delay_s}")],
                "host string, robots_txt string")
            delays = crawl_delays_from_bodies(bodies)
        r = crawl(spark, pages, cfg, robots_delays=delays)
        per = sorted(x["count"] for x in
                     r.order.groupBy("superstep").count().collect())
        return {x["url"] for x in r.frontier.collect()}, per, len(r.metrics)

    base_set, base_per, base_steps = run(None)
    assert max(base_per) == 4
    slow_set, slow_per, slow_steps = run(1.0)   # budget 2000//1000 = 2
    assert slow_set == base_set
    assert max(slow_per) == 2
    assert slow_steps > base_steps
    fast_set, fast_per, fast_steps = run(0.25)  # budget 2000//250 = 8
    assert fast_set == base_set
    assert max(fast_per) == 8
    assert fast_steps < base_steps
