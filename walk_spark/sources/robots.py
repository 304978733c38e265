"""robots.txt acquisition + parsing for the politeness gate (F5 "Polite").

The reference delegates robots handling to fetchbot (lib/config.go:171-172
``Polite``; fetchbot fetches each host's /robots.txt and honors the
User-agent group's Disallow rules). Here the same policy becomes data: a
(host, disallow_prefix) rules DataFrame consumed by
``operators.politeness.apply_robots`` — built either from fixtures (tests)
or live via ``fetch_robots_rules`` (mapInPandas GETs, one per host, the
same distribution discipline as sources.http_fetch).

Parsing follows RFC 9309 basics: case-insensitive field names, ``#``
comments, groups started by one or more User-agent lines, empty
Disallow/Allow values dropped (no restriction). Both Disallow AND Allow
rules are extracted; precedence (RFC 9309 §2.2.2 longest-match, Allow
wins ties) is applied by ``operators.politeness.apply_robots``, which
also honors path ``*``/``$`` wildcards (RFC 9309 §2.2.3) via
``compile_robots_pattern`` below — matching fetchbot's robots library
(the reference's Polite path, lib/worker.go:81-83).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def compile_robots_pattern(value: str) -> str | None:
    """RFC 9309 §2.2.3 wildcard rule -> anchored Java regex, or None for a
    plain prefix rule (the startswith fast path). ``*`` matches any
    sequence of characters; a TRAILING ``$`` anchors the end of the path
    (``$`` anywhere else is a literal). Literal spans are ``\\Q..\\E``
    quoted so regex metacharacters in paths can't change the match —
    rlike/regexp_like-safe by construction."""
    if "*" not in value and not value.endswith("$"):
        return None
    anchored = value.endswith("$")
    core = value[:-1] if anchored else value

    def _q(lit: str) -> str:
        if not lit:
            return ""
        return "\\Q" + lit.replace("\\E", "\\E\\\\E\\Q") + "\\E"

    rx = ".*".join(_q(part) for part in core.split("*"))
    return "^" + rx + ("$" if anchored else "")


def _scan_groups(body: str):
    """Group scanner shared by the rule and crawl-delay extractors:
    [(agents, [(path_pattern, is_allow)], crawl_delay_seconds|None)] —
    case-insensitive fields, ``#`` comments, groups started by one or more
    User-agent lines, empty Disallow/Allow values dropped."""
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    in_group_body = False

    def _flush():
        nonlocal cur_agents, cur_rules, cur_delay, in_group_body
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None
        in_group_body = False

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                _flush()
            cur_agents.append(value.lower())
        elif field in ("disallow", "allow"):
            in_group_body = True
            if value:
                cur_rules.append((value, field == "allow"))
        elif field == "crawl-delay":
            in_group_body = True
            try:
                d = float(value)
                if d >= 0:
                    cur_delay = d
            except ValueError:
                pass  # malformed delay: ignored, like unknown directives
        elif field == "sitemap":
            in_group_body = True  # group body continues; not extracted
    _flush()
    return groups


def _ua_matches(agents: list[str], user_agent: str) -> bool:
    """RFC 9309 §2.2.1 direction: a group token must be a substring of the
    crawler's product token ('examplebot-images' must NOT capture plain
    'examplebot')."""
    ua = user_agent.lower().split("/")[0].strip()
    return any(a == "*" or (a and a in ua) for a in agents)


def parse_robots_rules(body: str,
                       user_agent: str = "*") -> list[tuple[str, bool]]:
    """(path_pattern, is_allow) rules applying to ``user_agent`` (the
    ``*`` group, or a group whose token is a case-insensitive substring of
    the crawler's product token — RFC 9309 §2.2.1 direction: a
    'examplebot-images' group must NOT capture plain 'examplebot'). Both
    Allow and Disallow lines are extracted — precedence and §2.2.3
    wildcards are the consumer's job (apply_robots: longest rule wins,
    Allow wins ties, §2.2.2)."""
    out: list[tuple[str, bool]] = []
    for agents, rules, _delay in _scan_groups(body):
        if _ua_matches(agents, user_agent):
            out.extend(rules)
    return out


def parse_robots_crawl_delay(body: str,
                             user_agent: str = "*") -> float | None:
    """Crawl-delay (seconds) of the group applying to ``user_agent`` — the
    robots-declared delay fetchbot honors when Polite (the reference's
    lib/worker.go:79-90 path: a host's robots delay, not only the
    configured one, paces its fetches). A group naming the crawler
    specifically wins over the ``*`` group; among several matching groups
    of the same specificity the LARGEST delay is taken (conservative).
    None = no (valid) Crawl-delay for this agent."""
    specific: list[float] = []
    wild: list[float] = []
    for agents, _rules, delay in _scan_groups(body):
        if delay is None or not _ua_matches(agents, user_agent):
            continue
        (wild if all(a == "*" for a in agents) else specific).append(delay)
    if specific:
        return max(specific)
    if wild:
        return max(wild)
    return None


def parse_robots_txt(body: str, user_agent: str = "*") -> list[str]:
    """Disallow prefixes only (legacy shape — fixture tables and callers
    that predate Allow support)."""
    return [p for p, allow in parse_robots_rules(body, user_agent)
            if not allow]


def rules_from_bodies(bodies: DataFrame, user_agent: str = "*") -> DataFrame:
    """(host, robots_txt string) -> (host, disallow_prefix, allow) rules
    rows — the input shape of ``operators.politeness.apply_robots``.
    ``disallow_prefix`` keeps its historical name; with allow=true the
    prefix is an Allow rule."""
    def _parse(it):
        for pdf in it:
            hosts, prefixes, allows = [], [], []
            for h, b in zip(pdf["host"], pdf["robots_txt"]):
                for p, al in parse_robots_rules(b or "", user_agent):
                    hosts.append(h)
                    prefixes.append(p)
                    allows.append(al)
            yield pd.DataFrame({"host": hosts, "disallow_prefix": prefixes,
                                "allow": allows})

    return bodies.mapInPandas(
        _parse, schema="host string, disallow_prefix string, allow boolean"
    )


def crawl_delays_from_bodies(bodies: DataFrame,
                             user_agent: str = "*") -> DataFrame:
    """(host, robots_txt string) -> (host, crawl_delay_ms long): one row
    per host whose robots.txt declares a Crawl-delay for ``user_agent`` —
    the input shape of ``Crawler(robots_delays=...)``. Hosts without the
    directive produce no row (the configured delay applies)."""
    def _parse(it):
        for pdf in it:
            hosts, ms = [], []
            for h, b in zip(pdf["host"], pdf["robots_txt"]):
                d = parse_robots_crawl_delay(b or "", user_agent)
                if d is not None:
                    hosts.append(h)
                    ms.append(int(round(d * 1000)))
            yield pd.DataFrame({"host": hosts, "crawl_delay_ms": ms})

    return bodies.mapInPandas(
        _parse, schema="host string, crawl_delay_ms long"
    )


def fetch_robots_rules(hosts: DataFrame, user_agent: str = "walk_spark/0.1",
                       timeout_s: float = 10.0,
                       scheme: str = "http") -> DataFrame:
    """Live mode: GET ``{scheme}://{host}/robots.txt`` per distinct host
    (distributed), parse into gate rules. Unreachable or non-200 robots →
    no rules for that host (allow-all, fetchbot's behavior)."""
    from walk_spark.sources.http_fetch import fetch_one

    def _get(it):
        for pdf in it:
            hosts_out, prefixes, allows = [], [], []
            for h in pdf["host"]:
                r = fetch_one(f"{scheme}://{h}/robots.txt", user_agent,
                              timeout_s, 5)
                if r["error"] or r["status"] != 200 or r["body"] is None:
                    continue
                body = bytes(r["body"]).decode("utf-8", errors="replace")
                for p, al in parse_robots_rules(body, user_agent):
                    hosts_out.append(h)
                    prefixes.append(p)
                    allows.append(al)
            yield pd.DataFrame(
                {"host": hosts_out, "disallow_prefix": prefixes,
                 "allow": allows}
            )

    return hosts.select("host").distinct().mapInPandas(
        _get, schema="host string, disallow_prefix string, allow boolean"
    )
