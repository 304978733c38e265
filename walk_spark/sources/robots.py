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
wins ties) is applied by ``operators.politeness.apply_robots``. Path
``*``/``$`` wildcards are not expanded (prefix semantics only — same as
the plain-prefix matchers in most production crawlers; documented
deviation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def parse_robots_rules(body: str,
                       user_agent: str = "*") -> list[tuple[str, bool]]:
    """(path_prefix, is_allow) rules applying to ``user_agent`` (exact
    token match or the ``*`` group; the UA product token is matched
    case-insensitively as a substring, per RFC 9309 §2.2.1). Both Allow
    and Disallow lines are extracted — precedence is the consumer's job
    (apply_robots: longest prefix wins, Allow wins ties, §2.2.2)."""
    ua = user_agent.lower().split("/")[0].strip()
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
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
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_group_body = False
            cur_agents.append(value.lower())
        elif field in ("disallow", "allow"):
            in_group_body = True
            if value:
                cur_rules.append((value, field == "allow"))
        elif field in ("crawl-delay", "sitemap"):
            in_group_body = True  # group body continues; rules not extracted
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    out: list[tuple[str, bool]] = []
    for agents, rules in groups:
        if any(a == "*" or (a and a in ua) or (ua and ua in a)
               for a in agents):
            out.extend(rules)
    return out


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
