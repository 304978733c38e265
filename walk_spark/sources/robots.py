"""robots.txt acquisition + parsing for the politeness gate (F5 "Polite").

The reference delegates robots handling to fetchbot (lib/config.go:171-172
``Polite``; fetchbot fetches each host's /robots.txt and honors the
User-agent group's Disallow rules). Here the same policy becomes data: a
(host, disallow_prefix) rules DataFrame consumed by
``operators.politeness.apply_robots`` — built either from fixtures (tests)
or live via ``fetch_robots_rules`` (mapInPandas GETs, one per host, the
same distribution discipline as sources.http_fetch).

Parsing follows the original robots.txt REP as published (google's
robotstxt draft / RFC 9309 basics): case-insensitive field names, ``#``
comments, groups started by one or more User-agent lines, longest-match
semantics are the CONSUMER's job (apply_robots is prefix-match), empty
Disallow means allow-all and is dropped. Only Disallow is extracted —
Allow precedence is out of scope like it is for fetchbot's matcher.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def parse_robots_txt(body: str, user_agent: str = "*") -> list[str]:
    """Disallow prefixes applying to ``user_agent`` (exact token match or
    the ``*`` group; the UA product token is matched case-insensitively as
    a substring, per RFC 9309 §2.2.1)."""
    ua = user_agent.lower().split("/")[0].strip()
    groups: list[tuple[list[str], list[str]]] = []  # (agents, disallows)
    cur_agents: list[str] = []
    cur_dis: list[str] = []
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
                groups.append((cur_agents, cur_dis))
                cur_agents, cur_dis = [], []
                in_group_body = False
            cur_agents.append(value.lower())
        elif field == "disallow":
            in_group_body = True
            if value:
                cur_dis.append(value)
        elif field in ("allow", "crawl-delay", "sitemap"):
            in_group_body = True  # group body continues; rules not extracted
    if cur_agents:
        groups.append((cur_agents, cur_dis))
    out: list[str] = []
    for agents, dis in groups:
        if any(a == "*" or (a and a in ua) or (ua and ua in a)
               for a in agents):
            out.extend(dis)
    return out


def rules_from_bodies(bodies: DataFrame, user_agent: str = "*") -> DataFrame:
    """(host, robots_txt string) -> (host, disallow_prefix) rules rows —
    the input shape of ``operators.politeness.apply_robots``."""
    def _parse(it):
        for pdf in it:
            hosts, prefixes = [], []
            for h, b in zip(pdf["host"], pdf["robots_txt"]):
                for p in parse_robots_txt(b or "", user_agent):
                    hosts.append(h)
                    prefixes.append(p)
            yield pd.DataFrame({"host": hosts, "disallow_prefix": prefixes})

    return bodies.mapInPandas(
        _parse, schema="host string, disallow_prefix string"
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
            hosts_out, prefixes = [], []
            for h in pdf["host"]:
                r = fetch_one(f"{scheme}://{h}/robots.txt", user_agent,
                              timeout_s, 5)
                if r["error"] or r["status"] != 200 or r["body"] is None:
                    continue
                body = bytes(r["body"]).decode("utf-8", errors="replace")
                for p in parse_robots_txt(body, user_agent):
                    hosts_out.append(h)
                    prefixes.append(p)
            yield pd.DataFrame(
                {"host": hosts_out, "disallow_prefix": prefixes}
            )

    return hosts.select("host").distinct().mapInPandas(
        _get, schema="host string, disallow_prefix string"
    )
