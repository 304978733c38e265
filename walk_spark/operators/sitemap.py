"""Sitemap sink + walk-archive read-path projections (SURVEY.md S6-S7, O1-O3).

The reference's SitemapGenerator (lib/sitemap.go) stores one Entry per
NORMALIZED url in badger (last write wins, sitemap.go:49-55) and finalizes
to a single JSON object-of-objects keyed by normalized url
(sitemap.go:84-116, golden format lib/sitemap_test.go:52-76).

DataFrame re-expression: groupBy(normalized url) argmax-by-arrival —
``max_by(entry, arrival_seq)`` — then a driver-side JSON render at write
time (the output is one small file by definition; everything before the
render is distributed).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

from walk_spark.functions.urlnorm import normalize_url_series, surt_series

_norm_udf = F.pandas_udf(normalize_url_series, returnType=StringType())
_surt_udf = F.pandas_udf(surt_series, returnType=StringType())


def sitemap_entries(ok_resources: DataFrame) -> DataFrame:
    """One Entry per normalized url, last write (by superstep order) wins
    (D4). Input: CrawlResult.ok_resources()."""
    keyed = ok_resources.withColumn("_key", _norm_udf(F.col("url"))).filter(
        F.length("_key") > 0
    )
    arrival = F.struct(
        F.col("superstep"), F.col("warc_ts"), F.col("url")
    ).alias("_arrival")
    entry = F.struct(
        F.col("url"), F.col("title"), F.col("warc_ts").alias("timestamp"),
        F.col("status"), F.col("links"),
    )
    return (
        keyed.groupBy("_key")
        .agg(F.max_by(entry, arrival).alias("e"))
        .select(
            F.col("_key").alias("key"),
            F.col("e.url").alias("url"),
            F.col("e.title").alias("title"),
            F.col("e.timestamp").alias("timestamp"),
            F.col("e.status").alias("status"),
            F.col("e.links").alias("links"),
        )
    )


def render_sitemap_json(entries: DataFrame) -> str:
    """Byte-format parity with the reference golden
    (lib/sitemap_test.go:52-76): JSON object keyed by normalized url, keys
    sorted (Go json.Marshal map ordering), 2-space indent, RFC3339 UTC
    timestamps, null redirects/resources (unpopulated by the generator in
    the reference too — sitemap.go:132-142)."""
    rows = {r["key"]: r for r in entries.collect()}
    obj = {}
    for key in sorted(rows):  # Go json.Marshal sorts map keys
        r = rows[key]
        ts = r["timestamp"]
        if not isinstance(ts, str):  # round-tripped sitemaps carry RFC3339
            ts = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        # inner field order = the Go Entry struct order (lib/sitemap.go:119-130)
        obj[key] = {
            "url": r["url"],
            "title": r["title"] or "",
            "timestamp": ts,
            "status": r["status"],
            "redirects": None,
            "resources": None,
            "links": list(r["links"] or []) or None,
        }
    return json.dumps(obj, indent=2)


def read_sitemap_json(spark, path: str) -> DataFrame:
    """S13: load a finalized sitemap.json back as an entries DataFrame —
    the input format of the reference's offline commands
    (cmd/inbound_links.go:35-52, cmd/clean.go:24-31). The file is a single
    driver-rendered JSON object by construction (one object per walk), so a
    driver-side parse is the faithful equivalent of the reference's
    ioutil.ReadFile + json.Unmarshal; the returned DataFrame is distributed
    for everything downstream."""
    with open(path) as f:
        obj = json.load(f)
    rows = [
        (
            key,
            e.get("url"),
            e.get("title") or "",
            e.get("timestamp"),
            e.get("status"),
            list(e.get("links") or []),
        )
        for key, e in obj.items()
    ]
    return spark.createDataFrame(
        rows,
        "key string, url string, title string, timestamp string, "
        "status int, links array<string>",
    )


def cdxj_index(ok_resources: DataFrame) -> DataFrame:
    """The CDXJ archive index (S4/S5/O1): SURT-key-sorted
    (surt_url, warc_ts, hash, content_length, url) — reference
    lib/resource_handler.go:157-175. Returned sorted; writers partition by
    surt range at scale (write.sortBy on a bucketed table)."""
    return (
        ok_resources.select(
            _surt_udf(F.col("url")).alias("surt_url"),
            "warc_ts", "hash",
            F.col("content_length").alias("size"),
            "url",
        )
        .orderBy("surt_url", "warc_ts")
    )


def sorted_index_page(ok_resources: DataFrame, limit: int, offset: int) -> DataFrame:
    """SortedIndex(limit, offset) pagination (lib/walk.go:130-152)."""
    return cdxj_index(ok_resources).offset(offset).limit(limit)
