"""Offline read-path queries over crawl output (SURVEY.md §2.5-§2.8).

These are the reference's offline commands and API reads, each a one-liner
DataFrame plan (Catalyst handles pushdown/pruning):

- inbound_links   — cmd/inbound_links.go:21-82 (explode + equi-filter)
- collection_latest — lib/collection.go:75-92 (union + argmax by timestamp)
- timespan        — lib/walk.go:66-76 (min/max)
- clean           — cmd/clean.go:20-107 (prefix filter + counts)
- find_index      — lib/walk.go:112-128 (position of url in SURT order)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType
from pyspark.sql.window import Window

from walk_spark.functions.urlnorm import (
    normalize_url, normalize_url_series, surt_series,
)

_surt_udf = F.pandas_udf(surt_series, returnType=StringType())
_norm_udf = F.pandas_udf(normalize_url_series, returnType=StringType())


def inbound_links(resources: DataFrame, target_url: str) -> DataFrame:
    """Source urls of every resource linking to ``target_url`` (normalized
    before comparison, like cmd/inbound_links.go:41-46)."""
    t = normalize_url(target_url)
    return (
        resources.select("url", F.explode("links").alias("l"))
        .filter(F.col("l") == F.lit(t))
        .select("url")
        .distinct()
        .orderBy("url")
    )


def link_edges(resources: DataFrame) -> DataFrame:
    """The general link graph: (src, dst, ordinal) — explode once, query
    many times (inbound_links is a filter over this)."""
    return resources.select(
        F.col("url").alias("src"),
        F.posexplode("links").alias("ordinal", "dst"),
    )


def collection_latest(*walks: DataFrame) -> DataFrame:
    """Union member walks, keep the latest resource per url by timestamp
    (lib/collection.go:75-92 — argmax, the time argument is ignored there).
    max_by avoids a window sort; ties broken deterministically by url."""
    u = walks[0]
    for w in walks[1:]:
        u = u.unionByName(w, allowMissingColumns=True)
    arrival = F.struct("warc_ts", "superstep")
    cols = [c for c in u.columns if c != "url"]
    return (
        u.groupBy("url")
        .agg(*[F.max_by(c, arrival).alias(c) for c in cols])
    )


def timespan(resources: DataFrame) -> DataFrame:
    """min/max capture time (lib/walk.go:66-76)."""
    return resources.agg(
        F.min("warc_ts").alias("start"), F.max("warc_ts").alias("end")
    )


def clean(entries: DataFrame, prefix: str) -> tuple[DataFrame, dict]:
    """Drop sitemap entries whose url starts with ``prefix``; report
    total/removed/kept counts (cmd/clean.go:39-95)."""
    total = entries.count()
    kept = entries.filter(~F.col("url").startswith(prefix))
    nk = kept.count()
    return kept, {"total": total, "removed": total - nk, "kept": nk}


def get_capture(resources: DataFrame, url: str,
                follow_redirects: bool = False,
                max_hops: int = 20) -> dict | None:
    """Point lookup of the latest capture of a url — the walk-archive
    ``Get(url, time)`` / API raw-vs-resolved read (lib/walk.go:167-210,
    api/collection_handlers.go:164-187: latest-timestamp argmax; the time
    argument is effectively ignored there too). With ``follow_redirects``,
    chase RedirectTo pointers up to 20 hops (the API resolution cap)."""
    t = normalize_url(url)
    keyed = resources.withColumn("_k", _norm_udf(F.col("url")))
    for _ in range(max_hops):
        row = (
            keyed.filter(F.col("_k") == F.lit(t))
            .orderBy(F.desc("warc_ts"), F.desc("superstep"))
            .limit(1)
            .collect()
        )
        if not row:
            return None
        r = row[0].asDict()
        if follow_redirects and r.get("redirect_to"):
            t = normalize_url(r["redirect_to"])
            continue
        r.pop("_k", None)
        return r
    return None


def find_index(ok_resources: DataFrame, url: str) -> int:
    """Position of url in the SURT-sorted index (lib/walk.go:112-128 does a
    linear scan; here a rank over the sort order)."""
    t = normalize_url(url)
    w = Window.orderBy("surt_url", "warc_ts")
    d = (
        ok_resources.select(
            _surt_udf(F.col("url")).alias("surt_url"), "warc_ts", "url"
        )
        .withColumn("pos", F.row_number().over(w) - 1)
        .filter(F.col("url") == F.lit(t))
        .select("pos")
        .limit(1)
        .collect()
    )
    return d[0]["pos"] if d else -1
