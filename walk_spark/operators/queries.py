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
    max_by of ONE whole-row struct (never per-column — per-column argmax can
    mix columns from different rows on ties); the arrival key carries the
    walk ordinal so cross-walk ties resolve deterministically to the
    latest-listed walk. Within one walk (url, warc_ts, superstep) is unique
    (one fetch row per url per superstep), so the key is total."""
    tagged = [
        w.withColumn("_walk_ord", F.lit(i)) for i, w in enumerate(walks)
    ]
    u = tagged[0]
    for w in tagged[1:]:
        u = u.unionByName(w, allowMissingColumns=True)
    arrival = F.struct("warc_ts", "superstep", "_walk_ord")
    cols = [c for c in u.columns if c not in ("url", "_walk_ord")]
    return (
        u.groupBy("url")
        .agg(F.max_by(F.struct(*cols), arrival).alias("_row"))
        .select("url", *[F.col(f"_row.{c}").alias(c) for c in cols])
    )


def headers_map(resources: DataFrame,
                col: str = "headers",
                out: str = "headers_map") -> DataFrame:
    """P12: map view over the flattened [k1, v1, k2, v2, ...] headers array
    (lib/resource.go:58-67 HeadersMap). JVM-side: pair up even/odd slots
    with map_from_arrays; odd-length arrays drop the dangling key like the
    reference's loop bound; NULL stays NULL."""
    h = F.col(col)
    n_pairs = F.floor(F.size(h) / 2).cast("int")
    idx = F.sequence(F.lit(0), n_pairs - 1)
    keys = F.transform(idx, lambda i: F.element_at(h, i * 2 + 1))
    vals = F.transform(idx, lambda i: F.element_at(h, i * 2 + 2))
    m = F.when(h.isNotNull() & (n_pairs > 0), F.map_from_arrays(keys, vals))
    return resources.withColumn(out, m)


def timespan(resources: DataFrame) -> DataFrame:
    """min/max capture time (lib/walk.go:66-76)."""
    return resources.agg(
        F.min("warc_ts").alias("start"), F.max("warc_ts").alias("end")
    )


def clean(entries: DataFrame, prefix: str) -> tuple[DataFrame, dict]:
    """Drop sitemap entries whose url starts with ``prefix``; report
    total/removed/kept counts (cmd/clean.go:39-95) from ONE aggregation."""
    kept = entries.filter(~F.col("url").startswith(prefix))
    row = entries.agg(
        F.count("*").alias("t"),
        F.coalesce(
            F.sum(F.col("url").startswith(prefix).cast("long")), F.lit(0)
        ).alias("r"),
    ).first()
    total, removed = int(row["t"]), int(row["r"])
    return kept, {"total": total, "removed": removed, "kept": total - removed}


def build_capture_index(resources: DataFrame) -> DataFrame:
    """Normalized-key lookup table for ``get_capture``: compute the key ONCE
    over a narrow meta projection and pin it, so point lookups (and every
    redirect hop) scan a compact in-memory table instead of re-running the
    normalization UDF over the full resources table per hop. At warehouse
    scale this is a stored ``_k`` column on the resources table, partitioned
    by bucket(_k) — the lookup filter partition-prunes."""
    keyed = resources.drop("text", "links", "html").withColumn(
        "_k", _norm_udf(F.col("url"))
    )
    parts = max(resources.sparkSession.sparkContext.defaultParallelism, 1)
    return keyed.coalesce(parts).localCheckpoint(eager=True)


def get_capture(resources: DataFrame, url: str,
                follow_redirects: bool = False,
                max_hops: int = 20,
                capture_index: DataFrame | None = None) -> dict | None:
    """Point lookup of the latest capture of a url — the walk-archive
    ``Get(url, time)`` / API raw-vs-resolved read (lib/walk.go:167-210,
    api/collection_handlers.go:164-187: latest-timestamp argmax; the time
    argument is effectively ignored there too). With ``follow_redirects``,
    chase RedirectTo pointers up to 20 hops (the API resolution cap).

    Pass ``capture_index`` (from ``build_capture_index``) when issuing many
    lookups; otherwise one is built for the call. Each hop is a
    filter + max_by aggregation over the pinned narrow index — no per-hop
    re-normalization, no full-row sort. The full row (text/links) is joined
    back only for the terminal hop."""
    t = normalize_url(url)
    keyed = capture_index if capture_index is not None \
        else build_capture_index(resources)
    meta_cols = [c for c in keyed.columns if c != "_k"]
    pick = F.max_by(F.struct(*meta_cols), F.struct("warc_ts", "superstep"))
    for _ in range(max_hops):
        row = (
            keyed.filter(F.col("_k") == F.lit(t)).agg(pick.alias("_r"))
            .select("_r.*").first()
        )
        if row is None or row["url"] is None:
            return None
        r = row.asDict()
        if follow_redirects and r.get("redirect_to"):
            t = normalize_url(r["redirect_to"])
            continue
        if "text" in resources.columns or "links" in resources.columns:
            full = (
                resources.filter(
                    (F.col("url") == F.lit(r["url"]))
                    & (F.col("superstep") == F.lit(r["superstep"]))
                    & (F.col("warc_ts").eqNullSafe(F.lit(r["warc_ts"])))
                ).limit(1).collect()
            )
            if full:
                return full[0].asDict()
        return r
    return None


def find_index(ok_resources: DataFrame, url: str) -> int:
    """Position of url in the SURT-sorted index (lib/walk.go:112-128 does a
    linear scan). Computed as a count-below-key: find the target's
    (surt_url, warc_ts, url) key (one small argmin job), then count rows
    strictly before it — fully parallel aggregations, no single-partition
    global window."""
    t = normalize_url(url)
    d = ok_resources.select(
        _surt_udf(F.col("url")).alias("surt_url"), "warc_ts", "url"
    )
    key = (
        d.filter(F.col("url") == F.lit(t))
        .agg(F.min(F.struct("surt_url", "warc_ts", "url")).alias("k"))
        .first()["k"]
    )
    if key is None:
        return -1
    before = (
        (F.col("surt_url") < F.lit(key["surt_url"]))
        | ((F.col("surt_url") == F.lit(key["surt_url"]))
           & (F.col("warc_ts") < F.lit(key["warc_ts"])))
        | ((F.col("surt_url") == F.lit(key["surt_url"]))
           & (F.col("warc_ts") == F.lit(key["warc_ts"]))
           & (F.col("url") < F.lit(key["url"])))
    )
    return int(d.filter(before).count())
