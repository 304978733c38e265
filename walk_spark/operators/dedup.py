"""URL-seen deduplication — the heart of the engine (SURVEY.md §2.3).

The reference performs one badger point-lookup per candidate URL
(lib/coordinator.go:301-309). The set-oriented re-expression is:

  1. within-batch dedup (D1): ``groupBy(url)`` keeping the deterministic
     first discovery (min (parent_depth, parent_seq, ordinal)),
  2. seen anti-join (D2): ``candidates LEFT ANTI JOIN frontier ON url``,
     optionally prefiltered by per-partition bloom filters so that at
     10^10-url scale only candidates that *might* be seen reach the exact
     anti-join; bloom false-positives are corrected by the exact join, so
     results are identical with the prefilter on or off.

Partitioning: both sides carry ``part_id`` (salted canonical-host hash) so
the anti-join is an equi-join on (part_id, url) — partition-prunable on an
Iceberg seen table, and co-partitioned when the frontier is bucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_within_batch(candidates: DataFrame) -> DataFrame:
    """D1: one row per url, keeping the deterministic first discovery.

    ``candidates`` columns: url, host, parent_depth, parent_seq, ordinal
    (position of the link within its parent page). The reference's Go-map
    iteration made this nondeterministic (lib/coordinator.go:279-298); we
    define the canonical winner as min (parent_depth, parent_seq, ordinal).
    Map-side partial aggregation makes this a cheap shuffle.
    """
    return (
        candidates.groupBy("url")
        .agg(
            F.min(
                F.struct("parent_depth", "parent_seq", "ordinal", "host")
            ).alias("_w")
        )
        .select(
            "url",
            F.col("_w.host").alias("host"),
            F.col("_w.parent_depth").alias("parent_depth"),
            F.col("_w.parent_seq").alias("parent_seq"),
            F.col("_w.ordinal").alias("ordinal"),
        )
    )


def build_bloom_partitions(
    seen: DataFrame,
    expected_items: int,
    num_bits: int,
) -> DataFrame:
    """One bloom filter per seen-set partition: (part_id, bf binary).

    Uses Spark's JVM-side ``bloom_filter_agg`` over ``xxhash64(url)``.
    The per-partition split keeps each filter's fpp low even at 10^10 urls
    total (items/partition = total/P) and lets the filters be rebuilt
    incrementally per partition as the crawl grows.
    """
    per_part = max(expected_items, 4096)
    return seen.groupBy("part_id").agg(
        F.expr(
            f"bloom_filter_agg(xxhash64(url), {per_part}L, {num_bits}L)"
        ).alias("bf")
    )


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    blooms: DataFrame | None = None,
) -> DataFrame:
    """D2: candidates not present in the seen set (exact url-string match).

    With ``blooms``: candidates whose partition bloom says "definitely new"
    skip the exact anti-join entirely; "maybe seen" candidates are confirmed
    by the (part_id, url) anti-join. Identical output either way.
    """
    if blooms is None:
        return candidates.join(
            seen.select("part_id", "url"), ["part_id", "url"], "left_anti"
        )
    c = candidates.join(F.broadcast(blooms), "part_id", "left")
    maybe_seen = c.filter(
        F.col("bf").isNotNull()
        & F.expr("might_contain(bf, xxhash64(url))")
    ).drop("bf")
    definitely_new = c.filter(
        F.col("bf").isNull()
        | ~F.expr("might_contain(bf, xxhash64(url))")
    ).drop("bf")
    confirmed_new = maybe_seen.join(
        seen.select("part_id", "url"), ["part_id", "url"], "left_anti"
    )
    return definitely_new.unionByName(confirmed_new)
