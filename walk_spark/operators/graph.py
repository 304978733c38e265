"""Link-graph analytics over crawl output — the generalization of
inbound-links (cmd/inbound_links.go) to whole-graph queries.

Input is the edges view (``operators.queries.link_edges``: src, dst per
extracted link). All iterative state is pinned per iteration (bounded
partitions, truncated lineage), mirroring the crawl loop's discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """(url, out_degree, in_degree) over the union of endpoints."""
    out_d = edges.groupBy(F.col("src").alias("url")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = edges.groupBy(F.col("dst").alias("url")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_d.join(in_d, "url", "full_outer")
        .select(
            "url",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def pagerank(edges: DataFrame, alpha: float = 0.85, iters: int = 10,
             pin_partitions: int = 32) -> DataFrame:
    """Deterministic power-iteration PageRank: (url, rank), ranks sum to 1.

    Dangling-node mass is redistributed uniformly each iteration (the
    textbook formulation), so the result is a true probability vector.
    Each iteration is one join + one aggregation; rank state is pinned.
    """
    nodes = (
        edges.select(F.col("src").alias("url"))
        .unionByName(edges.select(F.col("dst").alias("url")))
        .distinct()
    ).coalesce(pin_partitions).localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy(F.col("src").alias("url")).agg(
        F.count("*").alias("deg")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    e = edges.join(out_deg, edges.src == out_deg.url).select(
        "src", "dst", "deg"
    ).coalesce(pin_partitions).localCheckpoint(eager=True)
    for _ in range(iters):
        contribs = (
            e.join(ranks, e.src == ranks.url)
            .select(F.col("dst").alias("url"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("url")
            .agg(F.sum("c").alias("in_mass"))
        )
        linked_mass = ranks.join(
            contribs, "url", "left"
        ).select("url", F.coalesce("in_mass", F.lit(0.0)).alias("in_mass"))
        # dangling mass = 1 - sum of mass that flowed along edges
        flowed = linked_mass.agg(F.sum("in_mass")).first()[0] or 0.0
        dangling = 1.0 - flowed
        ranks = linked_mass.select(
            "url",
            (
                F.lit((1.0 - alpha) / n)
                + F.lit(alpha) * (F.col("in_mass") + F.lit(dangling / n))
            ).alias("rank"),
        ).coalesce(pin_partitions).localCheckpoint(eager=True)
    return ranks


def top_pages(edges: DataFrame, k: int = 10, **kw) -> DataFrame:
    """Top-k urls by PageRank (TakeOrdered — no global sort).

    The selection key is the ROUNDED rank (6 decimals) with url ASC as the
    tie-break — the same key the SQL oracle orders by. Ordering by the
    unrounded rank would make nodes that tie at 1e-6 granularity near the
    k boundary engine-dependent (float summation order differs), so both
    engines must use one key."""
    return (
        pagerank(edges, **kw)
        .select("url", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("url"))
        .limit(k)
    )
