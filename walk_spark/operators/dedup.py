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

Bloom implementation note: Spark's ``bloom_filter_agg``/``might_contain``
expressions are internal-only (used by runtime join filters, not registered
as public SQL functions in Spark 4), so the per-partition filters are numpy
bitsets built with ``applyInPandas`` and probed inside an Arrow UDF. Each
partition's filter is sized for items/P. In this sandbox the filter map
travels to probes as a task-closure broadcast; on a cluster the same
(part_id, bitset) rows live in a table and the probe is a cogrouped
``applyInPandas`` — the construction/probe kernels below are shared by both
deployments.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType


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


# -- bloom kernels -------------------------------------------------------------

_N_HASHES = 7


def _url_hashes(urls: pd.Series, num_bits: int) -> np.ndarray:
    """(n, _N_HASHES) bit positions via double hashing of a stable digest."""
    h1 = np.empty(len(urls), dtype=np.uint64)
    h2 = np.empty(len(urls), dtype=np.uint64)
    for i, u in enumerate(urls):
        d = hashlib.blake2b((u or "").encode("utf-8"), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little") | 1
    ks = np.arange(_N_HASHES, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(num_bits)


def build_bloom_partitions(
    seen: DataFrame,
    expected_items: int,
    num_bits: int,
) -> DataFrame:
    """One bloom bitset per seen-set partition: (part_id, bf binary).

    The per-partition split keeps each filter's fpp low even at 10^10 urls
    total (items/partition = total/P) and lets filters be rebuilt
    incrementally per partition as the crawl grows.
    """
    nb = max(int(num_bits), 1024)

    def _build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(nb // 8 + 1, dtype=np.uint8)
        pos = _url_hashes(pdf["url"], nb).ravel()
        np.bitwise_or.at(bits, pos >> np.uint64(3),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return pd.DataFrame(
            {"part_id": [int(key[0])], "bf": [bits.tobytes()]}
        )

    return (
        seen.select("part_id", "url")
        .groupBy("part_id")
        .applyInPandas(_build, schema="part_id int, bf binary")
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
    bf_map = {r["part_id"]: r["bf"] for r in blooms.collect()}
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(bf_map)

    def _might_contain(urls: pd.Series, parts: pd.Series) -> pd.Series:
        out = np.zeros(len(urls), dtype=bool)
        m = bc.value
        for i, (u, p) in enumerate(zip(urls, parts)):
            bf = m.get(int(p))
            if bf is None:
                continue
            bits = np.frombuffer(bf, dtype=np.uint8)
            nb = (len(bits) - 1) * 8
            pos = _url_hashes(pd.Series([u]), nb).ravel()
            out[i] = bool(
                np.all(bits[pos >> np.uint64(3)]
                       & (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))
            )
        return pd.Series(out)

    mc = F.pandas_udf(_might_contain, returnType=BooleanType())
    c = candidates.withColumn("_maybe", mc(F.col("url"), F.col("part_id")))
    definitely_new = c.filter(~F.col("_maybe")).drop("_maybe")
    confirmed_new = (
        c.filter(F.col("_maybe")).drop("_maybe")
        .join(seen.select("part_id", "url"), ["part_id", "url"], "left_anti")
    )
    return definitely_new.unionByName(confirmed_new)
