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
bitsets built with ``applyInPandas`` over the seen rows. Probing has two
equivalence-tested plans chosen by the CONFIG-derived filter-table size:
small tables broadcast to a vectorized pandas UDF (no candidate shuffle);
big ones (10^10-url scale → GBs of bitsets) go through a cogrouped
``applyInPandas`` on ``part_id`` where each task sees one partition's
candidates plus its single bitset row and nothing touches the driver. The
(part_id, bf) rows are an ordinary DataFrame, rebuilt incrementally per
partition (``merge_bloom_partitions``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def dedup_within_batch(candidates: DataFrame,
                       group_cols: tuple = ("url",)) -> DataFrame:
    """D1: one row per url, keeping the deterministic first discovery.

    ``candidates`` columns: url, host, parent_depth, parent_seq, ordinal
    (position of the link within its parent page). The reference's Go-map
    iteration made this nondeterministic (lib/coordinator.go:279-298); we
    define the canonical winner as min (parent_depth, parent_seq, ordinal).
    Map-side partial aggregation makes this a cheap shuffle.

    ``group_cols``: pass ("part_id", "url") when part_id is already
    attached — part_id is a pure function of url, so the groups are
    identical, but the aggregate's output then carries
    HashPartitioning(part_id, url), which the downstream seen anti-join
    (same keys) REUSES: one shuffle of the candidate stream instead of
    two. This is the 10^10-frontier shape — dedup and anti-join share one
    exchange.
    """
    return (
        candidates.groupBy(*group_cols)
        .agg(
            F.min(
                F.struct("parent_depth", "parent_seq", "ordinal", "host")
            ).alias("_w")
        )
        .select(
            *group_cols,
            F.col("_w.host").alias("host"),
            F.col("_w.parent_depth").alias("parent_depth"),
            F.col("_w.parent_seq").alias("parent_seq"),
            F.col("_w.ordinal").alias("ordinal"),
        )
    )


# -- bloom kernels -------------------------------------------------------------

_N_HASHES = 7


#: 16-byte siphash keys for the two independent url hashes (pandas
#: hash_array requires exactly 16 bytes). Stable constants — filters are
#: built and probed within one run (resume rebuilds from the frontier), so
#: cross-version siphash drift cannot corrupt a filter.
_HASH_KEY_1 = "walkspark-seen-1"
_HASH_KEY_2 = "walkspark-seen-2"


def _url_hashes(urls, num_bits: int) -> np.ndarray:
    """(n, _N_HASHES) bit positions via double hashing. One call hashes a
    whole Arrow batch through pandas' cython siphash (hash_array) —
    ~2x the throughput of the earlier per-row hashlib loop on
    million-url batches, and no Python-level loop."""
    arr = np.asarray(urls, dtype=object)
    if len(arr) and any(u is None for u in arr):
        arr = np.array([u or "" for u in arr], dtype=object)
    h1 = pd.util.hash_array(arr, hash_key=_HASH_KEY_1, categorize=False)
    h2 = pd.util.hash_array(arr, hash_key=_HASH_KEY_2, categorize=False) \
        | np.uint64(1)
    ks = np.arange(_N_HASHES, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(num_bits)


def _aligned_bits(num_bits: int) -> int:
    """Byte-aligned filter size: build allocates nb//8 bytes and the probe
    recomputes nb as len(bytes)*8 — rounding up front keeps both moduli
    identical (a misaligned nb would shift probe positions → false
    negatives → seen urls re-enqueued)."""
    nb = max(int(num_bits), 1024)
    return (nb + 7) // 8 * 8


def _probe_bits(bits: np.ndarray, urls) -> np.ndarray:
    """Vectorized membership test of a url batch against one bitset."""
    nb = len(bits) * 8
    pos = _url_hashes(urls, nb)  # (n, k)
    hit = bits[pos >> np.uint64(3)] & (
        np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
    )
    return (hit != 0).all(axis=1)


def build_bloom_partitions(
    seen: DataFrame,
    expected_items: int,
    num_bits: int,
) -> DataFrame:
    """One bloom bitset per seen-set partition: (part_id, bf binary).

    The per-partition split keeps each filter's fpp low even at 10^10 urls
    total (items/partition = total/P) and lets filters be rebuilt
    incrementally per partition as the crawl grows (see
    ``merge_bloom_partitions``).
    """
    nb = _aligned_bits(num_bits)

    def _build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(nb // 8, dtype=np.uint8)
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


def merge_bloom_delta(existing: DataFrame, delta: DataFrame,
                      num_bits: int) -> DataFrame:
    """OR a (part_id, url) delta directly into the standing (part_id, bf)
    filters — ``build_bloom_partitions`` + ``merge_bloom_partitions`` fused
    into ONE cogrouped pass: the delta urls are hashed in the same task
    that ORs them into the partition's bitset, so the per-superstep filter
    maintenance pays one shuffle of the delta and one Python pass instead
    of a build shuffle plus a second cogroup (guide §2.4). Bit-identical to
    the two-pass path (same hashes, same OR)."""
    nb = _aligned_bits(num_bits)

    def _or(key, bf_pdf: pd.DataFrame, url_pdf: pd.DataFrame) -> pd.DataFrame:
        if bf_pdf.empty:
            bits = np.zeros(nb // 8, dtype=np.uint8)
        else:
            bits = np.frombuffer(bf_pdf["bf"].iloc[0], dtype=np.uint8).copy()
            for buf in bf_pdf["bf"].iloc[1:]:
                bits |= np.frombuffer(buf, dtype=np.uint8)
        if len(url_pdf):
            pos = _url_hashes(url_pdf["url"], len(bits) * 8).ravel()
            np.bitwise_or.at(
                bits, pos >> np.uint64(3),
                np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8),
            )
        return pd.DataFrame({"part_id": [int(key[0])], "bf": [bits.tobytes()]})

    return (
        existing.groupBy("part_id")
        .cogroup(delta.select("part_id", "url").groupBy("part_id"))
        .applyInPandas(_or, schema="part_id int, bf binary")
    )


def merge_bloom_partitions(existing: DataFrame, added: DataFrame) -> DataFrame:
    """OR two (part_id, bf) filter tables — the incremental-build path: per
    superstep only the NEW frontier rows are hashed (build over the delta),
    then merged into the standing filters. Cost ∝ new urls, not total seen."""

    def _or(key, a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        bufs = list(a["bf"]) + list(b["bf"])
        acc = np.frombuffer(bufs[0], dtype=np.uint8).copy()
        for buf in bufs[1:]:
            acc |= np.frombuffer(buf, dtype=np.uint8)
        return pd.DataFrame({"part_id": [int(key[0])], "bf": [acc.tobytes()]})

    return (
        existing.groupBy("part_id")
        .cogroup(added.groupBy("part_id"))
        .applyInPandas(_or, schema="part_id int, bf binary")
    )


#: filter tables at or below this CONFIG-DERIVED size (seen_partitions ×
#: num_bits/8 — no data dependence, so the path choice is deterministic
#: across cluster sizes) are collected + broadcast and probed in-place with
#: a pandas UDF (no candidate shuffle); larger tables use the cogrouped
#: shuffle so no multi-GB filter set ever touches the driver.
BLOOM_BROADCAST_MAX_BYTES = 256 * 1024 * 1024

#: broadcasts created by anti_join_seen's small-filter path, pending
#: release. A broadcast must outlive the (lazy) probe plan that captures
#: it, so anti_join_seen can't destroy it itself — callers invoke
#: release_bloom_broadcasts() once the consuming action has run (the
#: crawler does this after each superstep's frontier pin). Without this,
#: long crawls / repeated Crawler construction accumulate driver memory.
#: This module-global list is the DEFAULT registry for direct callers;
#: owners that may run concurrently (each Crawler) pass their OWN
#: ``registry`` list so one owner's release cannot destroy a broadcast
#: another owner's still-lazy probe plan holds.
_PENDING_BROADCASTS: list = []


def release_bloom_broadcasts(registry: list | None = None) -> int:
    """Destroy the bloom broadcasts in ``registry`` (default: the module
    list) whose consuming plans have been materialized. Returns how many
    were released."""
    reg = _PENDING_BROADCASTS if registry is None else registry
    n = len(reg)
    for bc in reg:
        try:
            bc.destroy()
        except Exception:
            pass  # already destroyed / context gone
    reg.clear()
    return n


def prepare_bloom_broadcast(blooms: DataFrame, registry: list | None = None):
    """Collect a (part_id, bf) filter table to the driver and broadcast it
    — the eager half of ``anti_join_seen``'s small-filter path, split out
    so an owner can run it on a helper thread CONCURRENT with other work
    (in the crawl loop it overlaps the fetch join + extraction instead of
    serializing the superstep). The returned broadcast is appended to
    ``registry`` (default: module list) for later release."""
    bf_map = {r["part_id"]: r["bf"] for r in blooms.collect()}
    bc = blooms.sparkSession.sparkContext.broadcast(bf_map)
    (_PENDING_BROADCASTS if registry is None else registry).append(bc)
    return bc


def _probe_filter_bytes(buf: bytes, urls, filter_kind: str) -> np.ndarray:
    """Dispatch a serialized per-partition filter probe by kind: "bloom"
    (raw bitset, this module) or "cuckoo" (operators.cuckoo — the north
    rule's second filter kind). Both return a maybe-seen bool mask with no
    false negatives, so ``anti_join_seen``'s output is kind-invariant."""
    if filter_kind == "cuckoo":
        from walk_spark.operators.cuckoo import probe_cuckoo_bytes
        return probe_cuckoo_bytes(buf, urls)
    return _probe_bits(np.frombuffer(buf, dtype=np.uint8), urls)


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    blooms: DataFrame | None = None,
    filters_bytes: int | None = None,
    prepared_bc=None,
    registry: list | None = None,
    filter_kind: str = "bloom",
) -> DataFrame:
    """D2: candidates not present in the seen set (exact url-string match).

    With ``blooms`` (part_id, bf): candidates whose partition filter says
    "definitely new" skip the exact anti-join entirely, "maybe seen"
    candidates are confirmed by the (part_id, url) anti-join. Bloom
    false-positives are corrected by the exact join, so the output is
    identical with the prefilter on or off.

    Probe plan, chosen by ``filters_bytes`` (callers compute it from CONFIG
    — seen_partitions × num_bits/8): small filter tables broadcast to the
    probe UDF (one vectorized ``_probe_bits`` call per part_id group per
    Arrow batch, no extra shuffle); at 10^10-url scale the filters are GBs,
    so a cogrouped ``applyInPandas`` on part_id pairs each candidate
    partition with its single filter row and nothing touches the driver.
    An absent part_id row means that partition has no seen urls →
    definitely new.
    """
    if blooms is None:
        return candidates.join(
            seen.select("part_id", "url"), ["part_id", "url"], "left_anti"
        )
    cols = list(candidates.columns)
    use_bcast = (
        prepared_bc is not None
        or (filters_bytes is not None
            and filters_bytes <= BLOOM_BROADCAST_MAX_BYTES)
    )
    if use_bcast:
        # ``prepared_bc``: the caller already collected+broadcast the
        # filters (typically on a helper thread, off the critical path)
        # and owns its registration/release
        bc = (prepared_bc if prepared_bc is not None
              else prepare_bloom_broadcast(blooms, registry))

        def _probe_bc(urls: pd.Series, parts: pd.Series) -> pd.Series:
            out = np.zeros(len(urls), dtype=bool)
            m = bc.value
            pv = parts.to_numpy()
            for p in np.unique(pv):
                bf = m.get(int(p))
                if bf is None:
                    continue
                idx = np.nonzero(pv == p)[0]
                out[idx] = _probe_filter_bytes(bf, urls.iloc[idx],
                                               filter_kind)
            return pd.Series(out)

        from pyspark.sql.types import BooleanType
        mc = F.pandas_udf(_probe_bc, returnType=BooleanType())
        c = candidates.withColumn("_maybe", mc(F.col("url"), F.col("part_id")))
    else:
        out_fields = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in candidates.schema.fields
        )

        def _probe(key, cand: pd.DataFrame,
                   bf_pdf: pd.DataFrame) -> pd.DataFrame:
            if cand.empty:
                return cand.assign(_maybe=pd.Series([], dtype=bool))
            if bf_pdf.empty:
                return cand.assign(_maybe=False)
            return cand.assign(_maybe=_probe_filter_bytes(
                bf_pdf["bf"].iloc[0], cand["url"], filter_kind))

        c = (
            candidates.groupBy("part_id")
            .cogroup(blooms.groupBy("part_id"))
            .applyInPandas(_probe, schema=f"{out_fields}, _maybe boolean")
        )
    # `c` feeds TWO branches of the union below. A lazy localCheckpoint
    # makes the probed stream compute once and be read twice within the
    # consumer's job — without it, only the shuffle below the dedup
    # aggregate is reused (ReusedExchange) and the aggregate + probe UDF
    # run once per branch.
    c = c.localCheckpoint(eager=False)
    definitely_new = c.filter(~F.col("_maybe")).drop("_maybe")
    confirmed_new = (
        c.filter(F.col("_maybe")).drop("_maybe")
        .join(seen.select("part_id", "url"), ["part_id", "url"], "left_anti")
    )
    return definitely_new.unionByName(confirmed_new).select(*cols)
