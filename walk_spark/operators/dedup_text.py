"""Document deduplication for training-data pipelines at 100 TB scale.

Four escalating strategies, each returning DataFrames (never driver-side):

- exact_duplicates      — hash-groupBy on a normalized fingerprint. One
  shuffle, map-side partial agg; the cheapest pass, run first.
- jaccard_word_pairs    — exact word-set Jaccard via explode + self-join on
  shared tokens. Quadratic in the worst case; used as the small-scale oracle
  for the sketch methods and SQL-verifiable in DuckDB.
- minhash_lsh_pairs     — MinHash signatures (numpy, one Arrow UDF pass) +
  banded LSH bucketing: candidates only ever meet inside a band bucket, so
  the join is linear in corpus size; bucket-join → estimate → threshold.
- simhash_pairs         — 64-bit SimHash + pigeonhole band blocking for
  hamming-distance ≤ k pairs.

Scale notes: all joins are equi-joins on hash keys (AQE-skew-splittable);
signatures are fixed-width arrays (no text shuffled after the UDF pass);
band buckets with pathological sizes (boilerplate pages) should be capped
with a per-bucket limit before pairing — exposed as ``max_bucket_size``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType

from walk_spark.functions.text import fingerprint_md5, shingles, words

# -- exact ------------------------------------------------------------------

def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     max_group_ids: int = 10_000) -> DataFrame:
    """Duplicate groups by normalized-text fingerprint: one row per group
    with >1 member: (fp, n_docs, keep_id=min id, doc_ids sorted — capped,
    n_overflow = members beyond the cap).

    ``doc_ids`` keeps at most ``max_group_ids`` (smallest ids); the rest
    are counted in ``n_overflow``, never materialized. The cap is applied
    BEFORE aggregation (row_number over the fp window feeds a conditional
    collect_list), so the agg buffer itself is bounded — at 100 TB a
    boilerplate/empty-page fingerprint with 10^8 members would otherwise
    build one multi-GB array cell in a single task. The window and the
    groupBy share the hash-partitioning on fp: one shuffle total.
    """
    from pyspark.sql import Window
    w = Window.partitionBy("fp").orderBy("doc_id")
    ranked = docs.select(
        F.col(id_col).alias("doc_id"),
        fingerprint_md5(F.col(text_col)).alias("fp"),
    ).withColumn("_rn", F.row_number().over(w))
    return (
        ranked.groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("_rn") <= max_group_ids, F.col("doc_id"))
                )
            ).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
        .withColumn(
            "n_overflow",
            F.greatest(F.col("n_docs") - F.lit(max_group_ids), F.lit(0)),
        )
    )


# -- exact jaccard (oracle path) ---------------------------------------------

def jaccard_word_pairs(docs: DataFrame, threshold: float = 0.5,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Exact word-set Jaccard over all pairs sharing ≥1 token.


    tokens -> self-join on token -> |A∩B| -> sizes -> jaccard ≥ threshold.
    The shared-token join explodes on ubiquitous tokens — fine at oracle
    scale, replaced by MinHash-LSH at corpus scale.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(words(F.col(text_col)))).alias("tok"),
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


def jaccard_shingle_pairs(docs: DataFrame, threshold: float = 0.5,
                          n: int = 3, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Exact word-N-GRAM (shingle) Jaccard over all pairs sharing ≥1
    shingle — order-sensitive near-dup detection (word-set jaccard is blind
    to reordering; 3-gram jaccard is the standard web-dedup metric). Same
    oracle-path shape as ``jaccard_word_pairs``: explode → self-join →
    |A∩B| → sizes → threshold. Shingling is JVM-side
    (functions.text.shingles)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(F.col(text_col), n)).alias("tok"),
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


# -- minhash + LSH ------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(k: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(docs: DataFrame, k: int = 128, shingle_n: int = 3,
                       id_col: str = "doc_id",
                       text_col: str = "text",
                       seed: int = 42) -> DataFrame:
    """(doc_id, sig array<long>[k]) — one Arrow UDF pass.

    Shingle hashing uses a splitmix-style 64-bit mix of Python's stable
    md5-based digest per shingle, then k universal-hash rows min-reduced in
    one numpy matmul-shaped op. ~O(shingles·k) vectorized per batch.
    """
    a, b = _minhash_params(k, seed)

    def _sig(texts: pd.Series) -> pd.Series:
        # per-token digests memoized across the batch (web-text vocab repeats
        # heavily); shingle hashes = vectorized polynomial combination of
        # consecutive token hashes — no per-shingle string building/hashing
        tok_cache: dict[str, int] = {}
        A = np.uint64(0x9E3779B97F4A7C15)

        def tok_hash(w: str) -> int:
            h = tok_cache.get(w)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(),
                    "little",
                )
                tok_cache[w] = h
            return h

        out = []
        for t in texts:
            toks = [w for w in (t or "").lower().split() if w]
            if not toks:
                out.append(np.zeros(k, dtype=np.int64))
                continue
            th = np.fromiter(
                (tok_hash(w) for w in toks), dtype=np.uint64, count=len(toks)
            )
            n_sh = max(len(th) - shingle_n + 1, 1)
            hv = np.zeros(n_sh, dtype=np.uint64)
            for j in range(min(shingle_n, len(th))):
                hv = hv * A + th[j:j + n_sh]
            hv = np.unique(hv)  # shingles are a SET (dedup before min)
            m = (hv[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE)
            out.append(m.min(axis=1).astype(np.int64))
        return pd.Series(out)

    sig_udf = F.pandas_udf(_sig, returnType=ArrayType(LongType()))
    return docs.select(
        F.col(id_col).alias("doc_id"), sig_udf(F.col(text_col)).alias("sig")
    )


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5, k: int = 128,
                      bands: int = 32, shingle_n: int = 3,
                      id_col: str = "doc_id", text_col: str = "text",
                      max_bucket_size: int = 5000,
                      seed: int = 42,
                      report: dict | None = None) -> DataFrame:
    """Near-duplicate candidate pairs with estimated jaccard ≥ threshold.

    sig -> split into ``bands`` bands of k/bands rows -> hash each band ->
    explode to (band, bucket) keys -> self-join within buckets -> estimate
    jaccard as matching-minhash fraction -> threshold.

    No silent caps: buckets larger than ``max_bucket_size`` (boilerplate
    pages — quadratic inside the bucket) are dropped, and passing
    ``report={}`` fills ``dropped_buckets``/``dropped_rows`` with the drop
    counts (costs one extra aggregation job; the signature pass is pinned so
    the UDF doesn't run twice).
    """
    rows = k // bands
    sigs = minhash_signatures(docs, k=k, shingle_n=shingle_n,
                              id_col=id_col, text_col=text_col, seed=seed)
    if report is not None:
        sigs = sigs.localCheckpoint(eager=False)
    banded = sigs.select(
        "doc_id", "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), i * rows + 1, rows),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    sizes = banded.groupBy("band", "bucket").agg(F.count("*").alias("bsz"))
    if report is not None:
        drop = sizes.filter(F.col("bsz") > max_bucket_size).agg(
            F.count("*").alias("nb"),
            F.coalesce(F.sum("bsz"), F.lit(0)).alias("nr"),
        ).first()
        report["dropped_buckets"] = int(drop["nb"])
        report["dropped_rows"] = int(drop["nr"])
    banded = banded.join(
        sizes.filter(F.col("bsz") <= max_bucket_size), ["band", "bucket"]
    )
    l = banded.select("band", "bucket", F.col("doc_id").alias("id_a"),
                      F.col("sig").alias("sig_a"))
    r = banded.select("band", "bucket", F.col("doc_id").alias("id_b"),
                      F.col("sig").alias("sig_b"))
    cand = (
        l.join(r, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda m: m,
            )
        )
        / F.lit(k),
        4,
    )
    return (
        cand.select("id_a", "id_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


def lsh_near_dup_verified(docs: DataFrame, threshold: float = 0.9,
                          k: int = 128, bands: int = 32, shingle_n: int = 1,
                          id_col: str = "doc_id", text_col: str = "text",
                          candidate_margin: float = 0.2,
                          max_bucket_size: int = 5000,
                          seed: int = 42,
                          report: dict | None = None) -> DataFrame:
    """Near-duplicate pairs with EXACT word-set jaccard ≥ threshold, found
    via MinHash-LSH candidate generation — the production dedup pattern:
    the sketch prunes the pair space to bucket collisions, an exact verify
    (JVM array_intersect, no Python) confirms survivors, so the output is
    the exact answer while the work stays linear in corpus size.

    ``shingle_n`` defaults to 1 (word-SET minhash): the sketch must
    estimate the same jaccard the verify computes — n-gram shingles
    understate word-set similarity (one changed word kills n shingles), so
    a word-j 0.93 pair could fall below the candidate cut under 3-grams.
    Candidates are taken at ``threshold - candidate_margin`` so estimate
    noise cannot drop a true pair: at j ≥ 0.9 with the 32×4 default bands,
    P(miss) ≈ (1-j⁴)³² + P(Binom est < 0.7) < 10⁻¹³ — deterministic in
    practice, which is what lets a DuckDB exact-jaccard oracle verify this
    operator end-to-end."""
    # Exactness claim => cap drops cannot be silent: with report=None an
    # internal report is used and an over-cap bucket raises instead of
    # quietly losing true pairs (duplicate-heavy corpora put >cap docs in
    # one band bucket — exactly the pairs this operator exists to find).
    strict = report is None
    if strict:
        report = {}
    cand = minhash_lsh_pairs(
        docs, threshold=max(threshold - candidate_margin, 0.0), k=k,
        bands=bands, shingle_n=shingle_n, id_col=id_col, text_col=text_col,
        max_bucket_size=max_bucket_size, seed=seed, report=report,
    )
    if strict and report["dropped_buckets"]:
        raise ValueError(
            f"lsh_near_dup_verified: {report['dropped_buckets']} band "
            f"buckets over max_bucket_size={max_bucket_size} "
            f"({report['dropped_rows']} rows) dropped — output would "
            "silently miss true pairs; raise max_bucket_size or pass "
            "report={} to accept documented drops"
        )
    t = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(words(F.col(text_col))).alias("_toks"),
    )
    a = t.select(F.col("_id").alias("id_a"), F.col("_toks").alias("_ta"))
    b = t.select(F.col("_id").alias("id_b"), F.col("_toks").alias("_tb"))
    inter = F.size(F.array_intersect("_ta", "_tb"))
    jac = F.round(
        inter / (F.size("_ta") + F.size("_tb") - inter), 4
    )
    return (
        cand.select("id_a", "id_b")
        .join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


# -- simhash -------------------------------------------------------------------

def simhash_signatures(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long): 64-bit SimHash over word tokens (numpy)."""

    def _sim(texts: pd.Series) -> pd.Series:
        tok_cache: dict[str, int] = {}

        def tok_hash(w: str) -> int:
            h = tok_cache.get(w)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(),
                    "little",
                )
                tok_cache[w] = h
            return h

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = [w for w in (t or "").lower().split() if w]
            if not toks:
                continue
            hv = np.fromiter(
                (tok_hash(w) for w in toks), dtype=np.uint64, count=len(toks)
            )
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            sh = np.uint64(0)
            for bpos in np.nonzero(v > 0)[0]:
                sh |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(sh.astype(np.int64))
        return pd.Series(out)

    udf = F.pandas_udf(_sim, returnType=LongType())
    return docs.select(
        F.col(id_col).alias("doc_id"), udf(F.col(text_col)).alias("simhash")
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text",
                  max_bucket_size: int = 5000,
                  report: dict | None = None) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming via pigeonhole blocking:
    split 64 bits into 4 16-bit bands — any pair within distance 3 shares at
    least one exact band (4 > 3). Join per band, verify with bit_count.

    Band buckets larger than ``max_bucket_size`` (a boilerplate band value
    shared by millions of pages goes quadratic) are dropped; pass
    ``report={}`` to receive ``dropped_buckets``/``dropped_rows``."""
    sigs = simhash_signatures(docs, id_col=id_col, text_col=text_col)
    if report is not None:
        sigs = sigs.localCheckpoint(eager=False)
    banded = sigs.select(
        "doc_id", "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), s)
                    .bitwiseAND(F.lit(0xFFFF))
                    for s in (0, 16, 32, 48)
                ]
            )
        ).alias("band", "key"),
    )
    sizes = banded.groupBy("band", "key").agg(F.count("*").alias("bsz"))
    if report is not None:
        drop = sizes.filter(F.col("bsz") > max_bucket_size).agg(
            F.count("*").alias("nb"),
            F.coalesce(F.sum("bsz"), F.lit(0)).alias("nr"),
        ).first()
        report["dropped_buckets"] = int(drop["nb"])
        report["dropped_rows"] = int(drop["nr"])
    banded = banded.join(
        sizes.filter(F.col("bsz") <= max_bucket_size), ["band", "key"]
    )
    l = banded.select("band", "key", F.col("doc_id").alias("id_a"),
                      F.col("simhash").alias("h_a"))
    r = banded.select("band", "key", F.col("doc_id").alias("id_b"),
                      F.col("simhash").alias("h_b"))
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        l.join(r, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


def simhash_exact_dups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_bucket_size: int = 5000,
                       report: dict | None = None) -> DataFrame:
    """Exact-duplicate pairs found via SimHash blocking + fingerprint
    verify: identical token streams have identical simhash (hamming 0, so
    they collide in every band), and the md5-fingerprint equality check
    discards hamming-0 hash collisions between different texts. The output
    is therefore exactly the fingerprint-equality pair set — SQL-verifiable
    — while the join never leaves the simhash band buckets."""
    # Same no-silent-drop contract as lsh_near_dup_verified: report=None
    # means strict — over-cap band buckets raise rather than lose pairs.
    strict = report is None
    if strict:
        report = {}
    pairs = simhash_pairs(docs, max_hamming=0, id_col=id_col,
                          text_col=text_col, max_bucket_size=max_bucket_size,
                          report=report)
    if strict and report["dropped_buckets"]:
        raise ValueError(
            f"simhash_exact_dups: {report['dropped_buckets']} band buckets "
            f"over max_bucket_size={max_bucket_size} "
            f"({report['dropped_rows']} rows) dropped — output would "
            "silently miss true duplicate pairs; raise max_bucket_size or "
            "pass report={} to accept documented drops"
        )
    fp = docs.select(
        F.col(id_col).alias("_id"),
        fingerprint_md5(F.col(text_col)).alias("_fp"),
    )
    a = fp.select(F.col("_id").alias("id_a"), F.col("_fp").alias("_fa"))
    b = fp.select(F.col("_id").alias("id_b"), F.col("_fp").alias("_fb"))
    return (
        pairs.select("id_a", "id_b")
        .join(a, "id_a").join(b, "id_b")
        .filter(F.col("_fa") == F.col("_fb"))
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    )
