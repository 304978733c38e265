"""IVF (inverted-file) approximate nearest neighbour — the coarse-quantizer
scale path for embedding similarity, alongside ``similarity.ann_topk_lsh``.

An IVF index clusters the corpus with k-means (Lloyd iterations, cosine
metric — the repo's similarity measure throughout) and stores each vector
under its nearest centroid; a query probes only the ``nprobe`` clusters
whose centroids are closest, then brute-forces cosine inside them. Where
RP-LSH prunes by random sign buckets, IVF prunes by LEARNED regions — at
10^10 rows the served index scans nprobe/k of the corpus per query via
parquet partition pruning on the ``cluster`` column (same serving shape as
``write_lsh_index``).

Spark-first decomposition (no pyspark.ml dependency, no per-row Python):

- assignment: the k centroids are tiny (k x dim doubles) and enter the plan
  as LITERAL arrays — cosine against each is a JVM ``aggregate(zip_with)``
  expression, argmax via ``array_max`` over (cos, -cluster) structs (ties
  break toward the lower cluster id); whole-stage codegen, no shuffle.
- update: elementwise centroid means via ``posexplode`` -> partial-agg
  ``avg`` grouped on (cluster, pos) — ONE map-side-combined shuffle of
  k x dim aggregates per iteration; the k x dim result (e.g. 16 x 64) is
  collected to the driver to become the next iteration's literals.

Determinism: init is the ``k`` rows with the smallest ids; each Lloyd step
is a deterministic function of the previous centroids up to floating-point
summation order. Downstream use NEVER depends on exact cluster shapes —
the ANN contract (and the driver oracle) holds because identical vectors
always land in the same cluster and a query always probes its own argmax
cluster first.
"""

from __future__ import annotations

import json as _json

import numpy as np
from pyspark.sql import DataFrame, functions as F

from walk_spark.operators.similarity import (
    _norm,
    _read_sidecar,
    _write_sidecar,
    cosine_topk,
)

_EPS = 1e-30


def _cos_to_lit(vec_col, centroid: list[float]):
    """cosine(vec, centroid-literal) as a pure JVM expression."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    dot = F.aggregate(
        F.zip_with(vec_col, c, lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    cn = float(np.sqrt(sum(float(x) * x for x in centroid))) or 1.0
    return dot / (F.greatest(_norm(vec_col), F.lit(_EPS)) * F.lit(cn))


def _cluster_col(vec_col, centroids: list[list[float]]):
    """argmax-cosine cluster id over literal centroids (ties -> lower id)."""
    best = F.array_max(F.array(*[
        F.named_struct(
            F.lit("cos"), _cos_to_lit(vec_col, c),
            F.lit("negi"), F.lit(-i),
        )
        for i, c in enumerate(centroids)
    ]))
    return (-best["negi"]).cast("int")


def kmeans_fit(embeddings: DataFrame, k: int = 16, iters: int = 3,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> list[list[float]]:
    """Lloyd k-means (cosine assignment, elementwise-mean update) returning
    the centroids as a plain list — small enough (k x dim) to live in the
    plan as literals. Empty clusters keep their previous centroid."""
    init = (
        embeddings.orderBy(F.col(id_col)).limit(k)
        .select(F.col(vec_col).alias("v")).collect()
    )
    centroids = [[float(x) for x in r["v"]] for r in init]
    if len(centroids) < k:
        k = len(centroids)
    for _ in range(iters):
        assigned = embeddings.select(
            _cluster_col(F.col(vec_col), centroids).alias("cluster"),
            F.posexplode(vec_col).alias("pos", "val"),
        )
        rows = (
            assigned.groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]
        for r in rows:
            new[r["cluster"]][r["pos"]] = float(r["m"])
        centroids = new
    return centroids


def ivf_assign(embeddings: DataFrame, centroids: list[list[float]],
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(vec_id, embedding, cluster): each vector under its nearest
    centroid — the inverted-file lists."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        _cluster_col(F.col(vec_col), centroids).alias("cluster"),
    )


def probe_clusters(centroids: list[list[float]], query_vec: list[float],
                   nprobe: int) -> list[int]:
    """The nprobe cluster ids nearest the query (cosine, ties -> lower id)
    — a driver-side numpy ranking over the tiny centroid matrix."""
    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    cn = np.sqrt((C * C).sum(axis=1))
    qn = np.sqrt((q * q).sum()) or 1.0
    cos = (C @ q) / (np.maximum(cn, _EPS) * qn)
    order = np.lexsort((np.arange(len(C)), -cos))
    return [int(i) for i in order[:nprobe]]


def write_ivf_index(embeddings: DataFrame, path: str, dim: int,
                    k: int = 16, iters: int = 3, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> list[list[float]]:
    """Fit + assign + persist partitioned by ``cluster`` (one directory per
    inverted list, so a probe of nprobe clusters scans nprobe/k of the
    corpus via partition pruning). Centroids go in an ``_ivf_meta.json``
    sidecar through the Hadoop FS (any warehouse scheme). Returns the
    centroids."""
    centroids = kmeans_fit(embeddings, k, iters, id_col, vec_col)
    ivf_assign(embeddings, centroids, id_col, vec_col).write.mode(
        "overwrite"
    ).partitionBy("cluster").parquet(path)
    _write_sidecar(
        embeddings.sparkSession, path.rstrip("/") + "/_ivf_meta.json",
        _json.dumps({"dim": dim, "k": len(centroids), "iters": iters,
                     "centroids": centroids}).encode(),
    )
    return centroids


def read_ivf_index(spark, path: str):
    """(DataFrame(vec_id, embedding, cluster), centroids). ``cluster`` is
    the partition column — filters on it prune directories."""
    df = spark.read.parquet(path)
    meta = _json.loads(
        _read_sidecar(spark, path.rstrip("/") + "/_ivf_meta.json").decode()
    )
    return df, meta


def ivf_topk(embeddings: DataFrame | None, query_vec: list[float],
             k: int = 10, n_clusters: int = 16, nprobe: int = 3,
             iters: int = 3, id_col: str = "vec_id",
             vec_col: str = "embedding", index_path: str | None = None,
             spark=None) -> DataFrame:
    """Approximate top-k via IVF: exact cosine only inside the ``nprobe``
    probed clusters.

    - ad-hoc (``embeddings``): fits k-means inline — right for one-off
      queries and the oracle path.
    - served (``index_path``): reads a ``write_ivf_index`` table; the
      ``cluster.isin(probes)`` filter prunes to the probed directories
      (the high-query-volume path at 10^10 rows)."""
    if index_path is not None:
        sp = spark or (embeddings.sparkSession if embeddings is not None
                       else None)
        if sp is None:
            from pyspark.sql import SparkSession
            sp = SparkSession.getActiveSession()
        assigned, meta = read_ivf_index(sp, index_path)
        centroids = meta["centroids"]
        if meta["dim"] != len(query_vec):
            raise ValueError(
                f"index dim {meta['dim']} != query dim {len(query_vec)}"
            )
    else:
        centroids = kmeans_fit(embeddings, n_clusters, iters, id_col,
                               vec_col)
        assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    probes = probe_clusters(centroids, query_vec, nprobe)
    # The query's own JVM-assigned cluster must be probed: the numpy probe
    # ranking (pairwise float64 dot) and the JVM assignment (sequential
    # aggregate fold, possibly float32 element ops) can disagree on
    # near-tie centroid cosines — an identical stored copy of the query
    # could then sit outside the probe list. The two computations differ by
    # at most ~1e-5 per cosine (64-element float32 dot: per-product error
    # ≤ 2^-24, summation ≤ 64x that; norms likewise), so when numpy's
    # best-probed cosine clears every NON-probed cosine by a 1e-3 margin,
    # the JVM argmax provably lies inside the probe list and no extra work
    # is needed (the common case). Only on a near-tie do we evaluate the
    # SAME _cluster_col expression over a literal cast to the corpus
    # element type — bit-identical to how a stored copy was assigned — as
    # a 1-row driver-local job (~1 s of expression codegen with k x dim
    # literals, which is why it is margin-gated rather than unconditional).
    C = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    cos = (C @ q) / (np.maximum(np.sqrt((C * C).sum(axis=1)), _EPS)
                     * (np.sqrt((q * q).sum()) or 1.0))
    non_probed = [c for c in range(len(centroids)) if c not in probes]
    near_tie = bool(non_probed) and (
        float(cos[probes].max()) - float(cos[non_probed].max()) < 1e-3
    )
    if near_tie:
        vec_lit = F.array(*[F.lit(float(x)) for x in query_vec]).cast(
            assigned.schema["embedding"].dataType)
        own = assigned.sparkSession.range(1).select(
            _cluster_col(vec_lit, centroids).alias("c")).first()["c"]
        if own not in probes:
            probes = [own] + probes[:max(nprobe - 1, 0)]
    cand = assigned.filter(F.col("cluster").isin(probes))
    return cosine_topk(cand, query_vec, k, "vec_id", "embedding")
