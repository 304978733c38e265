"""IVF coarse-quantizer ANN (operators.ivf): k-means determinism, the
identical-copies exactness contract, and served-index partition pruning —
mirrors the RP-LSH tests in tests/test_similarity.py."""

import numpy as np
from pyspark.sql import functions as F

from walk_spark.operators import ivf as IVF
from walk_spark.operators.similarity import cosine_topk


def _emb(spark, n=400, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_deterministic_and_covering(spark):
    e = _emb(spark)
    c1 = IVF.kmeans_fit(e, k=8, iters=2)
    c2 = IVF.kmeans_fit(e, k=8, iters=2)
    assert c1 == c2
    assert len(c1) == 8 and len(c1[0]) == 16
    # every vector gets exactly one cluster in [0, k)
    a = IVF.ivf_assign(e, c1)
    assert a.count() == 400
    mm = a.agg(F.min("cluster"), F.max("cluster")).first()
    assert mm[0] >= 0 and mm[1] <= 7


def test_kmeans_k_larger_than_corpus(spark):
    e = _emb(spark, n=5)
    c = IVF.kmeans_fit(e, k=16, iters=2)
    assert len(c) == 5  # clamps to the corpus size
    assert IVF.ivf_assign(e, c).count() == 5


def test_ivf_topk_identical_copies_equal_exact(spark):
    """Identical vectors assign to the same cluster with probability 1 and
    the query probes its own argmax cluster first, so with 10 copies of
    the query in the corpus the IVF top-10 equals brute force — the same
    contract the driver oracle checks at sf0.01."""
    e = _emb(spark, n=300)
    q = [float(x) for x in np.random.RandomState(99).normal(size=16)]
    copies = spark.createDataFrame(
        [(1_000_000 + i, q) for i in range(10)],
        "vec_id long, embedding array<double>")
    u = e.unionByName(copies)
    exact = cosine_topk(u, q, k=10).collect()
    approx = IVF.ivf_topk(u, q, k=10, n_clusters=8, nprobe=3,
                          iters=2).collect()
    assert [(r["vec_id"], r["cosine"]) for r in approx] == \
        [(r["vec_id"], r["cosine"]) for r in exact]
    assert all(r["cosine"] == 1.0 for r in approx)


def test_ivf_served_index_prunes_partitions(spark, tmp_path):
    """The served path must read ONLY the probed clusters' directories
    (parquet partition pruning on the cluster column)."""
    e = _emb(spark, n=300)
    path = str(tmp_path / "ivf_index")
    centroids = IVF.write_ivf_index(e, path, dim=16, k=8, iters=2)
    q = [float(x) for x in np.random.RandomState(5).normal(size=16)]
    probes = IVF.probe_clusters(centroids, q, nprobe=2)

    assigned, meta = IVF.read_ivf_index(spark, path)
    assert meta["k"] == 8 and meta["dim"] == 16
    touched = (
        assigned.filter(F.col("cluster").isin(probes))
        .select(F.input_file_name().alias("f")).distinct().collect()
    )
    dirs = {r["f"].split("/cluster=")[1].split("/")[0] for r in touched}
    assert dirs <= {str(p) for p in probes}

    served = IVF.ivf_topk(None, q, k=5, index_path=path,
                          spark=spark).collect()
    adhoc_cand = assigned.filter(F.col("cluster").isin(probes))
    expect = cosine_topk(adhoc_cand, q, k=5).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in expect]
