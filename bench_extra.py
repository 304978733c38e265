"""Per-operator isolation bench (guide §1.4) — NOT the driver metric.

Times individual hot operators at $SPARK_GRAFT_SF_DIR with the same
construction as bench.py, using the noop sink so the computation (not the
collect/sink) is timed, and optionally dumps .explain("formatted") to
plans/r06/. Usage:

    python bench_extra.py [op ...] [--explain NAME_SUFFIX]

ops default: minhash simhash embdup cosine annlsh jaccard dedup_exact
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench import make_session  # noqa: E402


def build(op, spark, sf_dir):
    from walk_spark.operators import dedup_text as DT
    from walk_spark.operators import similarity as SIM
    import __spark_entry__ as entry

    if op == "minhash":
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return DT.minhash_lsh_pairs(docs, threshold=0.8)
    if op == "simhash":
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return DT.simhash_pairs(docs, max_hamming=3)
    if op == "embdup":
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        dup = emb.withColumn("vec_id", F.col("vec_id") + 1_000_000)
        return SIM.embedding_dup_pairs(
            emb.unionByName(dup), threshold=0.99, dim=64, bits=8, bands=4
        )
    qs = entry.queries()
    name = {
        "cosine": "embedding_cosine_topk",
        "annlsh": "ann_lsh_topk",
        "jaccard": "jaccard_pairs",
        "dedup_exact": "dedup_exact",
        "minhash_oracle": "minhash_lsh_dedup",
        "simhash_oracle": "simhash_dedup",
    }[op]
    return qs[name](spark, sf_dir)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain_suffix = None
    for i, a in enumerate(sys.argv[1:]):
        if a == "--explain":
            explain_suffix = sys.argv[1:][i + 1]
    ops = args[:1] if explain_suffix else (
        args or ["minhash", "simhash", "embdup", "cosine", "annlsh"]
    )
    spark = make_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    for op in ops:
        df = build(op, spark, sf_dir)
        if explain_suffix is not None:
            out = f"plans/r06/{op}_{explain_suffix}.txt"
            with open(out, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
            print("wrote", out)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{op}")
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        # second timing matching bench.py's .count() methodology
        t0 = time.monotonic()
        n = df.count()
        dt2 = time.monotonic() - t0
        print(f"{op:14s} noop={dt:7.3f}s  count={dt2:7.3f}s  rows={n}")
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
