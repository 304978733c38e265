"""Isolate the crawl superstep's fetch_extract phase (guide §1.4).

Builds the bench corpus, persists it like Crawler does, then times with a
noop sink: (a) the co-partitioned content join alone, (b) join+extraction
UDF, (c) join+extraction+localCheckpoint pin — for a superstep-3-sized
batch (12k urls). Prints seconds per stage, 3 reps each.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark import StorageLevel  # noqa: E402

from bench import make_session  # noqa: E402
from walk_spark.functions.extract import with_extraction  # noqa: E402
from walk_spark.functions.urlnorm import normalize_url_series  # noqa: E402
from walk_spark.sources.pages import skewed_corpus  # noqa: E402
from pyspark.sql.types import StringType  # noqa: E402


def noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = make_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    norm = F.pandas_udf(normalize_url_series, returnType=StringType())

    pages = skewed_corpus(spark, n_urls=20000, n_hosts=64, out_degree=8)
    prepped = pages.withColumn("p_url_norm", norm(F.col("url"))).select(
        "p_url_norm",
        F.col("url").alias("p_url"),
        F.col("warc_ts").alias("p_warc_ts"),
        F.col("html").alias("p_html"),
        F.lit(200).alias("p_status"),
        F.lit("text/html; charset=utf-8").alias("p_content_type"),
        F.array(F.lit("Content-Type"),
                F.lit("text/html; charset=utf-8")).alias("p_headers"),
    ).repartition(32, "p_url_norm").persist(StorageLevel.MEMORY_AND_DISK_DESER)
    print("corpus rows:", prepped.count())

    batch = (
        prepped.select(F.col("p_url").alias("url")).limit(12000)
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    print("batch rows:", batch.count())

    def build_join():
        b = batch.withColumn("url_norm", norm(F.col("url"))).withColumn(
            "final_url_norm", F.col("url_norm")
        )
        b = b.repartition(32, "final_url_norm")
        hits = b.join(prepped, b.final_url_norm == prepped.p_url_norm, "inner")
        return hits

    for rep in range(3):
        spark.sparkContext.setJobDescription(f"join-only rep{rep}")
        t_join = noop(build_join())
        spark.sparkContext.setJobDescription(f"join-extract rep{rep}")
        j = build_join()
        ex = with_extraction(
            j.withColumnRenamed("p_html", "html").withColumn(
                "_base", F.col("p_url")
            ),
            url_col="_base", html_col="html",
        ).withColumn(
            "content_length",
            F.coalesce(F.length("html").cast("long"), F.lit(0).cast("long")),
        ).drop("html")
        t_ex = noop(ex)
        spark.sparkContext.setJobDescription(f"join-extract-pin rep{rep}")
        t0 = time.monotonic()
        j2 = build_join()
        ex2 = with_extraction(
            j2.withColumnRenamed("p_html", "html").withColumn(
                "_base", F.col("p_url")
            ),
            url_col="_base", html_col="html",
        ).withColumn(
            "content_length",
            F.coalesce(F.length("html").cast("long"), F.lit(0).cast("long")),
        ).drop("html")
        ex2.coalesce(32).localCheckpoint(eager=True)
        t_pin = time.monotonic() - t0
        # batch-side normalize UDF alone
        spark.sparkContext.setJobDescription(f"norm-only rep{rep}")
        t_norm = noop(batch.withColumn("url_norm", norm(F.col("url"))))
        print(f"rep{rep}: join={t_join:.2f} join+extract={t_ex:.2f} "
              f"join+extract+pin={t_pin:.2f} norm_batch={t_norm:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
