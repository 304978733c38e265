"""applyInPandasWithState operators: state carried across micro-batches."""

import datetime as dt
import os
import tempfile

from pyspark.sql import functions as F

from walk_spark.streaming.stateful import (
    host_budget_gate, host_fetch_tracker, host_fetch_tracker_batch,
)

_TS = dt.datetime(2000, 1, 1)


def _write_batches(spark, base):
    """Two parquet files -> two micro-batches (maxFilesPerTrigger=1)."""
    rows1 = [("h1.test", _TS, 200, 100), ("h1.test", _TS, 404, 50),
             ("h2.test", _TS, 200, 10)]
    rows2 = [("h1.test", _TS + dt.timedelta(60), 200, 30),
             ("h2.test", _TS + dt.timedelta(60), 500, 20)]
    schema = "host string, warc_ts timestamp, status int, content_length long"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        os.path.join(base, "b1"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        os.path.join(base, "b2"))
    # one directory the stream reads file-by-file
    import glob, shutil
    dest = os.path.join(base, "stream")
    os.makedirs(dest)
    for i, f in enumerate(sorted(glob.glob(os.path.join(base, "b*/*.parquet")))):
        shutil.copy(f, os.path.join(dest, f"{i:02d}.parquet"))
    return dest, schema


def test_tracker_state_across_batches(spark):
    tmp = tempfile.mkdtemp()
    src, schema = _write_batches(spark, tmp)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        host_fetch_tracker(stream)
        .writeStream.format("memory").queryName("t_tracker")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from t_tracker order by host, total_fetches"
    ).collect()
    # the LAST update per host carries accumulated totals across batches
    last = {r["host"]: r for r in rows}  # later rows overwrite
    assert last["h1.test"]["total_fetches"] == 3
    assert last["h1.test"]["total_ok"] == 2
    assert last["h1.test"]["total_bytes"] == 180
    assert last["h2.test"]["total_fetches"] == 2
    assert last["h2.test"]["total_ok"] == 1
    # state visible mid-stream: h1 appears once with total 2 (first batch)
    h1_updates = [r for r in rows if r["host"] == "h1.test"]
    assert [r["total_fetches"] for r in h1_updates] == [2, 3]


def test_tracker_matches_batch_aggregation(spark):
    tmp = tempfile.mkdtemp()
    src, schema = _write_batches(spark, tmp)
    df = spark.read.schema(schema).parquet(src)
    got = {r["host"]: r for r in host_fetch_tracker_batch(df).collect()}
    assert got["h1.test"]["total_fetches"] == 3
    assert got["h1.test"]["total_bytes"] == 180
    assert got["h2.test"]["total_ok"] == 1


def test_budget_gate(spark):
    tmp = tempfile.mkdtemp()
    rows = [("h1.test", f"http://h1.test/{i}") for i in range(5)] + [
        ("h2.test", "http://h2.test/0")
    ]
    schema = "host string, url string"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        os.path.join(tmp, "stream"))
    stream = spark.readStream.schema(schema).parquet(os.path.join(tmp, "stream"))
    q = (
        host_budget_gate(stream, budget=3)
        .writeStream.format("memory").queryName("t_gate")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from t_gate").collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r["admitted"])
    assert sum(by_host["h1.test"]) == 3  # budget respected
    assert len(by_host["h1.test"]) == 5  # deferred rows still emitted
    assert by_host["h2.test"] == [1]


def test_budget_gate_carries_unused_tokens(spark):
    """Token-bucket carry: a host under budget in micro-batch 1 banks the
    unused tokens (up to burst) and admits MORE than `budget` in batch 2 —
    the cross-batch state is observable, not a plain per-batch cap."""
    tmp = tempfile.mkdtemp()
    schema = "host string, url string"
    b1 = [("h1.test", "http://h1.test/0")]                      # 1 of budget 3
    b2 = [("h1.test", f"http://h1.test/{i}") for i in range(1, 6)]  # 5 more
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        os.path.join(tmp, "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        os.path.join(tmp, "f2"))
    import glob, shutil
    dest = os.path.join(tmp, "stream")
    os.makedirs(dest)
    for i, f in enumerate(sorted(glob.glob(os.path.join(tmp, "f*/*.parquet")))):
        shutil.copy(f, os.path.join(dest, f"{i:02d}.parquet"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = (
        host_budget_gate(stream, budget=3)  # burst defaults to 6
        .writeStream.format("memory").queryName("t_gate_carry")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select url, admitted from t_gate_carry order by url"
    ).collect()
    admitted = {r["url"]: r["admitted"] for r in got}
    # batch 1: 1 admitted, tokens 3-1+3=5; batch 2: all 5 admitted (> budget)
    assert sum(admitted.values()) == 6
    assert len(admitted) == 6
