"""Frontier state: schemas, deterministic sequence assignment, salted
host partitioning.

The frontier DataFrame replaces the reference's ``RequestStore`` +
``MemQueue`` pair (lib/request_store.go:18-163, lib/queue.go:22-72): one row
per URL ever enqueued, carrying its request status — so the frontier IS the
URL-seen set (a ``GetRequest(url) == nil`` check in the reference,
lib/coordinator.go:301-309, becomes an anti-join against these rows).

Dedup keys are EXACT url strings, replicating the reference's mixed
raw-seed / normalized-link keying (seeds enqueued verbatim,
lib/coordinator.go:174-178; links normalized, lib/resource.go:177).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)
from pyspark.sql.window import Window

#: request statuses — reference lib/request.go:21-36 (UNKNOWN/FETCH/QUEUED/
#: REQUESTING/DONE/FAILED); BSP needs no REQUESTING; 'redirected' is our
#: terminal state for a url whose fetch landed elsewhere (see plans.crawl).
STATUS_QUEUED = "queued"
STATUS_DONE = "done"
STATUS_FAILED = "failed"
STATUS_REDIRECTED = "redirected"

FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),      # exact enqueued string
        StructField("host", StringType(), True),      # canonical host
        StructField("depth", IntegerType(), False),   # BFS depth
        StructField("discovery_seq", LongType(), False),  # global determ. seq
        StructField("status", StringType(), False),
        StructField("attempts", IntegerType(), False),
        StructField("prev_http_status", IntegerType(), True),
        StructField("superstep", IntegerType(), False),  # enqueue superstep
        StructField("part_id", IntegerType(), False),  # salted host partition
        StructField("job_id", StringType(), False),
    ]
)

#: canonical crawl order — (depth, discovery_seq, url); the deterministic
#: replacement for the reference's racy Go-map iteration order
#: (lib/coordinator.go:279-308; SURVEY.md D1 note).
ORDER_COLS = ["depth", "discovery_seq", "url"]


def canonical_host_col(url: Column) -> Column:
    """JVM-side canonical host: parse_url HOST, lowercased, www-stripped."""
    h = F.lower(F.try_parse_url(url, F.lit("HOST")))
    return F.coalesce(F.regexp_replace(h, r"^www\.", ""), F.lit(""))


def part_id_col(host: Column, url: Column, num_partitions: int,
                hot_hosts: DataFrame | None = None) -> Column:
    """Salted-hash partition id for the seen set (north rule): hash the
    canonical host so each host's urls co-locate (politeness + dedup both
    group by host), except hot hosts, which are salted by full url so one
    giant host cannot pin a partition. ``hot_hosts`` is a tiny broadcast
    list; callers join it and pass its flag column instead when dynamic."""
    return F.pmod(F.xxhash64(host), F.lit(num_partitions)).cast("int")


def salted_part_id(df: DataFrame, num_partitions: int,
                   hot_flag: str | None = None) -> DataFrame:
    """Attach part_id; rows flagged hot are salted by url, not host."""
    by_host = F.pmod(F.xxhash64(F.col("host")), F.lit(num_partitions))
    by_url = F.pmod(F.xxhash64(F.col("url")), F.lit(num_partitions))
    expr = (
        F.when(F.col(hot_flag), by_url).otherwise(by_host)
        if hot_flag else by_host
    )
    return df.withColumn("part_id", expr.cast("int"))


def with_global_seq(
    df: DataFrame,
    sort_cols: list[str],
    seq_col: str = "discovery_seq",
    start: int = 0,
    num_partitions: int | None = None,
    return_count: bool = False,
    materialize: bool = True,
    trace: dict | None = None,
    bucket: Column | None = None,
):
    """Assign a dense global sequence 0..n-1 in ``sort_cols`` order —
    scalable two-phase ranking (NO single-partition window):

      1. partition the rows monotonically w.r.t. the sort key — either by
         a caller-supplied deterministic ``bucket`` expression (below) or
         by ``repartitionByRange`` — and pin the input (one job, the only
         full pass over the data this function pays for),
      2. per-partition ``row_number`` (partition-local sort),
      3. add per-partition offsets (a tiny P-row collect over the pinned
         input, broadcast back as a literal map).

    ``bucket``: a Column that is MONOTONE NON-DECREASING w.r.t. the
    lexicographic ``sort_cols`` order (key1 < key2 ⇒ bucket1 ≤ bucket2).
    Offsets are computed from the ACTUAL per-bucket counts, so any
    monotone bucketing — however unbalanced — yields exactly the global
    dense rank; balance only affects task sizes. A pure expression needs
    no range-bounds sampling pass and is stable across re-executions, so
    the two-pin dance of the range path (see below) collapses to ONE pin
    + one aggregate: two fewer jobs per call on the crawl loop's hot path
    (guide §2.4 — remove shuffles outright).

    The result depends only on the global sort order, so it is byte-identical
    across parallelism levels (the two-cluster-size determinism requirement,
    SURVEY.md §4 item 4) as long as ``sort_cols`` are a unique key (callers
    include ``url``) — and identical between the bucket and range paths.

    ``materialize=False`` returns the ranked output LAZY (the window runs
    when the caller next materializes state) — callers inside a loop that
    pins merged state anyway (the crawl superstep) save one eager
    checkpoint job per iteration.
    """
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    cols = [F.col(c) for c in sort_cols]
    import time as _time
    _t = _time.monotonic()
    if bucket is not None:
        # deterministic monotone bucketing: one pin, no sampling, and the
        # window's own hash exchange on _pid does the physical movement
        # when the caller materializes — no second pin needed because the
        # row→bucket map is a pure expression (stable across actions)
        d = d0 = df.withColumn("_pid", bucket.cast("long")).localCheckpoint(
            eager=True
        )
        if trace is not None:
            trace["seq_input_pin"] = round(_time.monotonic() - _t, 3)
    else:
        # pin the INPUT first: repartitionByRange samples its input with an
        # extra pass, so an unpinned upstream pipeline (candidate explode +
        # dedup + anti-join in the crawl loop) would run twice. Then pin the
        # RANGED layout too — range bounds come from sampling, and two
        # separate actions over a lazy range exchange can sample different
        # bounds, desynchronizing the offset map from the window partitions
        # (observed: non-dense ranks). The second pin only shuffles the
        # already-pinned narrow rows.
        d0 = df.localCheckpoint(eager=True)
        if trace is not None:
            trace["seq_input_pin"] = round(_time.monotonic() - _t, 3)
            _t = _time.monotonic()
        d = d0.repartitionByRange(num_partitions, *cols).withColumn(
            "_pid", F.spark_partition_id()
        ).localCheckpoint(eager=True)
        if trace is not None:
            trace["seq_rank_pin"] = round(_time.monotonic() - _t, 3)
    _t = _time.monotonic()
    counts = {
        r["_pid"]: r["cnt"]
        for r in d.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    if trace is not None:
        trace["seq_counts"] = round(_time.monotonic() - _t, 3)
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    total = acc - start
    if not offsets:
        out = d0.withColumn(seq_col, F.lit(start).cast("long"))
        if bucket is not None:
            out = out.drop("_pid")
        return (out, 0) if return_count else out
    off_expr = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    out = (
        d.withColumn(
            seq_col,
            (F.row_number().over(w) - 1 + off_expr[F.col("_pid")]).cast("long"),
        )
        .drop("_pid")
    )
    if materialize:
        out = out.coalesce(num_partitions).localCheckpoint(eager=True)
    # the per-partition counts were already collected for the offsets — hand
    # the total back so callers don't pay a separate count() job
    return (out, total) if return_count else out


def empty_frontier(spark) -> DataFrame:
    return spark.createDataFrame([], FRONTIER_SCHEMA)
