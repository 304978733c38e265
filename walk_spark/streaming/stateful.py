"""Custom stateful streaming operators via applyInPandasWithState.

The reference's continuous mode keeps per-host mutable state inside fetchbot
goroutines (crawl delay clocks, robots caches — lib/worker.go:79-90).
Structured Streaming's arbitrary-state operator is the Spark-native home for
that state. Two operators:

- ``host_fetch_tracker`` — running per-host crawl statistics (fetch counts,
  ok counts, byte totals, first/last event time) carried across
  micro-batches: the monitoring/bookkeeping state the coordinator's
  counters provided (lib/coordinator.go:73-87).
- ``host_budget_gate`` — a per-host token-bucket admission gate: ``budget``
  tokens refill per micro-batch up to a ``burst`` cap, unused tokens carry
  forward, each admitted url spends one — the streaming analog of the BSP
  politeness budget (F5). A host idle for a batch may catch up in the next
  (bounded by burst); deferred urls need no debt bookkeeping because the
  stream redelivers them.

Both run on plain batch DataFrames too (Spark executes
applyInPandasWithState only on streams, so each has a batch-equivalent path
used in tests for cross-checking results).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

TRACKER_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("batch_fetches", LongType()),
        StructField("total_fetches", LongType()),
        StructField("total_ok", LongType()),
        StructField("total_bytes", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)

_TRACKER_STATE = StructType(
    [
        StructField("total_fetches", LongType()),
        StructField("total_ok", LongType()),
        StructField("total_bytes", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _track(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    total, ok, nbytes, first, last = (
        state.get if state.exists else (0, 0, 0, None, None)
    )
    batch_n = 0
    for pdf in pdfs:
        batch_n += len(pdf)
        total += len(pdf)
        ok += int(pdf["status"].between(200, 308).sum())
        nbytes += int(pdf["content_length"].fillna(0).sum())
        ts_min, ts_max = pdf["warc_ts"].min(), pdf["warc_ts"].max()
        first = ts_min if first is None or ts_min < first else first
        last = ts_max if last is None or ts_max > last else last
    state.update((total, ok, nbytes, first, last))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "batch_fetches": [batch_n],
            "total_fetches": [total],
            "total_ok": [ok],
            "total_bytes": [nbytes],
            "first_ts": [first],
            "last_ts": [last],
        }
    )


def host_fetch_tracker(events: DataFrame) -> DataFrame:
    """Streaming: per-host running totals carried across micro-batches.
    Input columns: host, warc_ts, status, content_length."""
    return events.groupBy("host").applyInPandasWithState(
        _track,
        outputStructType=TRACKER_OUTPUT,
        stateStructType=_TRACKER_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def host_fetch_tracker_batch(events: DataFrame) -> DataFrame:
    """Batch cross-check of the tracker's totals (single 'batch')."""
    from pyspark.sql import functions as F
    return events.groupBy("host").agg(
        F.count("*").alias("batch_fetches"),
        F.count("*").alias("total_fetches"),
        F.sum(F.col("status").between(200, 308).cast("long")).alias("total_ok"),
        F.sum(F.coalesce(F.col("content_length"), F.lit(0))).alias("total_bytes"),
        F.min("warc_ts").alias("first_ts"),
        F.max("warc_ts").alias("last_ts"),
    ).select(*[f.name for f in TRACKER_OUTPUT.fields])


GATE_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("admitted", LongType()),  # 1 admitted / 0 deferred
    ]
)

_GATE_STATE = StructType([StructField("tokens", LongType())])


def _gate_fn(budget: int, burst: int):
    def _gate(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # token bucket: refill `budget` per micro-batch, cap at `burst`;
        # each admitted url spends one token. The carried state is the
        # UNUSED capacity — a host that got a small batch admits more than
        # `budget` in the next one (up to burst), which is what makes the
        # gate a real rate limiter over time rather than a per-batch cap.
        (tokens,) = state.get if state.exists else (budget,)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["depth", "discovery_seq", "url"]) \
            if "depth" in rows.columns else rows.sort_values("url")
        n_admit = min(int(tokens), len(rows))
        admitted = [1] * n_admit + [0] * (len(rows) - n_admit)
        state.update((min(tokens - n_admit + budget, burst),))
        yield pd.DataFrame(
            {
                "host": key[0],
                "url": rows["url"].tolist(),
                "admitted": admitted,
            }
        )

    return _gate


def host_budget_gate(urls: DataFrame, budget: int,
                     burst: int | None = None) -> DataFrame:
    """Streaming admission gate: token bucket per host — ``budget`` tokens
    refill per micro-batch (burst cap defaults to 2×budget), admitted urls
    in canonical order, the rest emitted with admitted=0 for requeue.
    Input columns: host, url (+ optional depth, discovery_seq)."""
    if burst is None:
        burst = 2 * budget
    return urls.groupBy("host").applyInPandasWithState(
        _gate_fn(budget, burst),
        outputStructType=GATE_OUTPUT,
        stateStructType=_GATE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
