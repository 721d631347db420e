"""Stateful streaming politeness: the per-host token bucket as a custom
Structured Streaming operator (SURVEY §2.4 P4 / §2.11 T4).

The reference's fetch scheduler keeps one token bucket per host in process
memory (fetch_service.py:49-80: capacity=burst, refill=rps). The batch
engine re-expresses it as a budget-per-round (operators/politeness.py);
THIS module is the streaming deployment: bucket state (tokens, last event
time) lives in Spark's state store keyed by host, survives micro-batch
boundaries and restarts (checkpointed), and admits/defers each capture as
it arrives. This is exactly the shape Spark's built-ins cannot express —
windowed aggs have no cross-row running state, dropDuplicates has no
refill — so it is an ``applyInPandasWithState`` operator (Arrow-batched;
no per-row Python in the sense of one-call-per-row UDFs: each host's
micro-batch slice arrives as whole pandas frames).

Determinism: refill is EVENT-time driven (warc_ts deltas), never
wall-clock, and rows are processed in (warc_ts, url) order within each
(host, micro-batch) group — the admitted set is a pure function of the
input stream + (rps, burst), replayable from any checkpoint.

Scale: state is two floats per host (~10^7 hosts → a few hundred MB across
the cluster, hash-partitioned by host in the state store); each
micro-batch shuffles only that batch's rows once on host.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([
    T.StructField("tokens", T.DoubleType()),
    T.StructField("last_ts", T.DoubleType()),   # unix seconds of last refill
])

OUT_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("ts14", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("sched_status", T.StringType()),   # fetched | deferred
    T.StructField("tokens_after", T.DoubleType()),
])


def _bucket_fn(rps: float, burst: float):
    """Build the per-group state function (rps/burst captured by closure —
    broadcast with the serialized function, no driver state)."""

    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        (host,) = key
        if state.exists:
            tokens, last_ts = state.get
        else:
            tokens, last_ts = float(burst), None
        rows: list[dict[str, Any]] = []
        for pdf in pdfs:
            # deterministic order inside the micro-batch
            pdf = pdf.sort_values(["warc_ts", "url"])
            for r in pdf.itertuples(index=False):
                ts = r.warc_ts.timestamp()
                if last_ts is not None and ts > last_ts:
                    tokens = min(float(burst), tokens + (ts - last_ts) * rps)
                last_ts = ts if last_ts is None else max(last_ts, ts)
                if tokens >= 1.0:
                    tokens -= 1.0
                    status = "fetched"
                else:
                    status = "deferred"
                rows.append({
                    "host": host, "url": r.url, "ts14": r.ts14,
                    "warc_ts": r.warc_ts, "sched_status": status,
                    "tokens_after": tokens,
                })
        state.update((tokens, last_ts))
        yield pd.DataFrame(rows, columns=[f.name for f in OUT_SCHEMA.fields])

    return fn


def host_token_bucket(stream: DataFrame, rps: float = 1.0,
                      burst: float = 5.0) -> DataFrame:
    """Admit/defer each capture against its host's token bucket.

    Input needs columns (host, url, ts14, warc_ts). Output adds
    ``sched_status`` ('fetched'/'deferred') and the bucket level after the
    row. Streaming only (Spark rejects applyInPandasWithState in batch
    queries); the batch analog is operators/politeness.schedule_round."""
    return stream.select("host", "url", "ts14", "warc_ts").groupBy(
        "host").applyInPandasWithState(
        _bucket_fn(rps, burst), OUT_SCHEMA, STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout)
