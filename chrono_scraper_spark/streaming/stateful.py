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


# --------------------------------------------------------------------------
# streaming change detection (operators/changes.py's stateful twin)
# --------------------------------------------------------------------------

CHANGE_STATE_SCHEMA = T.StructType([
    T.StructField("last_text", T.StringType()),
    T.StructField("vn", T.LongType()),
])

CHANGE_OUT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("ts14", T.StringType()),
    T.StructField("change_type", T.StringType()),
    T.StructField("similarity", T.DoubleType()),
    T.StructField("units_added", T.LongType()),
    T.StructField("units_removed", T.LongType()),
    T.StructField("n_versions_seen", T.LongType()),
])


def _dice_tokens(prev: str, cur: str):
    """Token-multiset Dice + diff sizes — the Python twin of
    operators/changes._multiset_overlap over whitespace tokens."""
    from collections import Counter

    ca = Counter((prev or "").split())
    cb = Counter((cur or "").split())
    na, nb = sum(ca.values()), sum(cb.values())
    m = sum(min(c, cb[t]) for t, c in ca.items())
    if na == 0 and nb == 0:
        sim = 1.0
    elif na == 0 or nb == 0:
        sim = 0.0
    else:
        sim = 2.0 * m / (na + nb)
    return sim, nb - m, na - m


def _changes_fn(threshold: float):
    def fn(key: tuple, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        (url,) = key
        if state.exists:
            last_text, vn = state.get
        else:
            last_text, vn = None, 0
        rows: list[dict[str, Any]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts14")
            for r in pdf.itertuples(index=False):
                cur = r.text or ""
                vn += 1
                if vn == 1:
                    sim_out = None
                    _s, added, removed = _dice_tokens("", cur)
                    change = "new"
                else:
                    prev = last_text or ""
                    sim, added, removed = _dice_tokens(prev, cur)
                    sim_out = round(sim, 6)
                    if cur == prev:
                        change = "unchanged"
                    elif len(prev) == 0 and len(cur) > 0:
                        change = "new"
                    elif len(cur) == 0 and len(prev) > 0:
                        change = "deleted"
                    elif sim_out >= threshold:
                        change = "minor_update"
                    else:
                        change = "modified"
                rows.append({
                    "url": url, "ts14": r.ts14, "change_type": change,
                    "similarity": sim_out, "units_added": added,
                    "units_removed": removed, "n_versions_seen": vn,
                })
                last_text = cur
        state.update((last_text, vn))
        yield pd.DataFrame(rows, columns=[f.name
                                          for f in CHANGE_OUT_SCHEMA.fields])

    return fn


def url_change_stream(stream: DataFrame,
                      threshold: float = 0.95) -> DataFrame:
    """Streaming change detection: the stateful twin of
    ``operators/changes.detect_changes`` — per-url state (last capture
    text + version count) lives in the state store, survives micro-batch
    boundaries and checkpointed restarts, and each arriving capture is
    classified against it immediately (the reference's
    detect_page_changes call-on-ingest shape, change_detection.py:97+,
    rather than the batch corpus-wide lag window).

    Semantics are the batch operator's exactly — same decision tree,
    same token-multiset Dice — so a replay through micro-batches must
    union to the identical change log (parity-tested). One disclosed
    nit: Python round() is banker's where Spark round is half-up; Dice
    ratios are small-denominator rationals, so a 6th-decimal exact tie
    could differ in the last digit.

    Scale: state is one text + counter per URL. For a 10^10-URL frontier
    keep only the md5 and token-counter summary in state (similarity
    from counters needs no full text) — this variant stores text because
    the batch twin's units columns are defined over it; swap `_dice_
    tokens` for a counter-state version when state size dominates."""
    return (stream.groupBy("url").applyInPandasWithState(
        _changes_fn(threshold), CHANGE_OUT_SCHEMA, CHANGE_STATE_SCHEMA,
        "append", GroupStateTimeout.NoTimeout))
