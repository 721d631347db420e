"""applyInPandasWithState token bucket: admitted set matches a Python
oracle, and bucket state survives micro-batch boundaries."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from chrono_scraper_spark.streaming.stateful import host_token_bucket

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _rows(host, start_s, n, step_s):
    return [
        {"host": host, "url": f"https://{host}/p{start_s + i * step_s}",
         "ts14": f"{start_s + i * step_s:014d}",
         "warc_ts": T0 + dt.timedelta(seconds=start_s + i * step_s)}
        for i in range(n)
    ]


def _oracle(rows, rps, burst):
    """Reference bucket over the event-time-ordered row list."""
    state: dict = {}
    out = {}
    for r in sorted(rows, key=lambda r: (r["warc_ts"], r["url"])):
        tokens, last = state.get(r["host"], (float(burst), None))
        ts = r["warc_ts"].timestamp()
        if last is not None and ts > last:
            tokens = min(float(burst), tokens + (ts - last) * rps)
        last = ts if last is None else max(last, ts)
        if tokens >= 1.0:
            tokens -= 1.0
            out[r["url"]] = "fetched"
        else:
            out[r["url"]] = "deferred"
        state[r["host"]] = (tokens, last)
    return out


def _write_batch(path, rows):
    pdf = pd.DataFrame(rows)
    # microsecond timestamps — pandas defaults to ns, which Spark's parquet
    # reader rejects as plain INT64
    pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(pdf), path)


@pytest.fixture()
def two_batch_dir(tmp_path):
    # batch 0: h1 bursts 6 captures in 5s (burst 2, rps 0.5 ⇒ only the
    # first few admitted); h2 is slow and never throttled
    b0 = _rows("h1.example", 0, 6, 1) + _rows("h2.example", 0, 3, 10)
    # batch 1 (strictly later event times): h1 returns after a 20 s gap —
    # refill admits some, then throttles again. Whether these are admitted
    # depends on the tokens left by batch 0 ⇒ proves cross-batch state.
    b1 = _rows("h1.example", 30, 4, 1)
    d = tmp_path / "stream"
    d.mkdir()
    _write_batch(str(d / "part-0000.parquet"), b0)
    _write_batch(str(d / "part-0001.parquet"), b1)
    return str(d), b0 + b1


def test_token_bucket_stream_matches_oracle(spark, two_batch_dir, tmp_path):
    src, all_rows = two_batch_dir
    rps, burst = 0.5, 2.0
    stream = (spark.readStream
              .schema("host string, url string, ts14 string, "
                      "warc_ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .parquet(src))
    out = host_token_bucket(stream, rps=rps, burst=burst)
    q = (out.writeStream.format("memory").queryName("bucket_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["url"]: r["sched_status"]
           for r in spark.sql("select * from bucket_out").collect()}
    exp = _oracle(all_rows, rps, burst)
    assert got == exp
    # the scenario actually exercises both branches and cross-batch state
    assert "deferred" in set(exp.values()) and "fetched" in set(exp.values())
    # burst=2 + 5x1s refill at 0.5/s ⇒ h1's 6-capture burst is throttled
    h1_first = [exp[r["url"]] for r in sorted(
        (r for r in all_rows if r["host"] == "h1.example"),
        key=lambda r: r["warc_ts"])][:6]
    assert h1_first.count("fetched") < 6


def test_token_bucket_restart_resumes_state(spark, two_batch_dir, tmp_path):
    """Stop after batch 0, restart from the checkpoint: batch 1 decisions
    must reflect batch 0's depleted bucket (T5 resume)."""
    src, all_rows = two_batch_dir
    rps, burst = 0.5, 2.0
    ckpt = str(tmp_path / "ckpt2")
    sink = str(tmp_path / "sink")   # file sink: supports ckpt recovery

    def run():
        stream = (spark.readStream
                  .schema("host string, url string, ts14 string, "
                          "warc_ts timestamp")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(src))
        out = host_token_bucket(stream, rps=rps, burst=burst)
        return (out.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())

    run().awaitTermination(120)
    # restart from the checkpoint with a NEW batch of files: its decisions
    # must reflect the bucket state batches 0-1 left behind
    b2 = _rows("h1.example", 60, 3, 1)
    _write_batch(src + "/part-0002.parquet", b2)
    run().awaitTermination(120)
    got2 = {r["url"]: r["sched_status"]
            for r in spark.read.parquet(sink).collect()}
    exp = _oracle(all_rows + b2, rps, burst)
    assert got2 == exp


# --------------------------------------------------------------------------
# streaming change detection (url_change_stream)
# --------------------------------------------------------------------------

CHANGE_ROWS_B0 = [
    {"url": "http://a.example/p", "ts14": "20240101000000",
     "text": "alpha beta gamma delta"},
    {"url": "http://a.example/p", "ts14": "20240102000000",
     "text": "alpha beta gamma delta"},
    {"url": "http://b.example/q", "ts14": "20240101000000",
     "text": "hello world"},
]
CHANGE_ROWS_B1 = [
    # a's third capture arrives in batch 1 → state must remember batch 0
    {"url": "http://a.example/p", "ts14": "20240103000000",
     "text": "alpha beta gamma delta epsilon"},
    {"url": "http://a.example/p", "ts14": "20240104000000", "text": ""},
    {"url": "http://b.example/q", "ts14": "20240102000000",
     "text": "world hello"},
]


@pytest.fixture()
def change_stream_dir(tmp_path):
    d = tmp_path / "chstream"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(CHANGE_ROWS_B0)),
                   str(d / "part-0000.parquet"))
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(CHANGE_ROWS_B1)),
                   str(d / "part-0001.parquet"))
    return str(d)


def test_url_change_stream_matches_batch(spark, change_stream_dir,
                                         tmp_path):
    from chrono_scraper_spark.operators.changes import detect_changes
    from chrono_scraper_spark.streaming.stateful import url_change_stream

    schema = "url string, ts14 string, text string"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(change_stream_dir))
    out = url_change_stream(stream, threshold=0.9)
    q = (out.writeStream.format("memory").queryName("chg_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.url, r.ts14): (r.change_type, r.similarity, r.units_added,
                             r.units_removed, r.n_versions_seen)
           for r in spark.sql("SELECT * FROM chg_out").collect()}

    batch_df = spark.createDataFrame(
        CHANGE_ROWS_B0 + CHANGE_ROWS_B1, schema)
    want = {(r.url, r.ts14): (r.change_type, r.similarity, r.units_added,
                              r.units_removed, r.n_versions_seen)
            for r in detect_changes(batch_df, threshold=0.9).collect()}
    assert got == want
    # and the interesting transitions actually happened across batches
    assert got[("http://a.example/p", "20240103000000")][0] == "modified"
    assert got[("http://a.example/p", "20240104000000")][0] == "deleted"
    assert got[("http://b.example/q", "20240102000000")][0] \
        == "minor_update"   # reorder: dice 1.0, hash differs
    assert got[("http://a.example/p", "20240104000000")][4] == 4
