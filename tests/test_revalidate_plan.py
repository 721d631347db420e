"""RevalidateJob e2e: steady-state revalidation rounds over a built
catalog against a loopback origin (plans/revalidate.py)."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from chrono_scraper_spark.operators.dedup import latest_captures
from chrono_scraper_spark.plans.catalog import SnapshotCatalog
from chrono_scraper_spark.plans.revalidate import RevalidateJob


def _html(title: str, words: int) -> bytes:
    text = " ".join(f"word{i}" for i in range(words))
    return (f"<html><head><title>{title}</title></head><body>"
            f"<article><p>{text}</p></article></body></html>").encode()


def _extracted_text(words: int) -> str:
    return " ".join(f"word{i}" for i in range(words))


class _Store:
    def __init__(self):
        self.pages: dict[str, tuple[bytes, str]] = {}  # path -> (body, etag)
        self.hits: list[tuple[str, str | None]] = []
        self.lock = threading.Lock()


def _make_handler(store: _Store):
    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            inm = self.headers.get("If-None-Match")
            with store.lock:
                store.hits.append((self.path, inm))
            page = store.pages.get(self.path)
            if page is None:
                self._send(404, b"no", None)
                return
            body, etag = page
            if inm is not None and inm == etag:
                self._send(304, b"", etag)
                return
            self._send(200, body, etag)

        def _send(self, status, body, etag):
            self.send_response(status)
            self.send_header("Content-Type", "text/html")
            if etag:
                self.send_header("ETag", etag)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)

    return H


@pytest.fixture()
def server():
    store = _Store()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(store))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield store, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _seed_catalog(spark, root, base):
    cat = SnapshotCatalog(spark, root)
    rows = [
        (f"{base}/same", f"{base}/same", "20210101000000", "h1",
         "2021-01-01 00:00:00", "en", "dg-s", _extracted_text(60),
         "Same", 60, 500.0, 0, 1),
        (f"{base}/changed", f"{base}/changed", "20210101000000", "h1",
         "2021-01-01 00:00:00", "en", "dg-c", _extracted_text(55),
         "Old", 55, 500.0, 0, 2),
        (f"{base}/gone", f"{base}/gone", "20210101000000", "h2",
         "2021-01-01 00:00:00", "en", "dg-g", _extracted_text(52),
         "Gone", 52, 500.0, 0, 3),
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, url_canon string, ts14 string, host string, "
        "warc_ts string, lang string, digest string, "
        "extracted_text string, title string, word_count int, "
        "quality_score double, round_idx int, seq long") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts"))
    cat.commit("pages_out", pages, operation="seed")
    vals = spark.createDataFrame(
        [(f"{base}/same", '"s1"', None, "20210101000000", "fresh"),
         (f"{base}/changed", '"c1"', None, "20210101000000", "fresh"),
         (f"{base}/gone", '"g1"', None, "20210101000000", "fresh")],
        "url string, etag string, last_modified string, "
        "checked_ts14 string, outcome string")
    cat.append("validators", vals)
    return cat


def test_revalidate_round_e2e(spark, tmp_path, server):
    store, base = server
    store.pages["/same"] = (_html("Same", 60), '"s1"')
    store.pages["/changed"] = (_html("New headline", 70), '"c2"')
    # /gone 404s
    root = str(tmp_path / "cat")
    cat = _seed_catalog(spark, root, base)

    job = RevalidateJob(spark, root, force_all=True)
    c = job.run_round(1, "20230101000000")
    assert (c["checked"], c["not_modified"], c["fresh"], c["failed"]) \
        == (3, 1, 1, 1)

    # conditional headers went out with the stored etags
    sent = dict(store.hits)
    assert sent["/same"] == '"s1"' and sent["/changed"] == '"c1"'

    # current view flips ONLY for the changed page
    pages = cat.read("pages_out")
    assert pages.count() == 4
    cur = {r["url"].rsplit("/", 1)[1]: r
           for r in latest_captures(pages).collect()}
    assert cur["same"]["ts14"] == "20210101000000"
    assert cur["changed"]["ts14"] == "20230101000000"
    assert cur["changed"]["title"] == "New headline"
    assert cur["changed"]["extracted_text"] == _extracted_text(70)
    assert cur["changed"]["round_idx"] == 1 and cur["changed"]["seq"] is None
    assert cur["gone"]["ts14"] == "20210101000000"  # failure keeps capture

    # postings for the fresh capture landed in the index
    inv = cat.read("inverted_terms")
    assert inv.filter((F.col("ts14") == "20230101000000")
                      & (F.col("term") == "headline")).count() == 1

    # validators: changed stores the NEW etag; gone keeps the stored one
    vals = {r["url"].rsplit("/", 1)[1]: r
            for r in latest_captures(
                cat.read("validators"), key_cols=("url",),
                ts_col="checked_ts14").collect()}
    assert vals["same"]["outcome"] == "not_modified"
    assert vals["changed"]["etag"] == '"c2"'
    assert vals["changed"]["outcome"] == "fresh"
    assert vals["gone"]["etag"] == '"g1"'
    assert vals["gone"]["outcome"] == "failed"

    # revalidate_log records every check
    assert cat.read("revalidate_log").count() == 3

    # ---- round 2: steady state — everything that exists 304s ----
    store.hits.clear()
    c2 = job.run_round(2, "20230202000000")
    assert (c2["checked"], c2["not_modified"], c2["fresh"], c2["failed"]) \
        == (3, 2, 0, 1)
    # the changed page revalidated with its NEW etag
    assert dict(store.hits)["/changed"] == '"c2"'
    # no new captures: the archive is already current
    assert cat.read("pages_out").count() == 4
    assert cat.read("revalidate_log").count() == 6


def test_due_selection_poisson(spark, tmp_path, server):
    """force_all=False: only URLs whose observed change rate × staleness
    crosses the threshold (or cold-start singles) are checked."""
    store, base = server
    store.pages["/hot"] = (_html("Hot", 60), '"h9"')
    store.pages["/cold"] = (_html("Cold", 60), '"c0"')
    root = str(tmp_path / "cat")
    cat = SnapshotCatalog(spark, root)
    # hot: 3 captures, digest changes every time, last seen long ago
    # cold: 3 captures, digest never changes -> lambda 0, never due
    rows = []
    for i, ts in enumerate(["20210101000000", "20210201000000",
                            "20210301000000"]):
        rows.append((f"{base}/hot", f"{base}/hot", ts, "h1",
                     f"2021-0{i+1}-01 00:00:00", "en", f"dg-{i}",
                     _extracted_text(60), "Hot", 60, 500.0, 0, None))
        rows.append((f"{base}/cold", f"{base}/cold", ts, "h1",
                     f"2021-0{i+1}-01 00:00:00", "en", "dg-same",
                     _extracted_text(60), "Cold", 60, 500.0, 0, None))
    # a later cold capture advances the corpus "now" past /hot's last
    # capture, giving /hot a positive staleness age
    rows.append((f"{base}/cold", f"{base}/cold", "20210401000000", "h1",
                 "2021-04-01 00:00:00", "en", "dg-same",
                 _extracted_text(60), "Cold", 60, 500.0, 0, None))
    pages = spark.createDataFrame(
        rows,
        "url string, url_canon string, ts14 string, host string, "
        "warc_ts string, lang string, digest string, "
        "extracted_text string, title string, word_count int, "
        "quality_score double, round_idx int, seq long") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts"))
    cat.commit("pages_out", pages, operation="seed")

    job = RevalidateJob(spark, root, due_threshold_e9=1)
    c = job.run_round(1, "20230101000000")
    assert c["checked"] == 1                       # only /hot
    assert [p for p, _ in store.hits] == ["/hot"]


def test_round_replay_converges(spark, tmp_path, server):
    """Torn-round semantics: re-running a round with the same now_ts14
    converges — pages_out/inverted_terms merges are key-idempotent and
    the validators latest-wins collapse lands on the same row."""
    store, base = server
    store.pages["/same"] = (_html("Same", 60), '"s1"')
    store.pages["/changed"] = (_html("New headline", 70), '"c2"')
    root = str(tmp_path / "cat")
    cat = _seed_catalog(spark, root, base)

    job = RevalidateJob(spark, root, force_all=True)
    job.run_round(1, "20230101000000")
    pages_n = cat.read("pages_out").count()
    inv_n = cat.read("inverted_terms").count()
    vals_before = sorted(
        (r["url"], r["etag"], r["last_modified"]) for r in latest_captures(
            cat.read("validators"), key_cols=("url",),
            ts_col="checked_ts14").collect())

    # the replay: same round, same now_ts14 (the torn-round contract)
    job.run_round(1, "20230101000000")
    assert cat.read("pages_out").count() == pages_n
    assert cat.read("inverted_terms").count() == inv_n
    # validators converge on (url, etag, last_modified); the outcome
    # label legitimately differs on replay ('fresh' -> 'not_modified':
    # the replayed fetch revalidates against the already-updated etag,
    # gets a 304, and the catalog state is ALREADY the converged one)
    vals_after = sorted(
        (r["url"], r["etag"], r["last_modified"]) for r in latest_captures(
            cat.read("validators"), key_cols=("url",),
            ts_col="checked_ts14").collect())
    assert vals_after == vals_before


def test_revalidate_stream_writer(spark, tmp_path, server):
    """Signal-driven streaming revalidation: per-file micro-batches of
    url signals each run one restricted round; catalog state matches the
    per-batch expectations exactly."""
    from chrono_scraper_spark.streaming.micro_batch import (
        revalidate_stream_writer,
    )

    store, base = server
    store.pages["/same"] = (_html("Same", 60), '"s1"')
    store.pages["/changed"] = (_html("New headline", 70), '"c2"')
    root = str(tmp_path / "cat")
    cat = _seed_catalog(spark, root, base)

    d = tmp_path / "signals"
    d.mkdir()
    spark.createDataFrame([(f"{base}/changed",)], "url string") \
        .coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame([(f"{base}/same",), (f"{base}/gone",)],
                          "url string") \
        .coalesce(1).write.parquet(str(d / "b2"))

    job = RevalidateJob(spark, root)
    stream = (spark.readStream.schema("url string")
              .option("maxFilesPerTrigger", 1).parquet(str(d / "*")))
    nows = {0: "20230101000000", 1: "20230202000000"}
    q = revalidate_stream_writer(stream, job, str(tmp_path / "ck"),
                                 now_ts14_fn=lambda b: nows[int(b)]) \
        .start()
    q.awaitTermination(180)

    # exactly the signaled urls were checked, one batch each
    checked = sorted((r["url"].rsplit("/", 1)[1], r["round_idx"])
                     for r in cat.read("revalidate_log").collect())
    assert ("changed", 0) in checked
    assert ("same", 1) in checked and ("gone", 1) in checked
    assert len(checked) == 3
    # the changed page gained a capture at batch 0's pinned timestamp
    pages = cat.read("pages_out")
    assert pages.count() == 4
    cur = {r["url"].rsplit("/", 1)[1]: r["ts14"]
           for r in latest_captures(pages).collect()}
    assert cur["changed"] == "20230101000000"
    assert cur["same"] == "20210101000000"
    # validators reflect each batch's check
    vals = {r["url"].rsplit("/", 1)[1]: r for r in latest_captures(
        cat.read("validators"), key_cols=("url",),
        ts_col="checked_ts14").collect()}
    assert vals["changed"]["etag"] == '"c2"'
    assert vals["same"]["outcome"] == "not_modified"
    assert vals["gone"]["outcome"] == "failed"


def test_validator_gates_extraction_failure_and_unchanged(
        spark, tmp_path, server):
    """The two commit gates: (a) a 200 whose body fails the extraction
    gate must NOT advance the stored validators (else every later round
    304s against content the archive never stored); (b) a byte-identical
    200 body (origin ignores conditionals / has no validators) is a
    pseudo-304 — no new capture, validators may adopt the response's."""
    import hashlib

    store, base = server
    # page became a 10-word stub: 200, but fails the word-count gate
    store.pages["/stub"] = (_html("Stub", 10), '"new-stub"')
    # origin with no validators, same body every round
    store.pages["/noetag"] = (_html("Same body", 60), None)
    # origin that newly GREW an etag for the unchanged stored body
    store.pages["/lateetag"] = (_html("Late", 60), '"l1"')
    dg60 = hashlib.md5(_extracted_text(60).encode()).hexdigest()

    root = str(tmp_path / "cat")
    cat = SnapshotCatalog(spark, root)
    rows = [
        (f"{base}/stub", f"{base}/stub", "20210101000000", "h1",
         "2021-01-01 00:00:00", "en", dg60, _extracted_text(60),
         "Stub", 60, 500.0, 0, 1),
        (f"{base}/noetag", f"{base}/noetag", "20210101000000", "h1",
         "2021-01-01 00:00:00", "en", dg60, _extracted_text(60),
         "Same body", 60, 500.0, 0, 2),
        (f"{base}/lateetag", f"{base}/lateetag", "20210101000000", "h2",
         "2021-01-01 00:00:00", "en", dg60, _extracted_text(60),
         "Late", 60, 500.0, 0, 3),
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, url_canon string, ts14 string, host string, "
        "warc_ts string, lang string, digest string, "
        "extracted_text string, title string, word_count int, "
        "quality_score double, round_idx int, seq long") \
        .withColumn("warc_ts", F.to_timestamp("warc_ts"))
    cat.commit("pages_out", pages, operation="seed")
    cat.append("validators", spark.createDataFrame(
        [(f"{base}/stub", '"old-stub"', None, "20210101000000", "fresh")],
        "url string, etag string, last_modified string, "
        "checked_ts14 string, outcome string"))

    job = RevalidateJob(spark, root, force_all=True)
    c = job.run_round(1, "20230101000000")
    assert (c["checked"], c["not_modified"], c["fresh"],
            c["unchanged"], c["failed"]) == (3, 0, 0, 2, 1)
    # neither gate appended a capture
    assert cat.read("pages_out").count() == 3

    vals = {r["url"].rsplit("/", 1)[1]: r for r in latest_captures(
        cat.read("validators"), key_cols=("url",),
        ts_col="checked_ts14").collect()}
    # extraction failure: outcome failed, stored validators KEPT — the
    # stub's '"new-stub"' etag must not be adopted
    assert vals["stub"]["outcome"] == "failed"
    assert vals["stub"]["etag"] == '"old-stub"'
    # unchanged body, no response validators: nothing to adopt
    assert vals["noetag"]["outcome"] == "unchanged"
    assert vals["noetag"]["etag"] is None
    # unchanged body WITH a new response etag: adopted (pseudo-304)
    assert vals["lateetag"]["outcome"] == "unchanged"
    assert vals["lateetag"]["etag"] == '"l1"'

    # round 2: the adopted etag pays off as a real 304; the stub keeps
    # retrying with the OLD validator of the last good content
    store.hits.clear()
    c2 = job.run_round(2, "20230202000000")
    sent = dict(store.hits)
    assert sent["/stub"] == '"old-stub"'
    assert sent["/lateetag"] == '"l1"'
    assert (c2["checked"], c2["not_modified"], c2["fresh"],
            c2["unchanged"], c2["failed"]) == (3, 1, 0, 1, 1)
    assert cat.read("pages_out").count() == 3
