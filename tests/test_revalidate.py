"""Conditional revalidation (If-None-Match / If-Modified-Since / 304):
``fetch_http(validator_cols=…)`` + ``recrawl.merge_revalidated``.

A threaded loopback ``http.server`` plays an origin with per-path
validators; URLs are fetched directly (no wayback template) — the live
steady-state-recrawl deployment shape.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from chrono_scraper_spark.operators.recrawl import merge_revalidated
from chrono_scraper_spark.sources.httpfetch import fetch_http


class _Store:
    def __init__(self):
        # path -> (body, etag, last_modified)
        self.pages: dict[str, tuple[bytes, str | None, str | None]] = {}
        self.omit_validators_on_304: set[str] = set()
        self.hits: list[tuple[str, str | None, str | None]] = []
        self.lock = threading.Lock()


def _make_handler(store: _Store):
    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_GET(self):
            inm = self.headers.get("If-None-Match")
            ims = self.headers.get("If-Modified-Since")
            with store.lock:
                store.hits.append((self.path, inm, ims))
            page = store.pages.get(self.path)
            if page is None:
                self._send(404, b"no", None, None)
                return
            body, etag, lastmod = page
            not_modified = ((inm is not None and inm == etag)
                            or (inm is None and ims is not None
                                and ims == lastmod))
            if not_modified:
                if self.path in store.omit_validators_on_304:
                    self._send(304, b"", None, None)
                else:
                    self._send(304, b"", etag, lastmod)
                return
            self._send(200, body, etag, lastmod)

        def _send(self, status, body, etag, lastmod):
            self.send_response(status)
            self.send_header("Content-Type", "text/html")
            if etag:
                self.send_header("ETag", etag)
            if lastmod:
                self.send_header("Last-Modified", lastmod)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if body:
                self.wfile.write(body)

    return H


@pytest.fixture()
def server():
    store = _Store()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(store))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield store, base
    httpd.shutdown()


_LM = "Tue, 10 Jun 2003 04:00:00 GMT"


def _frontier(spark, base, rows):
    return spark.createDataFrame(
        [(f"{base}{path}", "na", etag, lm) for path, etag, lm in rows],
        "url string, ts14 string, etag string, last_modified string")


def test_first_fetch_captures_validators(spark, server):
    store, base = server
    store.pages["/a"] = (b"<html>A</html>", '"v1"', _LM)
    out = fetch_http(_frontier(spark, base, [("/a", None, None)]),
                     capture_validators=True).collect()[0]
    assert out["http_status"] == 200 and out["html"] == b"<html>A</html>"
    assert out["resp_etag"] == '"v1"'
    assert out["resp_last_modified"] == _LM
    # no conditional headers were sent
    assert store.hits == [("/a", None, None)]


def test_304_success_no_retry(spark, server):
    store, base = server
    store.pages["/a"] = (b"<html>A</html>", '"v1"', _LM)
    out = fetch_http(_frontier(spark, base, [("/a", '"v1"', _LM)]),
                     validator_cols=("etag", "last_modified"),
                     max_retries=3).collect()[0]
    assert out["http_status"] == 304
    assert out["html"] is None
    assert out["fetch_err"] is None          # a success, not a failure
    assert out["resp_etag"] == '"v1"'
    assert len(store.hits) == 1              # 304 never retried
    assert store.hits[0][1] == '"v1"' and store.hits[0][2] == _LM


def test_changed_page_refetches_with_new_validators(spark, server):
    store, base = server
    store.pages["/a"] = (b"<html>A2</html>", '"v2"', _LM)
    out = fetch_http(_frontier(spark, base, [("/a", '"v1"', None)]),
                     validator_cols=("etag", "last_modified")).collect()[0]
    assert out["http_status"] == 200 and out["html"] == b"<html>A2</html>"
    assert out["resp_etag"] == '"v2"'


def test_if_modified_since_alone(spark, server):
    store, base = server
    store.pages["/a"] = (b"<html>A</html>", None, _LM)
    out = fetch_http(_frontier(spark, base, [("/a", None, _LM)]),
                     validator_cols=("etag", "last_modified")).collect()[0]
    assert out["http_status"] == 304 and out["fetch_err"] is None
    # only If-Modified-Since went out
    assert store.hits[0][1] is None and store.hits[0][2] == _LM


def test_merge_revalidated_steady_state(spark, server):
    """The full steady-state round: stored captures + validators →
    conditional fetch → 304 rows reuse stored text, changed rows carry
    fresh html; validators to store are correct either way — including
    when the server omits them on 304 (kept from the store)."""
    store, base = server
    store.pages["/same"] = (b"<html>S</html>", '"s1"', _LM)
    store.pages["/changed"] = (b"<html>C2</html>", '"c2"', _LM)
    store.pages["/quiet304"] = (b"<html>Q</html>", '"q1"', _LM)
    store.omit_validators_on_304.add("/quiet304")
    prior = spark.createDataFrame(
        [(f"{base}/same", "na", '"s1"', _LM, "S text", "S", "dg-s"),
         (f"{base}/changed", "na", '"c1"', _LM, "C text", "C", "dg-c"),
         (f"{base}/quiet304", "na", '"q1"', _LM, "Q text", "Q", "dg-q")],
        "url string, ts14 string, prior_etag string, "
        "prior_last_modified string, prior_text string, "
        "prior_title string, prior_digest string")
    fetched = fetch_http(prior,
                         validator_cols=("prior_etag",
                                         "prior_last_modified"))
    got = {r["url"].rsplit("/", 1)[1]: r
           for r in merge_revalidated(fetched).collect()}
    s = got["same"]
    assert s["not_modified"] and s["method"] == "revalidated_304"
    assert (s["text"], s["title"], s["digest"]) == ("S text", "S", "dg-s")
    assert s["etag"] == '"s1"' and s["html"] is None
    c = got["changed"]
    assert not c["not_modified"] and c["method"] is None
    assert c["text"] is None                 # fresh rows extract downstream
    assert c["html"] == b"<html>C2</html>" and c["etag"] == '"c2"'
    q = got["quiet304"]
    assert q["not_modified"] and q["text"] == "Q text"
    # 304 omitted validators -> the stored ones are kept
    assert q["etag"] == '"q1"' and q["last_modified"] == _LM


def test_merge_revalidated_zero_shuffle(spark):
    df = spark.createDataFrame(
        [("u", 304, None, None, "t", "ti", "d", '"e"', _LM)],
        "url string, http_status int, resp_etag string, "
        "resp_last_modified string, prior_text string, prior_title string, "
        "prior_digest string, prior_etag string, prior_last_modified string")
    plan = merge_revalidated(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_merge_revalidated_validator_routing(spark):
    """Validator routing is per-outcome (RFC 9110 §15.4.5 scope): a
    changed 200 with NO response validators stores NULL (the stored
    ones validate the OLD body); a failed fetch keeps the STORED ones
    even when the error page sends its own."""
    df = spark.createDataFrame(
        [("f", 200, None, "<html>new</html>", None, None, '"old"', _LM),
         ("x", 503, "http 503", None, '"errpage"', None, '"old"', _LM)],
        "url string, http_status int, fetch_err string, html string, "
        "resp_etag string, resp_last_modified string, "
        "prior_etag string, prior_last_modified string")
    got = {r["url"]: r for r in merge_revalidated(df).collect()}
    assert got["f"]["etag"] is None          # resp as-is, no coalesce
    assert got["f"]["last_modified"] is None
    assert got["x"]["etag"] == '"old"'       # prior wins outright
    assert got["x"]["last_modified"] == _LM
