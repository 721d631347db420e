"""S7 live HTTP fetch: loopback-server tests for ``sources.httpfetch`` and
the ``fetch_mode="http"`` crawl variant.

No network exists in the sandbox, so a threaded ``http.server`` on
127.0.0.1 stands in for the archive origin; the wayback-style
``/{ts14}/{url}`` path shape exercises the same ``url_template`` hook a
real deployment uses (content_extraction_service.py:99-135 content URLs).
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

import pytest
from pyspark.sql import functions as F

from chrono_scraper_spark.corpus import generate_pages
from chrono_scraper_spark.plans.catalog import SnapshotCatalog
from chrono_scraper_spark.plans.crawl import CrawlJob
from chrono_scraper_spark.sources.httpfetch import fetch_http


class _Store:
    """Shared state the handler reads: (ts14, url) -> body, plus fault
    injection (per-path forced statuses / fail-N-times counters)."""

    def __init__(self):
        self.pages: dict[tuple[str, str], bytes] = {}
        self.force_status: dict[str, int] = {}       # raw path -> status
        self.fail_n: dict[str, int] = {}             # raw path -> remaining
        self.redirects: dict[str, str] = {}          # raw path -> location
        self.gzip_paths: set[str] = set()            # paths served gzipped
        self.retry_after: dict[str, str] = {}        # path -> header value
        self.gzip_raw: dict[str, bytes] = {}         # pre-gzipped payloads
        self.hits: list[str] = []
        self.lock = threading.Lock()


def _make_handler(store: _Store):
    class H(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # keep pytest output clean
            pass

        def do_GET(self):
            with store.lock:
                store.hits.append(self.path)
                remaining = store.fail_n.get(self.path, 0)
                if remaining > 0:
                    store.fail_n[self.path] = remaining - 1
            if remaining > 0:
                self._send(503, b"try later")
                return
            if self.path in store.redirects:
                self.send_response(302)
                self.send_header("Location", store.redirects[self.path])
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            if self.path in store.force_status:
                self._send(store.force_status[self.path], b"forced")
                return
            # wayback shape: /{ts14}/{original url}
            raw = unquote(self.path)
            ts14, _, url = raw.lstrip("/").partition("/")
            body = store.pages.get((ts14, url))
            if body is None:
                self._send(404, b"no capture")
            else:
                self._send(200, body)

        def _send(self, status: int, body: bytes):
            self.send_response(status)
            self.send_header("Content-Type", "text/html")
            if status in (429, 503) and self.path in store.retry_after:
                self.send_header("Retry-After", store.retry_after[self.path])
            if self.path in store.gzip_paths and status == 200:
                import gzip as _gz
                body = store.gzip_raw.get(self.path, _gz.compress(body))
                self.send_header("Content-Encoding", "gzip")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return H


@pytest.fixture(scope="module")
def server():
    store = _Store()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(store))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield store, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _frontier(spark, rows):
    return spark.createDataFrame(rows, "url string, ts14 string, host string")


TEMPLATE = "{base}/{{ts14}}/{{url}}"


def test_fetch_bodies_and_404(spark, server):
    store, base = server
    store.pages[("20240101000000", "https://a.example/x")] = b"<html>alpha</html>"
    store.pages[("20240101000000", "https://a.example/y")] = b"<html>beta</html>"
    df = _frontier(spark, [
        ("https://a.example/x", "20240101000000", "a.example"),
        ("https://a.example/y", "20240101000000", "a.example"),
        ("https://a.example/missing", "20240101000000", "a.example"),
    ])
    out = fetch_http(df, url_template=TEMPLATE.format(base=base),
                     max_retries=0).collect()
    got = {r["url"]: (bytes(r["html"]) if r["html"] is not None else None,
                      r["http_status"], r["fetch_err"]) for r in out}
    assert got["https://a.example/x"] == (b"<html>alpha</html>", 200, None)
    assert got["https://a.example/y"] == (b"<html>beta</html>", 200, None)
    body, status, err = got["https://a.example/missing"]
    assert body is None and status == 404 and "404" in err


def test_retry_recovers_transient_503(spark, server):
    store, base = server
    store.pages[("20240102000000", "https://r.example/p")] = b"<html>ok</html>"
    path = "/20240102000000/https://r.example/p"
    store.fail_n[path] = 2  # two 503s, then success
    df = _frontier(spark, [("https://r.example/p", "20240102000000",
                            "r.example")])
    out = fetch_http(df, url_template=TEMPLATE.format(base=base),
                     max_retries=3).collect()[0]
    assert bytes(out["html"]) == b"<html>ok</html>"
    assert out["http_status"] == 200
    # exhausted retries -> null html with the terminal status recorded
    store.fail_n[path] = 99
    out2 = fetch_http(df, url_template=TEMPLATE.format(base=base),
                      max_retries=1).collect()[0]
    assert out2["html"] is None and out2["http_status"] == 503


def test_redirect_followed(spark, server):
    store, base = server
    store.pages[("20240103000000", "https://m.example/new")] = b"<html>moved</html>"
    store.redirects["/20240103000000/https://m.example/old"] = (
        "/20240103000000/https://m.example/new")
    df = _frontier(spark, [("https://m.example/old", "20240103000000",
                            "m.example")])
    out = fetch_http(df, url_template=TEMPLATE.format(base=base),
                     max_retries=0).collect()[0]
    assert bytes(out["html"]) == b"<html>moved</html>"


def test_connection_refused_terminalizes(spark):
    # a port nothing listens on: rows come back failed, the stage never raises
    df = _frontier(spark, [("https://x.example/a", "20240101000000",
                            "x.example")])
    out = fetch_http(df, url_template="http://127.0.0.1:1/{ts14}/{url}",
                     max_retries=1, timeout_s=2.0).collect()[0]
    assert out["html"] is None and out["http_status"] is None
    assert out["fetch_err"]


def test_crawl_e2e_http_mode_matches_replay(spark, tmp_path, server):
    """The full crawl with fetch_mode='http' against the loopback archive
    produces the SAME fetch_log / url_seen / extracted text as corpus
    replay — live fetch changes the transport, not the round contract."""
    store, base = server
    corpus = str(tmp_path / "pages")
    generate_pages(spark, 40, partitions=4).write.parquet(corpus)
    # publish every capture at its wayback path
    for r in spark.read.parquet(corpus).selectExpr(
            "url", "date_format(warc_ts,'yyyyMMddHHmmss') ts14",
            "html").collect():
        store.pages[(r["ts14"], r["url"])] = bytes(r["html"])

    seeds = spark.createDataFrame(
        [(1, r"https://.*", "regex", None, None, None)],
        "project_id int, domain_name string, match_type string, "
        "url_path string, from_date date, to_date date")
    kw = dict(rps=0.2, burst=3, round_seconds=60.0, salt_target_rows=10)

    replay = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "replay")),
                      corpus, seeds, **kw)
    replay.run(max_rounds=50)
    live = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "live")),
                    corpus, seeds, fetch_mode="http",
                    http_fetch={"url_template": TEMPLATE.format(base=base),
                                "max_retries": 1},
                    **kw)
    live.run(max_rounds=50)

    def state(cat):
        log = sorted((r["round_idx"], r["seq"], r["url"], r["ts14"],
                      r["fetch_status"])
                     for r in cat.read("fetch_log").collect())
        seen = {(r["url"], r["ts14"]): (r["status"], r["first_seen_round"])
                for r in cat.read("url_seen").collect()}
        pages = {(r["url"], r["ts14"]): r["text_md5"]
                 for r in cat.read("pages_out").select(
                     "url", "ts14",
                     F.md5(F.col("extracted_text")).alias("text_md5"))
                 .collect()}
        return log, seen, pages

    assert state(live.cat) == state(replay.cat)


def test_fetch_robots_rfc9309_semantics(spark, server):
    """fetch_robots: 2xx body parsed; 404/unreachable -> allow-all (no row);
    persistent 5xx -> synthetic disallow-all (RFC 9309 §2.3.1)."""
    from chrono_scraper_spark.operators.politeness import (
        parse_robots,
        robots_filter,
    )
    from chrono_scraper_spark.sources.httpfetch import fetch_robots

    store, base = server
    store.pages[("robots", "https://ra.example/robots.txt")] = (
        b"User-agent: *\nDisallow: /private/")
    store.force_status["/robots/https://rc.example/robots.txt"] = 503
    fr = spark.createDataFrame(
        [("https://ra.example/ok", "/ok", "ra.example", "t1"),
         ("https://ra.example/private/x", "/private/x", "ra.example", "t2"),
         ("https://rb.example/any", "/any", "rb.example", "t3"),
         ("https://rc.example/any", "/any", "rc.example", "t4")],
        "url string, path string, host string, ts14 string")
    robots = fetch_robots(fr, url_template=TEMPLATE.format(base=base),
                          max_retries=0)
    bodies = {r["host"]: r["body"] for r in robots.collect()}
    assert "Disallow: /private/" in bodies["ra.example"]
    assert "rb.example" not in bodies            # 404 -> allow-all, no row
    assert bodies["rc.example"].endswith("Disallow: /")  # 5xx -> deny-all
    kept = {r["url"] for r in robots_filter(fr, parse_robots(robots)).collect()}
    assert kept == {"https://ra.example/ok", "https://rb.example/any"}


def test_crawl_live_robots_matches_static_rules(spark, tmp_path, server):
    """live_robots: per-round robots.txt fetch through the HTTP stage yields
    EXACTLY the catalog state of a replay crawl given the same rules as a
    static frame — the transport changes, the round contract doesn't."""
    from chrono_scraper_spark.operators.politeness import parse_robots

    store, base = server
    corpus = str(tmp_path / "pages")
    generate_pages(spark, 40, partitions=4).write.parquet(corpus)
    for r in spark.read.parquet(corpus).selectExpr(
            "url", "date_format(warc_ts,'yyyyMMddHHmmss') ts14",
            "html").collect():
        store.pages[(r["ts14"], r["url"])] = bytes(r["html"])
    robots_body = "User-agent: *\nDisallow: /articles/entry-0"
    store.pages[("robots", "https://mega.example.com/robots.txt")] = (
        robots_body.encode())

    seeds = spark.createDataFrame(
        [(1, r"https://.*", "regex", None, None, None)],
        "project_id int, domain_name string, match_type string, "
        "url_path string, from_date date, to_date date")
    kw = dict(rps=0.2, burst=3, round_seconds=60.0, salt_target_rows=10)

    static_rules = parse_robots(spark.createDataFrame(
        [("mega.example.com", robots_body)], "host string, body string"))
    replay = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "rrob")),
                      corpus, seeds, robots_rules=static_rules, **kw)
    replay.run(max_rounds=50)
    live = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "lrob")),
                    corpus, seeds, fetch_mode="http", live_robots=True,
                    http_fetch={"url_template": TEMPLATE.format(base=base),
                                "max_retries": 1},
                    **kw)
    live.run(max_rounds=50)

    def state(cat):
        seen = {(r["url"], r["ts14"]): (r["status"], r["first_seen_round"])
                for r in cat.read("url_seen").collect()}
        pages = {(r["url"], r["ts14"]): r["text_md5"]
                 for r in cat.read("pages_out").select(
                     "url", "ts14",
                     F.md5(F.col("extracted_text")).alias("text_md5"))
                 .collect()}
        return seen, pages

    assert state(replay.cat) == state(live.cat)
    # the disallowed url was never fetched as a page, and robots was
    disallowed = "https://mega.example.com/articles/entry-0"
    assert all(disallowed + "\n" not in h and not h.endswith(disallowed)
               for h in store.hits if "/robots/" not in h)
    assert any(h == "/robots/https://mega.example.com/robots.txt"
               for h in store.hits)
    assert not any((r["url"], ) == (disallowed,)
                   for r in live.cat.read("url_seen").collect())


def test_crawl_robots_ttl_cache_fetches_once(spark, tmp_path, server):
    """robots_ttl_s: first round populates robots_cache (allow-all 404s
    recorded as NULL-body rows); later rounds fetch NO robots; final
    catalog state matches the zero-TTL live_robots run."""
    store, base = server
    corpus = str(tmp_path / "pages")
    generate_pages(spark, 40, partitions=4).write.parquet(corpus)
    for r in spark.read.parquet(corpus).selectExpr(
            "url", "date_format(warc_ts,'yyyyMMddHHmmss') ts14",
            "html").collect():
        store.pages[(r["ts14"], r["url"])] = bytes(r["html"])
    store.pages[("robots", "https://mega.example.com/robots.txt")] = (
        b"User-agent: *\nDisallow: /articles/entry-0")

    seeds = spark.createDataFrame(
        [(1, r"https://.*", "regex", None, None, None)],
        "project_id int, domain_name string, match_type string, "
        "url_path string, from_date date, to_date date")
    # rps low enough that the crawl takes >1 round
    kw = dict(rps=0.05, burst=2, round_seconds=60.0, salt_target_rows=10,
              fetch_mode="http", live_robots=True,
              http_fetch={"url_template": TEMPLATE.format(base=base),
                          "max_retries": 1})

    with store.lock:
        store.hits.clear()
    zero = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "zttl")),
                    corpus, seeds, **kw)
    zero.run(max_rounds=50)
    with store.lock:
        zero_hits = [h for h in store.hits if h.startswith("/robots/")]
        store.hits.clear()
    ttl = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "ttl")),
                   corpus, seeds, robots_ttl_s=3600.0, **kw)
    rounds = ttl.run(max_rounds=50)
    assert len(rounds) > 1, "politeness budget should force multiple rounds"

    robots_hits = [h for h in store.hits if h.startswith("/robots/")]
    # same host SET as zero-TTL, but one GET per host TOTAL, not per round
    assert len(robots_hits) == len(set(robots_hits))
    assert set(robots_hits) == set(zero_hits)
    assert len(zero_hits) > len(robots_hits)  # zero-TTL refetched per round
    # misses cached as NULL bodies; the disallow host cached with its body
    cache = {r["host"]: r["body"]
             for r in ttl.cat.read("robots_cache").collect()}
    assert cache["mega.example.com"].startswith("User-agent")
    assert len(cache) == len(robots_hits)
    assert sum(1 for b in cache.values() if b is None) == len(cache) - 1

    def state(cat):
        seen = {(r["url"], r["ts14"]): r["status"]
                for r in cat.read("url_seen").collect()}
        pages = {(r["url"], r["ts14"]): r["text_md5"]
                 for r in cat.read("pages_out").select(
                     "url", "ts14",
                     F.md5(F.col("extracted_text")).alias("text_md5"))
                 .collect()}
        return seen, pages

    assert state(zero.cat) == state(ttl.cat)


def test_crawl_honor_crawl_delay_matches_static_budget(spark, tmp_path, server):
    """honor_crawl_delay: a live-fetched ``Crawl-delay: 30`` with 60 s
    rounds caps the host at 2 fetches/round, and the full catalog state
    equals a twin run given the same cap as a static budget_overrides
    frame — the directive changes the budget, nothing else."""
    store, base = server
    corpus = str(tmp_path / "pages")
    generate_pages(spark, 40, partitions=4).write.parquet(corpus)
    for r in spark.read.parquet(corpus).selectExpr(
            "url", "date_format(warc_ts,'yyyyMMddHHmmss') ts14",
            "html").collect():
        store.pages[(r["ts14"], r["url"])] = bytes(r["html"])
    store.pages[("robots", "https://mega.example.com/robots.txt")] = (
        b"User-agent: *\nCrawl-delay: 30")

    seeds = spark.createDataFrame(
        [(1, r"https://.*", "regex", None, None, None)],
        "project_id int, domain_name string, match_type string, "
        "url_path string, from_date date, to_date date")
    kw = dict(rps=0.2, burst=3, round_seconds=60.0, salt_target_rows=10)
    http = {"url_template": TEMPLATE.format(base=base), "max_retries": 1}

    live = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "cdly")),
                    corpus, seeds, fetch_mode="http", live_robots=True,
                    honor_crawl_delay=True, http_fetch=http, **kw)
    live.run(max_rounds=50)

    static_ov = spark.createDataFrame([("mega.example.com", 2)],
                                      "host string, budget int")
    twin = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "cdst")),
                    corpus, seeds, fetch_mode="http", live_robots=True,
                    budget_overrides=static_ov, http_fetch=http, **kw)
    twin.run(max_rounds=50)

    def state(cat):
        return {(r["url"], r["ts14"]): (r["status"], r["first_seen_round"])
                for r in cat.read("url_seen").collect()}

    assert state(live.cat) == state(twin.cat)
    # per-round cap actually bound: ≤2 mega-host pages first seen per round
    per_round = (live.cat.read("url_seen")
                 .filter(F.col("url").startswith("https://mega.example.com"))
                 .groupBy("first_seen_round").count().collect())
    assert per_round and all(r["count"] <= 2 for r in per_round)
    # and the cap is tighter than the default budget (other hosts got more)
    other = (live.cat.read("url_seen")
             .filter(~F.col("url").startswith("https://mega.example.com"))
             .groupBy("first_seen_round").count().collect())
    assert any(r["count"] > 2 for r in other)


def test_crawl_live_robots_wildcard_rules(spark, tmp_path, server):
    """S7+P10 composition with RFC 9309 WILDCARD rules: a live-fetched
    robots.txt carrying '*'/'$' patterns drives the same catalog state as
    the equivalent static frame, and the wildcard-blocked URL is never
    fetched as a page."""
    from chrono_scraper_spark.operators.politeness import parse_robots

    store, base = server
    corpus = str(tmp_path / "pages")
    generate_pages(spark, 40, partitions=4).write.parquet(corpus)
    for r in spark.read.parquet(corpus).selectExpr(
            "url", "date_format(warc_ts,'yyyyMMddHHmmss') ts14",
            "html").collect():
        store.pages[(r["ts14"], r["url"])] = bytes(r["html"])
    # '*-0$': any /articles/ path whose tail is '-0' — matches entry-0
    # exactly (entry-10 ends '10', not '-0')
    robots_body = "User-agent: *\nDisallow: /articles/*-0$"
    store.pages[("robots", "https://mega.example.com/robots.txt")] = (
        robots_body.encode())

    seeds = spark.createDataFrame(
        [(1, r"https://.*", "regex", None, None, None)],
        "project_id int, domain_name string, match_type string, "
        "url_path string, from_date date, to_date date")
    kw = dict(rps=0.2, burst=3, round_seconds=60.0, salt_target_rows=10)

    static_rules = parse_robots(spark.createDataFrame(
        [("mega.example.com", robots_body)], "host string, body string"))
    replay = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "rwild")),
                      corpus, seeds, robots_rules=static_rules, **kw)
    replay.run(max_rounds=50)
    live = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "lwild")),
                    corpus, seeds, fetch_mode="http", live_robots=True,
                    http_fetch={"url_template": TEMPLATE.format(base=base),
                                "max_retries": 1},
                    **kw)
    live.run(max_rounds=50)

    def seen(cat):
        return {(r["url"], r["ts14"]): r["status"]
                for r in cat.read("url_seen").collect()}

    assert seen(replay.cat) == seen(live.cat)
    blocked = "https://mega.example.com/articles/entry-0"
    assert not any(r["url"] == blocked
                   for r in live.cat.read("url_seen").collect())
    assert all(not h.endswith(blocked) for h in store.hits
               if "/robots/" not in h)
    # the anchored wildcard must NOT have blocked entry-10/entry-30 style
    # urls (tail '0' but not '-0')
    others = [r["url"] for r in live.cat.read("url_seen").collect()
              if "/articles/entry-" in r["url"] and r["url"] != blocked]
    assert others, "non-matching /articles/ urls must still be crawled"


def test_gzip_transfer_decoded_and_bounded(spark, server):
    """Content-Encoding: gzip bodies arrive decoded (crawlers must accept
    compressed transfer); a gzip bomb stops at the size cap instead of
    materializing; corrupt gzip is a per-row error, not an exception."""
    import gzip

    store, base = server
    page = b"<html><article><p>" + b"gzip payload words " * 40 \
        + b"</p></article></html>"
    store.pages[("20240101000000", "https://gz.example/ok")] = page
    store.pages[("20240101000000", "https://gz.example/bomb")] = b"x"
    store.pages[("20240101000000", "https://gz.example/corrupt")] = b"x"
    p_ok = "/20240101000000/https://gz.example/ok"
    p_bomb = "/20240101000000/https://gz.example/bomb"
    p_corrupt = "/20240101000000/https://gz.example/corrupt"
    from chrono_scraper_spark.sources import httpfetch as HF
    store.gzip_paths |= {p_ok, p_bomb, p_corrupt}
    store.gzip_raw[p_bomb] = gzip.compress(
        b"\0" * (HF._MAX_BODY_BYTES + 1024))
    store.gzip_raw[p_corrupt] = b"\x1f\x8b\x08\x00garbage-not-gzip"

    df = _frontier(spark, [
        ("https://gz.example/ok", "20240101000000", "gz.example"),
        ("https://gz.example/bomb", "20240101000000", "gz.example"),
        ("https://gz.example/corrupt", "20240101000000", "gz.example"),
    ])
    out = {r["url"]: r for r in
           fetch_http(df, url_template=TEMPLATE.format(base=base),
                      max_retries=0).collect()}
    ok = out["https://gz.example/ok"]
    assert bytes(ok["html"]) == page and ok["http_status"] == 200
    bomb = out["https://gz.example/bomb"]
    assert bomb["html"] is None
    assert "exceeds max size" in bomb["fetch_err"]
    bad = out["https://gz.example/corrupt"]
    assert bad["html"] is None
    assert "gzip decode failed" in bad["fetch_err"]


def test_retry_after_parsing_and_delay_policy():
    """Pure retry-pacing policy: delta-seconds and HTTP-date forms parse,
    garbage is ignored, the server's Retry-After raises the backoff but a
    hostile value is capped."""
    from email.utils import format_datetime
    import datetime as dt

    from chrono_scraper_spark.sources.httpfetch import (
        _parse_retry_after,
        _retry_delay,
    )

    assert _parse_retry_after("7") == 7.0
    assert _parse_retry_after("  120 ") == 120.0
    assert _parse_retry_after(None) is None
    assert _parse_retry_after("soon") is None
    future = dt.datetime.now(dt.timezone.utc) + dt.timedelta(seconds=60)
    got = _parse_retry_after(format_datetime(future, usegmt=True))
    assert got is not None and 55 <= got <= 61
    past = dt.datetime.now(dt.timezone.utc) - dt.timedelta(seconds=60)
    assert _parse_retry_after(format_datetime(past, usegmt=True)) == 0.0

    assert _retry_delay(1, 0.0, None) == 0.0
    assert _retry_delay(2, 0.5, None) == 1.0          # plain backoff
    assert _retry_delay(1, 0.5, 3.0) == 3.0           # server wins when larger
    assert _retry_delay(3, 2.0, 3.0) == 8.0           # backoff wins when larger
    assert _retry_delay(1, 0.0, 9999.0) == 30.0       # hostile header capped


def test_retry_after_header_in_live_loop(spark, server):
    """503 + Retry-After: 0 still recovers through the real loop (the
    header path executes inside the executor without stalling it)."""
    store, base = server
    store.pages[("20240105000000", "https://ra.example/p")] = \
        b"<html>after-retry</html>"
    path = "/20240105000000/https://ra.example/p"
    store.fail_n[path] = 1
    store.retry_after = {path: "0"}
    df = _frontier(spark, [("https://ra.example/p", "20240105000000",
                            "ra.example")])
    out = fetch_http(df, url_template=TEMPLATE.format(base=base),
                     max_retries=2).collect()[0]
    assert bytes(out["html"]) == b"<html>after-retry</html>"


def test_content_type_surfaced(spark, server):
    """The response media type rides along (lowercased, parameters
    stripped) — the mime truth source for extractor routing when there is
    no CDX metadata; transport failures carry NULL."""
    store, base = server
    store.pages[("20240106000000", "https://ct.example/p")] = b"<html>x</html>"
    df = _frontier(spark, [
        ("https://ct.example/p", "20240106000000", "ct.example"),
        ("https://ct.example/missing", "20240106000000", "ct.example"),
    ])
    got = {r["url"]: r for r in
           fetch_http(df, url_template=TEMPLATE.format(base=base),
                      max_retries=0).collect()}
    assert got["https://ct.example/p"]["content_type"] == "text/html"
    # 404s still expose the server's declared type; refused connections None
    assert got["https://ct.example/missing"]["content_type"] == "text/html"
    refused = fetch_http(
        _frontier(spark, [("https://x.example/a", "2024", "x.example")]),
        url_template="http://127.0.0.1:1/{ts14}/{url}",
        max_retries=0, timeout_s=2.0).collect()[0]
    assert refused["content_type"] is None


def test_retry_after_nondecimal_unicode_is_ignored():
    """http headers decode as latin-1; '²'.isdigit() is True but float()
    raises — a hostile header must parse to None, never escape."""
    from chrono_scraper_spark.sources.httpfetch import _parse_retry_after

    assert _parse_retry_after("²") is None        # superscript two
    # arabic-indic digits: float() happens to accept them — fine; the
    # invariant is that no header value ever raises
    assert _parse_retry_after("١٢") in (None, 12.0)
    assert _parse_retry_after("12") == 12.0


def test_gzip_multi_member_and_truncated(spark, server):
    """A concatenation of gzip members is valid gzip (CDN-produced) and
    must decode in full; a stream cut mid-member is an error, not a
    silently truncated success."""
    import gzip

    store, base = server
    part1 = b"<html><article><p>first half words "
    part2 = b"second half words</p></article></html>"
    store.pages[("20240107000000", "https://mm.example/multi")] = b"x"
    store.pages[("20240107000000", "https://mm.example/cut")] = b"x"
    p_multi = "/20240107000000/https://mm.example/multi"
    p_cut = "/20240107000000/https://mm.example/cut"
    store.gzip_paths |= {p_multi, p_cut}
    store.gzip_raw[p_multi] = gzip.compress(part1) + gzip.compress(part2)
    store.gzip_raw[p_cut] = gzip.compress(b"full body")[:-6]  # drop CRC

    df = _frontier(spark, [
        ("https://mm.example/multi", "20240107000000", "mm.example"),
        ("https://mm.example/cut", "20240107000000", "mm.example"),
    ])
    got = {r["url"]: r for r in
           fetch_http(df, url_template=TEMPLATE.format(base=base),
                      max_retries=0).collect()}
    multi = got["https://mm.example/multi"]
    assert bytes(multi["html"]) == part1 + part2
    cut = got["https://mm.example/cut"]
    assert cut["html"] is None and "gzip decode failed" in cut["fetch_err"]


def test_gzip_trailing_garbage_tolerated(spark, server):
    """Zero padding / CRLF after a COMPLETE gzip member (buggy
    middleware) must not fail the fetch — browsers and curl tolerate it;
    only a second gzip member continues decoding."""
    import gzip

    store, base = server
    body = b"<html>padded</html>"
    store.pages[("20240108000000", "https://pad.example/p")] = b"x"
    p = "/20240108000000/https://pad.example/p"
    store.gzip_paths.add(p)
    store.gzip_raw[p] = gzip.compress(body) + b"\x00\x00\r\n"
    out = fetch_http(
        _frontier(spark, [("https://pad.example/p", "20240108000000",
                           "pad.example")]),
        url_template=TEMPLATE.format(base=base), max_retries=0).collect()[0]
    assert bytes(out["html"]) == body and out["fetch_err"] is None
