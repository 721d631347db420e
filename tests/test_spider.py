"""Spider mode (plans/spider.py): link-guided frontier expansion.

Planted graph over a replay archive: a → {b, c}, b → d, e isolated.
Spidering from a must crawl exactly {a, b, c, d}, discovering each at
its link distance; e (present in the archive, unlinked) must never be
fetched. Off-archive links resolve to nothing and are dropped silently.
"""

from __future__ import annotations

import hashlib
from datetime import datetime

from chrono_scraper_spark.plans.catalog import SnapshotCatalog
from chrono_scraper_spark.plans.crawl import CrawlJob
from chrono_scraper_spark.plans.spider import run_spider

A = "https://s.example/a"
B = "https://s.example/b"
C = "https://t.example/c"
D = "https://s.example/d"
E = "https://s.example/e"


def _page(url, host, links, seed):
    words = " ".join(f"w{seed}word{i}" for i in range(60))
    nav = "".join(f'<a href="{h}">go</a>' for h in links)
    html = (f"<html><head><title>t{seed}</title></head><body>"
            f"<nav>{nav}</nav>"
            f"<article><p>{words}</p></article></body></html>").encode()
    # length is CDX metadata, not len(html): keep it inside the F4 size
    # window so the filter chain admits every page
    return (url, host, datetime(2020, 1, 1, seed), html, words, "en",
            "text/html", 200, hashlib.md5(words.encode()).hexdigest(),
            5000 + seed)


def _corpus(spark, tmp_path, a_links=("/b", C)):
    rows = [
        _page(A, "s.example", list(a_links), 1),      # relative + absolute
        _page(B, "s.example", [D, "#frag",
                               "mailto:x@y", "https://offsite.example/x"],
              2),                                      # junk hrefs dropped
        _page(C, "t.example", [], 3),
        _page(D, "s.example", [], 4),
        _page(E, "s.example", [A], 5),                 # E links a, unlinked
    ]
    path = str(tmp_path / "spider_pages")
    spark.createDataFrame(
        rows,
        "url string, host string, warc_ts timestamp, html binary, "
        "text string, lang string, mime string, status int, "
        "digest string, length long").write.parquet(path)
    return path


def _seeds(spark):
    return spark.createDataFrame(
        [(1, r"https://.*", "regex", None, None, None)],
        "project_id int, domain_name string, match_type string, "
        "url_path string, from_date date, to_date date")


def test_spider_reaches_linked_set_only(spark, tmp_path):
    corpus = _corpus(spark, tmp_path)
    job = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "wh")),
                   corpus, _seeds(spark), rps=10.0, burst=10,
                   round_seconds=60.0)
    stats = run_spider(job, [A], max_rounds=10)

    seen = {r["url"]: r["first_seen_round"]
            for r in job.cat.read("url_seen").collect()}
    assert set(seen) == {A, B, C, D}          # e never reached
    assert seen[A] == 0
    assert seen[B] == 1 and seen[C] == 1      # distance-1
    assert seen[D] == 2                       # distance-2 via b
    # expansion counters (fresh IN-ARCHIVE urls — the offsite link from b
    # counts for nothing): round 0 uncovered {b, c}, round 1 {d},
    # round 2 nothing -> stop before max_rounds
    assert [s["spider_new_urls"] for s in stats] == [2, 1, 0]
    assert len(stats) == 3


def test_spider_respects_politeness_budget(spark, tmp_path):
    """Budget 1/host/round, a links b, d, AND c: b and d share s.example,
    so one of them MUST defer a round (carried deferred frontier), while
    c proceeds on its own host — the spider inherits the scheduler, it
    does not bypass it."""
    corpus = _corpus(spark, tmp_path, a_links=("/b", "/d", C))
    job = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "wh2")),
                   corpus, _seeds(spark), rps=0.02, burst=0,
                   round_seconds=60.0)  # int(0.02*60) = 1 fetch/host/round
    run_spider(job, [A], max_rounds=10)
    seen = {r["url"]: r["first_seen_round"]
            for r in job.cat.read("url_seen").collect()}
    assert set(seen) == {A, B, C, D}
    # b and d were BOTH distance-1 candidates in round 1; the 1/host
    # budget admits b (url asc tie-break), defers d to round 2
    assert seen[B] == 1 and seen[C] == 1
    assert seen[D] == 2


def test_spider_honors_nofollow(spark, tmp_path):
    """rel="nofollow" links and pages whose <meta name="robots"> says
    nofollow must not seed expansion: a→b normal, a→c rel=nofollow,
    b(meta nofollow)→d. Only {a, b} are ever crawled."""
    words = " ".join(f"w{i}" for i in range(60))
    art = f"<article><p>{words}</p></article>"

    def row(url, html, seed):
        return (url, "s.example", datetime(2020, 1, 1, seed),
                html.encode(), words, "en", "text/html", 200,
                hashlib.md5(f"{url}{seed}".encode()).hexdigest(),
                5000 + seed)

    rows = [
        row(A, f'<html><body><a href="/b">b</a>'
               f'<a rel="nofollow noopener" href="{C}">c</a>{art}'
               f"</body></html>", 1),
        row(B, f'<html><head><meta name="robots" content="nofollow">'
               f'</head><body><a href="/d">d</a>{art}</body></html>', 2),
        row(C, f"<html><body>{art}</body></html>", 3),
        row(D, f"<html><body>{art}</body></html>", 4),
    ]
    path = str(tmp_path / "nf_pages")
    spark.createDataFrame(
        rows,
        "url string, host string, warc_ts timestamp, html binary, "
        "text string, lang string, mime string, status int, "
        "digest string, length long").write.parquet(path)
    job = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "wh3")),
                   path, _seeds(spark), rps=10.0, burst=10,
                   round_seconds=60.0)
    run_spider(job, [A], max_rounds=10)
    seen = {r["url"] for r in job.cat.read("url_seen").collect()}
    assert seen == {A, B}


F1 = "https://s.example/f1"
S1 = "https://s.example/s1"
FEED = "https://s.example/feed.xml"
SMAP = "https://s.example/sitemap.xml"
CHILD = "https://s.example/child.xml"


def _xml_row(url, body, seed):
    return (url, "s.example", datetime(2020, 1, 1, seed), body.encode(),
            "", "en", "application/xml", 200,
            hashlib.md5(body.encode()).hexdigest(), 5000 + seed)


def test_spider_feed_and_sitemap_channels(spark, tmp_path):
    """Multi-channel discovery e2e: the seed page advertises an RSS feed
    and its host's robots names a sitemapindex; the feed announces f1,
    the (depth-1 nested) sitemap lists s1. Neither page is linked by
    <a>, so the links channel alone cannot reach them — the channel
    injection must. The feed/sitemap bodies themselves are a sidecar
    (modeling the reference's separate poller): they never enter
    url_seen or fetch_log."""
    words = " ".join(f"w{i}" for i in range(60))
    art = f"<article><p>{words}</p></article>"

    def row(url, html, seed):
        return (url, "s.example", datetime(2020, 1, 1, seed),
                html.encode(), words, "en", "text/html", 200,
                hashlib.md5(f"{url}{seed}".encode()).hexdigest(),
                5000 + seed)

    feed_body = (
        "<?xml version='1.0'?><rss><channel>"
        f"<item><title>one</title><link>{F1}</link>"
        "<pubDate>Tue, 10 Jun 2003 04:00:00 GMT</pubDate></item>"
        "<item><title>gone</title>"
        "<link>https://offsite.example/x</link></item>"
        "</channel></rss>")
    index_body = ("<?xml version='1.0'?><sitemapindex>"
                  f"<sitemap><loc>{CHILD}</loc></sitemap></sitemapindex>")
    child_body = ("<?xml version='1.0'?><urlset>"
                  f"<url><loc>{S1}</loc><changefreq>daily</changefreq>"
                  "</url></urlset>")
    rows = [
        row(A, '<html><head><link rel="alternate" '
               'type="application/rss+xml" href="/feed.xml"></head>'
               f'<body><a href="/b">b</a>{art}</body></html>', 1),
        row(B, f"<html><body>{art}</body></html>", 2),
        row(F1, f"<html><body>{art} feedpage</body></html>", 3),
        row(S1, f"<html><body>{art} sitemappage</body></html>", 4),
        row(E, f"<html><body>{art} unlinked</body></html>", 5),
        _xml_row(FEED, feed_body, 6),
        _xml_row(SMAP, index_body, 7),
        _xml_row(CHILD, child_body, 8),
    ]
    path = str(tmp_path / "chan_pages")
    spark.createDataFrame(
        rows,
        "url string, host string, warc_ts timestamp, html binary, "
        "text string, lang string, mime string, status int, "
        "digest string, length long").write.parquet(path)
    robots = spark.createDataFrame(
        [("s.example", f"User-agent: *\nAllow: /\nSitemap: {SMAP}\n")],
        "host string, body string")
    job = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "wh4")),
                   path, _seeds(spark), rps=10.0, burst=10,
                   round_seconds=60.0)
    stats = run_spider(job, [A], max_rounds=10,
                       channels=("links", "feeds", "sitemaps"),
                       robots_bodies=robots)

    seen = {r["url"]: r["first_seen_round"]
            for r in job.cat.read("url_seen").collect()}
    # pages announced by all three channels crawled; xml sidecar bodies
    # and the unlinked page never enter the crawl tables
    assert set(seen) == {A, B, F1, S1}
    assert seen[A] == 0
    assert seen[B] == 1 and seen[F1] == 1 and seen[S1] == 1
    assert stats[0]["channel_new"] == {"links": 1, "feeds": 1,
                                       "sitemaps": 1}
    assert stats[1]["spider_new_urls"] == 0
    fetched = {r["url"] for r in job.cat.read("fetch_log").collect()}
    assert fetched.isdisjoint({FEED, SMAP, CHILD, E})


def test_spider_links_only_ignores_channels(spark, tmp_path):
    """Default channels=("links",) must not consult feeds/sitemaps, and
    unknown channel names / missing robots_bodies raise."""
    import pytest

    corpus = _corpus(spark, tmp_path)
    job = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "wh5")),
                   corpus, _seeds(spark), rps=10.0, burst=10,
                   round_seconds=60.0)
    with pytest.raises(ValueError, match="unknown discovery channels"):
        run_spider(job, [A], channels=("links", "webrings"))
    with pytest.raises(ValueError, match="robots_bodies"):
        run_spider(job, [A], channels=("sitemaps",))
    stats = run_spider(job, [A], max_rounds=10)
    assert all(set(s["channel_new"]) == {"links"} for s in stats)


def test_spider_rejects_empty_channels(spark):
    import pytest

    class _J:
        pass

    j = _J()
    j.spark = spark
    with pytest.raises(ValueError, match="at least one"):
        run_spider(j, [A], channels=())
