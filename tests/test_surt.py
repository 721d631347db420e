"""SURT canonical keys + CDXJ index lines (functions/urls.py surt_key,
sources/cdx.py cdxj_records).

Reference analog: the CDX API the reference pages through serves indexes
sorted on exactly this key (wayback_machine.py:741-907); pywb/OpenWayback
define the SURT form publicly.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from chrono_scraper_spark.functions.urls import surt_key
from chrono_scraper_spark.sources.cdx import cdxj_records


def _keys(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["k"] for r in
            df.select(surt_key(F.col("url")).alias("k")).collect()]


def test_surt_key_form(spark):
    got = _keys(spark, [
        "https://www.example.com/path",
        "http://example.com/path",           # scheme + www fold together
        "https://www2.Example.COM/Path",     # wwwN + case fold
        "https://sub.site.co.uk/a/b",
        "https://example.com",               # empty path -> '/'
        "https://example.com/p?b=2&a=1",     # query params sorted
        "https://example.com/p?a=1&b=2",
        "https://example.com/p?single=x",
        "https://example.com/p#frag",        # fragment dropped
    ])
    assert got == [
        "com,example)/path",
        "com,example)/path",
        "com,example)/path",
        "uk,co,site,sub)/a/b",
        "com,example)/",
        "com,example)/p?a=1&b=2",
        "com,example)/p?a=1&b=2",
        "com,example)/p?single=x",
        "com,example)/p",
    ]


def test_surt_key_sorts_hosts_contiguously(spark):
    """The point of SURT: one registered domain's captures form one
    contiguous key run under a plain bytewise sort."""
    urls = [
        "https://a.example.com/1",
        "https://other.org/x",
        "https://b.example.com/2",
        "https://www.example.com/3",
    ]
    keys = sorted(_keys(spark, urls))
    ex = [k for k in keys if k.startswith("com,example")]
    # contiguous: the com,example run is an unbroken slice
    first = keys.index(ex[0])
    assert keys[first:first + len(ex)] == ex


def test_cdxj_records_line_format(spark):
    pages = spark.createDataFrame(
        [("https://www.example.com/p?b=2&a=1", "20200102030405",
          "text/html", 200, "d1", 123)],
        "url string, ts14 string, mime string, status int, "
        "digest string, length long")
    row = cdxj_records(pages).collect()[0]
    assert row["surt"] == "com,example)/p?a=1&b=2"
    head, ts, payload = row["cdxj_line"].split(" ", 2)
    assert head == row["surt"] and ts == "20200102030405"
    assert json.loads(payload) == {
        "url": "https://www.example.com/p?b=2&a=1",
        "mime": "text/html", "status": "200",
        "digest": "d1", "length": "123"}


def test_cdxj_records_sorted(spark):
    pages = spark.createDataFrame(
        [("https://z.org/a", "2", "text/html", 200, "d", 1),
         ("https://a.com/b", "1", "text/html", 200, "d", 1),
         ("https://a.com/a", "3", "text/html", 200, "d", 1),
         ("https://a.com/a", "1", "text/html", 200, "d", 1)],
        "url string, ts14 string, mime string, status int, "
        "digest string, length long")
    got = [(r["surt"], r["ts14"]) for r in cdxj_records(pages).collect()]
    assert got == sorted(got)
