"""CDX-scan analog: seed matching, server-side filters, static-asset drop,
pushdown."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from chrono_scraper_spark.sources import cdx


def _seeds(spark, rows):
    return spark.createDataFrame(
        rows,
        "project_id int, domain_name string, match_type string, "
        "url_path string, from_date date, to_date date",
    )


def test_seed_match_types(spark, pages):
    seeds = _seeds(spark, [
        (1, "mega.example.com", "exact", None, None, None),
        (2, "site1.com", "domain", None, None, None),
        (3, "mega.example.com", "prefix", "/articles/entry-1", None, None),
        (4, r"https://site2\.com/.*", "regex", None, None, None),
    ])
    out = cdx.discover(pages, seeds).cache()
    assert out.filter("project_id = 1").select("host").distinct().collect() == \
        [("mega.example.com",)]
    p3 = out.filter("project_id = 3").select("url").collect()
    assert p3 and all(
        r["url"].startswith("https://mega.example.com/articles/entry-1")
        for r in p3)
    p4 = out.filter("project_id = 4").select("host").distinct().collect()
    assert [r["host"] for r in p4] in ([], ["site2.com"]) or \
        all(r["host"] == "site2.com" for r in p4)
    out.unpersist()


def test_domain_suffix_matching(spark):
    rows = [
        ("https://x.com/a-long-article-name", "2020-01-01 00:00:00",
         "text/html", 200, "d1", 5000),
        ("https://sub.x.com/a-long-article-name", "2020-01-01 00:00:00",
         "text/html", 200, "d2", 5000),
        ("https://notx.com/a-long-article-name", "2020-01-01 00:00:00",
         "text/html", 200, "d3", 5000),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, mime string, status int, "
              "digest string, length long"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    seeds = _seeds(spark, [(1, "x.com", "domain", None, None, None)])
    hosts = {r["host"] for r in cdx.discover(pages, seeds).select("host").collect()}
    assert hosts == {"x.com", "sub.x.com"}


def test_status_mime_and_date_filters(spark):
    rows = [
        ("https://x.com/good-article-page", "2020-06-01 00:00:00", "text/html", 200, "d1", 5000),
        ("https://x.com/missing-error-page", "2020-06-01 00:00:00", "text/html", 404, "d2", 5000),
        ("https://x.com/styles-not-html.bin", "2020-06-01 00:00:00", "application/x-bin", 200, "d3", 5000),
        ("https://x.com/too-early-article", "2019-01-01 00:00:00", "text/html", 200, "d4", 5000),
        ("https://x.com/too-late-article", "2021-01-01 00:00:00", "text/html", 200, "d5", 5000),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, mime string, status int, "
              "digest string, length long"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    seeds = _seeds(spark, [
        (1, "x.com", "domain", None,
         datetime.date(2020, 1, 1), datetime.date(2020, 12, 31)),
    ])
    urls = {r["url"] for r in cdx.discover(pages, seeds).select("url").collect()}
    assert urls == {"https://x.com/good-article-page"}


def test_static_asset_prefilter(spark):
    rows = [
        ("https://x.com/assets/app-bundle.js", "2020-06-01 00:00:00", "text/html", 200, "d1", 5000),
        ("https://x.com/images/logo-large.png", "2020-06-01 00:00:00", "text/html", 200, "d2", 5000),
        ("https://x.com/a-regular-article", "2020-06-01 00:00:00", "text/html", 200, "d3", 5000),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts string, mime string, status int, "
              "digest string, length long"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    seeds = _seeds(spark, [(1, "x.com", "domain", None, None, None)])
    urls = {r["url"] for r in cdx.discover(pages, seeds).select("url").collect()}
    assert urls == {"https://x.com/a-regular-article"}


def test_filters_push_into_scan(spark, pages, tmp_path):
    """status/mime predicates must reach the parquet reader."""
    path = str(tmp_path / "pages_pq")
    pages.drop("html").write.parquet(path)
    df = spark.read.parquet(path)
    seeds = _seeds(spark, [(1, "mega.example.com", "exact", None, None, None)])
    plan = cdx.discover(df, seeds)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(status)" in plan or "EqualTo(status,200)" in plan
