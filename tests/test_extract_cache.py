"""E11 extraction cache: hit/miss split, byte-identical reuse, TTL,
insert-only MERGE growth, in-batch distinct-key collapse."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chrono_scraper_spark.operators.extraction import (
    EXTRACT_CACHE_SCHEMA,
    with_extraction,
    with_extraction_cached,
)
from chrono_scraper_spark.plans.catalog import SnapshotCatalog


def _key(rows):
    return {(r["url"], r["warc_ts"]): (r["extracted"], r["fetch_status"])
            for r in rows}


@pytest.fixture()
def cat(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "wh"))


def test_cold_cache_matches_plain_extraction(spark, pages, cat):
    plain = _key(with_extraction(pages).collect())
    cached = _key(with_extraction_cached(pages, cat).collect())
    assert cached == plain
    # cache holds exactly the distinct (md5(payload), mime) keys of the input
    n_keys = pages.select(F.md5("html"), "mime").distinct().count()
    assert cat.read("extract_cache").count() == n_keys


def test_warm_cache_skips_kernel(spark, pages, cat):
    """Proof the warm pass never runs the UDF: plant a sentinel into the
    cache table — if the kernel ran, the sentinel could not appear."""
    with_extraction_cached(pages, cat).count()  # populate
    tampered = cat.read("extract_cache").withColumn(
        "text", F.concat(F.lit("CACHED::"), F.col("text")))
    cat.commit("extract_cache", tampered, operation="tamper-test")
    n_keys = pages.select(F.md5("html"), "mime").distinct().count()
    warm = with_extraction_cached(pages, cat).collect()
    assert all(r["extracted"]["text"].startswith("CACHED::") for r in warm
               if r["extracted"]["text"] is not None)
    # MERGE found nothing new: zero fresh rows for already-seen keys
    assert cat.read("extract_cache").count() == n_keys


def test_null_payload_falls_back_inline(spark, pages, cat):
    nulled = pages.withColumn(
        "html", F.when(F.col("doc_id") % 3 == 0, F.lit(None))
        .otherwise(F.col("html")))
    plain = _key(with_extraction(nulled).collect())
    out = _key(with_extraction_cached(nulled, cat).collect())
    assert out == plain
    # null-payload rows are never cached
    assert cat.read("extract_cache").filter(
        F.col("digest").isNull()).count() == 0


def test_update_cache_false_is_read_only(spark, pages, cat):
    plain = _key(with_extraction(pages).collect())
    sub = pages.filter(F.col("doc_id") % 2 == 0)
    with_extraction_cached(sub, cat).count()
    v = cat.current_version("extract_cache")
    out = _key(with_extraction_cached(pages, cat, update_cache=False)
               .collect())
    assert out == plain                       # misses extracted inline
    assert cat.current_version("extract_cache") == v  # no new commit


def test_ttl_expires_entries(spark, pages, cat):
    with_extraction_cached(pages, cat, now=1000.0).count()
    tampered = cat.read("extract_cache").withColumn(
        "text", F.concat(F.lit("CACHED::"), F.col("text")))
    cat.commit("extract_cache", tampered, operation="tamper-test")

    def texts(ttl, now):
        out = with_extraction_cached(pages, cat, ttl_seconds=ttl, now=now,
                                     update_cache=False).collect()
        return {r["extracted"]["text"] for r in out
                if r["extracted"]["text"] is not None}

    # within TTL: the (tampered) cache serves every row
    assert all(t.startswith("CACHED::") for t in texts(10.0, 1005.0))
    # past TTL: every entry expired → the kernel recomputes clean text
    assert not any(t.startswith("CACHED::") for t in texts(10.0, 99999.0))


def test_cache_schema_roundtrip(spark, cat):
    df = spark.createDataFrame([], EXTRACT_CACHE_SCHEMA)
    assert [f.name for f in df.schema.fields] == [
        "digest", "mime", "text", "title", "method", "word_count",
        "og_title", "pub_date", "cached_at"]


def test_crawl_with_extract_cache_matches_plain(spark, tmp_path):
    """CrawlJob(extract_cache=True) commits byte-identical pages_out and an
    extract_cache table holding the fetched distinct payload keys."""
    from chrono_scraper_spark.corpus import generate_pages
    from chrono_scraper_spark.plans.catalog import SnapshotCatalog
    from chrono_scraper_spark.plans.crawl import CrawlJob

    corpus = str(tmp_path / "pages")
    generate_pages(spark, 40, partitions=4).write.parquet(corpus)
    seeds = spark.createDataFrame(
        [(1, r"https://.*", "regex", None, None, None)],
        "project_id int, domain_name string, match_type string, "
        "url_path string, from_date date, to_date date")

    def run(name, **kw):
        cat = SnapshotCatalog(spark, str(tmp_path / name))
        CrawlJob(spark, cat, corpus, seeds, rps=5.0, burst=10,
                 round_seconds=60.0, **kw).run(max_rounds=20)
        return cat

    plain = run("wh_plain")
    cached = run("wh_cached", extract_cache=True)
    cols = ["url", "ts14", "extracted_text", "title", "word_count",
            "quality_score"]
    a = {tuple(r) for r in plain.read("pages_out").select(*cols).collect()}
    b = {tuple(r) for r in cached.read("pages_out").select(*cols).collect()}
    assert a == b and a
    assert cached.exists("extract_cache")
    assert cached.read("extract_cache").count() > 0
    assert not plain.exists("extract_cache")
