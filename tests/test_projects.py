"""Project↔page linking: idempotent junction, prefix reuse, shared-doc
build (D9/J5/J6) and crawl retry/circuit-breaker options (T7/T8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chrono_scraper_spark.operators import projects as P


def _pages(spark):
    rows = [
        ("https://a.com/x/1", "a1", "t1"),
        ("https://a.com/x/2", "a2", "t2"),
        ("https://b.com/y/1", "b1", "t3"),
    ]
    return spark.createDataFrame(rows, "url string, url_canon string, ts14 string")


def _empty_junction(spark):
    return spark.createDataFrame([], "project_id int, url_canon string, ts14 string")


def test_link_idempotent(spark):
    pages = _pages(spark)
    j0 = _empty_junction(spark)
    j1 = P.link_pages_to_project(pages, j0, project_id=1)
    j2 = P.link_pages_to_project(pages, j1, project_id=1)  # replay
    assert j1.count() == 3 and j2.count() == 3
    j3 = P.link_pages_to_project(pages, j2, project_id=2)
    assert j3.count() == 6


def test_reuse_pages_for_prefix(spark):
    pages = _pages(spark)
    j = P.reuse_pages_for_prefix(pages, _empty_junction(spark),
                                 project_id=7, url_prefix="https://a.com/x")
    got = {(r["project_id"], r["url_canon"]) for r in j.collect()}
    assert got == {(7, "a1"), (7, "a2")}


def test_build_shared_docs(spark):
    pages = _pages(spark)
    j = _empty_junction(spark)
    j = P.link_pages_to_project(pages, j, 1)
    j = P.link_pages_to_project(pages.filter("url_canon = 'a1'"), j, 2)
    docs = {r["url_canon"]: r for r in P.build_shared_docs(pages, j).collect()}
    assert docs["a1"]["project_ids"] == [1, 2] and docs["a1"]["is_shared"]
    assert docs["a2"]["project_ids"] == [1] and not docs["a2"]["is_shared"]


def test_retry_transient_and_breaker(spark, tmp_path):
    """T7: failed extractions re-enter the frontier until max_retries, then
    terminalize; deterministic corpus → same failure each attempt."""
    from chrono_scraper_spark.corpus import generate_pages
    from chrono_scraper_spark.plans.catalog import SnapshotCatalog
    from chrono_scraper_spark.plans.crawl import CrawlJob

    corpus = str(tmp_path / "pages")
    # bump the CDX-reported length so short docs (extraction failures)
    # survive the size filter — in real CDX data `length` is the WARC
    # record size, not the html byte count
    generate_pages(spark, 40, partitions=2).withColumn(
        "length", F.col("length") + 1500
    ).write.parquet(corpus)
    seeds = spark.createDataFrame(
        [(1, r"https://.*", "regex", None, None, None)],
        "project_id int, domain_name string, match_type string, "
        "url_path string, from_date date, to_date date")

    job = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "wh")),
                   corpus, seeds, rps=1000.0, burst=0,
                   retry_transient=True, max_retries=2)
    rounds = job.run(max_rounds=10)
    # short docs fail deterministically → retried twice then terminal
    assert any(r.get("retrying", 0) > 0 for r in rounds)
    assert rounds[-1].get("retrying", 0) == 0

    log = job.cat.read("fetch_log")
    attempts = (log.filter("fetch_status = 'failed'")
                .groupBy("url_canon", "ts14")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.max("retry_count").alias("max_rc")))
    top = attempts.agg(F.max("n"), F.max("max_rc")).first()
    assert top[0] == 3 and top[1] == 2  # initial try + 2 retries
    # terminal failures ended up in url_seen exactly once
    seen_failed = job.cat.read("url_seen").filter("status = 'failed'")
    assert seen_failed.count() == attempts.count()

    # T8: breaker trips on high failure rate
    job2 = CrawlJob(spark, SnapshotCatalog(spark, str(tmp_path / "wh2")),
                    corpus, seeds, rps=1000.0, burst=0,
                    retry_transient=True, max_retries=5,
                    failure_rate_trip=0.01)
    rounds2 = job2.run(max_rounds=10)
    assert rounds2[-1].get("circuit_open")
    assert len(rounds2) < 6


class TestProjectEfficiency:
    def test_bands_and_arithmetic(self, spark):
        from pyspark.sql import Row
        from chrono_scraper_spark.operators.projects import (
            project_efficiency)
        # academic project: 4 captures, 3 share digests with web
        # (linked), 1 unlinked 404 (already processing) → to_scrape 0;
        # efficiency 75% → High / Excellent; reduction 3/(3+0) = 100%
        rows = (
            [Row(host="univ1.edu", digest=f"d{i}", status=200,
                 url=f"e{i}") for i in range(3)]
            + [Row(host="univ1.edu", digest="solo", status=404, url="e9")]
            + [Row(host="site1.com", digest=f"d{i}", status=200,
                   url=f"w{i}") for i in range(3)]
        )
        out = {r.project: r for r in
               project_efficiency(spark.createDataFrame(rows)).collect()}
        a = out["academic"]
        assert a.total_pages_discovered == 4
        assert a.pages_linked == 3
        assert a.pages_already_processing == 1
        assert a.pages_to_scrape == 0
        assert a.scraping_reduction_milli == 100_000
        assert a.overall_efficiency_milli == 75_000
        assert a.sharing_potential == "High"
        assert a.resource_optimization_level == "Excellent"
        # time saved: 3 pages · 10 s = 30 s → 30000//3600 = 8 mh
        assert a.time_saved_milli_hours == 30_000 // 3_600
        # web: 3 linked of 3 → reduction 100%, efficiency 100%
        assert out["web"].pages_to_scrape == 0
