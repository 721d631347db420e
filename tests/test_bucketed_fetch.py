"""Bucketed-corpus fetch path: the >broadcast-cutoff scale answer.

At 10^10 rows the corpus payload side of the fetch join must not shuffle.
``write_bucketed_pages`` stores the corpus bucketed+sorted by the join key
``(url, ts14)``; these tests assert (a) the join plan is genuinely
exchange-free and sort-free on the payload side with only the scheduled
set shuffling, and (b) a crawl over ``table:<name>`` commits byte-identical
results to the same crawl over the plain parquet corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chrono_scraper_spark.corpus import generate_pages
from chrono_scraper_spark.plans.catalog import SnapshotCatalog
from chrono_scraper_spark.plans.crawl import CrawlJob
from chrono_scraper_spark.sources.cdx import read_pages, write_bucketed_pages

RPS, BURST, ROUND_SECONDS = 0.1, 2, 60.0


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    plain = str(base / "pages")
    pages = generate_pages(spark, 60, partitions=4)
    pages.write.parquet(plain)
    write_bucketed_pages(spark.read.parquet(plain), "pages_bucketed_t",
                         str(base / "pages_bucketed"), n_buckets=4)
    yield plain, "table:pages_bucketed_t"
    spark.sql("DROP TABLE IF EXISTS pages_bucketed_t")


@pytest.fixture(scope="module")
def seeds(spark):
    return spark.createDataFrame(
        [(1, r"https://.*", "regex", None, None, None)],
        "project_id int, domain_name string, match_type string, "
        "url_path string, from_date date, to_date date")


def test_bucketed_scan_no_payload_exchange(spark, corpus):
    """The fetch-join plan over the bucketed table: the payload scan reads
    the buckets directly (Bucketed: true), the join has exactly ONE
    Exchange (the scheduled side hashing into the buckets), and the
    payload side needs no Sort (sortBy at write time)."""
    plain, table = corpus
    payload = read_pages(spark, table).select("url", "ts14", "html")
    sched = (spark.read.parquet(plain)
             .select("url", F.date_format(
                 "warc_ts", "yyyyMMddHHmmss").alias("ts14"))
             .filter(F.crc32("url") % 3 == 0)
             .withColumn("host", F.lit("h")))
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = payload.join(sched, ["url", "ts14"], "inner")
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
    assert "Bucketed: true" in plan, plan
    # exactly one Exchange in the whole join: the scheduled (metadata)
    # side hashing into the payload table's buckets
    assert plan.count("Exchange") == 1, plan
    # ...and it must NOT sit on the payload child: SMJ prints the left
    # (payload) child first, so everything between the join node and the
    # payload's bucketed FileScan must be exchange-free
    payload_section = plan[plan.index("SortMergeJoin"):
                           plan.index("FileScan")]
    assert "Exchange" not in payload_section, plan


def test_crawl_parity_bucketed_vs_plain(spark, corpus, seeds, tmp_path):
    """Same crawl, broadcast disabled (the >cutoff code path), over the
    plain parquet corpus vs the bucketed table: identical fetch_log and
    pages_out."""
    plain, table = corpus

    def run(pages_path, name):
        cat = SnapshotCatalog(spark, str(tmp_path / name))
        job = CrawlJob(spark, cat, pages_path, seeds, rps=RPS, burst=BURST,
                       round_seconds=ROUND_SECONDS, salt_target_rows=10,
                       broadcast_fetch_join=False)
        job.run(max_rounds=3)
        log = sorted(
            (r["round_idx"], r["seq"], r["url"], r["ts14"],
             r["fetch_status"])
            for r in cat.read("fetch_log").collect())
        out = sorted(
            (r["url"], r["ts14"], r["extracted_text"])
            for r in cat.read("pages_out").collect())
        return log, out

    log_p, out_p = run(plain, "wh_plain")
    log_b, out_b = run(table, "wh_bucketed")
    assert log_p == log_b
    assert out_p == out_b
    assert len(out_p) > 0
