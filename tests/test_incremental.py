"""Incremental discovery (watermark-with-overlap) + coverage gap filling."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from chrono_scraper_spark.plans import incremental as INC


def _fetch_log(spark):
    rows = [
        ("a.com", "20200110120000", "completed"),
        ("a.com", "20200111120000", "completed"),
        ("a.com", "20200301120000", "completed"),   # 50-day gap before
        ("a.com", "20200302120000", "failed"),      # failed → not covered
        ("b.com", "20210601000000", "completed"),
    ]
    return spark.createDataFrame(
        rows, "host string, ts14 string, fetch_status string")


def test_last_scraped_ts(spark):
    got = {r["host"]: r["last_ts14"]
           for r in INC.last_scraped_ts(_fetch_log(spark)).collect()}
    assert got == {"a.com": "20200301120000", "b.com": "20210601000000"}


def test_incremental_window_overlap(spark):
    pages = spark.createDataFrame(
        [("a.com", "2020-02-20 00:00:00"),   # inside overlap (wm-7d = 02-23)? no — before
         ("a.com", "2020-02-25 00:00:00"),   # within 7d overlap of 03-01
         ("a.com", "2020-03-05 00:00:00"),   # new
         ("b.com", "2021-05-20 00:00:00"),   # before b's overlap window
         ("c.com", "2019-01-01 00:00:00")],  # no watermark → full discovery
        "host string, warc_ts string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    wm = INC.last_scraped_ts(_fetch_log(spark))
    got = {(r["host"], str(r["warc_ts"])) for r in
           INC.incremental_window(pages, wm).collect()}
    assert got == {
        ("a.com", "2020-02-25 00:00:00"),
        ("a.com", "2020-03-05 00:00:00"),
        ("c.com", "2019-01-01 00:00:00"),
    }


def test_coverage_gaps(spark):
    gaps = INC.coverage_gaps(_fetch_log(spark), min_gap_days=7).collect()
    by_host = {r["host"]: r for r in gaps}
    assert "b.com" not in by_host  # single island → no gaps
    g = by_host["a.com"]
    assert g["gap_start_date"] == datetime.date(2020, 1, 12)
    assert g["gap_end_date"] == datetime.date(2020, 3, 1)
    assert g["gap_days"] == 49
