"""Incremental crawling: watermark-with-overlap discovery + coverage gaps
(SURVEY §2.11 T2/T3, §2.8 W1/W2; reference incremental_scraping.py).

Reference semantics: the next incremental crawl starts at
``last_scraped - overlap_days(7)`` (:131-146) — re-reading the overlap is
safe because the (url, ts) MERGE is idempotent. Gap filling picks the
largest coverage holes ≥ min_gap_days between already-scraped date ranges
(:213-315) and schedules them as extra discovery windows.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.intervals import detect_gaps, merge_intervals

DEFAULT_OVERLAP_DAYS = 7     # incremental_scraping.py:348
DEFAULT_MIN_GAP_DAYS = 7     # :349 (max_gap_days=30 caps the window)


def last_scraped_ts(fetch_log: DataFrame, by: str = "host") -> DataFrame:
    """A4: max capture timestamp of completed fetches per key
    (incremental_scraping.py:162-210)."""
    return (fetch_log.filter(F.col("fetch_status") == "completed")
            .groupBy(by).agg(F.max("ts14").alias("last_ts14")))


def incremental_window(pages: DataFrame, watermarks: DataFrame,
                       by: str = "host",
                       overlap_days: int = DEFAULT_OVERLAP_DAYS) -> DataFrame:
    """T2: candidate captures newer than (per-key watermark − overlap).
    Keys without a watermark are fully discovered. The overlap re-read is
    idempotent downstream (MERGE on (url, ts14))."""
    wm = watermarks.select(
        by,
        (F.to_timestamp(F.col("last_ts14"), "yyyyMMddHHmmss")
         - F.expr(f"INTERVAL {overlap_days} DAYS")).alias("__cutoff"))
    joined = pages.join(F.broadcast(wm), by, "left")
    return joined.filter(
        F.col("__cutoff").isNull() | (F.col("warc_ts") >= F.col("__cutoff"))
    ).drop("__cutoff")


def scraped_ranges(fetch_log: DataFrame, by: str = "host") -> DataFrame:
    """Per-key covered day ranges from completed fetches: each capture
    covers its day; consecutive days merge into islands (the engine-side
    equivalent of Domain.scraped_date_ranges, project.py:353-357)."""
    days = (fetch_log.filter(F.col("fetch_status") == "completed")
            .select(by, F.to_date(F.to_timestamp(
                F.col("ts14"), "yyyyMMddHHmmss")).alias("day"))
            .distinct())
    # [day, day+1) as integer epoch days so touching days merge
    intervals = days.select(
        by,
        F.datediff(F.col("day"), F.lit("1970-01-01")).alias("start"),
        (F.datediff(F.col("day"), F.lit("1970-01-01")) + 1).alias("end"))
    return merge_intervals(intervals, by)


def coverage_gaps(fetch_log: DataFrame, by: str = "host",
                  min_gap_days: int = DEFAULT_MIN_GAP_DAYS,
                  top_n: int = 3) -> DataFrame:
    """T3: the top-N largest coverage holes per key (fill_coverage_gaps
    schedules the top 3, firecrawl_scraping.py:2080-2207). Returns
    (key, gap_start_date, gap_end_date, gap_days)."""
    ranges = scraped_ranges(fetch_log, by)
    gaps = detect_gaps(ranges, by, min_gap=min_gap_days)
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(F.desc("gap_size"), F.asc("gap_start"))
    epoch = F.lit(_dt.date(1970, 1, 1))
    return (gaps.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= top_n)
            .select(
                by,
                F.date_add(epoch, F.col("gap_start").cast("int"))
                .alias("gap_start_date"),
                F.date_add(epoch, F.col("gap_end").cast("int"))
                .alias("gap_end_date"),
                F.col("gap_size").cast("int").alias("gap_days")))
