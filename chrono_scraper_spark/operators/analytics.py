"""Columnar analytics layer (SURVEY §2.1 S8/S10, §2.6 A1-A10).

The reference transforms crawl rows into a pre-derived analytics fact table
(data_transformers.py:97-412 → cdx_analytics.sql:5-75) and queries it with
DuckDB. Here the transform is ONE ``select`` (all derivations are column
expressions) and the queries are Spark SQL over the result — the whole
DuckDBService (duckdb_service.py:140-508) collapses into ``spark.sql``.

Every query in this module is also expressible as ANSI SQL, which is what
``__spark_entry__.oracle_sql`` hands the driver's DuckDB for the correctness
gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.urls import url_depth, url_extension, url_host, url_path


def cdx_analytics_transform(frontier: DataFrame) -> DataFrame:
    """S8: frontier rows → analytics fact table with pre-derived columns
    (URL parts, date parts, categorical buckets — cdx_analytics.sql:5-75,
    data_transformers.py:161-300). One projection; partition the sink by
    capture_date (Iceberg ``days(warc_ts)``)."""
    u = F.col("url")
    length = F.col("length")
    return frontier.select(
        u.alias("url"),
        url_host(u).alias("url_domain"),
        url_path(u).alias("url_path"),
        url_depth(u).alias("url_depth"),
        url_extension(u).alias("file_extension"),
        F.to_date("warc_ts").alias("capture_date"),
        F.year("warc_ts").alias("capture_year"),
        F.month("warc_ts").alias("capture_month"),
        F.dayofweek("warc_ts").alias("capture_weekday"),
        F.hour("warc_ts").alias("capture_hour"),
        F.col("mime").alias("mime_type"),
        F.col("status").alias("status_code"),
        length.alias("content_length"),
        F.when(length < 1024, "tiny")
        .when(length < 10 * 1024, "small")
        .when(length < 100 * 1024, "medium")
        .when(length < 1024 * 1024, "large")
        .otherwise("huge").alias("content_size_category"),
        F.col("digest").alias("digest_hash"),
        (F.col("status") == 200).cast("int").alias("success_indicator"),
    )


def daily_stats(analytics: DataFrame) -> DataFrame:
    """A6 (cdx_analytics.sql:85-96): per capture_date rollup."""
    return (analytics.groupBy("capture_date")
            .agg(F.count(F.lit(1)).alias("total_records"),
                 F.countDistinct("url_domain").alias("unique_domains"),
                 F.round(F.avg("content_length"), 4).alias("avg_content_length"),
                 F.sum("success_indicator").alias("success_count"))
            .orderBy("capture_date"))


def status_percentiles(analytics: DataFrame) -> DataFrame:
    """A7: exact p50/p95 of content_length per status_code
    (sample_queries.sql:240 uses PERCENTILE_CONT)."""
    return (analytics.groupBy("status_code")
            .agg(F.round(F.expr("percentile(content_length, 0.5)"), 4)
                 .alias("p50_length"),
                 F.round(F.expr("percentile(content_length, 0.95)"), 4)
                 .alias("p95_length"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("status_code"))


def domain_profile(analytics: DataFrame) -> DataFrame:
    """A8-flavored rollup: per-domain counts + distinct sorted mime list
    (STRING_AGG(DISTINCT …) analog, sample_queries.sql:284)."""
    return (analytics.groupBy("url_domain")
            .agg(F.count(F.lit(1)).alias("n_captures"),
                 F.countDistinct("url").alias("n_urls"),
                 F.round(F.avg("url_depth"), 4).alias("avg_depth"),
                 F.array_join(F.array_sort(F.collect_set("mime_type")), ",")
                 .alias("mime_types"))
            .orderBy("url_domain"))


def size_distribution(analytics: DataFrame) -> DataFrame:
    """A9/W3: bucketed distribution with per-bucket percentage via a window
    over the grand total (sample_queries.sql:126-160)."""
    counts = analytics.groupBy("content_size_category").agg(
        F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return (counts
            .withColumn("pct", F.round(F.col("n") * 100.0 / total, 4))
            .orderBy("content_size_category"))
