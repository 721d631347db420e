"""Structured Streaming surface (SURVEY §2.11 T1-T4).

The reference is a Celery-beat micro-batch system (celery_app.py:115-151);
the engine's batch round loop (plans/crawl.py) is the deterministic analog.
This module is the *streaming* deployment of the same operators: new corpus
files arrive continuously, each micro-batch runs the filter chain + dedup +
commit via ``foreachBatch``, and watermarked windowed aggregations handle
late captures (the reference's overlap_days=7 re-read window,
incremental_scraping.py:131-146, IS a 7-day allowed-lateness watermark).

Scale notes: ``foreachBatch`` gives the batch DataFrame API inside the
stream, so the exact same dedup/MERGE code paths run per micro-batch; state
never lives in executor memory (the url_seen table is the state, as in the
batch design). The windowed aggregation uses Spark's streaming state store
with watermark-based eviction — state is bounded by (window × lateness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import in_batch_dedup
from ..operators.filters import with_filter_decision
from ..functions.urls import ts14, with_url_parts
from ..plans.catalog import SnapshotCatalog

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, text string, "
                "lang string, host string, path string, mime string, "
                "status int, digest string, length long, title string, "
                "doc_id long, n_cap long")


def read_pages_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    """File-arrival stream over the corpus directory (new parquet files =
    new captures; the CDX-poll analog)."""
    return (spark.readStream.schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def frontier_stream_writer(stream: DataFrame, catalog: SnapshotCatalog,
                           checkpoint_dir: str):
    """Per-micro-batch frontier ingestion: filter chain + in-batch dedup +
    idempotent MERGE into the url_seen/frontier tables. Restart-safe: the
    streaming checkpoint replays the batch and every MERGE converges
    (T4/T5)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        df = batch_df
        if "ts14" not in df.columns:
            df = df.withColumn("ts14", ts14(F.col("warc_ts")))
        if "url_canon" not in df.columns:
            df = with_url_parts(df.drop("host", "path"))
        df = df.filter(F.col("status") == 200)
        df = in_batch_dedup(df, ["url_canon", "ts14"])
        decided = with_filter_decision(df)
        catalog.merge_not_matched(
            "stream_frontier",
            decided.select(
                "url", "url_canon", "ts14", "host", "digest", "length",
                F.col("decision.status").alias("status"),
                F.col("decision.priority_score").alias("priority_score"),
                F.lit(batch_id).alias("batch_id"),
            ),
            ["url_canon", "ts14"],
            properties={"batch_id": batch_id},
        )

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True))


def windowed_capture_counts(stream: DataFrame,
                            watermark: str = "7 days",
                            window: str = "1 day") -> DataFrame:
    """T2: watermarked tumbling-window capture counts per host — late
    captures within ``watermark`` update their window; older ones are
    dropped and the state store evicts closed windows."""
    return (stream.withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"), "host")
            .agg(F.count(F.lit(1)).alias("n_captures"),
                 F.approx_count_distinct("url").alias("n_urls"))
            .select(F.col("w.start").alias("window_start"), "host",
                    "n_captures", "n_urls"))
