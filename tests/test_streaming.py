"""Structured Streaming surface: micro-batch frontier ingestion via
foreachBatch (restart-idempotent) and watermarked windowed aggregation."""

from __future__ import annotations

import pytest

from chrono_scraper_spark.corpus import generate_pages
from chrono_scraper_spark.plans.catalog import SnapshotCatalog
from chrono_scraper_spark.streaming import micro_batch as MB


@pytest.fixture(scope="module")
def stream_corpus(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("stream") / "pages")
    generate_pages(spark, 80, partitions=4).write.parquet(p)
    return p


def test_frontier_stream_ingestion(spark, tmp_path, stream_corpus):
    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    stream = MB.read_pages_stream(spark, stream_corpus, max_files_per_trigger=2)
    q = MB.frontier_stream_writer(stream, cat, str(tmp_path / "ckpt")).start()
    q.awaitTermination(120)
    out = cat.read("stream_frontier")
    n = out.count()
    assert n > 0
    # keyed MERGE ⇒ no duplicate (url_canon, ts14)
    assert out.select("url_canon", "ts14").distinct().count() == n
    # several micro-batches ran (maxFilesPerTrigger=2 over 4 files)
    assert len(cat.snapshots("stream_frontier")) >= 2

    # restart over the same checkpoint: no new data → state unchanged
    q2 = MB.frontier_stream_writer(
        MB.read_pages_stream(spark, stream_corpus), cat,
        str(tmp_path / "ckpt")).start()
    q2.awaitTermination(60)
    assert cat.read("stream_frontier").count() == n


def test_windowed_capture_counts(spark, tmp_path, stream_corpus):
    stream = MB.read_pages_stream(spark, stream_corpus)
    agg = MB.windowed_capture_counts(stream, watermark="7 days", window="1 day")
    q = (agg.writeStream.format("memory").queryName("winagg")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select * from winagg")
    # append mode emits only watermark-closed windows; with a bounded input
    # all but the tail emit
    assert got.count() > 0
    batch = spark.read.parquet(stream_corpus)
    batch_days = (batch.selectExpr("date_trunc('day', warc_ts) d", "host")
                  .distinct().count())
    assert got.count() <= batch_days
    assert got.filter("n_captures < 1").count() == 0
