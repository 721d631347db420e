"""Corpus generators: determinism, skew shape, Spark↔DuckDB CTE parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from chrono_scraper_spark import corpus

from .conftest import SF_DIR


def test_generate_pages_deterministic(spark):
    a = corpus.generate_pages(spark, 80, partitions=2).orderBy("url", "warc_ts")
    b = corpus.generate_pages(spark, 80, partitions=5).orderBy("url", "warc_ts")
    ra = [(r["url"], r["warc_ts"], r["digest"], bytes(r["html"])) for r in a.collect()]
    rb = [(r["url"], r["warc_ts"], r["digest"], bytes(r["html"])) for r in b.collect()]
    assert ra == rb


def test_generate_pages_shape(spark, pages):
    n = pages.count()
    mega = pages.filter("host = 'mega.example.com'").count()
    assert 0.25 < mega / n < 0.45  # mega-host skew ~1/3
    # repeated urls at multiple timestamps exist
    multi = pages.groupBy("url").count().filter("count > 1").count()
    assert multi > 0
    # cross-url duplicate digests exist (content dedup exercise)
    dup_digest = (pages.select("url", "digest").distinct()
                  .groupBy("digest").count().filter("count > 1").count())
    assert dup_digest > 0


def test_cdx_pages_cte_spark_duck_parity(spark):
    sdf = corpus.cdx_pages_view(spark, SF_DIR)
    got_spark = {
        (r["url"], r["ts14"]): (r["mime"], r["status"], r["length"], r["digest"])
        for r in sdf.collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')")
    duck = con.execute(
        f"SELECT url, ts14, mime, status, length, digest FROM ({corpus.PAGES_CTE_DUCK})"
    ).fetchall()
    got_duck = {(u, t): (m, s, le, d) for u, t, m, s, le, d in duck}
    assert got_spark == got_duck
