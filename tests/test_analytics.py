"""Analytics transform + rollups over the oracle-parity CDX corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chrono_scraper_spark.corpus import cdx_pages_view
from chrono_scraper_spark.operators import analytics as A

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def fact(spark):
    return A.cdx_analytics_transform(cdx_pages_view(spark, SF_DIR)).cache()


def test_transform_shape(spark, fact):
    row = fact.first()
    assert row["url_domain"] and row["capture_date"] is not None
    cats = {r["content_size_category"] for r in
            fact.select("content_size_category").distinct().collect()}
    assert cats.issubset({"tiny", "small", "medium", "large", "huge"})
    bad = fact.filter(
        (F.col("status_code") == 200) & (F.col("success_indicator") != 1)
    ).count()
    assert bad == 0


def test_daily_stats(spark, fact):
    ds = A.daily_stats(fact)
    assert ds.agg(F.sum("total_records")).first()[0] == fact.count()
    r = ds.first()
    assert r["unique_domains"] >= 1 and r["avg_content_length"] > 0


def test_percentiles_monotone(spark, fact):
    for r in A.status_percentiles(fact).collect():
        assert r["p50_length"] <= r["p95_length"]


def test_domain_profile_and_distribution(spark, fact):
    dp = A.domain_profile(fact)
    mega = dp.filter("url_domain = 'mega.example.com'").first()
    assert mega["n_captures"] > 0 and "text/html" in mega["mime_types"]
    dist = A.size_distribution(fact)
    assert abs(dist.agg(F.sum("pct")).first()[0] - 100.0) < 0.01


def test_facet_distribution_single_pass(spark, fact):
    from chrono_scraper_spark.operators.analytics import facet_distribution

    out = facet_distribution(fact, ["mime_type", "status_code"])
    rows = {(r["facet"], r["value"]): r["n"] for r in out.collect()}
    mime_total = sum(n for (f, _), n in rows.items() if f == "mime_type")
    status_total = sum(n for (f, _), n in rows.items() if f == "status_code")
    assert mime_total == status_total == fact.count()
    # one pass: a single hash shuffle for the facet agg (plus the orderBy's
    # range exchange; broadcast exchanges from the corpus CTE don't count)
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])  # AQE prints the plan twice
    assert plan.count("Exchange hashpartitioning") == 1


def test_content_analytics_and_extraction_stats(spark):
    from chrono_scraper_spark.corpus import cdx_pages_view
    from chrono_scraper_spark.operators.analytics import (
        content_analytics_transform,
        extraction_method_stats,
    )

    pages = cdx_pages_view(spark, "/root/testdata/sf0.001")
    fact = content_analytics_transform(pages)
    assert fact.filter(F.col("extraction_method").isNull()).count() == 0
    stats = {(r["extraction_method"], r["extraction_status"]): r
             for r in extraction_method_stats(fact).collect()}
    assert ("article", "success") in stats
    assert all(0.0 <= r["avg_quality"] <= 1.0 for r in stats.values())
