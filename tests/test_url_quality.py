"""URL blocklist + spam scoring: decisions, tiering, broadcast plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from chrono_scraper_spark.operators.url_quality import (
    BLOCK_THRESHOLD,
    url_spam_score,
    with_url_quality,
)


def _frontier(spark):
    rows = [
        ("https://news.example.com/politics/article-1", "news.example.com"),
        ("https://spam.example.net/casino-poker-night", "spam.example.net"),
        ("https://bad.example.org/anything", "bad.example.org"),
        ("https://ok.example.com/xxx-viagra-sale", "ok.example.com"),
        ("https://soft.example.com/bet-on-dating", "soft.example.com"),
    ]
    return spark.createDataFrame(rows, "url string, host string")


def test_decisions_and_tiers(spark):
    df = _frontier(spark)
    bl = spark.createDataFrame([("bad.example.org",)], "domain string")
    out = {r["url"]: r for r in with_url_quality(df, bl).collect()}
    clean = out["https://news.example.com/politics/article-1"]
    assert clean["url_decision"] == "clean" and clean["url_spam_score"] == 0.0
    # casino(2) + poker(1) = 3 < threshold -> clean but scored
    scored = out["https://spam.example.net/casino-poker-night"]
    assert scored["url_spam_score"] == 3.0
    assert scored["url_decision"] == "clean"
    # domain blocklist wins regardless of score
    dom = out["https://bad.example.org/anything"]
    assert dom["blocklisted"] and dom["url_decision"] == "blocked_domain"
    # xxx(5) + viagra(2) = 7 >= 5 -> blocked_spam
    spam = out["https://ok.example.com/xxx-viagra-sale"]
    assert spam["url_spam_score"] == 7.0
    assert spam["url_decision"] == "blocked_spam"
    # bet(1) + dating(1) = 2 -> soft words alone never block
    soft = out["https://soft.example.com/bet-on-dating"]
    assert soft["url_spam_score"] == 2.0 and soft["url_decision"] == "clean"
    assert BLOCK_THRESHOLD == 5.0


def test_score_case_insensitive_and_null_safe(spark):
    df = spark.createDataFrame([("HTTPS://X.COM/CASINO",), (None,)],
                               "url string")
    rows = df.select(url_spam_score(F.col("url")).alias("s")).collect()
    assert [r["s"] for r in rows] == [2.0, 0.0]


def test_blocklist_join_is_broadcast(spark):
    df = _frontier(spark)
    bl = spark.createDataFrame([("bad.example.org",)], "domain string")
    plan = with_url_quality(df, bl)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
