"""Filter-chain parity: vectorized Spark decision == pure-Python oracle.

Covers every branch of the chain (extension, list-pattern, heuristic,
already-processed, attachment, size, high-value, pass) on a URL set designed
to fire each one, plus the synthetic corpus for bulk parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chrono_scraper_spark.operators.filters import filter_stats, with_filter_decision

from .oracle import decide

BRANCH_URLS = [
    # (url, length, digest)
    ("https://a.com/theme/style.css", 5000, "d1"),          # F1 css
    ("https://a.com/pic/photo.JPG?v=2", 5000, "d2"),        # F1 image, query strip
    ("https://a.com/blog/", 5000, "d3"),                    # F2 blog
    ("https://a.com/category/tech/deep/post", 5000, "d4"),  # F2 category
    ("https://a.com/longform/article?id=77", 5000, "d5"),   # F3 dynamic param
    ("https://a.com/x", 5000, "d6"),                        # F3 short path
    ("https://a.com/article/about-everything?a=1&b=2&c=3&d=4&e=5", 5000, "d7"),  # F3 many params
    ("https://a.com/mypage/deep-article-name", 5000, "SEEN"),       # already processed
    ("https://a.com/whitepaper-x/download.pdf", 5000, "d8"),  # attachment (when disabled)
    ("https://a.com/article/tiny-page-entry", 500, "d9"),    # size too small
    ("https://a.com/article/huge-page-entry", 20_000_000, "d10"),  # size too large
    ("https://a.com/research/deep-learning-at-scale", 2000, "d11"),  # high-value research
    ("https://a.com/journal/vol-3/long-article", 2000, "d12"),        # high-value academic
    ("https://big.com/article/long-form-writeup", 9000, "d13"),       # high-value large content
    ("https://u.edu/article/some-writeup-entry", 2000, "d14"),        # institutional
    ("https://plain.com/article/ordinary-entry", 2000, "d15"),        # default pass
    ("https://a.com/article/nolength-entry", None, "d16"),            # null length passes size
]


def _spark_decisions(spark, rows, include_attachments=True, seen=("SEEN",)):
    df = spark.createDataFrame(rows, "url string, length long, digest string")
    seen_df = spark.createDataFrame([(s,) for s in seen], "digest string")
    out = with_filter_decision(df, seen_digests=seen_df,
                               include_attachments=include_attachments)
    return {r["url"]: r["decision"].asDict() for r in out.collect()}


def _check_parity(got, rows, include_attachments=True, seen=("SEEN",)):
    for url, length, digest in rows:
        exp = decide(url, length, digest, set(seen), include_attachments)
        g = got[url]
        assert g == exp, f"{url}\n spark={g}\n oracle={exp}"


def test_branch_parity_attachments_on(spark):
    got = _spark_decisions(spark, BRANCH_URLS, include_attachments=True)
    _check_parity(got, BRANCH_URLS, include_attachments=True)


def test_branch_parity_attachments_off(spark):
    got = _spark_decisions(spark, BRANCH_URLS, include_attachments=False)
    _check_parity(got, BRANCH_URLS, include_attachments=False)


def test_corpus_bulk_parity(spark, pages):
    sample = pages.select("url", "length", "digest").limit(400).collect()
    rows = [(r["url"], r["length"], r["digest"]) for r in sample]
    got = _spark_decisions(spark, rows, seen=())
    for url, length, digest in rows:
        exp = decide(url, length, digest, set())
        assert got[url] == exp, url


def test_filter_stats_shape(spark, pages):
    decided = with_filter_decision(pages)
    stats = filter_stats(decided)
    assert stats.columns == ["status", "reason", "n"]
    total = stats.agg(F.sum("n")).first()[0]
    assert total == pages.count()


def test_decision_plan_is_single_projection(spark):
    """No shuffle/exchange in the no-seen-digests plan: the whole chain must
    stay inside one whole-stage-codegen projection."""
    df = spark.createDataFrame(
        [("https://a.com/article/x-y-z", 5000, "d")],
        "url string, length long, digest string")
    plan = with_filter_decision(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
