"""Soft-404 detection (operators/soft404.py)."""

from __future__ import annotations

from chrono_scraper_spark.operators.soft404 import soft404_flags

ROWS = [
    # (name, url, status, title, text, want_flag)
    ("real_page", "https://h/a/b", 200, "My Article",
     "Long real content. " * 50, False),
    ("phrase_in_title", "https://h/a/b", 200, "Page Not Found",
     "Sorry.", True),
    ("phrase_in_body", "https://h/deep/post", 200, "Acme",
     "The requested URL was not found on this server.", True),
    # phrase buried past the 400-char head window does not fire
    ("phrase_late", "https://h/a/b", 200, "Essay",
     ("word " * 120) + "page not found", False),
    # title error + tiny deep body: 2 + 1 = 3 -> fires
    ("title_and_tiny", "https://h/x/y", 200, "404", "nope", True),
    # title error alone on a rich page: score 2 -> below threshold
    ("title_only", "https://h/x/y", 200, "Error - but live",
     "Real content here. " * 40, False),
    # tiny body alone: score 1 -> no
    ("tiny_only", "https://h/x/y", 200, "Stub", "short", False),
    # tiny on a shallow path never counts
    ("tiny_shallow", "https://h/", 200, "Home", "hi", False),
    # hard 404 status: flags compute but is_soft404 stays false
    ("hard_404", "https://h/x/y", 404, "404 Not Found",
     "page not found", False),
    # NULL status treated as 200 (replay rows)
    ("null_status", "https://h/x/y", None, "404 page not found", "", True),
]


def test_soft404_flags(spark):
    df = spark.createDataFrame(
        [(n, u, s, t, x) for n, u, s, t, x, _ in ROWS],
        "name string, url string, http_status int, title string, "
        "text string")
    got = {r["name"]: r for r in soft404_flags(df).collect()}
    for name, *_rest, want in ROWS:
        assert got[name]["is_soft404"] == want, (
            name, got[name]["soft404_score"])
    # signal attribution spot-checks
    assert got["phrase_in_title"]["phrase_404"]
    assert got["title_and_tiny"]["title_error"]
    assert got["title_and_tiny"]["tiny_deep"]
    assert not got["tiny_shallow"]["tiny_deep"]
    assert got["hard_404"]["soft404_score"] >= 3  # signals fire, gate holds


def test_soft404_null_text_title(spark):
    df = spark.createDataFrame(
        [("a", "https://h/x/y", 200, None, None)],
        "name string, url string, http_status int, title string, "
        "text string")
    r = soft404_flags(df).collect()[0]
    assert not r["phrase_404"] and not r["title_error"]
    assert r["tiny_deep"] and r["soft404_score"] == 1
    assert not r["is_soft404"]


def test_soft404_plan_zero_shuffle(spark):
    df = spark.createDataFrame(
        [("a", "https://h/x", 200, "t", "x")],
        "name string, url string, http_status int, title string, "
        "text string")
    plan = soft404_flags(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
