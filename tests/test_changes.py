"""Change detection (operators/changes.py) — decision-tree coverage on a
crafted per-URL version history, Dice-vs-hand-computed similarity,
difflib-mode parity with the stdlib, rollup stats, and plan shape (one
url-partition window shuffle, zero explodes)."""

from __future__ import annotations

import difflib
import math

from pyspark.sql import functions as F

from chrono_scraper_spark.operators import changes as CH

ROWS = [
    # url, ts14, text
    ("http://a.example/page", "20240101000000", "alpha beta gamma delta"),
    ("http://a.example/page", "20240102000000", "alpha beta gamma delta"),
    # identical → unchanged
    ("http://a.example/page", "20240103000000",
     "alpha beta gamma delta epsilon"),          # 1 token added → minor?
    ("http://a.example/page", "20240104000000", "totally different now"),
    ("http://a.example/page", "20240105000000", ""),   # deleted
    ("http://a.example/page", "20240106000000", "back again"),  # new
    ("http://b.example/solo", "20240101000000", "only one capture"),
    ("http://c.example/ws", "20240101000000", "x  y\tz"),
    ("http://c.example/ws", "20240102000000", "z y x"),  # reorder → 1.0
]


def _pages(spark):
    return spark.createDataFrame(ROWS, "url string, ts14 string, text string")


def test_change_types_and_similarity(spark):
    out = {(r.url, r.ts14): r for r in
           CH.detect_changes(_pages(spark), threshold=0.9).collect()}
    a = "http://a.example/page"
    assert out[(a, "20240101000000")].change_type == "new"
    assert out[(a, "20240101000000")].similarity is None
    assert out[(a, "20240102000000")].change_type == "unchanged"
    assert out[(a, "20240102000000")].similarity == 1.0
    # 4 common tokens of 4+5 → dice 8/9 ≈ 0.888889 < 0.9 → modified
    r3 = out[(a, "20240103000000")]
    assert r3.change_type == "modified"
    assert math.isclose(r3.similarity, 8 / 9, abs_tol=1e-6)
    assert (r3.units_added, r3.units_removed) == (1, 0)
    assert out[(a, "20240104000000")].change_type == "modified"
    assert out[(a, "20240104000000")].similarity == 0.0
    assert out[(a, "20240105000000")].change_type == "deleted"
    assert out[(a, "20240105000000")].similarity == 0.0
    assert out[(a, "20240106000000")].change_type == "new"
    assert out[("http://b.example/solo", "20240101000000")].change_type \
        == "new"
    # multiset Dice is order-insensitive: reorder scores 1.0 but the md5
    # gate already failed → minor_update at threshold 0.9
    rws = out[("http://c.example/ws", "20240102000000")]
    assert rws.change_type == "minor_update"
    assert rws.similarity == 1.0
    assert out[("http://a.example/page", "20240104000000")].n_versions_seen == 4


def test_minor_update_threshold_boundary(spark):
    out = {r.ts14: r for r in CH.detect_changes(
        _pages(spark), threshold=0.88).collect()
        if r.url == "http://a.example/page"}
    assert out["20240103000000"].change_type == "minor_update"  # 0.889 ≥ .88


def test_difflib_mode_matches_stdlib(spark):
    got = {(r.url, r.ts14): r.similarity for r in CH.detect_changes(
        _pages(spark), mode="difflib").collect()}
    # recompute per url history
    hist: dict = {}
    for url, ts, text in sorted(ROWS):
        hist.setdefault(url, []).append((ts, text or ""))
    for url, caps in hist.items():
        prev = None
        for ts, text in caps:
            want = None
            if prev is not None:
                if not prev and not text:
                    want = 1.0
                elif not prev or not text:
                    want = 0.0
                else:
                    want = round(difflib.SequenceMatcher(
                        None, prev, text).ratio(), 6)
            g = got[(url, ts)]
            if want is None:
                assert g is None
            else:
                assert math.isclose(g, want, abs_tol=1e-6)
            prev = text


def test_lines_granularity(spark):
    rows = [
        ("u", "1", "line one\nline two\nline three"),
        ("u", "2", "line one\nline 2\nline three"),   # 1 of 3 lines changed
        ("u", "3", "line one\n\n   \nline 2\nline three"),  # blank lines only
    ]
    df = spark.createDataFrame(rows, "url string, ts14 string, text string")
    out = {r.ts14: r for r in CH.detect_changes(
        df, granularity="lines").collect()}
    assert math.isclose(out["2"].similarity, 2 * 2 / 6, abs_tol=1e-6)
    assert (out["2"].units_added, out["2"].units_removed) == (1, 1)
    # blank lines are not units: same 3 lines → dice 1.0, md5 differs
    assert out["3"].similarity == 1.0
    assert out["3"].change_type == "minor_update"


def test_change_statistics_rollup(spark):
    ch = CH.detect_changes(_pages(spark), threshold=0.9)
    stats = {(r.day, r.change_type): r for r in
             CH.change_statistics(ch).collect()}
    assert stats[("20240101", "new")].n == 3
    assert stats[("20240101", "new")].mean_similarity is None
    assert stats[("20240103", "modified")].n == 1
    assert math.isclose(stats[("20240103", "modified")].mean_similarity,
                        math.floor(round(8 / 9, 6) * 1e9) / 1e9,
                        abs_tol=1e-9)


def test_plan_single_window_shuffle_no_explode(spark):
    plan = CH.detect_changes(_pages(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1          # the url window partition
    assert "Generate" not in plan               # no explode — array sweeps
    assert "ArrowEvalPython" not in plan        # dice mode is JVM-only
    plan2 = CH.detect_changes(_pages(spark), mode="difflib") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan2           # fidelity branch is Arrow


def test_content_evolution_tiers(spark):
    out = {(r.url, r.ts14): r for r in
           CH.content_evolution(_pages(spark)).collect()}
    a = "http://a.example/page"
    r1 = out[(a, "20240101000000")]
    assert (r1.change_type, r1.similarity_to_previous) == ("new", 1.0)
    assert r1.word_count == 4 and r1.char_count == 22
    assert out[(a, "20240102000000")].change_type == "unchanged"
    # dice 8/9 ≈ 0.889 → >0.7 and ≤0.9 → moderate_change
    assert out[(a, "20240103000000")].change_type == "moderate_change"
    assert out[(a, "20240104000000")].change_type == "major_change"
    assert out[("http://c.example/ws", "20240102000000")].change_type \
        == "minor_change"  # dice 1.0, hash differs
    # content_hash matches md5 of the text
    import hashlib
    assert r1.content_hash == hashlib.md5(
        b"alpha beta gamma delta").hexdigest()
