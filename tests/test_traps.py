"""Crawl-trap detection (operators/traps.py)."""

from __future__ import annotations

from chrono_scraper_spark.operators.traps import (
    host_trap_stats,
    url_trap_flags,
)


def test_url_trap_flags(spark):
    urls = [
        ("https://h/a/b/c", False, False, False, False),          # clean
        ("https://h/a/b/a/b/a/b/p", True, False, False, False),   # cycle
        ("https://h/" + "/".join("d" * 1 for _ in range(13)),
         True, True, False, False),                               # deep
        ("https://h/x?a=1&b=2&c=3&d=4&e=5&f=6&g=7",
         False, False, True, False),                              # params
        ("https://h/2021/05/04/2022/06/07/post",
         False, False, False, True),                              # calendar
        ("https://h/archive/2019/", False, False, False, False),  # 1 date
        ("https://h/x?a=1&b=2", False, False, False, False),      # 2 params
    ]
    df = spark.createDataFrame([(u,) for u, *_ in urls], "url string")
    got = {r["url"]: r for r in url_trap_flags(df).collect()}
    for u, rep, deep, params, cal in urls:
        r = got[u]
        assert (r["repeated_segment"], r["too_deep"],
                r["too_many_params"], r["calendar_path"]) == \
            (rep, deep, params, cal), u
        assert r["is_trap_url"] == (rep or deep or params or cal), u


def test_url_trap_flags_plan_zero_shuffle(spark):
    df = spark.createDataFrame([("https://h/a",)], "url string")
    plan = url_trap_flags(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_host_trap_stats(spark):
    rows = (
        # trap.example: 24 urls, one shared digest
        [(f"https://trap.example/{i}", "trap.example", "dg") for i in
         range(24)]
        # ok.example: 24 urls, all distinct digests
        + [(f"https://ok.example/{i}", "ok.example", f"d{i}") for i in
           range(24)]
        # tiny.example: high ratio but under min_urls -> never flags
        + [(f"https://tiny.example/{i}", "tiny.example", "dg") for i in
           range(3)]
    )
    df = spark.createDataFrame(rows, "url string, host string, digest string")
    got = {r["host"]: r for r in
           host_trap_stats(df, min_urls=20, dup_ratio_ppm=5_000_000)
           .collect()}
    t = got["trap.example"]
    assert (t["n_urls"], t["n_distinct_digests"]) == (24, 1)
    assert t["urls_per_content_ppm"] == 24_000_000 and t["dup_content_trap"]
    o = got["ok.example"]
    assert o["urls_per_content_ppm"] == 1_000_000 and not o["dup_content_trap"]
    assert not got["tiny.example"]["dup_content_trap"]
