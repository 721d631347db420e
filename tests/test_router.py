"""T9 source-fallback router + O5 hybrid union + T10 incremental read."""

from __future__ import annotations

import pytest

from chrono_scraper_spark.plans.router import (
    CIRCUIT_BREAKER,
    IMMEDIATE,
    Source,
    SourceRouter,
)


def test_router_priority_and_fallback():
    calls = []

    def fail():
        calls.append("wayback")
        raise ConnectionError("down")

    def ok():
        calls.append("cc")
        return "CC_DF"

    r = SourceRouter([
        Source("cc", ok, priority=2, strategy=IMMEDIATE),
        Source("wayback", fail, priority=1, strategy=IMMEDIATE),
    ])
    df, log = r.fetch()
    assert df == "CC_DF"
    assert calls == ["wayback", "cc"]  # priority order, one attempt each
    assert [e["outcome"] for e in log] == ["error:ConnectionError", "success"]


def test_router_retry_backoff_recorded():
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise TimeoutError()
        return "DF"

    r = SourceRouter([Source("w", flaky, max_retries=3, backoff_base_s=2.0)])
    df, log = r.fetch()
    assert df == "DF" and len(attempts) == 3
    assert [e["backoff_s"] for e in log] == [0.0, 2.0, 4.0]  # exp backoff


def test_router_circuit_breaker_opens():
    def always_fail():
        raise RuntimeError()

    src = Source("w", always_fail, strategy=CIRCUIT_BREAKER, max_retries=5,
                 trip_after=2)
    ok = Source("cc", lambda: "DF", priority=2, strategy=IMMEDIATE)
    r = SourceRouter([src, ok])
    df, log = r.fetch()
    assert df == "DF"
    assert src.open  # tripped after 2 failures within the retry loop
    # a second fetch skips the open source entirely
    df2, log2 = r.fetch()
    assert log2[0]["outcome"] == "skipped_circuit_open"


def test_router_all_fail():
    def boom():
        raise RuntimeError()

    with pytest.raises(RuntimeError, match="all sources failed"):
        SourceRouter([Source("w", boom, strategy=IMMEDIATE)]).fetch()


def test_union_with_fallback(spark):
    from chrono_scraper_spark.sources.cdx import union_with_fallback

    primary = spark.createDataFrame(
        [("u1", "t1", "wb"), ("u2", "t2", "wb")],
        "url string, ts14 string, src string")
    fallback = spark.createDataFrame(
        [("u2", "t2", "cc"), ("u3", "t3", "cc")],
        "url string, ts14 string, src string")
    out = {(r["url"], r["ts14"]): r["src"]
           for r in union_with_fallback(primary, fallback,
                                        ["url", "ts14"]).collect()}
    assert out == {("u1", "t1"): "wb", ("u2", "t2"): "wb",
                   ("u3", "t3"): "cc"}  # primary wins on overlap


def test_incremental_read_is_fragment_diff(spark, tmp_path):
    from chrono_scraper_spark.plans.catalog import SnapshotCatalog

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    cat.append("t", spark.createDataFrame([(1,)], "id int"))
    v1 = cat.current_version("t")
    cat.merge_not_matched("t", spark.createDataFrame([(1,), (2,), (3,)],
                                                     "id int"), ["id"])
    cat.append("t", spark.createDataFrame([(4,)], "id int"))
    inc = sorted(r["id"] for r in cat.read_incremental("t", v1).collect())
    assert inc == [2, 3, 4]  # only rows from post-v1 fragments
    assert cat.read_incremental("t", cat.current_version("t")).count() == 0
