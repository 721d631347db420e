"""As-of join: backward/forward, inclusive ties, tolerance, left nulls."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from chrono_scraper_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, "h1", _ts("2024-01-01T10:00:00")),
         (2, "h1", _ts("2024-01-01T12:00:00")),
         (3, "h1", _ts("2024-01-01T09:00:00")),   # before any right row
         (4, "h2", _ts("2024-01-01T10:30:00")),
         (5, "h3", _ts("2024-01-01T10:30:00"))],  # key with no right rows
        "id int, host string, ts timestamp")
    right = spark.createDataFrame(
        [("h1", _ts("2024-01-01T09:30:00"), 100),
         ("h1", _ts("2024-01-01T12:00:00"), 200),  # exact tie with id=2
         ("h2", _ts("2024-01-01T10:00:00"), 300),
         ("h2", _ts("2024-01-01T11:00:00"), 400)],
        "host string, ts timestamp, budget int")
    return left, right


def test_backward_with_inclusive_tie(spark, sides):
    left, right = sides
    out = {r["id"]: r for r in
           asof_join(left, right, on=["host"]).collect()}
    assert out[1]["asof_budget"] == 100           # latest at-or-before
    assert out[2]["asof_budget"] == 200           # tie is INCLUSIVE
    assert out[3]["asof_budget"] is None          # nothing before
    assert out[3]["asof_ts"] is None
    assert out[4]["asof_budget"] == 300           # 11:00 is in the future
    assert out[5]["asof_budget"] is None          # unmatched key
    assert len(out) == 5                          # left rows all survive


def test_forward_direction(spark, sides):
    left, right = sides
    out = {r["id"]: r for r in
           asof_join(left, right, on=["host"],
                     direction="forward").collect()}
    assert out[3]["asof_budget"] == 100           # earliest at-or-after
    assert out[2]["asof_budget"] == 200           # inclusive tie again
    assert out[4]["asof_budget"] == 400           # 10:00 already past
    assert out[1]["asof_budget"] == 200


def test_tolerance_voids_stale_match(spark, sides):
    left, right = sides
    out = {r["id"]: r for r in
           asof_join(left, right, on=["host"],
                     tolerance_us=45 * 60 * 1_000_000).collect()}
    assert out[1]["asof_budget"] == 100           # 30 min gap: kept
    assert out[4]["asof_budget"] == 300           # 30 min gap: kept
    assert out[2]["asof_budget"] == 200           # 0 gap: kept
    # id=3/5 had no match; tolerance keeps them null
    assert out[3]["asof_budget"] is None and out[5]["asof_budget"] is None
    # shrink tolerance below 30 min: every real match voided
    tight = {r["id"]: r for r in
             asof_join(left, right, on=["host"],
                       tolerance_us=60 * 1_000_000).collect()}
    assert tight[1]["asof_budget"] is None and tight[1]["asof_ts"] is None
    assert tight[2]["asof_budget"] == 200         # exact tie still inside


def test_single_shuffle_plan(spark, sides):
    left, right = sides
    plan = asof_join(left, right, on=["host"])._jdf.queryExecution() \
        .executedPlan().toString()
    # union + one window: no join operator at all in the plan
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides only