"""Batch-job scheduling (operators/batchsched.py vs the reference's
batch_scheduler.py semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from chrono_scraper_spark.operators import batchsched as BS

T0 = dt.datetime(2024, 2, 1, 8, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=eid, ts=ts, user_id=1, event_type=et)
         for eid, ts, et in rows])


def _pages(spark, n200=3000, n404=100):
    rows = ([Row(url=f"u{i}", status=200, text="words here")
             for i in range(n200)]
            + [Row(url=f"e{i}", status=404, text="x")
               for i in range(n404)])
    return spark.createDataFrame(rows)


class TestPlanJobs:
    def test_estimates_and_clamps(self, spark):
        # cdx: 3100 records → mem clamp to 256 (3100//1000=3 < 256),
        # dur max(0,5)=5; content: 3000 → mem max(6,512)=512, dur 10
        ev = _ev(spark, [(0, T0, "view"), (1, T0, "click"),
                         (2, T0, "purchase"), (3, T0, "error")])
        out = {r.batch_type: r
               for r in BS.plan_jobs(ev, _pages(spark)).collect()}
        assert out["cdx_analytics"].estimated_memory_mb == 256
        assert out["cdx_analytics"].estimated_duration_minutes == 5
        assert out["cdx_analytics"].batch_size == 50_000
        assert out["content_analytics"].estimated_memory_mb == 512
        assert out["content_analytics"].estimated_duration_minutes == 10
        assert out["project_analytics"].estimated_memory_mb == 256
        assert out["system_events"].estimated_memory_mb == 128
        assert out["system_events"].estimated_duration_minutes == 2

    def test_memory_scales_with_corpus(self, spark):
        # 600k cdx records → 600000//1000 = 600 MB (between clamps)
        ev = _ev(spark, [(0, T0, "view")])
        big = spark.range(600_000).selectExpr(
            "concat('u', id) AS url", "200 AS status", "'w' AS text")
        out = BS.plan_jobs(ev, big).collect()[0]
        assert out.estimated_memory_mb == 600
        assert out.estimated_duration_minutes == 60

    def test_priority_bands(self, spark):
        ev = _ev(spark, [(i, T0, "view") for i in range(4)])
        pr = {r.job_id: r.priority
              for r in BS.plan_jobs(ev, _pages(spark)).collect()}
        assert pr == {0: 1, 1: 5, 2: 10, 3: 20}


class TestQueueOrder:
    def test_priority_then_time_then_id(self, spark):
        # job 3 (CRITICAL 20) first despite latest schedule; jobs 5 and
        # 1 share NORMAL(5): earlier scheduled_at wins; 9 vs 5 tie on
        # priority+time → job_id ascending
        ev = _ev(spark, [
            (1, T0 + dt.timedelta(hours=1), "view"),
            (3, T0 + dt.timedelta(hours=9), "view"),
            (5, T0, "view"),
            (9, T0, "view"),
        ])
        out = sorted(BS.queue_order(ev, _pages(spark)).collect(),
                     key=lambda r: r.position)
        assert [r.job_id for r in out] == [3, 5, 9, 1]


class TestCapacity:
    def test_margin_gate(self, spark):
        # planted snapshot: 750 MB available; content est 512 →
        # 512*1.5 = 768 > 750 → no capacity; cdx est 256 → 384 fits
        ev = _ev(spark, [(0, T0, "view"), (1, T0, "click")])
        out = {r.batch_type: r.has_capacity
               for r in BS.capacity_check(ev, _pages(spark)).collect()}
        assert out["cdx_analytics"] is True
        assert out["content_analytics"] is False
