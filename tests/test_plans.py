"""Plan tiers, quota checks, usage accounting (operators/plans.py vs
the reference's plan_service.py / models/plans.py semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from chrono_scraper_spark.operators import plans as PL

T0 = dt.datetime(2024, 7, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=eid, ts=ts, user_id=u, event_type=et,
             value=float(v))
         for eid, (ts, u, et, v) in enumerate(rows)])


def _d(days=0):
    return T0 + dt.timedelta(days=days)


class TestAssignPlans:
    def test_tier_rules_and_defaults(self, spark):
        # 100 % 50 == 0 → unlimited even though 100 % 10 == 0 (spark
        # band) — the superuser check wins (plan_service.py:32)
        ev = _ev(spark, [(_d(), u, "view", 1) for u in (3, 7, 19, 100)])
        out = {r.user_id: r for r in PL.assign_plans(ev).collect()}
        assert out[3].tier == "spark"
        assert out[7].tier == "flash"
        assert out[19].tier == "lightning"
        assert out[100].tier == "unlimited"
        # plans.py:92-101 spark defaults
        assert out[3].max_pages_per_day == 2500
        assert out[3].max_projects == 2
        assert out[3].priority_level == 6
        assert out[3].api_access is False
        # sync_with_plan timeouts (:212-217)
        assert (out[3].default_timeout_seconds,
                out[3].max_timeout_seconds) == (60, 120)
        assert (out[19].default_timeout_seconds,
                out[19].max_timeout_seconds) == (30, 300)
        assert out[100].priority_level == 1


class TestProjectCheck:
    def test_quota_gate_and_reasons(self, spark):
        # user 1 (spark, max 2): plant 3 distinct project ids via
        # purchases → denied with the reference's exact string
        # (plans.py:160-164); user 2 with 1 project → allowed
        rows = [(_d(), 1, "purchase", 1)] * 3 + [(_d(), 2, "purchase", 1)]
        ev = _ev(spark, rows)
        out = {r.user_id: r for r in PL.project_check(ev).collect()}
        assert out[1].current_projects == 3
        assert out[1].allowed is False
        assert out[1].reason == "Plan limit: 2 projects maximum"
        assert out[2].allowed is True
        assert out[2].reason == "Can create project"


class TestRateCheck:
    def test_daily_gate_precedence(self, spark):
        # user 1 (spark): 3 views today × BURST 1000 = 3000 ≥ 2500 AND
        # a purchase (concurrent 1 ≥ max 1) — daily reason must win
        # (plans.py:231-238 order)
        rows = ([(_d(), 1, "view", 1)] * 3 + [(_d(), 1, "purchase", 1)]
                + [(_d(), 2, "view", 1)])
        out = {r.user_id: r
               for r in PL.rate_check(_ev(spark, rows)).collect()}
        assert out[1].allowed is False
        assert out[1].reason == "Daily limit reached: 2500 pages"
        assert out[2].allowed is True
        assert out[2].reason == "Within rate limits"

    def test_concurrent_gate(self, spark):
        # user 1 (spark, max_concurrent 1): 1 purchase today, views
        # under the daily limit → concurrent branch fires
        rows = [(_d(), 1, "view", 1), (_d(), 1, "purchase", 1)]
        out = PL.rate_check(_ev(spark, rows)).collect()[0]
        assert out.allowed is False
        assert out.reason == "Concurrent job limit reached: 1"

    def test_user_idle_today_allowed(self, spark):
        # user 1's events are all older than the max date → zero load
        rows = [(_d(days=-3), 1, "view", 1), (_d(), 2, "view", 1)]
        out = {r.user_id: r
               for r in PL.rate_check(_ev(spark, rows)).collect()}
        assert out[1].pages_scraped_today == 0
        assert out[1].allowed is True


class TestUsage:
    def test_breakdown_and_totals(self, spark):
        # user 1, one day: 2 views (12.7s + 47.9s → floor 12+47 = 59s),
        # 1 click, 1 error, 1 purchase
        rows = [(_d(), 1, "view", 12.7), (_d(), 1, "view", 47.9),
                (_d(), 1, "click", 1), (_d(), 1, "error", 1),
                (_d(), 1, "purchase", 1)]
        bd = PL.usage_breakdown(_ev(spark, rows)).collect()[0]
        assert bd.pages_scraped == 2
        assert bd.searches_performed == 1
        assert bd.api_calls == 1
        assert bd.entities_extracted == 1
        # 2 pages * 60000 // 59 s = 2033 milli pages/min
        assert bd.avg_pages_per_minute_milli == 2033
        tot = PL.usage_totals(_ev(spark, rows)).collect()[0]
        assert tot.total_pages == 2
        assert tot.total_scrape_time_s == 59
        assert tot.avg_pages_per_minute_milli == 2033

    def test_thirty_day_window(self, spark):
        # events 31 days before the max date fall out (:255 cutoff)
        rows = [(_d(days=-31), 1, "view", 5), (_d(), 1, "view", 5)]
        tot = PL.usage_totals(_ev(spark, rows)).collect()[0]
        assert tot.total_pages == 1

    def test_zero_time_guard(self, spark):
        rows = [(_d(), 1, "view", 0.4)]   # floor(0.4) = 0 seconds
        tot = PL.usage_totals(_ev(spark, rows)).collect()[0]
        assert tot.avg_pages_per_minute_milli == 0   # :286 guard
