"""Search-key usage analytics (operators/keystats.py vs the
reference's key_analytics_service.py semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from chrono_scraper_spark.operators import keystats as KS

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def _ts(days=0, hours=0):
    return T0 + dt.timedelta(days=days, hours=hours)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=et)
         for i, (ts, u, et) in enumerate(rows)])


class TestPlantKeys:
    def test_derivation_and_active_filter(self, spark):
        ev = _events(spark, [
            (_ts(days=-5), 1, "view"),       # created 5d ago
            (_ts(days=-1), 1, "click"),
            (_ts(), 1, "click"),             # usage 2, last used now
            (_ts(days=-2), 2, "view"),       # never clicked → unused
            (_ts(), 7, "click"),             # user 7 % 7 == 0 → inactive
        ])
        keys = {r.key_id: r for r in KS.plant_keys(ev).collect()}
        assert set(keys) == {1, 2}           # key 7 filtered out
        assert keys[1].usage_count == 2
        assert keys[1].last_used_s is not None
        assert keys[2].usage_count == 0
        assert keys[2].last_used_s is None
        assert keys[1].key_type == "admin"   # 1 % 3
        assert keys[2].key_type == "index"   # 2 % 3


class TestUsageOverview:
    def test_counts_and_rates(self, spark):
        # key 1: 3 clicks, active; key 2: unused; key 3: clicked 40d ago
        ev = _events(spark, [
            (_ts(days=-40), 3, "click"),
            (_ts(days=-40), 2, "view"),
            (_ts(), 1, "click"), (_ts(), 1, "click"), (_ts(), 1, "click"),
        ])
        out = KS.usage_overview(ev).collect()[0]
        assert out.total_requests == 4
        assert out.total_keys == 3
        assert out.active_keys == 1          # 30d window
        assert out.unused_keys == 1
        assert out.avg_requests_per_key_milli == 4 * 1000 // 3  # 1333
        assert out.utilization_rate_milli == 1 * 100_000 // 3   # 33333


class TestTopKeys:
    def test_rank_tiebreak_on_key_id(self, spark):
        ev = _events(spark, [(_ts(), u, "click") for u in (5, 3, 9)]
                     + [(_ts(), 9, "click")])
        out = KS.top_keys(ev).collect()
        assert [(r.rank, r.key_id) for r in out] == [(1, 9), (2, 3), (3, 5)]


class TestUsageTrends:
    def test_classification_band(self, spark):
        # recent half: 10 clicks by key 1; older half: 10 by key 2 →
        # change 0 → stable (:483 ±5% band)
        ev = _events(spark, [(_ts(), 1, "click")] * 10
                     + [(_ts(days=-20), 2, "click")] * 10)
        out = KS.usage_trends(ev).collect()[0]
        assert out.recent_period_usage == 10
        assert out.previous_period_usage == 10
        assert out.change_milli == 0
        assert out.trend_direction == "stable"

    def test_decreasing_floor(self, spark):
        # recent 1 vs older 3 → floor(-2*100000/3) = -66667 → decreasing
        ev = _events(spark, [(_ts(), 1, "click")]
                     + [(_ts(days=-20), 2, "click")] * 3)
        out = KS.usage_trends(ev).collect()[0]
        assert out.change_milli == -66_667
        assert out.trend_direction == "decreasing"

    def test_empty_previous(self, spark):
        ev = _events(spark, [(_ts(), 1, "click")])
        out = KS.usage_trends(ev).collect()[0]
        assert out.change_milli == 100_000
        assert out.trend_direction == "increasing"


class TestUsageForecast:
    def test_projection_arithmetic(self, spark):
        # one eligible key: created 25d ago, 50 clicks, last used now →
        # rate 50*1000//25 = 2000 milli/day; older usage 0 → growth 0 →
        # flat projection of 2 requests/day, confidence 1000→300 decay
        rows = [(_ts(days=-25), 1, "click")] + \
               [(_ts(), 1, "click")] * 49
        out = KS.usage_forecast(
            _events(spark, rows),
            historical_days=20, recent_days=10, forecast_days=30,
        ).orderBy("day").collect()
        assert len(out) == 30
        assert all(r.avg_daily_milli == 2000 for r in out)
        assert all(r.growth_milli == 0 for r in out)
        assert all(r.projected_requests == 2 for r in out)
        assert out[0].confidence_milli == 1000 - 700 // 30     # 977
        assert out[-1].confidence_milli == 300                 # clamp

    def test_negative_growth_clamps_to_zero(self, spark):
        # eligible key with all usage in the older window → recent 0,
        # older N → growth -1000 milli → projection hits 0 by day 30.
        # user 2's fresh view anchors "now" (created too recently to
        # be forecast-eligible itself)
        rows = [(_ts(days=-25), 1, "click")] * 30 + [(_ts(), 2, "view")]
        out = KS.usage_forecast(
            _events(spark, rows),
            historical_days=20, recent_days=10, forecast_days=30,
        ).orderBy("day").collect()
        assert out[0].growth_milli == -1000
        # day 30: multiplier 30000 - 1000*30 = 0 → projected 0
        assert out[-1].projected_requests == 0
        assert all(r.projected_requests >= 0 for r in out)

    def test_ineligible_young_keys_excluded(self, spark):
        # key created only 5d ago: excluded by the 20d history gate →
        # zero-key aggregate degenerates to an all-zero projection
        ev = _events(spark, [(_ts(days=-5), 1, "click")])
        out = KS.usage_forecast(
            ev, historical_days=20, recent_days=10, forecast_days=5,
        ).collect()
        assert len(out) == 5
        assert all(r.projected_requests == 0 for r in out)
