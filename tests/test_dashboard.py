"""Executive-dashboard rollups (operators/dashboard.py vs the
reference's dashboard_metrics.py semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from chrono_scraper_spark.operators import dashboard as DB

T0 = dt.datetime(2024, 3, 10, 12, 0, 0)


def _ts(hours=0, days=0):
    return T0 + dt.timedelta(hours=hours, days=days)


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, ts=ts, user_id=u, event_type=et)
         for i, (ts, u, et) in enumerate(rows)])


class TestContentMetrics:
    def test_counts_and_rates(self, spark):
        # 3 pages: two 200s (one inside the trailing 24h, one 3 days
        # old), one 404 inside the window (must not count as processed;
        # dashboard_metrics.py:236-244 filters on processed=True)
        pages = spark.createDataFrame([
            Row(url="a", warc_ts=_ts(), status=200, text="one two three"),
            Row(url="b", warc_ts=_ts(days=-3), status=200, text="x y"),
            Row(url="c", warc_ts=_ts(hours=-1), status=404, text="z"),
        ])
        out = DB.content_metrics(pages).collect()[0]
        assert out.total_pages == 3
        assert out.processed_24h == 1
        assert out.total_words == 6
        assert out.avg_word_count == 2  # 6 // 3
        # :281 processed/1440*100 in milli → 1*100000//1440 = 69
        assert out.processing_rate_milli == 69

    def test_empty_text_counts_zero_words(self, spark):
        pages = spark.createDataFrame([
            Row(url="a", warc_ts=_ts(), status=200, text=""),
            Row(url="b", warc_ts=_ts(), status=200, text=None),
        ])
        out = DB.content_metrics(pages).collect()[0]
        assert out.total_words == 0
        assert out.avg_word_count == 0


class TestUserMetrics:
    def test_windows_and_planted_flags(self, spark):
        # u2: active (event at now) + new (first event 2d ago);
        # u3: stale (last event 10d ago); u4: active but old account
        ev = _events(spark, [
            (_ts(days=-2), 2, "view"), (_ts(), 2, "click"),
            (_ts(days=-10), 3, "view"),
            (_ts(days=-30), 4, "view"), (_ts(hours=-2), 4, "click"),
        ])
        out = DB.user_metrics(ev).collect()[0]
        assert out.total_users == 3
        assert out.active_24h == 2        # u2, u4
        assert out.new_7d == 1            # u2 only
        assert out.verified_users == 2    # even ids: u2, u4
        assert out.approved_users == 2    # id % 3 != 0: u2, u4
        assert out.activity_rate_milli == 2 * 100_000 // 3   # 66666
        assert out.verification_rate_milli == 66_666


class TestActivityTrends:
    def test_seven_day_window_and_trend(self, spark):
        # 8 distinct days; the oldest must fall out of the window.
        # first day in window has 1 event, last has 2 → increasing.
        rows = [(_ts(days=-7), 1, "view")]          # outside
        rows += [(_ts(days=-6), 1, "view")]          # first in window: 1
        rows += [(_ts(days=-3), 1, "view")] * 3
        rows += [(_ts(), 1, "view"), (_ts(hours=-1), 1, "click")]  # last: 2
        out = DB.activity_trends(_events(spark, rows)).collect()
        by_date = {r.date: r for r in out}
        assert len(out) == 3
        assert "2024-03-03" not in by_date
        assert by_date["2024-03-04"].events == 1
        assert by_date["2024-03-10"].events == 2
        assert all(r.trend == "increasing" for r in out)

    def test_stable_when_not_increasing(self, spark):
        rows = [(_ts(days=-6), 1, "view")] * 2 + [(_ts(), 1, "view")]
        out = DB.activity_trends(_events(spark, rows)).collect()
        assert all(r.trend == "stable" for r in out)


class TestGrowthRates:
    def test_floor_on_negative_growth(self, spark):
        # signups: 1 current vs 3 previous → floor(-2*100000/3) = -66667
        ev = _events(spark, [
            (_ts(), 1, "signup"),
            (_ts(days=-1, hours=-1), 2, "signup"),
            (_ts(days=-1, hours=-2), 3, "signup"),
            (_ts(days=-1, hours=-3), 4, "signup"),
        ])
        pages = spark.createDataFrame([
            Row(url="a", warc_ts=_ts()),
            Row(url="b", warc_ts=_ts(hours=-2)),
            Row(url="c", warc_ts=_ts(days=-1, hours=-5)),
        ])
        out = DB.growth_rates(ev, pages).collect()[0]
        assert (out.new_users_24h, out.prev_users_24h) == (1, 3)
        assert out.user_growth_milli == -66_667   # floor, not truncate
        assert (out.new_pages_24h, out.prev_pages_24h) == (2, 1)
        assert out.content_growth_milli == 100_000

    def test_zero_previous_window(self, spark):
        ev = _events(spark, [(_ts(), 1, "signup")])
        pages = spark.createDataFrame([Row(url="a", warc_ts=_ts())])
        out = DB.growth_rates(ev, pages).collect()[0]
        assert out.user_growth_milli == 0   # :430 guard
        assert out.content_growth_milli == 0


class TestTopDomains:
    def test_rank_and_tiebreak(self, spark):
        rows = ([Row(url=f"a{i}", host="b.com") for i in range(3)]
                + [Row(url=f"c{i}", host="a.com") for i in range(3)]
                + [Row(url="d", host="univ1.edu")])
        out = DB.top_domains_projects(spark.createDataFrame(rows))
        got = {(r.kind, r.rank): (r.name, r.page_count)
               for r in out.collect()}
        # equal counts tie-break on name ascending
        assert got[("domain", 1)] == ("a.com", 3)
        assert got[("domain", 2)] == ("b.com", 3)
        assert got[("domain", 3)] == ("univ1.edu", 1)
        assert got[("project", 1)] == ("web", 6)
        assert got[("project", 2)] == ("academic", 1)

    def test_top_n_cut(self, spark):
        rows = [Row(url=f"u{h}{i}", host=f"h{h:02d}.com")
                for h in range(15) for i in range(h + 1)]
        out = DB.top_domains_projects(spark.createDataFrame(rows))
        doms = [r for r in out.collect() if r.kind == "domain"]
        assert len(doms) == 10
        assert max(r.rank for r in doms) == 10
        # the 5 smallest hosts fell out
        assert all(r.page_count >= 6 for r in doms)
