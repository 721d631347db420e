"""Cost estimation, investigation page comparison, user engagement
(operators/costing.py, operators/investigate.py vs the reference's
cost_estimation.py / investigation_service.py / user_analytics.py
semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from chrono_scraper_spark.corpus import cdx_pages_view
from chrono_scraper_spark.operators import costing as CO
from chrono_scraper_spark.operators import investigate as IV

from tests.conftest import SF_DIR


def _pages(spark, rows):
    return spark.createDataFrame(rows)


class TestCostEstimate:
    def test_reference_arithmetic(self, spark):
        # one host, 1000 raw pages, no cap: est = 300, time = 360 mh,
        # cpu = 360*50 = 18000 µ$, bw = 300*5e6//2^20 = 1430 µ$,
        # storage = 300*1e6//2^20 = 286 µ$ (cost_estimation.py:95-105)
        rows = [Row(host="site1.com", url=f"u{i}") for i in range(1000)]
        out = CO.estimate_domain_costs(_pages(spark, rows)).collect()[0]
        assert out.total_pages == 1000
        assert out.est_pages == 300
        assert out.time_milli_hours == 360
        assert out.cost_micro_usd == 360 * 50 + 1430 + 286
        # 1000 is not < 1000 → medium (:218)
        assert out.confidence == "medium"

    def test_max_pages_cap_and_confidence(self, spark):
        rows = ([Row(host="univ1.edu", url=f"e{i}") for i in range(500)]
                + [Row(host="mega.example.com", url=f"m{i}")
                   for i in range(40000)])
        out = {r.host: r for r in
               CO.estimate_domain_costs(_pages(spark, rows)).collect()}
        # .edu cap 60 binds: est0 = 150 → 60 (:91-92)
        assert out["univ1.edu"].est_pages == 60
        assert out["univ1.edu"].confidence == "high"  # <1000 + cap set
        # mega: no cap, 40000 ≥ 10000 → low (:222)
        assert out["mega.example.com"].est_pages == 12000
        assert out["mega.example.com"].confidence == "low"

    def test_project_confidence_fold(self, spark):
        rows = ([Row(host="univ1.edu", url=f"e{i}") for i in range(10)]
                + [Row(host="agency1.gov", url=f"g{i}") for i in range(10)]
                + [Row(host="site1.com", url=f"s{i}") for i in range(3000)]
                + [Row(host="mega.example.com", url=f"m{i}")
                   for i in range(20000)])
        dom = CO.estimate_domain_costs(_pages(spark, rows))
        proj = {r.project: r for r in
                CO.estimate_project_costs(dom).collect()}
        assert proj["academic"].confidence_level == "high"
        # web = site1.com (medium: 3000 < 10000 w/ cap... cap set →
        # <1000 fails, so medium) + mega (low) → low
        assert proj["web"].confidence_level == "low"
        assert proj["government"].confidence_level == "high"
        assert proj["web"].domain_count == 2

    def test_all_confidence_levels_on_corpus(self, spark):
        out = CO.estimate_domain_costs(cdx_pages_view(spark, SF_DIR))
        levels = {r.confidence for r in out.collect()}
        assert "high" in levels and "medium" in levels


class TestPageCompare:
    def test_all_change_types_appear_on_corpus(self, spark):
        fields = IV.compare_fields(cdx_pages_view(spark, SF_DIR))
        types = {r.change_type for r in fields.collect()}
        assert types == {"addition", "deletion", "major_modification",
                         "minor_modification"}

    def test_classifier_branches(self, spark):
        # synthetic pair: one url, two captures, all four fields change
        rows = [
            Row(url="u", ts14="20200101000000", doc_id=0, n_cap=0,
                text="short", lang="en"),
            Row(url="u", ts14="20200101000001", doc_id=0, n_cap=1,
                text="short", lang="en"),
        ]
        # doc_id%4 == 0: baseline meta_description is '' → addition
        fields = {r.field: r for r in
                  IV.compare_fields(_pages(spark, rows)).collect()}
        assert fields["meta_description"].change_type == "addition"
        assert fields["meta_description"].category == "metadata_change"
        assert set(fields) == {"meta_description"}

        rows2 = [Row(url="u", ts14="20200101000000", doc_id=2, n_cap=0,
                     text="word " * 20, lang="en"),
                 Row(url="u", ts14="20200101000001", doc_id=2, n_cap=1,
                     text="word " * 20, lang="en")]
        f2 = {r.field: r for r in
              IV.compare_fields(_pages(spark, rows2)).collect()}
        # content tripled → length delta > half the longer side; the
        # other fields derive from the unperturbed text → only content
        assert f2["content"].change_type == "major_modification"
        assert set(f2) == {"content"}

        # minor_modification: %4=3 prefixes the title with 'vN '
        rows3 = [Row(url="u", ts14="20200101000000", doc_id=3, n_cap=0,
                     text="some headline text", lang="en"),
                 Row(url="u", ts14="20200101000001", doc_id=3, n_cap=1,
                     text="some headline text", lang="en")]
        f3 = {r.field: r for r in
              IV.compare_fields(_pages(spark, rows3)).collect()}
        assert f3["title"].change_type == "minor_modification"
        assert f3["title"].significance_milli == 800

    def test_summary_significance_and_similarity(self, spark):
        rows = [Row(url="u", ts14="20200101000000", doc_id=2, n_cap=0,
                    text="word " * 20, lang="en"),
                Row(url="u", ts14="20200101000001", doc_id=2, n_cap=1,
                    text="word " * 20, lang="en")]
        s = IV.compare_summary(_pages(spark, rows)).collect()[0]
        # only content changed → 1/4
        assert s.fields_changed == 1
        assert s.similarity_milli == 750
        assert s.significance_milli == 900
        assert bool(s.is_significant) is True
        assert s.change_categories == "content_change"

    def test_unchanged_pair_reports_zero(self, spark):
        rows = [Row(url="u", ts14="20200101000000", doc_id=5, n_cap=0,
                    text="same", lang="en"),
                Row(url="u", ts14="20200101000001", doc_id=5, n_cap=0,
                    text="same", lang="en")]
        s = IV.compare_summary(_pages(spark, rows)).collect()[0]
        assert s.fields_changed == 0
        assert s.similarity_milli == 1000
        assert bool(s.is_significant) is False
        assert s.change_categories == ""

    def test_single_capture_urls_excluded(self, spark):
        rows = [Row(url="only", ts14="20200101000000", doc_id=1, n_cap=0,
                    text="x", lang="en")]
        assert IV.compare_summary(_pages(spark, rows)).count() == 0


class TestUserEngagement:
    def _events(self, spark, rows):
        return spark.createDataFrame(rows)

    def test_caps_and_bonuses(self, spark):
        base = dt.datetime(2024, 1, 10)
        rows = []
        # user 6 (verified: %2=0, NOT approved: %3=0): 20 signups
        # (login 60→30), 15 clicks (search 30→20), last event = corpus
        # max → recency 15; projects 0 → 30+0+20+15+5 = 70
        for i in range(20):
            rows.append(Row(event_id=i, ts=base, user_id=6,
                            event_type="signup"))
        for i in range(15):
            rows.append(Row(event_id=100 + i, ts=base, user_id=6,
                            event_type="click"))
        # user 7 (not verified, approved): one purchase 9 days stale →
        # no recency; projects 1 → 0+5+0+0+0+5 = 10
        rows.append(Row(event_id=500, ts=base - dt.timedelta(days=9),
                        user_id=7, event_type="purchase"))
        out = {r.user_id: r for r in
               CO.user_engagement(self._events(spark, rows)).collect()}
        assert out[6].engagement_score == 70
        assert out[6].login_count == 20
        assert out[7].engagement_score == 10
        assert out[7].projects_created == 1

    def test_recency_decay(self, spark):
        base = dt.datetime(2024, 1, 10)
        rows = [Row(event_id=1, ts=base, user_id=1, event_type="view"),
                Row(event_id=2, ts=base - dt.timedelta(days=3),
                    user_id=2, event_type="view")]
        out = {r.user_id: r for r in
               CO.user_engagement(self._events(spark, rows)).collect()}
        # user 1 (not verified, approved): recency 15 + 5 = 20
        assert out[1].engagement_score == 20
        # user 2 (verified, approved): 15 - 3*2 = 9 → 9 + 10 = 19
        assert out[2].engagement_score == 19

    def test_score_cap_100(self, spark):
        base = dt.datetime(2024, 1, 10)
        rows = []
        for i in range(20):
            rows.append(Row(event_id=i, ts=base, user_id=4,
                            event_type="signup"))
            rows.append(Row(event_id=1000 + i, ts=base, user_id=4,
                            event_type="click"))
            # distinct planted project ids
            rows.append(Row(event_id=2000 + i * 7, ts=base, user_id=4,
                            event_type="purchase"))
        out = CO.user_engagement(self._events(spark, rows)).collect()[0]
        # 30 + 25 + 20 + 15 + 5 + 5 = 100 exactly at the cap
        assert out.engagement_score == 100


def test_corpus_queries_run(spark):
    """The five q_service contract queries produce stable, non-empty
    frames at sf0.001 (oracle parity itself is checked by
    scripts/check_oracles.py / the driver at sf0.01)."""
    from chrono_scraper_spark.queries import q_service as S

    for name, fn in S.QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.count() > 0, name
        assert name in S.ORACLES
