"""Optimization-rule matching + resource pressure
(operators/optimizer.py vs performance_optimization_engine.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from chrono_scraper_spark.operators import optimizer as OZ


def _ev(spark, event_ids):
    return spark.createDataFrame(
        [Row(event_id=e, ts=dt.datetime(2024, 1, 1), user_id=1,
             event_type="view") for e in event_ids])


def _matrix(spark, event_ids):
    rows = OZ.rule_matches(_ev(spark, event_ids)).collect()
    return {(r.qid, r.rule): r.matched for r in rows}


class TestRuleMatches:
    def test_each_template_triggers_its_rule(self, spark):
        m = _matrix(spark, [0, 1, 2, 3, 4, 5])
        assert m[(0, "subquery_to_join")] is True       # IN (SELECT ...)
        assert m[(3, "exists_to_join")] is True         # EXISTS (...)
        # note: [^LIMIT]+ excludes the letters l/i/m/t, so this only
        # fires because template 2 sorts on 'score'
        assert m[(2, "optimize_order_by_limit")] is True
        assert m[(4, "predicate_pushdown")] is True     # backreference
        # covering_index_hint needs has_covering_index (qid%4==1):
        # qid 5 → 5%4=1 → True and the pattern matches
        assert m[(5, "covering_index_hint")] is True

    def test_lookahead_blocks_on_limit(self, spark):
        # template 2 reads FROM cdx_records ... LIMIT 100 → the
        # (?!.*LIMIT) lookahead fails even though qid 3 has no
        # estimated_rows key (:198-204)
        m = _matrix(spark, [2, 3])
        # qid 2 → template 2 ... wait: template = qid % 6, so qid 2 IS
        # the LIMIT template; estimated_rows present (even) anyway
        assert m[(2, "auto_add_limit")] is False

    def test_lambda_condition_quirk(self, spark):
        # template 1 (scrape_pages, no LIMIT): qid 1 (odd → no
        # estimated_rows key) matches; qid 7 (same template, odd) too;
        # qid 13? still odd. Even qids with this template: qid 4? no —
        # template index = qid%6, so qid 10 → template 4. qid 19 →
        # template 1, odd. Even qid with template 1: qid 16 %6 = 4 …
        # qids ≡1 (mod 6) are always odd, so plant the even case via
        # qid 22 → 22%6=4? No. 6k+1 is odd for all k — the quirk's
        # "key present" arm needs a different template slot, so assert
        # the rule semantics directly on qid parity instead.
        m = _matrix(spark, [1, 7])
        assert m[(1, "auto_add_limit")] is True
        assert m[(7, "auto_add_limit")] is True

    def test_backref_requires_same_table(self, spark):
        # template 4's WHERE references links.* (the joined table) —
        # the \2 backreference binds; template 0 has JOIN-free WHERE.
        # Also load-bearing: [^WHERE]+ excludes the letters w/h/e/r,
        # so the ON clause's table names avoid them
        m = _matrix(spark, [0, 4])
        assert m[(0, "predicate_pushdown")] is False
        assert m[(4, "predicate_pushdown")] is True

    def test_covering_condition_gate(self, spark):
        # qid 11 → template 5, 11%4=3 → has_covering_index False →
        # pattern matches but the condition blocks (:91-94)
        m = _matrix(spark, [11])
        assert m[(11, "covering_index_hint")] is False


class TestResourcePressure:
    def test_gate_and_score(self, spark):
        # event 13: cpu 13*7%120=91 >80 → under pressure;
        # memory 13*131%8192=1703; conn 13
        out = {r.sample_id: r
               for r in OZ.resource_pressure(_ev(spark, [13, 2])).collect()}
        r = out[13]
        assert r.cpu_percent == 91
        assert r.under_pressure is True
        expect = (min(91 * 100_000 // 80, 100_000)
                  + 1703 * 100_000 // 4096
                  + 13 * 100_000 // 50) // 3
        assert r.pressure_score_milli == expect
        # event 2: cpu 14, mem 262, conn 2 → calm
        assert out[2].under_pressure is False

    def test_members_capped_at_100(self, spark):
        # event 17: cpu 17*7%120 = 119 → member capped at 100000
        r = OZ.resource_pressure(_ev(spark, [17])).collect()[0]
        assert r.cpu_percent == 119
        member_cpu = 100_000
        mem = 17 * 131 % 8192
        expect = (member_cpu + mem * 100_000 // 4096
                  + 17 * 100_000 // 50) // 3
        assert r.pressure_score_milli == expect
