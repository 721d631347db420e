"""User evaluation + bulk-operation validation (operators/user_admin.py
vs user_evaluation_service.py / bulk_operations.py semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from chrono_scraper_spark.operators import user_admin as UA

T0 = dt.datetime(2024, 5, 1)


def _ev(spark, user_ids):
    return spark.createDataFrame(
        [Row(event_id=i, ts=T0, user_id=u, event_type="view")
         for i, u in enumerate(user_ids)])


class TestEvaluateUsers:
    def test_academic_research_user_approved(self, spark):
        # user 6: domain univ.edu (6%6=0, academic), research text
        # idx 6%5=1 journalism (research keyword), purpose+interests
        # (6%4=2 ≠ 0), affiliation (6%3=0):
        # leg = 500+200+100 = 800; res = 500+150+100 = 750;
        # risk = 500-100-50 = 350;
        # overall = (800+750+650)*10//3 = 7333 ≥ 7000, risk ≤ 400
        out = UA.evaluate_users(_ev(spark, [6])).collect()[0]
        assert out.email_domain == "univ.edu"
        assert out.legitimacy_centi == 800
        assert out.research_intent_centi == 750
        assert out.risk_centi == 350
        assert out.overall_milli == 7333
        assert out.recommendation == "approve"
        assert out.positive_indicators == "Academic domain detected"

    def test_commercial_user_manual_review(self, spark):
        # user 5: domain corp.com (5%6=5, not academic), text idx 0
        # ('web research...' — research hit), purpose yes (5%4=1),
        # no affiliation (5%3=2):
        # leg 500; res 750; risk 450 → overall (500+750+550)*10//3=6000
        out = UA.evaluate_users(_ev(spark, [5])).collect()[0]
        assert out.legitimacy_centi == 500
        assert out.overall_milli == 6000
        assert out.recommendation == "manual_review"
        assert out.positive_indicators is None

    def test_ac_substring_match(self, spark):
        # '.ac.' must match lab.ac.uk (substring, not suffix — :231-234)
        out = UA.evaluate_users(_ev(spark, [1])).collect()[0]
        assert out.email_domain == "lab.ac.uk"
        assert out.legitimacy_centi >= 700   # academic bonus applied


class TestValidateBulk:
    def test_self_guard_and_status_rules(self, spark):
        # users 50 (superuser/actor), 3 (approved, 3%3=0→wait 3%3=0 →
        # not approved: status falls to pending since 3%9≠0), 9
        # (rejected: 9%3=0 and 9%9=0), 10 (inactive: 10%5=0)
        rows = UA.validate_bulk(_ev(spark, [50, 3, 9, 10])).collect()
        m = {(r.user_id, r.operation): r for r in rows}
        assert len(rows) == 4 * 8
        # actor 50 cannot delete/deactivate/deny itself (:218-224)
        for op in ("delete", "deactivate", "deny"):
            assert m[(50, op)].eligible is False
            assert m[(50, op)].reason == (
                "Cannot perform this operation on your own account")
        # but CAN approve itself? 50%3=2 → approved → already approved
        assert m[(50, "approve")].eligible is False
        assert m[(50, "approve")].reason == "User is already approved"
        # user 3: pending → approve OK, deny OK
        assert m[(3, "approve")].eligible is True
        assert m[(3, "deny")].eligible is True
        # user 9: rejected → deny blocked (:232-235)
        assert m[(9, "deny")].eligible is False
        assert m[(9, "deny")].reason == "User is already rejected"
        # user 10: inactive → deactivate blocked, activate OK
        assert m[(10, "deactivate")].eligible is False
        assert m[(10, "deactivate")].reason == "User is already inactive"
        assert m[(10, "activate")].eligible is True
        # active user 3 (3%5≠0): activate blocked
        assert m[(3, "activate")].eligible is False
        assert m[(3, "activate")].reason == "User is already active"
        # no status rule for role/email ops
        assert m[(9, "assign_role")].eligible is True
        assert m[(10, "verify_email")].eligible is True

    def test_no_superuser_in_corpus(self, spark):
        # no user_id % 50 == 0 → no self-guard rows at all
        rows = UA.validate_bulk(_ev(spark, [3, 9])).collect()
        guarded = [r for r in rows
                   if r.reason.startswith("Cannot perform")]
        assert guarded == []
