"""Compliance reporting — violation checks vs Python twins.

Reference: compliance_reporting.py:135-262 (requirements), :446-452
(category AND action scoping), :480-514 (completeness, falsy fields),
:516-556 (security incidents), :558-607 (brute force >10 per IP),
:609-658 (retention, category-only scope), :660-688 (confidence).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chrono_scraper_spark.operators import compliance as CP

SF = "/root/testdata/sf0.001"

_LOG_SCHEMA = (
    "event_id long, category string, action string, severity string, "
    "age_days long, user_id long, admin_user_id long, ip_address string, "
    "success boolean, details string, before_values string, "
    "after_values string, resource_type string, archived boolean")


def _row(event_id=1, category="security_event",
         action="unauthorized_access", severity="low", age_days=0,
         user_id=7, admin_user_id=5007, ip_address="10.0.0.1",
         success=True, details="d", before_values="b", after_values="a",
         resource_type="page", archived=False):
    return (event_id, category, action, severity, age_days, user_id,
            admin_user_id, ip_address, success, details, before_values,
            after_values, resource_type, archived)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def logs_pd(spark, events):
    return CP.compliance_log_fixture(events).toPandas()


# -- python twins over the sf0.001 fixture --------------------------------

def _present(row, field):
    """Reference falsiness: not getattr(log, field, None)."""
    if field in CP.ALWAYS_PRESENT:
        return True
    v = row[field]
    return not (v is None or v == 0 or v is False or
                (isinstance(v, float) and v != v))


def _twin_violations(logs_pd):
    """dict(type → set of identity tuples) replicated row-by-row."""
    out = {"incomplete": set(), "security_incident": set(),
           "brute_force": set(), "retention": set()}
    for rid, fw, fields, cats, acts, days in CP.COMPLIANCE_REQUIREMENTS:
        scoped = logs_pd[logs_pd.category.isin(cats)
                         & logs_pd.action.isin(acts)]
        for _, r in scoped.iterrows():
            missing = [f for f in fields if not _present(r, f)]
            if missing:
                out["incomplete"].add(
                    (rid, int(r.event_id), ",".join(missing)))
            if (r.category == "security_event"
                    and r.severity in ("high", "critical")):
                out["security_incident"].add((rid, int(r.event_id)))
        failed = scoped[(scoped.action == "user_login_failed")
                        & scoped.ip_address.notna()]
        for ip, n in failed.groupby("ip_address").size().items():
            if n > 10:
                out["brute_force"].add((rid, ip, int(n)))
        stale = logs_pd[logs_pd.category.isin(cats)
                        & (logs_pd.age_days > days)
                        & ~logs_pd.archived]
        if len(stale):
            out["retention"].add((rid, len(stale)))
    return out


def test_violations_match_python_twin(spark, events, logs_pd):
    got = CP.compliance_violations(
        CP.compliance_log_fixture(events),
        CP.requirements_dim(spark)).collect()
    twin = _twin_violations(logs_pd)
    assert {(r.requirement_id, r.event_id, r.missing_fields)
            for r in got if r.violation_type == "incomplete"} \
        == twin["incomplete"]
    assert {(r.requirement_id, r.event_id)
            for r in got if r.violation_type == "security_incident"} \
        == twin["security_incident"]
    g_bf = {(r.requirement_id, r.ip_address, r.n_affected)
            for r in got if r.violation_type == "brute_force"}
    assert g_bf == twin["brute_force"]
    assert g_bf, "brute-force threshold must fire at sf0.001"
    g_rt = {(r.requirement_id, r.n_affected)
            for r in got if r.violation_type == "retention"}
    assert g_rt == twin["retention"] and len(g_rt) == 7


def test_brute_force_threshold_decides_both_ways(logs_pd):
    """The planted IP skew must leave the >10 cutoff decidable at
    sf0.001: at least one IP above, at least one at-or-below."""
    failed = logs_pd[(logs_pd.action == "user_login_failed")
                     & logs_pd.ip_address.notna()]
    counts = failed.groupby("ip_address").size()
    assert (counts > 10).any() and (counts <= 10).any()


def test_status_confidence_formula(spark, events, logs_pd):
    status = {r.requirement_id: r for r in CP.compliance_status(
        CP.compliance_log_fixture(events),
        CP.requirements_dim(spark)).collect()}
    twin = _twin_violations(logs_pd)
    for rid, fw, fields, cats, acts, days in CP.COMPLIANCE_REQUIREMENTS:
        scoped = logs_pd[logs_pd.category.isin(cats)
                         & logs_pd.action.isin(acts)]
        nv = sum(1 for vs in twin.values() for v in vs if v[0] == rid)
        complete = sum(1 for _, r in scoped.iterrows()
                       if all(_present(r, f) for f in fields))
        s = status[rid]
        assert s.assessed_records == len(scoped)
        assert s.violations_found == nv
        assert s.compliant == (nv == 0)
        want = (0.0 if not len(scoped) else
                round(max(0.0, complete / len(scoped)
                          - min(0.1 * nv, 0.5)) * 100, 2))
        assert abs(s.confidence_score - want) < 1e-9, rid


def test_success_false_counts_as_missing(spark):
    """Reference :491-492 uses `not getattr(log, field, None)` — a
    False boolean is a MISSING mandatory field."""
    df = spark.createDataFrame(
        [_row(category="authentication", action="user_login_failed",
              success=False)], _LOG_SCHEMA)
    got = {(r.requirement_id, r.missing_fields)
           for r in CP.compliance_violations(
               df, CP.requirements_dim(spark))
           .filter(F.col("violation_type") == "incomplete").collect()}
    # GDPR-32 and HIPAA-164.312 both scope this log; both list success
    assert got == {("GDPR-ART-32", "success"),
                   ("HIPAA-164.312", "success")}


def test_compliant_true_and_zero_assessed_paths(spark):
    """A clean scoped log → compliant with confidence 100; a
    requirement with no scoped logs → confidence 0.0 (reference
    :676-677) and vacuously compliant."""
    df = spark.createDataFrame(
        [_row(category="user_management", action="user_create",
              severity="low", age_days=10)], _LOG_SCHEMA)
    status = {r.requirement_id: r for r in CP.compliance_status(
        df, CP.requirements_dim(spark)).collect()}
    assert len(status) == 7
    s30 = status["GDPR-ART-30"]
    assert s30.compliant and s30.confidence_score == 100.0
    s33 = status["GDPR-ART-33"]  # security_event scope: nothing matches
    assert s33.assessed_records == 0
    assert s33.compliant and s33.confidence_score == 0.0


def test_missing_fields_preserve_requirement_order(spark):
    """missing_fields joins in mandatory_fields order (:489-493)."""
    df = spark.createDataFrame(
        [_row(category="user_management", action="user_create",
              user_id=None, ip_address=None)], _LOG_SCHEMA)
    rows = CP.compliance_violations(df, CP.requirements_dim(spark)) \
             .filter(F.col("violation_type") == "incomplete").collect()
    assert [r.missing_fields for r in rows] == ["user_id,ip_address"]


def test_retention_scopes_categories_only(spark):
    """The retention check ignores the action filter (:625-633): an
    out-of-action-scope log still counts when its category matches."""
    df = spark.createDataFrame(
        [_row(category="user_management", action="api_request",
              age_days=2999)], _LOG_SCHEMA)
    got = {(r.requirement_id, r.n_affected)
           for r in CP.compliance_violations(
               df, CP.requirements_dim(spark))
           .filter(F.col("violation_type") == "retention").collect()}
    # every requirement whose categories include user_management and
    # whose cutoff is below 2999
    want = {(rid, 1) for rid, fw, flds, cats, acts, days
            in CP.COMPLIANCE_REQUIREMENTS
            if "user_management" in cats and days < 2999}
    assert got == want and len(want) >= 4


def test_archived_logs_never_stale(spark):
    df = spark.createDataFrame(
        [_row(category="user_management", action="api_request",
              age_days=2999, archived=True)], _LOG_SCHEMA)
    assert CP.compliance_violations(df, CP.requirements_dim(spark)) \
             .filter(F.col("violation_type") == "retention").count() == 0


def test_requirements_join_is_broadcast(spark, events):
    plan = CP.compliance_violations(
        CP.compliance_log_fixture(events),
        CP.requirements_dim(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
