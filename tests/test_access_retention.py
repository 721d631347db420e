"""Page access control + audit retention — semantics vs Python twins.

Reference: page_access_control.py:29-86,311-354; audit_retention.py:
72-84 (matches_log), 119-243 (rules), 263-406 (sequential first-match
application, permanent rules select nothing, SHORT_TERM deletes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chrono_scraper_spark.operators import access as AC
from chrono_scraper_spark.operators import retention as RT

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


# -- python twins -------------------------------------------------------

def _twin_rule(cat, sev, act, age):
    for name, policy, days, cats, sevs, acts in RT.RETENTION_RULES:
        if days == -1:
            continue
        if age <= days:
            continue
        if cats and cat not in cats:
            continue
        if sevs and sev not in sevs:
            continue
        if acts and act not in acts:
            continue
        return name, ("delete" if policy == "short_term" else "archive")
    return "none", "retain"


def test_assignment_matches_python_twin(spark, events):
    rows = RT.assign_retention(RT.audit_log_fixture(events)).collect()
    assert rows
    for r in rows:
        name, disp = _twin_rule(r.category, r.severity, r.action,
                                r.age_days)
        assert (r.rule_name, r.disposition) == (name, disp), r


def test_every_finite_rule_decides_rows(spark, events):
    got = {r.rule_name for r in
           RT.assign_retention(RT.audit_log_fixture(events))
             .select("rule_name").distinct().collect()}
    finite = {n for n, _, d, *_ in RT.RETENTION_RULES if d != -1}
    assert finite <= got, finite - got
    assert "none" in got


def test_permanent_rule_protects_critical_security(spark, events):
    """Critical security_event logs match only the permanent rule's
    filters — they must come out 'retain' at ANY age (reference
    :344-345: permanent returns before selecting; no later rule's
    category list contains security_event)."""
    out = (RT.assign_retention(RT.audit_log_fixture(events))
           .filter((F.col("category") == "security_event")
                   & (F.col("severity") == "critical")
                   & (F.col("age_days") > 2555)))
    rows = out.collect()
    assert rows, "fixture must plant old critical security events"
    assert all(r.disposition == "retain" for r in rows)


def test_short_term_deletes_archive_elsewhere(spark, events):
    summ = {r.rule_name: r for r in
            RT.retention_summary(
                RT.assign_retention(
                    RT.audit_log_fixture(events))).collect()}
    st = summ["short_term_operational"]
    assert st.logs_deleted > 0 and st.logs_archived == 0
    for name in ("sox_compliance", "hipaa_compliance",
                 "gdpr_compliance", "standard_business"):
        assert summ[name].logs_archived > 0, name
        assert summ[name].logs_deleted == 0, name


def test_age_boundary_is_strict(spark):  # noqa: ARG001
    """created_at < now - days ⇔ age_days > days: a log aged exactly
    retention_days is NOT yet eligible."""
    rows = [(1, "api_access", "low", "api.request", 90),
            (2, "api_access", "low", "api.request", 91)]
    df = spark.createDataFrame(
        rows, "event_id long, category string, severity string, "
              "action string, age_days long")
    out = {r.event_id: r.disposition
           for r in RT.assign_retention(df).collect()}
    assert out == {1: "retain", 2: "delete"}


# -- access control -----------------------------------------------------

def _twin_access(events_rows, doc_ids, n_projects=300):
    owner = {}
    for u in {r.user_id for r in events_rows}:
        owner[u * 2 + 1] = u
        owner[u * 2 + 2] = u
    pp = set()
    for d in doc_ids:
        m1 = (d * 3) % n_projects + 1
        pp.add((d, m1))
        pp.add((d, (d * 7 + 1) % n_projects + 1))
        if d % 4 == 0:
            pp.add((d, m1 + 1 if m1 % 2 == 1 else m1 - 1))
    acc = {}
    for page, proj in pp:
        if proj in owner:
            acc.setdefault(owner[proj], {}).setdefault(page, set()).add(proj)
    return acc


def test_accessible_pages_matches_twin(spark, events, docs):
    acc = _twin_access(events.select("user_id").distinct().collect(),
                       [r.doc_id for r in docs.select("doc_id").collect()])
    got = {r.user_id: (r.n_pages, r.sum_page_ids)
           for r in AC.accessible_pages(
               AC.projects_fixture(events),
               AC.project_pages_fixture(docs)).collect()}
    want = {u: (len(pages), sum(pages)) for u, pages in acc.items()}
    assert got == want


def test_shared_pages_stats_matches_twin(spark, events, docs):
    acc = _twin_access(events.select("user_id").distinct().collect(),
                       [r.doc_id for r in docs.select("doc_id").collect()])
    rows = AC.shared_pages_stats(AC.projects_fixture(events),
                                 AC.project_pages_fixture(docs)).collect()
    assert rows
    any_shared = False
    for r in rows:
        pages = acc[r.user_id]
        shared = {p: ps for p, ps in pages.items() if len(ps) > 1}
        assert r.total_pages == len(pages)
        assert r.shared_pages == len(shared)
        assert r.unique_pages == len(pages) - len(shared)
        if shared:
            any_shared = True
            avg = sum(len(ps) for ps in shared.values()) / len(shared)
            assert abs(r.avg_projects_per_shared_page - avg) < 1e-6
        eff = round(len(shared) / max(len(pages), 1) * 100, 2)
        assert abs(r.sharing_efficiency - eff) < 1e-9
    assert any_shared, "fixture must plant same-user shared pages"


def test_access_join_is_broadcast(spark, events, docs):
    plan = AC.accessible_pages(
        AC.projects_fixture(events),
        AC.project_pages_fixture(docs))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
