"""Contract queries: page access control + audit retention (the last
two deterministic reference service families —
page_access_control.py, audit_retention.py).

Spark side runs ``operators/access.py`` / ``operators/retention.py``;
oracles replay the same fixture synthesis and rule chains in DuckDB
over the driver ``events`` / ``documents`` tables.  The retention
oracle SQL is GENERATED from the same ``RETENTION_RULES`` table the
operator consumes, so the two sides cannot drift.
"""

from __future__ import annotations

from chrono_scraper_spark.operators import access as AC
from chrono_scraper_spark.operators import retention as RT


def _ev(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# -- page access control ------------------------------------------------

def q_accessible_pages(spark, sf_dir):
    """Per-user accessible-page rollup (page_access_control.py:29-86)."""
    ev, docs = _ev(spark, sf_dir), _docs(spark, sf_dir)
    return AC.accessible_pages(AC.projects_fixture(ev),
                               AC.project_pages_fixture(docs))


def q_shared_pages_stats(spark, sf_dir):
    """Per-user shared-page statistics (page_access_control.py:311-354)."""
    ev, docs = _ev(spark, sf_dir), _docs(spark, sf_dir)
    return AC.shared_pages_stats(AC.projects_fixture(ev),
                                 AC.project_pages_fixture(docs))


_ACCESS_CTES = """users AS (SELECT DISTINCT user_id FROM events),
projects AS (
  SELECT user_id * 2 + 1 AS project_id, user_id FROM users
  UNION ALL
  SELECT user_id * 2 + 2, user_id FROM users),
pp_raw AS (
  SELECT doc_id AS page_id, (doc_id * 3) % 300 + 1 AS project_id
  FROM documents
  UNION ALL
  SELECT doc_id, (doc_id * 7 + 1) % 300 + 1 FROM documents
  UNION ALL
  SELECT doc_id,
    CASE WHEN ((doc_id * 3) % 300 + 1) % 2 = 1
         THEN (doc_id * 3) % 300 + 2
         ELSE (doc_id * 3) % 300 END
  FROM documents WHERE doc_id % 4 = 0),
project_pages AS (SELECT DISTINCT page_id, project_id FROM pp_raw)"""

SQL_ACCESSIBLE_PAGES = f"""WITH {_ACCESS_CTES},
rel AS (
  SELECT DISTINCT p.user_id, pp.page_id
  FROM project_pages pp JOIN projects p USING (project_id))
SELECT user_id, CAST(count(*) AS BIGINT) AS n_pages,
  CAST(sum(page_id) AS BIGINT) AS sum_page_ids
FROM rel GROUP BY 1"""

SQL_SHARED_PAGES_STATS = f"""WITH {_ACCESS_CTES},
owned AS (
  SELECT p.user_id, pp.page_id, pp.project_id
  FROM project_pages pp JOIN projects p USING (project_id)),
per_page AS (
  SELECT user_id, page_id,
    count(DISTINCT project_id) AS project_count
  FROM owned GROUP BY 1, 2)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS total_pages,
  CAST(sum(CASE WHEN project_count > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS shared_pages,
  CAST(count(*)
       - sum(CASE WHEN project_count > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS unique_pages,
  round(coalesce(
    CAST(sum(CASE WHEN project_count > 1 THEN project_count END)
         AS DOUBLE)
    / nullif(sum(CASE WHEN project_count > 1 THEN 1 ELSE 0 END), 0),
    0.0), 6) AS avg_projects_per_shared_page,
  round(CAST(sum(CASE WHEN project_count > 1 THEN 1 ELSE 0 END)
             AS DOUBLE)
        / greatest(count(*), 1) * 100, 2) AS sharing_efficiency
FROM per_page GROUP BY 1"""


# -- audit retention ----------------------------------------------------

def q_retention_assign(spark, sf_dir):
    """First-match retention rule per audit log
    (audit_retention.py:263-406, rules :119-243)."""
    return RT.assign_retention(RT.audit_log_fixture(_ev(spark, sf_dir)))


def q_retention_summary(spark, sf_dir):
    """Per-rule archived/deleted rollup (apply_retention_policies
    result grain, audit_retention.py:279-299)."""
    return RT.retention_summary(
        RT.assign_retention(RT.audit_log_fixture(_ev(spark, sf_dir))))


_AUDIT_FIXTURE_CTE = """audit_logs AS (
  SELECT event_id,
    CASE event_type
      WHEN 'error' THEN 'security_event'
      WHEN 'signup' THEN 'user_management'
      WHEN 'purchase' THEN 'content_management'
      WHEN 'click' THEN 'api_access'
      ELSE 'authentication' END AS category,
    CASE WHEN (event_id * 131) % 20 < 2 THEN 'critical'
         WHEN (event_id * 131) % 20 < 7 THEN 'high'
         WHEN (event_id * 131) % 20 < 13 THEN 'medium'
         ELSE 'low' END AS severity,
    CASE event_type
      WHEN 'signup' THEN
        CASE WHEN event_id % 2 = 0 THEN 'user.create'
             ELSE 'user.role.assign' END
      WHEN 'purchase' THEN
        CASE WHEN event_id % 2 = 0 THEN 'data.export'
             ELSE 'content.update' END
      WHEN 'click' THEN 'api.request'
      WHEN 'view' THEN
        CASE WHEN event_id % 2 = 0 THEN 'user.login'
             ELSE 'user.profile.view' END
      ELSE 'security.alert' END AS action,
    (event_id * 7919) % 3000 AS age_days
  FROM events)"""


def _sql_in(vals) -> str:
    return "(" + ", ".join(f"'{v}'" for v in vals) + ")"


def _rule_case(value_for) -> str:
    """CASE chain over RETENTION_RULES in rule order (first match wins;
    permanent rules skipped — they select nothing, reference :344-345)."""
    branches = []
    for name, policy, days, cats, sevs, acts in RT.RETENTION_RULES:
        if days == -1:
            continue
        conds = [f"age_days > {days}"]
        if cats:
            conds.append(f"category IN {_sql_in(cats)}")
        if sevs:
            conds.append(f"severity IN {_sql_in(sevs)}")
        if acts:
            conds.append(f"action IN {_sql_in(acts)}")
        branches.append(f"WHEN {' AND '.join(conds)} "
                        f"THEN '{value_for(name, policy)}'")
    return "CASE " + " ".join(branches)


_RULE_NAME_CASE = _rule_case(lambda n, p: n) + " ELSE 'none' END"
_DISPOSITION_CASE = (_rule_case(
    lambda n, p: "delete" if p == "short_term" else "archive")
    + " ELSE 'retain' END")

SQL_RETENTION_ASSIGN = f"""WITH {_AUDIT_FIXTURE_CTE}
SELECT event_id, category, severity, action,
  CAST(age_days AS BIGINT) AS age_days,
  {_RULE_NAME_CASE} AS rule_name,
  {_DISPOSITION_CASE} AS disposition
FROM audit_logs"""

SQL_RETENTION_SUMMARY = f"""WITH {_AUDIT_FIXTURE_CTE},
assigned AS (
  SELECT {_RULE_NAME_CASE} AS rule_name,
    {_DISPOSITION_CASE} AS disposition
  FROM audit_logs)
SELECT rule_name,
  CAST(sum(CASE WHEN disposition = 'archive' THEN 1 ELSE 0 END)
       AS BIGINT) AS logs_archived,
  CAST(sum(CASE WHEN disposition = 'delete' THEN 1 ELSE 0 END)
       AS BIGINT) AS logs_deleted,
  CAST(count(*) AS BIGINT) AS n_logs
FROM assigned GROUP BY 1"""


QUERIES = {
    "accessible_pages": q_accessible_pages,
    "shared_pages_stats": q_shared_pages_stats,
    "retention_assign": q_retention_assign,
    "retention_summary": q_retention_summary,
}

ORACLES = {
    "accessible_pages": SQL_ACCESSIBLE_PAGES,
    "shared_pages_stats": SQL_SHARED_PAGES_STATS,
    "retention_assign": SQL_RETENTION_ASSIGN,
    "retention_summary": SQL_RETENTION_SUMMARY,
}
