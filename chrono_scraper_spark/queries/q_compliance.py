"""Contract queries: compliance reporting (compliance_reporting.py).

Spark side is ``operators/compliance.py``; the DuckDB oracles replay
the same audit-log fixture and all four violation checks.  The oracle
SQL is GENERATED from the same ``COMPLIANCE_REQUIREMENTS`` literal the
operator consumes (one block per requirement), so the two sides cannot
drift on scope lists, mandatory-field order, or retention cutoffs.
"""

from __future__ import annotations

from chrono_scraper_spark.operators import compliance as CP


def _logs(spark, sf_dir):
    return CP.compliance_log_fixture(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_compliance_violations(spark, sf_dir):
    """All violations across the 7 requirements
    (compliance_reporting.py:480-658)."""
    return CP.compliance_violations(_logs(spark, sf_dir),
                                    CP.requirements_dim(spark))


def q_compliance_status(spark, sf_dir):
    """Per-requirement assessment (compliance_reporting.py:460-479)."""
    return CP.compliance_status(_logs(spark, sf_dir),
                                CP.requirements_dim(spark))


def q_compliance_score(spark, sf_dir):
    """Per-framework executive rollup (compliance_reporting.py:368-400)."""
    return CP.compliance_score(
        CP.compliance_status(_logs(spark, sf_dir),
                             CP.requirements_dim(spark)))


# -- generated oracle SQL ------------------------------------------------

_LOGS_CTE = """logs AS (
  SELECT event_id,
    CASE event_type
      WHEN 'error' THEN 'security_event'
      WHEN 'signup' THEN 'user_management'
      WHEN 'purchase' THEN CASE WHEN event_id % 2 = 0
        THEN 'system_config' ELSE 'user_management' END
      WHEN 'click' THEN 'api_access'
      ELSE 'authentication' END AS category,
    CASE event_type
      WHEN 'error' THEN CASE event_id % 3
        WHEN 0 THEN 'unauthorized_access' WHEN 1 THEN 'breach_attempt'
        ELSE 'security_vulnerability_detected' END
      WHEN 'signup' THEN CASE event_id % 3
        WHEN 0 THEN 'user_create' WHEN 1 THEN 'user_role_assign'
        ELSE 'user_permission_grant' END
      WHEN 'purchase' THEN CASE WHEN event_id % 2 = 0
        THEN 'system_config_update' ELSE 'gdpr_data_export' END
      WHEN 'click' THEN 'api_request'
      ELSE CASE event_id % 4
        WHEN 0 THEN 'user_login' WHEN 1 THEN 'user_login_failed'
        WHEN 2 THEN 'data_export' ELSE 'user_profile_view' END
    END AS action,
    CASE WHEN (event_id * 131) % 20 < 2 THEN 'critical'
         WHEN (event_id * 131) % 20 < 7 THEN 'high'
         WHEN (event_id * 131) % 20 < 13 THEN 'medium'
         ELSE 'low' END AS severity,
    (event_id * 7919) % 3000 AS age_days,
    CASE WHEN (event_id * 17) % 19 = 0 THEN NULL
         ELSE user_id END AS user_id,
    CASE WHEN (event_id * 11) % 4 = 0 THEN NULL
         ELSE user_id + 5000 END AS admin_user_id,
    CASE WHEN (event_id * 23) % 17 = 0 THEN NULL
         WHEN event_id % 3 = 0 THEN '10.0.0.1'
         ELSE concat('10.0.1.', CAST((event_id * 13) % 64 AS VARCHAR))
    END AS ip_address,
    (event_id * 29) % 10 <> 0 AS success,
    CASE WHEN (event_id * 31) % 7 = 0 THEN NULL ELSE 'd' END AS details,
    CASE WHEN (event_id * 41) % 5 = 0 THEN NULL ELSE 'b' END
      AS before_values,
    CASE WHEN (event_id * 43) % 6 = 0 THEN NULL ELSE 'a' END
      AS after_values,
    CASE WHEN (event_id * 47) % 9 = 0 THEN NULL ELSE 'page' END
      AS resource_type,
    (event_id * 37) % 5 = 0 AS archived
  FROM events)"""

#: SQL presence predicate per mandatory field — the reference's
#: falsiness check (NULL / 0 / False all missing).
_PRESENT_SQL = {
    "user_id": "(user_id IS NOT NULL AND user_id <> 0)",
    "admin_user_id": "admin_user_id IS NOT NULL",
    "ip_address": "ip_address IS NOT NULL",
    "success": "success",
    "details": "details IS NOT NULL",
    "before_values": "before_values IS NOT NULL",
    "after_values": "after_values IS NOT NULL",
    "resource_type": "resource_type IS NOT NULL",
}


def _in(vals) -> str:
    return "(" + ", ".join(f"'{v}'" for v in vals) + ")"


def _scope(cats, acts) -> str:
    return f"category IN {_in(cats)} AND action IN {_in(acts)}"


def _checkable(fields):
    return [f for f in fields if f not in CP.ALWAYS_PRESENT]


def _all_present(fields) -> str:
    parts = [_PRESENT_SQL[f] for f in _checkable(fields)]
    return " AND ".join(parts) if parts else "TRUE"


def _violation_blocks() -> list[str]:
    blocks = []
    first = True
    for rid, fw, fields, cats, acts, days in CP.COMPLIANCE_REQUIREMENTS:
        # aliases only on the first UNION branch
        def a(name):
            return f" AS {name}" if first else ""
        missing_parts = ", ".join(
            f"CASE WHEN NOT {_PRESENT_SQL[f]} THEN '{f}' END"
            for f in _checkable(fields))
        scope = _scope(cats, acts)
        blocks.append(f"""SELECT '{rid}'{a('requirement_id')},
 '{fw}'{a('framework')}, 'incomplete'{a('violation_type')},
 'medium'{a('severity')}, event_id{a('event_id')},
 CAST(NULL AS VARCHAR){a('ip_address')},
 concat_ws(',', {missing_parts}){a('missing_fields')},
 CAST(1 AS BIGINT){a('n_affected')}
FROM logs WHERE {scope} AND NOT ({_all_present(fields)})""")
        first = False
        blocks.append(f"""SELECT '{rid}', '{fw}', 'security_incident',
 CASE WHEN severity = 'high' THEN 'high' ELSE 'critical' END,
 event_id, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
 CAST(1 AS BIGINT)
FROM logs WHERE {scope} AND category = 'security_event'
  AND severity IN ('high', 'critical')""")
        blocks.append(f"""SELECT '{rid}', '{fw}', 'brute_force', 'high',
 CAST(NULL AS BIGINT), ip_address, CAST(NULL AS VARCHAR),
 CAST(count(*) AS BIGINT)
FROM logs WHERE {scope} AND action = 'user_login_failed'
  AND ip_address IS NOT NULL
GROUP BY ip_address HAVING count(*) > 10""")
        blocks.append(f"""SELECT '{rid}', '{fw}', 'retention', 'medium',
 CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
 CAST(count(*) AS BIGINT)
FROM logs WHERE category IN {_in(cats)} AND age_days > {days}
  AND NOT archived
HAVING count(*) > 0""")
    return blocks


_VIOLATIONS_UNION = "\nUNION ALL\n".join(_violation_blocks())

SQL_COMPLIANCE_VIOLATIONS = f"""WITH {_LOGS_CTE}
{_VIOLATIONS_UNION}"""

_SCOPED_UNION = "\nUNION ALL\n".join(
    f"""SELECT '{rid}'{' AS requirement_id' if i == 0 else ''},
 '{fw}'{' AS framework' if i == 0 else ''},
 count(*){' AS assessed' if i == 0 else ''},
 sum(CASE WHEN {_all_present(fields)} THEN 1 ELSE 0 END)
   {' AS complete' if i == 0 else ''}
FROM logs WHERE {_scope(cats, acts)}"""
    for i, (rid, fw, fields, cats, acts, days)
    in enumerate(CP.COMPLIANCE_REQUIREMENTS))

_STATUS_BODY = f"""viol AS (
{_VIOLATIONS_UNION}),
scoped AS (
{_SCOPED_UNION}),
vc AS (SELECT requirement_id, count(*) AS n FROM viol GROUP BY 1)
SELECT s.requirement_id, s.framework,
  CAST(s.assessed AS BIGINT) AS assessed_records,
  CAST(coalesce(vc.n, 0) AS BIGINT) AS violations_found,
  coalesce(vc.n, 0) = 0 AS compliant,
  CASE WHEN s.assessed = 0 THEN 0.0
    ELSE round(greatest(0.0,
      CAST(s.complete AS DOUBLE) / s.assessed
      - least(0.1 * coalesce(vc.n, 0), 0.5)) * 100, 2)
  END AS confidence_score
FROM scoped s LEFT JOIN vc USING (requirement_id)"""

SQL_COMPLIANCE_STATUS = f"""WITH {_LOGS_CTE},
{_STATUS_BODY}"""

SQL_COMPLIANCE_SCORE = f"""WITH {_LOGS_CTE},
status AS (
WITH {_STATUS_BODY})
SELECT framework,
  CAST(count(*) AS BIGINT) AS total_requirements,
  CAST(sum(CASE WHEN compliant THEN 1 ELSE 0 END) AS BIGINT)
    AS compliant_requirements,
  CAST(sum(violations_found) AS BIGINT) AS violation_count,
  round(CAST(sum(CASE WHEN compliant THEN 1 ELSE 0 END) AS DOUBLE)
        / count(*) * 100, 2) AS compliance_score
FROM status GROUP BY 1"""


QUERIES = {
    "compliance_violations": q_compliance_violations,
    "compliance_status": q_compliance_status,
    "compliance_score": q_compliance_score,
}

ORACLES = {
    "compliance_violations": SQL_COMPLIANCE_VIOLATIONS,
    "compliance_status": SQL_COMPLIANCE_STATUS,
    "compliance_score": SQL_COMPLIANCE_SCORE,
}
