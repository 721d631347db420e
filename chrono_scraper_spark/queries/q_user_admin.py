"""Contract queries: user-registration evaluation + bulk-operation
validation (user_evaluation_service.py fallback heuristic,
bulk_operations.py eligibility rules).

Spark side is ``operators/user_admin.py``; oracles replay the planted
profile derivation and the centi/milli arithmetic in DuckDB over the
driver ``events`` table.
"""

from __future__ import annotations

from chrono_scraper_spark.operators import user_admin as UA


def _ev(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_user_evaluation(spark, sf_dir):
    """Fallback registration evaluation
    (user_evaluation_service.py:220-273)."""
    return UA.evaluate_users(_ev(spark, sf_dir))


def q_bulk_validate(spark, sf_dir):
    """Per (user, operation) bulk eligibility
    (bulk_operations.py:201-250)."""
    return UA.validate_bulk(_ev(spark, sf_dir))


_USERS_CTES = """uids AS (SELECT DISTINCT user_id FROM events),
prof AS (
  SELECT user_id,
    ['univ.edu', 'lab.ac.uk', 'agency.gov', 'nonprofit.org',
     'gmail.com', 'corp.com'][CAST(user_id % 6 + 1 AS INT)]
      AS email_domain,
    ['web research and archive analysis', 'journalism fact checking',
     'marketing growth hacking', '', 'osint study of public records']
     [CAST(user_id % 5 + 1 AS INT)] AS research_text,
    user_id % 4 <> 0 AS has_purpose_and_interests,
    user_id % 3 = 0 AS has_affiliation,
    CASE WHEN user_id % 3 <> 0 THEN 'approved'
         WHEN user_id % 9 = 0 THEN 'rejected'
         ELSE 'pending' END AS approval_status,
    user_id % 5 <> 0 AS is_active
  FROM uids)"""


SQL_USER_EVALUATION = f"""WITH {_USERS_CTES},
flags AS (
  SELECT *,
    len(list_filter(['.edu', '.ac.', '.gov', '.org'],
        d -> contains(email_domain, d))) > 0 AS academic,
    len(list_filter(['research', 'academic', 'study', 'analysis',
                     'investigation', 'journalism', 'osint'],
        k -> contains(lower(research_text), k))) > 0 AS research
  FROM prof),
sc AS (
  SELECT user_id, email_domain, academic,
    CAST(least(greatest(
      500 + CASE WHEN academic THEN 200 ELSE 0 END
          + CASE WHEN has_affiliation THEN 100 ELSE 0 END, 0), 1000)
      AS BIGINT) AS legitimacy_centi,
    CAST(least(greatest(
      500 + CASE WHEN research THEN 150 ELSE 0 END
          + CASE WHEN has_purpose_and_interests THEN 100 ELSE 0 END,
      0), 1000) AS BIGINT) AS research_intent_centi,
    CAST(least(greatest(
      500 - CASE WHEN academic THEN 100 ELSE 0 END
          - CASE WHEN research THEN 50 ELSE 0 END, 0), 1000)
      AS BIGINT) AS risk_centi
  FROM flags),
ov AS (
  SELECT *,
    (legitimacy_centi + research_intent_centi + (1000 - risk_centi))
      * 10 // 3 AS overall
  FROM sc)
SELECT user_id, email_domain, legitimacy_centi, research_intent_centi,
  risk_centi,
  least(greatest(overall, 0), 10000) AS overall_milli,
  CASE WHEN overall >= 7000 AND risk_centi <= 400 THEN 'approve'
       WHEN overall <= 4000 OR risk_centi >= 700 THEN 'deny'
       ELSE 'manual_review' END AS recommendation,
  CASE WHEN academic THEN 'Academic domain detected' END
    AS positive_indicators,
  CAST(600 AS BIGINT) AS confidence_milli
FROM ov"""


SQL_BULK_VALIDATE = f"""WITH {_USERS_CTES},
actor AS (
  SELECT min(user_id) AS actor_id FROM uids WHERE user_id % 50 = 0),
fan AS (
  SELECT p.*, a.actor_id, op.operation
  FROM prof p CROSS JOIN actor a
  CROSS JOIN (SELECT unnest(['approve', 'deny', 'activate',
                             'deactivate', 'delete', 'assign_role',
                             'verify_email', 'unverify_email'])
              AS operation) op),
r AS (
  SELECT user_id, operation,
    CASE WHEN user_id = actor_id
              AND operation IN ('delete', 'deactivate', 'deny')
         THEN 'Cannot perform this operation on your own account'
         WHEN operation = 'approve' AND approval_status = 'approved'
         THEN 'User is already approved'
         WHEN operation = 'deny' AND approval_status = 'rejected'
         THEN 'User is already rejected'
         WHEN operation = 'activate' AND is_active
         THEN 'User is already active'
         WHEN operation = 'deactivate' AND NOT is_active
         THEN 'User is already inactive'
    END AS reason
  FROM fan)
SELECT user_id, operation, reason IS NULL AS eligible,
  coalesce(reason, '') AS reason
FROM r"""


QUERIES = {
    "user_evaluation": q_user_evaluation,
    "bulk_validate": q_bulk_validate,
}

ORACLES = {
    "user_evaluation": SQL_USER_EVALUATION,
    "bulk_validate": SQL_BULK_VALIDATE,
}
