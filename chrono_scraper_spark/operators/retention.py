"""Audit-log retention policy assignment — the audit-retention family.

Reference semantics (backend/app/services/audit_retention.py):

- ``_init_retention_rules`` (:119-243) defines six rules IN ORDER:
  critical_security (permanent, retention_days=-1), sox_compliance
  (2555d), hipaa_compliance (2190d), gdpr_compliance (1095d),
  standard_business (365d), short_term_operational (90d).  Each rule
  filters on category / severity / action lists; an EMPTY list means
  "no constraint" (``matches_log``, :72-84).
- ``apply_retention_policies`` (:263-326) iterates the rules in order;
  ``_apply_retention_rule`` (:327-406) selects logs older than
  ``now - retention_days`` that are not yet archived, then archives
  them (``_mark_logs_archived``) — or DELETES them when the rule's
  policy is SHORT_TERM (:388-396).  Because earlier rules mark their
  logs ``archived=True`` before later rules run, the effective
  semantics are FIRST-MATCH in rule order.  A permanent rule
  (retention_days == -1) returns before selecting anything (:344-345),
  so its logs fall through to later rules (none of which match the
  security_event category — the critical-security logs are therefore
  retained forever by construction).
- Reference bug, not replicated: the eligibility predicate
  ``AuditLog.archived is False`` (:353) is a Python identity test on a
  SQLAlchemy column — always False — so the shipped query matches no
  rows.  This module implements the documented intent
  (``archived == False`` i.e. first-match over unarchived logs).

Spark shape: the rule table is static, so assignment is a single
``F.when`` chain — a zero-shuffle codegen projection over the log
table; the summary is one map-side-partial groupBy on rule_name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, policy, retention_days, categories, severities, actions)
# — verbatim parameters from audit_retention.py:119-243; -1 = permanent.
RETENTION_RULES = [
    ("critical_security", "permanent", -1,
     ["security_event"], ["critical"], []),
    ("sox_compliance", "compliance", 2555,
     ["user_management", "system_config"], ["high", "critical"],
     ["user.role.assign", "user.permission.grant",
      "system.config.update", "admin.login"]),
    ("hipaa_compliance", "hipaa", 2190,
     ["content_management", "data_export"], [],
     ["user.profile.view", "data.export", "gdpr.data.export"]),
    ("gdpr_compliance", "gdpr", 1095,
     ["user_management", "compliance"], [],
     ["user.create", "user.update", "user.delete", "gdpr.request",
      "gdpr.data.export", "gdpr.data.deletion"]),
    ("standard_business", "standard", 365,
     ["content_management", "api_access", "bulk_operation"],
     ["medium", "high"], []),
    ("short_term_operational", "short_term", 90,
     ["api_access", "authentication"], ["low", "medium"],
     ["api.request", "user.login", "user.logout"]),
]


def audit_log_fixture(events: DataFrame) -> DataFrame:
    """Deterministic audit-log table derived from the driver events table.

    Maps each event onto the reference AuditLog grain
    (category / severity / action / age): event_type picks the
    category and action family, a hash of event_id buckets severity
    (10% critical / 25% high / 30% medium / 35% low — sf-independent,
    unlike the value column whose range scales with sf), and a planted
    age spread ``(event_id * 7919) % 3000`` days makes every rule's
    cutoff (90d … 7y) decide rows.
    """
    et = F.col("event_type")
    even = F.col("event_id") % 2 == 0
    sev_h = (F.col("event_id") * 131) % 20
    return events.select(
        "event_id",
        F.when(et == "error", "security_event")
         .when(et == "signup", "user_management")
         .when(et == "purchase", "content_management")
         .when(et == "click", "api_access")
         .otherwise("authentication").alias("category"),
        F.when(sev_h < 2, "critical")
         .when(sev_h < 7, "high")
         .when(sev_h < 13, "medium")
         .otherwise("low").alias("severity"),
        F.when(et == "signup",
               F.when(even, "user.create").otherwise("user.role.assign"))
         .when(et == "purchase",
               F.when(even, "data.export").otherwise("content.update"))
         .when(et == "click", "api.request")
         .when(et == "view",
               F.when(even, "user.login").otherwise("user.profile.view"))
         .otherwise("security.alert").alias("action"),
        ((F.col("event_id") * 7919) % 3000).alias("age_days"),
    )


def assign_retention(logs: DataFrame) -> DataFrame:
    """First-match rule assignment per audit log.

    Returns (event_id, category, severity, action, age_days, rule_name,
    disposition) with disposition 'delete' for the SHORT_TERM rule,
    'archive' for other finite rules, 'retain' when no finite rule
    claims the log.  Permanent rules claim nothing (reference :344-345).
    """
    # A chained F.when evaluates branches in order — first match wins,
    # which IS the reference's sequential mark-as-archived semantics.
    rule_col = disp_col = None
    for name, policy, days, cats, sevs, acts in RETENTION_RULES:
        if days == -1:
            continue  # permanent: selects nothing, logs fall through
        cond = F.col("age_days") > F.lit(days)
        if cats:
            cond = cond & F.col("category").isin(cats)
        if sevs:
            cond = cond & F.col("severity").isin(sevs)
        if acts:
            cond = cond & F.col("action").isin(acts)
        disp = "delete" if policy == "short_term" else "archive"
        rule_col = (F.when if rule_col is None else rule_col.when)(
            cond, F.lit(name))
        disp_col = (F.when if disp_col is None else disp_col.when)(
            cond, F.lit(disp))
    return logs.select(
        "event_id", "category", "severity", "action", "age_days",
        rule_col.otherwise("none").alias("rule_name"),
        disp_col.otherwise("retain").alias("disposition"),
    )


def retention_summary(assigned: DataFrame) -> DataFrame:
    """Per-rule application summary (apply_retention_policies result
    grain: logs_archived / logs_deleted per rule, :279-299)."""
    return (assigned
            .groupBy("rule_name", "disposition")
            .agg(F.count("*").alias("n_logs"))
            .groupBy("rule_name")
            .agg(F.sum(F.when(F.col("disposition") == "archive",
                              F.col("n_logs")).otherwise(0))
                  .cast("long").alias("logs_archived"),
                 F.sum(F.when(F.col("disposition") == "delete",
                              F.col("n_logs")).otherwise(0))
                  .cast("long").alias("logs_deleted"),
                 F.sum("n_logs").cast("long").alias("n_logs")))
