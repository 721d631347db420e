"""Compliance reporting — framework requirements assessed over audit logs.

Reference semantics (backend/app/services/compliance_reporting.py):

- ``_init_compliance_requirements`` (:135-262) defines seven requirements
  across three frameworks (GDPR arts. 30/32/33, SOX 302/404, HIPAA
  164.312/164.308).  Each scopes the audit log by ``audit_categories``
  AND ``audit_actions`` (both applied as IN-filters when non-empty,
  :446-452) and carries ``mandatory_fields`` + ``retention_period_days``.
- ``_assess_compliance_requirement`` (:428-479) runs four violation
  checks over the scoped logs:
  * data completeness (:480-514): one violation per log with any falsy
    mandatory field (``not getattr(log, field, None)`` — note a
    ``success=False`` boolean counts as MISSING; replicated faithfully);
  * security incidents (:516-556): one per scoped log with
    category=security_event and severity high/critical (violation
    severity mirrors the log's);
  * access controls (:558-607): failed-login logs grouped by IP; >10
    failures from one IP is a brute-force violation (n_affected = the
    failure count);
  * retention (:609-658): logs older than the requirement's retention
    period and not archived — scoped by categories ONLY (the reference
    builds a fresh query without the action filter, :625-633); at most
    one violation per requirement, n_affected = the stale count.
    Reference bug, not replicated: ``AuditLog.archived is False`` (:628)
    is a Python identity test (always False → matches nothing); we
    implement the documented intent ``archived == False``.  A second
    reference bug: GDPR-ART-33 names ``AuditActions.DATA_BREACH_ATTEMPT``
    (:183) which only exists on audit_alerts.AlertType (:47); we use its
    string value "data_breach_attempt".
- compliance status (:460-479): per requirement, compliant = zero
  violations; confidence (:660-688) = max(0, complete_records/assessed
  - min(0.1*violations, 0.5)) * 100, 0.0 when nothing was assessed.
- framework score (:368-370): compliant_requirements / total * 100.

Spark shape: the requirement table is a 7-row broadcast dim joined to
the log table with array_contains membership (BroadcastNestedLoopJoin
— no log shuffle); completeness/security violations are per-row
projections off that join, brute-force is one groupBy (req, ip),
retention one groupBy (req).  At 10^10 logs the only exchanges are
those two map-side-combinable aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (requirement_id, framework, mandatory_fields, categories, actions,
#  retention_period_days) — verbatim from compliance_reporting.py:135-262
# with AuditActions/AuditCategory literals from models/audit_log.py.
COMPLIANCE_REQUIREMENTS = [
    ("GDPR-ART-30", "gdpr",
     ["user_id", "action", "created_at", "ip_address"],
     ["user_management", "compliance"],
     ["user_create", "user_update", "user_delete", "gdpr_request",
      "gdpr_data_export", "gdpr_data_deletion"], 1095),
    ("GDPR-ART-32", "gdpr",
     ["user_id", "action", "success", "ip_address"],
     ["security_event", "authentication"],
     ["user_login_failed", "unauthorized_access",
      "security_vulnerability_detected"], 2190),
    ("GDPR-ART-33", "gdpr",
     ["user_id", "action", "severity", "details"],
     ["security_event"],
     ["breach_attempt", "data_breach_attempt", "unauthorized_access"],
     2190),
    ("SOX-302", "sox",
     ["admin_user_id", "action", "created_at", "success"],
     ["system_config", "user_management"],
     ["system_config_update", "user_role_assign",
      "user_permission_grant", "admin_login"], 2555),
    ("SOX-404", "sox",
     ["admin_user_id", "action", "before_values", "after_values"],
     ["system_config", "user_management"],
     ["system_config_update", "user_role_assign",
      "user_permission_grant", "bulk_user_role_assign"], 2555),
    ("HIPAA-164.312", "hipaa",
     ["user_id", "action", "ip_address", "success"],
     ["authentication", "security_event"],
     ["user_login", "user_login_failed", "user_profile_view",
      "data_export"], 2190),
    ("HIPAA-164.308", "hipaa",
     ["admin_user_id", "action", "resource_type"],
     ["user_management", "system_config"],
     ["user_role_assign", "user_permission_grant",
      "system_config_update"], 2190),
]

#: fields whose fixture presence is constant (never falsy): timestamps
#: and the always-populated enum columns.
ALWAYS_PRESENT = {"action", "created_at", "severity"}


def compliance_log_fixture(events: DataFrame) -> DataFrame:
    """Deterministic AuditLog-grain fixture from the driver events table.

    Same severity/age formulas as ``retention.audit_log_fixture`` but a
    richer action vocabulary (the reference AuditActions literals the
    seven requirements scope on) plus the nullable evidence columns the
    completeness check needs.  Planted distributions:

    - nullability: each mandatory field is NULL on a distinct co-prime
      modulus so every requirement sees both complete and incomplete
      rows at sf0.001;
    - brute force: every third event shares IP 10.0.0.1 (>10 failed
      logins at sf0.001) while the rest spread over 64 IPs (each ≤10),
      so the >10 threshold decides rows both ways;
    - retention: age spread 0..2999d crosses every cutoff; ~20%
      archived.
    """
    eid = F.col("event_id")
    et = F.col("event_type")
    even = eid % 2 == 0
    sev_h = (eid * 131) % 20
    return events.select(
        "event_id",
        F.when(et == "error", "security_event")
         .when(et == "signup", "user_management")
         .when(et == "purchase",
               F.when(even, "system_config").otherwise("user_management"))
         .when(et == "click", "api_access")
         .otherwise("authentication").alias("category"),
        F.when(et == "error",
               F.when(eid % 3 == 0, "unauthorized_access")
                .when(eid % 3 == 1, "breach_attempt")
                .otherwise("security_vulnerability_detected"))
         .when(et == "signup",
               F.when(eid % 3 == 0, "user_create")
                .when(eid % 3 == 1, "user_role_assign")
                .otherwise("user_permission_grant"))
         .when(et == "purchase",
               F.when(even, "system_config_update")
                .otherwise("gdpr_data_export"))
         .when(et == "click", "api_request")
         .otherwise(F.when(eid % 4 == 0, "user_login")
                     .when(eid % 4 == 1, "user_login_failed")
                     .when(eid % 4 == 2, "data_export")
                     .otherwise("user_profile_view")).alias("action"),
        F.when(sev_h < 2, "critical").when(sev_h < 7, "high")
         .when(sev_h < 13, "medium").otherwise("low").alias("severity"),
        ((eid * 7919) % 3000).alias("age_days"),
        F.when((eid * 17) % 19 == 0, F.lit(None).cast("long"))
         .otherwise(F.col("user_id")).alias("user_id"),
        F.when((eid * 11) % 4 == 0, F.lit(None).cast("long"))
         .otherwise(F.col("user_id") + 5000).alias("admin_user_id"),
        F.when((eid * 23) % 17 == 0, F.lit(None).cast("string"))
         .when(eid % 3 == 0, F.lit("10.0.0.1"))
         .otherwise(F.concat(F.lit("10.0.1."),
                             ((eid * 13) % 64).cast("string")))
         .alias("ip_address"),
        ((eid * 29) % 10 != 0).alias("success"),
        F.when((eid * 31) % 7 == 0, F.lit(None).cast("string"))
         .otherwise(F.lit("d")).alias("details"),
        F.when((eid * 41) % 5 == 0, F.lit(None).cast("string"))
         .otherwise(F.lit("b")).alias("before_values"),
        F.when((eid * 43) % 6 == 0, F.lit(None).cast("string"))
         .otherwise(F.lit("a")).alias("after_values"),
        F.when((eid * 47) % 9 == 0, F.lit(None).cast("string"))
         .otherwise(F.lit("page")).alias("resource_type"),
        ((eid * 37) % 5 == 0).alias("archived"),
    )


def requirements_dim(spark: SparkSession) -> DataFrame:
    """The 7-row requirement table (broadcast side of every join)."""
    return spark.createDataFrame(
        COMPLIANCE_REQUIREMENTS,
        "requirement_id string, framework string, "
        "mandatory_fields array<string>, categories array<string>, "
        "actions array<string>, retention_days int")


def _presence_map():
    """field name → present?  Reference falsiness (:491-492): NULL, 0
    and False all count as missing; non-empty strings / timestamps are
    always present."""
    return F.create_map(
        F.lit("user_id"),
        F.col("user_id").isNotNull() & (F.col("user_id") != 0),
        F.lit("admin_user_id"), F.col("admin_user_id").isNotNull(),
        F.lit("ip_address"), F.col("ip_address").isNotNull(),
        F.lit("success"), F.col("success"),
        F.lit("details"), F.col("details").isNotNull(),
        F.lit("before_values"), F.col("before_values").isNotNull(),
        F.lit("after_values"), F.col("after_values").isNotNull(),
        F.lit("resource_type"), F.col("resource_type").isNotNull(),
        F.lit("action"), F.lit(True),
        F.lit("created_at"), F.lit(True),
        F.lit("severity"), F.lit(True),
    )


def _scoped(logs: DataFrame, reqs: DataFrame) -> DataFrame:
    """Logs × requirements restricted to each requirement's category AND
    action scope (compliance_reporting.py:446-452), with the per-row
    missing-mandatory-fields array."""
    pres = _presence_map()
    joined = (logs.withColumn("_present", pres)
              .join(F.broadcast(reqs),
                    F.expr("array_contains(categories, category) AND "
                           "array_contains(actions, action)"), "inner"))
    return joined.withColumn(
        "missing",
        F.filter("mandatory_fields",
                 lambda f: ~F.element_at("_present", f)))


def compliance_violations(logs: DataFrame,
                          reqs: DataFrame) -> DataFrame:
    """All four violation checks as one union.

    Grain: (requirement_id, event_id) for incomplete/security_incident,
    (requirement_id, ip_address) for brute_force, requirement_id for
    retention.  detected_at / remediation prose are dropped (wall-clock
    and static text respectively).
    """
    scoped = _scoped(logs, reqs)
    base = ["requirement_id", "framework"]
    incomplete = (scoped.filter(F.size("missing") > 0)
                  .select(*base, F.lit("incomplete").alias("violation_type"),
                          F.lit("medium").alias("severity"),
                          F.col("event_id"),
                          F.lit(None).cast("string").alias("ip_address"),
                          F.array_join("missing", ",").alias("missing_fields"),
                          F.lit(1).cast("long").alias("n_affected")))
    security = (scoped.filter((F.col("category") == "security_event")
                              & F.col("severity").isin("high", "critical"))
                .select(*base, F.lit("security_incident").alias("violation_type"),
                        F.when(F.col("severity") == "high", "high")
                         .otherwise("critical").alias("severity"),
                        F.col("event_id"),
                        F.lit(None).cast("string").alias("ip_address"),
                        F.lit(None).cast("string").alias("missing_fields"),
                        F.lit(1).cast("long").alias("n_affected")))
    brute = (scoped.filter((F.col("action") == "user_login_failed")
                           & F.col("ip_address").isNotNull())
             .groupBy(*base, "ip_address")
             .agg(F.count("*").alias("n_affected"))
             .filter(F.col("n_affected") > 10)
             .select(*base, F.lit("brute_force").alias("violation_type"),
                     F.lit("high").alias("severity"),
                     F.lit(None).cast("long").alias("event_id"),
                     "ip_address",
                     F.lit(None).cast("string").alias("missing_fields"),
                     F.col("n_affected").cast("long")))
    retention = (logs.join(F.broadcast(reqs),
                           F.expr("array_contains(categories, category)"),
                           "inner")
                 .filter((F.col("age_days") > F.col("retention_days"))
                         & ~F.col("archived"))
                 .groupBy(*base)
                 .agg(F.count("*").alias("n_affected"))
                 .select(*base, F.lit("retention").alias("violation_type"),
                         F.lit("medium").alias("severity"),
                         F.lit(None).cast("long").alias("event_id"),
                         F.lit(None).cast("string").alias("ip_address"),
                         F.lit(None).cast("string").alias("missing_fields"),
                         F.col("n_affected").cast("long")))
    return incomplete.unionByName(security).unionByName(brute) \
                     .unionByName(retention)


def compliance_status(logs: DataFrame, reqs: DataFrame) -> DataFrame:
    """Per-requirement assessment (``_assess_compliance_requirement``
    result grain, :460-479 + confidence :660-688)."""
    scoped = _scoped(logs, reqs)
    per_req = (scoped.groupBy("requirement_id")
               .agg(F.count("*").alias("assessed_records"),
                    F.sum(F.when(F.size("missing") == 0, 1).otherwise(0))
                     .alias("complete_records")))
    viol = (compliance_violations(logs, reqs)
            .groupBy("requirement_id")
            .agg(F.count("*").alias("violations_found")))
    dim = reqs.select("requirement_id", "framework")
    return (dim.join(per_req, "requirement_id", "left")
            .join(viol, "requirement_id", "left")
            .select("requirement_id", "framework",
                    F.coalesce("assessed_records", F.lit(0))
                     .cast("long").alias("assessed_records"),
                    F.coalesce("violations_found", F.lit(0))
                     .cast("long").alias("violations_found"),
                    (F.coalesce("violations_found", F.lit(0)) == 0)
                     .alias("compliant"),
                    F.when(F.coalesce("assessed_records", F.lit(0)) == 0,
                           F.lit(0.0))
                     .otherwise(F.round(
                         F.greatest(
                             F.lit(0.0),
                             F.col("complete_records")
                              / F.col("assessed_records")
                             - F.least(
                                 0.1 * F.coalesce("violations_found",
                                                  F.lit(0)),
                                 F.lit(0.5))) * 100, 2))
                     .alias("confidence_score")))


def compliance_score(status: DataFrame) -> DataFrame:
    """Per-framework executive rollup (:368-370, :392-400)."""
    return (status.groupBy("framework")
            .agg(F.count("*").cast("long").alias("total_requirements"),
                 F.sum(F.when(F.col("compliant"), 1).otherwise(0))
                  .cast("long").alias("compliant_requirements"),
                 F.sum("violations_found").cast("long")
                  .alias("violation_count"),
                 F.round(F.sum(F.when(F.col("compliant"), 1).otherwise(0))
                         / F.count("*") * 100, 2)
                  .alias("compliance_score")))
