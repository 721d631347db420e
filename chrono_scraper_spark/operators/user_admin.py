"""User-registration evaluation and bulk-operation validation.

Reference: ``backend/app/services/user_evaluation_service.py`` —
``_generate_fallback_evaluation`` (:220-273; the LLM path :48-114 is
model-bound and out of charter, the deterministic heuristic fallback
IS the semantics here) — and
``backend/app/services/bulk_operations.py`` —
``_validate_users_for_operation`` (:201-250: self-modification guard
for destructive ops, then per-operation status rules, with exact
error strings).

Planted user attributes (consistent with the other service families):

* email domain: ``user_id % 6`` → univ.edu / lab.ac.uk / agency.gov /
  nonprofit.org / gmail.com / corp.com;
* research text: ``user_id % 5`` rotates through research-flavoured /
  journalism / marketing / empty / osint strings;
* has purpose+interests ⇔ ``user_id % 4 != 0``; affiliation or title
  ⇔ ``user_id % 3 == 0``;
* approval_status: ``user_id % 3 != 0`` → approved, else ``% 9 == 0``
  → rejected, else pending; is_active ⇔ ``user_id % 5 != 0``;
* the acting superuser = the smallest ``user_id % 50 == 0`` in the
  corpus (the plan family's superuser rule), derived from the data.

The reference's x.5-step float scores are replayed in exact centi
units (``legitimacy_centi`` = score·100); the /3 overall mean is
milli with floor. Scale shape: per-row expressions over the user
dimension — zero corpus shuffle; the 8-way operation fan-out is an
explode of a literal array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chrono_scraper_spark.operators.dashboard import _floor_div

#: user_evaluation_service.py:231 academic_domains (substring match)
ACADEMIC_DOMAINS = [".edu", ".ac.", ".gov", ".org"]
#: :238 research_keywords (substring match on lowered text)
RESEARCH_KEYWORDS = ["research", "academic", "study", "analysis",
                     "investigation", "journalism", "osint"]

_EMAIL_DOMAINS = ["univ.edu", "lab.ac.uk", "agency.gov",
                  "nonprofit.org", "gmail.com", "corp.com"]
_RESEARCH_TEXTS = [
    "web research and archive analysis",
    "journalism fact checking",
    "marketing growth hacking",
    "",
    "osint study of public records",
]

#: bulk_operations.py BulkOperationType members (:44, :252-276)
BULK_OPERATIONS = ["approve", "deny", "activate", "deactivate",
                   "delete", "assign_role", "verify_email",
                   "unverify_email"]
#: :218-222 destructive set for the self-modification guard
SELF_GUARDED = ["delete", "deactivate", "deny"]


def planted_users(events: DataFrame) -> DataFrame:
    """One row per user with the planted profile attributes."""
    uid = F.col("user_id")
    dom = F.element_at(F.array(*[F.lit(d) for d in _EMAIL_DOMAINS]),
                       (uid % 6 + 1).cast("int"))
    txt = F.element_at(F.array(*[F.lit(t) for t in _RESEARCH_TEXTS]),
                       (uid % 5 + 1).cast("int"))
    return events.select("user_id").distinct().select(
        "user_id",
        dom.alias("email_domain"),
        txt.alias("research_text"),
        (uid % 4 != 0).alias("has_purpose_and_interests"),
        (uid % 3 == 0).alias("has_affiliation"),
        F.when(uid % 3 != 0, "approved")
        .when(uid % 9 == 0, "rejected")
        .otherwise("pending").alias("approval_status"),
        (uid % 5 != 0).alias("is_active"),
    )


def evaluate_users(events: DataFrame) -> DataFrame:
    """Fallback registration evaluation per user
    (user_evaluation_service.py:220-273): centi scores, milli overall
    (floor of the /3 mean), the approve / deny / manual_review
    decision (:254-260) and the academic positive indicator (:270).
    """
    u = planted_users(events)
    academic = F.exists(
        F.array(*[F.lit(d) for d in ACADEMIC_DOMAINS]),
        lambda d: F.col("email_domain").contains(d))
    research = F.exists(
        F.array(*[F.lit(k) for k in RESEARCH_KEYWORDS]),
        lambda k: F.lower(F.col("research_text")).contains(k))
    leg = (F.lit(500)
           + F.when(academic, 200).otherwise(0)
           + F.when(F.col("has_affiliation"), 100).otherwise(0))
    res = (F.lit(500)
           + F.when(research, 150).otherwise(0)
           + F.when(F.col("has_purpose_and_interests"), 100)
           .otherwise(0))
    risk = (F.lit(500)
            - F.when(academic, 100).otherwise(0)
            - F.when(research, 50).otherwise(0))
    d = u.select(
        "user_id", "email_domain",
        F.least(F.greatest(leg, F.lit(0)), F.lit(1000)).cast("long")
        .alias("legitimacy_centi"),
        F.least(F.greatest(res, F.lit(0)), F.lit(1000)).cast("long")
        .alias("research_intent_centi"),
        F.least(F.greatest(risk, F.lit(0)), F.lit(1000)).cast("long")
        .alias("risk_centi"),
        academic.alias("_academic"),
    )
    overall = _floor_div(
        (F.col("legitimacy_centi") + F.col("research_intent_centi")
         + (F.lit(1000) - F.col("risk_centi"))) * 10, F.lit(3))
    return d.select(
        "user_id", "email_domain", "legitimacy_centi",
        "research_intent_centi", "risk_centi",
        F.least(F.greatest(overall, F.lit(0).cast("long")),
                F.lit(10_000).cast("long")).alias("overall_milli"),
        F.when((overall >= 7_000) & (F.col("risk_centi") <= 400),
               "approve")
        .when((overall <= 4_000) | (F.col("risk_centi") >= 700), "deny")
        .otherwise("manual_review").alias("recommendation"),
        F.when(F.col("_academic"), "Academic domain detected")
        .otherwise(F.lit(None).cast("string"))
        .alias("positive_indicators"),
        F.lit(600).cast("long").alias("confidence_milli"),   # :266
    )


def validate_bulk(events: DataFrame) -> DataFrame:
    """Per (user, operation) bulk-eligibility rows
    (bulk_operations.py:201-250): the self-modification guard for
    delete/deactivate/deny, then the four already-in-state rules,
    with the reference's exact error strings. The acting superuser is
    derived from the data (module docstring)."""
    u = planted_users(events)
    actor = (
        events.select("user_id").distinct()
        .filter(F.col("user_id") % 50 == 0)
        .agg(F.min("user_id").alias("actor_id"))
    )
    ops = F.explode(F.array(*[F.lit(o) for o in BULK_OPERATIONS]))
    d = (
        u.crossJoin(F.broadcast(actor))
        .select("*", ops.alias("operation"))
    )
    is_self_guarded = F.col("operation").isin(SELF_GUARDED)
    self_mod = (F.col("user_id") == F.col("actor_id")) & is_self_guarded
    already = (
        F.when((F.col("operation") == "approve")
               & (F.col("approval_status") == "approved"),
               "User is already approved")
        .when((F.col("operation") == "deny")
              & (F.col("approval_status") == "rejected"),
              "User is already rejected")
        .when((F.col("operation") == "activate") & F.col("is_active"),
              "User is already active")
        .when((F.col("operation") == "deactivate")
              & ~F.col("is_active"),
              "User is already inactive")
    )
    reason = F.when(
        self_mod,
        "Cannot perform this operation on your own account"
    ).otherwise(already)
    return d.select(
        "user_id", "operation",
        reason.isNull().alias("eligible"),
        F.coalesce(reason, F.lit("")).alias("reason"),
    )
