"""Audit-log security analysis — the audit-analysis threshold family.

Reference semantics (backend/app/services/audit_analysis.py:86-100
``_init_anomaly_thresholds``): failed logins >10/user/hour, request rate
>100/user/minute, bulk operations >5/user/hour, and the unusual-activity
window 22:00-06:00. The reference's detector bodies are declared stubs
(:615-645); the thresholds dict is the specified behavior, so this module
applies exactly those thresholds over the event log and emits the
per-user security profile that ``generate_security_analysis`` (:339+)
aggregates.

Event-type mapping onto the driver event log: ``error`` rows are the
failed-login analog, ``purchase`` rows the bulk-operation analog; every
row counts toward the request rate.

Scale shape: two-level aggregation — conditional counts at (user, window)
grain, then a max/sum rollup to user grain. Both aggregates are map-side
partial (Sum/Max), the only shuffles are the two key exchanges, and the
output is one row per user. No windows over a global sort, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_FAILED_PER_HOUR = 10       # max_failed_logins_per_hour (:89)
MAX_REQUESTS_PER_MINUTE = 100  # max_requests_per_user_per_minute (:91)
MAX_BULK_PER_HOUR = 5          # max_bulk_operations_per_hour (:95)
# unusual_activity_hours = 22,23,0..5 (:94)
AFTER_HOURS_START, AFTER_HOURS_END = 22, 6


def security_profile(events: DataFrame,
                     failed_type: str = "error",
                     bulk_type: str = "purchase") -> DataFrame:
    """Per-user security profile with the reference's anomaly flags.

    Returns (user_id, total_events, after_hours_events,
    max_events_per_minute, max_failed_per_hour, max_bulk_per_hour,
    rate_anomaly, failed_login_anomaly, bulk_anomaly, after_hours_activity).
    """
    hour = F.hour("ts")
    after_hours = (hour >= AFTER_HOURS_START) | (hour < AFTER_HOURS_END)

    per_min = (events
               .groupBy("user_id",
                        F.date_trunc("minute", F.col("ts")).alias("_m"))
               .agg(F.count("*").alias("n"),
                    F.sum((F.col("event_type") == failed_type)
                          .cast("long")).alias("n_failed"),
                    F.sum((F.col("event_type") == bulk_type)
                          .cast("long")).alias("n_bulk"),
                    F.sum(after_hours.cast("long")).alias("n_ah"))
               .withColumn("_h", F.date_trunc("hour", F.col("_m"))))

    per_hour = (per_min
                .groupBy("user_id", "_h")
                .agg(F.max("n").alias("max_min"),
                     F.sum("n").alias("n_hour"),
                     F.sum("n_failed").alias("failed_hour"),
                     F.sum("n_bulk").alias("bulk_hour"),
                     F.sum("n_ah").alias("ah_hour")))

    prof = (per_hour
            .groupBy("user_id")
            .agg(F.sum("n_hour").alias("total_events"),
                 F.sum("ah_hour").alias("after_hours_events"),
                 F.max("max_min").alias("max_events_per_minute"),
                 F.max("failed_hour").alias("max_failed_per_hour"),
                 F.max("bulk_hour").alias("max_bulk_per_hour")))

    return (prof
            .withColumn("rate_anomaly",
                        F.col("max_events_per_minute")
                        > MAX_REQUESTS_PER_MINUTE)
            .withColumn("failed_login_anomaly",
                        F.col("max_failed_per_hour") > MAX_FAILED_PER_HOUR)
            .withColumn("bulk_anomaly",
                        F.col("max_bulk_per_hour") > MAX_BULK_PER_HOUR)
            .withColumn("after_hours_activity",
                        F.col("after_hours_events") > 0))
