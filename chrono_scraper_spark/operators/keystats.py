"""Search-key usage analytics: the reference's API-key analytics service.

Reference: ``backend/app/services/key_analytics_service.py`` —
``get_usage_overview`` (:32-128: totals / active / unused keys,
per-type usage, top-10 keys), ``_calculate_usage_trends`` (:440-484:
half-period comparison with the ±5% increasing/decreasing/stable
classification) and ``generate_usage_forecast`` (:327-439: per-key
daily rates → average + growth multiplier → per-day projection with
linearly decaying confidence). The Redis-scan rate-limit half
(:213-326) is live-store introspection; its effectiveness arithmetic
is replayed by the politeness/budget families instead.

The key table is planted deterministically from the driver ``events``
table (one key per user; requests = ``click`` events) so Spark and the
DuckDB oracle derive identical rows:

* ``usage_count``   = the user's click count,
* ``last_used_s``   = max click epoch (NULL when the user never clicked
  — the reference's *unused key*),
* ``created_s``     = the user's first event of any type,
* ``key_type``      = ``user_id % 3`` → search / admin / index,
* ``is_active``     = ``user_id % 7 != 0`` (inactive keys are excluded
  everywhere, like the reference's ``is_active`` filter),
* "now"             = max event epoch (no wall clock).

Float arithmetic in the reference (averages, growth multipliers,
confidence decay) is replayed as exact integer milli-units with floor
division, keeping the driver value-hash engine-independent.

Scale shape: one hash aggregation keyed by user builds the key table
(user cardinality ≪ events); everything downstream is key-cardinality
(single-row rollups, per-type groups, a top-10, a 30-row forecast).
No corpus-sized shuffle and no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chrono_scraper_spark.operators.dashboard import _floor_div

DAY_S = 86_400
#: get_usage_overview(days_back=30) cutoff (:45)
OVERVIEW_DAYS = 30
TOP_N = 10
#: trend classification thresholds (:483) — ±5% in milli-percent
TREND_BAND_MILLI = 5_000


def plant_keys(events: DataFrame) -> DataFrame:
    """The planted MeilisearchKey table (active keys only), one row per
    user: key_id, key_type, usage_count, last_used_s, created_s, now_s.
    """
    per_user = events.groupBy(F.col("user_id").alias("key_id")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long").alias("usage_count"),
        F.max(F.when(F.col("event_type") == "click",
                     F.unix_timestamp("ts"))).alias("last_used_s"),
        F.min(F.unix_timestamp("ts")).alias("created_s"),
    )
    now = events.agg(
        F.max(F.unix_timestamp("ts")).alias("now_s"))
    return (
        per_user.filter(F.col("key_id") % 7 != 0)
        .withColumn(
            "key_type",
            F.when(F.col("key_id") % 3 == 0, "search")
            .when(F.col("key_id") % 3 == 1, "admin")
            .otherwise("index"))
        .crossJoin(F.broadcast(now))
    )


def usage_overview(events: DataFrame) -> DataFrame:
    """Single-row key-usage overview (key_analytics_service.py:48-103):
    total requests, per-key average (milli), total / active / unused
    keys and the utilization percentage (milli). Active ⇔ last used in
    the trailing ``OVERVIEW_DAYS``; unused ⇔ never used (:52-57).
    """
    agg = plant_keys(events).agg(
        F.sum("usage_count").cast("long").alias("total_requests"),
        F.count(F.lit(1)).cast("long").alias("total_keys"),
        F.sum(
            F.when(F.col("last_used_s")
                   >= F.col("now_s") - OVERVIEW_DAYS * DAY_S, 1)
            .otherwise(0)
        ).cast("long").alias("active_keys"),
        F.sum(F.when(F.col("last_used_s").isNull(), 1).otherwise(0))
        .cast("long").alias("unused_keys"),
    )
    return agg.select(
        "total_requests",
        _floor_div(F.col("total_requests") * 1_000,
                   F.greatest(F.col("total_keys"), F.lit(1)))
        .alias("avg_requests_per_key_milli"),
        "total_keys", "active_keys", "unused_keys",
        _floor_div(F.col("active_keys") * 100_000,
                   F.greatest(F.col("total_keys"), F.lit(1)))
        .alias("utilization_rate_milli"),
    )


def usage_by_type(events: DataFrame) -> DataFrame:
    """Per-key-type usage rollup (key_analytics_service.py:64-74):
    total usage, key count, per-key average in milli."""
    return (
        plant_keys(events)
        .groupBy("key_type")
        .agg(F.sum("usage_count").cast("long").alias("total_usage"),
             F.count(F.lit(1)).cast("long").alias("key_count"))
        .select(
            "key_type", "total_usage", "key_count",
            _floor_div(F.col("total_usage") * 1_000, F.col("key_count"))
            .alias("average_usage_milli"))
    )


def top_keys(events: DataFrame) -> DataFrame:
    """Top-10 keys by usage (key_analytics_service.py:76-85), rank ties
    broken on key_id ascending so the cut is deterministic."""
    # Round 6: orderBy().limit(k) plans as TakeOrderedAndProject (per-
    # partition top-k merged on the driver) instead of an unpartitioned
    # window sorting every key in one task; the k survivors then rank in a
    # trivial k-row window. Same rows, same ranks (same total order).
    order = [F.desc("usage_count"), F.asc("key_id")]
    top = (plant_keys(events)
           .select("key_id", "key_type",
                   "usage_count", "last_used_s", "created_s")
           .orderBy(*order).limit(TOP_N))
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "key_id", "key_type", "usage_count",
                "last_used_s", "created_s")
    )


def usage_trends(events: DataFrame, days_back: int = OVERVIEW_DAYS
                 ) -> DataFrame:
    """Half-period usage trend (key_analytics_service.py:440-484):
    recent = usage of keys last used in the newer half of the window,
    previous = the older half; change in milli-percent (floor; 100% when
    the previous half is empty, 0 when both are) and the ±5%
    increasing / decreasing / stable classification (:483).
    """
    mid = F.col("now_s") - (days_back // 2) * DAY_S
    cutoff = F.col("now_s") - days_back * DAY_S
    agg = plant_keys(events).agg(
        F.sum(F.when(F.col("last_used_s") >= mid, F.col("usage_count"))
              .otherwise(0)).cast("long").alias("recent_period_usage"),
        F.sum(F.when((F.col("last_used_s") >= cutoff)
                     & (F.col("last_used_s") < mid),
                     F.col("usage_count"))
              .otherwise(0)).cast("long").alias("previous_period_usage"),
    )
    change = (
        F.when(F.col("previous_period_usage") > 0,
               _floor_div((F.col("recent_period_usage")
                           - F.col("previous_period_usage")) * 100_000,
                          F.col("previous_period_usage")))
        .when(F.col("recent_period_usage") > 0, F.lit(100_000))
        .otherwise(F.lit(0)).cast("long")
    )
    return agg.select(
        "recent_period_usage", "previous_period_usage",
        change.alias("change_milli"),
        F.when(change > TREND_BAND_MILLI, "increasing")
        .when(change < -TREND_BAND_MILLI, "decreasing")
        .otherwise("stable").alias("trend_direction"),
    )


def usage_forecast(events: DataFrame, historical_days: int = 90,
                   recent_days: int = 30, forecast_days: int = 30
                   ) -> DataFrame:
    """Per-day usage projection (key_analytics_service.py:327-439).

    Eligible keys were created at least ``historical_days`` before now
    (:344-362); each contributes a daily rate ``usage / age_days``
    (:374-379, milli). The projection multiplies the average rate by
    ``1 + growth · day/30`` where growth compares usage of keys last
    used in the trailing ``recent_days`` vs older keys (:388-399);
    per-day confidence decays ``1.0 → 0.3`` linearly (:407). The
    reference's ``max(0, int(...))`` clamp is preserved exactly.

    One row per forecast day: day, projected_requests,
    confidence_milli — plus the inputs (avg_daily_milli, growth_milli)
    repeated for auditability.
    """
    keys = plant_keys(events).filter(
        F.col("created_s") <= F.col("now_s") - historical_days * DAY_S)
    per_key = keys.select(
        F.col("usage_count"),
        _floor_div(F.col("now_s") - F.col("created_s"),
                   F.lit(DAY_S)).alias("age_days"),
        F.col("last_used_s"), F.col("now_s"),
    ).filter(F.col("age_days") > 0)
    agg = per_key.agg(
        F.sum(_floor_div(F.col("usage_count") * 1_000,
                         F.col("age_days"))).alias("rate_sum_milli"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("last_used_s")
                     >= F.col("now_s") - recent_days * DAY_S,
                     F.col("usage_count")).otherwise(0))
        .alias("recent_usage"),
        F.sum(F.when(F.col("last_used_s")
                     < F.col("now_s") - recent_days * DAY_S,
                     F.col("usage_count")).otherwise(0))
        .alias("older_usage"),
    ).select(
        _floor_div(F.col("rate_sum_milli"),
                   F.greatest(F.col("n_keys"), F.lit(1)))
        .alias("avg_daily_milli"),
        F.when(F.col("older_usage") > 0,
               _floor_div((F.col("recent_usage") - F.col("older_usage"))
                          * 1_000, F.col("older_usage")))
        .otherwise(F.lit(0)).cast("long").alias("growth_milli"),
    )
    days = (
        agg.select(
            "avg_daily_milli", "growth_milli",
            F.explode(F.sequence(F.lit(1), F.lit(forecast_days)))
            .alias("day"))
    )
    projected = F.greatest(
        F.lit(0).cast("long"),
        _floor_div(F.col("avg_daily_milli")
                   * (F.lit(30_000) + F.col("growth_milli") * F.col("day")),
                   F.lit(30_000_000)))
    confidence = F.greatest(
        F.lit(300).cast("long"),
        F.lit(1_000) - _floor_div(F.col("day") * 700,
                                  F.lit(forecast_days)))
    return days.select(
        F.col("day").cast("int").alias("day"),
        projected.alias("projected_requests"),
        confidence.cast("long").alias("confidence_milli"),
        "avg_daily_milli", "growth_milli",
    )
