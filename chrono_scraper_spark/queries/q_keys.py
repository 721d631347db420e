"""Contract queries: search-key usage analytics
(key_analytics_service.py — overview, per-type usage, top keys,
half-period trends, usage forecast).

Spark side is ``operators/keystats.py``; oracles replay the planted
key derivation and the integer-milli arithmetic in DuckDB over the
driver ``events`` table. The forecast query shortens the reference's
90-day history gate to 20 days (and the 30-day growth split to 10) so
the 30-day driver corpus yields a non-degenerate projection — the
arithmetic is otherwise the reference's (:327-439).
"""

from __future__ import annotations

from chrono_scraper_spark.operators import keystats as KS

#: contract-call parameters for the forecast (see module docstring)
FC_HIST_DAYS = 20
FC_RECENT_DAYS = 10
FC_DAYS = 30


def _ev(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_key_usage_overview(spark, sf_dir):
    """Key-usage overview rollup (key_analytics_service.py:48-103)."""
    return KS.usage_overview(_ev(spark, sf_dir))


def q_key_usage_by_type(spark, sf_dir):
    """Per-key-type usage (key_analytics_service.py:64-74)."""
    return KS.usage_by_type(_ev(spark, sf_dir))


def q_key_top_keys(spark, sf_dir):
    """Top-10 keys by usage (key_analytics_service.py:76-85)."""
    return KS.top_keys(_ev(spark, sf_dir))


def q_key_usage_trends(spark, sf_dir):
    """Half-period usage trend (key_analytics_service.py:440-484)."""
    return KS.usage_trends(_ev(spark, sf_dir))


def q_usage_forecast(spark, sf_dir):
    """Per-day usage projection (key_analytics_service.py:327-439)."""
    return KS.usage_forecast(_ev(spark, sf_dir),
                             historical_days=FC_HIST_DAYS,
                             recent_days=FC_RECENT_DAYS,
                             forecast_days=FC_DAYS)


# planted active-key table shared by every oracle (module docstring of
# operators/keystats.py documents the derivation)
_KEYS_CTES = """ks AS (
  SELECT user_id AS key_id,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         AS BIGINT) AS usage_count,
    max(CASE WHEN event_type = 'click'
             THEN CAST(floor(epoch(ts)) AS BIGINT) END) AS last_used_s,
    min(CAST(floor(epoch(ts)) AS BIGINT)) AS created_s
  FROM events GROUP BY 1),
mx AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS now_s FROM events),
ak AS (
  SELECT k.*, m.now_s,
    CASE WHEN key_id % 3 = 0 THEN 'search'
         WHEN key_id % 3 = 1 THEN 'admin'
         ELSE 'index' END AS key_type
  FROM ks k CROSS JOIN mx m
  WHERE key_id % 7 <> 0)"""


SQL_KEY_USAGE_OVERVIEW = f"""WITH {_KEYS_CTES},
agg AS (
  SELECT CAST(sum(usage_count) AS BIGINT) AS total_requests,
    CAST(count(*) AS BIGINT) AS total_keys,
    CAST(sum(CASE WHEN last_used_s >= now_s - 30 * 86400
                  THEN 1 ELSE 0 END) AS BIGINT) AS active_keys,
    CAST(sum(CASE WHEN last_used_s IS NULL THEN 1 ELSE 0 END)
         AS BIGINT) AS unused_keys
  FROM ak)
SELECT total_requests,
  total_requests * 1000 // greatest(total_keys, 1)
    AS avg_requests_per_key_milli,
  total_keys, active_keys, unused_keys,
  active_keys * 100000 // greatest(total_keys, 1)
    AS utilization_rate_milli
FROM agg"""


SQL_KEY_USAGE_BY_TYPE = f"""WITH {_KEYS_CTES}
SELECT key_type,
  CAST(sum(usage_count) AS BIGINT) AS total_usage,
  CAST(count(*) AS BIGINT) AS key_count,
  CAST(sum(usage_count) AS BIGINT) * 1000 // count(*)
    AS average_usage_milli
FROM ak GROUP BY 1"""


SQL_KEY_TOP_KEYS = f"""WITH {_KEYS_CTES},
r AS (
  SELECT CAST(row_number() OVER (ORDER BY usage_count DESC, key_id ASC)
              AS INT) AS rank,
    key_id, key_type, usage_count, last_used_s, created_s
  FROM ak)
SELECT * FROM r WHERE rank <= 10"""


SQL_KEY_USAGE_TRENDS = f"""WITH {_KEYS_CTES},
agg AS (
  SELECT
    CAST(sum(CASE WHEN last_used_s >= now_s - 15 * 86400
                  THEN usage_count ELSE 0 END) AS BIGINT)
      AS recent_period_usage,
    CAST(sum(CASE WHEN last_used_s >= now_s - 30 * 86400
                   AND last_used_s < now_s - 15 * 86400
                  THEN usage_count ELSE 0 END) AS BIGINT)
      AS previous_period_usage
  FROM ak),
c AS (
  SELECT *,
    CASE WHEN previous_period_usage > 0
         THEN CAST(floor((recent_period_usage - previous_period_usage)
                         * 100000.0 / previous_period_usage) AS BIGINT)
         WHEN recent_period_usage > 0 THEN CAST(100000 AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS change_milli
  FROM agg)
SELECT recent_period_usage, previous_period_usage, change_milli,
  CASE WHEN change_milli > 5000 THEN 'increasing'
       WHEN change_milli < -5000 THEN 'decreasing'
       ELSE 'stable' END AS trend_direction
FROM c"""


SQL_USAGE_FORECAST = f"""WITH {_KEYS_CTES},
elig AS (
  SELECT *, (now_s - created_s) // 86400 AS age_days
  FROM ak
  WHERE created_s <= now_s - {FC_HIST_DAYS} * 86400),
per AS (
  SELECT usage_count * 1000 // age_days AS rate_milli,
    usage_count, last_used_s, now_s
  FROM elig WHERE age_days > 0),
agg AS (
  SELECT
    CAST(sum(rate_milli) // greatest(count(*), 1) AS BIGINT)
      AS avg_daily_milli,
    CAST(sum(CASE WHEN last_used_s >= now_s - {FC_RECENT_DAYS} * 86400
                  THEN usage_count ELSE 0 END) AS BIGINT) AS recent_u,
    CAST(sum(CASE WHEN last_used_s < now_s - {FC_RECENT_DAYS} * 86400
                  THEN usage_count ELSE 0 END) AS BIGINT) AS older_u
  FROM per),
g AS (
  SELECT avg_daily_milli,
    CASE WHEN older_u > 0
         THEN CAST(floor((recent_u - older_u) * 1000.0 / older_u)
                   AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS growth_milli
  FROM agg),
d AS (SELECT CAST(range AS INT) AS day
      FROM range(1, {FC_DAYS} + 1))
SELECT d.day,
  greatest(CAST(0 AS BIGINT),
           CAST(floor(avg_daily_milli
                      * (30000 + growth_milli * d.day)
                      / 30000000.0) AS BIGINT)) AS projected_requests,
  greatest(CAST(300 AS BIGINT),
           1000 - d.day * 700 // {FC_DAYS}) AS confidence_milli,
  avg_daily_milli, growth_milli
FROM d CROSS JOIN g"""


QUERIES = {
    "key_usage_overview": q_key_usage_overview,
    "key_usage_by_type": q_key_usage_by_type,
    "key_top_keys": q_key_top_keys,
    "key_usage_trends": q_key_usage_trends,
    "usage_forecast": q_usage_forecast,
}

ORACLES = {
    "key_usage_overview": SQL_KEY_USAGE_OVERVIEW,
    "key_usage_by_type": SQL_KEY_USAGE_BY_TYPE,
    "key_top_keys": SQL_KEY_TOP_KEYS,
    "key_usage_trends": SQL_KEY_USAGE_TRENDS,
    "usage_forecast": SQL_USAGE_FORECAST,
}
