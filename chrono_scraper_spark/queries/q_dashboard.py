"""Contract queries: executive-dashboard metrics
(dashboard_metrics.py — the reference's admin KPI service).

Spark side is ``operators/dashboard.py``; oracles replay the same
rollups in DuckDB over the oracle-parity CDX corpus and the driver
``events`` table. All rates are integer milli-units and all windows
are relative to the data's own max timestamp (no wall clock), so both
engines hash-match.
"""

from __future__ import annotations

from chrono_scraper_spark.corpus import PAGES_CTE_DUCK, cdx_pages_view
from chrono_scraper_spark.operators import dashboard as DB


def _ev(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_dashboard_content(spark, sf_dir):
    """Content KPI rollup (dashboard_metrics.py:224-283): totals,
    processed-in-24h, word stats, per-minute processing rate."""
    return DB.content_metrics(cdx_pages_view(spark, sf_dir))


SQL_DASHBOARD_CONTENT = f"""WITH pages_cdx AS ({PAGES_CTE_DUCK}),
w AS (
  SELECT status,
    CAST(floor(epoch(warc_ts)) AS BIGINT) AS ts_s,
    CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
         ELSE len(string_split(trim(coalesce(text, '')), ' ')) END AS wc
  FROM pages_cdx),
mx AS (SELECT max(ts_s) AS now_s FROM w),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS total_pages,
    CAST(sum(CASE WHEN status = 200 AND ts_s >= now_s - 86400
                  THEN 1 ELSE 0 END) AS BIGINT) AS processed_24h,
    CAST(sum(wc) AS BIGINT) AS total_words
  FROM w CROSS JOIN mx)
SELECT total_pages, processed_24h,
  total_words // greatest(total_pages, 1) AS avg_word_count,
  total_words,
  processed_24h * 100000 // 1440 AS processing_rate_milli
FROM agg"""


def q_dashboard_users(spark, sf_dir):
    """User KPI rollup (dashboard_metrics.py:176-222): total / active /
    new / verified / approved users with milli-rates."""
    return DB.user_metrics(_ev(spark, sf_dir))


SQL_DASHBOARD_USERS = """WITH per_user AS (
  SELECT user_id,
    max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_s,
    min(CAST(floor(epoch(ts)) AS BIGINT)) AS first_s
  FROM events GROUP BY 1),
mx AS (SELECT max(last_s) AS now_s FROM per_user),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS total_users,
    CAST(sum(CASE WHEN last_s >= now_s - 86400 THEN 1 ELSE 0 END)
         AS BIGINT) AS active_24h,
    CAST(sum(CASE WHEN first_s >= now_s - 604800 THEN 1 ELSE 0 END)
         AS BIGINT) AS new_7d,
    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS verified_users,
    CAST(sum(CASE WHEN user_id % 3 <> 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS approved_users
  FROM per_user CROSS JOIN mx)
SELECT total_users, active_24h, new_7d, verified_users, approved_users,
  active_24h * 100000 // greatest(total_users, 1) AS activity_rate_milli,
  verified_users * 100000 // greatest(total_users, 1)
    AS verification_rate_milli
FROM agg"""


def q_dashboard_trend(spark, sf_dir):
    """Trailing-7-day daily activity + trend classification
    (dashboard_metrics.py:362-385)."""
    return DB.activity_trends(_ev(spark, sf_dir))


SQL_DASHBOARD_TREND = """WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS events
  FROM events GROUP BY 1),
mx AS (SELECT max(day) AS max_day FROM daily),
recent AS (
  SELECT day, events FROM daily CROSS JOIN mx
  WHERE day >= max_day - INTERVAL 6 DAY),
edges AS (
  SELECT arg_min(events, day) AS first_events,
         arg_max(events, day) AS last_events
  FROM recent)
SELECT strftime(day, '%Y-%m-%d') AS date, events,
  CASE WHEN last_events > first_events THEN 'increasing'
       ELSE 'stable' END AS trend
FROM recent CROSS JOIN edges"""


def q_dashboard_growth(spark, sf_dir):
    """24h-vs-previous-24h user and content growth
    (dashboard_metrics.py:412-452), milli-percent."""
    return DB.growth_rates(_ev(spark, sf_dir),
                           cdx_pages_view(spark, sf_dir))


SQL_DASHBOARD_GROWTH = f"""WITH pages_cdx AS ({PAGES_CTE_DUCK}),
emx AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS now_s FROM events),
u AS (
  SELECT
    CAST(sum(CASE WHEN event_type = 'signup'
                   AND CAST(floor(epoch(ts)) AS BIGINT) >= now_s - 86400
                  THEN 1 ELSE 0 END) AS BIGINT) AS new_users_24h,
    CAST(sum(CASE WHEN event_type = 'signup'
                   AND CAST(floor(epoch(ts)) AS BIGINT) >= now_s - 172800
                   AND CAST(floor(epoch(ts)) AS BIGINT) < now_s - 86400
                  THEN 1 ELSE 0 END) AS BIGINT) AS prev_users_24h
  FROM events CROSS JOIN emx),
pmx AS (SELECT max(CAST(floor(epoch(warc_ts)) AS BIGINT)) AS now_s
        FROM pages_cdx),
c AS (
  SELECT
    CAST(sum(CASE WHEN CAST(floor(epoch(warc_ts)) AS BIGINT)
                       >= now_s - 86400
                  THEN 1 ELSE 0 END) AS BIGINT) AS new_pages_24h,
    CAST(sum(CASE WHEN CAST(floor(epoch(warc_ts)) AS BIGINT)
                       >= now_s - 172800
                   AND CAST(floor(epoch(warc_ts)) AS BIGINT)
                       < now_s - 86400
                  THEN 1 ELSE 0 END) AS BIGINT) AS prev_pages_24h
  FROM pages_cdx CROSS JOIN pmx)
SELECT new_users_24h, prev_users_24h,
  CASE WHEN prev_users_24h > 0
       THEN CAST(floor((new_users_24h - prev_users_24h) * 100000.0
                       / prev_users_24h) AS BIGINT)
       ELSE 0 END AS user_growth_milli,
  new_pages_24h, prev_pages_24h,
  CASE WHEN prev_pages_24h > 0
       THEN CAST(floor((new_pages_24h - prev_pages_24h) * 100000.0
                       / prev_pages_24h) AS BIGINT)
       ELSE 0 END AS content_growth_milli
FROM u CROSS JOIN c"""


def q_dashboard_top(spark, sf_dir):
    """Top-10 domains by page count + top-10 projects by activity
    (dashboard_metrics.py:692-738), deterministic tie-break."""
    return DB.top_domains_projects(cdx_pages_view(spark, sf_dir))


SQL_DASHBOARD_TOP = f"""WITH pages_cdx AS ({PAGES_CTE_DUCK}),
hc AS (
  SELECT host, CAST(count(*) AS BIGINT) AS page_count
  FROM pages_cdx GROUP BY 1),
pc AS (
  SELECT CASE WHEN host LIKE '%.edu' THEN 'academic'
              WHEN host LIKE '%.gov' THEN 'government'
              ELSE 'web' END AS project,
         CAST(sum(page_count) AS BIGINT) AS page_count
  FROM hc GROUP BY 1),
both_k AS (
  SELECT 'domain' AS kind, host AS name, page_count FROM hc
  UNION ALL
  SELECT 'project' AS kind, project AS name, page_count FROM pc),
r AS (
  SELECT kind, name, page_count,
    CAST(row_number() OVER (PARTITION BY kind
                            ORDER BY page_count DESC, name ASC)
         AS INT) AS rank
  FROM both_k)
SELECT kind, name, page_count, rank FROM r WHERE rank <= 10"""


QUERIES = {
    "dashboard_content": q_dashboard_content,
    "dashboard_users": q_dashboard_users,
    "dashboard_trend": q_dashboard_trend,
    "dashboard_growth": q_dashboard_growth,
    "dashboard_top": q_dashboard_top,
}

ORACLES = {
    "dashboard_content": SQL_DASHBOARD_CONTENT,
    "dashboard_users": SQL_DASHBOARD_USERS,
    "dashboard_trend": SQL_DASHBOARD_TREND,
    "dashboard_growth": SQL_DASHBOARD_GROWTH,
    "dashboard_top": SQL_DASHBOARD_TOP,
}
