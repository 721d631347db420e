"""Contract queries: plan tiers, quota checks, usage accounting
(plan_service.py + models/plans.py).

Spark side is ``operators/plans.py``; oracles replay the planted tier
assignment, quota gates and usage rollups in DuckDB over the driver
``events`` table.
"""

from __future__ import annotations

from chrono_scraper_spark.operators import plans as PL


def _ev(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_plan_assign(spark, sf_dir):
    """Per-user plan with tier defaults (plans.py:88-158, timeouts per
    sync_with_plan :212-217)."""
    return PL.assign_plans(_ev(spark, sf_dir))


def q_plan_project_check(spark, sf_dir):
    """can_create_project quota gate (plans.py:160-164)."""
    return PL.project_check(_ev(spark, sf_dir))


def q_plan_rate_check(spark, sf_dir):
    """Daily + concurrent rate gate (plans.py:225-240) with the
    reference's branch precedence and reason strings."""
    return PL.rate_check(_ev(spark, sf_dir))


def q_plan_usage_breakdown(spark, sf_dir):
    """Daily UserPlanUsage breakdown (plan_service.py:280-290)."""
    return PL.usage_breakdown(_ev(spark, sf_dir))


def q_plan_usage_totals(spark, sf_dir):
    """Per-user usage totals + pages-per-minute performance metric
    (plan_service.py:272-300)."""
    return PL.usage_totals(_ev(spark, sf_dir))


# planted tier config shared by the oracles (operators/plans.py
# TIER_DEFAULTS — plans.py:88-158)
_PLANS_CTES = """users AS (SELECT DISTINCT user_id FROM events),
plans AS (
  SELECT user_id,
    CASE WHEN user_id % 50 = 0 THEN 'unlimited'
         WHEN user_id % 10 = 9 THEN 'lightning'
         WHEN user_id % 10 >= 6 THEN 'flash'
         ELSE 'spark' END AS tier
  FROM users),
cfg AS (
  SELECT user_id, tier,
    CAST(CASE tier WHEN 'spark' THEN 10 WHEN 'flash' THEN 25
         WHEN 'lightning' THEN 75 ELSE 200 END AS INT)
      AS max_pages_per_minute,
    CAST(CASE tier WHEN 'spark' THEN 1 WHEN 'flash' THEN 2
         WHEN 'lightning' THEN 5 ELSE 10 END AS INT)
      AS max_concurrent_jobs,
    CAST(CASE tier WHEN 'spark' THEN 500 WHEN 'flash' THEN 2000
         WHEN 'lightning' THEN 10000 ELSE 100000 END AS INT)
      AS max_pages_per_session,
    CAST(CASE tier WHEN 'spark' THEN 2500 WHEN 'flash' THEN 10000
         WHEN 'lightning' THEN 50000 ELSE 1000000 END AS INT)
      AS max_pages_per_day,
    CAST(CASE tier WHEN 'spark' THEN 2 WHEN 'flash' THEN 5
         WHEN 'lightning' THEN 15 ELSE 100 END AS INT) AS max_projects,
    CAST(CASE tier WHEN 'spark' THEN 6 WHEN 'flash' THEN 4
         WHEN 'lightning' THEN 2 ELSE 1 END AS INT) AS priority_level,
    tier IN ('lightning', 'unlimited') AS api_access,
    tier IN ('lightning', 'unlimited') AS custom_timeout
  FROM plans)"""


SQL_PLAN_ASSIGN = f"""WITH {_PLANS_CTES}
SELECT user_id, tier, max_pages_per_minute, max_concurrent_jobs,
  max_pages_per_session, max_pages_per_day, max_projects,
  priority_level, api_access,
  CAST(CASE WHEN custom_timeout THEN 30 ELSE 60 END AS INT)
    AS default_timeout_seconds,
  CAST(CASE WHEN custom_timeout THEN 300 ELSE 120 END AS INT)
    AS max_timeout_seconds
FROM cfg"""


SQL_PLAN_PROJECT_CHECK = f"""WITH {_PLANS_CTES},
proj AS (
  SELECT user_id,
    CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                             THEN (event_id * 13 + 7) % 1000 END)
         AS BIGINT) AS current_projects
  FROM events GROUP BY 1)
SELECT c.user_id, c.tier, p.current_projects, c.max_projects,
  p.current_projects < c.max_projects AS allowed,
  CASE WHEN p.current_projects < c.max_projects
       THEN 'Can create project'
       ELSE 'Plan limit: ' || CAST(c.max_projects AS VARCHAR)
            || ' projects maximum' END AS reason
FROM cfg c JOIN proj p USING (user_id)"""


SQL_PLAN_RATE_CHECK = f"""WITH {_PLANS_CTES},
mx AS (SELECT max(CAST(ts AS DATE)) AS today FROM events),
today AS (
  SELECT user_id,
    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) * 1000
         AS BIGINT) AS pages_scraped_today,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS current_concurrent_jobs
  FROM events CROSS JOIN mx
  WHERE CAST(ts AS DATE) = today GROUP BY 1),
j AS (
  SELECT c.user_id, c.tier,
    coalesce(t.pages_scraped_today, 0) AS pages_scraped_today,
    CAST(c.max_pages_per_day AS BIGINT) AS max_pages_per_day,
    coalesce(t.current_concurrent_jobs, 0) AS current_concurrent_jobs,
    CAST(c.max_concurrent_jobs AS BIGINT) AS max_concurrent_jobs
  FROM cfg c LEFT JOIN today t USING (user_id))
SELECT user_id, tier, pages_scraped_today, max_pages_per_day,
  current_concurrent_jobs, max_concurrent_jobs,
  pages_scraped_today < max_pages_per_day
    AND current_concurrent_jobs < max_concurrent_jobs AS allowed,
  CASE WHEN pages_scraped_today >= max_pages_per_day
       THEN 'Daily limit reached: ' || CAST(max_pages_per_day AS VARCHAR)
            || ' pages'
       WHEN current_concurrent_jobs >= max_concurrent_jobs
       THEN 'Concurrent job limit reached: '
            || CAST(max_concurrent_jobs AS VARCHAR)
       ELSE 'Within rate limits' END AS reason
FROM j"""


_USAGE_CTES = """mx AS (SELECT max(CAST(ts AS DATE)) AS max_day FROM events),
rec AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         AS BIGINT) AS pages_scraped,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         AS BIGINT) AS searches_performed,
    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         AS BIGINT) AS api_calls,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS entities_extracted,
    CAST(sum(CASE WHEN event_type = 'view'
                  THEN CAST(floor(value) AS BIGINT) ELSE 0 END)
         AS BIGINT) AS scrape_time_s
  FROM events CROSS JOIN mx
  WHERE CAST(ts AS DATE) >= max_day - INTERVAL 29 DAY
  GROUP BY 1, 2)"""


SQL_PLAN_USAGE_BREAKDOWN = f"""WITH {_USAGE_CTES}
SELECT user_id, strftime(day, '%Y-%m-%d') AS date, pages_scraped,
  searches_performed, api_calls, entities_extracted,
  CASE WHEN scrape_time_s > 0
       THEN pages_scraped * 60000 // scrape_time_s
       ELSE CAST(0 AS BIGINT) END AS avg_pages_per_minute_milli
FROM rec"""


SQL_PLAN_USAGE_TOTALS = f"""WITH {_USAGE_CTES},
agg AS (
  SELECT user_id,
    CAST(sum(pages_scraped) AS BIGINT) AS total_pages,
    CAST(sum(searches_performed) AS BIGINT) AS total_searches,
    CAST(sum(api_calls) AS BIGINT) AS total_api_calls,
    CAST(sum(entities_extracted) AS BIGINT) AS total_entities,
    CAST(sum(scrape_time_s) AS BIGINT) AS total_scrape_time_s
  FROM rec GROUP BY 1)
SELECT user_id, total_pages, total_searches, total_api_calls,
  total_entities,
  CASE WHEN total_scrape_time_s > 0
       THEN total_pages * 60000 // total_scrape_time_s
       ELSE CAST(0 AS BIGINT) END AS avg_pages_per_minute_milli,
  total_scrape_time_s
FROM agg"""


QUERIES = {
    "plan_assign": q_plan_assign,
    "plan_project_check": q_plan_project_check,
    "plan_rate_check": q_plan_rate_check,
    "plan_usage_breakdown": q_plan_usage_breakdown,
    "plan_usage_totals": q_plan_usage_totals,
}

ORACLES = {
    "plan_assign": SQL_PLAN_ASSIGN,
    "plan_project_check": SQL_PLAN_PROJECT_CHECK,
    "plan_rate_check": SQL_PLAN_RATE_CHECK,
    "plan_usage_breakdown": SQL_PLAN_USAGE_BREAKDOWN,
    "plan_usage_totals": SQL_PLAN_USAGE_TOTALS,
}
