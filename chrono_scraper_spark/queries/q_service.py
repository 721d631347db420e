"""Contract queries: cost estimation, investigation page comparison,
user engagement (the reference's remaining deterministic service
families — cost_estimation.py, investigation_service.py,
user_analytics.py).

Spark side runs ``operators/costing.py`` / ``operators/investigate.py``;
oracles replay the same arithmetic in DuckDB SQL over the oracle-parity
CDX corpus / driver ``events`` table.
"""

from __future__ import annotations

from chrono_scraper_spark.corpus import PAGES_CTE_DUCK, cdx_pages_view
from chrono_scraper_spark.operators import costing as CO
from chrono_scraper_spark.operators import investigate as IV


def q_cost_estimate(spark, sf_dir):
    """Per-domain crawl cost estimate (cost_estimation.py:58-129):
    CDX page count → 70% filtering reduction → max_pages cap → time at
    1000 pph with 1.2 retry overhead → cpu+bandwidth+storage cost in
    micro-USD → confidence classification (:208-223)."""
    return CO.estimate_domain_costs(cdx_pages_view(spark, sf_dir))


_COST_CTES = f"""pages_cdx AS ({PAGES_CTE_DUCK}),
counts AS (
  SELECT host, CAST(count(*) AS BIGINT) AS total_pages
  FROM pages_cdx GROUP BY 1),
cfg AS (
  SELECT host, total_pages,
    CASE WHEN host LIKE '%.edu' THEN 60 WHEN host LIKE '%.gov' THEN 500
         WHEN host = 'mega.example.com' THEN NULL ELSE 400 END AS max_pages,
    CASE WHEN host LIKE '%.edu' THEN 'academic'
         WHEN host LIKE '%.gov' THEN 'government'
         ELSE 'web' END AS project
  FROM counts),
est AS (
  SELECT *, CASE WHEN max_pages IS NOT NULL
                 THEN least(CAST(max_pages AS BIGINT),
                            total_pages * 3 // 10)
                 ELSE total_pages * 3 // 10 END AS est_pages
  FROM cfg),
fin AS (
  SELECT host, project, total_pages,
    CAST(est_pages AS BIGINT) AS est_pages,
    CAST(est_pages * 12 // 10 AS BIGINT) AS time_milli_hours,
    CAST((est_pages * 12 // 10) * 50
         + est_pages * 5000000 // 1048576
         + est_pages * 1000000 // 1048576 AS BIGINT) AS cost_micro_usd,
    CASE WHEN total_pages = 0 THEN 'low'
         WHEN total_pages < 1000 AND max_pages IS NOT NULL THEN 'high'
         WHEN total_pages < 10000 THEN 'medium'
         ELSE 'low' END AS confidence
  FROM est)"""

SQL_COST_ESTIMATE = f"""WITH {_COST_CTES}
SELECT host, project, total_pages, est_pages, time_milli_hours,
  cost_micro_usd, confidence
FROM fin"""


def q_project_cost(spark, sf_dir):
    """Project cost rollup (cost_estimation.py:131-206): member-domain
    sums + the all-high / all-high-or-medium confidence fold."""
    return CO.estimate_project_costs(
        CO.estimate_domain_costs(cdx_pages_view(spark, sf_dir)))


SQL_PROJECT_COST = f"""WITH {_COST_CTES}
SELECT project, CAST(count(*) AS BIGINT) AS domain_count,
  CAST(sum(est_pages) AS BIGINT) AS total_pages,
  CAST(sum(cost_micro_usd) AS BIGINT) AS total_cost_micro_usd,
  CAST(sum(time_milli_hours) AS BIGINT) AS total_time_milli_hours,
  CASE WHEN bool_and(confidence = 'high') THEN 'high'
       WHEN bool_and(confidence IN ('high', 'medium')) THEN 'medium'
       ELSE 'low' END AS confidence_level
FROM fin GROUP BY 1"""


# shared field-derivation + baseline/target pairing CTEs
_COMPARE_CTES = f"""pages_cdx AS ({PAGES_CTE_DUCK}),
f AS MATERIALIZED (
  SELECT url, ts14, doc_id, n_cap,
    CASE WHEN doc_id % 4 = 3 AND n_cap > 0
         THEN 'v' || CAST(n_cap AS VARCHAR) || ' '
              || substr(coalesce(text, ''), 1, 64)
         ELSE substr(coalesce(text, ''), 1, 64) END AS title,
    CASE WHEN doc_id % 4 = 2 AND n_cap > 0
         THEN coalesce(text, '') || ' ' || coalesce(text, '') || ' '
              || coalesce(text, '')
         ELSE coalesce(text, '') END AS content,
    CASE WHEN doc_id % 4 = 0 AND n_cap = 0 THEN ''
         ELSE substr(coalesce(text, ''), 1, 160) END AS meta_description,
    CASE WHEN doc_id % 4 = 1 AND n_cap > 0 THEN ''
         ELSE coalesce(lang, '') END AS author
  FROM pages_cdx),
r AS MATERIALIZED (
  SELECT *, row_number() OVER w AS rn,
    count(*) OVER (PARTITION BY url) AS n
  FROM f WINDOW w AS (PARTITION BY url ORDER BY ts14, doc_id, n_cap)),
pair AS MATERIALIZED (
  SELECT b.url,
    b.title AS b_title, t.title AS t_title,
    b.content AS b_content, t.content AS t_content,
    b.meta_description AS b_meta, t.meta_description AS t_meta,
    b.author AS b_author, t.author AS t_author
  FROM (SELECT * FROM r WHERE rn = 1) b
  JOIN (SELECT * FROM r WHERE rn = n AND n >= 2) t USING (url))"""


def _classify_sql(b: str, t: str) -> str:
    return f"""CASE
  WHEN length(trim({b})) = 0 AND length(trim({t})) > 0 THEN 'addition'
  WHEN length(trim({b})) > 0 AND length(trim({t})) = 0 THEN 'deletion'
  WHEN abs(length(trim({b})) - length(trim({t}))) * 2
       > greatest(length(trim({b})), length(trim({t})), 1)
    THEN 'major_modification'
  ELSE 'minor_modification' END"""


def q_page_compare_fields(spark, sf_dir):
    """Per (url, field) change rows — investigation field diff
    (investigation_service.py:414-436 changes dict + :477-491
    classifier), corpus-wide earliest-vs-latest capture."""
    return IV.compare_fields(cdx_pages_view(spark, sf_dir))


_FIELD_ARMS = " UNION ALL ".join(
    f"""SELECT url, '{field}' AS field,
  {_classify_sql('b_' + short, 't_' + short)} AS change_type,
  '{cat}' AS category, CAST({w} AS INT) AS significance_milli
FROM pair WHERE b_{short} <> t_{short}"""
    for field, short, cat, w in [
        ("title", "title", "title_change", 800),
        ("content", "content", "content_change", 900),
        ("meta_description", "meta", "metadata_change", 400),
        ("author", "author", "authorship_change", 600),
    ])

SQL_PAGE_COMPARE_FIELDS = f"WITH {_COMPARE_CTES}\n{_FIELD_ARMS}"


def q_page_compare(spark, sf_dir):
    """Per-URL comparison summary (investigation_service.py:457-474):
    fields changed of 4 compared, overall similarity milli, max category
    significance, is_significant, sorted categories."""
    return IV.compare_summary(cdx_pages_view(spark, sf_dir))


SQL_PAGE_COMPARE = f"""WITH {_COMPARE_CTES},
m AS (
  SELECT url,
    CAST(b_title <> t_title AS INT) + CAST(b_content <> t_content AS INT)
    + CAST(b_meta <> t_meta AS INT) + CAST(b_author <> t_author AS INT)
      AS n_changed,
    greatest(CASE WHEN b_title <> t_title THEN 800 ELSE 0 END,
             CASE WHEN b_content <> t_content THEN 900 ELSE 0 END,
             CASE WHEN b_meta <> t_meta THEN 400 ELSE 0 END,
             CASE WHEN b_author <> t_author THEN 600 ELSE 0 END)
      AS significance,
    list_aggr(list_sort(list_filter([
        CASE WHEN b_title <> t_title THEN 'title_change' END,
        CASE WHEN b_content <> t_content THEN 'content_change' END,
        CASE WHEN b_meta <> t_meta THEN 'metadata_change' END,
        CASE WHEN b_author <> t_author THEN 'authorship_change' END],
      x -> x IS NOT NULL)), 'string_agg', '|') AS change_categories
  FROM pair)
SELECT url, CAST(n_changed AS BIGINT) AS fields_changed,
  CAST(1000 - n_changed * 250 AS BIGINT) AS similarity_milli,
  CAST(significance AS BIGINT) AS significance_milli,
  significance > 500 AS is_significant,
  coalesce(change_categories, '') AS change_categories
FROM m"""


def q_user_engagement(spark, sf_dir):
    """Per-user engagement scoring (user_analytics.py:390-425): capped
    point buckets over planted activity from the events table."""
    return CO.user_engagement(_ev(spark, sf_dir))


def _ev(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


SQL_USER_ENGAGEMENT = """WITH agg AS (
  SELECT user_id,
    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
      AS login_count,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
      AS searches_performed,
    CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                             THEN (event_id * 13 + 7) % 1000 END) AS BIGINT)
      AS projects_created,
    max(ts) AS last_seen
  FROM events GROUP BY 1),
mx AS (SELECT max(last_seen) AS now_ts FROM agg),
d AS (
  SELECT a.*,
    (CAST(floor(epoch(m.now_ts)) AS BIGINT)
     - CAST(floor(epoch(a.last_seen)) AS BIGINT)) // 86400 AS days_since
  FROM agg a CROSS JOIN mx m)
SELECT user_id, login_count, projects_created, searches_performed,
  CAST(least(100,
    least(login_count * 3, 30) + least(projects_created * 5, 25)
    + least(searches_performed * 2, 20)
    + CASE WHEN days_since <= 7 THEN greatest(15 - days_since * 2, 0)
           ELSE 0 END
    + CASE WHEN user_id % 2 = 0 THEN 5 ELSE 0 END
    + CASE WHEN user_id % 3 <> 0 THEN 5 ELSE 0 END) AS INT)
  AS engagement_score
FROM d"""


QUERIES = {
    "cost_estimate": q_cost_estimate,
    "project_cost": q_project_cost,
    "page_compare": q_page_compare,
    "page_compare_fields": q_page_compare_fields,
    "user_engagement": q_user_engagement,
}

ORACLES = {
    "cost_estimate": SQL_COST_ESTIMATE,
    "project_cost": SQL_PROJECT_COST,
    "page_compare": SQL_PAGE_COMPARE,
    "page_compare_fields": SQL_PAGE_COMPARE_FIELDS,
    "user_engagement": SQL_USER_ENGAGEMENT,
}


def q_project_efficiency(spark, sf_dir):
    """Per-project dedup-efficiency rollup
    (enhanced_project_creation.py:382-427)."""
    from chrono_scraper_spark.operators.projects import project_efficiency
    return project_efficiency(cdx_pages_view(spark, sf_dir))


SQL_PROJECT_EFFICIENCY = f"""WITH pages_cdx AS ({PAGES_CTE_DUCK}),
tagged AS (
  SELECT *, CASE WHEN host LIKE '%.edu' THEN 'academic'
                 WHEN host LIKE '%.gov' THEN 'government'
                 ELSE 'web' END AS project
  FROM pages_cdx),
share AS (
  SELECT digest, count(DISTINCT project) AS nproj
  FROM tagged GROUP BY 1),
d AS (SELECT t.*, s.nproj FROM tagged t JOIN share s USING (digest)),
per AS (
  SELECT project,
    CAST(count(*) AS BIGINT) AS total_pages_discovered,
    CAST(sum(CASE WHEN nproj >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      AS pages_linked,
    CAST(sum(CASE WHEN nproj < 2 AND status <> 200 THEN 1 ELSE 0 END)
         AS BIGINT) AS pages_already_processing
  FROM d GROUP BY 1),
m AS (
  SELECT *,
    total_pages_discovered - pages_linked - pages_already_processing
      AS pages_to_scrape
  FROM per)
SELECT project, total_pages_discovered, pages_linked,
  pages_already_processing, pages_to_scrape,
  CASE WHEN pages_linked + pages_to_scrape > 0
       THEN pages_linked * 100000 // (pages_linked + pages_to_scrape)
       ELSE CAST(0 AS BIGINT) END AS scraping_reduction_milli,
  pages_linked * 10000 // 3600 AS time_saved_milli_hours,
  pages_linked * 100000 // greatest(total_pages_discovered, 1)
    AS overall_efficiency_milli,
  CASE WHEN pages_linked * 100000 // greatest(total_pages_discovered, 1)
            > 50000 THEN 'High'
       WHEN pages_linked * 100000 // greatest(total_pages_discovered, 1)
            > 20000 THEN 'Medium'
       ELSE 'Low' END AS sharing_potential,
  CASE WHEN pages_linked * 100000 // greatest(total_pages_discovered, 1)
            > 60000 THEN 'Excellent'
       WHEN pages_linked * 100000 // greatest(total_pages_discovered, 1)
            > 30000 THEN 'Good'
       ELSE 'Standard' END AS resource_optimization_level
FROM m"""


QUERIES["project_efficiency"] = q_project_efficiency
ORACLES["project_efficiency"] = SQL_PROJECT_EFFICIENCY
