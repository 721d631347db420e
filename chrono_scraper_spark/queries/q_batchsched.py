"""Contract queries: batch-job scheduling (batch_scheduler.py —
requirement estimation, priority queue order, capacity gate).

Spark side is ``operators/batchsched.py``; oracles replay the planted
job synthesis, the clamp arithmetic and the queue sort in DuckDB over
the driver ``events`` table + the oracle-parity CDX corpus.
"""

from __future__ import annotations

from chrono_scraper_spark.corpus import PAGES_CTE_DUCK, cdx_pages_view
from chrono_scraper_spark.operators import batchsched as BS


def _ev(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_batch_jobs(spark, sf_dir):
    """Scheduled jobs with size/memory/duration estimates
    (batch_scheduler.py:246-294, :657-683)."""
    return BS.plan_jobs(_ev(spark, sf_dir), cdx_pages_view(spark, sf_dir))


def q_batch_queue_order(spark, sf_dir):
    """Priority-desc / scheduled-asc queue positions (:736-738)."""
    return BS.queue_order(_ev(spark, sf_dir),
                          cdx_pages_view(spark, sf_dir))


def q_batch_capacity(spark, sf_dir):
    """has_capacity_for gate under the planted resource snapshot
    (:120-132)."""
    return BS.capacity_check(_ev(spark, sf_dir),
                             cdx_pages_view(spark, sf_dir))


_JOBS_CTES = f"""pages_cdx AS ({PAGES_CTE_DUCK}),
cnt AS (
  SELECT CAST(count(*) AS BIGINT) AS cdx_count,
    CAST(sum(CASE WHEN status = 200
                   AND length(trim(coalesce(text, ''))) > 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS content_count
  FROM pages_cdx),
jobs AS (
  SELECT event_id AS job_id,
    CASE event_type WHEN 'view' THEN 'cdx_analytics'
         WHEN 'click' THEN 'content_analytics'
         WHEN 'purchase' THEN 'project_analytics'
         ELSE 'system_events' END AS batch_type,
    CAST([1, 5, 10, 20][CAST(event_id % 4 + 1 AS INT)] AS INT)
      AS priority,
    ts AS scheduled_at
  FROM events),
est AS (
  SELECT j.*, c.cdx_count, c.content_count,
    CAST(CASE j.batch_type
      WHEN 'cdx_analytics' THEN 50000
      WHEN 'content_analytics' THEN 25000
      WHEN 'project_analytics' THEN 10000
      ELSE 10000 END AS INT) AS batch_size,
    CAST(CASE j.batch_type
      WHEN 'cdx_analytics'
        THEN least(greatest(c.cdx_count // 1000, 256), 2048)
      WHEN 'content_analytics'
        THEN least(greatest(c.content_count // 500, 512), 4096)
      WHEN 'project_analytics' THEN 256
      ELSE 128 END AS BIGINT) AS estimated_memory_mb,
    CAST(CASE j.batch_type
      WHEN 'cdx_analytics' THEN greatest(c.cdx_count // 10000, 5)
      WHEN 'content_analytics'
        THEN greatest(c.content_count // 5000, 10)
      WHEN 'project_analytics' THEN 5
      ELSE 2 END AS BIGINT) AS estimated_duration_minutes
  FROM jobs j CROSS JOIN cnt c)"""


SQL_BATCH_JOBS = f"""WITH {_JOBS_CTES}
SELECT job_id, batch_type, priority, scheduled_at, batch_size,
  estimated_memory_mb, estimated_duration_minutes
FROM est"""


SQL_BATCH_QUEUE_ORDER = f"""WITH {_JOBS_CTES}
SELECT job_id, batch_type, priority, scheduled_at,
  CAST(row_number() OVER (ORDER BY priority DESC, scheduled_at ASC,
                          job_id ASC) AS INT) AS position
FROM est"""


SQL_BATCH_CAPACITY = f"""WITH {_JOBS_CTES}
SELECT job_id, batch_type, estimated_memory_mb,
  750 > estimated_memory_mb * 3 // 2 AS has_capacity
FROM est"""


QUERIES = {
    "batch_jobs": q_batch_jobs,
    "batch_queue_order": q_batch_queue_order,
    "batch_capacity": q_batch_capacity,
}

ORACLES = {
    "batch_jobs": SQL_BATCH_JOBS,
    "batch_queue_order": SQL_BATCH_QUEUE_ORDER,
    "batch_capacity": SQL_BATCH_CAPACITY,
}
