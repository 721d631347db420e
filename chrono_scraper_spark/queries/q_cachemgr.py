"""Contract queries: multi-level cache management
(intelligent_cache_manager.py — level classifier, stats, top keys)."""

from __future__ import annotations

from chrono_scraper_spark.operators import cachemgr as CM


def _ev(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_cache_level_assign(spark, sf_dir):
    """Cache-level classifier + compression candidacy
    (intelligent_cache_manager.py:657-674, :699)."""
    return CM.level_assign(_ev(spark, sf_dir))


def q_cache_stats(spark, sf_dir):
    """CacheStats rollup (:77-90)."""
    return CM.cache_stats(_ev(spark, sf_dir))


def q_cache_top_keys(spark, sf_dir):
    """Top-10 keys by access count (:86)."""
    return CM.top_keys(_ev(spark, sf_dir))


SQL_CACHE_LEVEL_ASSIGN = """WITH e AS (
  SELECT event_id AS entry_id,
    CAST(event_id * 811 % 1500000 AS BIGINT) AS result_size,
    CAST(event_id * 53 % 7200 AS BIGINT) AS ttl_seconds
  FROM events)
SELECT entry_id, result_size, ttl_seconds,
  CASE WHEN result_size < 10240 AND ttl_seconds > 3600 THEN 'memory'
       WHEN result_size < 1048576 AND ttl_seconds > 300 THEN 'redis'
       ELSE 'persistent' END AS cache_level,
  result_size >= 1024 AS compression_candidate
FROM e"""


SQL_CACHE_STATS = """WITH per_key AS (
  SELECT user_id,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         AS BIGINT) AS hits,
    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         AS BIGINT) AS misses
  FROM events GROUP BY 1),
sz AS (
  SELECT CAST(sum(event_id * 811 % 1500000) AS BIGINT)
    AS total_size_bytes
  FROM events),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS total_entries,
    CAST(sum(hits) AS BIGINT) AS hits,
    CAST(sum(misses) AS BIGINT) AS misses
  FROM per_key)
SELECT total_entries, total_size_bytes, hits, misses,
  hits * 1000 // greatest(hits + misses, 1) AS hit_rate_milli,
  misses * 1000 // greatest(hits + misses, 1) AS miss_rate_milli
FROM agg CROSS JOIN sz"""


SQL_CACHE_TOP_KEYS = """WITH per_key AS (
  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS access_count
  FROM events GROUP BY 1),
r AS (
  SELECT CAST(row_number() OVER (ORDER BY access_count DESC, key ASC)
              AS INT) AS rank, key, access_count
  FROM per_key)
SELECT rank, key, access_count FROM r WHERE rank <= 10"""


QUERIES = {
    "cache_level_assign": q_cache_level_assign,
    "cache_stats": q_cache_stats,
    "cache_top_keys": q_cache_top_keys,
}

ORACLES = {
    "cache_level_assign": SQL_CACHE_LEVEL_ASSIGN,
    "cache_stats": SQL_CACHE_STATS,
    "cache_top_keys": SQL_CACHE_TOP_KEYS,
}
