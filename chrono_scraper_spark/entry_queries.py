"""Driver-contract query registry: every operator as a (Spark fn, DuckDB
oracle SQL) pair.

``__spark_entry__.py`` exposes these through ``queries()`` / ``oracle_sql()``.
Each Spark callable runs the ENGINE operators (chrono_scraper_spark.*) over
the driver's parquet tables at ``sf_dir``; each oracle is independent ANSI
SQL for DuckDB over the same tables (views pre-registered by the driver).
Column names/types are aligned pairwise — the driver hash-compares values
after sorting columns by name.

The crawl-family queries run over the *oracle-parity CDX corpus*
(corpus.PAGES_CTE_*): a deterministic frontier derived from ``documents`` by
an identical SQL template on both engines, so every crawl operator
(filters, dedup, politeness, ordering, analytics) is value-checkable
end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chrono_scraper_spark import config as C
from chrono_scraper_spark.corpus import PAGES_CTE_DUCK, cdx_pages_view
from chrono_scraper_spark.functions import oracle_gen as OG
from chrono_scraper_spark.functions import textops as T
from chrono_scraper_spark.functions.urls import (
    url_depth,
    url_extension,
    url_host,
    url_path,
)
from chrono_scraper_spark.operators import analytics as A
from chrono_scraper_spark.operators import ann as ANN
from chrono_scraper_spark.operators import intervals as IV
from chrono_scraper_spark.operators import pii as PII
from chrono_scraper_spark.operators import text_dedup as TD
from chrono_scraper_spark.operators import url_quality as UQ
from chrono_scraper_spark.operators.asof import asof_join
from chrono_scraper_spark.operators.dedup import (
    anti_join_seen,
    bloom_prefilter_anti_join,
    categorize_against_registry,
    collapse_digest,
    cuckoo_prefilter_anti_join,
    snapshot_diff,
)
from chrono_scraper_spark.operators.filters import filter_stats, with_filter_decision
from chrono_scraper_spark.operators.index import build_inverted_terms, tokenize
from chrono_scraper_spark.operators.politeness import schedule_round, with_global_order

# --------------------------------------------------------------------------
# shared preludes
# --------------------------------------------------------------------------
# DuckDB prelude: the CDX frontier + the server-side CDX filter (S1)
_PRELUDE = (f"WITH pages_cdx AS ({PAGES_CTE_DUCK}), "
            f"cand AS (SELECT * FROM pages_cdx WHERE status = 200 "
            f"AND mime IN ('text/html','application/pdf'))")

_DCOLS = OG.decision_columns_sql()
_DECIDED = (_PRELUDE + f""",
decided AS (
  SELECT url, ts14, host, length, digest,
    {_DCOLS['status']} AS status,
    {_DCOLS['reason']} AS reason,
    {_DCOLS['confidence']} AS confidence,
    {_DCOLS['matched_pattern']} AS matched_pattern,
    {_DCOLS['priority_score']} AS priority_score
  FROM cand
)""")

_BUDGET_RPS, _BUDGET_BURST, _BUDGET_SECONDS = 0.1, 2, 60.0
_BUDGET0 = int(_BUDGET_RPS * _BUDGET_SECONDS) + _BUDGET_BURST  # round-0: 8

_SCHEDULED = (_DECIDED + f""",
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY host
            ORDER BY priority_score DESC, url ASC, ts14 ASC) AS INT)
            AS host_rank
  FROM decided WHERE status = 'pending'
),
scheduled AS (
  SELECT *, CASE WHEN host_rank <= {_BUDGET0} THEN 'scheduled'
                 ELSE 'deferred' END AS sched_status
  FROM ranked
)""")


def _cand(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = cdx_pages_view(spark, sf_dir)
    return df.filter((F.col("status") == 200)
                     & F.col("mime").isin("text/html", "application/pdf"))


def _decided(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_filter_decision(_cand(spark, sf_dir))


def _scheduled(spark: SparkSession, sf_dir: str) -> DataFrame:
    pending = _decided(spark, sf_dir).filter(
        F.col("decision.status") == C.STATUS_PENDING)
    return schedule_round(pending, round_idx=0, rps=_BUDGET_RPS,
                          burst=_BUDGET_BURST, round_seconds=_BUDGET_SECONDS)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# crawl family
# --------------------------------------------------------------------------

def q_filter_decisions(spark, sf_dir):
    return _decided(spark, sf_dir).select(
        "url", "ts14",
        F.col("decision.status").alias("status"),
        F.col("decision.reason").alias("reason"),
        F.col("decision.confidence").alias("confidence"),
        F.col("decision.matched_pattern").alias("matched_pattern"),
        F.col("decision.priority_score").alias("priority_score"),
    )


SQL_FILTER_DECISIONS = _DECIDED + """
SELECT url, ts14, status, reason, confidence, matched_pattern, priority_score
FROM decided"""


def q_filter_stats(spark, sf_dir):
    return filter_stats(_decided(spark, sf_dir))


SQL_FILTER_STATS = _DECIDED + """
SELECT status, reason, count(*) AS n FROM decided GROUP BY 1, 2"""


def q_collapse_digest(spark, sf_dir):
    return collapse_digest(_cand(spark, sf_dir)).select("url", "ts14", "digest")


SQL_COLLAPSE_DIGEST = _PRELUDE + """
SELECT url, ts14, digest FROM cand
QUALIFY row_number() OVER (PARTITION BY digest
                           ORDER BY warc_ts ASC, url ASC) = 1"""


def _seen(spark, sf_dir):
    return _cand(spark, sf_dir).filter(F.col("doc_id") % 7 == 0) \
        .select("url", "ts14")


SQL_SEEN_ANTI_JOIN = _PRELUDE + """
SELECT c.url, c.ts14 FROM cand c
ANTI JOIN (SELECT url, ts14 FROM cand WHERE doc_id % 7 = 0) s
  ON c.url = s.url AND c.ts14 = s.ts14"""


def q_seen_antijoin(spark, sf_dir):
    return anti_join_seen(_cand(spark, sf_dir), _seen(spark, sf_dir),
                          keys=["url", "ts14"]).select("url", "ts14")


def q_seen_antijoin_bloom(spark, sf_dir):
    return bloom_prefilter_anti_join(
        _cand(spark, sf_dir), _seen(spark, sf_dir), keys=["url", "ts14"],
    ).select("url", "ts14")


def q_seen_antijoin_bloom_bucketed(spark, sf_dir):
    """The 10^10-key dedup path: per-bucket executor-built filters (no
    global broadcast), exact anti-join on the maybe-seen remainder — output
    provably identical to the plain anti-join oracle."""
    return bloom_prefilter_anti_join(
        _cand(spark, sf_dir), _seen(spark, sf_dir), keys=["url", "ts14"],
        n_buckets=8,
    ).select("url", "ts14")


def q_seen_antijoin_cuckoo(spark, sf_dir):
    """D4 via the sharded cuckoo filter (functions/cuckoo.py — deletable
    seen set, north-star's Bloom/Cuckoo alternative): broadcast shard
    tables prefilter, exact anti-join confirms — output provably identical
    to the plain anti-join oracle."""
    return cuckoo_prefilter_anti_join(
        _cand(spark, sf_dir), _seen(spark, sf_dir), keys=["url", "ts14"],
        n_shards=4,
    ).select("url", "ts14")


def q_url_blocklist(spark, sf_dir):
    """RefinedWeb-style URL filtering (operators/url_quality.py): exact
    broadcast domain blocklist + codegen banned-word score. Spam fragments
    planted deterministically (synthetic frontier URLs carry none);
    blocklist = hosts of every doc_id % 31 == 0 row."""
    cand = _cand(spark, sf_dir)
    did = F.col("doc_id")
    planted = cand.withColumn("url", F.concat(
        F.col("url"),
        F.when(did % 9 == 0, F.lit("?ref=casino-bonus"))
        .when(did % 21 == 0, F.lit("/adult-dating-webcam"))
        .when(did % 33 == 0, F.lit("/viagra-pills-xxx"))
        .otherwise(F.lit(""))))
    bl = planted.filter(did % 31 == 0).select(F.col("host").alias("domain"))
    out = UQ.with_url_quality(planted, bl)
    return out.select(
        "url", "ts14", "blocklisted",
        F.col("url_spam_score").cast("double").alias("url_spam_score"),
        "url_decision")


SQL_URL_BLOCKLIST = _PRELUDE + f""",
planted AS (
  SELECT url ||
    CASE WHEN doc_id % 9 = 0 THEN '?ref=casino-bonus'
         WHEN doc_id % 21 = 0 THEN '/adult-dating-webcam'
         WHEN doc_id % 33 = 0 THEN '/viagra-pills-xxx'
         ELSE '' END AS url,
    ts14, host, doc_id
  FROM cand
),
bl AS (SELECT DISTINCT host AS domain FROM planted WHERE doc_id % 31 = 0),
scored AS (
  SELECT p.url, p.ts14,
    (b.domain IS NOT NULL) AS blocklisted,
    {UQ.sql_url_spam_score('p.url')} AS url_spam_score
  FROM planted p LEFT JOIN bl b ON p.host = b.domain
)
SELECT url, ts14, blocklisted,
  CAST(url_spam_score AS DOUBLE) AS url_spam_score,
  CASE WHEN blocklisted THEN 'blocked_domain'
       WHEN url_spam_score >= {UQ.BLOCK_THRESHOLD} THEN 'blocked_spam'
       ELSE 'clean' END AS url_decision
FROM scored"""


def q_registry_categorize(spark, sf_dir):
    cand = _cand(spark, sf_dir)
    registry = cand.filter(F.col("doc_id") % 5 < 2).select(
        F.col("url").alias("url_canon"), "ts14",
        F.when(F.col("doc_id") % 5 == 0, "completed")
        .otherwise("pending").alias("scrape_status"))
    out = categorize_against_registry(
        cand.withColumn("url_canon", F.col("url")), registry)
    return out.select(F.col("url_canon").alias("url"), "ts14", "dedup_category")


SQL_REGISTRY_CATEGORIZE = _PRELUDE + """
, registry AS (
  SELECT url, ts14,
         CASE WHEN doc_id % 5 = 0 THEN 'completed' ELSE 'pending' END
           AS scrape_status
  FROM cand WHERE doc_id % 5 < 2
)
SELECT c.url, c.ts14,
  CASE WHEN r.scrape_status = 'completed' THEN 'to_link'
       WHEN r.scrape_status IN ('pending', 'in_progress')
         THEN 'already_processing'
       ELSE 'to_scrape' END AS dedup_category
FROM cand c LEFT JOIN registry r ON c.url = r.url AND c.ts14 = r.ts14"""


def q_politeness_schedule(spark, sf_dir):
    return _scheduled(spark, sf_dir).select(
        "url", "ts14", "host", "host_rank", "sched_status")


SQL_POLITENESS_SCHEDULE = _SCHEDULED + """
SELECT url, ts14, host, host_rank, sched_status FROM scheduled"""


def q_politeness_schedule_pruned(spark, sf_dir):
    """The mega-host-safe two-phase ranking (prune per (host, salt), exact
    window on survivors): scheduled set + scheduled ranks provably identical
    to the full window; deferred rows carry a null rank. The oracle computes
    the full window and nulls ranks beyond budget — hash-match proves the
    pruned path exact."""
    pending = _decided(spark, sf_dir).filter(
        F.col("decision.status") == C.STATUS_PENDING)
    out = schedule_round(pending, round_idx=0, rps=_BUDGET_RPS,
                         burst=_BUDGET_BURST, round_seconds=_BUDGET_SECONDS,
                         prune_salt_k=8)
    return out.select("url", "ts14", "host", "host_rank", "sched_status")


SQL_POLITENESS_SCHEDULE_PRUNED = _SCHEDULED + f"""
SELECT url, ts14, host,
  CASE WHEN host_rank <= {_BUDGET0} THEN host_rank END AS host_rank,
  sched_status
FROM scheduled"""


def q_crawl_order(spark, sf_dir):
    # _global_order_cache contract: one range-partitioned frame stays cached
    # until the caller unpersists (CrawlJob.run_round does); in this
    # collect-and-exit driver path it is reclaimed by the ContextCleaner
    # when the returned DataFrame is dropped (bench.py additionally
    # clearCache()s between phases).
    sched = _scheduled(spark, sf_dir).filter(
        F.col("sched_status") == "scheduled")
    return with_global_order(sched).select("seq", "url", "ts14")


SQL_CRAWL_ORDER = _SCHEDULED + """
SELECT row_number() OVER (ORDER BY priority_score DESC, url ASC, ts14 ASC)
         AS seq,
       url, ts14
FROM scheduled WHERE sched_status = 'scheduled'"""


def q_url_parts(spark, sf_dir):
    urls = cdx_pages_view(spark, sf_dir).select("url").distinct()
    u = F.col("url")
    return urls.select(
        "url", url_host(u).alias("host"), url_path(u).alias("path"),
        url_depth(u).cast("long").alias("url_depth"),
        url_extension(u).alias("file_extension"))


SQL_URL_PARTS = _PRELUDE + """
, urls AS (SELECT DISTINCT url FROM pages_cdx),
parts AS (
  SELECT url,
    lower(regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1)) AS host,
    coalesce(nullif(regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1),
                    ''), '/') AS path
  FROM urls
)
SELECT url, host, path,
  len(list_filter(string_split(path, '/'), s -> s != '')) AS url_depth,
  CASE WHEN contains(list_extract(string_split(lower(path), '/'), -1), '.')
       THEN '.' || list_extract(
              string_split(list_extract(string_split(lower(path), '/'), -1),
                           '.'), -1)
       ELSE '' END AS file_extension
FROM parts"""


# --------------------------------------------------------------------------
# analytics family
# --------------------------------------------------------------------------

def q_cdx_analytics(spark, sf_dir):
    return A.cdx_analytics_transform(cdx_pages_view(spark, sf_dir)).select(
        "url", "capture_date", "capture_year", "capture_month",
        "capture_hour", "mime_type", "status_code", "content_length",
        "content_size_category", "success_indicator")


SQL_CDX_ANALYTICS = _PRELUDE + """
SELECT url,
  CAST(warc_ts AS DATE) AS capture_date,
  CAST(year(warc_ts) AS INT) AS capture_year,
  CAST(month(warc_ts) AS INT) AS capture_month,
  CAST(hour(warc_ts) AS INT) AS capture_hour,
  mime AS mime_type, status AS status_code, length AS content_length,
  CASE WHEN length < 1024 THEN 'tiny'
       WHEN length < 10240 THEN 'small'
       WHEN length < 102400 THEN 'medium'
       WHEN length < 1048576 THEN 'large'
       ELSE 'huge' END AS content_size_category,
  CAST(status = 200 AS INT) AS success_indicator
FROM pages_cdx"""


def _fact(spark, sf_dir):
    return A.cdx_analytics_transform(cdx_pages_view(spark, sf_dir))


def q_daily_stats(spark, sf_dir):
    return A.daily_stats(_fact(spark, sf_dir))


SQL_DAILY_STATS = _PRELUDE + """
SELECT CAST(warc_ts AS DATE) AS capture_date,
  count(*) AS total_records,
  count(DISTINCT lower(regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1)))
    AS unique_domains,
  round(avg(length), 4) AS avg_content_length,
  CAST(sum(CAST(status = 200 AS INT)) AS BIGINT) AS success_count
FROM pages_cdx GROUP BY 1"""


def q_status_percentiles(spark, sf_dir):
    return A.status_percentiles(_fact(spark, sf_dir))


SQL_STATUS_PERCENTILES = _PRELUDE + """
SELECT status AS status_code,
  round(quantile_cont(length, 0.5), 4) AS p50_length,
  round(quantile_cont(length, 0.95), 4) AS p95_length,
  count(*) AS n
FROM pages_cdx GROUP BY 1"""


def q_domain_profile(spark, sf_dir):
    return A.domain_profile(_fact(spark, sf_dir))


SQL_DOMAIN_PROFILE = _PRELUDE + """
SELECT lower(regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1)) AS url_domain,
  count(*) AS n_captures,
  count(DISTINCT url) AS n_urls,
  round(avg(len(list_filter(string_split(
    coalesce(nullif(regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1),
             ''), '/'), '/'), s -> s != ''))), 4) AS avg_depth,
  array_to_string(list_sort(list_distinct(list(mime))), ',') AS mime_types
FROM pages_cdx GROUP BY 1"""


def q_domain_similarity(spark, sf_dir):
    """J4 theta self-join: per-domain content profiles, pairwise similarity
    (sample_queries.sql:278-309), top-20 most-similar pairs."""
    return A.domain_similarity_pairs(cdx_pages_view(spark, sf_dir),
                                     min_pages=20, top_n=20)


SQL_DOMAIN_SIMILARITY = _PRELUDE + f"""
, prof AS (
  SELECT host AS domain,
    avg({OG.token_count_ws_sql('text')}) AS avg_word_count,
    count(*) AS total_pages
  FROM pages_cdx GROUP BY 1 HAVING count(*) >= 20
)
SELECT d1.domain AS domain_1, d2.domain AS domain_2,
  round(abs(d1.avg_word_count - d2.avg_word_count), 6) AS word_count_diff,
  round(abs(d1.avg_word_count - d2.avg_word_count) / 1000.0, 6)
    AS similarity_score
FROM prof d1 CROSS JOIN prof d2
WHERE d1.domain < d2.domain
ORDER BY similarity_score ASC, domain_1 ASC, domain_2 ASC
LIMIT 20"""


def q_size_distribution(spark, sf_dir):
    return A.size_distribution(_fact(spark, sf_dir))


SQL_SIZE_DISTRIBUTION = _PRELUDE + """
, bucketed AS (
  SELECT CASE WHEN length < 1024 THEN 'tiny'
              WHEN length < 10240 THEN 'small'
              WHEN length < 102400 THEN 'medium'
              WHEN length < 1048576 THEN 'large'
              ELSE 'huge' END AS content_size_category
  FROM pages_cdx
), counts AS (
  SELECT content_size_category, count(*) AS n FROM bucketed GROUP BY 1
)
SELECT content_size_category, n,
  round(n * 100.0 / sum(n) OVER (), 4) AS pct
FROM counts"""


# --------------------------------------------------------------------------
# windows / intervals over events
# --------------------------------------------------------------------------

def _event_intervals(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        F.unix_timestamp("ts").alias("start"),
        (F.unix_timestamp("ts")
         + (F.col("value") * 10).cast("long") + 1).alias("end"))


_SQL_EVENT_INTERVALS = """
intervals AS (
  SELECT user_id,
    CAST(floor(epoch(ts)) AS BIGINT) AS start,
    CAST(floor(epoch(ts)) AS BIGINT)
      + CAST(floor(value * 10) AS BIGINT) + 1 AS "end"
  FROM events
)"""


def q_interval_merge(spark, sf_dir):
    return IV.merge_intervals(_event_intervals(spark, sf_dir), "user_id")


SQL_INTERVAL_MERGE = f"""WITH {_SQL_EVENT_INTERVALS},
marked AS (
  SELECT user_id, start, "end",
    CASE WHEN max("end") OVER (PARTITION BY user_id ORDER BY start, "end"
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      OR start > max("end") OVER (PARTITION BY user_id ORDER BY start, "end"
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      THEN 1 ELSE 0 END AS new_island
  FROM intervals
),
islands AS (
  SELECT user_id, start, "end",
    sum(new_island) OVER (PARTITION BY user_id ORDER BY start, "end"
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
)
SELECT user_id, min(start) AS start, max("end") AS "end"
FROM islands GROUP BY user_id, island"""


def q_gap_detect(spark, sf_dir):
    return IV.detect_gaps(_event_intervals(spark, sf_dir), "user_id",
                          min_gap=3600)


SQL_GAP_DETECT = f"""WITH {_SQL_EVENT_INTERVALS},
marked AS (
  SELECT user_id, start, "end",
    CASE WHEN max("end") OVER (PARTITION BY user_id ORDER BY start, "end"
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      OR start > max("end") OVER (PARTITION BY user_id ORDER BY start, "end"
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      THEN 1 ELSE 0 END AS new_island
  FROM intervals
),
islands AS (
  SELECT user_id, start, "end",
    sum(new_island) OVER (PARTITION BY user_id ORDER BY start, "end"
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
),
merged AS (
  SELECT user_id, min(start) AS start, max("end") AS "end"
  FROM islands GROUP BY user_id, island
)
SELECT user_id, "end" AS gap_start,
  lead(start) OVER (PARTITION BY user_id ORDER BY start) AS gap_end,
  CAST(lead(start) OVER (PARTITION BY user_id ORDER BY start) AS DOUBLE)
    - CAST("end" AS DOUBLE) AS gap_size
FROM merged
QUALIFY gap_end IS NOT NULL AND gap_size >= 3600"""


def q_sliding_window_count(spark, sf_dir):
    """P6 sliding-window rate limiter analog: events per user in the
    preceding hour (rate_limiter.py:89-175)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "epoch_s", F.unix_timestamp("ts"))
    w = (Window.partitionBy("user_id").orderBy("epoch_s")
         .rangeBetween(-3600, 0))
    return ev.select("event_id",
                     F.count(F.lit(1)).over(w).alias("n_in_window"))


SQL_SLIDING_WINDOW_COUNT = """
WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
  FROM events
)
SELECT event_id,
  count(*) OVER (PARTITION BY user_id ORDER BY epoch_s
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    AS n_in_window
FROM e"""


def q_events_tumbling(spark, sf_dir):
    """T1 micro-batch analog: 1-hour tumbling-window rollup per event type
    (the Structured Streaming windowed agg run in batch mode)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("value").cast("decimal(18,4)"))
                         .cast("double"), 4).alias("sum_value"))
            .select(F.col("w.start").cast("timestamp").alias("window_start"),
                    "event_type", "n", "sum_value"))


SQL_EVENTS_TUMBLING = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
  count(*) AS n,
  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
FROM events GROUP BY 1, 2"""


def q_events_sessionize(spark, sf_dir):
    """T-family extension: gap-based sessionization via Spark's native
    ``session_window`` (30-min inactivity gap per user) — the same operator
    Structured Streaming uses for stateful session aggregation, run here in
    batch. Spark semantics (probed): events merge when the gap is ≤ 30 min;
    ``end`` = last event + gap. Oracle: classic lag/gap-islands CTE."""
    ev = _t(spark, sf_dir, "events")
    out = (ev.withColumn("ts", F.col("ts").cast("timestamp"))
           .groupBy(F.session_window("ts", "30 minutes").alias("w"),
                    "user_id")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.min("event_id").alias("first_event_id"),
                F.max("event_id").alias("last_event_id")))
    return out.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events", "first_event_id", "last_event_id")


SQL_EVENTS_SESSIONIZE = """
WITH o AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_id,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
  min(ts) AS session_start,
  max(ts) + INTERVAL 30 MINUTE AS session_end,
  count(*) AS n_events,
  min(event_id) AS first_event_id,
  max(event_id) AS last_event_id
FROM s GROUP BY user_id, sid"""


def q_asof_join(spark, sf_dir):
    """J8 as-of join (operators/asof.py — union+window, one shuffle, no
    range explosion): each event joined to the latest at-or-before
    snapshot event of the same user (snapshots = event_id % 20 == 0,
    deduped per (user_id, ts) keeping max event_id). Oracle is DuckDB's
    NATIVE ASOF JOIN — a fully independent implementation."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts") \
        .orderBy(F.col("snap_event_id").desc())
    snaps = (ev.filter(F.col("event_id") % 20 == 0)
             .select("user_id", "ts",
                     F.col("event_id").alias("snap_event_id"),
                     F.col("value").alias("snap_value"))
             .withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1).drop("__rn"))
    left = ev.filter(F.col("event_id") % 20 != 0) \
        .select("event_id", "user_id", "ts")
    out = asof_join(left, snaps, on=["user_id"])
    return out.select(
        "event_id", "user_id",
        F.col("asof_snap_event_id").alias("snap_event_id"),
        F.col("asof_snap_value").alias("snap_value"),
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.col("asof_ts").cast("timestamp")))
        .alias("staleness_us"))


SQL_ASOF_JOIN = """
WITH snaps AS (
  SELECT user_id, ts, snap_event_id, snap_value FROM (
    SELECT user_id, ts, event_id AS snap_event_id, value AS snap_value,
      row_number() OVER (PARTITION BY user_id, ts
                         ORDER BY event_id DESC) AS rn
    FROM events WHERE event_id % 20 = 0)
  WHERE rn = 1
),
l AS (SELECT event_id, user_id, ts FROM events WHERE event_id % 20 != 0)
SELECT l.event_id, l.user_id, s.snap_event_id, s.snap_value,
  epoch_us(l.ts) - epoch_us(s.ts) AS staleness_us
FROM l ASOF LEFT JOIN snaps s
  ON l.user_id = s.user_id AND l.ts >= s.ts"""


# --------------------------------------------------------------------------
# text analysis over documents
# --------------------------------------------------------------------------

def q_doc_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        T.token_count_ws(t).cast("long").alias("n_tokens_ws"),
        T.token_count_bpe(t).cast("long").alias("n_tokens_bpe"),
        F.length(t).cast("long").alias("n_chars"),
        T.fingerprint(t).alias("fingerprint"))


SQL_DOC_STATS = f"""
SELECT doc_id,
  {OG.token_count_ws_sql('text')} AS n_tokens_ws,
  {OG.token_count_bpe_sql('text')} AS n_tokens_bpe,
  length(text) AS n_chars,
  {OG.fingerprint_sql('text')} AS fingerprint
FROM documents"""


def q_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", T.langid(F.col("text")).alias("lang_pred"))


SQL_LANGID = f"""
SELECT doc_id, {OG.langid_sql('text')} AS lang_pred FROM documents"""


def _docs_with_pii(spark, sf_dir):
    """Deterministic PII planting (the documents corpus is synthetic prose
    with no organic PII): typed fragments derived from doc_id, mirrored
    verbatim by the oracle CTE chain."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did, text = F.col("doc_id"), F.col("text")
    text = F.when(did % 7 == 0, F.concat(
        text, F.lit(" contact user"), did.cast("string"),
        F.lit("@example.com for details"))).otherwise(text)
    text = F.when(did % 11 == 0, F.concat(
        text, F.lit(" server at 192.168."), (did % 250).cast("string"),
        F.lit("."), ((did * 7) % 250).cast("string"))).otherwise(text)
    text = F.when(did % 13 == 0, F.concat(
        text, F.lit(" call (555) 123-4567 or 555.987.6543 today")))\
        .otherwise(text)
    text = F.when(did % 17 == 0, F.concat(
        text, F.lit(" ssn 123-45-6789 on file"))).otherwise(text)
    return d.select("doc_id", text.alias("text"))


def q_pii_redact(spark, sf_dir):
    """PII anonymization (operators/pii.py): typed placeholder redaction +
    per-family counts, value-checked to the byte via md5 of the redacted
    text. Zero-shuffle projection — the 100 TB shape."""
    out = PII.with_pii_redaction(_docs_with_pii(spark, sf_dir))
    return out.select(
        "doc_id", "n_email", "n_ipv4", "n_ssn", "n_phone", "n_pii",
        "has_pii", F.md5(F.col("text_redacted")).alias("redacted_md5"))


def _sql_docs_with_pii() -> str:
    return """
p1 AS (SELECT doc_id,
  CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' ||
    CAST(doc_id AS VARCHAR) || '@example.com for details'
  ELSE text END AS text FROM documents),
p2 AS (SELECT doc_id,
  CASE WHEN doc_id % 11 = 0 THEN text || ' server at 192.168.' ||
    CAST(doc_id % 250 AS VARCHAR) || '.' ||
    CAST((doc_id * 7) % 250 AS VARCHAR)
  ELSE text END AS text FROM p1),
p3 AS (SELECT doc_id,
  CASE WHEN doc_id % 13 = 0 THEN text ||
    ' call (555) 123-4567 or 555.987.6543 today'
  ELSE text END AS text FROM p2),
docs_pii AS (SELECT doc_id,
  CASE WHEN doc_id % 17 = 0 THEN text || ' ssn 123-45-6789 on file'
  ELSE text END AS text FROM p3)"""


def _sql_pii_redact() -> str:
    c = PII.sql_pii_chain("text")
    return f"""WITH {_sql_docs_with_pii()}
SELECT doc_id,
  {c['n_email']} AS n_email,
  {c['n_ipv4']} AS n_ipv4,
  {c['n_ssn']} AS n_ssn,
  {c['n_phone']} AS n_phone,
  {c['n_email']} + {c['n_ipv4']} + {c['n_ssn']} + {c['n_phone']} AS n_pii,
  ({c['n_email']} + {c['n_ipv4']} + {c['n_ssn']} + {c['n_phone']}) > 0
    AS has_pii,
  md5({c['redacted']}) AS redacted_md5
FROM docs_pii"""


SQL_PII_REDACT = _sql_pii_redact()


def q_minhash_signatures(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sig = T.minhash_signature(T.tokens(F.col("text")), k=3, n_hashes=8)
    return d.select("doc_id", F.concat_ws("|", sig).alias("sig"))


SQL_MINHASH_SIGNATURES = f"""
WITH s AS (
  SELECT doc_id,
    {OG.shingles_sql(OG.tokens_sql('text'), 3)} AS sh
  FROM documents
)
SELECT doc_id,
  array_to_string({OG.minhash_signature_sql('sh', 8)}, '|') AS sig
FROM s"""


# planted-duplicate corpora (identical SQL shape both engines)
def _docs_with_clones(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clones = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra tail tokens appended"))
        .alias("text"))
    exact = d.filter(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text")
    return d.unionByName(clones).unionByName(exact)


_SQL_DOCS_CLONES = """
docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         text || ' extra tail tokens appended' AS text
  FROM documents WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text
  FROM documents WHERE doc_id % 40 = 0
)"""


def q_exact_dups(spark, sf_dir):
    return TD.exact_duplicates(_docs_with_clones(spark, sf_dir))


SQL_EXACT_DUPS = f"""WITH {_SQL_DOCS_CLONES},
fp AS (
  SELECT doc_id, {OG.fingerprint_sql('text')} AS fingerprint FROM docs2
)
SELECT doc_id, fingerprint,
  count(*) OVER (PARTITION BY fingerprint) AS group_size,
  min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
  doc_id = min(doc_id) OVER (PARTITION BY fingerprint) AS is_canonical
FROM fp"""


def q_ngram_jaccard_planted(spark, sf_dir):
    docs = _docs_with_clones(spark, sf_dir)
    base = docs.filter((F.col("doc_id") % 25 == 0)
                       & (F.col("doc_id") < 1000000))
    pairs = base.select(F.col("doc_id").alias("a"),
                        (F.col("doc_id") + 1000000).alias("b"))
    return TD.ngram_jaccard(pairs, docs).withColumn(
        "jaccard", F.round("jaccard", 6))


SQL_NGRAM_JACCARD_PLANTED = f"""WITH {_SQL_DOCS_CLONES},
sh AS (
  SELECT doc_id,
    list_distinct({OG.shingles_sql(OG.tokens_sql('text'), 3)}) AS s
  FROM docs2
),
pairs AS (
  SELECT doc_id AS a, doc_id + 1000000 AS b FROM documents
  WHERE doc_id % 25 = 0
)
SELECT p.a, p.b,
  round(CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
    THEN len(list_intersect(sa.s, sb.s))
         / len(list_distinct(list_concat(sa.s, sb.s)))
    ELSE 0.0 END, 6) AS jaccard
FROM pairs p
JOIN sh sa ON sa.doc_id = p.a
JOIN sh sb ON sb.doc_id = p.b"""


def q_minhash_pairs(spark, sf_dir):
    docs = _docs_with_clones(spark, sf_dir)
    out = TD.minhash_near_duplicates(docs, n_hashes=12, bands=6,
                                     threshold=0.5)
    return out.withColumn("jaccard", F.round("jaccard", 6))


# CTE chain shared by the pairs query and the clusters query below
_SQL_MINHASH_CTES = f"""{_SQL_DOCS_CLONES},
sh AS (
  SELECT doc_id, {OG.shingles_sql(OG.tokens_sql('text'), 3)} AS s
  FROM docs2
),
sig AS (
  SELECT doc_id, {OG.minhash_signature_sql('s', 12)} AS sg
  FROM sh WHERE len(s) > 0
),
banded AS (
  SELECT doc_id, band_idx,
    md5(array_to_string(sg[band_idx * 2 + 1 : band_idx * 2 + 2], '|'))
      AS band_hash
  FROM sig, (SELECT unnest(range(0, 6)) AS band_idx)
),
cands AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM banded l JOIN banded r
    ON l.band_idx = r.band_idx AND l.band_hash = r.band_hash
  WHERE l.doc_id < r.doc_id
),
dsh AS (SELECT doc_id, list_distinct(s) AS s FROM sh),
mh_pairs AS (
  SELECT c.a, c.b,
    round(len(list_intersect(sa.s, sb.s))
          / len(list_distinct(list_concat(sa.s, sb.s))), 6) AS jaccard
  FROM cands c
  JOIN dsh sa ON sa.doc_id = c.a
  JOIN dsh sb ON sb.doc_id = c.b
  WHERE len(list_intersect(sa.s, sb.s))
        / len(list_distinct(list_concat(sa.s, sb.s))) >= 0.5
)"""

SQL_MINHASH_PAIRS = f"""WITH {_SQL_MINHASH_CTES}
SELECT a, b, jaccard FROM mh_pairs"""


def q_dedup_clusters(spark, sf_dir):
    """Near-dup cluster resolution: MinHash-LSH candidate pairs →
    connected components (min-label propagation, text_dedup.
    connected_components) → one canonical doc per transitive similarity
    group. The oracle computes the same closure with a recursive CTE."""
    docs = _docs_with_clones(spark, sf_dir)
    pairs = TD.minhash_near_duplicates(docs, n_hashes=12, bands=6,
                                       threshold=0.5)
    return TD.dedup_clusters(pairs)


SQL_DEDUP_CLUSTERS = f"""WITH RECURSIVE {_SQL_MINHASH_CTES},
cc_edges AS (
  SELECT a AS src, b AS dst FROM mh_pairs
  UNION
  SELECT b AS src, a AS dst FROM mh_pairs
),
reach(node, r) AS (
  SELECT DISTINCT src, src FROM cc_edges
  UNION
  SELECT e.src, reach.r FROM cc_edges e JOIN reach ON reach.node = e.dst
),
comp AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach
         GROUP BY node)
SELECT doc_id, cluster_id,
  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
  doc_id = cluster_id AS is_canonical
FROM comp"""


def q_dedup_clusters_star(spark, sf_dir):
    """Same transitive-closure contract as ``dedup_clusters`` but resolved
    with the O(log n)-round large-star/small-star contraction (Kiveris et
    al. 2014, text_dedup._cc_star) instead of min-label propagation —
    the adversarial-graph path for long-chain components. Shares
    SQL_DEDUP_CLUSTERS: both algorithms must produce identical clusters."""
    docs = _docs_with_clones(spark, sf_dir)
    pairs = TD.minhash_near_duplicates(docs, n_hashes=12, bands=6,
                                       threshold=0.5)
    return TD.dedup_clusters(pairs, algo="star")


def q_dedup_keep_best(spark, sf_dir):
    """Quality-aware representative selection after near-dup clustering:
    per transitive similarity cluster keep the LONGEST doc (ties → lowest
    id) — the keep rule production dedup actually applies, vs
    dedup_clusters' min-id canonical. Singletons (docs in no candidate
    pair) survive as their own keeps. Subsumes the minhash_pairs +
    connected-components checks (same mh_pairs/reach CTEs in the oracle)."""
    docs = _docs_with_clones(spark, sf_dir) \
        .withColumn("quality", F.length("text"))
    pairs = TD.minhash_near_duplicates(docs, n_hashes=12, bands=6,
                                       threshold=0.5)
    return TD.dedup_keep_best(docs, pairs, quality_col="quality")


SQL_DEDUP_KEEP_BEST = f"""WITH RECURSIVE {_SQL_MINHASH_CTES},
cc_edges AS (
  SELECT a AS src, b AS dst FROM mh_pairs
  UNION
  SELECT b AS src, a AS dst FROM mh_pairs
),
reach(node, r) AS (
  SELECT DISTINCT src, src FROM cc_edges
  UNION
  SELECT e.src, reach.r FROM cc_edges e JOIN reach ON reach.node = e.dst
),
comp AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach
         GROUP BY node),
q AS (
  SELECT d.doc_id, len(d.text) AS quality,
         coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM docs2 d LEFT JOIN comp c USING (doc_id)
)
SELECT doc_id, cluster_id,
  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
  row_number() OVER (PARTITION BY cluster_id
                     ORDER BY quality DESC, doc_id) = 1 AS keep
FROM q"""


_ESS_K = 8  # window length for the contract query (docs are short at sf0.01)


def q_exact_substring_spans(spark, sf_dir):
    """ExactSubstr dedup (Lee et al. 2022 §4.1) over the planted-clone
    corpus: every maximal duplicated token run of length ≥ k, merged from
    fixed-k rolling window hashes (text_dedup.exact_substring_spans — the
    distributed analog of their suffix-array scan; linear, no pair space).
    Value-checks span boundaries per doc via an order-stable signature.
    md5 gram hashing for cross-engine parity (xxhash64 in production)."""
    docs = _docs_with_clones(spark, sf_dir)
    out = TD.exact_substring_spans(docs, k=_ESS_K, hash_fn="md5")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("dup_tokens").cast("long").alias("dup_tokens"),
        F.round(F.col("dup_tokens")
                / F.greatest(F.col("n_tokens"), F.lit(1)), 6)
        .alias("dup_frac"),
        F.md5(F.concat_ws("|", F.transform(
            "spans", lambda s: F.concat_ws("-", s.s, s.e))))
        .alias("span_sig"))


# CTE chain shared by the spans and removal oracles: docs2 → toks → …
# → sp (merged duplicated-run spans per doc, 1-based [s, e))
_SQL_ESS_SPAN_CTES = f"""{_SQL_DOCS_CLONES},
toks AS (SELECT doc_id, {OG.tokens_sql('text')} AS tk FROM docs2),
gr AS (
  SELECT doc_id,
    [md5(array_to_string(tk[i:i+{_ESS_K - 1}], ' '))
     FOR i IN range(1, greatest(len(tk) - {_ESS_K} + 2, 1))] AS ghs
  FROM toks
),
g AS (
  SELECT doc_id, generate_subscripts(ghs, 1) AS pos, unnest(ghs) AS h
  FROM gr
),
dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
hits AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
brk AS (
  SELECT doc_id, pos,
    CASE WHEN pos > lag(pos) OVER w + {_ESS_K} THEN 1 ELSE 0 END AS b
  FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
isl AS (
  SELECT doc_id, pos,
    sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM brk
),
sp AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {_ESS_K} AS e
  FROM isl GROUP BY doc_id, island
)"""

SQL_EXACT_SUBSTRING_SPANS = f"""WITH {_SQL_ESS_SPAN_CTES},
agg AS (
  SELECT doc_id, count(*) AS n_spans,
    CAST(sum(e - s) AS BIGINT) AS dup_tokens,
    md5(string_agg(s || '-' || e, '|' ORDER BY s)) AS span_sig
  FROM sp GROUP BY doc_id
)
SELECT t.doc_id,
  CAST(len(t.tk) AS BIGINT) AS n_tokens,
  coalesce(a.n_spans, 0) AS n_spans,
  coalesce(a.dup_tokens, 0) AS dup_tokens,
  round(coalesce(a.dup_tokens, 0) * 1.0
        / greatest(len(t.tk), 1), 6) AS dup_frac,
  coalesce(a.span_sig, md5('')) AS span_sig
FROM toks t LEFT JOIN agg a USING (doc_id)"""


def q_exact_substring_removal(spark, sf_dir):
    """The removal step of ExactSubstr dedup (Lee et al. 2022): every token
    covered by a duplicated span dropped, survivors rejoined
    (text_dedup.remove_duplicate_spans). Value-checked via md5 of the
    reconstructed text per doc."""
    docs = _docs_with_clones(spark, sf_dir)
    spans = TD.exact_substring_spans(docs, k=_ESS_K, hash_fn="md5")
    out = TD.remove_duplicate_spans(docs, spans)
    return out.select(
        "doc_id",
        F.length("text").cast("long").alias("kept_chars"),
        F.md5(F.col("text")).alias("kept_md5"))


SQL_EXACT_SUBSTRING_REMOVAL = f"""WITH {_SQL_ESS_SPAN_CTES},
tok_idx AS (
  SELECT doc_id, generate_subscripts(tk, 1) AS i, unnest(tk) AS tok
  FROM toks
),
kept AS (
  SELECT ti.doc_id, ti.i, ti.tok
  FROM tok_idx ti
  LEFT JOIN sp ON sp.doc_id = ti.doc_id AND ti.i >= sp.s AND ti.i < sp.e
  WHERE sp.doc_id IS NULL
),
rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
  CAST(length(coalesce(r.text, '')) AS BIGINT) AS kept_chars,
  md5(coalesce(r.text, '')) AS kept_md5
FROM toks t LEFT JOIN rebuilt r USING (doc_id)"""


# --------------------------------------------------------------------------
# full-text search over documents
# --------------------------------------------------------------------------

_FTS_QUERY = ["data", "query", "window"]


def q_fulltext_match(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    pi = d.select(F.col("doc_id").cast("string").alias("url_canon"),
                  F.lit("0").alias("ts14"), F.lit("").alias("title"),
                  F.col("text").alias("content"))
    inv = build_inverted_terms(pi)
    qdf = spark.createDataFrame([(t,) for t in _FTS_QUERY], "term string")
    hits = inv.join(F.broadcast(qdf), "term")
    return (hits.groupBy("url_canon")
            .agg(F.countDistinct("term").alias("matched_terms"),
                 F.sum("tf").alias("tf_sum"))
            .select(F.col("url_canon").cast("long").alias("doc_id"),
                    "matched_terms", "tf_sum"))


SQL_FULLTEXT_MATCH = f"""
WITH toks AS (
  SELECT doc_id, unnest({OG.tokens_sql('text')}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
),
q AS (SELECT unnest(['{"','".join(_FTS_QUERY)}']) AS term)
SELECT doc_id, count(DISTINCT tf.term) AS matched_terms,
  CAST(sum(tf) AS BIGINT) AS tf_sum
FROM tf JOIN q ON tf.term = q.term
GROUP BY doc_id"""


def q_saved_query_match(spark, sf_dir):
    """Saved-query alerting (operators/alerts.py): a table of standing
    searches matched against the documents — a doc matches when it
    contains EVERY query term (AND semantics, engine tokenizer). The
    corpus tokenizes once; the query-term table broadcasts."""
    from chrono_scraper_spark.operators.alerts import match_saved_queries

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    saved = spark.createDataFrame(
        [(1, "data window"), (2, "merge batch spark"),
         (3, "zzqx-no-such-term"), (4, "")],
        "query_id int, query string")
    return match_saved_queries(d, saved)


SQL_SAVED_QUERY_MATCH = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest({OG.tokens_sql('text')}) AS term
  FROM documents
),
saved AS (
  SELECT * FROM (VALUES (1, 'data window'),
                        (2, 'merge batch spark'),
                        (3, 'zzqx-no-such-term'), (4, '')) s(query_id, q)
),
qterms AS (
  SELECT DISTINCT query_id, unnest({OG.tokens_sql('q')}) AS term FROM saved
),
nq AS (SELECT query_id, count(*) AS _nq FROM qterms GROUP BY 1),
hits AS (
  SELECT t.doc_id, qt.query_id, count(*) AS _nm
  FROM toks t JOIN qterms qt ON t.term = qt.term
  GROUP BY 1, 2
)
SELECT h.query_id, h.doc_id
FROM hits h JOIN nq ON h.query_id = nq.query_id
WHERE h._nm = nq._nq"""


def q_bm25_rank(spark, sf_dir):
    """Okapi BM25 relevance over the documents inverted index (engine
    addition beyond the Meilisearch rule chain — ``index.bm25_rank``).
    Nano-floored per-(doc, term) partials summed as longs make the score
    bit-identical across engines and partitionings."""
    from chrono_scraper_spark.operators.index import bm25_rank

    d = _t(spark, sf_dir, "documents")
    pi = d.select(F.col("doc_id").cast("string").alias("url_canon"),
                  F.lit("0").alias("ts14"), F.lit("").alias("title"),
                  F.col("text").alias("content"))
    # in production the inverted index is a stored table; materialize the
    # derived one so the doclen pass and the hits probe don't each re-run
    # the tokenize+explode+agg
    inv = build_inverted_terms(pi).localCheckpoint(eager=True)
    out = bm25_rank(inv, list(_FTS_QUERY), doc_cols=("url_canon", "ts14"))
    return out.select(F.col("url_canon").cast("long").alias("doc_id"),
                      "matched_terms", "tf_sum", "bm25_e9")


SQL_BM25_RANK = f"""
WITH toks AS (
  SELECT doc_id, unnest({OG.tokens_sql('text')}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
),
dl AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1
),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
),
q AS (SELECT unnest(['{"','".join(_FTS_QUERY)}']) AS term),
hits AS (SELECT tf.doc_id, tf.term, tf.tf FROM tf JOIN q USING (term)),
dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM hits GROUP BY 1),
sc AS (
  SELECT h.doc_id, h.term, h.tf,
    CAST(floor(
      ln(1.0 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5))
      * (h.tf * (1.2 + 1.0))
      / (h.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))
      * 1e9) AS BIGINT) AS s_nano
  FROM hits h JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN st
)
SELECT doc_id, count(DISTINCT term) AS matched_terms,
  CAST(sum(tf) AS BIGINT) AS tf_sum, CAST(sum(s_nano) AS BIGINT) AS bm25_e9
FROM sc GROUP BY doc_id"""


# (fulltext_positional was retired from the contract in round 4: its
# first-position/attribute semantics are value-checked inside
# fulltext_ranked's best_pos column, and the operator itself —
# search_positional — remains unit-tested in tests/test_index.py. The
# contract keeps one entry per distinct operator family so every family
# fits the driver's 50-row correctness window.)


# --------------------------------------------------------------------------
# faceted + typo-tolerant search (Meilisearch analogs)
# --------------------------------------------------------------------------

def _doc_index(spark, sf_dir):
    """documents as a (page_index, inverted_terms) pair for search queries."""
    d = _t(spark, sf_dir, "documents")
    pi = d.select(
        F.col("doc_id").cast("string").alias("url_canon"),
        F.lit("0").alias("ts14"), "lang", "source",
        F.when(F.col("n_chars") < 150, "short")
        .when(F.col("n_chars") < 350, "medium")
        .otherwise("long").alias("len_bucket"),
        F.col("text").alias("content"), F.lit("").alias("title"))
    inv = build_inverted_terms(pi)
    return pi, inv


def q_facet_counts(spark, sf_dir):
    """Faceted search (meilisearch_service.py:353-412 ``facets`` param;
    shared_pages_meilisearch.py:497-502): per-facet value counts over the
    pages matching >=1 query term."""
    from chrono_scraper_spark.operators.index import search_facets

    pi, inv = _doc_index(spark, sf_dir)
    return search_facets(pi, inv, " ".join(_FTS_QUERY),
                         ["lang", "source", "len_bucket"])


SQL_FACET_COUNTS = f"""
WITH toks AS (
  SELECT doc_id, unnest({OG.tokens_sql('text')}) AS term FROM documents
),
q AS (SELECT unnest(['{"','".join(_FTS_QUERY)}']) AS term),
matched AS (
  SELECT DISTINCT doc_id FROM toks JOIN q ON toks.term = q.term
),
md AS (
  SELECT d.doc_id, d.lang, d.source,
    CASE WHEN d.n_chars < 150 THEN 'short'
         WHEN d.n_chars < 350 THEN 'medium' ELSE 'long' END AS len_bucket
  FROM documents d JOIN matched m ON d.doc_id = m.doc_id
)
SELECT 'lang' AS facet, lang AS value, count(*) AS n FROM md GROUP BY 2
UNION ALL
SELECT 'source' AS facet, source AS value, count(*) AS n FROM md GROUP BY 2
UNION ALL
SELECT 'len_bucket' AS facet, len_bucket AS value, count(*) AS n
FROM md GROUP BY 2"""


_TYPO_QUERY = ["dta", "windw", "query"]


def q_fulltext_typo(spark, sf_dir):
    """Typo-tolerant match (meilisearch_service.py:454-470 typo rule):
    query terms expand to edit-distance<=1 vocabulary terms; per-document
    match stats distinguish exact from typo matches."""
    from chrono_scraper_spark.operators.index import expand_terms_typo

    pi, inv = _doc_index(spark, sf_dir)
    expanded = expand_terms_typo(inv, _TYPO_QUERY, max_edit=1)
    hits = inv.join(F.broadcast(expanded), "term", "inner")
    return (hits.groupBy("url_canon")
            .agg(F.countDistinct("query_term").alias("matched_terms"),
                 F.countDistinct(
                     F.when(F.col("edit_dist") == 0, F.col("query_term")))
                 .alias("exact_terms"),
                 F.sum("tf").alias("tf_sum"))
            .select(F.col("url_canon").cast("long").alias("doc_id"),
                    "matched_terms", "exact_terms", "tf_sum"))


SQL_FULLTEXT_TYPO = f"""
WITH toks AS (
  SELECT doc_id, unnest({OG.tokens_sql('text')}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
vocab AS (SELECT DISTINCT term FROM tf),
q AS (SELECT unnest(['{"','".join(_TYPO_QUERY)}']) AS query_term),
expanded AS (
  SELECT v.term, q.query_term,
         levenshtein(v.term, q.query_term) AS edit_dist
  FROM vocab v JOIN q
    ON abs(length(v.term) - length(q.query_term)) <= 1
   AND levenshtein(v.term, q.query_term) <= 1
)
SELECT tf.doc_id,
  count(DISTINCT e.query_term) AS matched_terms,
  count(DISTINCT CASE WHEN e.edit_dist = 0 THEN e.query_term END)
    AS exact_terms,
  CAST(sum(tf.tf) AS BIGINT) AS tf_sum
FROM tf JOIN expanded e ON tf.term = e.term
GROUP BY tf.doc_id"""


def q_fulltext_proximity(spark, sf_dir):
    """TRUE proximity ranking rule (Meilisearch rule #3,
    shared_pages_meilisearch.py:167-176): per-document min pairwise token
    distance between occurrences of two DIFFERENT query terms, from the
    positional index's per-term position arrays. Engine computes it with a
    sorted adjacent-occurrence scan (O(m log m)/doc in codegen,
    operators/index.py::min_pair_distance); the oracle uses the equivalent
    all-pairs relational min. Docs matching a single term get null."""
    from chrono_scraper_spark.operators.index import min_pair_distance

    d = _t(spark, sf_dir, "documents")
    pi = d.select(F.col("doc_id").cast("string").alias("url_canon"),
                  F.lit("0").alias("ts14"), F.lit("").alias("title"),
                  F.col("text").alias("content"))
    inv = build_inverted_terms(pi, positions=True)
    qdf = spark.createDataFrame([(t,) for t in _FTS_QUERY], "term string")
    hits = inv.join(F.broadcast(qdf), "term")
    return (hits.groupBy("url_canon")
            .agg(F.countDistinct("term").alias("matched_terms"),
                 F.sum("tf").alias("tf_sum"),
                 min_pair_distance(
                     F.collect_list(F.struct("term", "pos_arr")))
                 .alias("proximity"))
            .select(F.col("url_canon").cast("long").alias("doc_id"),
                    "matched_terms", "tf_sum", "proximity"))


SQL_FULLTEXT_PROXIMITY = f"""
WITH docs AS (
  SELECT doc_id, {OG.tokens_sql('text')} AS toks FROM documents
),
toks AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM docs
),
q AS (SELECT unnest(['{"','".join(_FTS_QUERY)}']) AS term),
hits AS (
  SELECT t.doc_id, t.term, t.pos FROM toks t JOIN q ON t.term = q.term
),
agg AS (
  SELECT doc_id, count(DISTINCT term) AS matched_terms,
    CAST(count(*) AS BIGINT) AS tf_sum
  FROM hits GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id, CAST(min(abs(a.pos - b.pos)) AS INT) AS proximity
  FROM hits a JOIN hits b
    ON a.doc_id = b.doc_id AND a.term <> b.term
  GROUP BY a.doc_id
)
SELECT agg.doc_id, agg.matched_terms, agg.tf_sum, p.proximity
FROM agg LEFT JOIN pairs p ON agg.doc_id = p.doc_id"""


_HL_QUERY = ["data", "query", "window"]


def q_search_highlight(spark, sf_dir):
    """Highlight + crop (meilisearch_service.py:186-197): 10-word
    word-boundary snippet around the first matched term, all matched terms
    wrapped in <em></em>, ellipsis where the crop cut. Pure column
    expressions (operators/index.py::with_snippet); docs with no match are
    absent."""
    from chrono_scraper_spark.operators.index import with_snippet

    d = _t(spark, sf_dir, "documents")
    out = with_snippet(d.select("doc_id", F.col("text").alias("content")),
                       _HL_QUERY, "content")
    return (out.filter(F.col("snippet").isNotNull())
            .select("doc_id", "snippet"))


_HL_IN = "'" + "','".join(_HL_QUERY) + "'"

SQL_SEARCH_HIGHLIGHT = rf"""
WITH w AS (
  SELECT doc_id,
    list_filter(string_split_regex(coalesce(text, ''), '[^\p{{L}}\p{{N}}]+'),
                t -> t != '') AS ws
  FROM documents
),
flat AS (
  SELECT doc_id, unnest(ws) AS wd, generate_subscripts(ws, 1) - 1 AS i
  FROM w
),
fi AS (
  SELECT doc_id, min(i) AS fi FROM flat
  WHERE lower(wd) IN ({_HL_IN}) GROUP BY doc_id
),
crop AS (
  SELECT w.doc_id, w.ws, greatest(0, fi.fi - 3) AS s
  FROM w JOIN fi ON w.doc_id = fi.doc_id
)
SELECT doc_id,
  (CASE WHEN s > 0 THEN '…' ELSE '' END)
  || array_to_string(
       list_transform(ws[s + 1 : s + 10],
         x -> CASE WHEN lower(x) IN ({_HL_IN})
                   THEN '<em>' || x || '</em>' ELSE x END), ' ')
  || (CASE WHEN s + 10 < len(ws) THEN '…' ELSE '' END) AS snippet
FROM crop"""


# --------------------------------------------------------------------------
# unified ranked search — the FULL Meilisearch rule chain in order
# --------------------------------------------------------------------------

#: query: two exact-matchable terms + one typo ("windw" never occurs in the
#: corpus; its only edit-1 vocabulary neighbor is "window")
_RANKED_QUERY = "data query windw"
#: planted docs (doc_id, text, quality) engineered so EVERY ranking rule
#: decides at least one ADJACENT pair in the final order (no real doc can
#: interleave: only planted docs contain literal "windw", so only they
#: reach typo_cost=0 with all 3 terms matched):
#:   rank block (words=3, typo=0): P3 > P2 (quality), P2 > P1 (word_count),
#:   P1 > P7 (exactness), P7 > P6 (attribute/best_pos), P6 > P5
#:   (proximity); P5 > first typo_cost=1 doc (typo); the words rule decides
#:   the matched=3 → matched=2 boundary in the real corpus.
_RANKED_PLANTED = [
    (10000001, "data query windw", 9),
    (10000002, "data query windw extra", 9),
    (10000003, "data query windw", 10),
    (10000004, "data query window", 9),
    (10000005, "data pad query pad windw", 9),
    (10000006, "pad data query windw", 9),
    (10000007, "data windw query", 9),
]


def q_fulltext_ranked(spark, sf_dir):
    """ONE unified search applying the reference's full Meilisearch rule
    chain in configured order (shared_pages_meilisearch.py:167-176):
    words → typo → proximity → attribute → sort(no-op) → exactness →
    quality_score:desc → word_count:desc (operators/index.py::
    search_ranked / ranked_match_set). The emitted ``rank`` column freezes
    the total order, so the value hash verifies the CHAIN, not just the
    per-rule scores. Planted docs guarantee every rule decides an adjacent
    pair (see _RANKED_PLANTED)."""
    from chrono_scraper_spark.operators.index import ranked_match_set

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "text",
        ((F.col("doc_id") * 7) % 5).cast("int").alias("quality"))
    planted = spark.createDataFrame(
        _RANKED_PLANTED, "doc_id long, text string, quality int")
    docs = d.unionByName(planted)
    pi = docs.select(
        F.col("doc_id").cast("string").alias("url_canon"),
        F.lit("0").alias("ts14"), F.lit("").alias("title"),
        F.col("text").alias("content"),
        F.col("quality").alias("quality_score"),
        F.size(tokenize(F.col("text"))).cast("long").alias("word_count"))
    inv = build_inverted_terms(pi, positions=True)
    scored = ranked_match_set(pi, inv, _RANKED_QUERY, max_edit=1)
    out = scored.join(pi.select("url_canon", "ts14", "quality_score",
                                "word_count"), ["url_canon", "ts14"])
    w = Window.orderBy(
        F.desc("matched_terms"), F.asc("typo_cost"),
        F.asc_nulls_last("proximity"), F.asc_nulls_last("best_pos"),
        F.desc("exact_phrase"), F.desc("quality_score"),
        F.desc("word_count"), F.asc(F.col("url_canon").cast("long")))
    return out.select(
        F.col("url_canon").cast("long").alias("doc_id"),
        F.row_number().over(w).cast("long").alias("rank"),
        "matched_terms", "typo_cost", "proximity", "best_pos",
        "exact_phrase", "quality_score", "word_count")


_RANKED_VALUES = ", ".join(f"({i}, '{t}', {q})"
                           for i, t, q in _RANKED_PLANTED)

SQL_FULLTEXT_RANKED = f"""
WITH base AS (
  SELECT doc_id, text, CAST((doc_id * 7) % 5 AS INT) AS quality
  FROM documents
  UNION ALL
  SELECT CAST(doc_id AS BIGINT), text, CAST(quality AS INT)
  FROM (VALUES {_RANKED_VALUES}) v(doc_id, text, quality)
),
docs AS (
  SELECT doc_id, quality, {OG.tokens_sql('text')} AS toks FROM base
),
toks AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM docs
),
vocab AS (SELECT DISTINCT term FROM toks),
q AS (SELECT unnest(['data', 'query', 'windw']) AS query_term),
expanded AS (
  SELECT v.term, q.query_term,
         levenshtein(v.term, q.query_term) AS edit_dist
  FROM vocab v JOIN q
    ON abs(length(v.term) - length(q.query_term)) <= 1
   AND levenshtein(v.term, q.query_term) <= 1
),
hits AS (
  SELECT t.doc_id, e.query_term, e.edit_dist, t.pos
  FROM toks t JOIN expanded e ON t.term = e.term
),
per_qt AS (
  SELECT doc_id, query_term, min(edit_dist) AS ed, min(pos) AS first_pos
  FROM hits GROUP BY 1, 2
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS matched_terms,
         CAST(sum(ed) AS BIGINT) AS typo_cost,
         CAST(min(first_pos) AS INT) AS best_pos
  FROM per_qt GROUP BY 1
),
prox AS (
  SELECT a.doc_id, CAST(min(abs(a.pos - b.pos)) AS INT) AS proximity
  FROM hits a JOIN hits b
    ON a.doc_id = b.doc_id AND a.query_term <> b.query_term
  GROUP BY 1
),
phrase AS (
  SELECT DISTINCT t0.doc_id FROM toks t0
  JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
              AND t1.term = 'query'
  JOIN toks t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2
              AND t2.term = 'windw'
  WHERE t0.term = 'data'
),
wc AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS word_count, quality
       FROM docs),
scored AS (
  SELECT agg.doc_id, agg.matched_terms, agg.typo_cost, p.proximity,
         agg.best_pos, (ph.doc_id IS NOT NULL) AS exact_phrase,
         wc.quality AS quality_score, wc.word_count
  FROM agg
  LEFT JOIN prox p ON agg.doc_id = p.doc_id
  LEFT JOIN phrase ph ON agg.doc_id = ph.doc_id
  JOIN wc ON wc.doc_id = agg.doc_id
)
SELECT doc_id,
  CAST(row_number() OVER (ORDER BY matched_terms DESC, typo_cost ASC,
       proximity ASC NULLS LAST, best_pos ASC, exact_phrase DESC,
       quality_score DESC, word_count DESC, doc_id ASC) AS BIGINT) AS rank,
  matched_terms, typo_cost, proximity, best_pos, exact_phrase,
  quality_score, word_count
FROM scored"""


def q_pagination(spark, sf_dir):
    """O3 offset pagination over a deterministic total order (Meilisearch
    limit/offset paging, meilisearch_service.py:356)."""
    return (cdx_pages_view(spark, sf_dir)
            .select("url", "ts14")
            .orderBy("url", "ts14")
            .offset(100).limit(50))


SQL_PAGINATION = _PRELUDE + """
SELECT url, ts14 FROM pages_cdx
ORDER BY url, ts14 LIMIT 50 OFFSET 100"""


def q_entity_extract(spark, sf_dir):
    """Deterministic NER analog (entity_backends.py:15-116 stands in via
    regex families, like langid for langdetect): entities are planted into
    the lowercase corpus text by an identical portable suffix on both
    engines, then extracted per mention."""
    from chrono_scraper_spark.functions.entities import extract_entities

    d = _t(spark, sf_dir, "documents")
    suffix = F.concat(
        F.lit(" Contact Alice Johnson at alice@example.com on 2021-07-"),
        F.lpad(((F.col("doc_id") % 28) + 1).cast("string"), 2, "0"),
        F.lit(" see https://ref.example.org/item-"),
        F.col("doc_id").cast("string"),
        F.lit(" cost $"), (F.col("doc_id") % 100).cast("string"),
        F.lit(".50"))
    docs = d.select("doc_id", F.concat(F.col("text"), suffix).alias("text"))
    out = docs.select(
        "doc_id", F.explode(extract_entities(F.col("text"))).alias("e"))
    return out.select("doc_id",
                      F.col("e.entity_type").alias("entity_type"),
                      F.col("e.entity").alias("entity"))


def _entity_oracle_sql() -> str:
    from chrono_scraper_spark.functions.entities import ENTITY_PATTERNS

    suffix = ("' Contact Alice Johnson at alice@example.com on 2021-07-' || "
              "lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || "
              "' see https://ref.example.org/item-' || "
              "CAST(doc_id AS VARCHAR) || "
              "' cost $' || CAST(doc_id % 100 AS VARCHAR) || '.50'")
    unions = "\nUNION ALL\n".join(
        f"SELECT doc_id, '{etype}' AS entity_type, "
        f"unnest(regexp_extract_all(text2, '{pat}')) AS entity FROM d2"
        for etype, pat in ENTITY_PATTERNS)
    return (f"WITH d2 AS (SELECT doc_id, text || {suffix} AS text2 "
            f"FROM documents)\n{unions}")


SQL_ENTITY_EXTRACT = _entity_oracle_sql()


# --------------------------------------------------------------------------
# content / project analytics facts (content_analytics.sql, project_analytics.sql)
# --------------------------------------------------------------------------

def q_extraction_stats(spark, sf_dir):
    """content_analytics transform + extraction-method effectiveness rollup
    (content_analytics.sql:5-75; sample_queries.sql:110-123)."""
    fact = A.content_analytics_transform(cdx_pages_view(spark, sf_dir))
    return A.extraction_method_stats(fact)


SQL_EXTRACTION_STATS = _PRELUDE + f""",
fact AS (
  SELECT
    CASE WHEN mime = 'text/html' THEN 'article'
         ELSE 'unsupported_mime' END AS extraction_method,
    CASE WHEN mime = 'text/html'
              AND {OG.token_count_ws_sql('text')} > 0 THEN 'success'
         ELSE 'failed' END AS extraction_status,
    {OG.text_quality_sql('text')} AS content_quality_score,
    {OG.token_count_ws_sql('text')} AS word_count,
    {OG.token_count_ws_sql('text')} > 50 AS has_meaningful_content
  FROM pages_cdx
)
SELECT extraction_method, extraction_status,
  count(*) AS total_attempts,
  round(CAST(avg(CAST(content_quality_score AS DECIMAL(18,6))) AS DOUBLE), 3)
    AS avg_quality,
  round(avg(word_count), 1) AS avg_word_count,
  CAST(sum(CASE WHEN has_meaningful_content THEN 1 ELSE 0 END) AS BIGINT)
    AS meaningful_content_count
FROM fact GROUP BY 1, 2"""


def q_project_monthly(spark, sf_dir):
    """project_analytics monthly rollup (project_analytics.sql:5-40,
    sample_queries.sql:179-210): per (project, month) pages, successes,
    active domains, content-length average."""
    pages = cdx_pages_view(spark, sf_dir).withColumn(
        "project_id", (F.col("doc_id") % 7).cast("int"))
    return A.project_monthly_rollup(pages)


SQL_PROJECT_MONTHLY = _PRELUDE + """
SELECT CAST(doc_id % 7 AS INT) AS project_id,
  CAST(date_trunc('month', warc_ts) AS DATE) AS analytics_month,
  count(*) AS total_pages_processed,
  CAST(sum(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS BIGINT)
    AS success_pages,
  count(DISTINCT host) AS active_domains,
  round(avg(length(text)), 2) AS avg_content_length
FROM pages_cdx GROUP BY 1, 2"""


def q_cdx_facets(spark, sf_dir):
    """A10: multi-facet distribution over the analytics fact in one pass
    (Meilisearch facetDistribution over the whole index)."""
    return A.facet_distribution(
        _fact(spark, sf_dir),
        ["mime_type", "status_code", "content_size_category"])


SQL_CDX_FACETS = _PRELUDE + """
, fact AS (
  SELECT mime AS mime_type, CAST(status AS VARCHAR) AS status_code,
    CASE WHEN length < 1024 THEN 'tiny'
         WHEN length < 10240 THEN 'small'
         WHEN length < 102400 THEN 'medium'
         WHEN length < 1048576 THEN 'large'
         ELSE 'huge' END AS content_size_category
  FROM pages_cdx
)
SELECT 'mime_type' AS facet, mime_type AS value, count(*) AS n
FROM fact GROUP BY 2
UNION ALL
SELECT 'status_code' AS facet, status_code AS value, count(*) AS n
FROM fact GROUP BY 2
UNION ALL
SELECT 'content_size_category' AS facet, content_size_category AS value,
       count(*) AS n
FROM fact GROUP BY 2"""


# --------------------------------------------------------------------------
# embeddings: ANN + near-dup
# --------------------------------------------------------------------------

def q_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = ANN.cosine_topk_bruteforce(emb, queries, k=5)
    return out.select("query_id", "neighbor_id", "rank",
                      F.round("cosine", 3).alias("cosine"))


SQL_ANN_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
      / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                               CAST(e.embedding AS DOUBLE[])))
         * sqrt(list_dot_product(q.qv, q.qv))) AS cos
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, neighbor_id,
  CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, neighbor_id ASC) AS INT) AS rank,
  round(cos, 3) AS cosine
FROM scored
QUALIFY rank <= 5"""


def q_embedding_near_dups(spark, sf_dir):
    """Runs the BANDED hyperplane-LSH path (the 100 TB-scale construction);
    the oracle is the exact all-pairs SQL — the exact-cosine verify stage
    makes LSH output exact wherever recalled, and the planted pairs are
    identical vectors (cosine 1.0), which agree on every plane of every
    band, so recall is 1 by construction and the hash must match."""
    emb = _t(spark, sf_dir, "embeddings")
    clones = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    both = emb.select("vec_id", "embedding").unionByName(clones)
    out = TD.embedding_near_duplicates(both, threshold=0.999,
                                       bands=6, r_planes=4)
    return out.select("a", "b", F.round("cosine", 3).alias("cosine"))


def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) over embeddings + planted clones: md5-
    seeded 16-centroid codebook, zero-shuffle broadcast argmax assignment,
    within-cluster pairwise cosine ≥ 0.95 → keep-first-by-id. A clone is
    identical to its source vector, so it lands in the same cluster with
    cosine 1.0 and must be dropped with dup_of = source id. The oracle
    recomputes codebook, assignment, pair graph and keep rule relationally."""
    emb = _t(spark, sf_dir, "embeddings")
    clones = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    both = emb.select("vec_id", "embedding").unionByName(clones)
    return TD.semdedup(both, n_centroids=16, threshold=0.95)


SQL_SEMDEDUP = """
WITH eboth AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 50 = 0
),
cb AS (
  SELECT CAST(row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT)
         AS centroid_id, v AS cv
  FROM eboth
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
),
asg AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT e.vec_id, e.v, c.centroid_id,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        list_dot_product(e.v, c.cv)
          / (sqrt(list_dot_product(e.v, e.v))
             * sqrt(list_dot_product(c.cv, c.cv))) DESC,
        c.centroid_id ASC) AS rnk
    FROM eboth e CROSS JOIN cb c)
  WHERE rnk = 1
),
pairs AS (
  SELECT l.vec_id AS a, r.vec_id AS b,
    round(list_dot_product(l.v, r.v)
      / (sqrt(list_dot_product(l.v, l.v))
         * sqrt(list_dot_product(r.v, r.v))), 6) AS c6
  FROM asg l JOIN asg r
    ON l.centroid_id = r.centroid_id AND l.vec_id < r.vec_id
),
dups AS (
  SELECT b AS vec_id, min(a) AS dup_of, max(c6) AS max_cos
  FROM pairs WHERE c6 >= 0.95 GROUP BY b
)
SELECT asg.vec_id, asg.centroid_id,
  d.dup_of IS NULL AS is_kept, d.dup_of, d.max_cos
FROM asg LEFT JOIN dups d ON asg.vec_id = d.vec_id"""


SQL_EMBEDDING_NEAR_DUPS = """
WITH eboth AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id % 50 = 0
),
pairs AS (
  SELECT l.vec_id AS a, r.vec_id AS b,
    list_dot_product(l.v, r.v)
      / (sqrt(list_dot_product(l.v, l.v))
         * sqrt(list_dot_product(r.v, r.v))) AS cos
  FROM eboth l JOIN eboth r ON l.vec_id < r.vec_id
)
SELECT a, b, round(cos, 3) AS cosine FROM pairs WHERE cos >= 0.999"""


# --------------------------------------------------------------------------
# generic analytics (A2/J-family) over the star schema
# --------------------------------------------------------------------------

def q_lineitem_rollup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum(dec("l_quantity")).cast("double"), 4)
                 .alias("sum_qty"),
                 F.round(F.sum(dec("l_extendedprice")).cast("double"), 4)
                 .alias("sum_price"),
                 F.round(F.avg(dec("l_discount")).cast("double"), 6)
                 .alias("avg_disc"),
                 F.count(F.lit(1)).alias("n")))


SQL_LINEITEM_ROLLUP = """
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4)
    AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4)
    AS sum_price,
  round(CAST(avg(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE), 6)
    AS avg_disc,
  count(*) AS n
FROM lineitem GROUP BY 1, 2"""


def q_top_customers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    rev = (o.groupBy("o_custkey")
           .agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                        .cast("double"), 4).alias("revenue"),
                F.count(F.lit(1)).alias("n_orders")))
    return (rev.join(F.broadcast(c), rev["o_custkey"] == c["c_custkey"])
            .select(F.col("c_custkey").alias("custkey"), "c_name",
                    "revenue", "n_orders")
            .orderBy(F.desc("revenue"), F.asc("custkey")).limit(10))


SQL_TOP_CUSTOMERS = """
WITH rev AS (
  SELECT o_custkey,
    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 4)
      AS revenue,
    count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT c.c_custkey AS custkey, c.c_name, r.revenue, r.n_orders
FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
ORDER BY revenue DESC, custkey ASC LIMIT 10"""


# --------------------------------------------------------------------------
# formerly rows-only queries — all four now carry real DuckDB value oracles
# --------------------------------------------------------------------------

def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs via the PORTABLE md5-bit hash family (identical
    construction in the DuckDB oracle); the xxhash64 long variant stays the
    fast production path (unit-tested equivalent semantics)."""
    docs = _docs_with_clones(spark, sf_dir)
    return TD.simhash_near_duplicates_portable(docs, max_hamming=3)


SQL_SIMHASH_PAIRS = f"""WITH {_SQL_DOCS_CLONES},
tok AS (
  SELECT doc_id, unnest({OG.tokens_sql('text')}) AS tok FROM docs2
),
h AS (SELECT doc_id, md5(tok) AS hx FROM tok),
sums AS (
  SELECT doc_id,
    {OG.simhash_sum_exprs_sql('hx')}
  FROM h GROUP BY doc_id
),
bits AS (
  SELECT doc_id, {OG.simhash_bits_concat_sql()} AS bits FROM sums
),
chunks AS (
  SELECT doc_id, bits, i AS chunk_idx,
         substr(bits, 1 + 16 * i, 16) AS chunk
  FROM bits, (SELECT unnest(range(0, 4)) AS i)
),
cands AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
         l.bits AS ba, r.bits AS bb
  FROM chunks l JOIN chunks r
    ON l.chunk_idx = r.chunk_idx AND l.chunk = r.chunk
  WHERE l.doc_id < r.doc_id
),
pairs AS (
  SELECT a, b,
    CAST(len(list_filter(range(1, 65),
         i -> substr(ba, CAST(i AS INT), 1) != substr(bb, CAST(i AS INT), 1)))
         AS INT) AS hamming
  FROM cands
)
SELECT a, b, hamming FROM pairs WHERE hamming <= 3"""


def q_ann_topk_lsh(spark, sf_dir):
    """Multi-probe hyperplane-LSH ANN, value-checked as a RECALL contract.

    Hyperplane LSH only promises recall for genuinely-near neighbors (small
    angle); the nearest neighbors of a random query in a random corpus are
    near-orthogonal, where no LSH family helps. So the contract plants the
    neighbors: each query vector gets 5 small deterministic perturbations
    (cosine ≈ 0.999) unioned into the corpus, the exact brute-force top-5
    for each query is recomputed, and the query emits per-query
    ``recall_ok`` = (LSH found ≥ 0.8 of the true top-5). The oracle asserts
    the same invariant as constant truth — a recall regression (plane
    construction, probing, bucketing bugs) flips a row and breaks the hash."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("embedding"))
    planted = queries.select(
        F.col("query_id"), F.explode(F.sequence(F.lit(1), F.lit(5))).alias("j"),
        "embedding",
    ).select(
        (F.col("query_id") * 10 + F.col("j") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x: x + (F.pmod(F.xxhash64(F.col("query_id"), F.col("j"),
                                             x.cast("string")),
                                  F.lit(201)) - 100).cast("double") / 50000.0,
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id",
                        F.col("embedding").cast("array<double>")
                        .alias("embedding")).unionByName(planted)
    lsh = ANN.cosine_topk_lsh(corpus, queries, k=5, n_planes=6).select(
        "query_id", "neighbor_id")
    brute = ANN.cosine_topk_bruteforce(corpus, queries, k=5).select(
        "query_id", "neighbor_id")
    hit = brute.join(lsh, ["query_id", "neighbor_id"], "left_semi")
    recall = (brute.groupBy("query_id").agg(F.count(F.lit(1)).alias("k"))
              .join(hit.groupBy("query_id")
                    .agg(F.count(F.lit(1)).alias("found")),
                    "query_id", "left")
              .select("query_id",
                      (F.coalesce(F.col("found"), F.lit(0)) / F.col("k"))
                      .alias("recall")))
    return recall.select("query_id",
                         (F.col("recall") >= 0.8).alias("recall_ok"))


SQL_ANN_TOPK_LSH = """
SELECT vec_id AS query_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 5"""


def q_extraction_identity(spark, sf_dir):
    """Byte-identity of the pinned html→text extractor, value-checked: the
    query renders html from the oracle-parity corpus text (the same
    co-generation the crawl pipeline uses), extracts, and emits
    md5(extracted text) + title + method; the oracle hashes the source text
    directly — any extractor byte divergence breaks the hash."""
    from chrono_scraper_spark.corpus import _render_html_udf
    from chrono_scraper_spark.operators.extraction import with_extraction

    pages = cdx_pages_view(spark, sf_dir).filter(F.col("mime") == "text/html")
    pages = pages.withColumn(
        "page_title", F.concat(F.lit("doc "), F.col("doc_id").cast("string")))
    pages = pages.withColumn(
        "html", _render_html_udf(F.col("page_title"), F.col("text"),
                                 F.date_format("warc_ts", "yyyy-MM-dd")))
    out = with_extraction(pages)
    return out.select(
        "url", "ts14",
        F.md5(F.col("extracted.text")).alias("text_md5"),
        F.col("extracted.title").alias("title"),
        F.col("extracted.method").alias("method"),
        F.md5(F.col("extracted.markdown")).alias("markdown_md5"),
        F.col("extracted.og_title").alias("og_title"),
        F.col("extracted.pub_date").alias("pub_date"))


SQL_EXTRACTION_IDENTITY = _PRELUDE + """
SELECT url, ts14, md5(text) AS text_md5,
  'doc ' || CAST(doc_id AS VARCHAR) AS title,
  'article' AS method,
  md5('# doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || text)
    AS markdown_md5,
  'doc ' || CAST(doc_id AS VARCHAR) AS og_title,
  strftime(warc_ts, '%Y-%m-%d') AS pub_date
FROM pages_cdx WHERE mime = 'text/html'"""


def q_multimodal_features(spark, sf_dir):
    """Multimodal plumbing with a value oracle: payloads are deterministic
    (sha256-derived), so byte-level features (length, entropy, header hex)
    are recomputable in DuckDB SQL over the regenerated payload strings."""
    from chrono_scraper_spark.operators.multimodal import (
        extract_features,
        synth_media,
    )

    media = synth_media(spark, 64)
    return extract_features(media, fake=True).withColumn(
        "byte_entropy", F.round("byte_entropy", 4))


SQL_MULTIMODAL_FEATURES = """
WITH m AS (SELECT t.range AS media_id FROM range(0, 64) t),
p AS (
  SELECT media_id,
    CASE WHEN media_id % 3 = 0 THEN 'image'
         WHEN media_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
    'PAYLOAD:' || sha256(CAST(media_id AS VARCHAR)) AS s
  FROM m
),
chars AS (SELECT media_id, unnest(string_split(s, '')) AS ch FROM p),
ent AS (SELECT media_id, entropy(ch) AS e FROM chars GROUP BY 1)
SELECT p.media_id, p.kind,
  CAST(length(p.s) AS BIGINT) AS n_bytes,
  round(round(ent.e, 6), 4) AS byte_entropy,
  lower(hex(substr(p.s, 1, 4))) AS header_hex
FROM p JOIN ent USING (media_id)"""


def q_hybrid_source(spark, sf_dir):
    """O5 source union/fallback (archive_service_router.py:61-99 as data
    flow): 'wayback' (priority 1) covers doc_id%3≠0, 'cc' (priority 2)
    covers doc_id%2=0 — overlapping key sets; the merged snapshot takes
    wayback's row wherever both cover a (url, ts14) key."""
    from chrono_scraper_spark.sources.cdx import union_with_fallback

    cand = _cand(spark, sf_dir)
    wayback = cand.filter(F.col("doc_id") % 3 != 0).select(
        "url", "ts14", F.lit("wayback").alias("source"))
    cc = cand.filter(F.col("doc_id") % 2 == 0).select(
        "url", "ts14", F.lit("cc").alias("source"))
    return union_with_fallback(wayback, cc, keys=["url", "ts14"])


SQL_HYBRID_SOURCE = _PRELUDE + """
, wayback AS (SELECT url, ts14, 'wayback' AS source FROM cand
              WHERE doc_id % 3 <> 0),
cc AS (SELECT url, ts14, 'cc' AS source FROM cand WHERE doc_id % 2 = 0)
SELECT * FROM wayback
UNION ALL
SELECT c.* FROM cc c
ANTI JOIN wayback w ON c.url = w.url AND c.ts14 = w.ts14"""


def q_ann_topk_ivf(spark, sf_dir):
    """IVF-Flat ANN with the same planted-neighbor RECALL contract as
    ann_topk_lsh: each query's 5 near-identical perturbations are planted
    into the corpus; the query emits per-query ``recall_ok`` = (IVF found
    ≥0.8 of the exact top-5). A centroid-assignment or probe-routing bug
    flips rows and breaks the oracle hash."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("embedding"))
    planted = queries.select(
        F.col("query_id"), F.explode(F.sequence(F.lit(1), F.lit(5))).alias("j"),
        "embedding",
    ).select(
        (F.col("query_id") * 10 + F.col("j") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x: x + (F.pmod(F.xxhash64(F.col("query_id"), F.col("j"),
                                             x.cast("string")),
                                  F.lit(201)) - 100).cast("double") / 50000.0,
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id",
                        F.col("embedding").cast("array<double>")
                        .alias("embedding")).unionByName(planted)
    ivf = ANN.cosine_topk_ivf(corpus, queries, k=5, n_centroids=16,
                              n_probe=4).select("query_id", "neighbor_id")
    brute = ANN.cosine_topk_bruteforce(corpus, queries, k=5).select(
        "query_id", "neighbor_id")
    hit = brute.join(ivf, ["query_id", "neighbor_id"], "left_semi")
    recall = (brute.groupBy("query_id").agg(F.count(F.lit(1)).alias("k"))
              .join(hit.groupBy("query_id")
                    .agg(F.count(F.lit(1)).alias("found")),
                    "query_id", "left")
              .select("query_id",
                      (F.coalesce(F.col("found"), F.lit(0)) / F.col("k"))
                      .alias("recall")))
    return recall.select("query_id",
                         (F.col("recall") >= 0.8).alias("recall_ok"))


SQL_ANN_TOPK_IVF = """
SELECT vec_id AS query_id, TRUE AS recall_ok
FROM embeddings WHERE vec_id < 5"""


def q_pdf_extraction_identity(spark, sf_dir):
    """Byte-identity of the dependency-free PDF text parser, value-checked
    like extraction_identity: the CDX-parity corpus' application/pdf rows
    get a co-generated PDF payload rendered from their text, the mime
    router sends them through ``extract_pdf_one``, and the query emits
    md5(text/markdown) + title/method/pub_date; the oracle hashes the
    source text directly."""
    from chrono_scraper_spark.corpus import _render_pdf_udf as render_pdf
    from chrono_scraper_spark.operators.extraction import with_extraction

    pages = cdx_pages_view(spark, sf_dir).filter(
        F.col("mime") == "application/pdf")
    pages = pages.withColumn(
        "page_title", F.concat(F.lit("doc "), F.col("doc_id").cast("string")))
    pages = pages.withColumn(
        "html", render_pdf(F.col("page_title"), F.col("text"),
                           F.date_format("warc_ts", "yyyy-MM-dd")))
    out = with_extraction(pages)
    return out.select(
        "url", "ts14",
        F.md5(F.col("extracted.text")).alias("text_md5"),
        F.col("extracted.title").alias("title"),
        F.col("extracted.method").alias("method"),
        F.md5(F.col("extracted.markdown")).alias("markdown_md5"),
        F.col("extracted.pub_date").alias("pub_date"))


def q_robots_rules(spark, sf_dir):
    """P10 robots.txt parsing, value-checked: every distinct host in the
    CDX corpus gets a templated robots body (a '*' group with one
    Disallow + one Allow, plus a 'cc-bot' group that must NOT leak into
    the '*' view per RFC 9309 most-specific-group semantics); the engine
    parses the bodies with ``parse_robots``; the oracle derives the
    expected rule rows from the same template in closed form."""
    from chrono_scraper_spark.operators.politeness import parse_robots

    hosts = _cand(spark, sf_dir).select("host").distinct()
    h = F.col("host")
    tag = F.substring(F.md5(h), 1, 4)   # md5: portable to the oracle
    body = F.concat(
        F.lit("# generated\nUser-agent: *\nDisallow: /private-"), tag,
        F.lit("/\nAllow: /private-"), tag,
        F.lit("/ok/\n\nUser-agent: cc-bot\nDisallow: /cc-only/\n"))
    robots = hosts.select("host", body.alias("body"))
    return parse_robots(robots).select("host", "path_prefix", "allowed")


SQL_ROBOTS_RULES = _PRELUDE + """
, hosts AS (SELECT DISTINCT host FROM cand),
tagged AS (SELECT host, substr(md5(host), 1, 4) AS tag FROM hosts)
SELECT host, '/private-' || tag || '/' AS path_prefix, FALSE AS allowed
FROM tagged
UNION ALL
SELECT host, '/private-' || tag || '/ok/' AS path_prefix, TRUE AS allowed
FROM tagged"""


# RFC 9309 §2.2.3 wildcard ruleset exercised against the corpus paths:
# a trailing-$ extension block, a mid-* rule beaten by a more specific
# Allow, an anchored exact path, and a plain prefix for contrast.
_WILDCARD_RULES = [
    ("/*.pdf$", False),                  # blocks /paper-N.pdf
    ("/journal/*/article-", False),      # blocks journal articles...
    ("/journal/vol-3/article-*", True),  # ...except vol-3 (more octets)
    ("/index.html$", False),             # exact only (no query strings)
    ("/wp-admin/", False),               # plain prefix control
]


def q_robots_wildcard(spark, sf_dir):
    """P10 matching semantics, value-checked end-to-end: every host gets
    the same RFC 9309 wildcard ruleset (``*`` any-sequence, trailing
    ``$`` end-anchor, most-octets-wins specificity, Allow wins ties) and
    ``robots_filter`` keeps the allowed frontier rows; the oracle
    replays the ruleset relationally (regexp join + per-URL argmax).
    Reference analog: urllib.robotparser honors * and $ the same way
    Google's matcher does; prefix-only matching silently over-crawls."""
    from chrono_scraper_spark.operators.politeness import robots_filter

    cand = _cand(spark, sf_dir)
    hosts = cand.select("host").distinct()
    rules = hosts.crossJoin(
        spark.createDataFrame(_WILDCARD_RULES,
                              "path_prefix string, allowed boolean"))
    return (robots_filter(cand.select("url", "ts14", "host", "path"), rules)
            .select("url", "ts14", "host", "path"))


_WILDCARD_RULES_DUCK = """rules(rx, spec, allowed) AS (VALUES
  ('^/.*\\.pdf$', 8, FALSE),
  ('^/journal/.*/article-', 19, FALSE),
  ('^/journal/vol-3/article-.*', 24, TRUE),
  ('^/index\\.html$', 12, FALSE),
  ('^/wp-admin/', 10, FALSE))"""

SQL_ROBOTS_WILDCARD = _PRELUDE + f""",
{_WILDCARD_RULES_DUCK},
m AS (
  SELECT c.url, c.ts14, r.allowed,
    row_number() OVER (PARTITION BY c.url, c.ts14
                       ORDER BY r.spec DESC, r.allowed DESC) AS rn
  FROM cand c JOIN rules r ON regexp_matches(c.path, r.rx)
)
SELECT url, ts14, host, path FROM cand c
WHERE NOT EXISTS (SELECT 1 FROM m
                  WHERE m.rn = 1 AND NOT m.allowed
                    AND m.url = c.url AND m.ts14 = c.ts14)"""


SQL_PDF_EXTRACTION_IDENTITY = _PRELUDE + """
SELECT url, ts14, md5(text) AS text_md5,
  'doc ' || CAST(doc_id AS VARCHAR) AS title,
  'pdf' AS method,
  md5('# doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || text)
    AS markdown_md5,
  strftime(warc_ts, '%Y-%m-%d') AS pub_date
FROM pages_cdx WHERE mime = 'application/pdf'"""


def q_gopher_quality(spark, sf_dir):
    """Gopher/MassiveText quality+repetition rules over ``documents`` —
    per-row projection, zero exchanges (operators/quality.py). The oracle is
    an *independent relational implementation*: it computes the n-gram
    repetition stats by unnest + GROUP BY instead of the engine's sorted
    one-pass array aggregate, so agreement checks the semantics, not the
    code shape."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return Q.gopher_signals(d).drop("text")


_WS_TOKS_SQL = ("list_filter(string_split_regex(trim(coalesce(text, '')), "
                "'\\s+'), w -> w != '')")

SQL_GOPHER_QUALITY = f"""
WITH toks AS (
  SELECT doc_id, coalesce(text, '') AS t, {_WS_TOKS_SQL} AS tk
  FROM documents
),
base AS (
  SELECT doc_id, t, tk,
    len(tk) AS n_words,
    greatest(len(tk), 1) AS nw,
    greatest(length(t), 1) AS n_chars,
    length(regexp_replace(t, '\\s', '', 'g')) AS chars_nospace,
    list_filter(string_split(t, chr(10)), l -> trim(l) != '') AS lines
  FROM toks
),
tl AS (  -- per-word character lengths by 1-based position
  SELECT doc_id, length(unnest(tk)) AS wlen, generate_subscripts(tk, 1) AS p
  FROM toks
),
g2 AS (SELECT doc_id, unnest({OG.kgrams_sql('tk', 2)}) AS gram,
              generate_subscripts({OG.kgrams_sql('tk', 2)}, 1) AS s
       FROM toks),
top2sel AS (  -- most frequent 2-gram; count tie -> lexicographically least
  SELECT doc_id, gram FROM (
    SELECT doc_id, gram, row_number() OVER (
      PARTITION BY doc_id ORDER BY count(*) DESC, gram ASC) AS rn
    FROM g2 GROUP BY doc_id, gram)
  WHERE rn = 1
),
cov2 AS (  -- word positions covered by ANY occurrence of the top gram
  SELECT DISTINCT o.doc_id, o.s + d.d AS p
  FROM g2 o
  JOIN top2sel t ON o.doc_id = t.doc_id AND o.gram = t.gram
  CROSS JOIN (SELECT unnest([0, 1]) AS d) d
),
top2 AS (
  SELECT c.doc_id, sum(tl.wlen) AS topchars
  FROM cov2 c JOIN tl ON tl.doc_id = c.doc_id AND tl.p = c.p
  GROUP BY c.doc_id
),
g5 AS (SELECT doc_id, unnest({OG.kgrams_sql('tk', 5)}) AS gram,
              generate_subscripts({OG.kgrams_sql('tk', 5)}, 1) AS s
       FROM toks),
d5occ AS (  -- non-FIRST occurrences of every duplicated 5-gram
  SELECT doc_id, s FROM (
    SELECT doc_id, s, row_number() OVER (
      PARTITION BY doc_id, gram ORDER BY s) AS rn
    FROM g5)
  WHERE rn > 1
),
cov5 AS (
  SELECT DISTINCT o.doc_id, o.s + d.d AS p
  FROM d5occ o CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4]) AS d) d
),
dup5 AS (
  SELECT c.doc_id, sum(tl.wlen) AS dupchars
  FROM cov5 c JOIN tl ON tl.doc_id = c.doc_id AND tl.p = c.p
  GROUP BY c.doc_id
),
sig AS (
  SELECT b.doc_id,
    CAST(b.n_words AS BIGINT) AS n_words,
    round(b.chars_nospace / b.nw, 6) AS mean_word_len,
    round(len(list_filter(b.tk, w -> regexp_matches(w, '\\p{{L}}'))) / b.nw,
          6) AS alpha_word_frac,
    round(len(regexp_extract_all(b.t, '#|\\.\\.\\.')) / b.nw, 6)
      AS symbol_word_ratio,
    CAST({OG.stopword_hits_sql('b.t', 'en')} AS BIGINT) AS stop_hits,
    round(len(list_filter(b.lines, l -> regexp_matches(l, '^\\s*[-*•]')))
          / greatest(len(b.lines), 1), 6) AS bullet_line_frac,
    round(len(list_filter(b.lines,
                          l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
          / greatest(len(b.lines), 1), 6) AS ellipsis_line_frac,
    round((len(b.lines) - len(list_distinct(b.lines)))
          / greatest(len(b.lines), 1), 6) AS dup_line_frac,
    round(coalesce(t2.topchars, 0) / greatest(b.chars_nospace, 1), 6)
      AS top2gram_char_frac,
    round(coalesce(d5.dupchars, 0) / greatest(b.chars_nospace, 1), 6)
      AS dup5gram_char_frac
  FROM base b
  LEFT JOIN top2 t2 USING (doc_id)
  LEFT JOIN dup5 d5 USING (doc_id)
)
SELECT *,
  (n_words >= 50 AND n_words <= 100000
   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
   AND symbol_word_ratio <= 0.1 AND alpha_word_frac >= 0.8
   AND stop_hits >= 2 AND bullet_line_frac <= 0.9
   AND ellipsis_line_frac <= 0.3 AND dup_line_frac <= 0.3
   AND top2gram_char_frac <= 0.20 AND dup5gram_char_frac <= 0.15)
  AS passes_gopher
FROM sig"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination over the planted-clone corpus: benchmark =
    the %25 originals, corpus = their tail-mutated clones + %40 exact
    copies + the remaining originals. Clones share nearly all 8-grams with
    their benchmark source → high hit counts; untouched docs appear only on
    random shingle collisions. Plan: explode ⋈ broadcast(benchmark grams) →
    map-side-combined count (operators/quality.py:decontaminate)."""
    from chrono_scraper_spark.operators import quality as Q

    docs2 = _docs_with_clones(spark, sf_dir)
    bench = docs2.filter((F.col("doc_id") % 25 == 0)
                         & (F.col("doc_id") < 1000000))
    corpus = docs2.filter((F.col("doc_id") >= 1000000)
                          | (F.col("doc_id") % 25 != 0))
    return Q.decontaminate(corpus, bench, k=8)


SQL_DECONTAMINATE = f"""WITH {_SQL_DOCS_CLONES},
tk AS (SELECT doc_id, {OG.tokens_sql('text')} AS tk FROM docs2),
bt AS (SELECT DISTINCT unnest({OG.kgrams_sql('tk', 8)}) AS gram
       FROM tk WHERE doc_id % 25 = 0 AND doc_id < 1000000),
cg AS (SELECT doc_id, unnest({OG.kgrams_sql('tk', 8)}) AS gram
       FROM tk WHERE doc_id >= 1000000 OR doc_id % 25 <> 0)
SELECT cg.doc_id, count(DISTINCT cg.gram) AS n_hit_grams,
       count(*) AS n_hit_occurrences, TRUE AS contaminated
FROM cg JOIN bt ON cg.gram = bt.gram
GROUP BY cg.doc_id"""


def q_boilerplate_strip(spark, sf_dir):
    """C4/CCNet boilerplate-line removal, value-checked on a corpus with
    planted chrome: every even doc gets a cookie-banner header line, every
    %3 doc a copyright footer. Lines in ≥50 distinct docs are boilerplate
    (the banner: ~250 docs, the footer: ~167; real content lines repeat
    only for natural exact-dup docs, far below 50). Output = md5 of the
    cleaned text + removal count per doc; the oracle recomputes the whole
    algorithm relationally (line DF via unnest+GROUP BY, rebuild via
    order-preserving list_filter)."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    banner = F.concat(F.lit("please accept our cookies\n"), F.col("text"))
    footer = F.concat(F.col("text"), F.lit("\ncopyright example footer"))
    d2 = d.withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0, banner).otherwise(F.col("text")))
    d2 = d2.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, footer).otherwise(F.col("text")))
    out = Q.strip_boilerplate_lines(d2, min_doc_freq=50)
    return out.select("doc_id", F.md5("clean_text").alias("clean_md5"),
                      "n_lines_removed")


_NORM_LINE = "md5(trim(regexp_replace(lower({l}), '\\s+', ' ', 'g')))"

SQL_BOILERPLATE_STRIP = f"""
WITH d2 AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN base || chr(10) || 'copyright example footer'
         ELSE base END AS text
  FROM (SELECT doc_id,
          CASE WHEN doc_id % 2 = 0
               THEN 'please accept our cookies' || chr(10) || text
               ELSE text END AS base
        FROM documents)
),
lx AS (
  SELECT doc_id,
    unnest(list_filter(string_split(coalesce(text, ''), chr(10)),
                       l -> length(trim(l)) >= 1)) AS line
  FROM d2
),
freq AS (
  SELECT {_NORM_LINE.format(l='line')} AS line_hash,
         count(DISTINCT doc_id) AS nd
  FROM lx GROUP BY 1 HAVING count(DISTINCT doc_id) >= 50
),
bad AS (SELECT coalesce(list_sort(list(line_hash)), []) AS bad FROM freq)
SELECT doc_id,
  md5(array_to_string(
    list_filter(
      list_filter(string_split(coalesce(text, ''), chr(10)),
                  l -> length(trim(l)) > 0),
      l -> NOT list_contains(bad, {_NORM_LINE.format(l='l')})),
    chr(10))) AS clean_md5,
  CAST(len(list_filter(string_split(coalesce(text, ''), chr(10)),
                       l -> length(trim(l)) > 0))
       - len(list_filter(
           list_filter(string_split(coalesce(text, ''), chr(10)),
                       l -> length(trim(l)) > 0),
           l -> NOT list_contains(bad, {_NORM_LINE.format(l='l')})))
       AS BIGINT) AS n_lines_removed
FROM d2, bad"""


def q_unigram_logprob(spark, sf_dir):
    """CCNet perplexity-bucket analog: unigram LM built on the even docs,
    the odd docs scored (mean add-one-smoothed log10 prob + OOV counts).
    Model side is broadcast; the mean sums nano-quantized longs so the
    value is bit-identical across partitionings and engines."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    model = (train.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
             .groupBy("tok").agg(F.count("*").alias("cnt")))
    return Q.unigram_logprob(test, model=model)


# CTE chain shared with the lm_buckets oracle below
_SQL_UNIGRAM_CTES = f"""tr AS (
  SELECT unnest({OG.tokens_sql('text')}) AS tok
  FROM documents WHERE doc_id % 2 = 0
),
model AS (SELECT tok, count(*) AS cnt FROM tr GROUP BY tok),
tot AS (SELECT sum(cnt) AS total, count(*) AS vocab FROM model),
te AS (
  SELECT doc_id, unnest({OG.tokens_sql('text')}) AS tok
  FROM documents WHERE doc_id % 2 = 1
),
s AS (
  SELECT te.doc_id, m.cnt,
    CAST(floor(log10((coalesce(m.cnt, 0) + 1)
                     / (tot.total + tot.vocab)) * 1e9) AS BIGINT)
      AS logp_nano
  FROM te LEFT JOIN model m USING (tok), tot
),
lm_scored AS (
  SELECT doc_id,
    round(CAST(sum(logp_nano) AS DOUBLE) / count(*) / 1e9, 6)
      AS mean_logprob,
    count(*) AS n_tokens,
    CAST(sum(CASE WHEN cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
  FROM s GROUP BY doc_id
)"""

SQL_UNIGRAM_LOGPROB = f"""
WITH {_SQL_UNIGRAM_CTES}
SELECT doc_id, mean_logprob, n_tokens, n_oov FROM lm_scored"""


def q_lm_buckets(spark, sf_dir):
    """CCNet head/middle/tail per-language bucketing over the unigram-LM
    scores: exact per-lang tercile thresholds from one percentile agg
    (broadcast back; no per-language sort — see quality.lm_buckets)."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    model = (train.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
             .groupBy("tok").agg(F.count("*").alias("cnt")))
    scored = (Q.unigram_logprob(test.select("doc_id", "text"), model=model)
              .join(d.select("doc_id", "lang"), "doc_id")
              .select("doc_id", "lang", "mean_logprob"))
    return Q.lm_buckets(scored)


SQL_LM_BUCKETS = f"""
WITH {_SQL_UNIGRAM_CTES},
sl AS (
  SELECT lm_scored.doc_id, d.lang, lm_scored.mean_logprob
  FROM lm_scored JOIN documents d USING (doc_id)
),
th AS (
  SELECT lang, quantile_cont(mean_logprob, [1.0/3, 2.0/3]) AS t
  FROM sl GROUP BY lang
)
SELECT sl.doc_id, sl.lang, sl.mean_logprob,
  CASE WHEN mean_logprob >= t[2] THEN 'head'
       WHEN mean_logprob >= t[1] THEN 'middle'
       ELSE 'tail' END AS bucket
FROM sl JOIN th USING (lang)"""


def q_dsir_sample(spark, sf_dir):
    """DSIR importance resampling (Xie et al. 2023): hashed unigram+bigram
    bag models (256 buckets via leading md5 hex digits), nano-quantized
    log importance ratios, deterministic Gumbel-top-k selection of 100 docs.
    Target distribution = doc_id % 7 == 0; raw = the rest. The oracle
    recomputes models, weights, Gumbel keys and ranking relationally."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    target = d.filter(F.col("doc_id") % 7 == 0)
    raw = d.filter(F.col("doc_id") % 7 != 0)
    return Q.dsir_sample(raw, target, k=100, hash_digits=2)


SQL_DSIR_SAMPLE = f"""
WITH tk AS (SELECT doc_id, {OG.tokens_sql('text')} AS t FROM documents),
gr AS (
  SELECT doc_id,
    unnest(list_concat(t, {OG.kgrams_sql('t', 2)})) AS g
  FROM tk
),
gb AS (SELECT doc_id, {OG.hex_int_sql('md5(g)', 1, 2)} AS b FROM gr),
tc AS (SELECT b, count(*) AS tcnt FROM gb WHERE doc_id % 7 = 0 GROUP BY b),
rc AS (SELECT b, count(*) AS rcnt FROM gb WHERE doc_id % 7 != 0 GROUP BY b),
tt AS (SELECT sum(tcnt) AS tot_t FROM tc),
tr AS (SELECT sum(rcnt) AS tot_r FROM rc),
model AS (
  SELECT coalesce(tc.b, rc.b) AS b,
    CAST(floor((ln((coalesce(tcnt, 0) + 1) / (tot_t + 256))
              - ln((coalesce(rcnt, 0) + 1) / (tot_r + 256))) * 1e9)
         AS BIGINT) AS lograt_nano
  FROM tc FULL JOIN rc ON tc.b = rc.b, tt, tr
),
sc AS (
  SELECT gb.doc_id, count(*) AS n_grams,
         CAST(sum(m.lograt_nano) AS BIGINT) AS logw_nano
  FROM gb JOIN model m USING (b) WHERE gb.doc_id % 7 != 0
  GROUP BY gb.doc_id
),
allraw AS (SELECT doc_id FROM documents WHERE doc_id % 7 != 0),
gk AS (
  SELECT a.doc_id, coalesce(n_grams, 0) AS n_grams,
    coalesce(logw_nano, 0) AS logw_nano,
    CAST(floor(-ln(-ln(
      ({OG.hex_int_sql("md5('dsir:' || CAST(a.doc_id AS VARCHAR))", 1, 12)}
       + 0.5) / 281474976710656.0)) * 1e9) AS BIGINT) AS gumbel_nano
  FROM allraw a LEFT JOIN sc ON a.doc_id = sc.doc_id
)
SELECT doc_id, n_grams, logw_nano, gumbel_nano,
  logw_nano + gumbel_nano AS key_nano,
  CAST(row_number() OVER (ORDER BY (logw_nano + gumbel_nano) DESC, doc_id)
       AS INT) AS rank
FROM gk
ORDER BY key_nano DESC, doc_id LIMIT 100"""


def q_line_dedup(spark, sf_dir):
    """In-document exact line dedup (quality.dedup_lines_within_doc):
    docs with doc_id % 3 == 0 get their own first line re-appended, so the
    operator must drop exactly that planted duplicate (plus any natural
    ones); value-checked via md5 of the rebuilt text."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    first = F.element_at(
        F.split(F.coalesce(F.col("text"), F.lit("")), r"\n"), 1)
    d2 = d.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat_ws("\n", F.col("text"), first))
        .otherwise(F.col("text")))
    out = Q.dedup_lines_within_doc(d2)
    return out.select(
        "doc_id",
        F.md5("clean_text").alias("clean_md5"),
        F.length("clean_text").cast("long").alias("clean_chars"),
        "n_lines_removed")


SQL_LINE_DEDUP = r"""
WITH d2 AS (
  SELECT doc_id, CASE WHEN doc_id % 3 = 0
    THEN text || chr(10) || string_split(text, chr(10))[1]
    ELSE text END AS text
  FROM documents
),
lt AS (
  SELECT doc_id,
    list_filter(string_split(coalesce(text, ''), chr(10)),
                x -> length(trim(x)) > 0) AS ln
  FROM d2
),
h AS (
  SELECT doc_id, ln,
    list_transform(ln,
      x -> md5(trim(regexp_replace(lower(x), '\s+', ' ', 'g')))) AS hs
  FROM lt
),
k AS (
  SELECT doc_id, ln,
    list_filter(
      list_transform(range(1, len(ln) + 1),
        i -> CASE WHEN list_position(hs, hs[i]) = i THEN ln[i] END),
      x -> x IS NOT NULL) AS kept
  FROM h
)
SELECT doc_id,
  md5(array_to_string(kept, chr(10))) AS clean_md5,
  CAST(length(array_to_string(kept, chr(10))) AS BIGINT) AS clean_chars,
  CAST(len(ln) - len(kept) AS BIGINT) AS n_lines_removed
FROM k"""


def q_pack_sequences(spark, sf_dir):
    """Training-sequence packing: documents concatenated in doc_id order
    into a token stream cut into 512-token sequences; per doc the absolute
    stream offset + first/last sequence id. The engine computes the global
    prefix sum with the two-phase range-partition/offset-broadcast shape
    (no one-partition window); the oracle is a plain window cumsum."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return Q.pack_sequences(d, seq_len=512)


SQL_PACK_SEQUENCES = f"""
WITH sized AS (
  SELECT doc_id,
    CAST({OG.token_count_ws_sql('text')} AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS start_tok
  FROM sized
)
SELECT doc_id, n_tokens, start_tok,
  CAST(start_tok // 512 AS BIGINT) AS first_seq,
  CAST(CASE WHEN n_tokens = 0 THEN start_tok // 512
       ELSE (start_tok + n_tokens - 1) // 512 END AS BIGINT) AS last_seq
FROM cum"""


def q_pack_emit(spark, sf_dir):
    """Materialized packed training batches: one row per 512-token
    sequence with hashed-vocab input_ids, tail padded. Doc-span slices +
    one seq_id shuffle — never a per-token explode on the engine side;
    the oracle IS the per-token explode (fine at sf0.01, fatal at scale)."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = Q.pack_emit(d, seq_len=512)
    # engine op returns array<long>; contract row serializes it (the
    # registry's array convention — cf. minhash_signatures)
    return out.select("seq_id", "n_filled",
                      F.concat_ws("|", F.col("input_ids").cast(
                          "array<string>")).alias("input_ids"))


SQL_PACK_EMIT = f"""
WITH toks AS (
  SELECT doc_id, list_transform({{toks}},
    x -> CAST({{hx}} % 32768 AS BIGINT)) AS ids
  FROM documents
),
cum AS (
  SELECT doc_id, ids, CAST(len(ids) AS BIGINT) AS n,
    CAST(coalesce(sum(len(ids)) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS start_tok
  FROM toks
),
tok AS (
  SELECT CAST((c.start_tok + t.i) // 512 AS BIGINT) AS seq_id,
         c.start_tok + t.i AS pos, c.ids[CAST(t.i AS INT) + 1] AS tid
  FROM cum c, unnest(range(0, c.n)) AS t(i)
)
SELECT seq_id, CAST(count(*) AS BIGINT) AS n_filled,
  array_to_string(list(tid ORDER BY pos) ||
    list_transform(range(512 - count(*)), x -> CAST(0 AS BIGINT)), '|')
    AS input_ids
FROM tok GROUP BY seq_id""".format(
    toks=OG.tokens_sql("text"), hx=OG.hex_int_sql("md5(x)", 1, 8))


def q_shard_assign(spark, sf_dir):
    """Deterministic corpus export sharding: byte-offset prefix sum →
    fixed-size shard ids (what drives whole-shard output tasks at write
    time). Engine: two-phase prefix sum; oracle: window cumsum."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return Q.assign_shards(d, shard_bytes=65536)


SQL_SHARD_ASSIGN = """
WITH sized AS (
  SELECT doc_id,
    CAST(length(coalesce(text, '')) AS BIGINT) AS n_bytes
  FROM documents
),
cum AS (
  SELECT doc_id, n_bytes,
    CAST(coalesce(sum(n_bytes) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS start_byte
  FROM sized
)
SELECT doc_id, n_bytes, start_byte,
  CAST(start_byte // 65536 AS BIGINT) AS shard,
  CASE WHEN n_bytes = 0 THEN false
       ELSE start_byte // 65536 != (start_byte + n_bytes - 1) // 65536
       END AS straddles
FROM cum"""


def q_crawl_diff(spark, sf_dir):
    """Incremental-crawl snapshot diff (the CDC shape of the url_seen
    table between two catalog versions): two deterministic snapshots of
    the same url space — old omits doc_id%5==4 (→ added), new omits
    doc_id%5==0 (→ removed), doc_id%7==0 pages change content between
    crawls (→ changed) — full-outer joined and classified. All four
    classes are populated at every sf."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    url = F.concat(F.lit("https://site"),
                   (F.col("doc_id") % 40).cast("string"),
                   F.lit(".com/doc-"), F.col("doc_id").cast("string"))
    old = (d.filter(F.col("doc_id") % 5 != 4)
           .select(url.alias("url"), F.md5("text").alias("digest")))
    new = (d.filter(F.col("doc_id") % 5 != 0)
           .select(url.alias("url"),
                   F.md5(F.when(F.col("doc_id") % 7 == 0,
                                F.concat(F.col("text"), F.lit("!")))
                         .otherwise(F.col("text"))).alias("digest")))
    return snapshot_diff(old, new)


SQL_CRAWL_DIFF = """
WITH old AS (
  SELECT 'https://site' || CAST(doc_id % 40 AS VARCHAR) || '.com/doc-'
         || CAST(doc_id AS VARCHAR) AS url,
         md5(text) AS digest
  FROM documents WHERE doc_id % 5 != 4
),
new AS (
  SELECT 'https://site' || CAST(doc_id % 40 AS VARCHAR) || '.com/doc-'
         || CAST(doc_id AS VARCHAR) AS url,
         md5(CASE WHEN doc_id % 7 = 0 THEN text || '!' ELSE text END)
           AS digest
  FROM documents WHERE doc_id % 5 != 0
)
SELECT coalesce(o.url, n.url) AS url,
  o.digest AS old_digest, n.digest AS new_digest,
  CASE WHEN o.url IS NULL THEN 'added'
       WHEN n.url IS NULL THEN 'removed'
       WHEN o.digest = n.digest THEN 'unchanged'
       ELSE 'changed' END AS change
FROM old o FULL OUTER JOIN new n ON o.url = n.url"""


_WP_TOP = 25
_WP_ALPHABET = "abcdefghijklmnopqrstuvwxz"  # 'y' deliberately absent: words
# containing it that miss the top-25 whole-word cut take the [UNK] path


def q_wordpiece_encode(spark, sf_dir):
    """Tokenizer application (the apply half; vocab_topk is the counting
    half): greedy longest-match-first WordPiece encode of every document
    against a corpus-derived vocab (top-25 whole words + an incomplete
    single-char alphabet, '##' continuations, whole-word [UNK]).
    Engine: broadcast-frozenset codebook + one Arrow-batched pandas UDF
    pass, zero shuffles. Oracle: the same greedy loop as a recursive CTE
    with a LATERAL longest-match probe, run once per DISTINCT word."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    vocab = Q.wordpiece_vocab(d, top_words=_WP_TOP, alphabet=_WP_ALPHABET)
    return Q.wordpiece_encode(d, vocab)


_WP_ALPHA_SQL = ", ".join(f"('{c}')" for c in _WP_ALPHABET)

SQL_WORDPIECE_ENCODE = f"""WITH RECURSIVE
c AS (
  SELECT u.t AS token, count(*) AS n
  FROM documents, unnest({OG.tokens_sql('text')}) AS u(t)
  GROUP BY u.t
),
topw AS (SELECT token FROM c ORDER BY n DESC, token LIMIT {_WP_TOP}),
alpha(ch) AS (SELECT * FROM (VALUES {_WP_ALPHA_SQL})),
vocab(piece) AS (
  SELECT token FROM topw
  UNION SELECT ch FROM alpha
  UNION SELECT '##' || ch FROM alpha
),
toks AS (SELECT doc_id, {OG.tokens_sql('text')} AS tk FROM documents),
occ AS (
  SELECT doc_id, generate_subscripts(tk, 1) AS widx, unnest(tk) AS word
  FROM toks
),
words AS (SELECT DISTINCT word FROM occ),
wenc(word, pos, piece, ord, fail) AS (
  SELECT word, CAST(1 AS BIGINT), CAST(NULL AS VARCHAR), 0,
         len(word) > 100
  FROM words
  UNION ALL
  SELECT s.word,
         CASE WHEN m.best IS NULL THEN CAST(len(s.word) + 1 AS BIGINT)
              ELSE s.pos + m.eff END,
         m.best, s.ord + 1, m.best IS NULL
  FROM wenc s LEFT JOIN LATERAL (
    SELECT v.piece AS best,
           CAST(CASE WHEN s.pos = 1 THEN len(v.piece)
                     ELSE len(v.piece) - 2 END AS BIGINT) AS eff
    FROM vocab v
    WHERE (s.pos = 1 AND substr(v.piece, 1, 2) != '##'
           AND substr(s.word, 1, len(v.piece)) = v.piece)
       OR (s.pos > 1 AND substr(v.piece, 1, 2) = '##'
           AND substr(s.word, CAST(s.pos AS INT), len(v.piece) - 2)
               = substr(v.piece, 3))
    ORDER BY eff DESC LIMIT 1
  ) m ON true
  WHERE s.pos <= len(s.word) AND NOT s.fail
),
wres AS (
  SELECT word,
    CASE WHEN bool_or(fail) THEN '[UNK]'
         ELSE string_agg(piece, ' ' ORDER BY ord) END AS pieces,
    CASE WHEN bool_or(fail) THEN 1 ELSE count(piece) END AS np,
    CASE WHEN bool_or(fail) THEN 1 ELSE 0 END AS unk
  FROM wenc GROUP BY word
),
de AS (
  SELECT o.doc_id, o.widx, r.pieces, r.np, r.unk
  FROM occ o JOIN wres r USING (word)
)
SELECT d.doc_id,
  CAST(coalesce(sum(de.np), 0) AS BIGINT) AS n_pieces,
  CAST(coalesce(sum(de.unk), 0) AS BIGINT) AS n_unk_words,
  md5(coalesce(string_agg(de.pieces, ' ' ORDER BY de.widx), ''))
    AS piece_sig
FROM documents d LEFT JOIN de ON de.doc_id = d.doc_id
GROUP BY d.doc_id"""


def q_vocab_topk(spark, sf_dir):
    """Vocabulary construction (tokenizer counting pass): top-500 corpus
    tokens by (count desc, token), stable ids. Explode → map-side-combined
    hash agg → TakeOrderedAndProject; the rank window only ever sees the
    500 survivors."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("text")
    return Q.build_vocab(d, size=500)


SQL_VOCAB_TOPK = f"""
WITH c AS (
  SELECT u.t AS token, count(*) AS n
  FROM documents, unnest({OG.tokens_sql('text')}) AS u(t)
  GROUP BY u.t
),
top AS (
  SELECT token, n FROM c ORDER BY n DESC, token LIMIT 500
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS BIGINT)
         AS token_id,
       token, CAST(n AS BIGINT) AS n
FROM top"""


def q_fasttext_quality(spark, sf_dir):
    """fastText-architecture quality-classifier inference over documents:
    hashed-bucket token weights → integer fold → sigmoid gate. The whole
    inference is a zero-shuffle codegen projection (no explode/join)."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return Q.fasttext_score(d)


_FT_W = (f"CAST((({OG.hex_int_sql('md5(x)', 1, 8)} % 4096) * 2654435761) "
         f"% 2001 - 1000 AS BIGINT)")

SQL_FASTTEXT_QUALITY = f"""
WITH t AS (
  SELECT doc_id, {OG.tokens_sql('text')} AS toks FROM documents
),
s AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(coalesce(list_sum(list_transform(toks, x -> {_FT_W})), 0)
         AS BIGINT) AS w_sum
  FROM t
)
SELECT doc_id, n_tokens, w_sum,
  CAST(CASE WHEN n_tokens = 0 THEN 500000
       ELSE round(1e6 / (1.0 + exp(-(w_sum / (n_tokens * 1000.0)))))
       END AS BIGINT) AS score_micro,
  (n_tokens > 0 AND
   CAST(CASE WHEN n_tokens = 0 THEN 500000
        ELSE round(1e6 / (1.0 + exp(-(w_sum / (n_tokens * 1000.0)))))
        END AS BIGINT) >= 500000) AS keep
FROM s"""


def q_mix_rebalance(spark, sf_dir):
    """Data-mixing rebalance: deterministic subsampling that equalizes
    per-source token shares (uniform target), most-underrepresented source
    kept whole. One stratum-cardinality agg + broadcast joins; the corpus
    is never shuffled."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return Q.mix_rebalance(d)


SQL_MIX_REBALANCE = f"""
WITH sized AS (
  SELECT doc_id, source,
    CAST({OG.token_count_ws_sql('text')} AS BIGINT) AS n_tokens
  FROM documents
),
tot AS (
  SELECT source, sum(n_tokens) AS src_tokens FROM sized GROUP BY source
),
tgt AS (
  SELECT source, src_tokens,
    CAST(1000000 // (SELECT count(*) FROM tot) AS BIGINT) AS target_ppm
  FROM tot
),
r AS (
  SELECT source, target_ppm,
    CASE WHEN src_tokens > 0
         THEN CAST(target_ppm * 1000000000 // src_tokens AS BIGINT)
         ELSE 0 END AS rate_e9
  FROM tgt
),
acc AS (
  SELECT source,
    CASE WHEN rate_e9 = (SELECT max(rate_e9) FROM r) AND rate_e9 > 0
         THEN 1000000
         WHEN (SELECT max(rate_e9) FROM r) > 0
         THEN CAST(floor(CAST(rate_e9 AS DOUBLE) * 1e6
                         / (SELECT max(rate_e9) FROM r)) AS BIGINT)
         ELSE 0 END AS accept_ppm
  FROM r
)
SELECT s.doc_id, s.source, s.n_tokens, a.accept_ppm,
  ({OG.hex_int_sql("md5('mix:' || CAST(s.doc_id AS VARCHAR))", 1, 8)}
   % 1000000) < a.accept_ppm AS keep
FROM sized s JOIN acc a USING (source)"""


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling: the 10 smallest-md5(doc_id) docs
    per source, ranked — the data-mixing per-domain cap sample. Runs the
    two-phase mega-stratum path (salt_k=4); the oracle computes the sample
    with a single direct window, so a green row also proves the pre-prune
    is result-invariant."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return Q.stratified_sample(d, "source", cap=10, key_col="doc_id",
                               salt_k=4)


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, source, CAST(rn AS INT) AS sample_rank FROM (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
WHERE rn <= 10"""


def q_host_authority(spark, sf_dir):
    """Iterative host-authority (integer PageRank, 5 iterations) over a
    deterministic synthetic link graph: each page links its host to the
    host the corpus formula assigns to k=(doc_id·7+3)%500. Both engines
    derive the identical edge list from the pages table, and every rank
    update is integer floor-division + long sums, so after 5 Pregel-style
    iterations the nano-scaled ranks are BIT-identical to the oracle's
    5 chained relational CTEs (operators/graph.py)."""
    from chrono_scraper_spark.operators import graph as G

    pages = cdx_pages_view(spark, sf_dir)
    k = (F.col("doc_id") * 7 + 3) % 500
    dst = (F.when(k % 3 == 0, F.lit("mega.example.com"))
           .when(k % 20 == 1, F.concat(F.lit("univ"),
                                       (k % 4).cast("string"),
                                       F.lit(".edu")))
           .when(k % 20 == 2, F.concat(F.lit("agency"),
                                       (k % 3).cast("string"),
                                       F.lit(".gov")))
           .otherwise(F.concat(F.lit("site"), (k % 40).cast("string"),
                               F.lit(".com"))))
    edges = pages.select(F.col("host").alias("src"),
                         dst.alias("dst")).distinct()
    return G.host_authority(edges, iters=5)


def q_authority_budgets(spark, sf_dir):
    """Authority-proportional crawl-budget apportionment
    (operators/politeness.py ``authority_budgets``): a 1,000-fetch round
    budget split across hosts by largest-remainder (Hamilton) method over
    the integer PageRank ranks — exact integer quotas, leftover seats to
    the largest remainders (host asc ties), min 1 per host. The oracle
    replays the apportionment relationally on the same rank CTEs."""
    from chrono_scraper_spark.operators import graph as G
    from chrono_scraper_spark.operators.politeness import authority_budgets

    pages = cdx_pages_view(spark, sf_dir)
    k = (F.col("doc_id") * 7 + 3) % 500
    dst = (F.when(k % 3 == 0, F.lit("mega.example.com"))
           .when(k % 20 == 1, F.concat(F.lit("univ"),
                                       (k % 4).cast("string"),
                                       F.lit(".edu")))
           .when(k % 20 == 2, F.concat(F.lit("agency"),
                                       (k % 3).cast("string"),
                                       F.lit(".gov")))
           .otherwise(F.concat(F.lit("site"), (k % 40).cast("string"),
                               F.lit(".com"))))
    edges = pages.select(F.col("host").alias("src"),
                         dst.alias("dst")).distinct()
    return authority_budgets(G.host_authority(edges, iters=5), 1000)


def q_quantile_sketch(spark, sf_dir):
    """Mergeable deterministic quantile sketch (operators/analytics.py
    ``log2_quantile_sketch``): power-of-two histogram over content
    length, p50/p90/p99 estimates as bin upper bounds. Sketch state is
    ≤65 longs — map-side combinable and bit-identical across engines,
    unlike percentile_approx's KLL state. Exact twin: status_percentiles
    (A7) stays the small-N path."""
    from chrono_scraper_spark.operators.analytics import (
        log2_quantile_sketch,
    )

    pages = cdx_pages_view(spark, sf_dir)
    return log2_quantile_sketch(pages.select("length"), "length",
                                (50, 90, 99))


SQL_QUANTILE_SKETCH = f"WITH pages_cdx AS ({PAGES_CTE_DUCK})" + """,
hist AS (
  SELECT CASE WHEN length <= 0 THEN 0
              ELSE CAST(length(bin(length)) AS INT) END AS bin,
         count(*) AS cnt
  FROM pages_cdx GROUP BY 1),
cum AS (
  SELECT bin,
    CAST(sum(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum_count,
    CAST((SELECT sum(cnt) FROM hist) AS BIGINT) AS n
  FROM hist),
t AS (
  SELECT q.q, c.bin, c.cum_count, c.n
  FROM cum c CROSS JOIN (VALUES (50), (90), (99)) q(q)
  WHERE c.cum_count * 100 >= q.q * c.n),
best AS (SELECT q, min(bin) AS bin FROM t GROUP BY q)
SELECT CAST(b.q AS INT) AS q, b.bin,
  CAST(CASE WHEN b.bin = 0 THEN 0
            ELSE (CAST(1 AS BIGINT) << b.bin) - 1 END AS BIGINT)
    AS upper_bound,
  c.cum_count, c.n
FROM best b JOIN cum c ON b.bin = c.bin"""


def q_hll_distinct(spark, sf_dir):
    """Deterministic mergeable HyperLogLog (operators/analytics.py
    ``hll_distinct``): per-host approximate COUNT(DISTINCT url), p=8.
    md5-derived buckets/rhos make registers AND estimate bit-identical
    cross-engine (Spark's approx_count_distinct state is neither); the
    harmonic sum is exact-integer so the single double division sees
    identical operands. Exact twins stay the small-N path (A8/A10
    countDistinct)."""
    from chrono_scraper_spark.operators.analytics import hll_distinct

    pages = cdx_pages_view(spark, sf_dir)
    return hll_distinct(pages.select("host", "url"), "url",
                        keys=("host",))


SQL_HLL_DISTINCT = f"WITH pages_cdx AS ({PAGES_CTE_DUCK})" + """,
h AS (SELECT host, md5(url) AS hh FROM pages_cdx),
rr AS (
  SELECT host,
    (strpos('0123456789abcdef', substring(hh, 1, 1)) - 1) * 16
      + strpos('0123456789abcdef', substring(hh, 2, 1)) - 1 AS bucket,
    CASE WHEN regexp_replace(substring(hh, 3, 14), '^0+', '') = ''
         THEN 57
         ELSE (14 - length(regexp_replace(substring(hh, 3, 14),
                                          '^0+', ''))) * 4
              + CASE WHEN strpos('0123456789abcdef',
                       substring(regexp_replace(substring(hh, 3, 14),
                                 '^0+', ''), 1, 1)) - 1 >= 8 THEN 0
                     WHEN strpos('0123456789abcdef',
                       substring(regexp_replace(substring(hh, 3, 14),
                                 '^0+', ''), 1, 1)) - 1 >= 4 THEN 1
                     WHEN strpos('0123456789abcdef',
                       substring(regexp_replace(substring(hh, 3, 14),
                                 '^0+', ''), 1, 1)) - 1 >= 2 THEN 2
                     ELSE 3 END + 1 END AS rho
  FROM h),
regs AS (SELECT host, bucket, max(rho) AS register
         FROM rr GROUP BY host, bucket),
agg AS (SELECT host, count(*) AS nb,
          sum(((1::BIGINT << (57 - register)))::HUGEINT) AS s
        FROM regs GROUP BY host),
fin AS (SELECT host,
          s + (256 - nb)::HUGEINT * ((1::BIGINT << 57))::HUGEINT AS st,
          256 - nb AS v
        FROM agg)
SELECT host,
  CAST(floor(CASE WHEN 0.7213 / (1 + 1.079 / 256) * 256 * 256
                       * power(2, 57) / CAST(st AS DOUBLE) <= 2.5 * 256
                       AND v > 0
                  THEN 256 * ln(256 / CAST(v AS DOUBLE))
                  ELSE 0.7213 / (1 + 1.079 / 256) * 256 * 256
                       * power(2, 57) / CAST(st AS DOUBLE) END
             + 0.5) AS BIGINT) AS est_distinct
FROM fin"""


def q_cms_host_counts(spark, sf_dir):
    """Deterministic mergeable count-min sketch (operators/analytics.py
    ``cms_build``/``cms_query``, d=4 w=1024): per-host capture-count
    estimates — min over the host's 4 salted-md5 cells, overestimate-only.
    Sketch state is ≤ d·w longs regardless of corpus size; states merge
    by cell addition. The exact twin is a plain count(*) groupBy; the
    sketch is the shape that survives 10^10 keys."""
    from chrono_scraper_spark.operators.analytics import (
        cms_build,
        cms_query,
    )

    pages = cdx_pages_view(spark, sf_dir).select("host")
    return cms_query(cms_build(pages, "host"), pages, "host")


_CMS_BUCKET = """((strpos('0123456789abcdef', substring({h}, 1, 1)) - 1)
      * 256
      + (strpos('0123456789abcdef', substring({h}, 2, 1)) - 1) * 16
      + strpos('0123456789abcdef', substring({h}, 3, 1)) - 1) % 1024"""

SQL_CMS_HOST_COUNTS = (
    f"WITH pages_cdx AS ({PAGES_CTE_DUCK})" + """,
rows_t AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(r)),
hx AS (SELECT r, md5(r::VARCHAR || ':' || host) AS h
       FROM pages_cdx CROSS JOIN rows_t),
cells AS (SELECT r, """ + _CMS_BUCKET.format(h="h") + """ AS col_bucket,
    count(*) AS cnt
  FROM hx GROUP BY 1, 2),
qc AS (SELECT q.host, r.r AS r,
    """ + _CMS_BUCKET.format(h="md5(r.r::VARCHAR || ':' || q.host)")
    + """ AS col_bucket
  FROM (SELECT DISTINCT host FROM pages_cdx) q CROSS JOIN rows_t r)
SELECT q.host, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est
FROM qc q LEFT JOIN cells c
  ON q.r = c.r AND q.col_bucket = c.col_bucket
GROUP BY q.host""")


def q_url_tree(spark, sf_dir):
    """Hierarchical path-prefix rollup (operators/analytics.py
    ``url_tree_stats``): per (host, depth≤3, '/seg1/…/') — distinct URLs,
    captures, distinct digests. Bounded explode (≤3 prefixes/row), one
    agg; the oracle replays it with a 3-row depth VALUES join."""
    from chrono_scraper_spark.operators.analytics import url_tree_stats

    return url_tree_stats(cdx_pages_view(spark, sf_dir), max_depth=3)


SQL_URL_TREE = f"WITH pages_cdx AS ({PAGES_CTE_DUCK})" + """,
segd AS (
  SELECT host, url, digest,
    list_filter(string_split(string_split_regex(path, '\\?')[1], '/'),
                s -> s <> '') AS segs
  FROM pages_cdx
),
expl AS (
  SELECT host, url, digest, d.d AS depth,
    '/' || array_to_string(segs[1:d.d], '/') || '/' AS prefix
  FROM segd CROSS JOIN (VALUES (1), (2), (3)) d(d)
  WHERE d.d <= least(len(segs), 3)
)
SELECT host, CAST(depth AS INT) AS depth, prefix,
  count(DISTINCT url) AS n_urls,
  count(*) AS n_captures,
  count(DISTINCT digest) AS n_digests
FROM expl GROUP BY host, depth, prefix"""


def q_hits(spark, sf_dir):
    """HITS hubs & authorities (operators/graph.py::hits, 3 iterations)
    over the same deterministic k-formula link graph as host_authority.
    Integer arithmetic with overflow-safe shift-divide L1 normalization
    (score = raw DIV max(1, ceil(Σraw/SCALE))) — bit-identical to the
    oracle's chained CTEs; hub updates read the SAME-iteration (new)
    authority scores per Kleinberg's alternation."""
    from chrono_scraper_spark.operators import graph as G

    pages = cdx_pages_view(spark, sf_dir)
    k = (F.col("doc_id") * 7 + 3) % 500
    dst = (F.when(k % 3 == 0, F.lit("mega.example.com"))
           .when(k % 20 == 1, F.concat(F.lit("univ"),
                                       (k % 4).cast("string"),
                                       F.lit(".edu")))
           .when(k % 20 == 2, F.concat(F.lit("agency"),
                                       (k % 3).cast("string"),
                                       F.lit(".gov")))
           .otherwise(F.concat(F.lit("site"), (k % 40).cast("string"),
                               F.lit(".com"))))
    edges = pages.select(F.col("host").alias("src"),
                         dst.alias("dst")).distinct()
    return G.hits(edges, iters=3)


_HITS_SCALE = 10**12


def _hits_iter_cte(i: int) -> str:
    """One HITS iteration: auth from previous hubs, hub from NEW auths,
    each shift-divide normalized. s{i} -> s{i+1}. Every CTE is
    MATERIALIZED: each is referenced 2-3× (the scalar normalization
    subquery plus the next CTE), and without the hint DuckDB inlines the
    whole chain per reference — exponential re-evaluation across the 3
    iterations (>120 s at sf0.01; 0.06 s materialized)."""
    sc, c = _HITS_SCALE, _HITS_SCALE - 1
    return f"""ar{i} AS MATERIALIZED (
  SELECT e.dst AS host, CAST(sum(s.hub_nano) AS BIGINT) AS raw
  FROM edges e JOIN s{i} s ON e.src = s.host GROUP BY e.dst),
an{i} AS MATERIALIZED (
  SELECT host, raw // greatest(CAST(1 AS BIGINT),
    ((SELECT CAST(sum(raw) AS BIGINT) FROM ar{i}) + {c}) // {sc})
    AS auth_nano
  FROM ar{i}),
hr{i} AS MATERIALIZED (
  SELECT e.src AS host, CAST(sum(a.auth_nano) AS BIGINT) AS raw
  FROM edges e JOIN an{i} a ON e.dst = a.host GROUP BY e.src),
hn{i} AS MATERIALIZED (
  SELECT host, raw // greatest(CAST(1 AS BIGINT),
    ((SELECT CAST(sum(raw) AS BIGINT) FROM hr{i}) + {c}) // {sc})
    AS hub_nano
  FROM hr{i}),
s{i + 1} AS MATERIALIZED (
  SELECT h.host,
    CAST(coalesce(hn.hub_nano, 0) AS BIGINT) AS hub_nano,
    CAST(coalesce(an.auth_nano, 0) AS BIGINT) AS auth_nano
  FROM hosts h LEFT JOIN hn{i} hn ON h.host = hn.host
  LEFT JOIN an{i} an ON h.host = an.host)"""


SQL_HITS = (f"WITH pages_cdx AS MATERIALIZED ({PAGES_CTE_DUCK}),\n"
            + """
ek AS MATERIALIZED (
  SELECT host AS src, (doc_id * 7 + 3) % 500 AS k FROM pages_cdx),
edges0 AS MATERIALIZED (
  SELECT DISTINCT src,
    CASE WHEN k % 3 = 0 THEN 'mega.example.com'
         WHEN k % 20 = 1 THEN 'univ' || CAST(k % 4 AS VARCHAR) || '.edu'
         WHEN k % 20 = 2 THEN 'agency' || CAST(k % 3 AS VARCHAR) || '.gov'
         ELSE 'site' || CAST(k % 40 AS VARCHAR) || '.com' END AS dst
  FROM ek),
edges AS MATERIALIZED (SELECT src, dst FROM edges0 WHERE src <> dst),
hosts AS MATERIALIZED (
  SELECT src AS host FROM edges0 UNION SELECT dst FROM edges0),
s0 AS MATERIALIZED (SELECT host,
  CAST((SELECT 1000000000000 // count(*) FROM hosts) AS BIGINT) AS hub_nano,
  CAST((SELECT 1000000000000 // count(*) FROM hosts) AS BIGINT) AS auth_nano
  FROM hosts),
""" + ",\n".join(_hits_iter_cte(i) for i in range(3))
            + "\nSELECT host, hub_nano, auth_nano FROM s3")


def _pagerank_iter_cte(i: int) -> str:
    return f"""r{i + 1} AS MATERIALIZED (
  SELECT h.host,
    CAST((SELECT (1000000000000 * 15) // (100 * count(*)) FROM hosts)
         + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS rank_nano
  FROM hosts h LEFT JOIN (
    SELECT e.dst AS host, sum(r.rank_nano // o.outdeg) AS s
    FROM edges e JOIN r{i} r ON e.src = r.host
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst) s ON h.host = s.host)"""


SQL_HOST_AUTHORITY = (f"WITH pages_cdx AS MATERIALIZED "
                      f"({PAGES_CTE_DUCK}),\n"
                      + """
ek AS MATERIALIZED (
  SELECT host AS src, (doc_id * 7 + 3) % 500 AS k FROM pages_cdx),
edges0 AS MATERIALIZED (
  SELECT DISTINCT src,
    CASE WHEN k % 3 = 0 THEN 'mega.example.com'
         WHEN k % 20 = 1 THEN 'univ' || CAST(k % 4 AS VARCHAR) || '.edu'
         WHEN k % 20 = 2 THEN 'agency' || CAST(k % 3 AS VARCHAR) || '.gov'
         ELSE 'site' || CAST(k % 40 AS VARCHAR) || '.com' END AS dst
  FROM ek),
edges AS MATERIALIZED (SELECT src, dst FROM edges0 WHERE src <> dst),
hosts AS MATERIALIZED (
  SELECT src AS host FROM edges0 UNION SELECT dst FROM edges0),
outdeg AS MATERIALIZED (
  SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
r0 AS MATERIALIZED (SELECT host,
  CAST((SELECT 1000000000000 // count(*) FROM hosts) AS BIGINT) AS rank_nano
  FROM hosts),
""" + ",\n".join(_pagerank_iter_cte(i) for i in range(5))
                      + "\nSELECT host, rank_nano FROM r5")


SQL_AUTHORITY_BUDGETS = (
    SQL_HOST_AUTHORITY.replace(
        "\nSELECT host, rank_nano FROM r5", "") + """,
q AS (
  SELECT host,
    (1000 * rank_nano) // (SELECT sum(rank_nano) FROM r5) AS base,
    (1000 * rank_nano) % (SELECT sum(rank_nano) FROM r5) AS rem
  FROM r5),
lft AS (SELECT 1000 - sum(base) AS l FROM q),
pos AS (SELECT host, base, rem,
  row_number() OVER (ORDER BY rem DESC, host ASC) AS p FROM q)
SELECT host,
  CAST(greatest(1, base + CASE WHEN p <= (SELECT l FROM lft)
                               THEN 1 ELSE 0 END) AS INT) AS budget
FROM pos""")


def _linked_pages(spark, sf_dir):
    """Pages with a deterministically constructed html column containing a
    mix of link shapes: nav links (root-relative, both quote styles), one
    cross-host absolute link (the host_authority k-formula target), an
    optional local link with a NESTED tag in the anchor, and a fragment +
    mailto link that extraction must drop."""
    pages = cdx_pages_view(spark, sf_dir)
    k = (F.col("doc_id") * 7 + 3) % 500
    dst_host = (F.when(k % 3 == 0, F.lit("mega.example.com"))
                .when(k % 20 == 1, F.concat(F.lit("univ"),
                                            (k % 4).cast("string"),
                                            F.lit(".edu")))
                .when(k % 20 == 2, F.concat(F.lit("agency"),
                                            (k % 3).cast("string"),
                                            F.lit(".gov")))
                .otherwise(F.concat(F.lit("site"), (k % 40).cast("string"),
                                    F.lit(".com"))))
    w1 = F.element_at(F.split(F.coalesce(F.col("text"), F.lit("")), " "), 1)
    html = F.concat(
        F.lit('<html><body><nav><a href="/">Home</a> '
              "<a href='/blog/'>blog  index</a></nav><p>see "
              '<a href="https://'),
        dst_host, F.lit("/ref-"), (F.col("doc_id") % 97).cast("string"),
        F.lit('">'), w1, F.lit(" guide</a></p>"),
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit('<a rel="nofollow" href="/local/page-'),
                        (F.col("doc_id") % 50).cast("string"),
                        F.lit('">local <b>'), w1, F.lit("</b></a>")))
        .otherwise(F.lit("")),
        F.lit('<a href="#top">top</a>'
              '<a href="mailto:x@example.com">mail</a></body></html>'))
    return pages.withColumn("html", html)


_LINKED_HTML_DUCK = """
'<html><body><nav><a href="/">Home</a> ' ||
'<a href=''/blog/''>blog  index</a></nav><p>see ' ||
'<a href="https://' ||
CASE WHEN (doc_id * 7 + 3) % 500 % 3 = 0 THEN 'mega.example.com'
     WHEN (doc_id * 7 + 3) % 500 % 20 = 1
       THEN 'univ' || CAST((doc_id * 7 + 3) % 500 % 4 AS VARCHAR) || '.edu'
     WHEN (doc_id * 7 + 3) % 500 % 20 = 2
       THEN 'agency' || CAST((doc_id * 7 + 3) % 500 % 3 AS VARCHAR) || '.gov'
     ELSE 'site' || CAST((doc_id * 7 + 3) % 500 % 40 AS VARCHAR) || '.com'
END ||
'/ref-' || CAST(doc_id % 97 AS VARCHAR) || '">' ||
string_split(coalesce(text, ''), ' ')[1] || ' guide</a></p>' ||
CASE WHEN doc_id % 4 = 0
     THEN '<a rel="nofollow" href="/local/page-' || CAST(doc_id % 50 AS VARCHAR) ||
          '">local <b>' || string_split(coalesce(text, ''), ' ')[1] ||
          '</b></a>'
     ELSE '' END ||
'<a href="#top">top</a><a href="mailto:x@example.com">mail</a></body></html>'
"""

_LINKS_CTES = f"""
pages_cdx AS ({PAGES_CTE_DUCK}),
p AS (
  SELECT url AS src_url, host AS src_host, {_LINKED_HTML_DUCK} AS html
  FROM pages_cdx
),
tags AS (
  SELECT src_url, src_host,
    unnest(regexp_extract_all(html, '(?is)<a\\s[^>]*>.*?</a>')) AS tag
  FROM p
),
parsed AS (
  SELECT src_url, src_host,
    regexp_extract(regexp_extract(tag, '(?is)^<a[^>]*>', 0), '(?i)href\\s*=\\s*["'']([^"'']*)["'']', 1) AS href,
    (',' || regexp_replace(
       lower(regexp_extract(regexp_extract(tag, '(?is)^<a[^>]*>', 0), '(?i)rel\\s*=\\s*["'']([^"'']*)["'']', 1)),
       '\\s+', ',', 'g') || ',') LIKE '%,nofollow,%' AS nofollow,
    trim(regexp_replace(
      lower(regexp_replace(
        regexp_extract(tag, '(?is)^<a[^>]*>(.*)</a>$', 1),
        '<[^>]*>', '', 'g')),
      '\\s+', ' ', 'g')) AS anchor_text
  FROM tags
),
kept AS (
  SELECT * FROM parsed
  WHERE href <> '' AND href NOT LIKE '#%'
    AND lower(href) NOT LIKE 'mailto:%'
    AND lower(href) NOT LIKE 'javascript:%'
),
resolved AS (
  SELECT src_url, src_host, href, anchor_text, nofollow,
    CASE WHEN regexp_matches(href, '(?i)^https?://') THEN href
         WHEN href LIKE '/%' THEN 'https://' || src_host || href
    END AS dst_url
  FROM kept
),
links AS (
  SELECT src_url, src_host, href, anchor_text, nofollow, dst_url,
    regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host
  FROM resolved WHERE dst_url IS NOT NULL
)"""


def q_link_extract(spark, sf_dir):
    """Link extraction over page HTML (operators/links.py): one row per
    resolvable <a href> tag with normalized anchor text, href-policy
    resolution, and target host — the web-graph ingestion pass. JVM
    regexp/array expressions only (RE2-compatible pattern, byte-identical
    in the DuckDB oracle)."""
    from chrono_scraper_spark.operators.links import extract_links

    return extract_links(_linked_pages(spark, sf_dir)).select(
        "src_url", "src_host", "href", "anchor_text", "dst_url", "dst_host")


SQL_LINK_EXTRACT = ("WITH " + _LINKS_CTES + """
SELECT src_url, src_host, href, anchor_text, dst_url, dst_host FROM links""")


def q_links_nofollow(spark, sf_dir):
    """Per-link ``rel="nofollow"`` reporting (operators/links.py): the
    planted local link carries the token; the spider and link graph can
    drop such edges without re-parsing html. Same RE2-safe tag pass as
    link_extract — the flag is one rel-extraction + token membership on
    a comma-normalized string."""
    from chrono_scraper_spark.operators.links import extract_links

    return extract_links(_linked_pages(spark, sf_dir)).select(
        "src_url", "href", "dst_url", "nofollow")


SQL_LINKS_NOFOLLOW = ("WITH " + _LINKS_CTES + """
SELECT src_url, href, dst_url, nofollow FROM links""")


def q_meta_robots(spark, sf_dir):
    """Page-level REP directives (operators/links.py::meta_robots):
    <meta name="robots"> parsed to (url, noindex, nofollow), 'none'
    implying both, absent tag implying neither — planted across both
    quote styles and all four directive shapes."""
    from chrono_scraper_spark.operators.links import meta_robots

    pages = cdx_pages_view(spark, sf_dir)
    html = F.concat(
        F.lit("<html><head>"),
        F.when(F.col("doc_id") % 5 == 0,
               F.lit('<meta name="robots" content="noindex, nofollow">'))
        .when(F.col("doc_id") % 5 == 1,
              F.lit("<meta name='robots' content='nofollow'>"))
        .when(F.col("doc_id") % 5 == 2,
              F.lit('<meta name="robots" content="none">'))
        .when(F.col("doc_id") % 5 == 3,
              F.lit('<meta name="robots" content="index, follow">'))
        .otherwise(F.lit("")),
        F.lit("</head><body></body></html>"))
    return meta_robots(pages.withColumn("html", html))


SQL_META_ROBOTS = f"WITH pages_cdx AS ({PAGES_CTE_DUCK})" + """,
p AS (
  SELECT url, '<html><head>' ||
    CASE WHEN doc_id % 5 = 0
           THEN '<meta name="robots" content="noindex, nofollow">'
         WHEN doc_id % 5 = 1
           THEN '<meta name=''robots'' content=''nofollow''>'
         WHEN doc_id % 5 = 2 THEN '<meta name="robots" content="none">'
         WHEN doc_id % 5 = 3
           THEN '<meta name="robots" content="index, follow">'
         ELSE '' END || '</head><body></body></html>' AS html
  FROM pages_cdx),
t AS (
  SELECT url,
    regexp_extract_all(html,
      '(?is)<meta\\s[^>]*name\\s*=\\s*["'']robots["''][^>]*>') AS tags
  FROM p),
c AS (
  SELECT url,
    ',' || regexp_replace(
      lower(coalesce(array_to_string(list_transform(tags, t ->
        regexp_extract(t,
          '(?i)content\\s*=\\s*["'']([^"'']*)["'']', 1)), ','), '')),
      '\\s+', ',', 'g') || ',' AS content
  FROM t)
SELECT url,
  (content LIKE '%,noindex,%' OR content LIKE '%,none,%') AS noindex,
  (content LIKE '%,nofollow,%' OR content LIKE '%,none,%') AS nofollow
FROM c"""


def q_rel_canonical(spark, sf_dir):
    """Author-declared canonical URLs (operators/links.py::
    rel_canonical): <link rel="canonical"> resolved under the
    extract_links href policy, identity default when absent — the
    collapse key search engines use for duplicate content. Planted:
    every 3rd page declares an absolute canonical, every 7th a
    root-relative one, others none."""
    from chrono_scraper_spark.operators.links import rel_canonical

    pages = cdx_pages_view(spark, sf_dir)
    html = F.concat(
        F.lit("<html><head>"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit('<link rel="canonical" href="https://'),
                        F.col("host"), F.lit("/canon-"),
                        (F.col("doc_id") % 11).cast("string"),
                        F.lit('">')))
        .when(F.col("doc_id") % 7 == 0,
              F.concat(F.lit("<link rel='canonical' href='/c/"),
                       (F.col("doc_id") % 13).cast("string"),
                       F.lit("'>")))
        .otherwise(F.lit("")),
        F.lit("</head><body></body></html>"))
    return rel_canonical(pages.withColumn("html", html))


SQL_REL_CANONICAL = f"WITH pages_cdx AS ({PAGES_CTE_DUCK})" + """,
p AS (
  SELECT url, host, '<html><head>' ||
    CASE WHEN doc_id % 3 = 0
           THEN '<link rel="canonical" href="https://' || host ||
                '/canon-' || CAST(doc_id % 11 AS VARCHAR) || '">'
         WHEN doc_id % 7 = 0
           THEN '<link rel=''canonical'' href=''/c/' ||
                CAST(doc_id % 13 AS VARCHAR) || '''>'
         ELSE '' END || '</head><body></body></html>' AS html
  FROM pages_cdx),
t AS (
  SELECT url, host,
    regexp_extract(regexp_extract(html,
        '(?is)<link\\s[^>]*rel\\s*=\\s*["'']canonical["''][^>]*>', 0),
      '(?i)href\\s*=\\s*["'']([^"'']*)["'']', 1) AS href
  FROM p)
SELECT url,
  coalesce(CASE WHEN regexp_matches(href, '(?i)^https?://') THEN href
                WHEN href LIKE '/%' THEN 'https://' || host || href
           END, url) AS canonical_url
FROM t"""


def q_anchor_texts(spark, sf_dir):
    """Anchor-text aggregation per target URL (how the web describes each
    page — the classic document-expansion signal): one hash agg on
    (dst_url, anchor_text) with map-side partials."""
    from chrono_scraper_spark.operators.links import (
        anchor_text_counts,
        extract_links,
    )

    return anchor_text_counts(extract_links(_linked_pages(spark, sf_dir)))


SQL_ANCHOR_TEXTS = ("WITH " + _LINKS_CTES + """
SELECT dst_url, anchor_text, CAST(count(*) AS BIGINT) AS n_links,
  CAST(count(DISTINCT src_host) AS BIGINT) AS n_src_hosts
FROM links WHERE anchor_text <> ''
GROUP BY dst_url, anchor_text""")


def q_sitemap_discover(spark, sf_dir):
    """Sitemap-XML discovery + lastmod recrawl candidacy
    (operators/sitemaps.py): per-host urlset bodies are deterministically
    constructed (one <url> block per distinct URL; every 5th URL claims a
    lastmod AFTER its last capture → stale, every 5th+1 an old date-only
    lastmod → fresh, plus one sitemap-only URL per host → new), parsed
    with the RE2-shared regexes, and joined against the capture log."""
    from chrono_scraper_spark.operators.sitemaps import (
        parse_sitemaps,
        sitemap_recrawl_status,
    )

    pages = cdx_pages_view(spark, sf_dir)
    per_url = pages.groupBy("host", "url", "doc_id").agg(
        F.max("warc_ts").alias("mx"))
    lm = (F.when(F.col("doc_id") % 5 == 0,
                 F.date_format(F.date_add(F.to_date("mx"), 400),
                               "yyyy-MM-dd"))
          .when(F.col("doc_id") % 5 == 1,
                F.date_format(F.date_add(F.to_date("mx"), -400),
                              "yyyy-MM-dd")))
    block = F.concat(
        F.lit("<url><loc>"), F.col("url"), F.lit("</loc>"),
        F.coalesce(F.concat(F.lit("<lastmod>"), lm, F.lit("</lastmod>")),
                   F.lit("")),
        F.lit("</url>"))
    bodies = (per_url.select("host", block.alias("b"))
              .groupBy("host")
              .agg(F.concat(
                  F.lit('<?xml version="1.0"?><urlset>'),
                  F.concat_ws("", F.array_sort(F.collect_list("b"))),
                  F.lit("<url><loc>https://"), F.col("host"),
                  F.lit("/sitemap-only-1</loc>"
                        "<lastmod>2022-01-01</lastmod></url></urlset>"))
                  .alias("body")))
    entries = parse_sitemaps(bodies)
    return sitemap_recrawl_status(entries, pages)


SQL_SITEMAP_DISCOVER = f"""
WITH pages_cdx AS ({PAGES_CTE_DUCK}),
per_url AS (
  SELECT host, url, doc_id, max(warc_ts) AS mx
  FROM pages_cdx GROUP BY 1, 2, 3
),
blocks AS (
  SELECT host,
    '<url><loc>' || url || '</loc>' ||
    coalesce('<lastmod>' ||
      CASE WHEN doc_id % 5 = 0
             THEN strftime(CAST(mx AS DATE) + 400, '%Y-%m-%d')
           WHEN doc_id % 5 = 1
             THEN strftime(CAST(mx AS DATE) - 400, '%Y-%m-%d')
      END || '</lastmod>', '') ||
    '</url>' AS b
  FROM per_url
),
bodies AS (
  SELECT host,
    '<?xml version="1.0"?><urlset>' ||
    string_agg(b, '' ORDER BY b) ||
    '<url><loc>https://' || host || '/sitemap-only-1</loc>' ||
    '<lastmod>2022-01-01</lastmod></url></urlset>' AS body
  FROM blocks GROUP BY host
),
ub AS (
  SELECT host,
    unnest(regexp_extract_all(body, '(?is)<url>.*?</url>')) AS block
  FROM bodies
),
entries AS (
  SELECT host,
    regexp_extract(block, '(?is)<loc>\\s*(.*?)\\s*</loc>', 1) AS loc,
    nullif(regexp_extract(block,
      '(?is)<lastmod>\\s*(.*?)\\s*</lastmod>', 1), '') AS lastmod
  FROM ub
  WHERE regexp_extract(block, '(?is)<loc>\\s*(.*?)\\s*</loc>', 1) <> ''
),
last AS (
  SELECT url, max(strftime(warc_ts, '%Y%m%d%H%M%S')) AS last_ts14
  FROM pages_cdx GROUP BY url
),
j AS (
  SELECT e.loc AS url, e.lastmod, l.last_ts14
  FROM entries e LEFT JOIN last l ON e.loc = l.url
)
SELECT url, lastmod, last_ts14 AS last_capture_ts14,
  CASE WHEN last_ts14 IS NULL THEN 'new'
       WHEN lastmod IS NOT NULL AND lastmod >
         (substring(last_ts14, 1, 4) || '-' || substring(last_ts14, 5, 2)
          || '-' || substring(last_ts14, 7, 2) || 'T'
          || substring(last_ts14, 9, 2) || ':' || substring(last_ts14, 11, 2)
          || ':' || substring(last_ts14, 13, 2)) THEN 'stale'
       ELSE 'fresh' END AS status
FROM j"""


def q_url_traps(spark, sf_dir):
    """Crawl-trap URL flags (operators/traps.py): repeated path segments,
    depth, query-param explosion, calendar paths — one zero-shuffle
    projection over the frontier, plus planted trap URLs so every flag
    family fires. Both engines derive the same planted rows."""
    from chrono_scraper_spark.operators.traps import url_trap_flags

    pages = cdx_pages_view(spark, sf_dir).select("url", "doc_id")
    n = F.col("doc_id")
    planted = pages.filter(n % 50 == 0).select(
        F.concat(
            F.lit("https://trap.example"),
            F.when(n % 4 == 0,
                   F.lit("/a/b/a/b/a/b/page"))          # repeated segment
            .when(n % 4 == 1,
                  F.lit("/d/d/d/d/d/d/d/d/d/d/d/d/d"))  # deep + repeated
            .when(n % 4 == 2, F.concat(
                F.lit("/x?"),
                F.lit("p1=1&p2=2&p3=3&p4=4&p5=5&p6=6&p7=7")))  # params
            .otherwise(F.lit("/2021/05/04/2022/06/07/post"))   # calendar
        ).alias("url"), (n + 1_000_000).alias("doc_id"))
    return (url_trap_flags(pages.unionByName(planted))
            .select("url", "doc_id", "repeated_segment", "too_deep",
                    "too_many_params", "calendar_path", "is_trap_url"))


SQL_URL_TRAPS = f"""
WITH pages_cdx AS ({PAGES_CTE_DUCK}),
base AS (
  SELECT url, doc_id FROM pages_cdx
  UNION ALL
  SELECT 'https://trap.example' ||
    CASE WHEN doc_id % 4 = 0 THEN '/a/b/a/b/a/b/page'
         WHEN doc_id % 4 = 1 THEN '/d/d/d/d/d/d/d/d/d/d/d/d/d'
         WHEN doc_id % 4 = 2 THEN '/x?p1=1&p2=2&p3=3&p4=4&p5=5&p6=6&p7=7'
         ELSE '/2021/05/04/2022/06/07/post' END AS url,
    doc_id + 1000000 AS doc_id
  FROM pages_cdx WHERE doc_id % 50 = 0
),
parts AS (
  SELECT url, doc_id,
    coalesce(nullif(regexp_extract(url, '^https?://[^/]*(/[^?#]*)', 1),
                    ''), '/') AS path,
    regexp_extract(url, '\\?([^#]*)', 1) AS q
  FROM base
),
segd AS (
  SELECT url, doc_id, q,
    list_filter(string_split(path, '/'), s -> s <> '') AS segs
  FROM parts
),
flags AS (
  SELECT url, doc_id,
    list_max(list_concat([0], list_transform(
      list_distinct(segs),
      d -> len(list_filter(segs, s -> s = d))))) >= 3 AS repeated_segment,
    len(segs) > 12 AS too_deep,
    (CASE WHEN q = '' THEN 0 ELSE len(string_split(q, '&')) END) > 6
      AS too_many_params,
    len(list_filter(segs, s -> regexp_matches(s,
      '^(19|20)\\d{{2}}$|^\\d{{1,2}}$|^(19|20)\\d{{2}}-\\d{{2}}(-\\d{{2}})?$')))
      >= 3 AS calendar_path
  FROM segd
)
SELECT url, doc_id, repeated_segment, too_deep, too_many_params,
  calendar_path,
  repeated_segment OR too_deep OR too_many_params OR calendar_path
    AS is_trap_url
FROM flags"""


def q_host_traps(spark, sf_dir):
    """Per-host duplicate-content trap evidence (operators/traps.py):
    urls-per-distinct-digest ratio from the capture log; the mega host's
    shared digests exercise the ratio math."""
    from chrono_scraper_spark.operators.traps import host_trap_stats

    pages = cdx_pages_view(spark, sf_dir)
    # collapse every 4th doc's digest to a shared value so ratios differ
    perturbed = pages.withColumn(
        "digest",
        F.when(F.col("doc_id") % 4 == 0, F.md5(F.lit("shared")))
        .otherwise(F.col("digest")))
    return host_trap_stats(perturbed, min_urls=5, dup_ratio_ppm=1_200_000)


SQL_HOST_TRAPS = f"""
WITH pages_cdx AS ({PAGES_CTE_DUCK}),
p AS (
  SELECT host, url,
    CASE WHEN doc_id % 4 = 0 THEN md5('shared') ELSE digest END AS digest
  FROM pages_cdx
),
per AS (
  SELECT host, CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
    CAST(count(DISTINCT digest) AS BIGINT) AS n_distinct_digests
  FROM p GROUP BY host
)
SELECT host, n_urls, n_distinct_digests,
  CAST(n_urls * 1000000 // n_distinct_digests AS BIGINT)
    AS urls_per_content_ppm,
  n_urls >= 5 AND (n_urls * 1000000 // n_distinct_digests) >= 1200000
    AS dup_content_trap
FROM per"""


def _frontier_inputs(spark, sf_dir):
    """Shared planted inputs for the frontier_priority family: the
    k-formula host link graph (as q_host_authority) and the capture log
    with perturbed digests (as q_recrawl_schedule)."""
    pages = cdx_pages_view(spark, sf_dir)
    k = (F.col("doc_id") * 7 + 3) % 500
    dst = (F.when(k % 3 == 0, F.lit("mega.example.com"))
           .when(k % 20 == 1, F.concat(F.lit("univ"), (k % 4).cast("string"),
                                       F.lit(".edu")))
           .when(k % 20 == 2, F.concat(F.lit("agency"),
                                       (k % 3).cast("string"),
                                       F.lit(".gov")))
           .otherwise(F.concat(F.lit("site"), (k % 40).cast("string"),
                               F.lit(".com"))))
    edges = pages.select(F.col("host").alias("src"), dst.alias("dst")) \
        .distinct()
    perturbed = pages.withColumn(
        "digest",
        F.when(((F.col("doc_id") + F.col("n_cap")) % 3 == 0)
               & (F.col("n_cap") > 0),
               F.md5(F.concat(F.col("digest"),
                              F.col("n_cap").cast("string"))))
        .otherwise(F.col("digest")))
    return perturbed, edges


def q_frontier_priority(spark, sf_dir):
    """Capstone fusion (operators/frontier.py): one crawl priority per
    URL from three engine signals — host authority (integer PageRank
    over the link graph), recrawl staleness (Poisson change-rate × age,
    perturbed digests as in recrawl_schedule), and crawl-trap flags
    (halve the priority of trap-shaped URLs). All-integer arithmetic
    end-to-end, so the fused score is bit-identical to the oracle's CTE
    composition."""
    from chrono_scraper_spark.operators.frontier import frontier_priority

    perturbed, edges = _frontier_inputs(spark, sf_dir)
    return frontier_priority(perturbed, edges, authority="pagerank")


def q_frontier_priority_opic(spark, sf_dir):
    """The same fusion with OPIC as the authority member
    (frontier_priority(authority="opic")): OPIC importance is usable
    the moment a node is first seen, so this is the cold-start spider
    variant of the scheduler — importance accrues WHILE crawling
    instead of needing a converged PageRank over a full snapshot."""
    from chrono_scraper_spark.operators.frontier import frontier_priority

    perturbed, edges = _frontier_inputs(spark, sf_dir)
    return frontier_priority(perturbed, edges, authority="opic")


# staleness + trap-flag + fuse tail shared by the frontier_priority
# oracles; `auth` must be a preceding CTE with (host, auth_nano)
_FRONTIER_FUSE_SQL = """,
pp AS (
  SELECT url, CAST(epoch(warc_ts) AS BIGINT) AS ts_s,
    CASE WHEN (doc_id + n_cap) % 3 = 0 AND n_cap > 0
         THEN md5(digest || CAST(n_cap AS VARCHAR)) ELSE digest END AS dg
  FROM pages_cdx
),
v AS (
  SELECT url, ts_s, dg,
    lag(dg) OVER (PARTITION BY url ORDER BY ts_s, dg) AS prev
  FROM pp
),
pu AS MATERIALIZED (
  SELECT url,
    CAST(sum(CASE WHEN prev IS NOT NULL AND dg <> prev
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
    CAST(max(ts_s) - min(ts_s) AS BIGINT) AS span_s,
    max(ts_s) AS last_s
  FROM v GROUP BY url
),
nw AS (SELECT max(last_s) AS now_s FROM pu),
stale AS (
  SELECT url,
    CAST(CASE WHEN span_s > 0 THEN (n_changes * 1000000000) // span_s
              ELSE 0 END * (now_s - last_s) AS BIGINT) AS score_e9
  FROM pu CROSS JOIN nw
),
uh AS (SELECT DISTINCT url, host FROM pages_cdx),
parts AS (
  SELECT url, host,
    coalesce(nullif(regexp_extract(url, '^https?://[^/]*(/[^?#]*)', 1),
                    ''), '/') AS path,
    regexp_extract(url, '\\?([^#]*)', 1) AS q
  FROM uh
),
segd AS (
  SELECT url, host, q,
    list_filter(string_split(path, '/'), s -> s <> '') AS segs
  FROM parts
),
flags AS (
  SELECT url, host,
    (list_max(list_concat([0], list_transform(
       list_distinct(segs),
       d -> len(list_filter(segs, s -> s = d))))) >= 3
     OR len(segs) > 12
     OR (CASE WHEN q = '' THEN 0
              ELSE len(string_split(q, '&')) END) > 6
     OR len(list_filter(segs, s -> regexp_matches(s,
       '^(19|20)\\d{2}$|^\\d{1,2}$|^(19|20)\\d{2}-\\d{2}(-\\d{2})?$')))
       >= 3) AS is_trap_url
  FROM segd
),
fused AS (
  SELECT f.url, f.host,
    coalesce(a.auth_nano, 0) AS auth_rank_nano,
    coalesce(s.score_e9, 0) AS staleness_e9,
    f.is_trap_url,
    coalesce(s.score_e9, 0) // 1000 + coalesce(a.auth_nano, 0) // 10
      AS base
  FROM flags f
  LEFT JOIN auth a ON f.host = a.host
  LEFT JOIN stale s ON f.url = s.url
)
SELECT url, host, CAST(auth_rank_nano AS BIGINT) AS auth_rank_nano,
  CAST(staleness_e9 AS BIGINT) AS staleness_e9, is_trap_url,
  CAST(CASE WHEN is_trap_url THEN base // 2 ELSE base END AS BIGINT)
    AS priority
FROM fused"""

SQL_FRONTIER_PRIORITY = (f"WITH pages_cdx AS MATERIALIZED "
                         f"({PAGES_CTE_DUCK}),\n"
                         + """
ek AS (SELECT host AS src, (doc_id * 7 + 3) % 500 AS k FROM pages_cdx),
edges0 AS MATERIALIZED (
  SELECT DISTINCT src,
    CASE WHEN k % 3 = 0 THEN 'mega.example.com'
         WHEN k % 20 = 1 THEN 'univ' || CAST(k % 4 AS VARCHAR) || '.edu'
         WHEN k % 20 = 2 THEN 'agency' || CAST(k % 3 AS VARCHAR) || '.gov'
         ELSE 'site' || CAST(k % 40 AS VARCHAR) || '.com' END AS dst
  FROM ek),
edges AS MATERIALIZED (SELECT src, dst FROM edges0 WHERE src <> dst),
hosts AS MATERIALIZED (
  SELECT src AS host FROM edges0 UNION SELECT dst FROM edges0),
outdeg AS MATERIALIZED (
  SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
r0 AS MATERIALIZED (SELECT host,
  CAST((SELECT 1000000000000 // count(*) FROM hosts) AS BIGINT) AS rank_nano
  FROM hosts),
""" + ",\n".join(_pagerank_iter_cte(i) for i in range(5))
                         + ",\nauth AS (SELECT host, rank_nano AS "
                           "auth_nano FROM r5)"
                         + _FRONTIER_FUSE_SQL)


def q_surt_cdxj(spark, sf_dir):
    """SURT canonical keys + CDXJ index lines (sources/cdx.py
    ``cdxj_records``): the pywb/OpenWayback sort-friendly key
    (``com,example)/path?a=1&b=2`` — host comma-reversed, www-stripped,
    query params sorted) and the ``<surt> <ts14> <json>`` line format the
    reference's CDX API consumes (wayback_machine.py:741-907). The oracle
    rebuilds both the key and Spark's compact to_json output in closed
    form (corpus fields are escape-free by construction)."""
    from chrono_scraper_spark.sources.cdx import cdxj_records

    return cdxj_records(cdx_pages_view(spark, sf_dir))


_SURT_EXPR_DUCK = """array_to_string(list_reverse(string_split(
      regexp_replace(host, '^www\\d*\\.', ''), '.')), ',')
  || ')' || lower(string_split_regex(path, '\\?')[1])
  || CASE WHEN instr(path, '?') = 0 THEN ''
          ELSE '?' || array_to_string(list_sort(string_split(
                 lower(string_split_regex(path, '\\?')[2]), '&')), '&')
     END"""

SQL_SURT_CDXJ = f"WITH pages_cdx AS ({PAGES_CTE_DUCK})" + f"""
SELECT
  {_SURT_EXPR_DUCK} AS surt,
  ts14,
  {_SURT_EXPR_DUCK}
  || ' ' || ts14 || ' {{"url":"' || url || '","mime":"' || mime
  || '","status":"' || CAST(status AS VARCHAR) || '","digest":"' || digest
  || '","length":"' || CAST(length AS VARCHAR) || '"}}' AS cdxj_line
FROM pages_cdx"""


_CYCLE_EDGES = [("https://loop.example.com/a", "https://loop.example.com/b"),
                ("https://loop.example.com/b", "https://loop.example.com/a")]


def q_redirect_resolve(spark, sf_dir):
    """Redirect-chain resolution (operators/redirects.py): pointer-doubling
    terminal-URL lookup over a deterministic functional graph planted on
    the corpus — legacy URL ``https://r.example.com/<k>`` redirects to
    ``.../<k-1>`` while ``k%8 != 0``, and the chain's ``k%8 == 0`` root
    redirects once more onto the REAL corpus url(k); chains are therefore
    1-8 hops and every source terminates on a corpus URL. A planted
    2-cycle exercises non-termination. The oracle resolves the same graph
    in CLOSED FORM (terminal doc_id = k - k%8, hops = k%8 + 1) — no
    recursion — so the iterative engine is checked against independent
    arithmetic, not another walk. (Synthetic legacy hosts keep the chain
    keys unique: corpus urls collide across doc_ids by design.)"""
    from chrono_scraper_spark.operators.redirects import resolve_redirects

    u = cdx_pages_view(spark, sf_dir).select("doc_id", "url").distinct()
    k = F.col("doc_id")
    legacy = F.concat(F.lit("https://r.example.com/"), k.cast("string"))
    chain = u.select(
        legacy.alias("src"),
        F.when(k % 8 == 0, F.col("url"))
        .otherwise(F.concat(F.lit("https://r.example.com/"),
                            (k - 1).cast("string"))).alias("dst"))
    edges = chain.unionByName(
        spark.createDataFrame(_CYCLE_EDGES, "src string, dst string"))
    return resolve_redirects(edges)


SQL_REDIRECT_RESOLVE = (
    f"WITH pages_cdx AS ({PAGES_CTE_DUCK})" + """,
u AS (SELECT DISTINCT doc_id, url FROM pages_cdx),
chains AS (
  SELECT 'https://r.example.com/' || CAST(a.doc_id AS VARCHAR) AS url,
    b.url AS final_url,
    CAST(a.doc_id % 8 + 1 AS INT) AS hops, FALSE AS is_cycle
  FROM u a JOIN u b ON b.doc_id = a.doc_id - (a.doc_id % 8)
)
SELECT url, final_url, hops, is_cycle FROM chains
UNION ALL
SELECT 'https://loop.example.com/a', NULL, NULL, TRUE
UNION ALL
SELECT 'https://loop.example.com/b', NULL, NULL, TRUE""")


def q_latest_captures(spark, sf_dir):
    """Newest capture per URL (operators/dedup.py::latest_captures) —
    the "current view" collapse behind a user-facing search index, dual
    of surt_collapse's earliest-representative. One max-struct argmax
    agg; ties beyond ts14 resolve by the remaining columns' struct
    order (mirrored in the oracle's ORDER BY)."""
    from chrono_scraper_spark.operators.dedup import latest_captures

    pages = cdx_pages_view(spark, sf_dir).select(
        "url", "ts14", "digest", "status")
    return latest_captures(pages)


SQL_LATEST_CAPTURES = f"WITH pages_cdx AS ({PAGES_CTE_DUCK})" + """,
r AS (
  SELECT url, ts14, digest, status,
    row_number() OVER (PARTITION BY url
                       ORDER BY ts14 DESC, digest DESC, status DESC) AS rn
  FROM pages_cdx)
SELECT url, ts14, digest, status FROM r WHERE rn = 1"""


def q_surt_collapse(spark, sf_dir):
    """Canonical-URL collapse on SURT keys (operators/dedup.py
    ``surt_collapse``): corpus URLs augmented with deterministic
    www-prefixed and query-reordered VARIANTS (every third doc) must fold
    back onto their canonical representative — earliest capture wins,
    variant/capture counts per key. Oracle replays the canonicalization
    and the argmin relationally."""
    from chrono_scraper_spark.operators.dedup import surt_collapse

    pages = cdx_pages_view(spark, sf_dir).select(
        "url", "warc_ts", "ts14", "doc_id")
    variants = (pages.filter(F.col("doc_id") % 3 == 0)
                .select(F.regexp_replace("url", "^https://",
                                         "https://www.").alias("url"),
                        (F.col("warc_ts") + F.expr("INTERVAL 1 HOUR"))
                        .alias("warc_ts"),
                        F.date_format(
                            F.col("warc_ts") + F.expr("INTERVAL 1 HOUR"),
                            "yyyyMMddHHmmss").alias("ts14"),
                        "doc_id"))
    return surt_collapse(pages.unionByName(variants))


SQL_SURT_COLLAPSE = f"WITH pages_cdx AS ({PAGES_CTE_DUCK})" + f""",
aug AS (
  SELECT url, warc_ts, ts14, host, path FROM pages_cdx
  UNION ALL
  SELECT regexp_replace(url, '^https://', 'https://www.') AS url,
    warc_ts + INTERVAL 1 HOUR AS warc_ts,
    strftime(warc_ts + INTERVAL 1 HOUR, '%Y%m%d%H%M%S') AS ts14,
    host, path
  FROM pages_cdx WHERE doc_id % 3 = 0
),
keyed AS (
  SELECT {_SURT_EXPR_DUCK} AS surt, url, warc_ts, ts14 FROM aug
),
ranked AS (
  SELECT surt, url, ts14,
    row_number() OVER (PARTITION BY surt
                       ORDER BY warc_ts, url, ts14) AS rn
  FROM keyed
),
counts AS (
  SELECT surt, count(DISTINCT url) AS n_variants,
    count(*) AS n_captures
  FROM keyed GROUP BY surt
)
SELECT r.surt, r.url, r.ts14, c.n_variants, c.n_captures
FROM ranked r JOIN counts c ON r.surt = c.surt
WHERE r.rn = 1"""


def q_unicode_clean(spark, sf_dir):
    """Unicode normalization pass (operators/unicode_clean.py): NFC
    composition + zero-width/control removal + NBSP folding, as one
    Arrow projection. Deterministic unicode is planted on a third of the
    docs (decomposed e+COMBINING-ACUTE, ZWSP, BEL, NBSP — both engines
    build the identical string), so composition and every removal class
    are value-checked; the mojibake-repair branch is python-twin tested
    (not SQL-expressible, disabled here)."""
    from chrono_scraper_spark.operators.unicode_clean import clean_unicode

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    plant_suffix = (" caf" + "e\u0301" + "\u200b" + "zero" + "\x07"
                    + "width" + "\u00a0" + "end")
    planted = F.when(F.col("doc_id") % 3 == 0,
                     F.concat(F.col("text"), F.lit(plant_suffix)))
    d = d.withColumn("text", F.coalesce(planted, F.col("text")))
    return (clean_unicode(d)
            .select("doc_id", "clean_text", "n_removed", "was_changed"))


SQL_UNICODE_CLEAN = """
WITH src AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0
         THEN text || ' caf' || chr(101) || chr(769) || chr(8203) ||
              'zero' || chr(7) || 'width' || chr(160) || 'end'
         ELSE text END AS text
  FROM documents
),
cleaned AS (
  SELECT doc_id, text,
    nfc_normalize(
      regexp_replace(
        regexp_replace(
          regexp_replace(text,
            '[\\x{200b}\\x{200c}\\x{200d}\\x{feff}]', '', 'g'),
          '[\\x{00}-\\x{08}\\x{0b}\\x{0c}\\x{0e}-\\x{1f}\\x{7f}\\x{80}-\\x{9f}]',
          '', 'g'),
        '[\\x{a0}\\x{202f}]', ' ', 'g')) AS clean_text
  FROM src
)
SELECT doc_id, clean_text,
  CAST(length(text) - length(clean_text) AS INTEGER) AS n_removed,
  clean_text <> coalesce(text, '') AS was_changed
FROM cleaned"""


def q_winnow_fingerprint(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer et al. 2003) over the
    documents table: sorted distinct window-min k-gram md5 hashes per doc,
    emitted as (count, md5-of-signature) so the row stays small. Pure
    array-lambda projection — zero shuffles (textops.winnow_fingerprints)."""
    d = _t(spark, sf_dir, "documents")
    fps = T.winnow_fingerprints(F.col("text"), k=8, w=4)
    return d.select(
        "doc_id",
        F.size(fps).cast("long").alias("n_fp"),
        F.md5(F.concat_ws("|", fps)).alias("fp_sig"))


SQL_WINNOW_FINGERPRINT = OG.winnow_query_sql(k=8, w=4)


def q_warc_identity(spark, sf_dir):
    """WARC (ISO 28500) writer+parser round-trip, value-checked like
    pdf_extraction_identity: every CDX-parity page is encoded as a real
    per-record-gzipped WARC response record (sources/warc.py — the Common
    Crawl layout the reference's CC route reads via WARC
    filename/offset/length, content_extraction_service.py:80-95) and
    parsed back inside one pandas UDF; URL, timestamp, mime, HTTP status
    and payload md5 must all survive the trip. The oracle reads the source
    rows directly."""
    import hashlib

    from pyspark.sql import types as ST
    from pyspark.sql.functions import pandas_udf

    from chrono_scraper_spark.sources.warc import (
        decode_warc_member,
        encode_warc_record,
    )

    schema = ST.StructType([
        ST.StructField("url_rt", ST.StringType()),
        ST.StructField("ts14_rt", ST.StringType()),
        ST.StructField("mime_rt", ST.StringType()),
        ST.StructField("status_rt", ST.IntegerType()),
        ST.StructField("payload_md5", ST.StringType()),
    ])

    @pandas_udf(schema)
    def roundtrip(url, date_iso, mime, status, text):
        import pandas as pd
        cols = {k: [] for k in
                ("url_rt", "ts14_rt", "mime_rt", "status_rt", "payload_md5")}
        for u, d, m, s, x in zip(url, date_iso, mime, status, text):
            payload = (x or "").encode()
            rec = decode_warc_member(
                encode_warc_record(u, d, m, int(s), payload))
            cols["url_rt"].append(rec["url"])
            cols["ts14_rt"].append(
                "".join(c for c in rec["date"] if c.isdigit())[:14])
            cols["mime_rt"].append(rec["mime"])
            cols["status_rt"].append(rec["status"])
            cols["payload_md5"].append(
                hashlib.md5(rec["payload"]).hexdigest())
        out = pd.DataFrame(cols)
        out["status_rt"] = out["status_rt"].astype("Int32")
        return out

    pages = cdx_pages_view(spark, sf_dir)
    r = roundtrip(
        F.col("url"),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.col("mime"), F.col("status"), F.col("text"))
    return (pages.withColumn("_r", r)
            .select(F.col("_r.url_rt").alias("url"),
                    F.col("_r.ts14_rt").alias("ts14"),
                    F.col("_r.mime_rt").alias("mime"),
                    F.col("_r.status_rt").alias("status"),
                    F.col("_r.payload_md5").alias("payload_md5")))


SQL_WARC_IDENTITY = f"""
WITH pages_cdx AS ({PAGES_CTE_DUCK})
SELECT url, ts14, mime, status, md5(text) AS payload_md5 FROM pages_cdx"""


def q_wet_identity(spark, sf_dir):
    """WET (Common Crawl extracted-text conversion record) writer+parser
    round-trip: every page's text is encoded as a per-record-gzipped
    ``WARC-Type: conversion`` record (sources/warc.py::encode_wet_record
    — the *.warc.wet.gz layout) and parsed back in one pandas UDF; URL,
    timestamp, the UTF-8 text md5, and the deterministic Refers-To
    linkage to the response record's id must all survive. The oracle
    reads the source rows directly."""
    import hashlib

    from pyspark.sql import types as ST
    from pyspark.sql.functions import pandas_udf

    from chrono_scraper_spark.sources.warc import (
        decode_warc_member,
        encode_wet_record,
    )

    schema = ST.StructType([
        ST.StructField("url_rt", ST.StringType()),
        ST.StructField("ts14_rt", ST.StringType()),
        ST.StructField("text_md5", ST.StringType()),
        ST.StructField("refers_to_response", ST.BooleanType()),
    ])

    @pandas_udf(schema)
    def roundtrip(url, date_iso, text):
        import pandas as pd
        cols = {k: [] for k in
                ("url_rt", "ts14_rt", "text_md5", "refers_to_response")}
        for u, d, x in zip(url, date_iso, text):
            rec = decode_warc_member(encode_wet_record(u, d, x or ""))
            cols["url_rt"].append(rec["url"])
            cols["ts14_rt"].append(
                "".join(c for c in rec["date"] if c.isdigit())[:14])
            cols["text_md5"].append(
                hashlib.md5(rec["payload"]).hexdigest())
            cols["refers_to_response"].append(
                rec["warc_type"] == "conversion")
        return pd.DataFrame(cols)

    pages = cdx_pages_view(spark, sf_dir)
    r = roundtrip(
        F.col("url"),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.col("text"))
    return (pages.withColumn("_r", r)
            .select(F.col("_r.url_rt").alias("url"),
                    F.col("_r.ts14_rt").alias("ts14"),
                    F.col("_r.text_md5").alias("text_md5"),
                    F.col("_r.refers_to_response").alias("is_conversion")))


SQL_WET_IDENTITY = f"""
WITH pages_cdx AS ({PAGES_CTE_DUCK})
SELECT url, ts14, md5(coalesce(text, '')) AS text_md5,
  TRUE AS is_conversion
FROM pages_cdx"""


# --------------------------------------------------------------------------
# topic modeling / content clustering (topic_modeling.py analogs)
# --------------------------------------------------------------------------

def q_tfidf_topk(spark, sf_dir):
    """Per-doc top-5 TF-IDF terms (TfidfVectorizer analog: min_df=2,
    max_df=0.8, max_features=1000, smooth idf, l2 norm). Ranking uses
    exact integer tf·idf_micro weights; the vocab cap bounds every doc
    vector, so the per-doc window is WindowGroupLimit-prunable."""
    from chrono_scraper_spark.operators import topics as TP

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return TP.tfidf_topk(d, k=5)


def q_topic_clusters(spark, sf_dir):
    """Deterministic cosine k-means over TF-IDF vectors (KMeans content
    clustering analog): k=8, two assignment steps from md5-seeded init,
    exact-integer centroids (sum ≡ mean under cosine)."""
    from chrono_scraper_spark.operators import topics as TP

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return TP.kmeans_clusters(d, k=8, iters=2)


def q_cluster_cohesion(spark, sf_dir):
    """Per-cluster summary: size, mean pairwise cosine via the
    closed-form ‖Σv̂‖² identity (no n×n similarity matrix), centroid
    top-10 terms."""
    from chrono_scraper_spark.operators import topics as TP

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return TP.cluster_cohesion(d, k=8, iters=2, top_terms=10)


# Shared TF-IDF CTE chain (sklearn TfidfVectorizer conventions: smooth
# idf ln((1+n)/(1+df))+1, min_df=2, max_df=0.8, max_features cap by
# corpus frequency with term tie-break; idf micro-quantized so weights
# are exact integers on both engines).
_TFIDF_CTES = f"""
tf AS (
  SELECT doc_id, u.t AS term, count(*) AS tf
  FROM documents, unnest({OG.tokens_sql('text')}) AS u(t)
  GROUP BY doc_id, u.t
),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
vocab AS (
  SELECT term, df, cf,
    CAST(floor((ln((1 + n) / (1 + df)) + 1) * 1e6) AS BIGINT) AS idf_micro
  FROM (SELECT term, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY term), nd
  WHERE df >= 2 AND df <= floor(0.8 * n)
  ORDER BY cf DESC, term LIMIT 1000
),
w AS (
  SELECT tf.doc_id, tf.term, tf.tf, tf.tf * v.idf_micro AS w
  FROM tf JOIN vocab v USING (term)
),
n2 AS (
  SELECT doc_id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM w GROUP BY doc_id
)"""

SQL_TFIDF_TOPK = f"""
WITH {_TFIDF_CTES}
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, CAST(tf AS BIGINT) AS tf,
       round(w / sqrt(CAST(n2 AS DOUBLE)), 6) AS weight
FROM (
  SELECT w.doc_id, w.term, w.tf, w.w, n2.n2,
    row_number() OVER (PARTITION BY w.doc_id
                       ORDER BY w.w DESC, w.term) AS rnk
  FROM w JOIN n2 USING (doc_id))
WHERE rnk <= 5"""

# k-means chain: seeds → (assign ⇢ recenter) × 2. Centroids are exact
# HUGEINT sum vectors; cos is the single double expression, floor-nano
# quantized before the (cos DESC, cid ASC) argmax — identical ties on
# both engines.
_KMEANS_CTES = f"""
{_TFIDF_CTES},
seeds AS (
  SELECT doc_id,
    CAST(row_number() OVER (
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS cid
  FROM n2
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 8
),
cent0 AS (
  SELECT s.cid, w.term, CAST(w.w AS HUGEINT) AS cw
  FROM w JOIN seeds s USING (doc_id)
),
cn0 AS (SELECT cid, sum(cw * cw) AS cn2 FROM cent0 GROUP BY cid),
dot0 AS (
  SELECT w.doc_id, c.cid, sum(CAST(w.w AS HUGEINT) * c.cw) AS dot
  FROM w JOIN cent0 c USING (term) GROUP BY w.doc_id, c.cid
),
sim0 AS (
  SELECT d.doc_id, d.cid,
    CAST(floor(CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(n2.n2 AS DOUBLE)) * sqrt(CAST(cn.cn2 AS DOUBLE)))
               * 1e9) AS BIGINT) AS cos_nano
  FROM dot0 d JOIN n2 USING (doc_id) JOIN cn0 cn USING (cid)
),
a0 AS (
  SELECT doc_id, cid FROM (
    SELECT doc_id, cid, row_number() OVER (
      PARTITION BY doc_id ORDER BY cos_nano DESC, cid) AS rn
    FROM sim0) WHERE rn = 1
),
cent1 AS (
  SELECT a.cid, w.term, sum(CAST(w.w AS HUGEINT)) AS cw
  FROM w JOIN a0 a USING (doc_id) GROUP BY a.cid, w.term
),
cn1 AS (SELECT cid, sum(cw * cw) AS cn2 FROM cent1 GROUP BY cid),
dot1 AS (
  SELECT w.doc_id, c.cid, sum(CAST(w.w AS HUGEINT) * c.cw) AS dot
  FROM w JOIN cent1 c USING (term) GROUP BY w.doc_id, c.cid
),
sim1 AS (
  SELECT d.doc_id, d.cid,
    CAST(floor(CAST(d.dot AS DOUBLE)
               / (sqrt(CAST(n2.n2 AS DOUBLE)) * sqrt(CAST(cn.cn2 AS DOUBLE)))
               * 1e9) AS BIGINT) AS cos_nano
  FROM dot1 d JOIN n2 USING (doc_id) JOIN cn1 cn USING (cid)
),
a1 AS (
  SELECT doc_id, cid, cos_nano FROM (
    SELECT doc_id, cid, cos_nano, row_number() OVER (
      PARTITION BY doc_id ORDER BY cos_nano DESC, cid) AS rn
    FROM sim1) WHERE rn = 1
)"""

SQL_TOPIC_CLUSTERS = f"""
WITH {_KMEANS_CTES}
SELECT doc_id, cid AS cluster_id, round(cos_nano / 1e9, 6) AS cos_sim
FROM a1"""

SQL_CLUSTER_COHESION = f"""
WITH {_KMEANS_CTES},
unit AS (
  SELECT a.cid, w.term,
    CAST(floor(w.w / sqrt(CAST(n2.n2 AS DOUBLE)) * 1e9) AS BIGINT) AS u
  FROM w JOIN n2 USING (doc_id) JOIN a1 a USING (doc_id)
),
comp AS (SELECT cid, term, sum(u) AS s FROM unit GROUP BY cid, term),
ss AS (SELECT cid, sum(CAST(s AS HUGEINT) * s) AS ss2 FROM comp GROUP BY cid),
sz AS (SELECT cid, count(*) AS n_docs FROM a1 GROUP BY cid),
tt AS (
  SELECT cid, string_agg(term, ' ' ORDER BY s DESC, term) AS top_terms
  FROM (SELECT cid, term, s, row_number() OVER (
          PARTITION BY cid ORDER BY s DESC, term) AS rn
        FROM comp)
  WHERE rn <= 10 GROUP BY cid
)
SELECT sz.cid AS cluster_id, CAST(sz.n_docs AS BIGINT) AS n_docs,
  CASE WHEN sz.n_docs <= 1 THEN 1.0
       ELSE round((CAST(ss.ss2 AS DOUBLE) / 1e18 - sz.n_docs)
                  / (sz.n_docs * (sz.n_docs - 1)), 6) END AS cohesion,
  tt.top_terms
FROM sz JOIN ss USING (cid) JOIN tt USING (cid)"""


def q_dbscan(spark, sf_dir):
    """Distributed DBSCAN over the embeddings table (cosine metric,
    eps=0.7 → cos ≥ 0.3, min_samples=3, self included): ε-pairs → degree
    → core/border/noise roles, clusters = connected components of the
    core subgraph (min-id labels, disclosed convention). Exact all-pairs
    baseline (bands=0) — the oracle contract; LSH pair generation is the
    scale path."""
    from chrono_scraper_spark.operators import topics as TP

    emb = _t(spark, sf_dir, "embeddings")
    return TP.dbscan(emb, eps=0.7, min_samples=3, bands=0)


SQL_DBSCAN = """
WITH RECURSIVE ev AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
p AS (
  SELECT l.vec_id AS a, r.vec_id AS b
  FROM ev l JOIN ev r ON l.vec_id < r.vec_id
  WHERE list_dot_product(l.v, r.v)
        / (sqrt(list_dot_product(l.v, l.v))
           * sqrt(list_dot_product(r.v, r.v))) >= 0.3
),
sym AS (SELECT a AS id, b AS nb FROM p UNION ALL SELECT b, a FROM p),
deg AS (SELECT id, count(*) + 1 AS n_neighbors FROM sym GROUP BY id),
core AS (SELECT id FROM deg WHERE n_neighbors >= 3),
ce AS (
  SELECT s.id AS src, s.nb AS dst FROM sym s
  JOIN core c1 ON c1.id = s.id JOIN core c2 ON c2.id = s.nb
),
reach(node, r) AS (
  SELECT DISTINCT src, src FROM ce
  UNION
  SELECT e.src, reach.r FROM ce e JOIN reach ON reach.node = e.dst
),
comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node),
corec AS (
  SELECT c.id, coalesce(comp.cluster, c.id) AS cluster
  FROM core c LEFT JOIN comp ON comp.node = c.id
),
border AS (
  SELECT s.id, min(cc.cluster) AS cluster
  FROM sym s JOIN corec cc ON cc.id = s.nb
  WHERE s.id NOT IN (SELECT id FROM core)
  GROUP BY s.id
)
SELECT e.vec_id,
  CAST(coalesce(cr.cluster, bo.cluster, -1) AS BIGINT) AS cluster,
  CASE WHEN cr.id IS NOT NULL THEN 'core'
       WHEN bo.id IS NOT NULL THEN 'border'
       ELSE 'noise' END AS role,
  CAST(coalesce(d.n_neighbors, 1) AS BIGINT) AS n_neighbors
FROM ev e
LEFT JOIN corec cr ON cr.id = e.vec_id
LEFT JOIN border bo ON bo.id = e.vec_id
LEFT JOIN deg d ON d.id = e.vec_id"""


def q_page_changes(spark, sf_dir):
    """Per-capture change log over every URL's snapshot sequence
    (ChangeDetectionService.detect_page_changes run corpus-wide): lag
    window per url, md5 equality gate, token-multiset Dice similarity
    (one codegen sweep/row), threshold classification, multiset diff
    sizes."""
    from chrono_scraper_spark.operators import changes as CH

    pages = cdx_pages_view(spark, sf_dir)
    return CH.detect_changes(pages)


def q_change_stats(spark, sf_dir):
    """get_change_statistics rollup of page_changes: counts + mean
    similarity per (capture day, change_type)."""
    from chrono_scraper_spark.operators import changes as CH

    pages = cdx_pages_view(spark, sf_dir)
    return CH.change_statistics(CH.detect_changes(pages))


_CHANGES_CTES = f"""
pages_cdx AS ({{pages_cte}}),
v AS (
  SELECT url, ts14, coalesce(text, '') AS cur,
    coalesce(lag(coalesce(text, '')) OVER w, '') AS prev,
    row_number() OVER w AS vn
  FROM pages_cdx
  WINDOW w AS (PARTITION BY url ORDER BY ts14)
),
ta AS (
  SELECT url, ts14, u.t AS tok, count(*) AS c
  FROM v, unnest(list_filter(string_split_regex(trim(prev), '\\s+'),
                             t -> t != '')) AS u(t)
  GROUP BY 1, 2, 3
),
tb AS (
  SELECT url, ts14, u.t AS tok, count(*) AS c
  FROM v, unnest(list_filter(string_split_regex(trim(cur), '\\s+'),
                             t -> t != '')) AS u(t)
  GROUP BY 1, 2, 3
),
nag AS (SELECT url, ts14, sum(c) AS na FROM ta GROUP BY 1, 2),
nbg AS (SELECT url, ts14, sum(c) AS nb FROM tb GROUP BY 1, 2),
ovg AS (
  SELECT url, ts14, sum(least(a.c, b.c)) AS m
  FROM ta a JOIN tb b USING (url, ts14, tok) GROUP BY 1, 2
),
sz AS (
  SELECT v.url, v.ts14, coalesce(nag.na, 0) AS na,
    coalesce(nbg.nb, 0) AS nb, coalesce(ovg.m, 0) AS m
  FROM v
  LEFT JOIN nag ON nag.url = v.url AND nag.ts14 = v.ts14
  LEFT JOIN nbg ON nbg.url = v.url AND nbg.ts14 = v.ts14
  LEFT JOIN ovg ON ovg.url = v.url AND ovg.ts14 = v.ts14
),
chg AS (
  SELECT v.url, v.ts14, v.vn, sz.na, sz.nb, sz.m,
    CASE WHEN v.vn = 1 THEN NULL
         WHEN sz.na = 0 AND sz.nb = 0 THEN 1.0
         WHEN sz.na = 0 OR sz.nb = 0 THEN 0.0
         ELSE round(2.0 * sz.m / (sz.na + sz.nb), 6) END AS similarity,
    CASE WHEN v.vn = 1 THEN 'new'
         WHEN md5(v.cur) = md5(v.prev) THEN 'unchanged'
         WHEN len(v.prev) = 0 AND len(v.cur) > 0 THEN 'new'
         WHEN len(v.cur) = 0 AND len(v.prev) > 0 THEN 'deleted'
         WHEN CASE WHEN sz.na = 0 AND sz.nb = 0 THEN 1.0
                   WHEN sz.na = 0 OR sz.nb = 0 THEN 0.0
                   ELSE round(2.0 * sz.m / (sz.na + sz.nb), 6) END >= 0.95
           THEN 'minor_update'
         ELSE 'modified' END AS change_type
  FROM v JOIN sz ON sz.url = v.url AND sz.ts14 = v.ts14
)"""

SQL_PAGE_CHANGES = (
    "WITH " + _CHANGES_CTES.format(pages_cte=PAGES_CTE_DUCK) + """
SELECT url, ts14, change_type, similarity,
  CAST(nb - m AS BIGINT) AS units_added,
  CAST(na - m AS BIGINT) AS units_removed,
  CAST(vn AS BIGINT) AS n_versions_seen
FROM chg""")

SQL_CHANGE_STATS = (
    "WITH " + _CHANGES_CTES.format(pages_cte=PAGES_CTE_DUCK) + """
SELECT substr(ts14, 1, 8) AS day, change_type, count(*) AS n,
  round(sum(floor(similarity * 1e9)) / count(similarity) / 1e9, 6)
    AS mean_similarity
FROM chg GROUP BY 1, 2""")


def q_content_evolution(spark, sf_dir):
    """Per-URL evolution timeline (get_content_evolution): content hash,
    word/char counts, similarity to previous capture, tiered change
    classification (>0.9 minor / >0.7 moderate / else major; first
    capture 'new' at similarity 1.0)."""
    from chrono_scraper_spark.operators import changes as CH

    pages = cdx_pages_view(spark, sf_dir)
    return CH.content_evolution(pages)


SQL_CONTENT_EVOLUTION = (
    "WITH " + _CHANGES_CTES.format(pages_cte=PAGES_CTE_DUCK) + """,
evo AS (
  SELECT v.url, v.ts14, v.vn, v.cur, v.prev,
    CASE WHEN v.vn = 1 THEN 1.0
         WHEN sz.na = 0 AND sz.nb = 0 THEN 1.0
         WHEN sz.na = 0 OR sz.nb = 0 THEN 0.0
         ELSE round(2.0 * sz.m / (sz.na + sz.nb), 6) END AS sim
  FROM v JOIN sz ON sz.url = v.url AND sz.ts14 = v.ts14
)
SELECT url, ts14, md5(cur) AS content_hash,
  CAST(len(list_filter(string_split_regex(trim(cur), '\\s+'),
                       t -> t != '')) AS BIGINT) AS word_count,
  CAST(len(cur) AS BIGINT) AS char_count,
  CASE WHEN vn = 1 THEN 'new'
       WHEN md5(cur) = md5(prev) THEN 'unchanged'
       WHEN sim > 0.9 THEN 'minor_change'
       WHEN sim > 0.7 THEN 'moderate_change'
       ELSE 'major_change' END AS change_type,
  sim AS similarity_to_previous
FROM evo""")


def q_recrawl_schedule(spark, sf_dir):
    """Freshness-driven recrawl prioritization (Cho & Garcia-Molina 2003):
    per-URL Poisson change-rate estimate from the capture history ×
    staleness since last capture (``operators/recrawl.py``). Capture
    digests are deterministically perturbed (every third (doc, capture)
    changes) so the corpus exhibits a mix of change rates; "now" is the
    corpus max capture time — no wall clock."""
    from chrono_scraper_spark.operators.recrawl import recrawl_schedule

    pages = cdx_pages_view(spark, sf_dir)
    perturbed = pages.withColumn(
        "digest",
        F.when(((F.col("doc_id") + F.col("n_cap")) % 3 == 0)
               & (F.col("n_cap") > 0),
               F.md5(F.concat(F.col("digest"),
                              F.col("n_cap").cast("string"))))
        .otherwise(F.col("digest")))
    return recrawl_schedule(perturbed)


SQL_RECRAWL_SCHEDULE = f"""
WITH pages_cdx AS ({{pages_cte}}),
pp AS (
  SELECT url, CAST(epoch(warc_ts) AS BIGINT) AS ts_s,
    CASE WHEN (doc_id + n_cap) % 3 = 0 AND n_cap > 0
         THEN md5(digest || CAST(n_cap AS VARCHAR)) ELSE digest END AS dg
  FROM pages_cdx
),
v AS (
  SELECT url, ts_s, dg,
    lag(dg) OVER (PARTITION BY url ORDER BY ts_s, dg) AS prev
  FROM pp
),
pu AS (
  SELECT url, CAST(count(*) AS BIGINT) AS n_captures,
    CAST(sum(CASE WHEN prev IS NOT NULL AND dg <> prev
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
    CAST(max(ts_s) - min(ts_s) AS BIGINT) AS span_s,
    max(ts_s) AS last_s
  FROM v GROUP BY url
),
nw AS (SELECT max(last_s) AS now_s FROM pu),
sc AS (
  SELECT url, n_captures, n_changes, span_s,
    CAST(CASE WHEN span_s > 0 THEN (n_changes * 1000000000) // span_s
              ELSE 0 END AS BIGINT) AS lambda_e9,
    CAST(now_s - last_s AS BIGINT) AS age_s
  FROM pu CROSS JOIN nw
)
SELECT url, n_captures, n_changes, span_s, lambda_e9, age_s,
  CAST(lambda_e9 * age_s AS BIGINT) AS score_e9,
  n_captures = 1 AS cold_start,
  lambda_e9 * age_s >= 500000000 AS due
FROM sc""".format(pages_cte=PAGES_CTE_DUCK)


def q_readability(spark, sf_dir):
    """Flesch Reading Ease + readability insight flags per document
    (calculate_readability_score / get_quality_grade analog): exact
    integer word/sentence/syllable counts folded per row, one
    zero-shuffle codegen projection."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return Q.readability(d)


SQL_READABILITY = """
WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
b AS (
  SELECT doc_id,
    list_filter(string_split_regex(trim(t), '\\s+'), x -> x != '')
      AS words,
    list_filter(string_split_regex(t, '[.!?]+'),
                s -> trim(regexp_replace(s, '\\s+', ' ', 'g')) != '')
      AS sents,
    len(string_split(t, chr(10) || chr(10))) AS np
  FROM d
),
c AS (
  SELECT doc_id,
    CAST(len(words) AS BIGINT) AS nw,
    CAST(len(sents) AS BIGINT) AS ns,
    CAST(np AS BIGINT) AS npg,
    CAST(coalesce(list_sum(list_transform(words, x ->
      greatest(1, CASE WHEN ends_with(lower(x), 'e')
             AND len(regexp_extract_all(lower(x), '[aeiouy]+')) > 1
           THEN len(regexp_extract_all(lower(x), '[aeiouy]+')) - 1
           ELSE len(regexp_extract_all(lower(x), '[aeiouy]+')) END))),
      0) AS BIGINT) AS syl
  FROM b
),
f AS (
  SELECT doc_id, nw, ns, npg, syl,
    CASE WHEN ns > 0 THEN round(greatest(0.0, least(100.0,
      206.835 - 1.015 * (nw / ns) - 84.6 * (syl / nw))), 4)
      ELSE 0.0 END AS flesch
  FROM c
)
SELECT doc_id, nw AS n_words, ns AS n_sentences,
  CASE WHEN ns > 0 THEN syl END AS n_syllables,
  npg AS n_paragraphs,
  CASE WHEN ns > 0 THEN round(nw / ns, 4) END AS avg_words_per_sentence,
  CASE WHEN ns > 0 THEN round(syl / nw, 4) END AS avg_syllables_per_word,
  flesch AS flesch_score,
  CASE WHEN flesch >= 85 THEN 'A' WHEN flesch >= 70 THEN 'B'
       WHEN flesch >= 50 THEN 'C' WHEN flesch >= 30 THEN 'D'
       ELSE 'F' END AS grade,
  CASE WHEN ns > 0 THEN (nw / ns) > 25 ELSE false END AS long_sentences,
  CASE WHEN ns > 0 THEN (nw / ns) < 8 ELSE false END AS short_sentences,
  CASE WHEN ns > 0 THEN (syl / nw) > 2.0 ELSE false END AS complex_vocab,
  CASE WHEN ns > 0 THEN (syl / nw) < 1.3 ELSE false END AS simple_vocab,
  CASE WHEN ns > 0 THEN (ns / npg) > 8 ELSE false END AS long_paragraphs,
  CASE WHEN ns > 0 THEN (ns / npg) >= 3 AND (ns / npg) <= 6
       ELSE false END AS well_structured
FROM f"""


def q_topic_assign(spark, sf_dir):
    """Topic inference: every doc assigned to the best topic under
    count-based unigram topic models (add-one smoothing, OOV floor,
    nano-quantized log scores) built from the k-means clusters' term
    sums — the document_topics/page_clusters map of the topic service,
    with a deterministic model in place of sklearn LDA."""
    from chrono_scraper_spark.operators import topics as TP

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    vectors = TP.tfidf_terms(d)
    assign = TP.kmeans_clusters(d, k=8, iters=2, vectors=vectors)
    topics = (vectors
              .join(assign.select("doc_id", "cluster_id"), "doc_id")
              .groupBy(F.col("cluster_id").alias("topic_id"), "term")
              .agg(F.sum("tf").alias("cnt")))
    return TP.topic_assign(d, topics)


SQL_TOPIC_ASSIGN = f"""
WITH {_KMEANS_CTES},
cent2 AS (
  SELECT a.cid AS topic_id, w.term, sum(w.tf) AS cnt
  FROM w JOIN a1 a USING (doc_id) GROUP BY 1, 2
),
tt AS (SELECT topic_id, sum(cnt) AS tot FROM cent2 GROUP BY 1),
vv AS (SELECT count(DISTINCT term) AS v FROM cent2),
toksall AS (
  SELECT doc_id, u.t AS term
  FROM documents, unnest({OG.tokens_sql('text')}) AS u(t)
),
nt AS (SELECT doc_id, count(*) AS n FROM toksall GROUP BY 1),
sc AS (
  SELECT c.topic_id, c.term,
    CAST(floor(log10((c.cnt + 1) / (tt.tot + vv.v)) * 1e9) AS BIGINT)
      AS lp
  FROM cent2 c JOIN tt USING (topic_id), vv
),
mt AS (
  SELECT t.doc_id, s.topic_id, sum(s.lp) AS s, count(*) AS nm
  FROM toksall t JOIN sc s USING (term) GROUP BY 1, 2
),
fl AS (
  SELECT tt.topic_id,
    CAST(floor(log10(1.0 / (tt.tot + vv.v)) * 1e9) AS BIGINT) AS oov
  FROM tt, vv
),
scr AS (
  SELECT nt.doc_id, fl.topic_id, nt.n,
    coalesce(mt.s, 0) + (nt.n - coalesce(mt.nm, 0)) * fl.oov AS score
  FROM nt CROSS JOIN fl
  LEFT JOIN mt ON mt.doc_id = nt.doc_id AND mt.topic_id = fl.topic_id
)
SELECT doc_id, topic_id, round(score / n / 1e9, 6) AS mean_logprob,
  CAST(n AS BIGINT) AS n_tokens
FROM (
  SELECT scr.*, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, topic_id) AS rn
  FROM scr)
WHERE rn = 1"""


def q_bigram_logprob(spark, sf_dir):
    """Second-order CCNet LM analog: add-one-smoothed conditional bigram
    model built on the even docs, scored over the odd docs (same split
    as unigram_logprob). Both models broadcast; nano-quantized
    order-independent mean."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    tk = train.select(T.tokens(F.col("text")).alias("_tk"))
    bm = (tk.select(F.explode(Q.kgrams(F.col("_tk"), 2)).alias("bg"))
          .groupBy("bg").agg(F.count("*").alias("cb")))
    um = (tk.select(F.explode(F.col("_tk")).alias("tok"))
          .groupBy("tok").agg(F.count("*").alias("cu")))
    return Q.bigram_logprob(test, bigram_model=bm, unigram_model=um)


SQL_BIGRAM_LOGPROB = f"""
WITH tr AS (
  SELECT {OG.tokens_sql('text')} AS tk FROM documents WHERE doc_id % 2 = 0
),
te AS (
  SELECT doc_id, {OG.tokens_sql('text')} AS tk FROM documents
  WHERE doc_id % 2 = 1
),
bm AS (
  SELECT u.g AS bg, count(*) AS cb
  FROM tr, unnest({OG.kgrams_sql('tk', 2)}) AS u(g) GROUP BY 1
),
um AS (
  SELECT u.t AS tok, count(*) AS cu
  FROM tr, unnest(tk) AS u(t) GROUP BY 1
),
vv AS (SELECT count(*) AS v FROM um),
tb AS (
  SELECT doc_id, u.g AS bg
  FROM te, unnest({OG.kgrams_sql('tk', 2)}) AS u(g)
),
sc AS (
  SELECT t.doc_id,
    CAST(floor(log10((coalesce(bm.cb, 0) + 1)
                     / (coalesce(um.cu, 0) + vv.v)) * 1e9) AS BIGINT)
      AS lp,
    bm.cb IS NULL AS oov
  FROM tb t
  LEFT JOIN bm USING (bg)
  LEFT JOIN um ON um.tok = string_split(t.bg, ' ')[1], vv
)
SELECT doc_id, round(sum(lp) / count(*) / 1e9, 6) AS mean_logprob,
  count(*) AS n_bigrams,
  CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov_bigrams
FROM sc GROUP BY doc_id"""


def q_bpe_merges(spark, sf_dir):
    """BPE tokenizer training (learn-merges pass) over the corpus word-
    frequency table: 10 merge rounds, each one pair-count agg + 1-row
    argmax + codegen fold. NO SQL oracle by design — the rank-r merge
    depends on the rank-(r−1) argmax, an iterative data dependency a
    single SQL statement cannot express; correctness is held by the
    exact pure-Python twin parity test and the encode-reproduces-
    training-segmentation invariant (tests/test_quality.py)."""
    from chrono_scraper_spark.operators import quality as Q

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return Q.bpe_train(d, n_merges=10)


def q_unigram_pieces(spark, sf_dir):
    """SentencePiece-style unigram-LM tokenizer training (Kudo 2018) —
    the third tokenizer-training family (operators/unigram_tok.py): EM +
    prune over the Zipf-bounded word-frequency table, integer nano
    log-probs make the Viterbi DP and hence the whole training run
    bit-deterministic (SentencePiece itself is not). NO SQL oracle by
    design (iterative EM + per-word DP); correctness held by the exact
    pure-Python twin of the full orchestration, DP unit cases, and the
    encode-reconstructs-text invariant (tests/test_unigram_tok.py)."""
    from chrono_scraper_spark.operators.unigram_tok import train_unigram

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return train_unigram(d, vocab_size=120, em_iters=2, seed_size=500)


def q_mime_sniff(spark, sf_dir):
    """Content sniffing from magic bytes (operators/mime_sniff.py):
    payloads are deterministically constructed per doc_id family (PDF/
    gzip/PNG/ZIP magics, HTML with and without BOM, RSS/Atom XML, a
    NUL-carrying binary, plain text) with declared Content-Types that
    agree, lie, or carry no claim — the sniff, the mismatch flag, and
    the resolve policy are all value-checked."""
    from chrono_scraper_spark.operators.mime_sniff import with_sniffed_mime

    pages = cdx_pages_view(spark, sf_dir).select(
        "url", "ts14", "doc_id", "text")
    txt = F.regexp_replace(F.substring("text", 1, 120), "[^ -~]", "")
    fam = F.col("doc_id") % 10
    enc = F.encode(txt, "utf-8")
    payload = (
        F.when(fam == 0, F.concat(F.unhex(F.lit("255044462D")), enc))
        .when(fam == 1, F.concat(F.unhex(F.lit("1F8B08")), enc))
        .when(fam == 2, F.concat(F.unhex(F.lit("89504E470D0A1A0A")), enc))
        .when(fam == 3, F.encode(F.concat(F.lit("<html><body>"), txt),
                                 "utf-8"))
        .when(fam == 4, F.concat(
            F.unhex(F.lit("EFBBBF")),
            F.encode(F.concat(F.lit("  <!doctype html><html>"), txt),
                     "utf-8")))
        .when(fam == 5, F.encode(F.concat(
            F.lit('<?xml version="1.0"?><rss version="2.0">'), txt),
            "utf-8"))
        .when(fam == 6, F.encode(F.concat(
            F.lit('<?xml version="1.0"?><feed xmlns="a">'), txt), "utf-8"))
        .when(fam == 7, F.concat(F.encode(F.lit("aaa"), "utf-8"),
                                 F.unhex(F.lit("00")), enc))
        .when(fam == 8, F.encode(F.concat(F.lit("plain text: "), txt),
                                 "utf-8"))
        .otherwise(F.concat(F.unhex(F.lit("504B0304")), enc)))
    declared = (
        F.when(fam == 0, "text/html")
        .when(fam == 2, "image/png")
        .when(fam == 3, "application/octet-stream")
        .when(fam == 4, "TEXT/HTML; charset=utf-8")
        .when(fam == 5, "text/xml")
        .when(fam == 7, "text/plain")
        .when(fam == 8, "text/plain"))
    df = pages.select("url", "ts14", payload.alias("payload"),
                      declared.alias("content_type"))
    return with_sniffed_mime(df, payload_col="payload").select(
        "url", "ts14", "sniffed_mime", "mime_mismatch", "effective_mime")


SQL_MIME_SNIFF = """
WITH pages_cdx AS ({pages_cte}),
p AS (
  SELECT url, ts14, doc_id,
    regexp_replace(substring(text, 1, 120), '[^ -~]', '', 'g') AS txt
  FROM pages_cdx
),
built AS (
  SELECT url, ts14,
    CASE doc_id % 10
      WHEN 0 THEN unhex('255044462D') || encode(txt)
      WHEN 1 THEN unhex('1F8B08') || encode(txt)
      WHEN 2 THEN unhex('89504E470D0A1A0A') || encode(txt)
      WHEN 3 THEN encode('<html><body>' || txt)
      WHEN 4 THEN unhex('EFBBBF') ||
                  encode('  <!doctype html><html>' || txt)
      WHEN 5 THEN encode('<?xml version="1.0"?><rss version="2.0">' || txt)
      WHEN 6 THEN encode('<?xml version="1.0"?><feed xmlns="a">' || txt)
      WHEN 7 THEN encode('aaa') || unhex('00') || encode(txt)
      WHEN 8 THEN encode('plain text: ' || txt)
      ELSE unhex('504B0304') || encode(txt)
    END AS payload,
    CASE doc_id % 10
      WHEN 0 THEN 'text/html'
      WHEN 2 THEN 'image/png'
      WHEN 3 THEN 'application/octet-stream'
      WHEN 4 THEN 'TEXT/HTML; charset=utf-8'
      WHEN 5 THEN 'text/xml'
      WHEN 7 THEN 'text/plain'
      WHEN 8 THEN 'text/plain'
    END AS content_type
  FROM p
),
sniffed AS (
  SELECT url, ts14, content_type,
    CASE
      WHEN hx LIKE '255044462D%' THEN 'application/pdf'
      WHEN hx LIKE '1F8B%' THEN 'application/gzip'
      WHEN hx LIKE '89504E470D0A1A0A%' THEN 'image/png'
      WHEN hx LIKE 'FFD8FF%' THEN 'image/jpeg'
      WHEN hx LIKE '474946383761%' OR hx LIKE '474946383961%'
        THEN 'image/gif'
      WHEN hx LIKE '424D%' THEN 'image/bmp'
      WHEN hx LIKE '504B0304%' THEN 'application/zip'
      WHEN hx LIKE '574152432F%' THEN 'application/warc'
      WHEN hx LIKE '52494646%' THEN
        CASE substring(hex(payload), 17, 8)
          WHEN '57415645' THEN 'audio/wav'
          WHEN '57454250' THEN 'image/webp'
          ELSE 'application/octet-stream' END
      WHEN pre LIKE '<?xml%' AND regexp_matches(pre, '<rss[\\s>]')
        THEN 'application/rss+xml'
      WHEN pre LIKE '<?xml%' AND regexp_matches(pre, '<feed[\\s>]')
        THEN 'application/atom+xml'
      WHEN pre LIKE '<?xml%' THEN 'application/xml'
      WHEN pre LIKE '<!doctype%' OR pre LIKE '<html%' OR pre LIKE '<head%'
        OR pre LIKE '<body%' OR pre LIKE '<div%' OR pre LIKE '<p%'
        OR pre LIKE '<script%' OR pre LIKE '<title%' OR pre LIKE '<h1%'
        OR pre LIKE '<table%' OR pre LIKE '<a %' OR pre LIKE '<a>%'
        OR pre LIKE '<br%' OR pre LIKE '<!--%'
        THEN 'text/html'
      WHEN regexp_matches(left(hex(payload), 1024), '^(?:..)*?00')
        THEN 'application/octet-stream'
      ELSE 'text/plain'
    END AS sniffed_mime
  FROM (
    SELECT url, ts14, content_type, payload,
      left(hex(payload), 32) AS hx,
      -- DuckDB decode() errors on invalid UTF-8 (Spark's cast replaces);
      -- the magic-prefix families never reach the decoded-prefix branch,
      -- so skip decoding them (gzip/png prefixes are invalid UTF-8)
      CASE WHEN left(hex(payload), 4) IN ('1F8B', 'FFD8')
             OR left(hex(payload), 2) = '89'
           THEN ''
           ELSE lower(regexp_replace(left(decode(payload), 256),
                                     '^[﻿\\s]+', '')) END AS pre
    FROM built)
),
resolved AS (
  SELECT url, ts14, sniffed_mime,
    nullif(lower(trim(string_split(content_type, ';')[1])), '') AS decl
  FROM sniffed
)
SELECT url, ts14, sniffed_mime,
  (decl IS NOT NULL AND sniffed_mime IS NOT NULL
   AND decl <> sniffed_mime) AS mime_mismatch,
  CASE
    WHEN sniffed_mime IS NULL THEN decl
    WHEN sniffed_mime IN ('application/gzip', 'application/pdf',
      'application/warc', 'application/zip', 'audio/wav', 'image/bmp',
      'image/gif', 'image/jpeg', 'image/png', 'image/webp')
      THEN sniffed_mime
    ELSE coalesce(CASE WHEN decl NOT IN ('application/octet-stream',
                    'binary/octet-stream', 'application/binary',
                    'unknown/unknown') THEN decl END, sniffed_mime)
  END AS effective_mime
FROM resolved""".replace("{pages_cte}", PAGES_CTE_DUCK)


def q_soft404_detect(spark, sf_dir):
    """Soft-404 detection (operators/soft404.py): titles/bodies are
    deterministically planted per doc_id family (phrase hits in title
    and body, error titles with tiny and rich bodies, tiny-deep stubs,
    clean pages), over the corpus's real 200/404 status mix."""
    from chrono_scraper_spark.operators.soft404 import soft404_flags

    pages = cdx_pages_view(spark, sf_dir).select(
        "url", "ts14", "doc_id", "status", "text")
    fam = F.col("doc_id") % 7
    title = (F.when(fam == 0, F.lit("Page Not Found"))
             .when(fam == 1, F.lit("404"))
             .when(fam == 2, F.lit("Error - maintenance notice"))
             .otherwise(F.concat(F.lit("doc "),
                                 F.col("doc_id").cast("string"))))
    body = (F.when(fam == 0, F.lit("Sorry."))
            .when(fam == 1, F.lit("nope"))
            .when(fam == 3, F.concat(
                F.lit("The requested URL was not found on this server. "),
                F.col("text")))
            .when(fam == 4, F.substring("text", 1, 100))
            .otherwise(F.col("text")))
    df = pages.select("url", "ts14",
                      F.col("status").alias("http_status"),
                      title.alias("title"), body.alias("text"))
    return soft404_flags(df).select(
        "url", "ts14", "http_status", "phrase_404", "title_error",
        "tiny_deep", "soft404_score", "is_soft404")


def _soft404_sql() -> str:
    from chrono_scraper_spark.operators.soft404 import (
        DEFAULT_TINY_CHARS,
        DEFAULT_THRESHOLD,
        PHRASE_404_RE,
        TITLE_ERROR_RE,
    )
    phrase = PHRASE_404_RE.replace("'", "''")
    terr = TITLE_ERROR_RE.replace("'", "''")
    return f"""
WITH pages_cdx AS ({PAGES_CTE_DUCK}),
planted AS (
  SELECT url, ts14, status AS http_status,
    CASE doc_id % 7
      WHEN 0 THEN 'Page Not Found'
      WHEN 1 THEN '404'
      WHEN 2 THEN 'Error - maintenance notice'
      ELSE 'doc ' || CAST(doc_id AS VARCHAR)
    END AS title,
    CASE doc_id % 7
      WHEN 0 THEN 'Sorry.'
      WHEN 1 THEN 'nope'
      WHEN 3 THEN 'The requested URL was not found on this server. '
                  || text
      WHEN 4 THEN substring(text, 1, 100)
      ELSE text
    END AS text
  FROM pages_cdx
),
flags AS (
  SELECT url, ts14, http_status,
    (regexp_matches(lower(coalesce(title, '')), '{phrase}')
     OR regexp_matches(lower(substring(coalesce(text, ''), 1, 400)),
                       '{phrase}')) AS phrase_404,
    regexp_matches(lower(coalesce(title, '')), '{terr}') AS title_error,
    (length(coalesce(text, '')) < {DEFAULT_TINY_CHARS}
     AND len(list_filter(
           string_split(regexp_replace(regexp_replace(url,
             '^https?://[^/]*', ''), '[?#].*$', ''), '/'),
           x -> x <> '')) >= 2) AS tiny_deep
  FROM planted
)
SELECT url, ts14, http_status, phrase_404, title_error, tiny_deep,
  CAST(CASE WHEN phrase_404 THEN 3 ELSE 0 END
     + CASE WHEN title_error THEN 2 ELSE 0 END
     + CASE WHEN tiny_deep THEN 1 ELSE 0 END AS INT) AS soft404_score,
  (coalesce(http_status, 200) >= 200 AND coalesce(http_status, 200) < 300
   AND (CASE WHEN phrase_404 THEN 3 ELSE 0 END
      + CASE WHEN title_error THEN 2 ELSE 0 END
      + CASE WHEN tiny_deep THEN 1 ELSE 0 END) >= {DEFAULT_THRESHOLD})
  AS is_soft404
FROM flags"""


SQL_SOFT404_DETECT = _soft404_sql()

_MONTH_CASE_SPARK = (
    "CASE month(mxd) WHEN 1 THEN 'Jan' WHEN 2 THEN 'Feb' WHEN 3 THEN 'Mar' "
    "WHEN 4 THEN 'Apr' WHEN 5 THEN 'May' WHEN 6 THEN 'Jun' WHEN 7 THEN 'Jul' "
    "WHEN 8 THEN 'Aug' WHEN 9 THEN 'Sep' WHEN 10 THEN 'Oct' "
    "WHEN 11 THEN 'Nov' ELSE 'Dec' END")


def q_feed_discover(spark, sf_dir):
    """RSS/Atom feed parsing + freshness status (operators/feeds.py):
    per-host feed bodies are deterministically constructed (doc_id%2
    routes each URL into the host's RSS or Atom feed; doc_id%4 plants a
    pubDate/updated after the last capture → stale, long before → fresh,
    or no date; one feed-only item per host per kind → new), parsed with
    the RE2-shared regexes (RFC 822 pubDate normalized through the
    engine's locale-free English-month parse), and joined against the
    capture log."""
    from chrono_scraper_spark.operators.feeds import (
        feed_recrawl_status,
        parse_feeds,
    )

    pages = cdx_pages_view(spark, sf_dir)
    per_url = pages.groupBy("host", "url", "doc_id").agg(
        F.max(F.to_date("warc_ts")).alias("mxd"))
    pub_date = (F.when(F.col("doc_id") % 4 == 0,
                       F.date_add(F.col("mxd"), 400))
                .when(F.col("doc_id") % 4 == 1,
                      F.date_add(F.col("mxd"), -400))
                .when(F.col("doc_id") % 4 == 3,
                      F.date_add(F.col("mxd"), -1)))
    per_url = per_url.withColumn("pd", pub_date).withColumn(
        "mon", F.expr(_MONTH_CASE_SPARK.replace("mxd", "pd")))
    rfc822 = F.concat(
        F.lit("Mon, "), F.lpad(F.dayofmonth("pd").cast("string"), 2, "0"),
        F.lit(" "), F.col("mon"), F.lit(" "),
        F.year("pd").cast("string"), F.lit(" 04:05:06 GMT"))
    iso_upd = F.concat(F.date_format("pd", "yyyy-MM-dd"),
                       F.lit("T04:05:06Z"))
    rss_item = F.concat(
        F.lit("<item><title>t"), F.col("doc_id").cast("string"),
        F.lit("</title><link>"), F.col("url"), F.lit("</link>"),
        F.coalesce(F.concat(F.lit("<pubDate>"), rfc822,
                            F.lit("</pubDate>")), F.lit("")),
        F.lit("</item>"))
    atom_entry = F.concat(
        F.lit("<entry><title>t"), F.col("doc_id").cast("string"),
        F.lit('</title><link href="'), F.col("url"),
        F.lit('"/>'),
        F.coalesce(F.concat(F.lit("<updated>"), iso_upd,
                            F.lit("</updated>")), F.lit("")),
        F.lit("</entry>"))
    rss_bodies = (per_url.filter(F.col("doc_id") % 2 == 0)
                  .select("host", rss_item.alias("b"))
                  .groupBy("host")
                  .agg(F.concat(
                      F.lit('<?xml version="1.0"?><rss version="2.0">'
                            "<channel>"),
                      F.concat_ws("", F.array_sort(F.collect_list("b"))),
                      F.lit("<item><title>only</title><link>https://"),
                      F.col("host"),
                      F.lit("/feed-only-rss</link><pubDate>Mon, 01 Jan "
                            "2022 00:00:00 GMT</pubDate></item>"
                            "</channel></rss>")).alias("body")))
    atom_bodies = (per_url.filter(F.col("doc_id") % 2 == 1)
                   .select("host", atom_entry.alias("b"))
                   .groupBy("host")
                   .agg(F.concat(
                       F.lit('<?xml version="1.0"?><feed xmlns="a">'),
                       F.concat_ws("", F.array_sort(F.collect_list("b"))),
                       F.lit('<entry><title>only</title><link href='
                             '"https://'),
                       F.col("host"),
                       F.lit('/feed-only-atom"/><updated>2022-01-01T00:'
                             "00:00Z</updated></entry></feed>"))
                       .alias("body")))
    items = parse_feeds(rss_bodies.unionByName(atom_bodies))
    return feed_recrawl_status(items, pages)


SQL_FEED_DISCOVER = """
WITH pages_cdx AS ({pages_cte}),
per_url AS (
  SELECT host, url, doc_id, max(CAST(warc_ts AS DATE)) AS mxd
  FROM pages_cdx GROUP BY 1, 2, 3
),
dated AS (
  SELECT host, url, doc_id,
    CASE WHEN doc_id % 4 = 0 THEN mxd + 400
         WHEN doc_id % 4 = 1 THEN mxd - 400
         WHEN doc_id % 4 = 3 THEN mxd - 1
    END AS pd
  FROM per_url
),
-- the oracle derives each item's published_iso directly from pd (the
-- engine must round-trip it through RFC 822 / Atom text and back)
items AS (
  SELECT url,
    CASE WHEN pd IS NOT NULL
      THEN strftime(pd, '%Y-%m-%d') || 'T04:05:06' END AS published_iso,
    CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS kind
  FROM dated
  UNION ALL
  -- a host emits a feed-only item only when it HAS a feed of that kind
  SELECT DISTINCT 'https://' || host || '/feed-only-rss',
    '2022-01-01T00:00:00', 'rss' FROM per_url WHERE doc_id % 2 = 0
  UNION ALL
  SELECT DISTINCT 'https://' || host || '/feed-only-atom',
    '2022-01-01T00:00:00', 'atom' FROM per_url WHERE doc_id % 2 = 1
),
last AS (
  SELECT url, max(strftime(warc_ts, '%Y%m%d%H%M%S')) AS last_ts14
  FROM pages_cdx GROUP BY url
)
SELECT i.url, i.published_iso, l.last_ts14 AS last_capture_ts14,
  CASE WHEN l.last_ts14 IS NULL THEN 'new'
       WHEN i.published_iso IS NOT NULL AND i.published_iso >
         (substring(l.last_ts14, 1, 4) || '-'
          || substring(l.last_ts14, 5, 2) || '-'
          || substring(l.last_ts14, 7, 2) || 'T'
          || substring(l.last_ts14, 9, 2) || ':'
          || substring(l.last_ts14, 11, 2) || ':'
          || substring(l.last_ts14, 13, 2)) THEN 'stale'
       ELSE 'fresh' END AS status,
  i.kind
FROM items i LEFT JOIN last l ON i.url = l.url""".replace(
    "{pages_cte}", PAGES_CTE_DUCK)


def q_adaptive_budgets(spark, sf_dir):
    """AIMD politeness budgets (operators/politeness.adaptive_budgets):
    a synthetic fetch_log (6 rounds per host; every 17th doc plants a
    503) folds per host in round order — halve on an error round, +2 on
    a clean one. Both engines do the identical integer fold."""
    from chrono_scraper_spark.operators.politeness import adaptive_budgets

    pages = cdx_pages_view(spark, sf_dir)
    log = pages.select(
        "host",
        (F.col("doc_id") % 6).cast("int").alias("round_idx"),
        F.when(F.col("doc_id") % 17 == 0, 503).otherwise(200)
        .cast("int").alias("http_status"))
    return adaptive_budgets(log)


SQL_ADAPTIVE_BUDGETS = """
WITH pages_cdx AS ({pages_cte}),
log AS (
  SELECT host, CAST(doc_id % 6 AS INT) AS round_idx,
    CASE WHEN doc_id % 17 = 0 THEN 503 ELSE 200 END AS http_status
  FROM pages_cdx
),
flags AS (
  SELECT host, round_idx,
    max(CASE WHEN http_status IN (429, 500, 502, 503, 504)
        THEN 1 ELSE 0 END) AS err
  FROM log GROUP BY 1, 2
),
hist AS (
  SELECT host, list(err ORDER BY round_idx) AS fl FROM flags GROUP BY 1
)
SELECT host,
  CAST(list_reduce([8] || fl,
    (acc, e) -> CASE WHEN e = 1 THEN greatest(1, acc // 2)
                     ELSE least(64, acc + 2) END) AS INT) AS budget
FROM hist""".replace("{pages_cte}", PAGES_CTE_DUCK)


def q_latest_postings(spark, sf_dir):
    """Current-view index restriction (index.current_view_postings):
    postings built over EVERY capture, then semi-joined to each URL's
    newest capture key — the search-side twin of latest_captures.
    Output one row per surviving (url, ts14) with posting stats, so the
    oracle checks exactly which capture's postings remain."""
    from chrono_scraper_spark.operators.index import current_view_postings

    pages = cdx_pages_view(spark, sf_dir)
    pi = pages.select(F.col("url").alias("url_canon"), "ts14",
                      F.lit("").alias("title"),
                      F.col("text").alias("content"))
    inv = build_inverted_terms(pi)
    pages_out = pages.select(F.col("url").alias("url_canon"), "ts14")
    cur = current_view_postings(inv, pages_out)
    return (cur.groupBy("url_canon", "ts14")
            .agg(F.count(F.lit(1)).alias("n_terms"),
                 F.sum("tf").alias("tf_sum")))


SQL_LATEST_POSTINGS = f"""
WITH pages_cdx AS ({PAGES_CTE_DUCK}),
toks AS (
  SELECT url, ts14, unnest({OG.tokens_sql('text')}) AS term
  FROM pages_cdx
),
tf AS (
  SELECT url AS url_canon, ts14, term, count(*) AS tf
  FROM toks GROUP BY 1, 2, 3
),
latest AS (
  SELECT url AS url_canon, max(ts14) AS ts14 FROM pages_cdx GROUP BY 1
)
SELECT t.url_canon, t.ts14, CAST(count(*) AS BIGINT) AS n_terms,
  CAST(sum(tf) AS BIGINT) AS tf_sum
FROM tf t JOIN latest l
  ON t.url_canon = l.url_canon AND t.ts14 = l.ts14
GROUP BY 1, 2"""


def q_opic(spark, sf_dir):
    """OPIC importance (graph.opic_importance) over the same synthetic
    host edge list as host_authority — 3 synchronous cash/history
    rounds, integer-deterministic, bit-compared against the oracle's
    CTE replay of the identical arithmetic."""
    from chrono_scraper_spark.operators.graph import opic_importance

    pages = cdx_pages_view(spark, sf_dir)
    k = (F.col("doc_id") * 7 + 3) % 500
    dst = (F.when(k % 3 == 0, F.lit("mega.example.com"))
           .when(k % 20 == 1, F.concat(F.lit("univ"),
                                       (k % 4).cast("string"),
                                       F.lit(".edu")))
           .when(k % 20 == 2, F.concat(F.lit("agency"),
                                       (k % 3).cast("string"),
                                       F.lit(".gov")))
           .otherwise(F.concat(F.lit("site"), (k % 40).cast("string"),
                               F.lit(".com"))))
    edges = (pages.select(F.col("host").alias("src"), dst.alias("dst"))
             .distinct())
    return opic_importance(edges, rounds=3)


def _opic_iter_cte(i: int) -> str:
    return f"""s{i} AS MATERIALIZED (
  SELECT e.dst AS host, CAST(sum(c.cash // o.outdeg) AS BIGINT) AS s
  FROM edges e JOIN c{i} c ON e.src = c.host
  JOIN outdeg o ON e.src = o.src
  GROUP BY e.dst),
v{i} AS MATERIALIZED (
  SELECT CAST(sum(CASE WHEN o.outdeg IS NULL THEN c.cash
                       ELSE c.cash % o.outdeg END) AS BIGINT) AS v
  FROM c{i} c LEFT JOIN outdeg o ON c.host = o.src),
c{i + 1} AS MATERIALIZED (
  SELECT h.host,
    CAST(coalesce(s.s, 0)
         + (SELECT v FROM v{i}) // (SELECT count(*) FROM hosts)
      AS BIGINT) AS cash,
    CAST(c.hist + c.cash AS BIGINT) AS hist
  FROM hosts h LEFT JOIN s{i} s ON h.host = s.host
  JOIN c{i} c ON h.host = c.host)"""


_OPIC_CHAIN = (f"WITH pages_cdx AS MATERIALIZED ({PAGES_CTE_DUCK}),\n"
               + """
ek AS (SELECT host AS src, (doc_id * 7 + 3) % 500 AS k FROM pages_cdx),
edges0 AS MATERIALIZED (
  SELECT DISTINCT src,
    CASE WHEN k % 3 = 0 THEN 'mega.example.com'
         WHEN k % 20 = 1 THEN 'univ' || CAST(k % 4 AS VARCHAR) || '.edu'
         WHEN k % 20 = 2 THEN 'agency' || CAST(k % 3 AS VARCHAR) || '.gov'
         ELSE 'site' || CAST(k % 40 AS VARCHAR) || '.com' END AS dst
  FROM ek),
edges AS MATERIALIZED (SELECT src, dst FROM edges0 WHERE src <> dst),
hosts AS MATERIALIZED (
  SELECT src AS host FROM edges0 UNION SELECT dst FROM edges0),
outdeg AS MATERIALIZED (
  SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
c0 AS MATERIALIZED (SELECT host,
  CAST((SELECT 1000000000000 // count(*) FROM hosts) AS BIGINT) AS cash,
  CAST(0 AS BIGINT) AS hist
  FROM hosts),
""" + ",\n".join(_opic_iter_cte(i) for i in range(3)))

SQL_OPIC = (_OPIC_CHAIN
            + "\nSELECT host, CAST(hist + cash AS BIGINT) "
              "AS importance_nano FROM c3")

SQL_FRONTIER_PRIORITY_OPIC = (
    _OPIC_CHAIN
    + ",\nauth AS (SELECT host, CAST(hist + cash AS BIGINT) "
      "AS auth_nano FROM c3)"
    + _FRONTIER_FUSE_SQL)


def q_wat_identity(spark, sf_dir):
    """WAT (Common Crawl per-page metadata record) writer+parser
    round-trip: each URL's link set (extract_links over the constructed
    HTML, distinct targets, sorted), title and status are encoded as a
    per-record-gzipped ``WARC-Type: metadata`` JSON envelope
    (sources/warc.py::encode_wat_record) and parsed back in one pandas
    UDF; the oracle recomputes every field from the source rows."""
    import hashlib
    import json as _json

    from pyspark.sql import types as ST
    from pyspark.sql.functions import pandas_udf

    from chrono_scraper_spark.operators.links import extract_links
    from chrono_scraper_spark.sources.warc import (
        decode_warc_member,
        encode_wat_record,
    )

    pages = _linked_pages(spark, sf_dir)
    per_url = (extract_links(pages)
               .groupBy("src_url")
               .agg(F.array_sort(F.collect_set("dst_url")).alias("links")))
    meta = pages.groupBy("url").agg(
        F.max("ts14").alias("ts14"),
        F.max("status").alias("status"),
        F.max("doc_id").alias("mxid"))
    date_iso = F.concat(
        F.substring("ts14", 1, 4), F.lit("-"), F.substring("ts14", 5, 2),
        F.lit("-"), F.substring("ts14", 7, 2), F.lit("T"),
        F.substring("ts14", 9, 2), F.lit(":"), F.substring("ts14", 11, 2),
        F.lit(":"), F.substring("ts14", 13, 2), F.lit("Z"))
    joined = (meta.join(per_url, meta.url == per_url.src_url, "left")
              .select("url", "ts14", "status",
                      F.concat(F.lit("doc "), F.col("mxid").cast("string"))
                      .alias("title"),
                      date_iso.alias("date_iso"),
                      F.coalesce("links", F.array().cast("array<string>"))
                      .alias("links")))

    schema = ST.StructType([
        ST.StructField("title_rt", ST.StringType()),
        ST.StructField("status_rt", ST.IntegerType()),
        ST.StructField("n_links", ST.IntegerType()),
        ST.StructField("links_md5", ST.StringType()),
        ST.StructField("is_metadata", ST.BooleanType()),
    ])

    @pandas_udf(schema)
    def roundtrip(url, date_iso, title, status, links):
        import pandas as pd
        cols = {k: [] for k in ("title_rt", "status_rt", "n_links",
                                "links_md5", "is_metadata")}
        for u, d, t, s, lk in zip(url, date_iso, title, status, links):
            rec = decode_warc_member(encode_wat_record(
                u, d, title=t, http_status=int(s), links=list(lk)))
            env = _json.loads(rec["payload"])
            hm = env["Envelope"]["Payload-Metadata"][
                "HTTP-Response-Metadata"]
            urls = [x["url"] for x in hm["HTML-Metadata"]["Links"]]
            cols["title_rt"].append(hm["HTML-Metadata"]["Head"]["Title"])
            cols["status_rt"].append(hm["Response-Message"]["Status"])
            cols["n_links"].append(len(urls))
            cols["links_md5"].append(
                hashlib.md5("|".join(urls).encode()).hexdigest())
            cols["is_metadata"].append(rec["warc_type"] == "metadata")
        return pd.DataFrame(cols)

    rt = roundtrip("url", "date_iso", "title", "status", "links")
    return joined.select("url", "ts14", rt.alias("rt")).select(
        "url", "ts14", "rt.title_rt", "rt.status_rt", "rt.n_links",
        "rt.links_md5", "rt.is_metadata")


SQL_WAT_IDENTITY = ("WITH " + _LINKS_CTES + """,
lk AS (
  SELECT src_url, list_sort(list(DISTINCT dst_url)) AS ls
  FROM links GROUP BY src_url
),
meta AS (
  SELECT url, max(ts14) AS ts14, max(status) AS status,
    max(doc_id) AS mxid
  FROM pages_cdx GROUP BY url
)
SELECT m.url, m.ts14,
  'doc ' || CAST(m.mxid AS VARCHAR) AS title_rt,
  CAST(m.status AS INT) AS status_rt,
  CAST(coalesce(len(l.ls), 0) AS INT) AS n_links,
  md5(coalesce(array_to_string(l.ls, '|'), '')) AS links_md5,
  TRUE AS is_metadata
FROM meta m LEFT JOIN lk l ON m.url = l.src_url""")


def q_pct_normalize(spark, sf_dir):
    """RFC 3986 §6.2.2 percent-encoding normalization
    (functions/urls.pct_normalize): corpus URLs get planted escape
    suffixes per doc_id family (lowercase reserved escape, encoded
    unreserved chars, double-encoded percent, multibyte UTF-8 escapes,
    stray/invalid percents) — uppercase-hex + decode-unreserved must
    agree byte-for-byte with the oracle's transform."""
    from chrono_scraper_spark.functions.urls import pct_normalize

    pages = cdx_pages_view(spark, sf_dir).select("url", "ts14", "doc_id")
    suffix = (F.when(F.col("doc_id") % 6 == 0, "?a=x%2fy")
              .when(F.col("doc_id") % 6 == 1, "/%61%62c")
              .when(F.col("doc_id") % 6 == 2, "/100%25%2525")
              .when(F.col("doc_id") % 6 == 3, "/caf%c3%a9")
              .when(F.col("doc_id") % 6 == 4, "/50%")
              .otherwise("/x%7e%5A%1G"))
    planted = pages.select(
        "ts14", F.concat("url", suffix).alias("url"))
    return planted.select("url", "ts14",
                          pct_normalize(F.col("url")).alias("normalized"))


SQL_PCT_NORMALIZE = """
WITH pages_cdx AS ({pages_cte}),
planted AS (
  SELECT ts14,
    url || CASE doc_id % 6
      WHEN 0 THEN '?a=x%2fy'
      WHEN 1 THEN '/%61%62c'
      WHEN 2 THEN '/100%25%2525'
      WHEN 3 THEN '/caf%c3%a9'
      WHEN 4 THEN '/50%'
      ELSE '/x%7e%5A%1G'
    END AS url
  FROM pages_cdx
),
parts AS (SELECT url, ts14, string_split(url, '%') AS p FROM planted)
SELECT url, ts14,
  p[1] || coalesce(list_aggregate(list_transform(p[2:], x ->
    CASE WHEN NOT regexp_matches(x, '^[0-9A-Fa-f]{2}') THEN '%' || x
         WHEN upper(x[1:2]) >= '80' THEN '%' || upper(x[1:2]) || x[3:]
         WHEN regexp_matches(decode(unhex(upper(x[1:2]))),
                             '^[A-Za-z0-9._~-]$')
           THEN decode(unhex(upper(x[1:2]))) || x[3:]
         ELSE '%' || upper(x[1:2]) || x[3:] END),
    'string_agg', ''), '') AS normalized
FROM parts""".replace("{pages_cte}", PAGES_CTE_DUCK)


def q_script_profile(spark, sf_dir):
    """Unicode-script composition (textops.script_profile): corpus text
    gets planted non-Latin samples per doc_id family (Cyrillic, Han,
    Arabic, Hangul, Devanagari, Greek, Latin-only) — per-script counts,
    integer ppm shares and the dominant script must match the oracle's
    RE2 \\p{Script} counts exactly (Java spells the same classes
    IsLatin/IsHan/…)."""
    from chrono_scraper_spark.functions.textops import script_profile

    pages = cdx_pages_view(spark, sf_dir).select(
        "url", "ts14", "doc_id", "text")
    base = F.regexp_replace(F.substring("text", 1, 40), "[^ -~]", "")
    planted = (F.when(F.col("doc_id") % 7 == 0,
                      F.concat(base, F.lit(" АБВГ дежз")))
               .when(F.col("doc_id") % 7 == 1,
                     F.concat(base, F.lit(" 漢字漢字漢")))
               .when(F.col("doc_id") % 7 == 2,
                     F.concat(base, F.lit(" العربية")))
               .when(F.col("doc_id") % 7 == 3,
                     F.concat(base, F.lit(" 한국어 텍스트")))
               .when(F.col("doc_id") % 7 == 4,
                     F.concat(base, F.lit(" हिन्दी")))
               .when(F.col("doc_id") % 7 == 5,
                     F.concat(base, F.lit(" ελληνικά")))
               .otherwise(base))
    df = pages.select("url", "ts14", planted.alias("text"))
    return script_profile(df).drop("text")


def _script_profile_sql() -> str:
    from chrono_scraper_spark.functions.textops import E6, SCRIPTS
    counts = ",\n    ".join(
        f"CAST(length(regexp_replace(text, '[^\\p{{{re2}}}]', '', 'g')) "
        f"AS BIGINT) AS n_{name}"
        for name, _java, re2 in SCRIPTS)
    total = " + ".join(f"n_{name}" for name, _j, _r in SCRIPTS)
    ppms = ",\n  ".join(
        f"CAST(CASE WHEN script_total > 0 "
        f"THEN (n_{name} * {E6}) // script_total ELSE 0 END AS BIGINT) "
        f"AS {name}_ppm"
        for name, _j, _r in SCRIPTS)
    # dominant: max (count, name) struct — tie-break name DESC, same as
    # the engine's greatest() over (n, s) structs
    dom = ("(SELECT max(struct_pack(n := x.n, s := x.s)).s FROM (VALUES "
           + ", ".join(f"(n_{name}, '{name}')" for name, _j, _r in SCRIPTS)
           + ") AS x(n, s))")
    return f"""
WITH pages_cdx AS ({PAGES_CTE_DUCK}),
planted AS (
  SELECT url, ts14,
    regexp_replace(substring(text, 1, 40), '[^ -~]', '', 'g') ||
    CASE doc_id % 7
      WHEN 0 THEN ' АБВГ дежз'
      WHEN 1 THEN ' 漢字漢字漢'
      WHEN 2 THEN ' العربية'
      WHEN 3 THEN ' 한국어 텍스트'
      WHEN 4 THEN ' हिन्दी'
      WHEN 5 THEN ' ελληνικά'
      ELSE ''
    END AS text
  FROM pages_cdx
),
counted AS (
  SELECT url, ts14,
    {counts}
  FROM planted
),
totaled AS (
  SELECT *, CAST({total} AS BIGINT) AS script_total FROM counted
)
SELECT url, ts14,
  {", ".join(f"n_{name}" for name, _j, _r in SCRIPTS)},
  script_total,
  {ppms},
  CASE WHEN script_total > 0 THEN {dom} END AS dominant_script
FROM totaled"""


SQL_SCRIPT_PROFILE = _script_profile_sql()


def q_compression_ratio(spark, sf_dir):
    """Compression-ratio quality signal (quality.with_compression_ratio):
    zlib ratio per document — rows-only (zlib is not SQL-expressible;
    the python twin lives in test_quality), like bpe_merges."""
    from chrono_scraper_spark.operators.quality import (
        with_compression_ratio,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return with_compression_ratio(d).drop("text")


def q_image_near_dups(spark, sf_dir):
    """Image near-duplicate detection via 64-bit dHash over REAL BMP
    payloads (multimodal.image_dhash + dhash_near_dups): 96 synthetic 9×8
    grayscale BMPs in 8 clusters of 12 variants (each variant perturbs one
    last-column pixel → ≤ 2 hash bits), banded Hamming-bucket candidate
    join (pigeonhole-exact for hamming < 4 bands) + bit_count verify ≤ 3.
    The DuckDB oracle recomputes the hash from the images' arithmetic pixel
    definition, so the whole BMP encode→decode→luma→downsample→hash path
    must be value-exact. Reference hook: media dedup for image-rich crawls
    (the multimodal pipeline's dedup slot)."""
    from chrono_scraper_spark.operators.multimodal import (
        dhash_near_dups,
        image_dhash,
        synth_dhash_images,
    )

    media = synth_dhash_images(spark, 96)
    return dhash_near_dups(image_dhash(media))


SQL_IMAGE_NEAR_DUPS = """
WITH ids AS (SELECT t.range AS media_id FROM range(0, 96) t),
cells AS (
  SELECT i.media_id, x.range AS x, y.range AS y,
    (17 * (i.media_id % 8) * (x.range + 1) + 31 * x.range * x.range
     + 57 * y.range + 13 * x.range * y.range
     + 29 * (i.media_id % 8) * y.range
     + CASE WHEN i.media_id // 8 >= 1 AND x.range = 8
            AND y.range = (i.media_id // 8 - 1) % 8
            THEN 128 ELSE 0 END) % 256 AS g
  FROM ids i, range(0, 9) x, range(0, 8) y
),
bits AS (
  SELECT a.media_id, a.y * 8 + a.x AS bit_pos
  FROM cells a JOIN cells b
    ON a.media_id = b.media_id AND a.y = b.y AND b.x = a.x + 1
  WHERE a.x < 8 AND a.g > b.g
),
hashes AS (
  SELECT i.media_id, CAST(coalesce(sum(
    CASE WHEN b.bit_pos = 63 THEN CAST(-9223372036854775808 AS BIGINT)
         ELSE CAST(1 AS BIGINT) << b.bit_pos END), 0) AS BIGINT) AS dhash
  FROM ids i LEFT JOIN bits b USING (media_id) GROUP BY 1
)
SELECT h1.media_id AS media_id_a, h2.media_id AS media_id_b,
       CAST(bit_count(xor(h1.dhash, h2.dhash)) AS INTEGER) AS hamming
FROM hashes h1 JOIN hashes h2 ON h1.media_id < h2.media_id
WHERE bit_count(xor(h1.dhash, h2.dhash)) <= 3"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

# Contract registry. ORDER MATTERS: the driver's correctness gate
# snapshots the FIRST 50 entries, so the first 50 are one entry per
# DISTINCT operator family (ops that had no driver-green row through r3
# lead), and redundant variants of already-covered families — same oracle
# or strictly-subsumed result — sit after the window. Every entry, either
# side of the window, still runs through scripts/check_oracles.py.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # --- positions 1-42: every query with no driver-green CORRECTNESS
    # row through r03 (the 10 carried over from r3 + all round-4
    # additions), so the 50-entry driver window finally hard-checks
    # each of them. bpe_merges is rows-only (iterative argmax is not
    # single-SQL-expressible; python-twin parity tests hold its
    # correctness).
    "gopher_quality": q_gopher_quality,
    "decontaminate": q_decontaminate,
    "stratified_sample": q_stratified_sample,
    "boilerplate_strip": q_boilerplate_strip,
    "unigram_logprob": q_unigram_logprob,
    "host_authority": q_host_authority,
    "winnow_fingerprint": q_winnow_fingerprint,
    "warc_identity": q_warc_identity,
    "dedup_clusters": q_dedup_clusters,
    "lm_buckets": q_lm_buckets,
    "fulltext_ranked": q_fulltext_ranked,
    "fasttext_quality": q_fasttext_quality,
    "mix_rebalance": q_mix_rebalance,
    "exact_substring_removal": q_exact_substring_removal,
    "dsir_sample": q_dsir_sample,
    "semdedup": q_semdedup,
    "events_sessionize": q_events_sessionize,
    "line_dedup": q_line_dedup,
    "pack_sequences": q_pack_sequences,
    "asof_join": q_asof_join,
    "seen_antijoin_cuckoo": q_seen_antijoin_cuckoo,
    "crawl_diff": q_crawl_diff,
    "dedup_keep_best": q_dedup_keep_best,
    "wordpiece_encode": q_wordpiece_encode,
    "pii_redact": q_pii_redact,
    "url_blocklist": q_url_blocklist,
    "pack_emit": q_pack_emit,
    "vocab_topk": q_vocab_topk,
    "shard_assign": q_shard_assign,
    # four swaps vs the r3 plan: the sixth-pass queries below are NEW
    # operator families (SURT/CDXJ sink, redirect resolution, RFC 9309
    # wildcard matching, budget apportionment) and take the window slots
    # of four same-family variants whose siblings stay inside
    # (exact_substring_removal, dedup_clusters, page_changes); the
    # displaced variants move to position 51+ and remain locally
    # oracle-checked via scripts/check_oracles.py.
    "surt_cdxj": q_surt_cdxj,
    "redirect_resolve": q_redirect_resolve,
    "tfidf_topk": q_tfidf_topk,
    "topic_clusters": q_topic_clusters,
    "cluster_cohesion": q_cluster_cohesion,
    "dbscan": q_dbscan,
    "page_changes": q_page_changes,
    "robots_wildcard": q_robots_wildcard,
    "authority_budgets": q_authority_budgets,
    "readability": q_readability,
    "topic_assign": q_topic_assign,
    "bigram_logprob": q_bigram_logprob,
    "bpe_merges": q_bpe_merges,
    "recrawl_schedule": q_recrawl_schedule,  # new this round: freshness-
    # driven revisit policy (change-rate × staleness)
    "bm25_rank": q_bm25_rank,  # new this round: Okapi BM25 relevance
    "link_extract": q_link_extract,  # new this round: href/anchor parsing
    "anchor_texts": q_anchor_texts,  # new this round: per-target anchors
    "unigram_pieces": q_unigram_pieces,  # new this round: unigram-LM
    # tokenizer training (rows-only, like bpe_merges)
    "sitemap_discover": q_sitemap_discover,  # new this round: sitemap
    # parsing + lastmod recrawl candidacy
    "wet_identity": q_wet_identity,  # new this round: WET conversion
    # record writer+parser round-trip
    "url_traps": q_url_traps,  # new this round: crawl-trap URL flags
    # (position 50 — the window is now exactly the 50 queries with no
    # driver-green row through r03; host_traps, the same family's
    # host-level aggregate, sits first beyond it)
    # --- outside the 50-entry driver window: variants and staples
    # whose family is covered above; every one still runs through
    # scripts/check_oracles.py ---
    "exact_substring_spans": q_exact_substring_spans,  # removal's core
    "dedup_clusters_star": q_dedup_clusters_star,  # same oracle as
    # dedup_clusters (inside the window)
    "change_stats": q_change_stats,          # page_changes rollup
    "content_evolution": q_content_evolution,  # page_changes timeline
    "host_traps": q_host_traps,      # traps family host-level aggregate
    "unicode_clean": q_unicode_clean,  # new: NFC + invisible-char pass
    "frontier_priority": q_frontier_priority,  # capstone fusion of the
    # authority + staleness + trap families (each covered above)
    "frontier_priority_opic": q_frontier_priority_opic,  # the same
    # fusion with OPIC authority (cold-start spider member)
    "hits": q_hits,  # Kleinberg hubs & authorities (graph family)
    "url_tree": q_url_tree,  # hierarchical path-prefix rollup
    "quantile_sketch": q_quantile_sketch,  # mergeable log2-bin quantiles
    "hll_distinct": q_hll_distinct,  # mergeable deterministic HLL
    "links_nofollow": q_links_nofollow,  # rel=nofollow link flags
    "meta_robots": q_meta_robots,  # page-level REP directives
    "rel_canonical": q_rel_canonical,  # author-declared canonical URLs
    "saved_query_match": q_saved_query_match,  # standing-search alerts
    "cms_host_counts": q_cms_host_counts,  # mergeable count-min sketch
    "surt_collapse": q_surt_collapse,  # canonical-URL dedup on SURT keys
    "latest_captures": q_latest_captures,  # current-view collapse (newest)
    "mime_sniff": q_mime_sniff,  # magic-byte content sniffing + dispatch
    "soft404_detect": q_soft404_detect,  # error pages served with 200
    "feed_discover": q_feed_discover,  # RSS/Atom parsing + freshness
    "adaptive_budgets": q_adaptive_budgets,  # AIMD politeness budgets
    "latest_postings": q_latest_postings,  # current-view index restriction
    "opic": q_opic,  # on-line page importance (cash/history rounds)
    "wat_identity": q_wat_identity,  # WAT metadata record round-trip
    "pct_normalize": q_pct_normalize,  # RFC 3986 escape normalization
    "script_profile": q_script_profile,  # Unicode-script composition
    "compression_ratio": q_compression_ratio,  # zlib quality signal
    "image_near_dups": q_image_near_dups,  # dHash image dedup (real BMP
    # kernel; full arithmetic-recompute oracle)
    # (rows-only: zlib has no SQL twin — python-twin parity in tests)
    "filter_decisions": q_filter_decisions,
    "robots_rules": q_robots_rules,
    "daily_stats": q_daily_stats,
    "exact_dups": q_exact_dups,
    "crawl_order": q_crawl_order,
    "extraction_identity": q_extraction_identity,
    "embedding_near_dups": q_embedding_near_dups,
    "multimodal_features": q_multimodal_features,
    "collapse_digest": q_collapse_digest,
    "registry_categorize": q_registry_categorize,
    "politeness_schedule_pruned": q_politeness_schedule_pruned,
    "url_parts": q_url_parts,
    "cdx_analytics": q_cdx_analytics,
    "status_percentiles": q_status_percentiles,
    "interval_merge": q_interval_merge,
    "gap_detect": q_gap_detect,
    "events_tumbling": q_events_tumbling,
    "doc_stats": q_doc_stats,
    "langid": q_langid,
    "facet_counts": q_facet_counts,
    "entity_extract": q_entity_extract,
    "ann_topk_lsh": q_ann_topk_lsh,
    "simhash_pairs": q_simhash_pairs,
    "hybrid_source": q_hybrid_source,
    "minhash_pairs": q_minhash_pairs,
    "fulltext_proximity": q_fulltext_proximity,
    "seen_antijoin_bloom_bucketed": q_seen_antijoin_bloom_bucketed,
    "filter_stats": q_filter_stats,
    "seen_antijoin": q_seen_antijoin,
    "seen_antijoin_bloom": q_seen_antijoin_bloom,
    "politeness_schedule": q_politeness_schedule,
    "extraction_stats": q_extraction_stats,
    "domain_similarity": q_domain_similarity,
    "domain_profile": q_domain_profile,
    "project_monthly": q_project_monthly,
    "size_distribution": q_size_distribution,
    "sliding_window_count": q_sliding_window_count,
    "lineitem_rollup": q_lineitem_rollup,
    "top_customers": q_top_customers,
    "minhash_signatures": q_minhash_signatures,
    "ngram_jaccard_planted": q_ngram_jaccard_planted,
    "fulltext_match": q_fulltext_match,
    "fulltext_typo": q_fulltext_typo,
    "cdx_facets": q_cdx_facets,
    "ann_topk": q_ann_topk,
    "ann_topk_ivf": q_ann_topk_ivf,
    "search_highlight": q_search_highlight,
    "pagination": q_pagination,
    "pdf_extraction_identity": q_pdf_extraction_identity,
}

ORACLES: dict[str, str] = {
    "filter_decisions": SQL_FILTER_DECISIONS,
    "filter_stats": SQL_FILTER_STATS,
    "collapse_digest": SQL_COLLAPSE_DIGEST,
    "seen_antijoin": SQL_SEEN_ANTI_JOIN,
    "seen_antijoin_bloom": SQL_SEEN_ANTI_JOIN,
    "seen_antijoin_bloom_bucketed": SQL_SEEN_ANTI_JOIN,
    "seen_antijoin_cuckoo": SQL_SEEN_ANTI_JOIN,
    "registry_categorize": SQL_REGISTRY_CATEGORIZE,
    "politeness_schedule": SQL_POLITENESS_SCHEDULE,
    "politeness_schedule_pruned": SQL_POLITENESS_SCHEDULE_PRUNED,
    "crawl_order": SQL_CRAWL_ORDER,
    "url_parts": SQL_URL_PARTS,
    "cdx_analytics": SQL_CDX_ANALYTICS,
    "daily_stats": SQL_DAILY_STATS,
    "status_percentiles": SQL_STATUS_PERCENTILES,
    "domain_profile": SQL_DOMAIN_PROFILE,
    "domain_similarity": SQL_DOMAIN_SIMILARITY,
    "size_distribution": SQL_SIZE_DISTRIBUTION,
    "interval_merge": SQL_INTERVAL_MERGE,
    "gap_detect": SQL_GAP_DETECT,
    "sliding_window_count": SQL_SLIDING_WINDOW_COUNT,
    "events_tumbling": SQL_EVENTS_TUMBLING,
    "doc_stats": SQL_DOC_STATS,
    "langid": SQL_LANGID,
    "pii_redact": SQL_PII_REDACT,
    "url_blocklist": SQL_URL_BLOCKLIST,
    "minhash_signatures": SQL_MINHASH_SIGNATURES,
    "exact_dups": SQL_EXACT_DUPS,
    "ngram_jaccard_planted": SQL_NGRAM_JACCARD_PLANTED,
    "minhash_pairs": SQL_MINHASH_PAIRS,
    "fulltext_match": SQL_FULLTEXT_MATCH,
    "bm25_rank": SQL_BM25_RANK,
    "recrawl_schedule": SQL_RECRAWL_SCHEDULE,
    "link_extract": SQL_LINK_EXTRACT,
    "anchor_texts": SQL_ANCHOR_TEXTS,
    "sitemap_discover": SQL_SITEMAP_DISCOVER,
    "wet_identity": SQL_WET_IDENTITY,
    "url_traps": SQL_URL_TRAPS,
    "host_traps": SQL_HOST_TRAPS,
    "unicode_clean": SQL_UNICODE_CLEAN,
    "fulltext_ranked": SQL_FULLTEXT_RANKED,
    "facet_counts": SQL_FACET_COUNTS,
    "fulltext_typo": SQL_FULLTEXT_TYPO,
    "fulltext_proximity": SQL_FULLTEXT_PROXIMITY,
    "search_highlight": SQL_SEARCH_HIGHLIGHT,
    "pagination": SQL_PAGINATION,
    "entity_extract": SQL_ENTITY_EXTRACT,
    "extraction_stats": SQL_EXTRACTION_STATS,
    "project_monthly": SQL_PROJECT_MONTHLY,
    "cdx_facets": SQL_CDX_FACETS,
    "ann_topk": SQL_ANN_TOPK,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
    "lineitem_rollup": SQL_LINEITEM_ROLLUP,
    "top_customers": SQL_TOP_CUSTOMERS,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "ann_topk_lsh": SQL_ANN_TOPK_LSH,
    "ann_topk_ivf": SQL_ANN_TOPK_IVF,
    "hybrid_source": SQL_HYBRID_SOURCE,
    "extraction_identity": SQL_EXTRACTION_IDENTITY,
    "pdf_extraction_identity": SQL_PDF_EXTRACTION_IDENTITY,
    "robots_rules": SQL_ROBOTS_RULES,
    "multimodal_features": SQL_MULTIMODAL_FEATURES,
    "gopher_quality": SQL_GOPHER_QUALITY,
    "decontaminate": SQL_DECONTAMINATE,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "boilerplate_strip": SQL_BOILERPLATE_STRIP,
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "host_authority": SQL_HOST_AUTHORITY,
    "winnow_fingerprint": SQL_WINNOW_FINGERPRINT,
    "warc_identity": SQL_WARC_IDENTITY,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "exact_substring_spans": SQL_EXACT_SUBSTRING_SPANS,
    "exact_substring_removal": SQL_EXACT_SUBSTRING_REMOVAL,
    "dsir_sample": SQL_DSIR_SAMPLE,
    "semdedup": SQL_SEMDEDUP,
    "events_sessionize": SQL_EVENTS_SESSIONIZE,
    "line_dedup": SQL_LINE_DEDUP,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "fasttext_quality": SQL_FASTTEXT_QUALITY,
    "pack_emit": SQL_PACK_EMIT,
    "vocab_topk": SQL_VOCAB_TOPK,
    "shard_assign": SQL_SHARD_ASSIGN,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "crawl_diff": SQL_CRAWL_DIFF,
    "wordpiece_encode": SQL_WORDPIECE_ENCODE,
    "mix_rebalance": SQL_MIX_REBALANCE,
    "asof_join": SQL_ASOF_JOIN,
    "dedup_clusters_star": SQL_DEDUP_CLUSTERS,
    "lm_buckets": SQL_LM_BUCKETS,
    "tfidf_topk": SQL_TFIDF_TOPK,
    "topic_clusters": SQL_TOPIC_CLUSTERS,
    "cluster_cohesion": SQL_CLUSTER_COHESION,
    "dbscan": SQL_DBSCAN,
    "page_changes": SQL_PAGE_CHANGES,
    "change_stats": SQL_CHANGE_STATS,
    "content_evolution": SQL_CONTENT_EVOLUTION,
    "readability": SQL_READABILITY,
    "topic_assign": SQL_TOPIC_ASSIGN,
    "bigram_logprob": SQL_BIGRAM_LOGPROB,
    "frontier_priority": SQL_FRONTIER_PRIORITY,
    "frontier_priority_opic": SQL_FRONTIER_PRIORITY_OPIC,
    "robots_wildcard": SQL_ROBOTS_WILDCARD,
    "surt_cdxj": SQL_SURT_CDXJ,
    "redirect_resolve": SQL_REDIRECT_RESOLVE,
    "authority_budgets": SQL_AUTHORITY_BUDGETS,
    "hits": SQL_HITS,
    "url_tree": SQL_URL_TREE,
    "quantile_sketch": SQL_QUANTILE_SKETCH,
    "hll_distinct": SQL_HLL_DISTINCT,
    "links_nofollow": SQL_LINKS_NOFOLLOW,
    "meta_robots": SQL_META_ROBOTS,
    "rel_canonical": SQL_REL_CANONICAL,
    "saved_query_match": SQL_SAVED_QUERY_MATCH,
    "cms_host_counts": SQL_CMS_HOST_COUNTS,
    "surt_collapse": SQL_SURT_COLLAPSE,
    "latest_captures": SQL_LATEST_CAPTURES,
    "mime_sniff": SQL_MIME_SNIFF,
    "soft404_detect": SQL_SOFT404_DETECT,
    "feed_discover": SQL_FEED_DISCOVER,
    "adaptive_budgets": SQL_ADAPTIVE_BUDGETS,
    "latest_postings": SQL_LATEST_POSTINGS,
    "opic": SQL_OPIC,
    "wat_identity": SQL_WAT_IDENTITY,
    "pct_normalize": SQL_PCT_NORMALIZE,
    "script_profile": SQL_SCRIPT_PROFILE,
    "image_near_dups": SQL_IMAGE_NEAR_DUPS,
}


# --------------------------------------------------------------------------
# per-family query modules (chrono_scraper_spark/queries/*) merge here;
# window placement is decided by the reordering in __spark_entry__.py /
# the registry order above.
# --------------------------------------------------------------------------
from chrono_scraper_spark.queries import recommend as _qrec  # noqa: E402

QUERIES.update(_qrec.QUERIES)
ORACLES.update(_qrec.ORACLES)


# --------------------------------------------------------------------------
# Round-5 driver window (the driver's CORRECTNESS gate hard-checks the
# FIRST 50 registry entries at sf0.01). Positions 1-33: every oracle-backed
# query that has never had a driver-green CORRECTNESS row through r4 (all
# locally green via scripts/check_oracles.py). Positions 34-50: fast green
# staples re-confirming one representative per family. Rows-only queries
# (bpe_merges / unigram_pieces / compression_ratio — iterative-argmax and
# zlib semantics with python-twin parity tests instead of SQL oracles) sit
# below position 50 so the window can be 50/50 green. After this round,
# every oracle-backed contract query has had a hard driver row in some
# round.
# --------------------------------------------------------------------------
_R5_WINDOW = [
    # never driver-checked, oracle-backed (33)
    "exact_substring_spans", "dedup_clusters_star", "change_stats",
    "content_evolution", "host_traps", "unicode_clean",
    "frontier_priority", "frontier_priority_opic", "hits", "url_tree",
    "quantile_sketch", "hll_distinct", "links_nofollow", "meta_robots",
    "rel_canonical", "saved_query_match", "cms_host_counts",
    "surt_collapse", "latest_captures", "mime_sniff", "soft404_detect",
    "feed_discover", "adaptive_budgets", "latest_postings", "opic",
    "wat_identity", "pct_normalize", "script_profile", "image_near_dups",
    "recommend_content", "trending_pages", "search_suggest",
    "discover_domains",
    # green staples, one per family (17)
    "filter_decisions", "filter_stats", "collapse_digest",
    "seen_antijoin", "politeness_schedule", "crawl_order", "daily_stats",
    "exact_dups", "fulltext_match", "ann_topk", "events_tumbling",
    "lineitem_rollup", "doc_stats", "langid", "interval_merge",
    "minhash_pairs", "url_parts",
]


def _window_order(d: dict) -> dict:
    head = {k: d[k] for k in _R5_WINDOW if k in d}
    head.update({k: v for k, v in d.items() if k not in head})
    return head


QUERIES = _window_order(QUERIES)
ORACLES = _window_order(ORACLES)
