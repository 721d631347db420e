"""Contract queries: cross-store consistency validation, entity
disambiguation, audit security profiles.

Reference families: data_consistency_validator.py (row-count / record-hash
/ business-rule checks between the primary store and the analytics
replica), wikidata_service.py (entity disambiguation scoring), and
audit_analysis.py (anomaly thresholds).

The "replica" here is the primary CDX corpus with DETERMINISTIC drift
injected (rows dropped, text tampered, columns nulled) — the fixture
analog of an analytics export that fell out of sync; at deployment the
replica argument is simply the second catalog table. The drift rules are
plain SQL on both engines, so every check is value-checkable by the
driver's DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chrono_scraper_spark.corpus import PAGES_CTE_DUCK, cdx_pages_view
from chrono_scraper_spark.operators import audit as AU
from chrono_scraper_spark.operators import consistency as CS
from chrono_scraper_spark.operators import entity_link as EL

# ---------------------------------------------------------------------------
# Consistency checks (data_consistency_validator.py)
# ---------------------------------------------------------------------------
# Drift injection (fixture): drop a scattering of rows plus one-third of a
# single host (pushing that host past the 10% severity=error threshold),
# tamper text on a second scattering, null the byte count on a third, and
# zero the timestamp on a fourth.
_DRIFT_DROP = "((doc_id % 97 = 3 AND n_cap = 0) " \
              "OR (host = 'agency1.gov' AND n_cap = 2))"


def _replica(pages):
    return (pages
            .filter(f"NOT {_DRIFT_DROP}")
            .withColumn("text",
                        F.when(F.col("doc_id") % 101 == 5,
                               F.concat(F.col("text"), F.lit(" [drift]")))
                         .otherwise(F.col("text")))
            .withColumn("length",
                        F.when(F.col("doc_id") % 89 == 7,
                               F.lit(None).cast("long"))
                         .otherwise(F.col("length")))
            .withColumn("ts14",
                        F.when(F.col("doc_id") % 83 == 11,
                               F.lit("00000000000000"))
                         .otherwise(F.col("ts14"))))


_REPLICA_CTE = f"""SELECT url, warc_ts,
    CASE WHEN doc_id % 83 = 11 THEN '00000000000000' ELSE ts14 END AS ts14,
    host, path, mime, status,
    CASE WHEN doc_id % 89 = 7 THEN CAST(NULL AS BIGINT)
         ELSE length END AS length,
    digest,
    CASE WHEN doc_id % 101 = 5 THEN text || ' [drift]' ELSE text END AS text,
    lang, doc_id, n_cap
  FROM pages_cdx
  WHERE NOT {_DRIFT_DROP}"""

_PRELUDE = (f"WITH pages_cdx AS ({PAGES_CTE_DUCK}), "
            f"replica AS ({_REPLICA_CTE})")


def q_consistency_rowcount(spark, sf_dir):
    """Per-host row-count parity between the primary corpus and the
    drifted replica (RowCountValidator :146-166 severity ladder)."""
    pages = cdx_pages_view(spark, sf_dir)
    return CS.row_count_parity(pages, _replica(pages))


SQL_CONSISTENCY_ROWCOUNT = f"""{_PRELUDE},
p AS (SELECT host AS table_name, CAST(count(*) AS BIGINT) AS primary_count
      FROM pages_cdx GROUP BY 1),
r AS (SELECT host AS table_name, CAST(count(*) AS BIGINT) AS replica_count
      FROM replica GROUP BY 1),
j AS (
  SELECT coalesce(p.table_name, r.table_name) AS table_name,
    coalesce(primary_count, 0) AS primary_count,
    coalesce(replica_count, 0) AS replica_count
  FROM p FULL OUTER JOIN r ON p.table_name = r.table_name)
SELECT table_name, primary_count, replica_count,
  primary_count - replica_count AS difference,
  primary_count - replica_count = 0 AS is_consistent,
  CASE WHEN primary_count - replica_count = 0 THEN 'info'
       WHEN abs(primary_count - replica_count) > primary_count * 0.1
       THEN 'error'
       ELSE 'warning' END AS severity
FROM j"""


def q_consistency_hash(spark, sf_dir):
    """Record-level sha256 parity (DataHashValidator :203-347): only the
    inconsistent rows — hash mismatches and one-side-missing keys."""
    pages = cdx_pages_view(spark, sf_dir)
    return CS.record_hash_parity(pages, _replica(pages))


def _hash_sql(alias: str) -> str:
    pieces = " || '|' || ".join(
        f"'{f}=' || coalesce(CAST({alias}.{f} AS VARCHAR), 'null')"
        for f in CS.HASH_FIELDS)
    return f"sha256({pieces})"


SQL_CONSISTENCY_HASH = f"""{_PRELUDE},
p AS (SELECT url, ts14, {_hash_sql('pages_cdx')} AS primary_hash
      FROM pages_cdx),
r AS (SELECT url, ts14, {_hash_sql('replica')} AS replica_hash
      FROM replica),
j AS (
  SELECT coalesce(p.url, r.url) AS url, coalesce(p.ts14, r.ts14) AS ts14,
    primary_hash, replica_hash
  FROM p FULL OUTER JOIN r ON p.url = r.url AND p.ts14 = r.ts14)
SELECT url, ts14,
  CASE WHEN primary_hash IS NULL THEN 'missing_in_primary'
       WHEN replica_hash IS NULL THEN 'missing_in_replica'
       ELSE 'hash_mismatch' END AS issue,
  primary_hash, replica_hash
FROM j
WHERE primary_hash IS NULL OR replica_hash IS NULL
   OR primary_hash <> replica_hash"""


def q_consistency_rules(spark, sf_dir):
    """Business-rule violation counts over the drifted replica
    (BusinessRuleValidator._validate_page_rules :534-611)."""
    pages = cdx_pages_view(spark, sf_dir)
    return CS.page_business_rules(_replica(pages))


SQL_CONSISTENCY_RULES = f"""{_PRELUDE},
counts AS (
  SELECT
    CAST(count(*) FILTER (WHERE length(r.text) > 0 AND r.length IS NULL)
         AS BIGINT) AS c_info,
    CAST(count(*) FILTER (WHERE r.ts14 IS NULL
                             OR CAST(r.ts14 AS BIGINT) <= 0)
         AS BIGINT) AS c_error,
    CAST(count(*) FILTER (WHERE md5(r.text) <> r.digest)
         AS BIGINT) AS c_warning
  FROM replica r)
SELECT 'content_without_byte_count' AS rule, 'info' AS severity,
  c_info AS violation_count, c_info = 0 AS is_consistent FROM counts
UNION ALL
SELECT 'invalid_timestamp', 'error', c_error, c_error = 0 FROM counts
UNION ALL
SELECT 'digest_mismatch', 'warning', c_warning, c_warning = 0 FROM counts"""


# ---------------------------------------------------------------------------
# Entity disambiguation (wikidata_service.py)
# ---------------------------------------------------------------------------
# Fixture mention/KB synthesis from `documents`: the KB's labels are the
# distinct (word4, word5) bigrams; each document raises ONE mention whose
# surface form varies by doc_id % 4 — exact, extended (label-in-query),
# prefix word (query-in-label), and corrupted second word (Jaccard path) —
# the four branches of _calculate_match_score (:194-221). Word positions
# are 1-indexed identically in Spark element_at and DuckDB list indexing.


def _mention_base(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ws = F.split("text", " ")
    return (docs
            .filter(F.size(ws) >= 9)
            .select("doc_id", F.col("text").alias("context"),
                    F.element_at(ws, 4).alias("w1"),
                    F.element_at(ws, 5).alias("w2"),
                    F.element_at(ws, 9).alias("w3")))


def q_entity_link(spark, sf_dir):
    base = _mention_base(spark, sf_dir)
    from pyspark.sql import Window
    # Global-window qid assignment is fixture-only: the KB is a distinct
    # label dictionary (small by definition, broadcast downstream), not
    # the corpus — the single-partition sort is bounded by dictionary size.
    kb = (base.select(
              F.concat_ws(" ", "w1", "w2").alias("label"))
          .distinct()
          .withColumn("qid",
                      F.concat(F.lit("Q"),
                               F.row_number().over(
                                   Window.orderBy("label")).cast("string")))
          .withColumn("description",
                      F.concat(F.lit("about "),
                               F.element_at(F.split("label", " "), 1),
                               F.lit(" topic"))))
    mentions = base.select(
        "doc_id", "context",
        F.when(F.col("doc_id") % 4 == 0, F.concat_ws(" ", "w1", "w2"))
         .when(F.col("doc_id") % 4 == 1, F.concat_ws(" ", "w1", "w2", "w3"))
         .when(F.col("doc_id") % 4 == 2, F.col("w1"))
         .otherwise(F.concat_ws(" ", "w1", "w3")).alias("mention"))
    return EL.link_entities(mentions, kb.select("qid", "label",
                                                "description"))


SQL_ENTITY_LINK = """WITH base AS (
  SELECT doc_id, text AS context,
    string_split(text, ' ')[4] AS w1,
    string_split(text, ' ')[5] AS w2,
    string_split(text, ' ')[9] AS w3
  FROM documents
  WHERE len(string_split(text, ' ')) >= 9),
kb AS (
  SELECT 'Q' || CAST(row_number() OVER (ORDER BY label) AS VARCHAR) AS qid,
    label,
    'about ' || string_split(label, ' ')[1] || ' topic' AS description
  FROM (SELECT DISTINCT w1 || ' ' || w2 AS label FROM base)),
mentions AS (
  SELECT doc_id, context,
    CASE doc_id % 4
      WHEN 0 THEN w1 || ' ' || w2
      WHEN 1 THEN w1 || ' ' || w2 || ' ' || w3
      WHEN 2 THEN w1
      ELSE w1 || ' ' || w3 END AS mention
  FROM base),
cand AS (
  SELECT m.doc_id, m.mention, m.context, k.qid, k.label, k.description
  FROM mentions m JOIN kb k
    ON len(list_intersect(list_distinct(string_split(lower(m.mention), ' ')),
                          list_distinct(string_split(k.label, ' ')))) > 0),
scored0 AS (
  SELECT *,
    lower(mention) AS q,
    list_distinct(string_split(lower(mention), ' ')) AS wq,
    list_distinct(string_split(label, ' ')) AS wl,
    list_distinct(string_split(description, ' ')) AS wd,
    list_distinct(string_split(lower(context), ' ')) AS wc
  FROM cand),
scored1 AS (
  SELECT *,
    CASE WHEN label = q THEN 1.0
         WHEN contains(label, q) THEN 0.8
         WHEN contains(q, label) THEN 0.7
         ELSE CASE WHEN len(list_distinct(wq || wl)) > 0
                   THEN CAST(len(list_intersect(wq, wl)) AS DOUBLE)
                        / len(list_distinct(wq || wl))
                   ELSE 0.0 END END AS base_score
  FROM scored0),
scored AS (
  SELECT doc_id, mention, qid, label,
    CASE WHEN length(label) < 3 THEN b * 0.8 ELSE b END AS match_score,
    CASE WHEN len(wd) > 0
         THEN CAST(len(list_intersect(wd, wc)) AS DOUBLE) / len(wd)
         ELSE 0.0 END AS ctx_score
  FROM (SELECT *,
          CASE WHEN contains(description, q)
               THEN least(1.0, base_score + 0.1) ELSE base_score END AS b
        FROM scored1)),
totals AS (
  SELECT *, match_score * 0.7 + ctx_score * 0.3 AS total_score,
    row_number() OVER (PARTITION BY doc_id, mention
                       ORDER BY match_score * 0.7 + ctx_score * 0.3 DESC,
                                qid) AS rk_ctx,
    row_number() OVER (PARTITION BY doc_id, mention
                       ORDER BY match_score DESC, qid) AS rk_raw
  FROM scored),
best AS (
  SELECT t.*
  FROM totals t
  JOIN (SELECT doc_id, mention, max(total_score) AS mx
        FROM totals GROUP BY 1, 2) m
    ON t.doc_id = m.doc_id AND t.mention = m.mention
  WHERE (m.mx > 0.5 AND t.rk_ctx = 1)
     OR (m.mx <= 0.5 AND t.rk_raw = 1 AND t.match_score > 0.6))
SELECT doc_id, mention, qid, label,
  round(match_score, 6) AS match_score,
  round(total_score, 6) AS total_score
FROM best"""


# ---------------------------------------------------------------------------
# Audit security profile (audit_analysis.py:86-100)
# ---------------------------------------------------------------------------
def q_audit_security(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return AU.security_profile(events)


SQL_AUDIT_SECURITY = """WITH per_min AS (
  SELECT user_id, date_trunc('minute', ts) AS m,
    CAST(count(*) AS BIGINT) AS n,
    CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
      AS n_failed,
    CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
      AS n_bulk,
    CAST(count(*) FILTER (WHERE hour(ts) >= 22 OR hour(ts) < 6) AS BIGINT)
      AS n_ah
  FROM events GROUP BY 1, 2),
per_hour AS (
  SELECT user_id, date_trunc('hour', m) AS h,
    max(n) AS max_min, sum(n) AS n_hour,
    sum(n_failed) AS failed_hour, sum(n_bulk) AS bulk_hour,
    sum(n_ah) AS ah_hour
  FROM per_min GROUP BY 1, 2),
prof AS (
  SELECT user_id,
    CAST(sum(n_hour) AS BIGINT) AS total_events,
    CAST(sum(ah_hour) AS BIGINT) AS after_hours_events,
    CAST(max(max_min) AS BIGINT) AS max_events_per_minute,
    CAST(max(failed_hour) AS BIGINT) AS max_failed_per_hour,
    CAST(max(bulk_hour) AS BIGINT) AS max_bulk_per_hour
  FROM per_hour GROUP BY 1)
SELECT *,
  max_events_per_minute > 100 AS rate_anomaly,
  max_failed_per_hour > 10 AS failed_login_anomaly,
  max_bulk_per_hour > 5 AS bulk_anomaly,
  after_hours_events > 0 AS after_hours_activity
FROM prof"""


QUERIES = {
    "consistency_rowcount": q_consistency_rowcount,
    "consistency_hash": q_consistency_hash,
    "consistency_rules": q_consistency_rules,
    "entity_link": q_entity_link,
    "audit_security": q_audit_security,
}

ORACLES = {
    "consistency_rowcount": SQL_CONSISTENCY_ROWCOUNT,
    "consistency_hash": SQL_CONSISTENCY_HASH,
    "consistency_rules": SQL_CONSISTENCY_RULES,
    "entity_link": SQL_ENTITY_LINK,
    "audit_security": SQL_AUDIT_SECURITY,
}
