"""Contract queries: SQL query analysis / routing
(query_analyzer.py — fallback parse, complexity, predicted plan,
optimization hints, PostgreSQL-vs-DuckDB recommendation).

The analyzed corpus is planted from ``events``: eight deterministic
SQL templates keyed by ``event_id % 8`` (point lookup, single join,
aggregation, window, CTE+join+agg, triple subquery, INSERT...SELECT,
four-way join), emitted by the same portable SQL in both engines so
the inputs are identical bytes. Spark side is
``operators/queryplan.py``; oracles replay the fallback parser and
the milli-exact factor chains in DuckDB.
"""

from __future__ import annotations

from chrono_scraper_spark.operators import queryplan as QP

# portable query-corpus generator (Spark SQL + DuckDB both accept it;
# distinct on qid%8-stable content so the corpus stays small)
_QGEN = """
SELECT event_id AS qid,
  CASE event_id % 8
    WHEN 0 THEN 'SELECT id, name FROM users WHERE id = '
                || CAST(event_id AS STRING)
    WHEN 1 THEN 'SELECT p.url, d.text FROM pages p INNER JOIN '
                || 'documents d ON p.doc_id = d.id WHERE p.host = ''h'
                || CAST(event_id % 40 AS STRING) || '.com'''
    WHEN 2 THEN 'SELECT host, COUNT(id), SUM(length) FROM pages '
                || 'GROUP BY host ORDER BY COUNT(id) DESC LIMIT 50'
    WHEN 3 THEN 'SELECT id, ROW_NUMBER() OVER (PARTITION BY host '
                || 'ORDER BY ts) FROM events'
    WHEN 4 THEN 'WITH t AS (SELECT host, COUNT(id) AS n FROM pages '
                || 'GROUP BY host) SELECT u.name, t.n FROM t '
                || 'LEFT JOIN users u ON t.host = u.name'
    WHEN 5 THEN 'SELECT url FROM pages WHERE doc_id IN (SELECT doc_id '
                || 'FROM terms WHERE term = ''q'
                || CAST(event_id % 10 AS STRING)
                || ''') AND id IN (SELECT page_id FROM events WHERE '
                || 'user_id = ' || CAST(event_id % 100 AS STRING)
                || ') AND host IN (SELECT host FROM pages)'
    WHEN 6 THEN 'INSERT INTO pages SELECT * FROM documents WHERE id > '
                || CAST(event_id AS STRING)
    ELSE 'SELECT a.id FROM pages a INNER JOIN events b ON a.id = '
         || 'b.page_id LEFT JOIN users c ON b.user_id = c.id '
         || 'RIGHT JOIN documents d ON a.doc_id = d.id '
         || 'WHERE a.status = 200'
  END AS query
FROM events
"""


def planted_queries(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/events.parquet") \
        .createOrReplaceTempView("events")
    return spark.sql(_QGEN)


def q_query_analyze(spark, sf_dir):
    """Structural analysis per query (query_analyzer.py:568-660)."""
    return QP.analyze(planted_queries(spark, sf_dir))


def q_query_plan_predict(spark, sf_dir):
    """Predicted plan + DB recommendation (:365-440, :662-707)."""
    return QP.predict(planted_queries(spark, sf_dir))


def q_query_scan_types(spark, sf_dir):
    """Per-table scan-type prediction (:443-456)."""
    return QP.scan_types(planted_queries(spark, sf_dir))


def q_query_hints(spark, sf_dir):
    """Optimization hints + risk factors (:472-530)."""
    return QP.suggest(planted_queries(spark, sf_dir))


# ---------------------------------------------------------------------------
# oracles — the fallback parser + milli factor chains in DuckDB
# ---------------------------------------------------------------------------
_KW = ", ".join(f"'{k}'" for k in QP.SQL_KEYWORDS)
_AG = ", ".join(f"'{k}'" for k in QP.AGG_FUNCS)
_WN = ", ".join(f"'{k}'" for k in QP.WINDOW_FUNCS)
_JT = ", ".join(f"'{k}'" for k in QP.JOIN_TYPES)

_ROWS_CASE = ("CASE t WHEN 'users' THEN 10000 WHEN 'pages' THEN 2000000 "
              "WHEN 'documents' THEN 120000 WHEN 'events' THEN 500000 "
              "WHEN 'terms' THEN 1500000 ELSE 0 END")
_IDX_CASE = "t IN ('users', 'pages')"

_FEATS_CTES = f"""qgen AS ({_QGEN}),
f AS (
  SELECT qid, upper(query) AS uq FROM qgen),
feats AS (
  SELECT qid,
    list_sort(list_distinct(list_transform(
      flatten([
        regexp_extract_all(uq, 'FROM\\s+([A-Z_][A-Z0-9_]*)', 1),
        regexp_extract_all(uq, 'JOIN\\s+([A-Z_][A-Z0-9_]*)', 1),
        regexp_extract_all(uq, 'INTO\\s+([A-Z_][A-Z0-9_]*)', 1),
        regexp_extract_all(uq, 'UPDATE\\s+([A-Z_][A-Z0-9_]*)', 1)]),
      t -> lower(t)))) AS tables,
    list_sort(list_filter([{_KW}], k -> contains(uq, k))) AS ops,
    list_sort(list_filter([{_AG}], k -> contains(uq, k || '(')))
      AS aggs,
    list_sort(list_filter([{_WN}], k -> contains(uq, k || '(')))
      AS wins,
    CAST(len(list_filter([{_JT}], k -> contains(uq, k))) AS INT)
      AS join_count,
    CAST((length(uq) - length(replace(uq, 'SELECT', ''))) // 6 - 1
         AS INT) AS subquery_count,
    starts_with(trim(uq), 'WITH') AS has_cte
  FROM f),
sc AS (
  SELECT *,
    CAST(len(tables) + join_count * 2 + subquery_count * 3
         + len(aggs) + len(wins) * 4
         + CASE WHEN has_cte THEN 3 ELSE 0 END AS INT)
      AS complexity_score
  FROM feats)"""

SQL_QUERY_ANALYZE = f"""WITH {_FEATS_CTES}
SELECT qid,
  CASE WHEN list_contains(ops, 'INSERT') THEN 'insert'
       WHEN list_contains(ops, 'UPDATE') THEN 'update'
       WHEN list_contains(ops, 'DELETE') THEN 'delete'
       WHEN len(aggs) > 0 THEN 'analytics'
       WHEN len(wins) > 0 THEN 'advanced_analytics'
       WHEN join_count > 2 THEN 'complex_select'
       ELSE 'simple_select' END AS query_type,
  CASE WHEN complexity_score <= 2 THEN 'simple'
       WHEN complexity_score <= 6 THEN 'moderate'
       WHEN complexity_score <= 12 THEN 'complex'
       ELSE 'very_complex' END AS complexity,
  complexity_score,
  CAST(len(tables) AS INT) AS table_count,
  join_count, subquery_count,
  CAST(len(aggs) AS INT) AS agg_count,
  CAST(len(wins) AS INT) AS window_count,
  has_cte,
  array_to_string(tables, '|') AS tables,
  array_to_string(ops, '|') AS operations
FROM sc"""

# the predictor's factor chain, step by step (query_analyzer.py order)
_PLAN_CTES = f"""{_FEATS_CTES},
p0 AS (
  SELECT *,
    CAST(coalesce(list_sum(list_transform(tables,
         t -> {_ROWS_CASE})), 0) AS BIGINT) AS total_rows,
    list_contains(ops, 'SELECT') AND join_count > 0 AS j_on,
    CAST(floor(sqrt(CAST(join_count AS DOUBLE) ** 3) * 1000)
         AS BIGINT) AS jf,
    CAST(len(aggs) * 1200 AS BIGINT) AS af,
    CAST(len(wins) * 2000 AS BIGINT) AS wf,
    CAST(subquery_count * 1500 AS BIGINT) AS sf,
    list_contains(ops, 'INSERT') OR list_contains(ops, 'UPDATE')
      OR list_contains(ops, 'DELETE') AS is_write
  FROM sc),
p1 AS (
  SELECT *,
    CASE WHEN j_on THEN (1000 + total_rows) * jf // 1000
         ELSE 1000 + total_rows END AS c1,
    CASE WHEN j_on THEN CAST(100 AS BIGINT) * jf // 1000
         ELSE CAST(100 AS BIGINT) END AS d1,
    CASE WHEN j_on THEN CAST(10000 AS BIGINT) * jf // 1000
         ELSE CAST(10000 AS BIGINT) END AS m1,
    CASE WHEN j_on AND total_rows > 0
         THEN least(total_rows * join_count, total_rows * 10)
         ELSE CAST(100 AS BIGINT) END AS r1
  FROM p0),
p2 AS (
  SELECT *,
    CASE WHEN len(aggs) > 0 THEN c1 * af // 1000 ELSE c1 END AS c2,
    CASE WHEN len(aggs) > 0 THEN d1 * af // 1000 ELSE d1 END AS d2,
    CASE WHEN len(aggs) > 0 THEN greatest(r1 // 10, 1) ELSE r1 END AS r2
  FROM p1),
p3 AS (
  SELECT *,
    CASE WHEN len(wins) > 0 THEN c2 * wf // 1000 ELSE c2 END AS c3,
    CASE WHEN len(wins) > 0 THEN d2 * wf // 1000 ELSE d2 END AS d3,
    CASE WHEN len(wins) > 0 THEN m1 * wf // 1000 ELSE m1 END AS m3
  FROM p2),
p4 AS (
  SELECT *,
    CASE WHEN subquery_count > 0 THEN c3 * sf // 1000 ELSE c3 END AS c4,
    CASE WHEN subquery_count > 0 THEN d3 * sf // 1000 ELSE d3 END AS d4
  FROM p3),
p5 AS (
  SELECT *,
    CASE WHEN has_cte THEN c4 * 1300 // 1000 ELSE c4 END AS c5,
    CASE WHEN has_cte THEN d4 * 1300 // 1000 ELSE d4 END AS d5,
    CASE WHEN has_cte THEN m3 * 1500 // 1000 ELSE m3 END AS m5
  FROM p4),
plan AS (
  SELECT qid, tables, ops, aggs, wins, join_count, subquery_count,
    has_cte, complexity_score,
    CASE WHEN is_write THEN c5 * 1200 // 1000 ELSE c5 END AS cost_milli,
    r2 AS estimated_rows,
    CASE WHEN is_write THEN d5 * 1100 // 1000 ELSE d5 END
      AS duration_milli,
    m5 AS memory_milli_mb,
    is_write
  FROM p5)"""

SQL_QUERY_PLAN_PREDICT = f"""WITH {_PLAN_CTES},
scored AS (
  SELECT *,
    500 + CASE WHEN is_write THEN 400 ELSE 0 END
        + CASE WHEN len(tables) = 1 AND len(aggs) = 0
               THEN 200 ELSE 0 END
        + CASE WHEN duration_milli < 1000 THEN 100 ELSE 0 END AS pg,
    500 + CASE WHEN len(aggs) > 0 THEN 300 ELSE 0 END
        + CASE WHEN len(wins) > 0 THEN 400 ELSE 0 END
        + CASE WHEN complexity_score > 6 THEN 200 ELSE 0 END
        + CASE WHEN estimated_rows > 10000 THEN 200 ELSE 0 END
        + CASE WHEN duration_milli > 5000 THEN 300 ELSE 0 END AS duck
  FROM plan)
SELECT qid, cost_milli, estimated_rows, duration_milli, memory_milli_mb,
  CASE WHEN pg > duck THEN 'postgresql' ELSE 'duckdb' END
    AS recommended_database,
  CAST(least(abs(pg - duck), 900) AS BIGINT) AS confidence_milli
FROM scored"""

SQL_QUERY_SCAN_TYPES = f"""WITH {_FEATS_CTES}
SELECT qid, unnest(tables) AS table_name,
  CASE WHEN join_count > 2 THEN 'nested_loop'
       WHEN len(aggs) > 0 THEN 'hash_aggregate'
       ELSE 'sequential_scan' END AS scan_type
FROM sc"""

SQL_QUERY_HINTS = f"""WITH {_PLAN_CTES},
items AS (
  SELECT qid,
    list_sort(list_distinct(flatten([
      CASE WHEN duration_milli > 10000
           THEN ['risk|Query estimated to take >10 seconds']
           ELSE [] END,
      CASE WHEN duration_milli > 10000 AND join_count > 0
           THEN ['hint|optimize_join_order', 'hint|add_index']
           ELSE [] END,
      CASE WHEN memory_milli_mb > 1000000
           THEN ['risk|High memory usage predicted (>1GB)',
                 'hint|limit_result_size'] ELSE [] END,
      CASE WHEN estimated_rows > 100000
           THEN ['risk|Large result set (>100k rows)',
                 'hint|limit_result_size'] ELSE [] END,
      CASE WHEN estimated_rows > 100000 AND NOT
                len(list_filter(ops, o -> contains(o, 'LIMIT'))) > 0
           THEN ['risk|No LIMIT clause for large result set']
           ELSE [] END,
      CASE WHEN join_count > 3
           THEN ['hint|optimize_join_order',
                 'risk|Complex join pattern detected'] ELSE [] END,
      CASE WHEN subquery_count > 2
           THEN ['hint|rewrite_subquery',
                 'risk|Multiple subqueries may impact performance']
           ELSE [] END,
      CASE WHEN has_cte AND len(aggs) > 0
           THEN ['hint|use_materialized_view'] ELSE [] END,
      flatten(list_transform(tables,
        t -> CASE WHEN {_ROWS_CASE} > 1000000
                  THEN CASE WHEN {_IDX_CASE}
                            THEN ['hint|partition_table']
                            ELSE ['hint|partition_table',
                                  'hint|add_index'] END
                  ELSE [] END))
    ]))) AS its
  FROM plan)
SELECT qid, string_split(item, '|')[1] AS kind,
  string_split(item, '|')[2] AS item
FROM (SELECT qid, unnest(its) AS item FROM items)"""


QUERIES = {
    "query_analyze": q_query_analyze,
    "query_plan_predict": q_query_plan_predict,
    "query_scan_types": q_query_scan_types,
    "query_hints": q_query_hints,
}

ORACLES = {
    "query_analyze": SQL_QUERY_ANALYZE,
    "query_plan_predict": SQL_QUERY_PLAN_PREDICT,
    "query_scan_types": SQL_QUERY_SCAN_TYPES,
    "query_hints": SQL_QUERY_HINTS,
}
