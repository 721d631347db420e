"""Contract queries: optimization-rule matching + resource pressure
(performance_optimization_engine.py).

Spark evaluates the reference's Java-regex rule patterns verbatim
(including the negative lookahead and the backreference); the DuckDB
oracle (RE2 — no lookaround/backrefs) replays them with equivalent
formulations that are exact on the planted corpus: the auto-LIMIT
lookahead becomes prefix-match AND NOT contains-LIMIT (LIMIT only
ever follows FROM in the templates), and the predicate-pushdown
backreference becomes a dynamic pattern built from the captured join
table. Independent implementations, same semantics.
"""

from __future__ import annotations

from chrono_scraper_spark.operators import optimizer as OZ


def _ev(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_opt_rule_match(spark, sf_dir):
    """(query, rule) match matrix
    (performance_optimization_engine.py:81-95, :181-238)."""
    return OZ.rule_matches(_ev(spark, sf_dir))


def q_resource_pressure(spark, sf_dir):
    """is_under_pressure + milli pressure score (:152-166)."""
    return OZ.resource_pressure(_ev(spark, sf_dir))


_TEMPLATES_SQL = ", ".join(
    "'" + t.replace("'", "''") + "'" for t in OZ.TEMPLATES)

_CORPUS_CTE = f"""corpus AS (
  SELECT event_id AS qid,
    [{_TEMPLATES_SQL}][CAST(event_id % 6 + 1 AS INT)] AS query,
    event_id % 2 = 0 AS has_estimated_rows,
    event_id % 4 = 1 AS has_covering_index
  FROM events)"""

# RE2-expressible equivalents of each Java pattern (exact on this
# corpus; see module docstring)
_ARM = """SELECT qid, '{name}' AS rule, '{strategy}' AS strategy,
  CAST({priority} AS INT) AS priority, {matched} AS matched
FROM corpus"""

_ARMS = " UNION ALL ".join([
    _ARM.format(
        name="subquery_to_join", strategy="rewrite_subquery",
        priority=90,
        matched=(r"regexp_matches(query, 'WHERE\s+(\w+)\s+IN\s*\(\s*"
                 r"SELECT\s+(\w+)\s+FROM\s+(\w+)(\s+WHERE\s+([^)]+))?"
                 r"\s*\)', 'i')")),
    _ARM.format(
        name="auto_add_limit", strategy="add_limits", priority=80,
        matched=(r"regexp_matches(query, 'SELECT\s+.*\s+FROM\s+"
                 r"(pages_v2|scrape_pages|cdx_records)', 'i') AND NOT "
                 r"regexp_matches(query, 'LIMIT', 'i') AND NOT "
                 r"has_estimated_rows")),
    _ARM.format(
        name="optimize_order_by_limit", strategy="optimize_joins",
        priority=85,
        matched=(r"regexp_matches(query, 'SELECT\s+.*\s+ORDER\s+BY\s+"
                 r"([^LIMIT]+)\s+LIMIT\s+(\d+)', 'i')")),
    _ARM.format(
        name="exists_to_join", strategy="rewrite_subquery", priority=88,
        matched=(r"regexp_matches(query, 'WHERE\s+EXISTS\s*\(\s*SELECT"
                 r"\s+1\s+FROM\s+(\w+)\s+WHERE\s+(\w+)\.(\w+)\s*=\s*"
                 r"(\w+)\.(\w+)\s*\)', 'i')")),
    _ARM.format(
        name="predicate_pushdown", strategy="predicate_pushdown",
        priority=75,
        matched=(r"len(regexp_extract(query, 'FROM\s+\w+\s+JOIN\s+"
                 r"(\w+)\s+ON', 1)) > 0 AND regexp_matches(query, "
                 r"'FROM\s+\w+\s+JOIN\s+\w+\s+ON\s+[^WHERE]+\s+WHERE"
                 r"\s+' || regexp_extract(query, 'FROM\s+\w+\s+JOIN"
                 r"\s+(\w+)\s+ON', 1) || '\.\w+\s*[<>=!]+\s*"
                 r"[^AND\s]+', 'i')")),
    _ARM.format(
        name="covering_index_hint", strategy="index_hints", priority=70,
        matched=(r"regexp_matches(query, 'SELECT\s+([\w,\s]+)\s+FROM"
                 r"\s+(\w+)\s+WHERE\s+(\w+)\s*=', 'i') AND "
                 r"has_covering_index")),
])

SQL_OPT_RULE_MATCH = f"WITH {_CORPUS_CTE}\n{_ARMS}"


SQL_RESOURCE_PRESSURE = """WITH s AS (
  SELECT event_id AS sample_id,
    CAST(event_id * 7 % 120 AS BIGINT) AS cpu_percent,
    CAST(event_id * 131 % 8192 AS BIGINT) AS memory_mb,
    CAST(event_id % 80 AS BIGINT) AS active_connections
  FROM events)
SELECT sample_id, cpu_percent, memory_mb, active_connections,
  cpu_percent > 80 OR memory_mb > 4096 OR active_connections > 50
    AS under_pressure,
  (least(cpu_percent * 100000 // 80, 100000)
   + least(memory_mb * 100000 // 4096, 100000)
   + least(active_connections * 100000 // 50, 100000)) // 3
    AS pressure_score_milli
FROM s"""


QUERIES = {
    "opt_rule_match": q_opt_rule_match,
    "resource_pressure": q_resource_pressure,
}

ORACLES = {
    "opt_rule_match": SQL_OPT_RULE_MATCH,
    "resource_pressure": SQL_RESOURCE_PRESSURE,
}
