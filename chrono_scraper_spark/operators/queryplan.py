"""SQL query analysis: complexity, cost prediction, hints, DB routing.

Reference: ``backend/app/services/query_analyzer.py`` — the regex
fallback parser (``SQLParser._fallback_parse`` :301-358; sqlparse is
optional there and absent here, so the fallback IS the semantics),
complexity scoring (``_determine_complexity`` :620-641), query-type
classification (``_classify_query_type`` :643-660), the performance
predictor's factor chain (``predict_performance`` :365-440 applied in
the reference's exact order: joins → aggregations → windows →
subqueries → CTE → writes), scan-type heuristics
(``_predict_scan_types`` :443-456), optimization hints + risk strings
(``OptimizationSuggester.suggest_optimizations`` :472-530) and the
PostgreSQL-vs-DuckDB recommendation scoring
(``_recommend_database`` :662-707).

Fidelity notes (all cited to the fallback parser, which is quirky on
purpose):

* operations are *substring* hits of the keyword set (:318-321), so
  ``BY`` matches inside ``GROUP BY`` and ``ORDER`` inside a window's
  ``ORDER BY``;
* ``joins`` counts which of the five join-type strings appear
  (:337-340) — ``JOIN`` is a substring of ``INNER JOIN``, so a query
  with one inner join has join_count 2;
* subqueries = occurrences of ``SELECT`` minus one (:334).

The reference's float factors are replayed as exact integer
milli-units with floor after every multiplication (the repo's
hash-stable convention); ``len(joins) ** 1.5`` becomes
``floor(sqrt(j³)·1000)``. Table statistics are planted per table name
(``PLANTED_STATS``) — the reference reads live pg_class estimates
(:157-199).

Scale shape: pure per-row JVM expressions (regexp + array lambdas),
zero shuffle; the hint/risk emission is one explode of a built array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chrono_scraper_spark.operators.dashboard import _floor_div

SQL_KEYWORDS = [
    "SELECT", "FROM", "WHERE", "JOIN", "INNER", "LEFT", "RIGHT", "OUTER",
    "GROUP", "BY", "HAVING", "ORDER", "LIMIT", "OFFSET", "UNION", "EXCEPT",
    "INTERSECT", "WITH", "INSERT", "UPDATE", "DELETE", "CREATE", "DROP",
    "ALTER", "INDEX", "VIEW", "TRIGGER", "FUNCTION", "PROCEDURE",
]
AGG_FUNCS = ["COUNT", "SUM", "AVG", "MIN", "MAX", "STDDEV", "VARIANCE"]
WINDOW_FUNCS = ["ROW_NUMBER", "RANK", "DENSE_RANK", "NTILE", "LAG",
                "LEAD", "FIRST_VALUE", "LAST_VALUE", "NTH_VALUE"]
JOIN_TYPES = ["INNER JOIN", "LEFT JOIN", "RIGHT JOIN", "OUTER JOIN",
              "JOIN"]
#: table-extraction regexes (:325-331), applied to the uppercased query
TABLE_PATTERNS = [r"FROM\s+([A-Z_][A-Z0-9_]*)",
                  r"JOIN\s+([A-Z_][A-Z0-9_]*)",
                  r"INTO\s+([A-Z_][A-Z0-9_]*)",
                  r"UPDATE\s+([A-Z_][A-Z0-9_]*)"]

#: planted TableStatistics (row_count, has_indexes) — the reference
#: estimates these from pg_class (:157-199); unknown tables contribute
#: nothing (stats None, :382-386)
PLANTED_STATS = {
    "users": (10_000, True),
    "pages": (2_000_000, True),
    "documents": (120_000, False),
    "events": (500_000, False),
    "terms": (1_500_000, False),
}


def _arr(vals: list[str]) -> F.Column:
    return F.array(*[F.lit(v) for v in vals])


def _present(upper: F.Column, needles: list[str],
             suffix: str = "") -> F.Column:
    """Array of the needles substring-present in ``upper`` (the
    fallback parser's ``if x in query_upper`` loops)."""
    return F.filter(_arr(needles),
                    lambda k: upper.contains(F.concat(k, F.lit(suffix)))
                    if suffix else upper.contains(k))


def parse_features(queries: DataFrame,
                   query_col: str = "query") -> DataFrame:
    """Structural features per query (``_fallback_parse`` :301-358):
    operations / tables / aggregations / window functions as sorted
    ``|``-joined strings with counts, join_count, subquery_count,
    has_cte.
    """
    q = F.col(query_col)
    upper = F.upper(q)
    tables = F.array_sort(F.array_distinct(F.transform(
        F.flatten(F.array(*[
            F.regexp_extract_all(upper, F.lit(p), 1)
            for p in TABLE_PATTERNS])),
        lambda t: F.lower(t))))
    ops = F.array_sort(_present(upper, SQL_KEYWORDS))
    aggs = F.array_sort(_present(upper, AGG_FUNCS, "("))
    wins = F.array_sort(_present(upper, WINDOW_FUNCS, "("))
    joins = _present(upper, JOIN_TYPES)
    n_sel = _floor_div(
        F.length(upper) - F.length(F.replace(upper, F.lit("SELECT"),
                                             F.lit(""))),
        F.lit(6))
    return queries.select(
        "*",
        tables.alias("_tables"), ops.alias("_ops"),
        aggs.alias("_aggs"), wins.alias("_wins"),
        F.size(joins).cast("int").alias("join_count"),
        (n_sel - 1).cast("int").alias("subquery_count"),
        F.startswith(F.trim(upper), F.lit("WITH")).alias("has_cte"),
    )


def _score(f: DataFrame) -> F.Column:
    """Complexity score (:622-636)."""
    return (
        F.size("_tables") + F.size(F.col("_wins")) * 4
        + F.col("join_count") * 2 + F.col("subquery_count") * 3
        + F.size("_aggs") + F.when(F.col("has_cte"), 3).otherwise(0)
    )


def analyze(queries: DataFrame, query_col: str = "query") -> DataFrame:
    """Per-query structural analysis row (``analyze_query`` :568-617):
    type (:643-660), complexity class (:637-641) + score, feature
    counts, sorted table/operation lists."""
    f = parse_features(queries, query_col)
    score = _score(f).cast("int")
    qtype = (
        F.when(F.array_contains("_ops", "INSERT"), "insert")
        .when(F.array_contains("_ops", "UPDATE"), "update")
        .when(F.array_contains("_ops", "DELETE"), "delete")
        .when(F.size("_aggs") > 0, "analytics")
        .when(F.size("_wins") > 0, "advanced_analytics")
        .when(F.col("join_count") > 2, "complex_select")
        .otherwise("simple_select")
    )
    complexity = (
        F.when(score <= 2, "simple")
        .when(score <= 6, "moderate")
        .when(score <= 12, "complex")
        .otherwise("very_complex")
    )
    return f.select(
        "qid", qtype.alias("query_type"), complexity.alias("complexity"),
        score.alias("complexity_score"),
        F.size("_tables").cast("int").alias("table_count"),
        "join_count", "subquery_count",
        F.size("_aggs").cast("int").alias("agg_count"),
        F.size("_wins").cast("int").alias("window_count"),
        "has_cte",
        F.array_join("_tables", "|").alias("tables"),
        F.array_join("_ops", "|").alias("operations"),
    )


def _planted_rows(table: F.Column) -> F.Column:
    c = F.when(F.lit(False), None)
    for t, (rows, _idx) in PLANTED_STATS.items():
        c = c.when(table == t, F.lit(rows))
    return c.otherwise(F.lit(0)).cast("long")


def _with_plan(f: DataFrame) -> DataFrame:
    """The predictor's factor chain (:365-440) in exact milli ints,
    applied in the reference's order."""
    total_rows = F.aggregate(
        F.col("_tables"), F.lit(0).cast("long"),
        lambda acc, t: acc + _planted_rows(t))
    d = f.withColumn("_total_rows", total_rows)
    # base (:372-376) + per-table scale (:381-386): 1.0 + rows/1000
    d = d.withColumns({
        "_cost": (F.lit(1_000) + F.col("_total_rows")).cast("long"),
        "_rows": F.lit(100).cast("long"),
        "_dur": F.lit(100).cast("long"),        # 0.1 s in milli
        "_mem": F.lit(10_000).cast("long"),     # 10 MB in milli
    })
    # joins (:389-399): factor j^1.5 = floor(sqrt(j³)·1000)
    jf = F.floor(F.sqrt((F.col("join_count").cast("long") ** 3)
                        .cast("double")) * 1_000).cast("long")
    has_join = (F.array_contains("_ops", "SELECT")
                & (F.col("join_count") > 0))
    d = d.withColumns({
        "_cost": F.when(has_join, _floor_div(F.col("_cost") * jf,
                                             F.lit(1_000)))
        .otherwise(F.col("_cost")),
        "_dur": F.when(has_join, _floor_div(F.col("_dur") * jf,
                                            F.lit(1_000)))
        .otherwise(F.col("_dur")),
        "_mem": F.when(has_join, _floor_div(F.col("_mem") * jf,
                                            F.lit(1_000)))
        .otherwise(F.col("_mem")),
        "_rows": F.when(
            has_join & (F.col("_total_rows") > 0),
            F.least(F.col("_total_rows") * F.col("join_count"),
                    F.col("_total_rows") * 10))
        .otherwise(F.col("_rows")),
    })
    # aggregations (:402-406): n·1.2, rows → max(rows//10, 1)
    af = F.size("_aggs").cast("long") * 1_200
    has_agg = F.size("_aggs") > 0
    d = d.withColumns({
        "_cost": F.when(has_agg, _floor_div(F.col("_cost") * af,
                                            F.lit(1_000)))
        .otherwise(F.col("_cost")),
        "_dur": F.when(has_agg, _floor_div(F.col("_dur") * af,
                                           F.lit(1_000)))
        .otherwise(F.col("_dur")),
        "_rows": F.when(has_agg,
                        F.greatest(_floor_div(F.col("_rows"),
                                              F.lit(10)), F.lit(1)))
        .otherwise(F.col("_rows")),
    })
    # window functions (:409-413): n·2
    wf = F.size("_wins").cast("long") * 2_000
    has_win = F.size("_wins") > 0
    d = d.withColumns({
        "_cost": F.when(has_win, _floor_div(F.col("_cost") * wf,
                                            F.lit(1_000)))
        .otherwise(F.col("_cost")),
        "_dur": F.when(has_win, _floor_div(F.col("_dur") * wf,
                                           F.lit(1_000)))
        .otherwise(F.col("_dur")),
        "_mem": F.when(has_win, _floor_div(F.col("_mem") * wf,
                                           F.lit(1_000)))
        .otherwise(F.col("_mem")),
    })
    # subqueries (:416-419): n·1.5
    sf = F.col("subquery_count").cast("long") * 1_500
    has_sub = F.col("subquery_count") > 0
    d = d.withColumns({
        "_cost": F.when(has_sub, _floor_div(F.col("_cost") * sf,
                                            F.lit(1_000)))
        .otherwise(F.col("_cost")),
        "_dur": F.when(has_sub, _floor_div(F.col("_dur") * sf,
                                           F.lit(1_000)))
        .otherwise(F.col("_dur")),
    })
    # CTE (:422-425): ×1.3 / ×1.3 / ×1.5
    d = d.withColumns({
        "_cost": F.when(F.col("has_cte"),
                        _floor_div(F.col("_cost") * 1_300, F.lit(1_000)))
        .otherwise(F.col("_cost")),
        "_dur": F.when(F.col("has_cte"),
                       _floor_div(F.col("_dur") * 1_300, F.lit(1_000)))
        .otherwise(F.col("_dur")),
        "_mem": F.when(F.col("has_cte"),
                       _floor_div(F.col("_mem") * 1_500, F.lit(1_000)))
        .otherwise(F.col("_mem")),
    })
    # writes (:428-430): cost ×1.2, duration ×1.1
    is_write = (F.array_contains("_ops", "INSERT")
                | F.array_contains("_ops", "UPDATE")
                | F.array_contains("_ops", "DELETE"))
    return d.withColumns({
        "_cost": F.when(is_write,
                        _floor_div(F.col("_cost") * 1_200, F.lit(1_000)))
        .otherwise(F.col("_cost")),
        "_dur": F.when(is_write,
                       _floor_div(F.col("_dur") * 1_100, F.lit(1_000)))
        .otherwise(F.col("_dur")),
    })


def predict(queries: DataFrame, query_col: str = "query") -> DataFrame:
    """Predicted plan + database recommendation per query
    (:365-440 and :662-707), every float in exact milli."""
    d = _with_plan(parse_features(queries, query_col))
    score = _score(d)
    complexity_hi = score > 6          # complex or very_complex
    is_write = (F.array_contains("_ops", "INSERT")
                | F.array_contains("_ops", "UPDATE")
                | F.array_contains("_ops", "DELETE"))
    pg = (F.lit(500)
          + F.when(is_write, 400).otherwise(0)
          + F.when((F.size("_tables") == 1) & (F.size("_aggs") == 0),
                   200).otherwise(0)
          + F.when(F.col("_dur") < 1_000, 100).otherwise(0))
    duck = (F.lit(500)
            + F.when(F.size("_aggs") > 0, 300).otherwise(0)
            + F.when(F.size("_wins") > 0, 400).otherwise(0)
            + F.when(complexity_hi, 200).otherwise(0)
            + F.when(F.col("_rows") > 10_000, 200).otherwise(0)
            + F.when(F.col("_dur") > 5_000, 300).otherwise(0))
    return d.select(
        "qid",
        F.col("_cost").alias("cost_milli"),
        F.col("_rows").alias("estimated_rows"),
        F.col("_dur").alias("duration_milli"),
        F.col("_mem").alias("memory_milli_mb"),
        F.when(pg > duck, "postgresql").otherwise("duckdb")
        .alias("recommended_database"),
        F.least(F.abs(pg - duck), F.lit(900)).cast("long")
        .alias("confidence_milli"),
    )


def scan_types(queries: DataFrame, query_col: str = "query"
               ) -> DataFrame:
    """Per (query, table) scan-type prediction (:443-456)."""
    f = parse_features(queries, query_col)
    st = (
        F.when(F.col("join_count") > 2, "nested_loop")
        .when(F.size("_aggs") > 0, "hash_aggregate")
        .otherwise("sequential_scan")
    )
    return (
        f.select("qid", F.explode("_tables").alias("table_name"),
                 F.col("join_count"), F.col("_aggs"))
        .select("qid", "table_name", st.alias("scan_type"))
    )


def suggest(queries: DataFrame, query_col: str = "query") -> DataFrame:
    """Hint + risk rows per query (``suggest_optimizations``
    :472-530), deduplicated, one row per (qid, kind, item)."""
    d = _with_plan(parse_features(queries, query_col))
    slow = F.col("_dur") > 10_000
    heavy = F.col("_mem") > 1_000_000
    big = F.col("_rows") > 100_000
    has_join = F.col("join_count") > 0
    no_limit = ~F.exists(F.col("_ops"),
                         lambda o: o.contains(F.lit("LIMIT")))
    table_hints = F.flatten(F.transform(
        F.col("_tables"),
        lambda t: F.concat(
            F.when(_planted_rows(t) > 1_000_000,
                   F.array(F.lit("hint|partition_table")))
            .otherwise(F.array().cast("array<string>")),
            F.when((_planted_rows(t) > 1_000_000)
                   & (~_planted_indexed(t)),
                   F.array(F.lit("hint|add_index")))
            .otherwise(F.array().cast("array<string>")))))
    items = F.concat(
        _flag(slow, "risk|Query estimated to take >10 seconds"),
        _flag(slow & has_join, "hint|optimize_join_order"),
        _flag(slow & has_join, "hint|add_index"),
        _flag(heavy, "risk|High memory usage predicted (>1GB)"),
        _flag(heavy, "hint|limit_result_size"),
        _flag(big, "risk|Large result set (>100k rows)"),
        _flag(big, "hint|limit_result_size"),
        _flag(big & no_limit, "risk|No LIMIT clause for large result set"),
        _flag(F.col("join_count") > 3, "hint|optimize_join_order"),
        _flag(F.col("join_count") > 3, "risk|Complex join pattern detected"),
        _flag(F.col("subquery_count") > 2, "hint|rewrite_subquery"),
        _flag(F.col("subquery_count") > 2,
              "risk|Multiple subqueries may impact performance"),
        _flag(F.col("has_cte") & (F.size("_aggs") > 0),
              "hint|use_materialized_view"),
        table_hints,
    )
    return (
        d.select("qid",
                 F.explode(F.array_sort(F.array_distinct(items)))
                 .alias("_item"))
        .select("qid",
                F.split("_item", r"\|").getItem(0).alias("kind"),
                F.split("_item", r"\|").getItem(1).alias("item"))
    )


def _flag(cond: F.Column, item: str) -> F.Column:
    return (F.when(cond, F.array(F.lit(item)))
            .otherwise(F.array().cast("array<string>")))


def _planted_indexed(table: F.Column) -> F.Column:
    c = F.lit(False)
    for t, (_rows, idx) in PLANTED_STATS.items():
        if idx:
            c = c | (table == t)
    return c
