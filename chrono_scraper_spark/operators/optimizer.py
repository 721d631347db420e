"""Query-optimization rule matching + resource-pressure scoring.

Reference: ``backend/app/services/performance_optimization_engine.py``
— the six default ``OptimizationRule``s (``_initialize_default_rules``
:181-238: subquery→join, auto-LIMIT, ORDER-BY+LIMIT, EXISTS→join,
predicate pushdown, covering-index hint), rule matching semantics
(``OptimizationRule.matches`` :81-95: case-insensitive regex search +
per-rule metadata conditions — NOTE the reference compares the
metadata value against the condition's *expected value object*, so a
rule whose expected value is a lambda (auto_add_limit's
``estimated_rows``) fails whenever the key is present; kept faithful)
and ``SystemResourceState`` (:152-166: ``is_under_pressure`` OR-gate
and the three-way mean ``get_pressure_score``).

Planted inputs: a six-template query corpus keyed ``event_id % 6``,
one template per rule (the LIMIT-bearing template also exercises the
auto-LIMIT rule's negative lookahead); metadata keys
``estimated_rows`` present ⇔ qid even, ``has_covering_index`` =
``qid % 4 == 1``. Resource samples are planted per event
(cpu/memory/connections as modular functions of event_id) against the
default ``ResourceQuota`` (:103-110: cpu 80%, 4096 MB, 50
connections); pressure scores are exact milli (each member
``min(x·100000 // quota, 100000)``, mean ``// 3``).

Engine note: the rule regexes use Java-regex features (negative
lookahead in auto_add_limit, a backreference in predicate_pushdown)
that Spark evaluates natively; the DuckDB oracle (RE2) replays them
with equivalent formulations (prefix-match + NOT-contains-LIMIT;
captured-join-table dynamic pattern), which keeps the oracle an
independent implementation of the same semantics.

Scale shape: pure per-row JVM regex expressions — zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chrono_scraper_spark.operators.dashboard import _floor_div

#: (name, strategy, priority, java_regex) — :181-238, patterns verbatim
RULES = [
    ("subquery_to_join", "rewrite_subquery", 90,
     r"WHERE\s+(\w+)\s+IN\s*\(\s*SELECT\s+(\w+)\s+FROM\s+(\w+)"
     r"(?:\s+WHERE\s+([^)]+))?\s*\)"),
    ("auto_add_limit", "add_limits", 80,
     r"SELECT\s+.*\s+FROM\s+(?:pages_v2|scrape_pages|cdx_records)"
     r"(?:\s+WHERE\s+[^LIMIT]+)?(?!.*LIMIT)"),
    ("optimize_order_by_limit", "optimize_joins", 85,
     r"SELECT\s+.*\s+ORDER\s+BY\s+([^LIMIT]+)\s+LIMIT\s+(\d+)"),
    ("exists_to_join", "rewrite_subquery", 88,
     r"WHERE\s+EXISTS\s*\(\s*SELECT\s+1\s+FROM\s+(\w+)\s+WHERE\s+"
     r"(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*\)"),
    ("predicate_pushdown", "predicate_pushdown", 75,
     r"FROM\s+(\w+)\s+JOIN\s+(\w+)\s+ON\s+([^WHERE]+)\s+WHERE\s+"
     r"(\2\.\w+\s*[<>=!]+\s*[^AND\s]+)"),
    ("covering_index_hint", "index_hints", 70,
     r"SELECT\s+([\w,\s]+)\s+FROM\s+(\w+)\s+WHERE\s+(\w+)\s*="),
]

#: ResourceQuota defaults (:103-110)
QUOTA = dict(cpu_percent=80, memory_mb=4_096, max_connections=50)

#: the planted corpus — one rule-triggering template per slot
TEMPLATES = [
    "SELECT id FROM pages WHERE id IN "
    "(SELECT page_id FROM links WHERE score > 5)",
    "SELECT url, text FROM scrape_pages WHERE status = 200",
    # NB: the rule's [^LIMIT]+ class excludes the LETTERS l/i/m/t, so
    # the sort column must avoid them for the rule to fire at all
    "SELECT id FROM cdx_records ORDER BY score LIMIT 100",
    "SELECT name FROM users WHERE EXISTS "
    "(SELECT 1 FROM projects WHERE projects.user_id = users.id)",
    # NB: the pushdown rule allows no table aliases and its [^WHERE]+
    # class excludes the LETTERS w/h/e/r — the ON clause must avoid
    # them, hence docs/links
    "SELECT a FROM docs JOIN links ON docs.id = links.doc_id "
    "WHERE links.score = 10",
    "SELECT url FROM documents WHERE digest = 'abc'",
]


def planted_rule_corpus(events: DataFrame) -> DataFrame:
    """(qid, query, has_estimated_rows, has_covering_index) rows."""
    tmpl = F.element_at(F.array(*[F.lit(t) for t in TEMPLATES]),
                        (F.col("event_id") % 6 + 1).cast("int"))
    return events.select(
        F.col("event_id").alias("qid"),
        tmpl.alias("query"),
        (F.col("event_id") % 2 == 0).alias("has_estimated_rows"),
        (F.col("event_id") % 4 == 1).alias("has_covering_index"),
    )


def rule_matches(events: DataFrame) -> DataFrame:
    """One row per (query, rule): matched bool under the reference's
    ``matches`` semantics (:81-95) — pattern search (case-insensitive)
    plus the metadata-condition gates: auto_add_limit fails whenever
    ``estimated_rows`` is present (lambda-vs-value quirk),
    covering_index_hint requires ``has_covering_index == True``."""
    corpus = planted_rule_corpus(events)
    arms = []
    for name, strategy, priority, pattern in RULES:
        m = F.col("query").rlike("(?i)" + pattern)
        if name == "auto_add_limit":
            m = m & ~F.col("has_estimated_rows")
        elif name == "covering_index_hint":
            m = m & F.col("has_covering_index")
        arms.append(F.struct(
            F.lit(name).alias("rule"),
            F.lit(strategy).alias("strategy"),
            F.lit(priority).cast("int").alias("priority"),
            m.alias("matched")))
    return (
        corpus.select("qid",
                      F.explode(F.array(*arms)).alias("r"))
        .select("qid", "r.rule", "r.strategy", "r.priority", "r.matched")
    )


def resource_pressure(events: DataFrame) -> DataFrame:
    """Per-sample pressure evaluation (:152-166): the OR-gate
    ``is_under_pressure`` and the capped three-way mean score in
    milli-percent. Samples are planted per event (module docstring).
    """
    cpu = (F.col("event_id") * 7 % 120).cast("long")
    mem = (F.col("event_id") * 131 % 8_192).cast("long")
    conn = (F.col("event_id") % 80).cast("long")
    d = events.select(
        F.col("event_id").alias("sample_id"),
        cpu.alias("cpu_percent"), mem.alias("memory_mb"),
        conn.alias("active_connections"),
    )

    def member(col: str, quota: int) -> F.Column:
        return F.least(
            _floor_div(F.col(col) * 100_000, F.lit(quota)),
            F.lit(100_000).cast("long"))

    score = _floor_div(
        member("cpu_percent", QUOTA["cpu_percent"])
        + member("memory_mb", QUOTA["memory_mb"])
        + member("active_connections", QUOTA["max_connections"]),
        F.lit(3))
    return d.select(
        "sample_id", "cpu_percent", "memory_mb", "active_connections",
        ((F.col("cpu_percent") > QUOTA["cpu_percent"])
         | (F.col("memory_mb") > QUOTA["memory_mb"])
         | (F.col("active_connections") > QUOTA["max_connections"]))
        .alias("under_pressure"),
        score.alias("pressure_score_milli"),
    )
