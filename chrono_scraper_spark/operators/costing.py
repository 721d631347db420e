"""Crawl cost estimation: the reference's pre-flight cost model.

Reference: ``backend/app/services/cost_estimation.py`` —
``CostEstimationService.DEFAULT_COSTS`` (:43-51), per-domain arithmetic
``estimate_domain_cost`` (:58-129: CDX page count → filtering reduction →
max_pages cap → time with retry overhead → cpu/bandwidth/storage cost),
confidence classification ``_determine_confidence`` (:208-223), and the
project rollup with its all-high / all-high-or-medium confidence fold
(``estimate_project_cost`` :131-206).

Money and time are integer units (micro-USD, milli-hours) following the
repo's hash-stable integer-milli convention — the reference's float
constants are replayed as exact integer ratios:

* filtering keeps ``1 - 0.7`` of pages      → ``total * 3 // 10``
* time = pages / 1000 pph * 1.2 retry        → milli-hours ``est * 12 // 10``
* cpu    $0.05 / hour                        → 50 µ$ per milli-hour
* bandwidth $0.10 / GB at 50 KB/page         → ``est * 5_000_000 // 2**20``
* storage  $0.02 / GB-month                  → ``est * 1_000_000 // 2**20``

Scale shape: one hash aggregation on host (domain cardinality ≪ corpus),
then a domain-sized rollup — no corpus-sized shuffle, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# cost_estimation.py:43-51 DEFAULT_COSTS, as exact integer ratios
FILTER_KEEP_NUM, FILTER_KEEP_DEN = 3, 10        # 1 - filtering_reduction 0.7
RETRY_NUM, RETRY_DEN = 12, 10                    # retry_overhead 1.2
PAGES_PER_HOUR = 1000
CPU_MICRO_PER_MILLI_HOUR = 50                    # $0.05 / cpu-hour
BW_MICRO_NUM = 5_000_000                         # 50 KB/page * $0.10/GB
STORAGE_MICRO_NUM = 1_000_000                    # 50 KB/page * $0.02/GB-mo
KB_PER_GB = 1 << 20


def domain_config(host: F.Column) -> dict[str, F.Column]:
    """Planted per-domain crawl config (max_pages + owning project),
    derived from the host alone so Spark and the DuckDB oracle agree.
    The reference reads these from its Domain/Project rows."""
    max_pages = (F.when(host.endswith(".edu"), F.lit(60))
                 .when(host.endswith(".gov"), F.lit(500))
                 .when(host == "mega.example.com",
                       F.lit(None).cast("int"))
                 .otherwise(F.lit(400)))
    project = (F.when(host.endswith(".edu"), "academic")
               .when(host.endswith(".gov"), "government")
               .otherwise("web"))
    return {"max_pages": max_pages, "project": project}


def estimate_domain_costs(pages: DataFrame) -> DataFrame:
    """Per-domain cost estimate over a CDX frontier (host column required).

    Columns: host, project, total_pages, est_pages, time_milli_hours,
    cost_micro_usd, confidence — one row per distinct host.
    """
    cfg = domain_config(F.col("host"))
    counts = (pages.groupBy("host")
              .agg(F.count("*").alias("total_pages"))
              .withColumn("max_pages", cfg["max_pages"])
              .withColumn("project", cfg["project"]))
    # `div` = integral division on BIGINT: exact at 10^10-page domain
    # counts, where a double round-trip would lose unit-µ$ precision.
    est0 = F.expr(f"total_pages * {FILTER_KEEP_NUM} div {FILTER_KEEP_DEN}")
    est = F.when(F.col("max_pages").isNotNull(),
                 F.least(F.col("max_pages").cast("long"), est0)).otherwise(est0)
    out = counts.withColumn("est_pages", est)
    # est/1000 pph hours → milli-hours = est * 1.2
    out = out.withColumn(
        "time_milli_hours",
        F.expr(f"est_pages * {RETRY_NUM} div {RETRY_DEN}"))
    cpu = F.col("time_milli_hours") * CPU_MICRO_PER_MILLI_HOUR
    bw = F.expr(f"est_pages * {BW_MICRO_NUM} div {KB_PER_GB}")
    stor = F.expr(f"est_pages * {STORAGE_MICRO_NUM} div {KB_PER_GB}")
    out = out.withColumn("cost_micro_usd", (cpu + bw + stor).cast("long"))
    confidence = (
        F.when(F.col("total_pages") == 0, "low")               # :210-211
        .when((F.col("total_pages") < 1000)
              & F.col("max_pages").isNotNull(), "high")        # :214-215
        .when(F.col("total_pages") < 10000, "medium")          # :218-219
        .otherwise("low"))                                     # :222
    return (out.withColumn("confidence", confidence)
            .select("host", "project",
                    F.col("total_pages").cast("long").alias("total_pages"),
                    F.col("est_pages").cast("long").alias("est_pages"),
                    "time_milli_hours", "cost_micro_usd", "confidence"))


def estimate_project_costs(domain_costs: DataFrame) -> DataFrame:
    """Project rollup (cost_estimation.py:185-196): sums over member
    domains + the reference's confidence fold — all 'high' → high, all
    in {high, medium} → medium, else low."""
    return (domain_costs.groupBy("project")
            .agg(F.count("*").alias("domain_count"),
                 F.sum("est_pages").alias("total_pages"),
                 F.sum("cost_micro_usd").alias("total_cost_micro_usd"),
                 F.sum("time_milli_hours").alias("total_time_milli_hours"),
                 F.bool_and(F.col("confidence") == "high").alias("_all_hi"),
                 F.bool_and(F.col("confidence").isin("high", "medium"))
                 .alias("_all_hi_med"))
            .withColumn("confidence_level",
                        F.when(F.col("_all_hi"), "high")
                        .when(F.col("_all_hi_med"), "medium")
                        .otherwise("low"))
            .drop("_all_hi", "_all_hi_med"))


def user_engagement(events: DataFrame) -> DataFrame:
    """Per-user engagement scoring (user_analytics.py:390-425): capped
    integer point buckets — logins ×3 capped 30, projects ×5 capped 25,
    searches ×2 capped 20, recency 15-2·days within a week, +5 verified,
    +5 approved; total capped 100. All contributions are integers in the
    reference, so the score is an exact INT here.

    Activity is planted from the driver ``events`` table: logins =
    ``signup`` events, searches = ``click`` events, projects = distinct
    planted project ids ``(event_id·13 + 7) mod 1000`` among ``purchase``
    events; verified/approved flags derive from user_id parity. "Now" is
    the corpus max event time (no wall clock); days-since-login is the
    reference's ``timedelta.days`` — whole elapsed 86400 s periods, not
    calendar-date diff.
    """
    per_user = (events.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        .alias("login_count"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .alias("searches_performed"),
        F.count_distinct(
            F.when(F.col("event_type") == "purchase",
                   (F.col("event_id") * 13 + 7) % 1000))
        .alias("projects_created"),
        F.max("ts").alias("_last_seen")))
    # "now" enters as a broadcast 1-row aggregate (no global window, no
    # eager collect), computed straight off events — max(ts) over events
    # equals max per-user last_seen, without recomputing the user agg.
    per_user = per_user.crossJoin(
        F.broadcast(events.agg(F.max("ts").alias("_now"))))
    days_since = F.floor(
        (F.unix_timestamp("_now") - F.unix_timestamp("_last_seen"))
        / F.lit(86400))
    score = (
        F.least(F.col("login_count") * 3, F.lit(30))
        + F.least(F.col("projects_created") * 5, F.lit(25))
        + F.least(F.col("searches_performed") * 2, F.lit(20))
        + F.when(days_since <= 7,
                 F.greatest(F.lit(15) - days_since * 2, F.lit(0)))
        .otherwise(F.lit(0))
        + F.when(F.col("user_id") % 2 == 0, 5).otherwise(0)   # is_verified
        + F.when(F.col("user_id") % 3 != 0, 5).otherwise(0))  # approved
    return (per_user
            .withColumn("engagement_score",
                        F.least(score, F.lit(100)).cast("int"))
            .select(F.col("user_id").cast("long").alias("user_id"),
                    F.col("login_count").cast("long").alias("login_count"),
                    F.col("projects_created").cast("long")
                    .alias("projects_created"),
                    F.col("searches_performed").cast("long")
                    .alias("searches_performed"),
                    "engagement_score"))
