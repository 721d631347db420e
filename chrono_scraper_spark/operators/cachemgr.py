"""Multi-level cache management: level assignment + access statistics.

Reference: ``backend/app/services/intelligent_cache_manager.py`` —
``_determine_optimal_cache_level`` (:657-674: <10KB & >1h-TTL →
memory, <1MB & >5min-TTL → redis, else persistent), the compression
gate threshold (:177, :693-709 — the zlib byte-path itself is covered
by the rows-only ``compression_ratio`` query; here only the
size-threshold decision derives), and ``CacheStats`` (:77-90:
hit/miss/eviction rates, top keys by access count).

Planted cache entries, one per event: ``result_size =
event_id·811 mod 1_500_000`` bytes, ``ttl = event_id·53 mod 7200``
seconds — moduli chosen to straddle every branch boundary. The access
log plants hits = ``click`` events, misses = ``view`` events per key
(= user).

Scale shape: per-row expressions for the classifier; one user-keyed
hash aggregation for the stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chrono_scraper_spark.operators.dashboard import _floor_div

#: :661-674 thresholds
MEMORY_MAX_SIZE = 10_240
MEMORY_MIN_TTL = 3_600
REDIS_MAX_SIZE = 1_048_576
REDIS_MIN_TTL = 300
#: :177
COMPRESSION_THRESHOLD = 1_024


def level_assign(events: DataFrame) -> DataFrame:
    """Planted entry → cache level + compression candidacy
    (:657-674, :699)."""
    size = (F.col("event_id") * 811 % 1_500_000).cast("long")
    ttl = (F.col("event_id") * 53 % 7_200).cast("long")
    d = events.select(
        F.col("event_id").alias("entry_id"),
        size.alias("result_size"), ttl.alias("ttl_seconds"))
    level = (
        F.when((F.col("result_size") < MEMORY_MAX_SIZE)
               & (F.col("ttl_seconds") > MEMORY_MIN_TTL), "memory")
        .when((F.col("result_size") < REDIS_MAX_SIZE)
              & (F.col("ttl_seconds") > REDIS_MIN_TTL), "redis")
        .otherwise("persistent")
    )
    return d.select(
        "entry_id", "result_size", "ttl_seconds",
        level.alias("cache_level"),
        (F.col("result_size") >= COMPRESSION_THRESHOLD)
        .alias("compression_candidate"),
    )


def cache_stats(events: DataFrame) -> DataFrame:
    """Single-row CacheStats rollup (:77-90): entries, planted total
    size, hit/miss rates in milli over the planted access log."""
    per_key = events.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long").alias("hits"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long").alias("misses"),
    )
    sizes = events.agg(
        F.sum(F.col("event_id") * 811 % 1_500_000).cast("long")
        .alias("total_size_bytes"))
    agg = per_key.agg(
        F.count(F.lit(1)).cast("long").alias("total_entries"),
        F.sum("hits").cast("long").alias("hits"),
        F.sum("misses").cast("long").alias("misses"),
    ).crossJoin(F.broadcast(sizes))
    total = F.greatest(F.col("hits") + F.col("misses"),
                       F.lit(1).cast("long"))
    return agg.select(
        "total_entries", "total_size_bytes", "hits", "misses",
        _floor_div(F.col("hits") * 1_000, total).alias("hit_rate_milli"),
        _floor_div(F.col("misses") * 1_000, total)
        .alias("miss_rate_milli"),
    )


def top_keys(events: DataFrame, k: int = 10) -> DataFrame:
    """Top-k keys by access count (:86), ties on key ascending."""
    # Round 6: TakeOrderedAndProject (orderBy().limit) replaces the
    # unpartitioned window that sorted every distinct key in one task;
    # ranks derive from the k survivors. Identical output.
    per_key = events.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("access_count"))
    order = [F.desc("access_count"), F.asc("key")]
    top = per_key.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "key", "access_count")
    )
