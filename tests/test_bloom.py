"""Bloom filter kernel: no false negatives; FPR near target."""

from __future__ import annotations

from pyspark.sql import functions as F

from chrono_scraper_spark.functions.bloom import (
    build_bloom,
    optimal_params,
    with_bloom_probe,
)


def test_optimal_params_monotone():
    m1, _ = optimal_params(1000, 0.01)
    m2, _ = optimal_params(1000, 0.001)
    assert m2 > m1
    assert m1 % 64 == 0


def test_no_false_negatives_and_bounded_fpr(spark):
    members = spark.range(0, 2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    probes_in = members
    probes_out = spark.range(100_000, 104_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    bloom = build_bloom(members, F.col("k"), 2000, fpp=0.01)
    hit_in = with_bloom_probe(probes_in, F.col("k"), bloom, "m")
    assert hit_in.filter(~F.col("m")).count() == 0  # zero false negatives
    fp = with_bloom_probe(probes_out, F.col("k"), bloom, "m").filter("m").count()
    assert fp / 4000 < 0.05  # target 0.01, generous bound
