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


def test_partitioned_bloom_equivalent_to_global(spark, tmp_path):
    """Bucketed build/probe must agree with the global filter on membership
    semantics: zero false negatives, and the prefiltered anti-join output is
    IDENTICAL (false positives only cost exact-join work, never rows)."""
    from pyspark.sql import functions as F

    from chrono_scraper_spark.functions.bloom import (
        build_bloom_partitioned,
        with_bloom_probe_partitioned,
    )
    from chrono_scraper_spark.operators.dedup import (
        anti_join_seen,
        bloom_prefilter_anti_join,
    )

    cand = spark.range(2000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url_canon"),
        F.lpad(F.col("id").cast("string"), 14, "0").alias("ts14"))
    seen = cand.filter(F.expr("CAST(substr(url_canon, 2) AS INT) % 3 = 0"))

    meta = build_bloom_partitioned(
        seen, F.concat_ws("\x1f", "url_canon", "ts14"),
        str(tmp_path / "bloom"), n_items=700, n_buckets=8)
    probed = with_bloom_probe_partitioned(
        cand, F.concat_ws("\x1f", "url_canon", "ts14"), meta, "maybe")
    # zero false negatives: every seen key probes true
    fn = (probed.join(seen.select("url_canon", "ts14"),
                      ["url_canon", "ts14"], "left_semi")
          .filter(~F.col("maybe")).count())
    assert fn == 0

    expected = {(r["url_canon"], r["ts14"]) for r in
                anti_join_seen(cand, seen, ["url_canon", "ts14"]).collect()}
    got = {(r["url_canon"], r["ts14"]) for r in
           bloom_prefilter_anti_join(cand, seen, ["url_canon", "ts14"],
                                     n_buckets=8,
                                     bloom_dir=str(tmp_path / "bloom2"))
           .collect()}
    assert got == expected
    # bucket files really exist (executor-written, driver never held bits)
    import os
    files = [f for f in os.listdir(tmp_path / "bloom")
             if f.endswith(".bloom")]
    assert 1 <= len(files) <= 8
