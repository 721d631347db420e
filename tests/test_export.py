"""Corpus-export pipeline (plans/export.py): quality gate → exact dedup →
near-dup keep-best → deterministic shards, end-to-end on planted docs."""

from __future__ import annotations

import pytest

from chrono_scraper_spark.plans.export import export_corpus


def _prose(i: int, n: int = 60) -> str:
    # unique 2-grams, stopwords present, mean word length in range
    stops = ["the", "and", "of", "in", "with", "for"]
    return " ".join(f"{stops[j % 6]} item{i}word{j}" for j in range(n))


def _corpus(spark):
    rows = [(i, _prose(i)) for i in range(8)]
    rows.append((100, _prose(1)))                      # exact dup of 1
    rows.append((101, _prose(2) + " extra tail bits"))  # near dup of 2, longer
    rows.append((200, "short junk"))                   # fails gopher
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export") / "shards")
    stats = export_corpus(_corpus(spark), out, shard_bytes=2048,
                          jaccard_threshold=0.5)
    return out, stats


def test_export_pipeline_counts_and_keep_rule(spark, exported):
    out, stats = exported
    assert stats.n_input == 11
    assert stats.n_quality_pass == 10          # junk gated out
    assert stats.n_after_exact == 9            # 100 collapsed into 1
    assert stats.n_after_neardup == 8          # 2 lost to the LONGER 101
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert 100 not in kept and 200 not in kept
    assert 101 in kept and 2 not in kept       # keep-best: longest survives
    assert kept == {0, 1, 3, 4, 5, 6, 7, 101}
    assert stats.n_shards >= 2                 # 2 KiB shards force a split


def test_export_deterministic(spark, exported, tmp_path):
    out_a, _ = exported
    out_b = str(tmp_path / "b")
    export_corpus(_corpus(spark), out_b, shard_bytes=2048,
                  jaccard_threshold=0.5)
    ra = sorted(map(tuple, spark.read.parquet(out_a)
                    .select("doc_id", "shard").collect()))
    rb = sorted(map(tuple, spark.read.parquet(out_b)
                    .select("doc_id", "shard").collect()))
    assert ra == rb and len(ra) == 8


def test_export_no_gate(spark, tmp_path):
    out = str(tmp_path / "nogate")
    stats = export_corpus(_corpus(spark), out, shard_bytes=1 << 20,
                          quality_gate=False)
    assert stats.n_quality_pass == 11          # junk kept when gate is off
    assert stats.n_shards == 1                 # 1 MiB shard swallows all
