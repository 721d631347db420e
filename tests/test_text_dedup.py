"""Dedup family: exact groups, MinHash-LSH vs brute-force Jaccard recall,
SimHash hamming pairs, embedding cosine near-dups (LSH ⊆ exact)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chrono_scraper_spark.operators import text_dedup as TD

BASE = ("the archive stores captures of pages from many hosts and the "
        "index makes them searchable over time with filters")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                  # exact dup of 0
        (2, BASE + " extra"),                       # near dup of 0
        (3, BASE.replace("archive", "library")),    # near dup of 0
        (4, "completely unrelated words about cooking pasta with garlic "
            "and olive oil in a big pot tonight"),
        (5, "another disjoint document concerning astronomy telescopes "
            "and the orbits of outer planets"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_exact_duplicates(spark, docs):
    out = {r["doc_id"]: r for r in TD.exact_duplicates(docs).collect()}
    assert out[0]["group_size"] == 2 and out[1]["group_size"] == 2
    assert out[0]["is_canonical"] and not out[1]["is_canonical"]
    assert out[1]["canonical_id"] == 0
    assert out[4]["group_size"] == 1 and out[4]["is_canonical"]


def test_minhash_near_duplicates_find_planted_pairs(spark, docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in
             TD.minhash_near_duplicates(docs, threshold=0.5,
                                        n_hashes=16, bands=8).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.8
    assert not any(4 in p or 5 in p for p in pairs)


def test_lsh_candidates_superset_check(spark, docs):
    """Every verified pair must satisfy exact Jaccard; brute-force exact
    Jaccard over all pairs must find nothing above threshold that LSH+verify
    missed at these (generous) band settings."""
    ids = docs.select("doc_id")
    all_pairs = (ids.withColumnRenamed("doc_id", "a")
                 .crossJoin(ids.withColumnRenamed("doc_id", "b"))
                 .filter(F.col("a") < F.col("b")))
    brute = {(r["a"], r["b"]) for r in
             TD.ngram_jaccard(all_pairs, docs).filter("jaccard >= 0.5").collect()}
    lsh = {(r["a"], r["b"]) for r in
           TD.minhash_near_duplicates(docs, threshold=0.5,
                                      n_hashes=16, bands=8).collect()}
    assert lsh == brute


def test_simhash_near_duplicates(spark, docs):
    sims = {r["doc_id"]: r["simhash"] for r in TD.simhash64(docs).collect()}
    assert sims[0] == sims[1]  # identical text → identical simhash
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             TD.simhash_near_duplicates(docs, max_hamming=10).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs  # one-word addition stays within hamming 10
    assert (0, 4) not in pairs and (0, 5) not in pairs


def test_embedding_near_duplicates_exact_and_lsh(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),     # opposite
        (4, [0.0, 0.999, 0.02, 0.0]),   # near dup of 2
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    exact = {(r["a"], r["b"]) for r in
             TD.embedding_near_duplicates(emb, threshold=0.99).collect()}
    assert exact == {(0, 1), (2, 4)}
    lsh = {(r["a"], r["b"]) for r in
           TD.embedding_near_duplicates(emb, threshold=0.99,
                                        n_planes=4).collect()}
    assert lsh.issubset(exact)  # LSH may lose boundary pairs, never invent
