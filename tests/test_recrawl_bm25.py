"""Unit tests for the freshness-driven recrawl scheduler and BM25 ranking.

Both are python-twin parity tests (exact expected values computed with
plain Python over the same tiny input) plus semantic invariants.
"""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from chrono_scraper_spark.operators.index import bm25_rank
from chrono_scraper_spark.operators.recrawl import recrawl_schedule

E9 = 1_000_000_000


# --------------------------------------------------------------------------
# recrawl_schedule
# --------------------------------------------------------------------------

def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


def test_recrawl_schedule_rates_and_staleness(spark):
    # u1: 3 captures over 100 s, changes at both steps -> lambda = 2/100
    # u2: 3 captures over 200 s, no changes -> lambda = 0
    # u3: 1 capture (cold start)
    # u4: 2 captures, 1 change over 50 s, last capture old -> largest score
    rows = [
        ("u1", _ts("2020-01-01 00:00:00"), "a"),
        ("u1", _ts("2020-01-01 00:00:40"), "b"),
        ("u1", _ts("2020-01-01 00:01:40"), "c"),
        ("u2", _ts("2020-01-01 00:00:00"), "x"),
        ("u2", _ts("2020-01-01 00:01:40"), "x"),
        ("u2", _ts("2020-01-01 00:03:20"), "x"),
        ("u3", _ts("2020-01-01 00:02:00"), "y"),
        ("u4", _ts("2020-01-01 00:00:00"), "p"),
        ("u4", _ts("2020-01-01 00:00:50"), "q"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, digest string")
    out = {r["url"]: r.asDict()
           for r in recrawl_schedule(pages).collect()}
    assert set(out) == {"u1", "u2", "u3", "u4"}

    # corpus "now" = max capture = u2's 00:03:20
    u1 = out["u1"]
    assert (u1["n_captures"], u1["n_changes"], u1["span_s"]) == (3, 2, 100)
    assert u1["lambda_e9"] == 2 * E9 // 100
    assert u1["age_s"] == 100  # 00:01:40 -> 00:03:20
    assert u1["score_e9"] == u1["lambda_e9"] * 100
    assert not u1["cold_start"]

    u2 = out["u2"]
    assert (u2["n_changes"], u2["lambda_e9"], u2["score_e9"]) == (0, 0, 0)
    assert not u2["due"]

    u3 = out["u3"]
    assert u3["cold_start"] and u3["n_captures"] == 1
    assert u3["span_s"] == 0 and u3["lambda_e9"] == 0

    u4 = out["u4"]
    assert (u4["n_changes"], u4["span_s"]) == (1, 50)
    assert u4["lambda_e9"] == E9 // 50
    assert u4["age_s"] == 150
    # u4 missed ~3 expected changes -> clearly due at the 0.5 default
    assert u4["score_e9"] == (E9 // 50) * 150 and u4["due"]
    # proportional policy: u4 (high rate, stale) outranks u1 outranks u2
    assert u4["score_e9"] > u1["score_e9"] > u2["score_e9"]


def test_recrawl_schedule_deterministic_now(spark):
    """"now" is the corpus max capture, so re-running on the same log is
    bit-identical (no wall clock in the plan)."""
    pages = spark.createDataFrame(
        [("u", _ts("2020-01-01 00:00:00"), "a"),
         ("u", _ts("2020-01-01 00:00:10"), "b")],
        "url string, warc_ts timestamp, digest string")
    a = sorted(map(tuple, recrawl_schedule(pages).collect()))
    b = sorted(map(tuple, recrawl_schedule(pages).collect()))
    assert a == b
    assert a[0][5] == 0  # age_s of the only (latest) url is 0


# --------------------------------------------------------------------------
# bm25_rank
# --------------------------------------------------------------------------

def _bm25_twin(docs: dict[str, list[str]], query: list[str],
               k1: float = 1.2, b: float = 0.75) -> dict[str, int]:
    """Plain-Python BM25 with the operator's nano-floor convention."""
    n = len(docs)
    dls = {d: len(t) for d, t in docs.items()}
    avgdl = sum(dls.values()) / n
    out: dict[str, int] = {}
    for d, toks in docs.items():
        s = 0
        for term in set(query):
            tf = toks.count(term)
            if tf == 0:
                continue
            df = sum(1 for t in docs.values() if term in t)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            part = (idf * (tf * (k1 + 1.0))
                    / (tf + k1 * (1.0 - b + b * dls[d] / avgdl)) * 1e9)
            s += math.floor(part)
        if s:
            out[d] = s
    return out


def test_bm25_rank_python_twin(spark):
    docs = {
        "d1": "the quick brown fox jumps over the lazy dog".split(),
        "d2": "quick quick quick fox".split(),
        "d3": "a dog and another dog sat on the mat with a dog".split(),
        "d4": "nothing relevant here at all whatsoever today".split(),
    }
    query = ["quick", "dog"]
    inv = spark.createDataFrame(
        [(t, d, toks.count(t))
         for d, toks in docs.items() for t in set(toks)],
        "term string, doc string, tf long")
    got = {r["doc"]: r["bm25_e9"]
           for r in bm25_rank(inv, query, doc_cols=("doc",)).collect()}
    assert got == _bm25_twin(docs, query)


def test_bm25_semantics(spark):
    """Rarer term outweighs a common one; repetition saturates (tf has
    diminishing returns vs a doc simply containing the rare term)."""
    docs = {f"d{i}": ["common", f"filler{i}"] for i in range(10)}
    docs["d0"] = ["common", "rare"]
    inv = spark.createDataFrame(
        [(t, d, toks.count(t))
         for d, toks in docs.items() for t in set(toks)],
        "term string, doc string, tf long")
    got = {r["doc"]: (r["bm25_e9"], r["matched_terms"])
           for r in bm25_rank(inv, ["common", "rare"],
                              doc_cols=("doc",)).collect()}
    assert got["d0"][1] == 2
    # the doc with the rare term dominates every common-only doc
    assert all(got["d0"][0] > v[0]
               for d, v in got.items() if d != "d0")
