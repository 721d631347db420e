"""Redirect-chain resolution (operators/redirects.py).

Pointer-doubling terminal lookup over the functional url→Location graph;
reference analog: archive_org_client follows redirects per-request
(httpx follow_redirects) — this is the batch corpus-level view.
"""

from __future__ import annotations

from chrono_scraper_spark.operators.redirects import resolve_redirects


def _resolve(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["url"]: (r["final_url"], r["hops"], r["is_cycle"])
            for r in resolve_redirects(df, **kw).collect()}


def test_chain_resolution(spark):
    # a -> b -> c -> T, d -> T, lone e -> f
    got = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "T"),
                           ("d", "T"), ("e", "f")])
    assert got == {"a": ("T", 3, False), "b": ("T", 2, False),
                   "c": ("T", 1, False), "d": ("T", 1, False),
                   "e": ("f", 1, False)}


def test_cycle_detection(spark):
    # 2-cycle, 3-cycle, self-loop, and a chain FEEDING a cycle
    got = _resolve(spark, [("x", "y"), ("y", "x"),
                           ("p", "q"), ("q", "r"), ("r", "p"),
                           ("s", "s"),
                           ("in", "x")])
    for u in ("x", "y", "p", "q", "r", "s", "in"):
        assert got[u] == (None, None, True), u


def test_long_chain_within_bound(spark):
    n = 20
    edges = [(f"u{i}", f"u{i+1}") for i in range(n)]
    got = _resolve(spark, edges, max_hops=32)
    assert got["u0"] == (f"u{n}", n, False)
    assert got[f"u{n-1}"] == (f"u{n}", 1, False)


def test_over_long_chain_flags_as_nonterminating(spark):
    n = 40  # > max_hops=32: documented to classify like a cycle
    edges = [(f"u{i}", f"u{i+1}") for i in range(n)]
    got = _resolve(spark, edges, max_hops=32)
    assert got["u0"] == (None, None, True)
    assert got[f"u{n-1}"] == (f"u{n}", 1, False)  # tail still terminates


def test_duplicate_edges_deterministic(spark):
    # two Locations recorded for one src: min dst wins, deterministically
    got = _resolve(spark, [("a", "z"), ("a", "b"), ("b", "T")])
    assert got["a"] == ("T", 2, False)


def test_logarithmic_rounds(spark):
    """max_hops=32 must resolve a 30-hop chain in ceil(log2(32))=5 join
    rounds — the plan after resolution is checkpoint-truncated, so we
    assert behavior (correct hops) rather than plan depth, plus the
    round count drives reach: max_hops=4 -> reach 4, 5-hop chain flagged."""
    edges = [(f"u{i}", f"u{i+1}") for i in range(5)]
    got = _resolve(spark, edges, max_hops=4)
    assert got["u0"] == (None, None, True)
    assert got["u1"] == ("u5", 4, False)
