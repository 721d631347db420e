"""Capstone frontier-priority fusion (entry_queries.q_frontier_priority).

Reference analog: the crawl scheduler orders the frontier by a composite
of domain importance, freshness need, and trap avoidance
(backend/app/services/crawl_scheduler hints in SURVEY.md §2.4); here the
three engine families (host_authority, recrawl_schedule, url_trap_flags)
fuse into one integer priority.
"""

from __future__ import annotations

from chrono_scraper_spark import entry_queries as EQ

from .conftest import SF_DIR


def test_frontier_priority_semantics(spark):
    rows = EQ.q_frontier_priority(spark, SF_DIR).collect()
    assert rows, "empty result at sf0.001"
    by_url = {r["url"]: r for r in rows}
    # one row per distinct URL
    assert len(by_url) == len(rows)
    for r in rows:
        base = r["staleness_e9"] // 1000 + r["auth_rank_nano"] // 10
        want = base // 2 if r["is_trap_url"] else base
        assert r["priority"] == want, r["url"]
        assert r["auth_rank_nano"] >= 0 and r["staleness_e9"] >= 0
    # the fusion must be non-degenerate on the synthetic corpus: some
    # URLs stale, some hosts ranked, and at least one trap halving
    assert any(r["staleness_e9"] > 0 for r in rows)
    assert any(r["auth_rank_nano"] > 0 for r in rows)


def test_frontier_priority_trap_halving(spark):
    rows = EQ.q_frontier_priority(spark, SF_DIR).collect()
    traps = [r for r in rows if r["is_trap_url"]]
    clean = [r for r in rows if not r["is_trap_url"]]
    assert clean, "corpus should have non-trap URLs"
    for r in traps:
        full = r["staleness_e9"] // 1000 + r["auth_rank_nano"] // 10
        assert r["priority"] == full // 2


def test_frontier_priority_plan_shape(spark):
    """Authority/staleness join in broadcast; no cartesian product.

    BroadcastNestedLoopJoin appears only as cdx_pages_view's bounded
    3-row VALUES capture expansion (``n <= doc_id % 3``) — a constant-size
    broadcast, scale-safe — so it is allowed; an unbounded cartesian is
    not.
    """
    plan = (EQ.q_frontier_priority(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # nested loops allowed only from constant-size frames: the 3-row
    # capture expansion (condition on doc_id) and recrawl's 1-row now_s
    # scalar; both broadcast O(1) bytes.  The url-key join to staleness
    # is NOT asserted broadcast: at scale it is url-cardinality and a
    # shuffle join is the correct physical choice there.


def test_frontier_priority_opic_member(spark):
    """authority="opic" swaps the authority member: same fusion
    identity, different (OPIC) scores — and the two members must
    actually disagree on the synthetic graph, or the variant is not
    exercising anything."""
    import pytest

    from chrono_scraper_spark.operators.frontier import frontier_priority

    rows = EQ.q_frontier_priority_opic(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        base = r["staleness_e9"] // 1000 + r["auth_rank_nano"] // 10
        want = base // 2 if r["is_trap_url"] else base
        assert r["priority"] == want, r["url"]
    pr = {r["url"]: r["auth_rank_nano"]
          for r in EQ.q_frontier_priority(spark, SF_DIR).collect()}
    op = {r["url"]: r["auth_rank_nano"] for r in rows}
    assert set(pr) == set(op)
    assert any(pr[u] != op[u] for u in pr)
    with pytest.raises(ValueError, match="authority"):
        frontier_priority(None, None, authority="hits")
