"""Fused crawl priority: authority × staleness × trap flags.

The reference scores frontier candidates with a static pattern-based
priority (enhanced_intelligent_filter.py priority scores); a live
crawler fuses three live signals instead — how IMPORTANT the host is
(link-graph authority), how STALE the page is (observed change rate ×
age, Cho & Garcia-Molina 2003), and whether the URL is crawler-trap
shaped. ``frontier_priority`` is that fusion as one relational pass,
all-integer so results are bit-identical across engines:

    base     = staleness_e9 DIV 1000 + authority_nano DIV 10
    priority = base DIV 2 when trap-flagged else base

``authority`` selects the graph member:

* ``"pagerank"`` — ``graph.host_authority`` (5 integer iterations):
  the steady-state choice when the whole graph snapshot is available.
* ``"opic"`` — ``graph.opic_importance`` (3 cash/history rounds,
  Abiteboul et al. WWW'03): usable the moment a node is first seen, so
  the right member for cold-start spider mode where the frontier grows
  while importance accrues.

Scale shape: the authority table is host-cardinality and broadcasts
into the fuse; staleness shares the url-key shuffle of the capture-log
window; trap flags are a zero-shuffle projection. Nothing shuffles
beyond the parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chrono_scraper_spark.operators import graph as G
from chrono_scraper_spark.operators.recrawl import recrawl_schedule
from chrono_scraper_spark.operators.traps import url_trap_flags

AUTHORITIES = ("pagerank", "opic")


def frontier_priority(pages: DataFrame, edges: DataFrame,
                      authority: str = "pagerank") -> DataFrame:
    """One crawl priority per URL. ``pages``: the capture log (url,
    host, warc_ts, digest — staleness reads the capture history, trap
    flags read the URL shape). ``edges``: (src, dst) host link graph.
    Output: (url, host, auth_rank_nano, staleness_e9, is_trap_url,
    priority)."""
    if authority == "pagerank":
        auth = G.host_authority(edges, iters=5).withColumnRenamed(
            "rank_nano", "auth_nano")
    elif authority == "opic":
        auth = G.opic_importance(edges, rounds=3).withColumnRenamed(
            "importance_nano", "auth_nano")
    else:
        raise ValueError(
            f"authority must be one of {AUTHORITIES}, got {authority!r}")
    # host-cardinality: truncate the iteration lineage before fusing
    # (the cached final scores execute once either way, but the
    # un-truncated plan re-displays the whole loop subtree and defeats
    # plan auditing)
    auth = auth.localCheckpoint(eager=True)
    stale = recrawl_schedule(pages).select("url", "score_e9")
    flagged = url_trap_flags(pages.select("url", "host").distinct()) \
        .select("url", "host", "is_trap_url")
    fused = (flagged
             .join(F.broadcast(auth), "host", "left")
             .join(stale, "url", "left"))
    # the fused base formula exists ONCE; the trap branch halves it
    # (integer DIV, same as the oracle's shared fuse tail)
    fused = fused.withColumn(
        "__base",
        F.expr("CAST(coalesce(score_e9, 0) DIV 1000"
               " + coalesce(auth_nano, 0) DIV 10 AS BIGINT)"))
    return fused.select(
        "url", "host",
        F.coalesce(F.col("auth_nano"), F.lit(0)).cast("long")
        .alias("auth_rank_nano"),
        F.coalesce(F.col("score_e9"), F.lit(0)).cast("long")
        .alias("staleness_e9"),
        "is_trap_url",
        F.when(F.col("is_trap_url"),
               F.expr("__base DIV 2"))
        .otherwise(F.col("__base")).cast("long").alias("priority"))
