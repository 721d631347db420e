"""Redirect-chain resolution: collapse 3xx hop chains to terminal URLs.

Reference analog: the fetch client follows redirects inline per request
(archive_org_client httpx ``follow_redirects=True``; our
``sources/httpfetch.py`` replays that per-connection). At corpus scale the
complementary BATCH view matters too: the fetch log accumulates
``url → Location`` edges across rounds, and canonical-URL analytics
(dedup by destination, authority transfer, frontier hygiene) need every
URL mapped to its terminal target. That mapping is a functional graph
walk — each node has at most one outgoing edge — so it resolves with
POINTER DOUBLING: ``f(u) ← f(f(u))`` per round, O(log max_hops) self-joins
instead of O(chain length) sequential joins. Each round is one equi-join
on the url key + an eager localCheckpoint (lineage truncation, same
discipline as graph.py / text_dedup.py iteration).

Cycles (and chains longer than ``max_hops``) never reach a terminal: after
the final round their cursor still has an outgoing edge. They are flagged
``is_cycle`` with NULL final_url/hops — the crawl treats them as traps.

Scale: every join is keyed on url (hash-partitionable, no skew — a
functional graph has out-degree ≤ 1 and redirect in-degree is bounded in
practice); the edge set is fetch-log cardinality, far below the frontier.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(edges: DataFrame, *, max_hops: int = 32) -> DataFrame:
    """Resolve each redirect source to its terminal URL.

    ``edges``: one row per redirect — ``(src string, dst string)``; at most
    one outgoing edge per src (HTTP gives one Location; duplicates are
    dropped deterministically by keeping the min dst).

    Returns ``(url, final_url, hops, is_cycle)`` — one row per distinct
    src. ``is_cycle`` marks chains that never terminate within
    ``max_hops`` (true cycles or over-long chains); those rows carry NULL
    ``final_url``/``hops``.
    """
    e = (edges.groupBy(F.col("src"))
         .agg(F.min("dst").alias("dst")))
    m = e.select("src", F.col("dst").alias("cur"),
                 F.lit(1).cast("int").alias("hops"))
    rounds = max(1, math.ceil(math.log2(max_hops)))
    for _ in range(rounds):
        b = m.select(F.col("src").alias("b_src"),
                     F.col("cur").alias("b_cur"),
                     F.col("hops").alias("b_hops"))
        m = (m.join(b, m["cur"] == b["b_src"], "left")
             .select("src",
                     F.coalesce("b_cur", "cur").alias("cur"),
                     (F.col("hops")
                      + F.coalesce("b_hops", F.lit(0))).alias("hops"))
             .localCheckpoint(eager=True))
    # pending = cursor still has an outgoing edge after the last round
    srcs = e.select(F.col("src").alias("cur")).distinct()
    pending = m.join(srcs, "cur", "left_semi") \
        .select("src", F.lit(True).alias("is_cycle"))
    return (m.join(pending, "src", "left")
            .select(
                F.col("src").alias("url"),
                F.when(F.col("is_cycle").isNull(), F.col("cur"))
                .alias("final_url"),
                F.when(F.col("is_cycle").isNull(), F.col("hops"))
                .cast("int").alias("hops"),
                F.coalesce("is_cycle", F.lit(False)).alias("is_cycle")))
