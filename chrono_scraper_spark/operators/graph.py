"""Host-graph authority ranking for frontier prioritization.

The reference prioritizes crawl work with static per-URL heuristics
(enhanced_intelligent_filter.py priority scores); at 10^10-URL frontier
scale, crawlers weight hosts by link authority (PageRank/OPIC-family). This
module adds that as an iterative DataFrame computation designed for Spark's
execution model:

* **Integer arithmetic end-to-end.** Ranks are nano-scaled longs
  (Σ≈10¹²); every step uses floor-division and long sums, which are
  order-independent — the result is bit-identical across partitionings,
  re-runs, AND the DuckDB oracle (a float PageRank would drift with
  aggregation order and could never be hash-compared).
* **Pregel-shaped iterations.** Each iteration is
  edges ⋈ ranks (shuffle on src) → contributions groupBy dst (map-side
  partial sums) → left join back to the host list. Ranks are cached and
  the previous iteration unpersisted; every ``checkpoint_every``
  iterations the lineage is truncated with ``localCheckpoint`` so the plan
  does not grow O(iters) (the classic iterative-algorithm failure mode on
  Spark).
* **Dangling mass is dropped** (hosts with no out-edges contribute
  nothing) — deterministic and portable; at web scale the usual
  redistribute-to-all correction is a scalar broadcast add, orthogonal to
  the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def host_authority(edges: DataFrame, iters: int = 5, damping_pct: int = 85,
                   checkpoint_every: int = 4) -> DataFrame:
    """PageRank over a (src, dst) host edge list. Returns
    (host, rank_nano: long) after ``iters`` iterations.

    r₀(h) = SCALE // N;
    rₜ₊₁(h) = (SCALE·(100−d)) // (100·N)
              + (d · Σ_{(u,h)∈E} (rₜ(u) // outdeg(u))) // 100
    — all integer ops, so Σ rank_nano is stable and reproducible.
    """
    # cache edges: hosts/outdeg derivation and every iteration's join re-read
    # it; without this the upstream edge derivation (e.g. a pages scan)
    # recomputes iters+2 times. Hosts come from the UNFILTERED edge list so
    # a host that appears only in self-loops still receives the base rank
    # (self-loops contribute no authority, but the host exists); only the
    # contribution edges drop self-loops.
    raw = edges.select("src", "dst").cache()
    hosts = (raw.select(F.col("src").alias("host"))
             .union(raw.select(F.col("dst").alias("host")))
             .distinct())
    n = hosts.count()  # driver scalar (graph cardinality), not row data
    if n == 0:
        # genuinely empty edge list: empty result, not ÷0
        raw.unpersist()
        return hosts.withColumn("rank_nano", F.lit(0).cast("long"))
    edges = raw.filter(F.col("src") != F.col("dst")).cache()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg")).cache()
    base = (SCALE * (100 - damping_pct)) // (100 * n)

    hosts = hosts.cache()
    r = hosts.withColumn("rank_nano", F.lit(SCALE // n).cast("long"))
    prev = None
    for i in range(iters):
        contrib = (edges
                   .join(r.withColumnRenamed("host", "src"), "src")
                   .join(outdeg, "src")
                   .select(F.col("dst").alias("host"),
                           F.expr("rank_nano DIV outdeg").alias("c")))
        sums = contrib.groupBy("host").agg(F.sum("c").alias("s"))
        r = (hosts.join(sums, "host", "left")
             .select("host",
                     (F.lit(base)
                      + F.expr(f"({damping_pct} * coalesce(s, 0)) DIV 100"))
                     .cast("long").alias("rank_nano")))
        if (i + 1) % checkpoint_every == 0 or i + 1 == iters:
            # truncate iterative lineage; the FINAL iteration checkpoints
            # too so callers receive a lineage-free host-cardinality frame
            # (cache+count kept the data hot but re-displayed the whole
            # loop subtree through InMemoryTableScan, defeating plan
            # audits and bloating downstream plan compilation)
            r = r.localCheckpoint(eager=True)
        else:
            r = r.cache()
            r.count()
        if prev is not None:
            prev.unpersist()
        prev = r
    # final r is materialized (cache+count above), so the inputs can go
    edges.unpersist()
    raw.unpersist()
    outdeg.unpersist()
    hosts.unpersist()
    return r


def hits(edges: DataFrame, iters: int = 3,
         checkpoint_every: int = 2) -> DataFrame:
    """HITS (Kleinberg hubs & authorities) over a (src, dst) host edge
    list — the complementary centrality to ``host_authority``'s PageRank:
    authorities are pages LINKED BY good hubs (directory/portal hosts),
    hubs are pages LINKING good authorities. Crawl schedulers use hub
    scores to prioritize frontier DISCOVERY (a good hub yields many good
    outlinks) and authority scores for fetch priority.

    Returns (host, hub_nano long, auth_nano long).

    Same execution discipline as ``host_authority``: integer arithmetic
    end-to-end (nano-scaled longs; each half-iteration renormalizes to
    Σ = SCALE via floor division, so results are order-independent and
    bit-identical to the relational oracle), Pregel-shaped joins
    (edges ⋈ scores shuffled on the join key, map-side partial sums),
    cached iterations with periodic + final localCheckpoint truncation.
    Self-loops are dropped from score flow like host_authority; hosts
    come from the unfiltered edge list.

    Normalization note: the classic L2 norm is irrational and engine-
    dependent; the documented convention is a SHIFT-DIVIDE L1
    normalization — ``score = raw DIV max(1, ceil(Σraw / SCALE))`` —
    which keeps every intermediate ≤ ~1e18 (no ``raw * SCALE`` product,
    which overflows int64 exactly where Spark wraps and DuckDB widens to
    HUGEINT, i.e. where the engines would silently disagree). Rankings
    are unchanged; Σ score ≈ SCALE up to floor loss.
    """
    raw = edges.select("src", "dst").cache()
    hosts = (raw.select(F.col("src").alias("host"))
             .union(raw.select(F.col("dst").alias("host")))
             .distinct().cache())
    n = hosts.count()
    if n == 0:
        raw.unpersist()
        return hosts.select(
            "host",
            F.lit(0).cast("long").alias("hub_nano"),
            F.lit(0).cast("long").alias("auth_nano"))
    e = raw.filter(F.col("src") != F.col("dst")).cache()
    s = hosts.select(
        "host",
        F.lit(SCALE // n).cast("long").alias("hub_nano"),
        F.lit(SCALE // n).cast("long").alias("auth_nano"))
    prev = None
    for i in range(iters):
        # auth(v) = Σ hub(u) over in-edges, then L1-normalize to SCALE
        a = (e.join(s.select(F.col("host").alias("src"),
                             F.col("hub_nano")), "src")
             .groupBy(F.col("dst").alias("host"))
             .agg(F.sum("hub_nano").alias("raw_auth")))
        a_tot = a.agg(F.sum("raw_auth").alias("__t"))
        a = (a.join(F.broadcast(a_tot))
             .select("host", F.expr(
                 f"CAST(raw_auth DIV greatest(CAST(1 AS BIGINT),"
                 f" (__t + {SCALE - 1}) DIV {SCALE}) AS BIGINT)")
                 .alias("auth_nano")))
        # hub(u) = Σ auth(v) over out-edges, normalized likewise
        h = (e.join(a.select(F.col("host").alias("dst"),
                             F.col("auth_nano").alias("na")), "dst")
             .groupBy(F.col("src").alias("host"))
             .agg(F.sum("na").alias("raw_hub")))
        h_tot = h.agg(F.sum("raw_hub").alias("__t"))
        h = (h.join(F.broadcast(h_tot))
             .select("host", F.expr(
                 f"CAST(raw_hub DIV greatest(CAST(1 AS BIGINT),"
                 f" (__t + {SCALE - 1}) DIV {SCALE}) AS BIGINT)")
                 .alias("hub_nano")))
        s = (hosts
             .join(h, "host", "left")
             .join(a, "host", "left")
             .select("host",
                     F.coalesce("hub_nano", F.lit(0)).cast("long")
                     .alias("hub_nano"),
                     F.coalesce("auth_nano", F.lit(0)).cast("long")
                     .alias("auth_nano")))
        if (i + 1) % checkpoint_every == 0 or i + 1 == iters:
            s = s.localCheckpoint(eager=True)
        else:
            s = s.cache()
            s.count()
        if prev is not None:
            prev.unpersist()
        prev = s
    e.unpersist()
    raw.unpersist()
    hosts.unpersist()
    return s


def opic_importance(edges: DataFrame, rounds: int = 5,
                    checkpoint_every: int = 4) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda,
    Cobena, WWW'03) over a (src, dst) host edge list; the batch
    synchronous variant. Returns (host, importance_nano: long).

    Why it exists beside ``host_authority``: PageRank needs the whole
    graph and converged iterations before any score is usable; OPIC's
    cash/history pair gives a usable importance estimate for a node the
    moment it is first seen — the crawl-scheduler-friendly member of the
    family (importance accrues WHILE crawling). The batch rounds here
    replay that accrual deterministically over a fixed edge snapshot.

    Integer semantics (bit-identical to the DuckDB oracle):
    cash₀ = SCALE // n, hist₀ = 0; each round, synchronously:

    * every host sends ``cash DIV outdeg`` along each out-edge
      (self-loops dropped, as in host_authority);
    * the division REMAINDER, plus the full cash of dangling hosts
      (no out-edges), goes to the virtual node, redistributed uniformly
      next round as ``V DIV n`` (the ≤ n−1 nano leftover of that
      division is dropped — documented determinism convention);
    * hist += the cash held at the round's start.

    importance = hist + cash after ``rounds``.

    Plan shape = host_authority's Pregel loop plus one 1-row broadcast
    per round (the virtual-node total — the same "corpus scalar as a
    broadcast join" idiom as recrawl_schedule's now): edges ⋈ cash on
    src → groupBy dst partial sums; lineage truncated every
    ``checkpoint_every`` rounds.
    """
    raw = edges.select("src", "dst").cache()
    hosts = (raw.select(F.col("src").alias("host"))
             .union(raw.select(F.col("dst").alias("host")))
             .distinct())
    n = hosts.count()  # driver scalar (graph cardinality), not row data
    if n == 0:
        raw.unpersist()
        return hosts.withColumn("importance_nano", F.lit(0).cast("long"))
    e = raw.filter(F.col("src") != F.col("dst")).cache()
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg")).cache()
    hosts = hosts.cache()
    state = hosts.withColumn("cash", F.lit(SCALE // n).cast("long")) \
                 .withColumn("hist", F.lit(0).cast("long"))
    prev = None
    for i in range(rounds):
        contrib = (e
                   .join(state.select(F.col("host").alias("src"), "cash"),
                         "src")
                   .join(outdeg, "src")
                   .select(F.col("dst").alias("host"),
                           F.expr("cash DIV outdeg").alias("c")))
        sums = contrib.groupBy("host").agg(F.sum("c").alias("s"))
        vrow = (state
                .join(outdeg.withColumnRenamed("src", "host"),
                      "host", "left")
                .agg(F.sum(
                    F.when(F.col("outdeg").isNull(), F.col("cash"))
                    .otherwise(F.col("cash") % F.col("outdeg")))
                    .cast("long").alias("v")))
        state = (state
                 .join(sums, "host", "left")
                 .join(F.broadcast(vrow))
                 .select(
                     "host",
                     (F.coalesce(F.col("s"), F.lit(0))
                      + F.expr(f"v DIV {n}")).cast("long").alias("cash"),
                     (F.col("hist") + F.col("cash")).cast("long")
                     .alias("hist")))
        if (i + 1) % checkpoint_every == 0 or i + 1 == rounds:
            state = state.localCheckpoint(eager=True)
        else:
            state = state.cache()
            state.count()
        if prev is not None:
            prev.unpersist()
        prev = state
    out = state.select(
        "host", (F.col("hist") + F.col("cash")).cast("long")
        .alias("importance_nano"))
    for df in (raw, e, outdeg, hosts):
        df.unpersist()
    return out
