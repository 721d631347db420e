"""Integer PageRank (operators/graph.py) vs a pure-Python reference —
exact equality is the point: every step is floor-division + long sums, so
the distributed result must be bit-identical to the sequential one."""

from __future__ import annotations

from chrono_scraper_spark.operators.graph import SCALE, host_authority


def py_pagerank(edges, iters, damping_pct=85):
    edges = [(s, d) for s, d in edges if s != d]
    hosts = sorted({h for e in edges for h in e})
    n = len(hosts)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (SCALE * (100 - damping_pct)) // (100 * n)
    r = {h: SCALE // n for h in hosts}
    for _ in range(iters):
        sums = {h: 0 for h in hosts}
        for s, d in edges:
            sums[d] += r[s] // outdeg[s]
        r = {h: base + (damping_pct * sums[h]) // 100 for h in hosts}
    return r


EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
         ("b", "a"), ("d", "d")]          # self-loop must be dropped


def test_host_authority_matches_python_reference(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["host"]: r["rank_nano"]
           for r in host_authority(df, iters=5).collect()}
    assert got == py_pagerank(EDGES, iters=5)


def test_host_authority_lineage_truncation_path(spark):
    # 9 iterations crosses the localCheckpoint boundary twice
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {r["host"]: r["rank_nano"]
           for r in host_authority(df, iters=9,
                                   checkpoint_every=3).collect()}
    assert got == py_pagerank(EDGES, iters=9)


def test_host_authority_empty_and_self_loop_only(spark):
    """n=0 guard: an empty edge list returns an empty (host, rank_nano)
    frame instead of ZeroDivisionError. Hosts that appear ONLY in
    self-loops still exist in the graph — they receive the base
    (teleport) rank rather than silently disappearing (self-loops
    contribute no authority)."""
    empty = spark.createDataFrame([], "src string, dst string")
    out = host_authority(empty, iters=3)
    assert out.columns == ["host", "rank_nano"]
    assert out.count() == 0
    loops = spark.createDataFrame([("a", "a"), ("b", "b")], ["src", "dst"])
    got = {r["host"]: r["rank_nano"]
           for r in host_authority(loops, iters=3).collect()}
    base = (SCALE * 15) // (100 * 2)
    assert got == {"a": base, "b": base}


def test_host_authority_rank_mass_conserved_modulo_floor(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    total = sum(r["rank_nano"]
                for r in host_authority(df, iters=5).collect())
    # floor-division drops at most a few units per host per iteration
    assert SCALE * 0.9 < total <= SCALE
