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


def test_hits_planted_structure(spark):
    """A directory host linking all three content hosts must out-hub a
    host linking one; the doubly-linked content host must out-authority
    the singly-linked ones."""
    from chrono_scraper_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [("hub.example", "a1"), ("hub.example", "a2"), ("hub.example", "a3"),
         ("minor.example", "a1")],
        "src string, dst string")
    got = {r["host"]: (r["hub_nano"], r["auth_nano"])
           for r in hits(edges, iters=3).collect()}
    assert got["hub.example"][0] > got["minor.example"][0]
    assert got["a1"][1] > got["a2"][1] == got["a3"][1]
    # pure authorities have zero hub score; pure hubs zero authority
    assert got["a1"][0] == 0 and got["hub.example"][1] == 0


def test_hits_empty_and_selfloop_graphs(spark):
    from chrono_scraper_spark.operators.graph import hits

    empty = spark.createDataFrame([], "src string, dst string")
    assert hits(empty).count() == 0
    # self-loop-only: hosts exist, no score flow -> all zeros, no div-0
    loops = spark.createDataFrame([("a", "a"), ("b", "b")],
                                  "src string, dst string")
    got = {r["host"]: (r["hub_nano"], r["auth_nano"])
           for r in hits(loops, iters=2).collect()}
    assert got == {"a": (0, 0), "b": (0, 0)}


def test_hits_deterministic_across_partitionings(spark):
    """Integer shift-divide normalization => bit-identical results for
    1-partition vs many-partition inputs."""
    from chrono_scraper_spark.operators.graph import hits

    rows = [(f"s{i % 7}", f"d{(i * 3) % 11}") for i in range(60)]
    e1 = spark.createDataFrame(rows, "src string, dst string").coalesce(1)
    e2 = spark.createDataFrame(rows, "src string, dst string") \
        .repartition(16)
    r1 = {tuple(r) for r in hits(e1, iters=3).collect()}
    r2 = {tuple(r) for r in hits(e2, iters=3).collect()}
    assert r1 == r2


# ---------------------------------------------------------------------------
# OPIC
# ---------------------------------------------------------------------------

def test_opic_hand_computed(spark):
    """Two rounds over {A<->B, C dangling (self-loop only)} match the
    hand-derived integer cash/history values exactly."""
    from chrono_scraper_spark.operators.graph import opic_importance

    edges = spark.createDataFrame(
        [("A", "B"), ("B", "A"), ("A", "A"), ("C", "C")],
        "src string, dst string")
    got = {r["host"]: r["importance_nano"]
           for r in opic_importance(edges, rounds=2).collect()}
    # n=3, c0=333333333333; r1: V=C's cash -> V//3=111111111111,
    # c1={A,B:444444444444, C:111111111111}, h1=333333333333 each;
    # r2: V=111111111111 -> 37037037037,
    # c2={A,B:481481481481, C:37037037037}, h2={A,B:777777777777,
    # C:444444444444}; importance = h2 + c2
    assert got == {"A": 1259259259258, "B": 1259259259258,
                   "C": 481481481481}


def test_opic_cash_conservation_and_order(spark):
    """Total importance stays near rounds+1 SCALE-units (only the
    documented <=n-1 nano virtual-division drop per round leaks), and a
    hub out-ranks a leaf."""
    from chrono_scraper_spark.operators.graph import SCALE, opic_importance

    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a"),
         ("a", "b")],
        "src string, dst string")
    rows = opic_importance(edges, rounds=4).collect()
    got = {r["host"]: r["importance_nano"] for r in rows}
    n, rounds = 4, 4
    # hist accrues each round's held cash (~SCALE per round); cash ~SCALE
    total = sum(got.values())
    expect = SCALE * (rounds + 1)
    assert expect - n * rounds * 2 <= total <= expect
    assert got["hub"] > got["c"]


def test_opic_empty_edges(spark):
    from chrono_scraper_spark.operators.graph import opic_importance

    edges = spark.createDataFrame([], "src string, dst string")
    assert opic_importance(edges, rounds=2).count() == 0
