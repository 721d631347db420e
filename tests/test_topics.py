"""Topic/clustering operators (operators/topics.py) — TF-IDF, cosine
k-means, cluster cohesion — checked against an independent pure-Python
twin that follows the documented conventions (smooth idf, micro-quantized
integer weights, md5 seeding, floor-nano cosine, sum centroids), plus a
planted-topic purity test and plan-shape assertions.

Test docs use only ASCII [a-z0-9 ] so the Python tokenizer twin
(``[^a-z0-9]+`` after lower()) matches the engine's unicode
``[^\\p{L}\\p{N}]+`` split exactly.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest

from chrono_scraper_spark.operators import topics as TP

# ---------------------------------------------------------------------------
# pure-Python twin
# ---------------------------------------------------------------------------


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def py_tfidf(docs, min_df=2, max_df_frac=0.8, max_features=1000):
    """docs: list[(doc_id, text)] → (weights {(d, t): w_int}, norm2 {d})."""
    tf: Counter = Counter()
    for d, text in docs:
        for t in _toks(text):
            tf[(d, t)] += 1
    df: Counter = Counter()
    cf: Counter = Counter()
    for (d, t), c in tf.items():
        df[t] += 1
        cf[t] += c
    n = len({d for (d, _t) in tf})
    vocab = [t for t in df
             if min_df <= df[t] <= math.floor(max_df_frac * n)]
    vocab = sorted(vocab, key=lambda t: (-cf[t], t))[:max_features]
    idf = {t: math.floor((math.log((1 + n) / (1 + df[t])) + 1) * 1e6)
           for t in vocab}
    w = {(d, t): c * idf[t] for (d, t), c in tf.items() if t in idf}
    norm2: dict = {}
    for (d, _t), x in sorted(w.items()):
        norm2[d] = norm2.get(d, 0) + x * x
    return w, norm2


def py_kmeans(docs, k=3, iters=2, **tfidf_kw):
    """Exact twin of kmeans_clusters: returns {doc_id: (cid, cos_nano)}."""
    w, norm2 = py_tfidf(docs, **tfidf_kw)
    seeds = sorted(norm2, key=lambda d: (hashlib.md5(
        str(d).encode()).hexdigest(), d))[:k]
    cent = {}  # (cid, term) -> int
    for cid, d in enumerate(seeds):
        for (dd, t), x in w.items():
            if dd == d:
                cent[(cid, t)] = x
    assign: dict = {}
    for step in range(iters):
        cn2: dict = {}
        for (cid, _t), x in cent.items():
            cn2[cid] = cn2.get(cid, 0) + x * x
        dots: dict = {}
        for (d, t), x in w.items():
            for cid in cn2:
                cx = cent.get((cid, t))
                if cx is not None:
                    dots[(d, cid)] = dots.get((d, cid), 0) + x * cx
        sims: dict = {}
        for (d, cid), dot in dots.items():
            cos = float(dot) / (math.sqrt(float(norm2[d]))
                                * math.sqrt(float(cn2[cid])))
            sims.setdefault(d, []).append(
                (-math.floor(cos * 1e9), cid))
        assign = {}
        for d, cands in sims.items():
            neg, cid = min(cands)
            assign[d] = (cid, -neg)
        if step < iters - 1:
            cent = {}
            for (d, t), x in w.items():
                if d in assign:
                    cid = assign[d][0]
                    cent[(cid, t)] = cent.get((cid, t), 0) + x
    return assign


# ---------------------------------------------------------------------------
# corpora
# ---------------------------------------------------------------------------

CORPUS = [
    (0, "solar panels convert sunlight energy solar grid power energy"),
    (1, "wind turbine energy power grid turbine blades spin wind wind"),
    (2, "solar energy storage battery grid solar power sunlight"),
    (3, "bread flour yeast oven bake bread crust dough flour"),
    (4, "dough yeast flour bake oven bread loaf crumb bake"),
    (5, "oven bake crust bread dough loaf flour proof yeast"),
    (6, "goalkeeper football match score goal penalty match football"),
    (7, "football penalty score goal match referee goal goal"),
    (8, "unique singleton vocabulary onlyhere neveragain"),  # all df=1
    (9, ""),                                                 # empty
    (10, "solar wind bread football energy flour goal turbine"),  # mixed
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


def test_tfidf_topk_matches_python(spark):
    got = {(r.doc_id, r.rnk): (r.term, r.tf, r.weight)
           for r in TP.tfidf_topk(_df(spark, CORPUS), k=3).collect()}
    w, norm2 = py_tfidf(CORPUS)
    by_doc: dict = {}
    for (d, t), x in w.items():
        by_doc.setdefault(d, []).append((-x, t))
    want = {}
    for d, items in by_doc.items():
        for rnk, (negx, t) in enumerate(sorted(items)[:3], start=1):
            tfv = Counter(_toks(dict(CORPUS)[d]))[t]
            want[(d, rnk)] = (t, tfv, -negx / math.sqrt(float(norm2[d])))
    assert set(got) == set(want)
    for key, (t, tfv, wt) in want.items():
        gt, gtf, gw = got[key]
        assert (gt, gtf) == (t, tfv)
        assert math.isclose(gw, wt, rel_tol=0, abs_tol=1e-6)


def test_tfidf_vocab_pruning(spark):
    # 'common' in 10/10 docs with text → pruned at max_df 0.8; singleton
    # terms (df=1) pruned by min_df=2; doc 8 becomes empty → absent.
    rows = [(i, f"common shared{i % 2} only{i}") for i in range(10)]
    out = TP.tfidf_terms(_df(spark, rows))
    terms = {r.term for r in out.collect()}
    assert "common" not in terms            # max_df prune
    assert not any(t.startswith("only") for t in terms)  # min_df prune
    assert terms == {"shared0", "shared1"}

    # max_features cap keeps the top-cf terms with term tie-break
    rows2 = [(i, "aaa bbb " + ("ccc " if i % 2 else "")) for i in range(6)]
    capped = TP.tfidf_terms(_df(spark, rows2), max_df_frac=1.0,
                            max_features=2)
    assert {r.term for r in capped.collect()} == {"aaa", "bbb"}


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def test_kmeans_matches_python_twin(spark):
    got = {r.doc_id: (r.cluster_id, r.cos_sim)
           for r in TP.kmeans_clusters(
               _df(spark, CORPUS), k=3, iters=2).collect()}
    want = py_kmeans(CORPUS, k=3, iters=2)
    assert set(got) == set(want)
    for d, (cid, cos_nano) in want.items():
        assert got[d][0] == cid
        assert math.isclose(got[d][1], round(cos_nano / 1e9, 6),
                            rel_tol=0, abs_tol=1e-9)


def test_kmeans_planted_purity(spark):
    """30 docs in 3 orthogonal-vocabulary groups; group = md5-rank % 3 so
    the three deterministic seeds land in distinct groups → perfect
    purity. A background term shared by all docs (max_df_frac=1.0 keeps
    it) guarantees every doc has a defined cosine to every centroid."""
    ids = list(range(100, 130))
    ranked = sorted(ids, key=lambda d: hashlib.md5(
        str(d).encode()).hexdigest())
    group = {d: i % 3 for i, d in enumerate(ranked)}
    vocab = {0: "quark lepton boson hadron",
             1: "sonnet stanza meter rhyme",
             2: "glacier moraine crevasse serac"}
    rows = [(d, f"{vocab[group[d]]} filler common {vocab[group[d]]}")
            for d in ids]
    out = TP.kmeans_clusters(_df(spark, rows), k=3, iters=2,
                             max_df_frac=1.0)
    cl = {r.doc_id: r.cluster_id for r in out.collect()}
    assert set(cl) == set(ids)
    by_group: dict = {}
    for d, cid in cl.items():
        by_group.setdefault(group[d], set()).add(cid)
    assert all(len(cids) == 1 for cids in by_group.values())
    assert len({next(iter(c)) for c in by_group.values()}) == 3


# ---------------------------------------------------------------------------
# cohesion
# ---------------------------------------------------------------------------


def test_cohesion_matches_pairwise(spark):
    out = {r.cluster_id: r for r in TP.cluster_cohesion(
        _df(spark, CORPUS), k=3, iters=2).collect()}
    w, norm2 = py_tfidf(CORPUS)
    assign = py_kmeans(CORPUS, k=3, iters=2)
    vecs: dict = {}
    for (d, t), x in w.items():
        vecs.setdefault(d, {})[t] = x / math.sqrt(float(norm2[d]))
    members: dict = {}
    for d, (cid, _c) in assign.items():
        members.setdefault(cid, []).append(d)
    for cid, docs in members.items():
        r = out[cid]
        assert r.n_docs == len(docs)
        if len(docs) == 1:
            assert r.cohesion == 1.0
            continue
        sims = []
        for i, a in enumerate(docs):
            for b in docs[i + 1:]:
                va, vb = vecs[a], vecs[b]
                sims.append(sum(va[t] * vb[t] for t in va if t in vb))
        want = sum(sims) * 2 / (len(docs) * (len(docs) - 1))
        assert math.isclose(r.cohesion, want, rel_tol=0, abs_tol=1e-5)
        # top_terms ranked by summed component desc
        assert len(r.top_terms.split(" ")) <= 10


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_plans_broadcast_not_shuffle(spark):
    d = _df(spark, CORPUS)
    # vocab (≤ max_features rows) joins back via broadcast — doc term
    # counts are never shuffled for the idf join
    p1 = _plan(TP.tfidf_terms(d))
    assert "BroadcastHashJoin" in p1
    # centroid similarity join is broadcast on term; no cartesian
    p2 = _plan(TP.kmeans_clusters(d, k=3, iters=2))
    assert "BroadcastHashJoin" in p2
    assert "CartesianProduct" not in p2
    # the only nested-loop joins are the 1-row n_docs literal carried
    # into the max_df bound (plan-level literal, same pattern as
    # strip_boilerplate's frequent-set array)
    for line in p2.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "_n_docs" in line


@pytest.mark.parametrize("iters", [1, 3])
def test_kmeans_iters_parity(spark, iters):
    got = {r.doc_id: r.cluster_id for r in TP.kmeans_clusters(
        _df(spark, CORPUS), k=2, iters=iters).collect()}
    want = {d: v[0] for d, v in py_kmeans(CORPUS, k=2, iters=iters).items()}
    assert got == want


# ---------------------------------------------------------------------------
# DBSCAN
# ---------------------------------------------------------------------------


def py_dbscan(vecs: dict, eps: float, min_samples: int):
    """O(n²) twin with the documented conventions (self-counting degree,
    min-id core labels, border → min core-neighbor cluster, noise=-1)."""
    import itertools

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return num / (na * nb)

    nbrs = {i: set() for i in vecs}
    for i, j in itertools.combinations(sorted(vecs), 2):
        if cos(vecs[i], vecs[j]) >= 1.0 - eps:
            nbrs[i].add(j)
            nbrs[j].add(i)
    deg = {i: len(nbrs[i]) + 1 for i in vecs}
    core = {i for i in vecs if deg[i] >= min_samples}
    # CC over core-core edges (min label fixpoint)
    label = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for i in core:
            for j in nbrs[i] & core:
                m = min(label[i], label[j])
                if label[i] != m or label[j] != m:
                    label[i] = label[j] = m
                    changed = True
    out = {}
    for i in vecs:
        if i in core:
            out[i] = (label[i], "core", deg[i])
        else:
            cand = [label[j] for j in nbrs[i] if j in core]
            if cand:
                out[i] = (min(cand), "border", deg[i])
            else:
                out[i] = (-1, "noise", deg[i])
    return out


def test_dbscan_planted(spark):
    """Two planted dense blobs, one border point, one noise point, one
    isolated core pair (below min_samples → noise)."""
    base_a = [1.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.0]
    vecs = {
        # blob A: tight around base_a (pairwise cos ≈ 1)
        1: [1.0, 0.02, 0.0, 0.0],
        2: [1.0, -0.02, 0.0, 0.0],
        3: [1.0, 0.0, 0.02, 0.0],
        # blob B
        10: [0.02, 1.0, 0.0, 0.0],
        11: [-0.02, 1.0, 0.0, 0.0],
        12: [0.0, 1.0, 0.02, 0.0],
        # border: close to blob A's point 1 only (cos(b,1)≈0.93 via mix)
        20: [0.8, 0.0, 0.6, 0.0],
        # noise: orthogonal to everything
        30: [0.0, 0.0, 0.0, 1.0],
        # pair: mutually close but degree 2 < min_samples → noise
        40: [0.0, 0.0, 0.7, 0.7],
        41: [0.0, 0.0, 0.7, 0.72],
    }
    eps, ms = 0.2, 3
    want = py_dbscan(vecs, eps, ms)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    got = {r.vec_id: (r.cluster, r.role, r.n_neighbors)
           for r in __import__("chrono_scraper_spark.operators.topics",
                               fromlist=["topics"])
           .dbscan(df, eps=eps, min_samples=ms).collect()}
    assert got == want
    # semantic spot-checks, independent of the twin
    assert got[1] == (1, "core", 4) or got[1][1] == "core"
    assert {got[i][0] for i in (1, 2, 3)} == {1}
    assert {got[i][0] for i in (10, 11, 12)} == {10}
    assert got[20][1] == "border" and got[20][0] == 1
    assert got[30] == (-1, "noise", 1)
    assert got[40][1] == "noise" and got[41][1] == "noise"


def test_dbscan_random_matches_twin(spark):
    """Deterministic pseudo-random corpus, mid-range eps: exact parity
    with the O(n²) twin across roles, labels, and degrees."""
    import random

    rnd = random.Random(42)
    vecs = {i: [rnd.uniform(-1, 1) for _ in range(8)] for i in range(60)}
    eps, ms = 0.40, 4  # yields 29 core / 20 border / 11 noise
    want = py_dbscan(vecs, eps, ms)
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    from chrono_scraper_spark.operators import topics as TP

    got = {r.vec_id: (r.cluster, r.role, r.n_neighbors)
           for r in TP.dbscan(df, eps=eps, min_samples=ms).collect()}
    assert got == want
    assert any(v[1] == "core" for v in got.values())
    assert any(v[1] == "noise" for v in got.values())


# ---------------------------------------------------------------------------
# topic_assign + LDA bridge
# ---------------------------------------------------------------------------


def test_topic_assign_semantics(spark):
    """Hand-built topic models: known assignments, OOV floor, ties →
    lowest topic id, absent token-less docs."""
    topics = spark.createDataFrame(
        [(0, "solar", 8), (0, "energy", 4),
         (1, "bread", 8), (1, "oven", 4)],
        "topic_id long, term string, cnt long")
    docs = spark.createDataFrame(
        [(1, "solar solar energy"),       # → topic 0
         (2, "bread oven bread"),         # → topic 1
         (3, "zzz yyy xxx"),              # all OOV: equal scores → topic 0
         (4, "")],                        # token-less → absent
        "doc_id long, text string")
    from chrono_scraper_spark.operators.topics import topic_assign

    got = {r.doc_id: r for r in topic_assign(docs, topics).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].topic_id == 0 and got[2].topic_id == 1
    assert got[3].topic_id == 0          # deterministic tie-break
    assert got[1].n_tokens == 3
    # exact score: totals are 12 each, V=4 → p(solar|0)=(8+1)/16
    import math as m
    lp = (2 * m.floor(m.log10(9 / 16) * 1e9)
          + m.floor(m.log10(5 / 16) * 1e9))
    assert abs(got[1].mean_logprob - round(lp / 3 / 1e9, 6)) < 1e-9
    # OOV doc's score = 3 × floor(log10(1/16)·1e9) / 3
    oov = m.floor(m.log10(1 / 16) * 1e9)
    assert abs(got[3].mean_logprob - round(oov / 1e9, 6)) < 1e-9


def test_lda_bridge_planted_topics(spark):
    """3 orthogonal-vocab groups × 8 docs → LDA(k=3, em, seed) recovers
    topics whose top terms separate the planted vocabularies."""
    vocab = {0: ["quark", "lepton", "boson"],
             1: ["sonnet", "stanza", "meter"],
             2: ["glacier", "moraine", "crevasse"]}
    rows = []
    for g, words in vocab.items():
        for i in range(8):
            rows.append((g * 10 + i,
                         " ".join(words * 3) + f" filler{i % 2}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from chrono_scraper_spark.operators.topics import lda_topics

    out = lda_topics(df, k=3, vocab_size=50, min_df=2.0, max_iter=30,
                     top_terms=3)
    rows_out = out.collect()
    assert {(r.topic_id, r.rank) for r in rows_out} == {
        (t, r) for t in range(3) for r in (1, 2, 3)}
    assert all(r.weight_milli >= 0 for r in rows_out)
    # each topic's top-3 terms should be dominated by one planted group
    by_topic: dict = {}
    for r in rows_out:
        by_topic.setdefault(r.topic_id, []).append(r.term)
    groups_hit = set()
    for terms in by_topic.values():
        for g, words in vocab.items():
            if sum(t in words for t in terms) >= 2:
                groups_hit.add(g)
    assert len(groups_hit) >= 2   # EM from one seed: ≥2 clean topics
