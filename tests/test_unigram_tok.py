"""Unigram-LM tokenizer training (operators/unigram_tok.py): exact
python-twin parity for the full EM+prune orchestration, Viterbi DP unit
cases, and encode invariants."""

from __future__ import annotations

import math
import re
from collections import Counter

from chrono_scraper_spark.functions import textops as T
from chrono_scraper_spark.operators.unigram_tok import (
    NANO,
    _viterbi,
    train_unigram,
    unigram_encode,
)

TEXTS = [
    "the data pipeline processes the data stream",
    "data pipelines stream data to the data lake",
    "the stream processes data and the data stream grows",
    "a small corpus with repeated data stream words",
]


def _tokens(text: str) -> list[str]:
    # Python-re twin of textops.TOKEN_SPLIT_RE ([^\p{L}\p{N}]+ — Java
    # syntax; the test corpus is ASCII so [^a-z0-9]+ is equivalent)
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _twin_train(texts, vocab_size=40, max_piece_len=6, seed_size=100,
                em_iters=2, prune_frac_ppm=200_000, min_seed_count=2):
    words = Counter()
    for t in texts:
        words.update(_tokens(t))

    # seed: substring occurrence counts
    sub = Counter()
    for w, wc in words.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                sub[w[i:i + ln]] += wc
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi_sorted = sorted(
        ((p, c) for p, c in sub.items()
         if len(p) > 1 and c >= min_seed_count),
        key=lambda x: (-x[1], x[0]))[:seed_size]
    pieces = dict(chars)
    pieces.update(dict(multi_sorted))

    for _ in range(em_iters):
        tot = sum(pieces.values())
        model = {p: math.floor(math.log(c / tot) * NANO)
                 for p, c in pieces.items()}
        floor = min(model.values()) - NANO
        counts = Counter()
        for w, wc in words.items():
            for p in _viterbi(w, model, max_piece_len, floor):
                counts[p] += wc
        new = {}
        for p in chars:                      # chars always survive, min 1
            new[p] = counts.get(p, 1) if counts.get(p, 0) <= 0 \
                else counts[p]
        for p, c in counts.items():
            if len(p) > 1 and c > 0:
                new[p] = c
        n_now = len(new)
        prunable = [(p, c) for p, c in new.items() if len(p) > 1]
        drop = min(len(prunable),
                   max(0, min(n_now - vocab_size,
                              (len(prunable) * prune_frac_ppm)
                              // 1_000_000)))
        if drop > 0:
            # (count asc, piece desc) via a stable two-pass sort
            doomed = sorted(sorted(prunable, key=lambda x: x[0],
                                   reverse=True),
                            key=lambda x: x[1])[:drop]
            for p, _c in doomed:
                del new[p]
        pieces = new

    if len(pieces) > vocab_size:
        n_chars = sum(1 for p in pieces if len(p) == 1)
        keep = sorted(((p, c) for p, c in pieces.items() if len(p) > 1),
                      key=lambda x: (-x[1], x[0]))[:max(0, vocab_size
                                                        - n_chars)]
        pieces = {p: c for p, c in pieces.items() if len(p) == 1}
        pieces.update(dict(keep))

    tot = sum(pieces.values())
    out = {p: math.floor(math.log(c / tot) * NANO)
           for p, c in pieces.items()}
    ranked = sorted(out.items(), key=lambda x: (-x[1], x[0]))
    return {p: (lp, i + 1) for i, (p, lp) in enumerate(ranked)}


def test_viterbi_dp():
    logp = {"ab": -10, "a": -30, "b": -30, "abc": -35, "c": -5}
    # ab+c = -15 beats abc = -35 and a+b+c = -65
    assert _viterbi("abc", logp, 3, -100) == ["ab", "c"]
    # unknown char takes the floor
    assert _viterbi("axb", logp, 3, -100) == ["a", "x", "b"]
    # tie on score -> fewer pieces wins
    assert _viterbi("ab", {"ab": -60, "a": -30, "b": -30}, 2, -100) == ["ab"]
    # score and count tie -> lexicographically smaller sequence
    assert _viterbi("ab", {"ab": -60}, 1, -30) == ["a", "b"]


def test_train_unigram_matches_python_twin(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = {r["piece"]: (r["logp_nano"], r["piece_rank"])
           for r in train_unigram(docs, vocab_size=40, em_iters=2,
                                  seed_size=100).collect()}
    want = _twin_train(TEXTS)
    assert got == want


def test_train_unigram_deterministic_and_char_complete(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    a = sorted(map(tuple, train_unigram(docs, vocab_size=30).collect()))
    b = sorted(map(tuple, train_unigram(
        docs.repartition(7), vocab_size=30).collect()))
    assert a == b                        # partitioning-independent
    vocab = {t[0] for t in a}
    all_chars = {c for t in TEXTS for w in _tokens(t) for c in w}
    assert all_chars <= vocab            # every char survives pruning


def test_unigram_encode_reconstructs_text(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    pieces = train_unigram(docs, vocab_size=40)
    enc = {r["doc_id"]: r for r in unigram_encode(docs, pieces).collect()}
    for i, t in enumerate(TEXTS):
        joined = "".join(enc[i]["pieces"])
        assert joined == "".join(_tokens(t))
        assert enc[i]["n_pieces"] == len(enc[i]["pieces"])
