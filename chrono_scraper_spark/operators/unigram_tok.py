"""Unigram-LM tokenizer training (SentencePiece's unigram model,
Kudo 2018, arXiv:1804.10959) — the third tokenizer-training family next
to ``quality.bpe_train`` (merge learning) and ``quality.wordpiece_encode``
(greedy longest-match application).

Scale design (same discipline as bpe_train): ALL the iterative work runs
on the Zipf-bounded WORD-FREQUENCY table (10⁵-10⁷ rows at any corpus
size), never the corpus — the corpus is touched exactly once for the
word count. Each EM round is:

* E-step: per-word Viterbi segmentation under the current piece
  log-probs — an Arrow-batched pandas UDF over the word table with the
  piece table BROADCAST as a plain dict (pieces are ≤ ~10⁵ entries).
  Per-word DP is O(len · max_piece_len); Python is confined to the
  bounded table, exactly like the reference's kernel UDFs.
* M-step: explode the winning segmentations → weighted piece-count
  aggregation (map-side partials) → renormalize.
* Prune: drop the lowest-probability pieces toward ``vocab_size``
  (never single characters — they guarantee every word stays
  segmentable), the unigram analog of Kudo §3.2's EM+prune loop.

Determinism (the property SentencePiece itself does NOT guarantee across
platforms): log-probs are nano-quantized integers
(``floor(ln(count/total)·1e9)``), the DP maximizes an exact integer sum,
and every tie breaks (fewer pieces, then lexicographic piece sequence).
Training is therefore bit-reproducible across runs, partitionings, and
word orders. Out-of-vocabulary single characters score
``min(piece logp) − 1e9`` (a disclosed unk penalty).

Iterations are FIXED-count (EM likelihood monotonicity makes early
convergence common but data-dependent; a fixed budget keeps replays
identical). Not single-SQL-expressible (iterative EM + per-word DP) —
the contract entry is rows-only, with python-twin parity tests carrying
value correctness, same convention as ``bpe_merges``.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions import textops as T

NANO = 1_000_000_000


def _viterbi(word: str, logp: dict[str, int], max_len: int,
             floor: int) -> list[str]:
    """Best segmentation of ``word`` under integer piece log-probs.
    Maximizes Σ logp; ties → fewer pieces → lexicographic sequence.
    Single chars absent from ``logp`` get ``floor``."""
    n = len(word)
    # best[i] = (score, -n_pieces, seq_tuple) for word[:i]
    best: list[tuple | None] = [None] * (n + 1)
    best[0] = (0, 0, ())

    def _better(a: tuple, b: tuple) -> bool:
        if a[0] != b[0]:
            return a[0] > b[0]          # higher score
        if a[1] != b[1]:
            return a[1] > b[1]          # fewer pieces
        return a[2] < b[2]              # lexicographically smaller sequence

    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = floor
            sc = (best[j][0] + lp, best[j][1] - 1, best[j][2] + (piece,))
            if cand is None or _better(sc, cand):
                cand = sc
        best[i] = cand
    assert best[n] is not None
    return list(best[n][2])


def train_unigram(docs: DataFrame, vocab_size: int = 200,
                  text_col: str = "text", max_piece_len: int = 6,
                  seed_size: int = 2000, em_iters: int = 2,
                  prune_frac_ppm: int = 200_000,
                  min_seed_count: int = 2) -> DataFrame:
    """Train a unigram-LM piece vocabulary. Returns
    (piece, logp_nano long, piece_rank) — ``piece_rank`` orders by
    (logp desc, piece asc), stable across engines.

    ``prune_frac_ppm``: fraction (ppm) of prunable pieces dropped per
    round after each EM pass, until ``vocab_size`` remains."""
    spark = docs.sparkSession
    words = (docs
             .select(F.explode(T.tokens(F.col(text_col))).alias("w"))
             .groupBy("w").agg(F.count("*").alias("wc"))
             .localCheckpoint(eager=True))  # the ONLY corpus pass

    # ---- seed: substring occurrence counts over the word table (JVM) ----
    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.transform(
            F.sequence(
                F.lit(0),
                F.least(F.lit(max_piece_len - 1), F.length("w") - i)),
            lambda k: F.substring(F.col("w"), i.cast("int"), (k + 1).cast("int")))))
    sub_counts = (words.select(F.explode(subs).alias("p"), "wc")
                  .groupBy("p").agg(F.sum("wc").alias("c")))
    chars = sub_counts.filter(F.length("p") == 1)
    multi = (sub_counts.filter((F.length("p") > 1)
                               & (F.col("c") >= min_seed_count))
             .orderBy(F.col("c").desc(), "p").limit(seed_size))
    pieces = chars.unionByName(multi).localCheckpoint(eager=True)

    def _logp_rows(pdf: "pd.DataFrame") -> list[tuple[str, int]]:
        tot = int(pdf["c"].sum())
        return [(p, math.floor(math.log(c / tot) * NANO))
                for p, c in zip(pdf["p"], pdf["c"])]

    seg_schema = StructType([
        StructField("w", StringType()),
        StructField("wc", LongType()),
        StructField("pieces", ArrayType(StringType())),
    ])

    for _ in range(em_iters):
        model = dict(_logp_rows(pieces.toPandas()))  # bounded piece table
        floor = min(model.values()) - NANO
        bmodel = spark.sparkContext.broadcast(model)

        def _segment(it):
            for pdf in it:
                yield pd.DataFrame({
                    "w": pdf["w"], "wc": pdf["wc"],
                    "pieces": [
                        _viterbi(w, bmodel.value, max_piece_len, floor)
                        for w in pdf["w"]],
                })

        segs = words.mapInPandas(_segment, seg_schema)
        counts = (segs.select("wc", F.explode("pieces").alias("p"))
                  .groupBy("p").agg(F.sum("wc").alias("c")))
        # keep every single char alive (segmentability guarantee), at
        # least at count 1
        counts = (chars.select("p").join(counts, "p", "left")
                  .select("p", F.coalesce("c", F.lit(1)).alias("c"))
                  .unionByName(counts.join(chars.select("p"), "p",
                                           "left_anti"))
                  .filter(F.col("c") > 0))
        # prune toward vocab_size: drop the lowest-prob prunable pieces
        n_now = counts.count()
        n_prunable = counts.filter(F.length("p") > 1).count()
        drop = min(n_prunable,
                   max(0, min(n_now - vocab_size,
                              (n_prunable * prune_frac_ppm) // 1_000_000)))
        if drop > 0:
            doomed = (counts.filter(F.length("p") > 1)
                      .orderBy(F.col("c").asc(), F.col("p").desc())
                      .limit(int(drop)).select("p"))
            counts = counts.join(doomed, "p", "left_anti")
        pieces = counts.localCheckpoint(eager=True)

    # final hard cut to vocab_size (chars always kept)
    n_now = pieces.count()
    if n_now > vocab_size:
        keep_multi = (pieces.filter(F.length("p") > 1)
                      .orderBy(F.col("c").desc(), "p")
                      .limit(max(0, vocab_size
                                 - pieces.filter(F.length("p") == 1).count())))
        pieces = (pieces.filter(F.length("p") == 1)
                  .unionByName(keep_multi).localCheckpoint(eager=True))

    tot_row = pieces.agg(F.sum("c").alias("t")).localCheckpoint(eager=True)
    out = (pieces.join(F.broadcast(tot_row))
           .select("p", F.floor(F.log(F.col("c") / F.col("t")) * NANO)
                   .cast("long").alias("logp_nano")))
    from pyspark.sql import Window
    w = Window.orderBy(F.col("logp_nano").desc(), F.col("p").asc())
    return (out.withColumn("piece_rank", F.row_number().over(w))
            .select(F.col("p").alias("piece"), "logp_nano", "piece_rank"))


def unigram_encode(docs: DataFrame, pieces: DataFrame,
                   id_col: str = "doc_id", text_col: str = "text",
                   max_piece_len: int = 6) -> DataFrame:
    """Viterbi-encode documents with a trained piece table: one
    Arrow-batched pass over the corpus, piece table broadcast as a dict
    (same shape as ``wordpiece_encode``). Returns
    (id, pieces array<string>, n_pieces)."""
    spark = docs.sparkSession
    rows = pieces.select("piece", "logp_nano").collect()  # bounded vocab
    model = {r["piece"]: int(r["logp_nano"]) for r in rows}
    floor = (min(model.values()) - NANO) if model else -NANO
    bmodel = spark.sparkContext.broadcast(model)

    schema = StructType([
        StructField("__id", LongType()),
        StructField("pieces", ArrayType(StringType())),
        StructField("n_pieces", LongType()),
    ])

    def _encode(it):
        for pdf in it:
            out = []
            for text in pdf["__txt"]:
                ps: list[str] = []
                for wd in (text or "").split():
                    wd = wd.lower()
                    if wd:
                        ps.extend(_viterbi(wd, bmodel.value,
                                           max_piece_len, floor))
                out.append(ps)
            yield pd.DataFrame({
                "__id": pdf["__id"], "pieces": out,
                "n_pieces": [len(p) for p in out],
            })

    prep = docs.select(
        F.col(id_col).cast("long").alias("__id"),
        F.concat_ws(" ", T.tokens(F.col(text_col))).alias("__txt"))
    return (prep.mapInPandas(_encode, schema)
            .select(F.col("__id").alias(id_col), "pieces", "n_pieces"))
