"""Entity disambiguation — the Wikidata-linking analog.

Reference semantics (backend/app/services/wikidata_service.py):

- ``_calculate_match_score`` (:194-221): exact label match 1.0; query
  substring-of-label 0.8; label substring-of-query 0.7; else word-set
  Jaccard (``_string_similarity`` :223-238). +0.1 (capped at 1.0) when the
  query appears in the candidate description; ×0.8 penalty for labels
  shorter than 3 characters.
- ``disambiguate_entity`` / ``_select_best_with_context`` (:257-335):
  context score = |description words ∩ context words| / |description
  words|; blended total = 0.7·match + 0.3·context; the best blended
  candidate wins if its total exceeds 0.5, else the best raw match score
  wins if it exceeds 0.6, else the mention stays unlinked.

The live Wikidata API is out of scope (network-bound); the knowledge base
is a DataFrame of ``(qid, label, description)`` — at deployment a
broadcast dimension table, exactly how an entity dictionary ships to a
1000-executor cluster.

Scale shape: candidate generation is TOKEN BLOCKING — mention words joined
to an exploded label-word table — never a mention × KB cross join; the KB
side is broadcast (dictionary-sized), so the pair space is bounded by
shared-token coincidence and there is no shuffle of the mention corpus
beyond the final per-mention argmax window (partitioned by the mention
key, which is unique per document × mention — no skew). All scoring is
JVM-side string/array expressions; no Python crosses the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import Column


def _word_set(col: Column) -> Column:
    return F.array_distinct(F.split(col, " "))


def match_score(query: Column, label: Column, description: Column) -> Column:
    """The _calculate_match_score ladder (:194-221). ``query`` and
    ``label`` must already be lowercased."""
    w_q, w_l = _word_set(query), _word_set(label)
    inter = F.size(F.array_intersect(w_q, w_l))
    union = F.size(F.array_union(w_q, w_l))
    jaccard = F.when(union > 0, inter.cast("double") / union) \
               .otherwise(F.lit(0.0))
    base = (F.when(label == query, F.lit(1.0))
             .when(F.contains(label, query), F.lit(0.8))
             .when(F.contains(query, label), F.lit(0.7))
             .otherwise(jaccard))
    boosted = F.when(F.contains(description, query),
                     F.least(F.lit(1.0), base + F.lit(0.1))).otherwise(base)
    return F.when(F.length(label) < 3, boosted * F.lit(0.8)) \
            .otherwise(boosted)


def context_score(description: Column, context: Column) -> Column:
    """|desc words ∩ context words| / |desc words| (:313-320), both sides
    lowercased word SETS."""
    w_d, w_c = _word_set(description), _word_set(context)
    n_d = F.size(w_d)
    return F.when(n_d > 0,
                  F.size(F.array_intersect(w_d, w_c)).cast("double") / n_d) \
            .otherwise(F.lit(0.0))


def link_entities(mentions: DataFrame, kb: DataFrame,
                  mention_key: tuple[str, ...] = ("doc_id", "mention"),
                  ) -> DataFrame:
    """Disambiguate each mention against the KB (:257-335).

    ``mentions``: (*mention_key, mention, context) — ``mention`` and
    ``context`` raw surface text. ``kb``: (qid, label, description),
    labels/descriptions stored lowercase (the reference lowers both sides
    :196-198).

    Returns one row per LINKED mention: (*mention_key, qid, label,
    match_score, total_score), scores rounded to 6 dp.
    """
    keys = list(mention_key)
    m = (mentions
         .withColumn("_q", F.lower(F.col("mention")))
         .withColumn("_ctx", F.lower(F.col("context"))))

    # Token blocking: a candidate shares ≥1 word with the mention.
    m_tok = m.select(*keys, "_q", "_ctx",
                     F.explode(_word_set(F.col("_q"))).alias("_w"))
    kb_tok = (F.broadcast(kb)
              .select("qid", "label", "description",
                      F.explode(_word_set(F.col("label"))).alias("_w")))
    cand = (m_tok.join(kb_tok, "_w")
            .drop("_w")
            .dropDuplicates(keys + ["qid"]))

    scored = (cand
              .withColumn("match_score",
                          match_score(F.col("_q"), F.col("label"),
                                      F.col("description")))
              .withColumn("context_score",
                          context_score(F.col("description"), F.col("_ctx")))
              .withColumn("total_score",
                          F.col("match_score") * F.lit(0.7)
                          + F.col("context_score") * F.lit(0.3)))

    # Per-mention argmax on the blended total (context path :303-335),
    # raw-match fallback threshold 0.6 (:296-299); qid breaks exact ties.
    w_ctx = Window.partitionBy(*keys).orderBy(F.desc("total_score"), "qid")
    w_raw = Window.partitionBy(*keys).orderBy(F.desc("match_score"), "qid")
    ranked = (scored
              .withColumn("_rk_ctx", F.row_number().over(w_ctx))
              .withColumn("_rk_raw", F.row_number().over(w_raw)))
    linked = ranked.filter(
        ((F.col("_rk_ctx") == 1) & (F.col("total_score") > 0.5))
        | ((F.col("_rk_raw") == 1) & (F.col("total_score") <= 0.5)
           & (F.col("match_score") > 0.6)))
    # A mention where the context winner fails 0.5 could in principle link
    # through a DIFFERENT candidate via the raw fallback; dedup keeps the
    # context-ranked row first for determinism.
    w_pick = Window.partitionBy(*keys).orderBy("_rk_ctx")
    return (linked
            .withColumn("_pick", F.row_number().over(w_pick))
            .filter(F.col("_pick") == 1)
            .select(*keys, "qid", "label",
                    F.round("match_score", 6).alias("match_score"),
                    F.round("total_score", 6).alias("total_score")))
