"""Content change detection between successive captures of the same URL
— the reference's ChangeDetectionService re-expressed relationally
(``backend/app/services/change_detection.py``).

The reference compares ONE page's new content against its stored version
(detect_page_changes, change_detection.py:97-150): sha256 equality →
no change; else ``difflib.SequenceMatcher.ratio()`` similarity and a
threshold classifies ``minor_update`` vs ``modified``, with ``new`` /
``deleted`` for empty-side transitions. This operator runs the same
decision for EVERY consecutive capture pair of every URL in one pass:
a ``lag()`` window over (url → capture order) — the shuffle carries
(url, ts, text) once, and per-URL partitions are capture-count sized,
never corpus-sized.

Similarity, disclosed convention: ``difflib``'s char-level
longest-matching-block ratio is a quadratic pure-Python algorithm — the
relational analog used here is the **multiset Dice coefficient over
whitespace tokens** (granularity='tokens'; 'lines' for line-hash
multisets, reference unified-diff units): ``2·Σ min(cA(u), cB(u)) /
(|A|+|B|)`` — same 0..1 range, 1.0 iff equal multisets, and the SAME
formula difflib documents for ``ratio()`` with matches generalized to
multiset overlap instead of ordered blocks (order-insensitive:
reorderings score 1.0 where difflib would score lower). Computed in one
sorted run-length sweep per row (O(n log n), whole-stage codegen) — no
explode, no per-row Python. ``mode='difflib'`` switches to the exact
stdlib ``SequenceMatcher.ratio()`` in an Arrow-batched pandas UDF when
byte-fidelity to the reference matters more than JVM-side execution
(stdlib-only, always importable).

Other disclosed deviations: content equality uses md5, not sha256 (both
engines share md5; equality semantics identical), and unchanged
captures KEEP a row labeled 'unchanged' (the reference returns None —
a log row per capture is what a crawl audit wants).

``units_added`` / ``units_removed`` are the multiset diff sizes
(|B|−overlap, |A|−overlap) — the unified-diff line counts' analog
(generate_content_diff, change_detection.py:59-75) without
materializing diff text. ``change_statistics`` is the
get_change_statistics rollup (change_detection.py:204+): counts + mean
similarity per (day, change_type).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_THRESHOLD = 0.95  # change_detection.py:103 similarity_threshold


def _units(text: Column, granularity: str) -> Column:
    """Comparison-unit array: whitespace tokens, or md5 hashes of
    whitespace-normalized non-blank lines."""
    t = F.coalesce(text, F.lit(""))
    if granularity == "tokens":
        return F.filter(F.split(F.trim(t), r"\s+"),
                        lambda x: x != F.lit(""))
    if granularity == "lines":
        lines = F.filter(
            F.split(t, r"\n"),
            lambda ln: F.length(F.trim(F.regexp_replace(ln, r"\s+", " ")))
            > 0)
        return F.transform(
            lines,
            lambda ln: F.md5(F.trim(F.regexp_replace(ln, r"\s+", " "))))
    raise ValueError(f"unknown granularity: {granularity!r}")


def _multiset_overlap(a: Column, b: Column) -> Column:
    """Σ_u min(count_a(u), count_b(u)) in one sorted run-length sweep:
    tag each element with its side, sort (unit, side) structs once, and
    fold — when the unit changes, bank min(run_a, run_b). O(n log n) per
    row, fully codegen (same discipline as quality._top_gram)."""
    tagged = F.concat(
        F.transform(a, lambda x: F.struct(x.alias("h"),
                                          F.lit(0).alias("s"))),
        F.transform(b, lambda x: F.struct(x.alias("h"),
                                          F.lit(1).alias("s"))))
    zero = F.struct(F.lit(None).cast("string").alias("prev"),
                    F.lit(0).alias("ca"), F.lit(0).alias("cb"),
                    F.lit(0).alias("m"))

    def step(acc, x):
        same = acc["prev"].isNotNull() & (x["h"] == acc["prev"])
        banked = F.when(same, acc["m"]) \
            .otherwise(acc["m"] + F.least(acc["ca"], acc["cb"]))
        is_a = (x["s"] == 0).cast("int")
        ca = F.when(same, acc["ca"] + is_a).otherwise(is_a)
        cb = F.when(same, acc["cb"] + (1 - is_a)).otherwise(1 - is_a)
        return F.struct(x["h"].alias("prev"), ca.alias("ca"),
                        cb.alias("cb"), banked.alias("m"))

    return F.aggregate(
        F.array_sort(tagged), zero, step,
        lambda acc: acc["m"] + F.least(acc["ca"], acc["cb"]))


def _difflib_ratio_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def ratio(prev, cur):  # pd.Series ×2 → pd.Series (hints would be
        # string-annotations here and trip the resolver under
        # `from __future__ import annotations`)
        import difflib

        def one(p, c):
            p = p or ""
            c = c or ""
            if not p and not c:
                return 1.0
            if not p or not c:
                return 0.0
            return difflib.SequenceMatcher(None, p, c).ratio()

        return pd.Series([one(p, c) for p, c in zip(prev, cur)])

    return ratio


def detect_changes(pages: DataFrame, url_col: str = "url",
                   order_col: str = "ts14", text_col: str = "text",
                   threshold: float = DEFAULT_THRESHOLD,
                   granularity: str = "tokens",
                   mode: str = "dice") -> DataFrame:
    """Per-capture change log: (url, order, change_type, similarity,
    units_added, units_removed, n_versions_seen).

    change_type decision (detect_page_changes order, change_detection.py
    :117-133): first capture → 'new'; md5 equal → 'unchanged'; empty→
    nonempty → 'new'; nonempty→empty → 'deleted'; similarity ≥ threshold
    → 'minor_update'; else 'modified'. similarity is NULL for a URL's
    first capture, 1.0 when only whitespace/ordering changed (Dice) or
    texts equal.

    ``mode='difflib'`` computes similarity with the stdlib
    SequenceMatcher ratio in an Arrow-batched pandas UDF (reference
    fidelity; per-row Python cost, quadratic worst case — the JVM Dice
    sweep is the default and the oracle contract)."""
    w = Window.partitionBy(url_col).orderBy(order_col)
    cur = F.coalesce(F.col(text_col), F.lit(""))
    base = (pages
            .select(url_col, order_col, F.col(text_col))
            .withColumn("_prev", F.lag(cur).over(w))
            .withColumn("_vn", F.row_number().over(w)))
    prev = F.coalesce(F.col("_prev"), F.lit(""))
    ua = _units(F.col("_prev"), granularity)
    ub = _units(F.col(text_col), granularity)
    overlap = _multiset_overlap(ua, ub)
    na, nb = F.size(ua), F.size(ub)
    if mode == "dice":
        sim_raw = (F.when((na == 0) & (nb == 0), F.lit(1.0))
                   .when((na == 0) | (nb == 0), F.lit(0.0))
                   .otherwise(2.0 * overlap / (na + nb)))
    elif mode == "difflib":
        sim_raw = _difflib_ratio_udf()(F.col("_prev"), cur)
    else:
        raise ValueError(f"unknown mode: {mode!r}")
    sim = F.when(F.col("_vn") == 1, F.lit(None).cast("double")) \
        .otherwise(F.round(sim_raw, 6))
    change = (
        F.when(F.col("_vn") == 1, F.lit("new"))
        .when(F.md5(cur) == F.md5(prev), F.lit("unchanged"))
        .when((F.length(prev) == 0) & (F.length(cur) > 0), F.lit("new"))
        .when((F.length(cur) == 0) & (F.length(prev) > 0),
              F.lit("deleted"))
        .when(sim >= threshold, F.lit("minor_update"))
        .otherwise(F.lit("modified")))
    return base.select(
        url_col, order_col,
        change.alias("change_type"), sim.alias("similarity"),
        (nb - overlap).cast("long").alias("units_added"),
        (na - overlap).cast("long").alias("units_removed"),
        F.col("_vn").cast("long").alias("n_versions_seen"))


def change_statistics(changes: DataFrame,
                      order_col: str = "ts14") -> DataFrame:
    """get_change_statistics rollup: per (capture day, change_type)
    counts + mean similarity (nano-quantized for order-independent
    cross-engine equality) — one map-side-combined agg."""
    return (changes
            .groupBy(F.substring(order_col, 1, 8).alias("day"),
                     "change_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum(F.floor(F.col("similarity") * 1e9))
                         / F.count("similarity") / 1e9, 6)
                 .alias("mean_similarity")))


def content_evolution(pages: DataFrame, url_col: str = "url",
                      order_col: str = "ts14",
                      text_col: str = "text",
                      granularity: str = "tokens") -> DataFrame:
    """Per-URL content evolution timeline (get_content_evolution,
    change_detection.py:342-414): every capture with its content hash,
    word/char counts, similarity to the previous capture, and the
    reference's TIERED classification — 'unchanged' on hash equality,
    else similarity > 0.9 → 'minor_change', > 0.7 → 'moderate_change',
    else 'major_change'; a URL's first capture is 'new' with
    similarity 1.0 (reference initializes exactly so,
    change_detection.py:380-381). Same single url-window pass and Dice
    sweep as ``detect_changes``; md5 stands in for sha256 (equality
    semantics identical, disclosed)."""
    w = Window.partitionBy(url_col).orderBy(order_col)
    cur = F.coalesce(F.col(text_col), F.lit(""))
    base = (pages
            .select(url_col, order_col, F.col(text_col))
            .withColumn("_prev", F.lag(cur).over(w))
            .withColumn("_vn", F.row_number().over(w)))
    prev = F.coalesce(F.col("_prev"), F.lit(""))
    ua = _units(F.col("_prev"), granularity)
    ub = _units(F.col(text_col), granularity)
    overlap = _multiset_overlap(ua, ub)
    na, nb = F.size(ua), F.size(ub)
    sim = (F.when(F.col("_vn") == 1, F.lit(1.0))
           .when((na == 0) & (nb == 0), F.lit(1.0))
           .when((na == 0) | (nb == 0), F.lit(0.0))
           .otherwise(F.round(2.0 * overlap / (na + nb), 6)))
    change = (
        F.when(F.col("_vn") == 1, F.lit("new"))
        .when(F.md5(cur) == F.md5(prev), F.lit("unchanged"))
        .when(sim > 0.9, F.lit("minor_change"))
        .when(sim > 0.7, F.lit("moderate_change"))
        .otherwise(F.lit("major_change")))
    return base.select(
        url_col, order_col,
        F.md5(cur).alias("content_hash"),
        F.size(_units(F.col(text_col), "tokens")).cast("long")
        .alias("word_count"),
        F.length(cur).cast("long").alias("char_count"),
        change.alias("change_type"),
        sim.alias("similarity_to_previous"))
