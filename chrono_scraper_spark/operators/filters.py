"""Frontier filter-decision chain (SURVEY §2.2 F1-F7).

Reproduces ``make_filtering_decision`` (reference:
enhanced_intelligent_filter.py:531-590) as ONE vectorized projection: every
check is a ``F.when(cond, decision_struct)`` and the fixed precedence order
(extensions → list-page → already-processed → attachment → size → high-value
→ default-pass) becomes ``F.coalesce`` over the check columns. The filter
*annotates* rather than drops — each row gets
``(status, reason, confidence, matched_pattern, priority_score)``.

Scale: the whole chain is a single whole-stage-codegen projection (no
shuffle, no Python). The only join is the already-processed digest lookup,
which broadcasts when the seen-digest set is small and falls back to a
shuffled left join otherwise.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import config as C
from ..functions.planutil import materialize_once
from ..functions.urls import url_path_noquery


def _decision(status: str, reason: Column | str, confidence: float,
              matched_pattern: Column | str | None, priority: Column | int) -> Column:
    reason_c = reason if isinstance(reason, Column) else F.lit(reason)
    mp = (
        F.lit(None).cast("string")
        if matched_pattern is None
        else (matched_pattern if isinstance(matched_pattern, Column) else F.lit(matched_pattern))
    )
    prio = priority if isinstance(priority, Column) else F.lit(priority)
    return F.struct(
        F.lit(status).alias("status"),
        reason_c.alias("reason"),
        F.lit(confidence).cast("double").alias("confidence"),
        mp.alias("matched_pattern"),
        prio.cast("int").alias("priority_score"),
    )


def _first_pattern_match(target: Column, groups: list[tuple[str, list[str]]],
                         build) -> Column:
    """First (category, pattern) whose regex matches ``target``, in declared
    order; ``build(category, pattern_lit)`` makes the decision struct.

    Hot-path shape: one combined alternation regex per CATEGORY gates entry
    (compiled once inside codegen); the per-pattern chain — needed because
    the decision records WHICH pattern matched — only evaluates for rows
    that passed the gate. Non-matching rows (the vast majority at crawl
    scale) cost len(groups) regex runs instead of total-pattern count."""
    cat_whens = []
    for category, patterns in groups:
        combined = "|".join(f"(?:{p})" for p in patterns)
        per = reduce(
            lambda acc, pw: acc.when(pw[0], pw[1]),
            [(target.rlike(p), build(category, p)) for p in patterns[1:]],
            F.when(target.rlike(patterns[0]), build(category, patterns[0])),
        )
        cat_whens.append((target.rlike(combined), per))
    return reduce(lambda acc, cw: acc.when(cw[0], cw[1]),
                  cat_whens[1:], F.when(cat_whens[0][0], cat_whens[0][1]))


def _ends_with_any(path: Column, groups: list[tuple[str, list[str]]], build) -> Column:
    whens = []
    for category, exts in groups:
        for ext in exts:
            whens.append((path.endswith(ext), build(category, ext)))
    return reduce(lambda acc, cw: acc.when(cw[0], cw[1]),
                  whens[1:], F.when(whens[0][0], whens[0][1]))


def never_show_extension_decision(url: Column) -> Column:
    """F1 content-level variant (enhanced_intelligent_filter.py:231-258)."""
    path = url_path_noquery(url)
    return _ends_with_any(
        path, C.NEVER_SHOW_EXTENSIONS,
        lambda cat, ext: _decision(
            C.STATUS_FILTERED_FILE_EXTENSION, f"file_extension_{cat}", 1.0, f"{ext}$", 5
        ),
    )


def list_page_pattern_decision(url: Column) -> Column:
    """F2 (enhanced_intelligent_filter.py:260-302): categorized regexes over
    the lower-cased FULL url, confidence 0.9."""
    return _first_pattern_match(
        F.lower(url), C.LIST_PATTERNS,
        lambda cat, pat: _decision(
            C.STATUS_FILTERED_LIST_PAGE, f"list_page_{cat}", 0.9, pat, 5
        ),
    )


def list_page_heuristic_decision(url: Column) -> Column:
    """F3 (enhanced_intelligent_filter.py:304-346). Faithful to the odd
    details: parts = FULL url split('/'); short-path check requires <=4 parts
    and no part longer than 8 chars; >3 '&' only counts when '?' present;
    dynamic params are substring checks inside the query part."""
    parts = F.split(url, "/")
    short_path = (F.size(parts) <= 4) & (
        ~F.exists(parts, lambda p: F.length(p) > 8)
    )
    many_params = url.contains("?") & (
        F.size(F.split(url, "&")) - 1 > 3
    )
    # everything after the FIRST '?' — the reference does url.split('?', 1)[1]
    # (enhanced_intelligent_filter.py:322), so a second '?' stays in the query
    query_part = F.when(
        url.contains("?"),
        F.substring(url, F.instr(url, "?") + F.lit(1), F.length(url)),
    ).otherwise(F.lit(""))
    dyn = reduce(
        lambda a, b: a | b,
        [query_part.contains(p) for p in C.HEURISTIC_DYNAMIC_PARAMS],
    )
    return F.when(
        short_path | many_params | dyn,
        _decision(C.STATUS_FILTERED_LIST_PAGE, "list_page_heuristic", 0.7,
                  "heuristic_analysis", 5),
    )


def already_processed_decision(digest_seen: Column, digest: Column) -> Column:
    """F-chain step 3 (enhanced_intelligent_filter.py:348-368)."""
    return F.when(
        digest_seen,
        _decision(
            C.STATUS_FILTERED_ALREADY_PROCESSED, "already_processed_digest", 1.0,
            F.concat(F.lit("digest:"), F.substring(digest, 1, 8), F.lit("...")), 5,
        ),
    )


def attachment_decision(url: Column, include_attachments: bool) -> Column:
    """F5 (enhanced_intelligent_filter.py:370-400)."""
    if include_attachments:
        return F.lit(None).cast(
            "struct<status:string,reason:string,confidence:double,"
            "matched_pattern:string,priority_score:int>"
        )
    path = url_path_noquery(url)
    return _ends_with_any(
        path, C.ATTACHMENT_EXTENSIONS,
        lambda cat, ext: _decision(
            C.STATUS_FILTERED_ATTACHMENT_DISABLED, f"attachment_{cat}_disabled",
            1.0, f"{ext}$", 5
        ),
    )


def size_decision(length: Column, min_size: int = C.SIZE_MIN_BYTES,
                  max_size: int = C.SIZE_MAX_BYTES) -> Column:
    """F4 (enhanced_intelligent_filter.py:402-445); null length passes."""
    return (
        F.when(length.isNull(), F.lit(None))
        .when(length < min_size,
              _decision(C.STATUS_FILTERED_SIZE_TOO_SMALL, "size_too_small", 1.0,
                        f"<{min_size}bytes", 5))
        .when(length > max_size,
              _decision(C.STATUS_FILTERED_SIZE_TOO_LARGE, "size_too_large", 1.0,
                        f">{max_size}bytes", 5))
    )


def high_value_decision(url: Column, length: Column) -> Column:
    """F6 (enhanced_intelligent_filter.py:447-529): URL patterns → large
    content (>5KB, priority 7) → institutional domains (priority 8)."""
    url_lower = F.lower(url)
    pattern_d = _first_pattern_match(
        url_lower,
        [(cat, pats) for cat, pats, _ in C.HIGH_VALUE_PATTERNS],
        lambda cat, pat: _decision(
            C.STATUS_PENDING, f"high_value_{cat}", 0.9, pat,
            dict((c, p) for c, _, p in C.HIGH_VALUE_PATTERNS)[cat],
        ),
    )
    large_d = F.when(
        F.coalesce(length, F.lit(0)) > C.HIGH_VALUE_LARGE_CONTENT_BYTES,
        _decision(C.STATUS_PENDING, "high_value_large_content", 0.8,
                  F.concat(F.lit(">"), length.cast("string"), F.lit("bytes")), 7),
    )
    inst_whens = []
    for marker in C.INSTITUTIONAL_DOMAIN_MARKERS:
        reason = (
            "high_value_academic" if marker in (".edu/", ".ac.") else "high_value_government"
        )
        inst_whens.append(
            (url_lower.contains(marker),
             _decision(C.STATUS_PENDING, reason, 0.85, marker, 8))
        )
    inst_d = reduce(lambda acc, cw: acc.when(cw[0], cw[1]),
                    inst_whens[1:], F.when(inst_whens[0][0], inst_whens[0][1]))
    return F.coalesce(pattern_d, large_d, inst_d)


def pass_all_decision() -> Column:
    return _decision(C.STATUS_PENDING, "passed_all_filters", 0.6, None, 5)


# Unresolved decision expression cache. Building the ~120-pattern chain
# costs thousands of Py4J round-trips (~3-4 s of pure driver time per
# call); the finished expression is name-based (`F.col(url_col)` etc.) and
# immutable, so it is reusable verbatim across any DataFrame with those
# column names — analysis resolves a copy, never mutates the original.
# Keyed by the names + chain config; lives for the JVM's lifetime.
_DECISION_EXPR_CACHE: dict[tuple, Column] = {}


def _decision_expr(url_col: str, length_col: str, digest_col: str,
                   include_attachments: bool, has_seen: bool) -> Column:
    key = (url_col, length_col, digest_col, include_attachments, has_seen)
    cached = _DECISION_EXPR_CACHE.get(key)
    if cached is not None:
        return cached
    url = F.col(url_col)
    length = F.col(length_col)
    digest_seen = (F.coalesce(F.col("__digest_seen"), F.lit(False))
                   if has_seen else F.lit(False))
    decision = F.coalesce(
        never_show_extension_decision(url),
        list_page_pattern_decision(url),
        list_page_heuristic_decision(url),
        already_processed_decision(digest_seen, F.col(digest_col)),
        attachment_decision(url, include_attachments),
        size_decision(length),
        high_value_decision(url, length),
        pass_all_decision(),
    )
    _DECISION_EXPR_CACHE[key] = decision
    return decision


def with_filter_decision(
    frontier: DataFrame,
    seen_digests: DataFrame | None = None,
    include_attachments: bool = True,
    url_col: str = "url",
    length_col: str = "length",
    digest_col: str = "digest",
) -> DataFrame:
    """Annotate every frontier row with a ``decision`` struct, preserving the
    reference's precedence (enhanced_intelligent_filter.py:531-590).

    ``seen_digests``: one-column DataFrame ``digest`` of already-completed
    content hashes (D3). Broadcast when small; Spark falls back to a shuffle
    join automatically above the broadcast threshold.
    """
    if seen_digests is not None:
        seen = seen_digests.select(
            F.col("digest").alias("__seen_digest")
        ).dropDuplicates(["__seen_digest"]).withColumn("__digest_seen", F.lit(True))
        # No broadcast hint: AQE broadcasts when the seen set fits under the
        # threshold and shuffle-joins otherwise (the 100 TB-safe default).
        frontier = frontier.join(
            seen, frontier[digest_col] == seen["__seen_digest"], "left"
        ).drop("__seen_digest")

    decision = _decision_expr(url_col, length_col, digest_col,
                              include_attachments, seen_digests is not None)
    # materialize_once (functions/planutil.py): without it, Catalyst's
    # predicate pushdown substitutes the whole ~120-regex chain into every
    # downstream consumer (a status filter, a priority sort key) and sinks
    # the copies below every exchange into the scan stage — measured 2-4
    # chain copies per plan in the round-6 bench, each a ~MB expression
    # tree re-planned, re-generated and re-shipped per run. The anchor pins
    # the chain to exactly one evaluation at exactly this point
    # (politeness_schedule 3.26 s -> 0.40 s at sf1.0); output values are
    # unchanged.
    out = frontier.withColumn("decision", materialize_once(decision))
    if seen_digests is not None:
        out = out.drop("__digest_seen")
    return out


def filter_stats(decided: DataFrame) -> DataFrame:
    """A1/F7: per-outcome counters (enhanced_intelligent_filter.py:607-656)
    as a hash aggregation (map-side partials — no row ever leaves the
    executor unaggregated)."""
    return (
        decided.groupBy(
            F.col("decision.status").alias("status"),
            F.col("decision.reason").alias("reason"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status", "reason")
    )
