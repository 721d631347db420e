"""Pure-Python oracle for the filter-decision chain.

Independent reimplementation of the reference's ``make_filtering_decision``
(reference: enhanced_intelligent_filter.py:531-590) used ONLY by tests to
verify the vectorized Spark chain row-by-row (SURVEY §5 test plan item (b)).
Shares the pattern *data* with the engine (config.py) — by design: the
reference's semantics live in those tables; the control flow here is written
against the reference's documented precedence, not against the Spark code.
"""

from __future__ import annotations

import re

from chrono_scraper_spark import config as C


def _path_noquery(url: str) -> str:
    return url.lower().split("?")[0].split("#")[0]


def decide(url: str, length: int | None, digest: str,
           seen_digests: set[str] | None = None,
           include_attachments: bool = True) -> dict:
    seen_digests = seen_digests or set()
    path = _path_noquery(url)
    url_lower = url.lower()

    # 1. never-show extensions
    for cat, exts in C.NEVER_SHOW_EXTENSIONS:
        for ext in exts:
            if path.endswith(ext):
                return dict(status=C.STATUS_FILTERED_FILE_EXTENSION,
                            reason=f"file_extension_{cat}", confidence=1.0,
                            matched_pattern=f"{ext}$", priority_score=5)
    # 2. list-page categorized patterns
    for cat, pats in C.LIST_PATTERNS:
        for pat in pats:
            if re.search(pat, url_lower):
                return dict(status=C.STATUS_FILTERED_LIST_PAGE,
                            reason=f"list_page_{cat}", confidence=0.9,
                            matched_pattern=pat, priority_score=5)
    # 3. list-page heuristics
    parts = url.split("/")
    short_path = len(parts) <= 4 and not any(len(p) > 8 for p in parts)
    many_params = "?" in url and url.count("&") > 3
    query_part = url.split("?", 1)[1] if "?" in url else ""
    dynamic = any(p in query_part for p in C.HEURISTIC_DYNAMIC_PARAMS)
    if short_path or many_params or dynamic:
        return dict(status=C.STATUS_FILTERED_LIST_PAGE,
                    reason="list_page_heuristic", confidence=0.7,
                    matched_pattern="heuristic_analysis", priority_score=5)
    # 4. already processed (content digest)
    if digest in seen_digests:
        return dict(status=C.STATUS_FILTERED_ALREADY_PROCESSED,
                    reason="already_processed_digest", confidence=1.0,
                    matched_pattern=f"digest:{digest[:8]}...", priority_score=5)
    # 5. attachments
    if not include_attachments:
        for cat, exts in C.ATTACHMENT_EXTENSIONS:
            for ext in exts:
                if path.endswith(ext):
                    return dict(status=C.STATUS_FILTERED_ATTACHMENT_DISABLED,
                                reason=f"attachment_{cat}_disabled",
                                confidence=1.0, matched_pattern=f"{ext}$",
                                priority_score=5)
    # 6. size bounds (null passes)
    if length is not None:
        if length < C.SIZE_MIN_BYTES:
            return dict(status=C.STATUS_FILTERED_SIZE_TOO_SMALL,
                        reason="size_too_small", confidence=1.0,
                        matched_pattern=f"<{C.SIZE_MIN_BYTES}bytes",
                        priority_score=5)
        if length > C.SIZE_MAX_BYTES:
            return dict(status=C.STATUS_FILTERED_SIZE_TOO_LARGE,
                        reason="size_too_large", confidence=1.0,
                        matched_pattern=f">{C.SIZE_MAX_BYTES}bytes",
                        priority_score=5)
    # 7. high-value classification
    for cat, pats, prio in C.HIGH_VALUE_PATTERNS:
        for pat in pats:
            if re.search(pat, url_lower):
                return dict(status=C.STATUS_PENDING,
                            reason=f"high_value_{cat}", confidence=0.9,
                            matched_pattern=pat, priority_score=prio)
    if (length or 0) > C.HIGH_VALUE_LARGE_CONTENT_BYTES:
        return dict(status=C.STATUS_PENDING,
                    reason="high_value_large_content", confidence=0.8,
                    matched_pattern=f">{length}bytes", priority_score=7)
    for marker in C.INSTITUTIONAL_DOMAIN_MARKERS:
        if marker in url_lower:
            reason = ("high_value_academic" if marker in (".edu/", ".ac.")
                      else "high_value_government")
            return dict(status=C.STATUS_PENDING, reason=reason,
                        confidence=0.85, matched_pattern=marker,
                        priority_score=8)
    # 8. default pass
    return dict(status=C.STATUS_PENDING, reason="passed_all_filters",
                confidence=0.6, matched_pattern=None, priority_score=5)
