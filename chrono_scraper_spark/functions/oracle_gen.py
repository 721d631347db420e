"""DuckDB oracle-SQL generators.

The driver's correctness gate runs each engine query AND an independent
ANSI-SQL oracle in DuckDB and hash-compares results. For data-driven
operators (the filter-decision chain, language ID) the oracle SQL is
*generated from the same pattern tables* (config.py) the engine reads — the
semantics live in the data, the two implementations (Spark expressions here,
DuckDB SQL there) are independent.

Everything emitted is plain DuckDB SQL; no engine code runs inside the
oracle.
"""

from __future__ import annotations

from . import textops as T
from .. import config as C


def q(s: str) -> str:
    """SQL single-quote escape."""
    return s.replace("'", "''")


# --------------------------------------------------------------------------
# filter-decision chain (parity with operators/filters.py — semantics from
# enhanced_intelligent_filter.py:531-590 via the config tables)
# --------------------------------------------------------------------------

def _path_noquery(url: str) -> str:
    return (f"list_extract(string_split(list_extract(string_split("
            f"lower({url}), '?'), 1), '#'), 1)")


def decision_rules(url: str = "url", length: str = "length",
                   digest: str = "digest", seen_digest: str = "FALSE",
                   include_attachments: bool = True) -> list[tuple]:
    """Ordered (condition_sql, status, reason, confidence, pattern_sql,
    priority) rules; first true condition wins."""
    pn = _path_noquery(url)
    ul = f"lower({url})"
    rules: list[tuple] = []
    for cat, exts in C.NEVER_SHOW_EXTENSIONS:
        for ext in exts:
            rules.append((f"ends_with({pn}, '{q(ext)}')",
                          C.STATUS_FILTERED_FILE_EXTENSION,
                          f"file_extension_{cat}", 1.0, f"'{q(ext)}$'", 5))
    for cat, pats in C.LIST_PATTERNS:
        for pat in pats:
            rules.append((f"regexp_matches({ul}, '{q(pat)}')",
                          C.STATUS_FILTERED_LIST_PAGE, f"list_page_{cat}",
                          0.9, f"'{q(pat)}'", 5))
    # after the FIRST '?' (reference: url.split('?', 1)[1])
    qpart = (f"CASE WHEN contains({url}, '?') THEN "
             f"substr({url}, instr({url}, '?') + 1) ELSE '' END")
    dyn = " OR ".join(f"contains({qpart}, '{q(p)}')"
                      for p in C.HEURISTIC_DYNAMIC_PARAMS)
    heur = (f"((len(string_split({url}, '/')) <= 4 AND "
            f"len(list_filter(string_split({url}, '/'), "
            f"p -> length(p) > 8)) = 0) OR "
            f"(contains({url}, '?') AND "
            f"len(string_split({url}, '&')) - 1 > 3) OR ({dyn}))")
    rules.append((heur, C.STATUS_FILTERED_LIST_PAGE, "list_page_heuristic",
                  0.7, "'heuristic_analysis'", 5))
    rules.append((seen_digest, C.STATUS_FILTERED_ALREADY_PROCESSED,
                  "already_processed_digest", 1.0,
                  f"'digest:' || substr({digest}, 1, 8) || '...'", 5))
    if not include_attachments:
        for cat, exts in C.ATTACHMENT_EXTENSIONS:
            for ext in exts:
                rules.append((f"ends_with({pn}, '{q(ext)}')",
                              C.STATUS_FILTERED_ATTACHMENT_DISABLED,
                              f"attachment_{cat}_disabled", 1.0,
                              f"'{q(ext)}$'", 5))
    rules.append((f"{length} IS NOT NULL AND {length} < {C.SIZE_MIN_BYTES}",
                  C.STATUS_FILTERED_SIZE_TOO_SMALL, "size_too_small", 1.0,
                  f"'<{C.SIZE_MIN_BYTES}bytes'", 5))
    rules.append((f"{length} IS NOT NULL AND {length} > {C.SIZE_MAX_BYTES}",
                  C.STATUS_FILTERED_SIZE_TOO_LARGE, "size_too_large", 1.0,
                  f"'>{C.SIZE_MAX_BYTES}bytes'", 5))
    for cat, pats, prio in C.HIGH_VALUE_PATTERNS:
        for pat in pats:
            rules.append((f"regexp_matches({ul}, '{q(pat)}')",
                          C.STATUS_PENDING, f"high_value_{cat}", 0.9,
                          f"'{q(pat)}'", prio))
    rules.append((f"coalesce({length}, 0) > {C.HIGH_VALUE_LARGE_CONTENT_BYTES}",
                  C.STATUS_PENDING, "high_value_large_content", 0.8,
                  f"'>' || {length} || 'bytes'", 7))
    for marker in C.INSTITUTIONAL_DOMAIN_MARKERS:
        reason = ("high_value_academic" if marker in (".edu/", ".ac.")
                  else "high_value_government")
        rules.append((f"contains({ul}, '{q(marker)}')", C.STATUS_PENDING,
                      reason, 0.85, f"'{q(marker)}'", 8))
    rules.append(("TRUE", C.STATUS_PENDING, "passed_all_filters", 0.6,
                  "NULL", 5))
    return rules


def decision_columns_sql(**kw) -> dict[str, str]:
    """SQL expressions for the five decision columns (same precedence as the
    Spark chain)."""
    rules = decision_rules(**kw)

    def case(value_of) -> str:
        whens = "\n    ".join(
            f"WHEN {cond} THEN {value_of(r)}" for r in rules[:-1]
            for cond in [r[0]]
        )
        return f"CASE\n    {whens}\n    ELSE {value_of(rules[-1])} END"

    return {
        "status": case(lambda r: f"'{r[1]}'"),
        "reason": case(lambda r: f"'{r[2]}'"),
        "confidence": case(lambda r: f"CAST({r[3]} AS DOUBLE)"),
        "matched_pattern": case(lambda r: r[4]),
        "priority_score": case(lambda r: f"CAST({r[5]} AS INT)"),
    }


# --------------------------------------------------------------------------
# text ops (parity with functions/textops.py)
# --------------------------------------------------------------------------

def tokens_sql(text: str) -> str:
    return (f"list_filter(string_split_regex(lower(coalesce({text}, '')), "
            f"'{T.TOKEN_SPLIT_RE}'), t -> t != '')")


def stopword_hits_sql(text: str, lang: str) -> str:
    words = ", ".join(f"'{q(w)}'" for w in T.STOPWORDS[lang])
    return (f"len(list_filter({tokens_sql(text)}, "
            f"t -> list_contains([{words}], t)))")


def langid_sql(text: str) -> str:
    hits = {lang: stopword_hits_sql(text, lang) for lang in T.LANG_ORDER}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    pick = "CASE " + " ".join(
        f"WHEN {hits[lang]} = {best} THEN '{lang}'" for lang in T.LANG_ORDER
    ) + " ELSE 'und' END"
    cjk = (f"length(regexp_replace(coalesce({text}, ''), "
           f"'[^一-鿿]', '', 'g'))")
    total = f"greatest(length(coalesce({text}, '')), 1)"
    return (f"CASE WHEN ({cjk} / {total}) > 0.2 THEN 'zh' "
            f"WHEN {best} > 0 THEN {pick} ELSE 'und' END")


def token_count_ws_sql(text: str) -> str:
    return (f"CASE WHEN length(trim(coalesce({text}, ''))) = 0 THEN 0 "
            f"ELSE len(string_split_regex(trim(coalesce({text}, '')), "
            f"'\\s+')) END")


def token_count_bpe_sql(text: str) -> str:
    return (f"len(regexp_extract_all(coalesce({text}, ''), "
            f"'{T.BPE_TOKEN_RE}'))")


def text_quality_sql(text: str) -> str:
    """DuckDB twin of textops.text_quality (0-1 score, rounded to 4)."""
    t = f"coalesce({text}, '')"
    length = f"length({t})"
    words = token_count_ws_sql(text)
    alpha = f"length(regexp_replace({t}, '[^\\p{{L}}]', '', 'g'))"
    punct = f"length(regexp_replace({t}, '[\\p{{L}}\\p{{N}}\\s]', '', 'g'))"
    sw = stopword_hits_sql(text, "en")
    len_score = f"least({length} / 2000.0, 1.0)"
    alpha_ratio = f"CASE WHEN {length} > 0 THEN {alpha} / {length} ELSE 0.0 END"
    punct_pen = (f"CASE WHEN {length} > 0 THEN "
                 f"least({punct} * 5.0 / {length}, 1.0) ELSE 0.0 END")
    sw_score = (f"CASE WHEN {words} > 0 THEN "
                f"least({sw} * 8.0 / {words}, 1.0) ELSE 0.0 END")
    wordlen = f"CASE WHEN {words} > 0 THEN {length} / {words} ELSE 0.0 END"
    wordlen_score = (f"CASE WHEN {wordlen} >= 3 AND {wordlen} <= 12 "
                     f"THEN 1.0 ELSE 0.3 END")
    return (f"round({len_score} * 0.3 + ({alpha_ratio}) * 0.3 + "
            f"(1 - ({punct_pen})) * 0.1 + ({sw_score}) * 0.1 + "
            f"({wordlen_score}) * 0.2, 4)")


def fingerprint_sql(text: str) -> str:
    # collapse before trim — see textops.fingerprint
    return (f"md5(trim(regexp_replace(lower(coalesce({text}, '')), "
            f"'\\s+', ' ', 'g')))")


def winnow_query_sql(k: int = 8, w: int = 4,
                     table: str = "documents") -> str:
    """Full winnow_fingerprint oracle statement over ``table(doc_id,
    text)`` — STAGED projections, one intermediate per level. The
    single-expression twin (``winnow_fingerprints_sql``) inlines ``hashes``
    into the window comprehension, and DuckDB re-evaluates the inlined tree
    per element: O(n²) md5 per doc, measured 493 s vs 2.6 s for the staged
    form at sf0.01. Same trap (and same fix) as the engine's ``_let``
    binding in textops.winnow_fingerprints."""
    return f"""
WITH s0 AS (
  SELECT doc_id,
    regexp_replace(lower(coalesce(text, '')), '[^a-z0-9]', '', 'g') AS s
  FROM {table}
), g AS (
  SELECT doc_id,
    CASE WHEN length(s) >= {k} THEN
      list_transform(range(1, length(s) - {k - 2}),
                     i -> md5(substr(s, i, {k})))
    ELSE [] END AS hashes
  FROM s0
), m AS (
  SELECT doc_id,
    CASE WHEN len(hashes) >= {w} THEN
      [list_min(hashes[j:j+{w - 1}]) for j in range(1, len(hashes) - {w - 2})]
    WHEN len(hashes) > 0 THEN [list_min(hashes)]
    ELSE [] END AS mins
  FROM g
)
SELECT doc_id, len(list_sort(list_distinct(mins))) AS n_fp,
  md5(array_to_string(list_sort(list_distinct(mins)), '|')) AS fp_sig
FROM m"""


def winnow_fingerprints_sql(text: str, k: int = 8, w: int = 4) -> str:
    """DuckDB twin of textops.winnow_fingerprints (list<varchar>) as ONE
    expression — for small-input unit parity only; bulk oracles must use
    the staged ``winnow_query_sql`` (see its docstring for why)."""
    s = (f"regexp_replace(lower(coalesce({text}, '')), '[^a-z0-9]', '', 'g')")
    grams = (f"CASE WHEN length({s}) >= {k} THEN "
             f"list_transform(range(1, length({s}) - {k - 2}), "
             f"i -> substr({s}, i, {k})) "
             f"ELSE [] END")
    hashes = f"list_transform({grams}, g -> md5(g))"
    mins = (f"CASE WHEN len({hashes}) >= {w} THEN "
            f"[list_min(list_slice({hashes}, j, j + {w - 1})) "
            f"for j in range(1, len({hashes}) - {w - 2})] "
            f"WHEN len({hashes}) > 0 THEN [list_min({hashes})] "
            f"ELSE [] END")
    return f"list_sort(list_distinct({mins}))"


def shingles_sql(toks: str, k: int = 3) -> str:
    return (f"CASE WHEN len({toks}) >= {k} THEN "
            f"list_transform(range(1, len({toks}) - {k - 2}), "
            f"j -> array_to_string(list_slice({toks}, j, j + {k - 1}), ' ')) "
            f"WHEN len({toks}) > 0 THEN [array_to_string({toks}, ' ')] "
            f"ELSE [] END")


def kgrams_sql(toks: str, k: int) -> str:
    """Strict word k-grams (empty list when < k words) — twin of
    operators.quality.kgrams."""
    return (f"CASE WHEN len({toks}) >= {k} THEN "
            f"list_transform(range(1, len({toks}) - {k - 2}), "
            f"j -> array_to_string(list_slice({toks}, j, j + {k - 1}), ' ')) "
            f"ELSE [] END")


def minhash_signature_sql(sh: str, n_hashes: int = 12) -> str:
    """array<string> minhash signature over shingle list ``sh``."""
    return (f"[list_min(list_transform({sh}, x -> md5(i || ':' || x))) "
            f"for i in range(0, {n_hashes})]")


def simhash_sum_exprs_sql(hx: str = "hx") -> str:
    """The 64 per-bit ±1 sum aggregates over md5-hex token hashes — DuckDB
    twin of operators.text_dedup.simhash_bits_portable (bit b of a token =
    bit (b%4) of hex digit b//4 of md5(token))."""
    exprs = []
    for b in range(64):
        hd = (f"(strpos('0123456789abcdef', substr({hx}, {b // 4 + 1}, 1)) "
              f"- 1)")
        bit = f"(({hd} // {1 << (b % 4)}) % 2)"
        exprs.append(f"sum(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS b{b}")
    return ",\n    ".join(exprs)


def simhash_bits_concat_sql() -> str:
    """Reassemble the 64 sign bits into the bit string (b0 leftmost)."""
    return " || ".join(
        f"CASE WHEN b{b} > 0 THEN '1' ELSE '0' END" for b in range(64))


def hex_int_sql(hx: str, start: int, n: int) -> str:
    """Integer value of ``n`` hex digits of ``hx`` starting at 1-based
    ``start`` — DuckDB twin of operators.quality._hex_int (n ≤ 15)."""
    terms = [
        f"(strpos('0123456789abcdef', substr({hx}, {start + i}, 1)) - 1) "
        f"* {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"
