"""PII redaction over document text — the anonymization pass of a
training-data pipeline (FineWeb/Dolma convention: emails and IP addresses
replaced with typed placeholder tokens before the corpus ships; see also
CCNet's note on leaving raw PII out of released shards).

Reference hook: the reference stores extracted page text verbatim
(backend/app/services/content_extraction_service.py) and exposes entity
families through the search documents (entity_backends.py); redaction is
the complementary WRITE-side transform a corpus consumer needs before
training. Patterns are the deterministic regex family convention used by
``functions/entities.py`` and ``langid`` — RE2/Java-portable so every
output byte is value-checkable in the DuckDB oracle; swapping in an ML
PII model later replaces one column expression with a pandas UDF, schema
unchanged.

Semantics: patterns apply IN ORDER, each counted then replaced on the
progressively redacted text (so an IP inside an already-redacted email is
not double-counted, and counts always agree with the emitted text).
Everything is ``regexp_extract_all``/``regexp_replace`` column
expressions — JVM-side, whole-stage codegen, zero shuffle: the scan
partitioning is preserved untouched, which is exactly the shape that
scales to a 100 TB corpus (embarrassingly parallel map).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, regex, replacement) — applied in order; regexes portable to
# DuckDB RE2 verbatim (sql_pii_chain emits the same strings).
_OCTET = r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", rf"\b{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # NANP-style phones (555-123-4567 / (555) 123-4567 / 555.123.4567);
    # international formats are a model's job, not a regex family's —
    # declared convention, mirrored by the oracle.
    ("phone", r"\+?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def with_pii_redaction(df: DataFrame, text_col: str = "text",
                       out_col: str = "text_redacted") -> DataFrame:
    """Adds ``n_{email,ipv4,ssn,phone}`` (long), ``n_pii``, ``has_pii``,
    and ``out_col`` with every match replaced by its typed placeholder."""
    cur: Column = F.coalesce(F.col(text_col), F.lit(""))
    counts: dict[str, Column] = {}
    for name, pat, token in PII_PATTERNS:
        counts[f"n_{name}"] = F.size(
            F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).cast("long")
        cur = F.regexp_replace(cur, pat, token)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.withColumns({
        **counts,
        "n_pii": total,
        "has_pii": total > 0,
        out_col: cur,
    })


def sql_pii_chain(text_expr: str) -> dict[str, str]:
    """DuckDB expressions mirroring :func:`with_pii_redaction` exactly —
    ``{"n_email": ..., ..., "redacted": ...}`` over ``text_expr``. Used by
    the contract oracle so engine and oracle share ONE pattern table."""
    cur = f"coalesce({text_expr}, '')"
    out: dict[str, str] = {}
    for name, pat, token in PII_PATTERNS:
        esc = pat.replace("'", "''")
        out[f"n_{name}"] = (f"CAST(len(regexp_extract_all({cur}, '{esc}'))"
                            f" AS BIGINT)")
        cur = f"regexp_replace({cur}, '{esc}', '{token}', 'g')"
    out["redacted"] = cur
    return out
