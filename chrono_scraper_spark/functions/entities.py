"""Pattern-based entity extraction — the deterministic NER analog.

The reference extracts entities with spaCy/Firecrawl backends
(backend/app/services/entity_backends.py:15-116,219-308) and feeds them into
search documents (meilisearch_service.py:199-297) and content_analytics
entity counters. Those models aren't in this container, so — exactly like
``langid`` stands in for langdetect — a deterministic regex family stands in
for the NER model: dates, URLs, emails, capitalized person-like spans,
money amounts. Every pattern is RE2/Java-portable, so entity output is
value-checkable in the DuckDB oracle.

All extraction is ``regexp_extract_all`` column expressions (JVM-side,
whole-stage codegen); swapping in a real model later means replacing ONE
column with a pandas-UDF column — the schema (array<struct<entity_type,
entity>>), the search-side filtering, and the analytics counters all stay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (entity_type, regex) — order defines output order; regexes portable to
# DuckDB's RE2 verbatim (oracle side uses the same strings)
ENTITY_PATTERNS: list[tuple[str, str]] = [
    ("date", r"\d{4}-\d{2}-\d{2}"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("url", r"https?://[A-Za-z0-9./_%#?=&-]+"),
    ("person", r"[A-Z][a-z]+(?: [A-Z][a-z]+)+"),
    ("money", r"[$€£]\d+(?:\.\d+)?"),
]


def extract_entities(text: Column) -> Column:
    """array<struct<entity_type:string, entity:string>> — every pattern
    match, in pattern order then document order (duplicates preserved,
    mirroring per-mention NER output)."""
    def _typed(etype: str, pat: str) -> Column:
        # NB: a two-arg transform lambda would receive the ARRAY INDEX as its
        # second argument — close over etype instead
        def tag(m: Column) -> Column:
            return F.struct(F.lit(etype).alias("entity_type"),
                            m.alias("entity"))

        return F.transform(
            F.regexp_extract_all(F.coalesce(text, F.lit("")),
                                 F.lit(pat), F.lit(0)),
            tag,
        )

    return F.concat(*[_typed(e, p) for e, p in ENTITY_PATTERNS])


def with_entities(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``entities`` plus per-type counts (the content_analytics entity
    counter columns, content_analytics.sql:55-61)."""
    out = df.withColumn("entities", extract_entities(F.col(text_col)))

    def _count(etype: str) -> Column:
        def is_type(e: Column) -> Column:
            return e["entity_type"] == etype

        return F.size(F.filter(F.col("entities"), is_type))

    counts = {f"{etype}_entities": _count(etype)
              for etype, _ in ENTITY_PATTERNS}
    counts["entities_extracted"] = F.size(F.col("entities"))
    return out.withColumns(counts)


def filter_by_entity(page_index: DataFrame, entity_type: str,
                     entity: str | None = None,
                     entities_col: str = "entities") -> DataFrame:
    """Entity-filtered search (meilisearch_service.py:353-412 entity
    filters): keep pages mentioning the entity type (optionally a specific
    value). Pure array predicate — pushes inside the scan projection."""
    pred = F.exists(
        F.col(entities_col),
        lambda e: (e["entity_type"] == entity_type)
        & (F.lit(entity is None) | (e["entity"] == F.lit(entity or ""))),
    )
    return page_index.filter(pred)
