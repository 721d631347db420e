"""Full-text page index: tokenization, inverted-term table, ranked search.

The reference delegates indexing to Meilisearch (S9/J7,
shared_pages_meilisearch.py:26-111): documents with searchable fields and
ranking rules ``words, …, quality_score:desc, word_count:desc`` (:167-176).
The engine's analog is explicit and queryable with Spark SQL (north_rule):

- ``page_index``      — one row per indexed page (flat document model);
- ``inverted_terms``  — ``(term, url_canon, ts14, tf)`` built by explode;
- search = broadcast-join the (tiny) query-term list against
  ``inverted_terms``, aggregate per page, rank by
  (matched_terms desc, tf_sum desc, quality_score desc, word_count desc).

Everything is built-in expressions — tokenization is a regex split, not a
UDF (SURVEY §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Unicode letters/digits tokenizer, lower-cased — deterministic analog of the
# Meilisearch default segmenter for latin text.
_TOKEN_SPLIT_RE = r"[^\p{L}\p{N}]+"


def tokenize(text: Column) -> Column:
    """array<string> of non-empty lower-case tokens."""
    return F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), _TOKEN_SPLIT_RE),
        lambda t: t != F.lit(""),
    )


def tokenize_query(q: str) -> list[str]:
    """Driver-side tokenizer for query strings — must agree with
    ``tokenize``: split on anything that is not a letter/digit, INCLUDING
    underscore (Python ``\\w`` keeps ``_``; the JVM class ``[^\\p{L}\\p{N}]``
    does not, so ``[\\W_]`` is the matching Python class)."""
    import re

    return [t for t in re.split(r"[\W_]+", q.lower()) if t]


def build_page_index(pages_out: DataFrame) -> DataFrame:
    """Flat searchable document per page (SharedPageDocument analog,
    shared_pages_meilisearch.py:26-111). Expects extraction + quality columns.
    """
    return pages_out.select(
        "url", "url_canon", "ts14", "host",
        F.col("extracted.title").alias("title"),
        F.col("extracted.text").alias("content"),
        F.col("extracted.word_count").alias("word_count"),
        "quality_score", "lang", "warc_ts",
    )


def page_index_from_pages_out(pages_out: DataFrame) -> DataFrame:
    """The searchable-document table DERIVED from the committed
    ``pages_out`` snapshot — a pure projection, so the crawl never writes
    the (large) text content twice. Iceberg analog: a view."""
    return pages_out.select(
        "url", "url_canon", "ts14", "host", "title",
        F.col("extracted_text").alias("content"),
        "word_count", "quality_score", "lang", "warc_ts",
    )


def build_inverted_terms(page_index: DataFrame) -> DataFrame:
    """Explode title+content tokens → (term, url_canon, ts14, tf).

    One shuffle (the groupBy); at 100 TB the table is Iceberg-partitioned by
    ``bucket(term)`` so a query's term list prunes to a few buckets.
    """
    toks = page_index.select(
        "url_canon", "ts14",
        F.explode(
            F.concat(tokenize(F.col("title")), tokenize(F.col("content")))
        ).alias("term"),
    )
    return toks.groupBy("term", "url_canon", "ts14").agg(
        F.count(F.lit(1)).alias("tf")
    )


def search(page_index: DataFrame, inverted_terms: DataFrame, query: str,
           limit: int = 20) -> DataFrame:
    """Ranked full-text match (J7). Ranking follows the reference's rule
    order analog: #matched terms desc (words), total tf desc (proximity/
    exactness proxy), then quality_score desc, word_count desc
    (shared_pages_meilisearch.py:167-176); deterministic final tie-break on
    (url_canon, ts14)."""
    terms = tokenize_query(query)
    spark = page_index.sparkSession
    if not terms:
        return page_index.limit(0).withColumns(
            {"matched_terms": F.lit(0).cast("long"),
             "tf_sum": F.lit(0).cast("long")})
    qdf = spark.createDataFrame([(t,) for t in set(terms)], "term string")
    hits = inverted_terms.join(F.broadcast(qdf), "term", "inner")
    scored = hits.groupBy("url_canon", "ts14").agg(
        F.countDistinct("term").alias("matched_terms"),
        F.sum("tf").alias("tf_sum"),
    )
    out = scored.join(page_index, ["url_canon", "ts14"], "inner")
    return (
        out.orderBy(
            F.desc("matched_terms"), F.desc("tf_sum"),
            F.desc("quality_score"), F.desc("word_count"),
            F.asc("url_canon"), F.asc("ts14"),
        )
        .limit(limit)
    )
