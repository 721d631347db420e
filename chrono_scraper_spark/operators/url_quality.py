"""URL-level corpus hygiene: domain blocklist + soft banned-word scoring
(the RefinedWeb §2.1 "URL filtering" stage of a training-data pipeline).

Two independent signals, composed into one decision:
- **Domain blocklist** (UT1-style curated list): an exact-host broadcast
  join — the list is a dimension table (≤ a few million rows), the corpus
  never shuffles.
- **Soft banned-word URL score**: each lexicon word carries a severity
  weight; the URL's score is the sum over words that appear as substrings
  (RefinedWeb matches on the raw URL string). With a fixed lexicon this
  compiles to a static CASE-sum — one whole-stage-codegen projection,
  zero shuffle, embarrassingly parallel at 100 TB.

The reference's equivalent gate is its filter chain's pattern families
(backend/app/utils/url_filters.py via services' should_process_url);
this operator is the corpus-quality sibling the reference user needs when
the crawl feeds an LLM corpus. The lexicon below is a deliberately small
spam-vocabulary stand-in (same convention as ``langid``'s heuristic —
swap in the full UT1 list as a config at deploy time); weights follow
RefinedWeb's three strictness tiers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (word, weight): strict=5.0 blocks alone, medium=2.0, soft=1.0 —
# RefinedWeb's tiering. Matching is case-insensitive substring on the URL.
URL_SPAM_LEXICON: list[tuple[str, float]] = [
    ("porn", 5.0), ("xxx", 5.0), ("escort", 5.0),
    ("casino", 2.0), ("viagra", 2.0), ("webcam", 2.0), ("lottery", 2.0),
    ("poker", 1.0), ("pills", 1.0), ("bet", 1.0), ("adult", 1.0),
    ("dating", 1.0),
]
BLOCK_THRESHOLD = 5.0


def url_spam_score(url: Column,
                   lexicon: list[tuple[str, float]] | None = None) -> Column:
    """Sum of weights of lexicon words appearing in the lower-cased URL.
    Static expression tree — stays inside codegen, no UDF."""
    low = F.lower(F.coalesce(url, F.lit("")))
    score: Column = F.lit(0.0)
    for word, weight in (lexicon or URL_SPAM_LEXICON):
        score = score + F.when(low.contains(word), F.lit(weight)) \
            .otherwise(F.lit(0.0))
    return score


def with_url_quality(df: DataFrame, blocklist: DataFrame,
                     url_col: str = "url", host_col: str = "host",
                     threshold: float = BLOCK_THRESHOLD) -> DataFrame:
    """Adds ``blocklisted`` (exact-host hit), ``url_spam_score``, and
    ``url_decision`` ('blocked_domain' > 'blocked_spam' > 'clean').
    ``blocklist`` must carry a ``domain`` column; it is broadcast — the
    corpus side keeps its partitioning."""
    bl = F.broadcast(blocklist.select(F.col("domain")).distinct()
                     .withColumn("__blocked", F.lit(True)))
    joined = df.join(bl, df[host_col] == bl["domain"], "left") \
        .drop("domain")
    score = url_spam_score(F.col(url_col))
    return joined.withColumns({
        "blocklisted": F.coalesce(F.col("__blocked"), F.lit(False)),
        "url_spam_score": score,
        "url_decision": F.when(F.coalesce(F.col("__blocked"), F.lit(False)),
                               F.lit("blocked_domain"))
        .when(score >= threshold, F.lit("blocked_spam"))
        .otherwise(F.lit("clean")),
    }).drop("__blocked")


def sql_url_spam_score(url_expr: str,
                       lexicon: list[tuple[str, float]] | None = None) -> str:
    """DuckDB expression mirroring :func:`url_spam_score` — one shared
    lexicon table for engine and oracle."""
    parts = [
        f"CASE WHEN contains(lower(coalesce({url_expr}, '')), '{w}') "
        f"THEN {wt} ELSE 0.0 END"
        for w, wt in (lexicon or URL_SPAM_LEXICON)
    ]
    return "(" + " + ".join(parts) + ")"
