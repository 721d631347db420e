"""CDX-index scan analog (SURVEY §2.1 S1-S5): the corpus table IS the index.

The reference pages through a remote CDX API with server-side filters
(``statuscode:200``, mime whitelist, date range, domain match, field list —
wayback_machine.py:741-907). Over an Iceberg/parquet corpus those become
pushed-down predicates + column pruning on one declarative scan; pagination
disappears (partitions are the pages). Seed matching (exact/prefix/domain/
regex, project.py:34-39) is evaluated once per row against a broadcast seed
list — one scan regardless of seed count, instead of the reference's
scan-per-domain loop.

All predicates here are JVM column expressions: the status/mime/date filters
reach the parquet reader (PushedFilters), and the static-asset pre-filter
(wayback_machine.py:389-532) is a single vectorized boolean expression.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import config as C
from ..functions.urls import ts14, with_url_parts

# frontier columns every downstream operator relies on (the CDX `fl=` list,
# wayback_machine.py:779, plus derived url parts)
FRONTIER_COLUMNS = [
    "url", "warc_ts", "ts14", "host", "path", "url_canon", "mime", "status",
    "digest", "length", "project_id",
]


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """The Common-Crawl-style corpus (input_hint shape + frontier columns)."""
    return spark.read.parquet(path)


def seed_match_condition(match_type_col: Column, domain_col: Column,
                         path_prefix_col: Column, url: Column,
                         host: Column) -> Column:
    """One row-vs-seed match predicate covering all four match types
    (project.py:34-39; common_crawl_direct_service.py:209-231)."""
    url_noscheme = F.regexp_replace(url, r"^https?://", "")
    prefix = F.concat(domain_col, F.coalesce(path_prefix_col, F.lit("")))
    return (
        F.when(match_type_col == "exact", host == domain_col)
        .when(match_type_col == "domain",
              (host == domain_col) | host.endswith(F.concat(F.lit("."), domain_col)))
        .when(match_type_col == "prefix", url_noscheme.startswith(prefix))
        .when(match_type_col == "regex", F.regexp_like(url, domain_col))
        .otherwise(F.lit(False))
    )


def static_asset_condition(url: Column, path: Column, mime: Column) -> Column:
    """F1 scan-level pre-filter (wayback_machine.py:389-532): True ⇒ drop.
    One boolean expression — extension suffix, mime class, path patterns."""
    lower_path = F.lower(path)
    ext_hit = reduce(
        lambda a, b: a | b,
        [lower_path.endswith(e) for e in C.STATIC_ASSET_EXTENSIONS],
    )
    mime_hit = reduce(
        lambda a, b: a | b,
        [mime.startswith(p) for p in C.STATIC_ASSET_MIME_PREFIXES]
        + [mime == m for m in C.STATIC_ASSET_MIME_EXACT],
    )
    pattern_hit = reduce(
        lambda a, b: a | b,
        [F.lower(url).contains(p) for p in C.STATIC_ASSET_URL_PATTERNS],
    )
    return ext_hit | mime_hit | pattern_hit


def discover(
    pages: DataFrame,
    seeds: DataFrame,
    *,
    drop_static_assets: bool = True,
    allowed_mime: list[str] | None = None,
    allowed_status: int = C.CDX_ALLOWED_STATUS,
) -> DataFrame:
    """S1-S5: corpus scan × seed list → candidate frontier.

    ``seeds`` columns: project_id int, domain_name string, match_type string,
    url_path string, from_date date, to_date date, max_pages int (nullable).
    The seed list is tiny → broadcast nested-loop join with the match
    predicate; status/mime/date filters push into the scan.
    """
    allowed_mime = allowed_mime or C.CDX_ALLOWED_MIME
    df = pages
    if "host" not in df.columns or "url_canon" not in df.columns:
        df = with_url_parts(df)
    if "ts14" not in df.columns:
        df = df.withColumn("ts14", ts14(F.col("warc_ts")))

    # server-side CDX filters (wayback_machine.py:766-781) — pushed down
    df = df.filter(F.col("status") == allowed_status)
    df = df.filter(F.col("mime").isin(allowed_mime))

    cond = seed_match_condition(
        seeds["match_type"], seeds["domain_name"], seeds["url_path"],
        df["url"], df["host"],
    )
    cond = cond & (
        seeds["from_date"].isNull()
        | (F.to_date(df["warc_ts"]) >= seeds["from_date"])
    ) & (
        seeds["to_date"].isNull()
        | (F.to_date(df["warc_ts"]) <= seeds["to_date"])
    )
    matched = df.join(
        F.broadcast(seeds.select("project_id", "domain_name", "match_type",
                                 "url_path", "from_date", "to_date")),
        cond, "inner",
    )

    if drop_static_assets:
        matched = matched.filter(
            ~static_asset_condition(F.col("url"), F.col("path"), F.col("mime"))
        )
    keep = [c for c in matched.columns
            if c in FRONTIER_COLUMNS or c in ("html", "text", "lang", "title")]
    return matched.select(*keep)
