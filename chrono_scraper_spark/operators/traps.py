"""Crawl-trap detection: infinite URL spaces and duplicate-content URL
families.

The reference replays Wayback's finite CDX index, so it never meets a
live crawler's classic failure mode: URL spaces that grow without bound
(calendar pages, faceted-search permutations, session-id echoes,
symlinked directory cycles). This module adds the standard defenses as
relational passes over the frontier/capture log — flags, not drops, in
the same annotate-don't-delete spirit as the F-chain:

* ``url_trap_flags`` — per-URL structural heuristics, one zero-shuffle
  codegen projection:
  - ``repeated_segment``: some path segment repeats ≥ ``max_seg_rep``
    times (``/a/b/a/b/a/b`` — cycle echo);
  - ``too_deep``: path depth > ``max_depth``;
  - ``too_many_params``: > ``max_params`` query parameters (faceted
    explosion);
  - ``calendar_path``: ≥ ``max_dates`` date-shaped segments in one path
    (endless-calendar pattern);
  - ``is_trap_url``: OR of the above.
* ``host_trap_stats`` — per-host content-duplication evidence from the
  capture log: ``n_urls``, ``n_distinct_digests``, and the
  urls-per-distinct-content ratio in ppm; a host serving many URLs with
  few distinct bodies (session ids, print views) is marked
  ``dup_content_trap`` above ``dup_ratio_ppm``. One map-side-combined
  aggregation; the shuffle carries (host, digest) hashes, never bodies.

At 10^10-URL scale both passes are frontier-shaped: the flags
projection fuses into the existing decision chain, and the host stats
aggregate at host cardinality. Schedulers then downweight or budget-cap
flagged hosts (compose with ``politeness.schedule_round``'s
budget_overrides).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_depth, url_path, url_query

DATE_SEG_RE = r"^(19|20)\d{2}$|^\d{1,2}$|^(19|20)\d{2}-\d{2}(-\d{2})?$"


def _segments(url: Column) -> Column:
    return F.filter(F.split(url_path(url), "/"),
                    lambda s: s != F.lit(""))


def url_trap_flags(frontier: DataFrame, url_col: str = "url",
                   max_seg_rep: int = 3, max_depth: int = 12,
                   max_params: int = 6, max_dates: int = 3) -> DataFrame:
    """Append the per-URL trap flag columns (zero-shuffle projection)."""
    u = F.col(url_col)
    segs = _segments(u)
    # max repetition count of any segment: for each distinct segment,
    # count its occurrences — distinct list is small (path segments)
    rep = F.array_max(F.concat(F.array(F.lit(0)), F.transform(
        F.array_distinct(segs),
        lambda d: F.size(F.filter(segs, lambda s: s == d)))))
    q = F.coalesce(url_query(u), F.lit(""))
    params = F.when(q == "", F.lit(0)).otherwise(F.size(F.split(q, "&")))
    dates = F.size(F.filter(segs, lambda s: s.rlike(DATE_SEG_RE)))
    out = (frontier
           .withColumn("repeated_segment", rep >= max_seg_rep)
           .withColumn("too_deep", url_depth(u) > max_depth)
           .withColumn("too_many_params", params > max_params)
           .withColumn("calendar_path", dates >= max_dates))
    return out.withColumn(
        "is_trap_url",
        F.col("repeated_segment") | F.col("too_deep")
        | F.col("too_many_params") | F.col("calendar_path"))


def host_trap_stats(captures: DataFrame, host_col: str = "host",
                    digest_col: str = "digest",
                    min_urls: int = 20,
                    dup_ratio_ppm: int = 5_000_000) -> DataFrame:
    """Per-host duplicate-content evidence:
    (host, n_urls, n_distinct_digests, urls_per_content_ppm,
    dup_content_trap). ``urls_per_content_ppm`` = n_urls·1e6 DIV
    n_distinct_digests (integer — engine/partitioning independent);
    hosts under ``min_urls`` never flag (no evidence)."""
    per = captures.groupBy(F.col(host_col).alias("host")).agg(
        F.count_distinct("url").alias("n_urls"),
        F.count_distinct(F.col(digest_col)).alias("n_distinct_digests"))
    ratio = F.expr("n_urls * 1000000 DIV n_distinct_digests")
    return per.select(
        "host", "n_urls", "n_distinct_digests",
        ratio.cast("long").alias("urls_per_content_ppm"),
        ((F.col("n_urls") >= min_urls)
         & (ratio >= dup_ratio_ppm)).alias("dup_content_trap"))
