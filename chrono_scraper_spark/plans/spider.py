"""Spider mode: link-guided frontier expansion over the capture archive.

The reference's frontier comes from CDX discovery (every capture matching
the project seeds); a SPIDER starts from a seed URL set and reaches only
what links reach — the crawl shape every general-purpose crawler runs and
the natural way to harvest a coherent subgraph out of a 10^10-capture
archive (follow links from a hub page instead of fetching a domain
wholesale).

Composition, not new machinery: each round is ``CrawlJob.run_round`` via
its ``discovered`` injection (the same single code path batch and
streaming rounds share), and expansion is ``operators/links.extract_links``
over the html of the captures fetched THIS round, joined back to the
archive for the targets' captures. The seen set, filter chain,
politeness budgets, ordering, extraction, and idempotent commits are all
the round's own; the spider adds exactly one archive semi-join and one
url_seen anti-join per round.

Scale shape: the corpus discovery frame is computed once and cached; per
round the only new work is links(html of fetched rows) — fetched-rows
cardinality, not corpus — and two key joins (dst_url semi-join against
the archive, url anti-join against url_seen). Frontier growth is bounded
by the politeness budget exactly like a live crawler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import ts14 as _ts14
from ..operators.dedup import collapse_digest, in_batch_dedup
from ..operators.feeds import discover_feeds, parse_feeds
from ..operators.links import extract_links, meta_robots
from ..operators.sitemaps import (
    parse_sitemaps,
    sitemap_index_refs,
    sitemap_urls_from_robots,
)
from ..sources.cdx import discover, read_pages
from .crawl import FRONTIER_KEY

#: discovery channels run_spider can expand through each round
CHANNELS = ("links", "feeds", "sitemaps")


def _latest_bodies(pages: DataFrame, urls: DataFrame) -> DataFrame:
    """Archive bodies (host, body) for the given url set — the latest
    capture per url plays the live fetch a replay cannot make. The url
    set is discovery-sized (feeds/sitemaps a round's pages advertise),
    so the semi-join probes the archive once and the agg is tiny."""
    hit = pages.join(urls.select("url").distinct(), "url", "left_semi")
    return (hit.groupBy("url", "host")
            .agg(F.max_by(F.col("html").cast("string"), "ts14")
                 .alias("body")))


def _feed_targets(pages: DataFrame, payload: DataFrame) -> DataFrame:
    """Feed channel: ``<link rel=alternate type=rss/atom>`` feeds
    advertised by THIS round's fetched pages, their bodies replayed from
    the archive, their ``<item>``/``<entry>`` links as frontier targets."""
    feeds = (discover_feeds(payload)
             .select(F.col("feed_url").alias("url")))
    bodies = _latest_bodies(pages, feeds)
    return parse_feeds(bodies).select(F.col("item_url").alias("url"))


def _sitemap_targets(pages: DataFrame, payload: DataFrame,
                     robots_bodies: DataFrame) -> DataFrame:
    """Sitemap channel: ``Sitemap:`` lines from the robots bodies of the
    hosts fetched THIS round, urlset bodies replayed from the archive
    (one level of ``<sitemapindex>`` nesting, per protocol), their
    ``<loc>`` entries as frontier targets."""
    hosts = payload.select("host").distinct()
    smaps = (sitemap_urls_from_robots(robots_bodies)
             .join(hosts, "host", "left_semi")
             .select(F.col("sitemap_url").alias("url")))
    bodies = _latest_bodies(pages, smaps)
    children = (sitemap_index_refs(bodies)
                .select(F.col("child_url").alias("url")))
    bodies = bodies.unionByName(_latest_bodies(pages, children))
    return parse_sitemaps(bodies).select(F.col("loc").alias("url"))


def run_spider(job, seed_urls, max_rounds: int = 10,
               channels: tuple = ("links",),
               robots_bodies: DataFrame | None = None) -> list[dict]:
    """Run link-guided rounds until the reachable set is exhausted or
    ``max_rounds`` is hit. ``seed_urls``: list of URL strings or a
    DataFrame with a ``url`` column. Returns per-round counter dicts
    (each also carries ``spider_new_urls`` — the fresh URLs the round's
    links discovered — and ``channel_new``, the per-channel breakdown).

    ``channels`` ⊆ {"links", "feeds", "sitemaps"} selects the discovery
    channels (reference: CDX is the only channel; round 4 added the two
    standard publisher-inventory channels). "feeds" parses the RSS/Atom
    feeds advertised by pages fetched this round; "sitemaps" parses the
    sitemaps named in ``robots_bodies`` (required: (host, body) rows)
    for hosts fetched this round. Feed/sitemap BODIES are replayed from
    the archive as a sidecar — they model the reference's separate
    poller, so they enter neither fetch_log nor url_seen; only the PAGE
    urls they announce join the frontier. REP nofollow governs the links
    channel only: feeds/sitemaps are publisher-declared inventory, where
    nofollow has no protocol meaning."""
    spark = job.spark
    if not channels:
        raise ValueError("channels must name at least one discovery "
                         f"channel of {sorted(CHANNELS)}")
    bad = set(channels) - set(CHANNELS)
    if bad:
        raise ValueError(f"unknown discovery channels: {sorted(bad)}")
    if "sitemaps" in channels and robots_bodies is None:
        raise ValueError("channels=('sitemaps',...) requires "
                         "robots_bodies=(host, body) rows")
    if not isinstance(seed_urls, DataFrame):
        seed_urls = spark.createDataFrame(
            [(u,) for u in seed_urls], "url string")
    pages = read_pages(spark, job.pages_path)
    if "ts14" not in pages.columns:
        pages = pages.withColumn("ts14", _ts14(F.col("warc_ts")))
    raw = discover(pages, job.seeds,
                   allowed_mime=None if job.include_attachments
                   else ["text/html"]).cache()

    def _caps(urls: DataFrame) -> DataFrame:
        hit = raw.join(urls.select("url"), "url", "left_semi")
        return in_batch_dedup(collapse_digest(hit), FRONTIER_KEY)

    cands = _caps(seed_urls)
    stats: list[dict] = []
    for r in range(max_rounds):
        # carry the frontier deferred by the previous round (the same
        # union run_stream_round does — discovered= injection bypasses
        # run_round's own carry path)
        if r > 0:
            prev = job._prev_versions(r)
            if prev.get("frontier") is not None:
                carried = job._read_pinned("frontier", prev,
                                           "url string").drop("decision")
                cands = cands.unionByName(carried,
                                          allowMissingColumns=True)
                if "retry_count" in cands.columns:
                    cands = cands.withColumn(
                        "retry_count",
                        F.coalesce(F.col("retry_count"),
                                   F.lit(0).cast("int")))
                cands = in_batch_dedup(cands, FRONTIER_KEY)
        res = job.run_round(r, discovered=cands)
        # expand: links from the captures fetched this round (archive
        # html of the fetched keys — fetched cardinality, not corpus)
        fetched = (job.cat.read("fetch_log")
                   .filter((F.col("round_idx") == r)
                           & (F.col("fetch_status") == "completed"))
                   .select("url", "ts14"))
        payload = (pages.join(fetched, ["url", "ts14"], "left_semi")
                   .select("url", "host", "html"))
        parts = []
        if "links" in channels:
            # honor the Robots Exclusion Protocol at page level: drop
            # rel="nofollow" links, and drop ALL links from pages whose
            # <meta name="robots"> says nofollow/none
            nf_pages = (meta_robots(payload).filter("nofollow")
                        .select(F.col("url").alias("src_url")))
            parts.append(extract_links(payload)
                         .filter(~F.col("nofollow"))
                         .join(nf_pages, "src_url", "left_anti")
                         .select(F.col("dst_url").alias("url"))
                         .withColumn("channel", F.lit("links")))
        if "feeds" in channels:
            parts.append(_feed_targets(pages, payload)
                         .withColumn("channel", F.lit("feeds")))
        if "sitemaps" in channels:
            parts.append(_sitemap_targets(pages, payload, robots_bodies)
                         .withColumn("channel", F.lit("sitemaps")))
        targets = parts[0]
        for p in parts[1:]:
            targets = targets.unionByName(p)
        targets = targets.distinct()
        seen = job.cat.read("url_seen").select("url").distinct()
        fresh = targets.join(seen, "url", "left_anti")
        # fresh IN-ARCHIVE urls only: off-archive links (dead ends the
        # replay cannot fetch) neither count nor cost a round. The
        # channel breakdown credits every channel that found a url (a
        # url two channels announce counts once in the frontier but in
        # both channels' tallies).
        in_archive = fresh.join(raw.select("url").distinct(),
                                "url", "left_semi")
        channel_new = {c: 0 for c in channels}
        channel_new.update(
            {r["channel"]: r["n"] for r in
             in_archive.groupBy("channel")
             .agg(F.countDistinct("url").alias("n")).collect()})
        cands = _caps(fresh.select("url").distinct())
        n_new = cands.select("url").distinct().count()
        res["spider_new_urls"] = n_new
        res["channel_new"] = channel_new
        stats.append(res)
        # done only when links uncovered nothing AND no deferred rows
        # are owed a next round (budget-deferred work must drain)
        if n_new == 0 and not res.get("deferred"):
            break
    raw.unpersist()
    return stats
