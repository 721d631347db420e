"""Steady-state revalidation rounds: the recrawl loop over a built catalog.

``CrawlJob`` (plans/crawl.py) builds the archive: every (url, ts14)
capture fetched once, extracted, indexed. This plan is the OTHER half of
a production crawler's life — keeping an archive fresh: pick the URLs
whose revisit is due (``recrawl.recrawl_schedule`` — observed Poisson
change rates × staleness), revalidate them against the origin with
stored HTTP validators (``fetch_http(validator_cols=…)``), and fold the
outcomes back into the catalog:

* **304 Not Modified** (the common case at steady state): no body, no
  extraction — the validators table records the check, the stored
  capture stays current. Bandwidth cost: one header exchange.
* **200 with a changed body**: the page changed — sniff the real content
  type (``mime_sniff.with_sniffed_mime``: origin servers lie), run the
  extraction cascade, append a NEW capture at ``now_ts14`` to
  ``pages_out`` and its postings to ``inverted_terms`` (the
  ``latest_captures`` current view flips to it automatically), store the
  fresh validators.
* **200 with an UNCHANGED body** (origin ignores conditionals, or has no
  validators): extracted text hashes to the stored ``prior_digest`` —
  treated as a pseudo-304 (outcome ``unchanged``): no new capture, no
  postings, validators stored as response-else-prior. Without this gate
  a validator-less origin would grow ``pages_out`` linearly per round
  with byte-identical captures.
* **Failures** — fetch errors AND 200s whose body fails the extraction
  gate (a page that became a stub/soft-404) — terminalize into the
  ``revalidate_log`` (E12 convention); stored validators are kept so the
  next attempt can still go conditional and the archive keeps treating
  the stored capture (the last GOOD content) as current. Validator
  advancement is gated on the COMMIT: only rows that produce a new
  capture (or validate the stored one) move the stored validators.

Catalog tables (all O(delta) commits — no accumulated-table probe):

* ``validators`` — append-only (url, etag, last_modified, checked_ts14,
  outcome); readers take the newest row per url (``latest_captures``
  collapse), the same Iceberg-friendly latest-wins shape as pages_out.
* ``revalidate_log`` — one row per check per round.
* ``pages_out`` / ``inverted_terms`` — fresh captures merge in under the
  crawl's own keys ((url_canon, ts14) / (term, url_canon, ts14));
  revalidation captures carry ``seq`` NULL (seq is the CRAWL-order id —
  a revalidation round has no crawl order) and ``round_idx`` = the
  revalidation round, so lineage stays attributable.

Scale shape: the due set is politeness-bounded like a crawl round; the
only shuffles are the latest-per-url collapses (key + short strings),
the (host, salt) fetch distribution, and the postings build for CHANGED
pages only. At archive steady state the changed fraction is small (the
long tail's change rates are near zero), so the round's cost converges
to header exchanges plus delta-sized commits — this is what makes a
10^10-URL archive refreshable at all.

``now_ts14`` is an explicit parameter (determinism: tests and replays
pin it; the driver passes wall clock).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chrono_scraper_spark.operators.dedup import latest_captures
from chrono_scraper_spark.operators.extraction import (
    with_extraction,
    with_quality_score,
)
from chrono_scraper_spark.operators.mime_sniff import with_sniffed_mime
from chrono_scraper_spark.operators.politeness import (
    with_salted_host_partition,
)
from chrono_scraper_spark.operators.recrawl import (
    merge_revalidated,
    recrawl_schedule,
)
from chrono_scraper_spark.operators.index import (
    build_inverted_terms,
    build_page_index,
)
from chrono_scraper_spark.plans.catalog import SnapshotCatalog
from chrono_scraper_spark.plans.crawl import FRONTIER_KEY
from chrono_scraper_spark.sources.httpfetch import fetch_http
from chrono_scraper_spark import config as C

_VALIDATOR_SCHEMA = ("url string, etag string, last_modified string, "
                     "checked_ts14 string, outcome string")


class RevalidateJob:
    """One revalidation round per call; composes with a built catalog."""

    def __init__(self, spark: SparkSession, catalog_root: str, *,
                 http_fetch: dict | None = None,
                 due_threshold_e9: int = 1,
                 max_urls: int | None = None,
                 force_all: bool = False):
        self.spark = spark
        self.cat = SnapshotCatalog(spark, catalog_root)
        self.http_fetch = dict(http_fetch or {})
        self.http_fetch.pop("validator_cols", None)  # owned by the plan
        self.due_threshold_e9 = due_threshold_e9
        self.max_urls = max_urls
        self.force_all = force_all

    # -- reads -------------------------------------------------------------

    def _stored_validators(self) -> DataFrame:
        vals = self.cat.read_or_empty("validators", _VALIDATOR_SCHEMA)
        return latest_captures(vals, key_cols=("url",),
                               ts_col="checked_ts14") \
            .select("url", "etag", "last_modified")

    def _due_urls(self, pages: DataFrame) -> DataFrame:
        if self.force_all:
            due = pages.select("url").distinct()
            return due
        hist = pages.select("url", "warc_ts", "digest")
        sched = recrawl_schedule(hist, due_threshold_e9=self.due_threshold_e9)
        due = sched.filter(F.col("due") | F.col("cold_start"))
        if self.max_urls is not None:
            due = (due.orderBy(F.desc("score_e9"), "url")
                   .limit(self.max_urls))
        return due.select("url")

    # -- the round ----------------------------------------------------------

    def run_round(self, round_idx: int, now_ts14: str,
                  urls: DataFrame | None = None) -> dict:
        """One revalidation round. ``urls`` (a 1-column ``url`` frame)
        overrides the due-set selection — the hook for EXTERNAL change
        signals: sitemap lastmod claims, feed items, alert follow-ups,
        or a micro-batch stream (streaming.micro_batch.
        revalidate_stream_writer)."""
        pages = self.cat.read("pages_out")
        latest = latest_captures(
            pages.select("url", "url_canon", "ts14", "host", "lang",
                         "digest", "extracted_text", "title"))
        due = (urls.select("url").distinct() if urls is not None
               else self._due_urls(pages))
        prior = (latest
                 .join(due, "url", "left_semi")
                 .join(self._stored_validators(), "url", "left")
                 .select(
                     "url", "url_canon", "ts14", "host", "lang",
                     F.col("digest").alias("prior_digest"),
                     F.col("extracted_text").alias("prior_text"),
                     F.col("title").alias("prior_title"),
                     F.col("etag").alias("prior_etag"),
                     F.col("last_modified").alias("prior_last_modified")))
        work = with_salted_host_partition(prior)
        fetched = fetch_http(
            work, validator_cols=("prior_etag", "prior_last_modified"),
            **self.http_fetch)
        # live fetches are side-effectful and non-idempotent per run:
        # materialize ONCE, every downstream branch reads the cache
        merged = merge_revalidated(fetched).cache()
        counters = {
            "round_idx": round_idx,
            "checked": merged.count(),
            "not_modified": merged.filter("not_modified").count(),
        }

        fresh_in = merged.filter(~F.col("not_modified")
                                 & F.col("html").isNotNull())
        sniffed = with_sniffed_mime(fresh_in, payload_col="html",
                                    declared_col="content_type")
        # cached: the extraction UDF output feeds three actions (commit
        # gate, pages merge, postings merge) — run it once per row
        extracted = with_quality_score(
            with_extraction(sniffed, mime_col="effective_mime").drop("html"),
            "extracted.text").cache()
        # commit gate + unchanged-content gate, DEFINED ONCE: only a
        # COMPLETED extraction whose text differs from the stored capture
        # commits. A byte-identical body (origin ignored the conditional,
        # or has no validators) is a pseudo-304 — appending it every round
        # would grow pages_out linearly with no information. The same two
        # flags drive the commit filter, the validator routing, and the
        # outcome counters below.
        flagged = (extracted
                   .withColumn("_completed",
                               F.col("fetch_status") == C.STATUS_COMPLETED)
                   .withColumn("_unchanged",
                               F.md5(F.col("extracted.text"))
                               .eqNullSafe(F.col("prior_digest"))))
        completed = (flagged
                     .filter(F.col("_completed") & ~F.col("_unchanged"))
                     .withColumn("ts14", F.lit(now_ts14))
                     .withColumn("warc_ts", F.to_timestamp(
                         F.lit(now_ts14), "yyyyMMddHHmmss")))
        new_pages = completed.select(
            "url", "url_canon", "ts14", "host", "warc_ts", "lang",
            F.md5(F.col("extracted.text")).alias("digest"),
            F.col("extracted.text").alias("extracted_text"),
            F.col("extracted.title").alias("title"),
            F.col("extracted.word_count").alias("word_count"),
            "quality_score",
            F.lit(round_idx).alias("round_idx"),
            F.lit(None).cast("long").alias("seq"),
        )
        inv = build_inverted_terms(build_page_index(completed))

        # validators to STORE, gated on the commit: merged.etag holds the
        # fetch-level routing (response validators on fresh 200s, stored
        # ones on 304s/fetch failures — merge_revalidated), but a 200
        # whose body FAILS the extraction gate commits nothing, so its
        # validators must not advance either — otherwise every later
        # round 304s against content the archive never stored.
        ex_flags = flagged.select("url", "_completed", "_unchanged")
        vals_src = merged.join(ex_flags, "url", "left")
        is_unchanged = F.coalesce(
            F.col("_completed") & F.col("_unchanged"), F.lit(False))
        is_fresh = F.coalesce(
            F.col("_completed") & ~F.col("_unchanged"), F.lit(False))
        outcome = (F.when(F.col("not_modified"), "not_modified")
                   .when(is_unchanged, "unchanged")
                   .when(is_fresh, "fresh")
                   .otherwise("failed"))
        store_etag = (
            F.when(F.col("not_modified") | is_fresh, F.col("etag"))
            .when(is_unchanged, F.coalesce("etag", "prior_etag"))
            .otherwise(F.col("prior_etag")))
        store_lm = (
            F.when(F.col("not_modified") | is_fresh,
                   F.col("last_modified"))
            .when(is_unchanged,
                  F.coalesce("last_modified", "prior_last_modified"))
            .otherwise(F.col("prior_last_modified")))
        val_rows = vals_src.select(
            "url", store_etag.alias("etag"),
            store_lm.alias("last_modified"),
            F.lit(now_ts14).alias("checked_ts14"), outcome.alias("outcome"))
        log_rows = merged.select(
            F.lit(round_idx).alias("round_idx"), "url", "http_status",
            "fetch_err", "not_modified",
            F.lit(now_ts14).alias("checked_ts14"))

        # one aggregation job yields both outcome counters (and forces the
        # extraction cache before the merges, like the r4 phase-tick fix)
        oc = flagged.agg(
            F.sum((F.col("_completed") & ~F.col("_unchanged"))
                  .cast("long")).alias("fresh"),
            F.sum((F.col("_completed") & F.col("_unchanged"))
                  .cast("long")).alias("unchanged")).first()
        counters["fresh"] = int(oc["fresh"] or 0)
        counters["unchanged"] = int(oc["unchanged"] or 0)
        self.cat.merge_not_matched("pages_out", new_pages, FRONTIER_KEY,
                                   properties={"revalidate_round": round_idx},
                                   assume_unique=True)
        self.cat.merge_not_matched("inverted_terms", inv,
                                   ["term", "url_canon", "ts14"],
                                   properties={"revalidate_round": round_idx},
                                   assume_unique=True)
        self.cat.append("validators", val_rows,
                        operation="revalidate",
                        properties={"revalidate_round": round_idx})
        self.cat.append("revalidate_log", log_rows,
                        operation="revalidate",
                        properties={"revalidate_round": round_idx})

        counters["failed"] = (counters["checked"]
                              - counters["not_modified"]
                              - counters["fresh"]
                              - counters["unchanged"])
        extracted.unpersist()
        merged.unpersist()
        return counters
