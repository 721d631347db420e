"""End-to-end crawl: ordering + URL-seen parity vs the Python oracle,
resume from snapshots, torn-round replay, full-text search over the result.
"""

from __future__ import annotations

import pytest

from chrono_scraper_spark.corpus import generate_pages
from chrono_scraper_spark.operators.index import search
from chrono_scraper_spark.plans.catalog import SnapshotCatalog
from chrono_scraper_spark.plans.crawl import CrawlJob

from .crawl_oracle import crawl_oracle

RPS, BURST, ROUND_SECONDS = 0.1, 2, 60.0  # budget: 8 in round 0, 6 after


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("crawl") / "pages")
    generate_pages(spark, 60, partitions=4).write.parquet(p)
    return p


@pytest.fixture(scope="module")
def seeds(spark):
    return spark.createDataFrame(
        [(1, r"https://.*", "regex", None, None, None)],
        "project_id int, domain_name string, match_type string, "
        "url_path string, from_date date, to_date date")


def _job(spark, tmp, corpus_path, seeds, name):
    cat = SnapshotCatalog(spark, str(tmp / name))
    return CrawlJob(spark, cat, corpus_path, seeds, rps=RPS, burst=BURST,
                    round_seconds=ROUND_SECONDS, salt_target_rows=10)


def _oracle(spark, corpus_path):
    rows = [r.asDict() for r in
            spark.read.parquet(corpus_path).selectExpr(
                "url", "warc_ts", "date_format(warc_ts,'yyyyMMddHHmmss') ts14",
                "host", "mime", "status", "digest", "length", "text").collect()]
    return crawl_oracle(rows, rps=RPS, burst=BURST, round_seconds=ROUND_SECONDS)


def _engine_state(cat):
    log = [(r["round_idx"], r["seq"], r["url"], r["ts14"], r["fetch_status"])
           for r in cat.read("fetch_log").collect()]
    log.sort(key=lambda t: (t[0], t[1]))
    seen = {(r["url"], r["ts14"]): (r["status"], r["first_seen_round"])
            for r in cat.read("url_seen").collect()}
    filtered = {(r["url"], r["ts14"]): (r["status"], r["filter_reason"])
                for r in cat.read("filtered_log").collect()}
    return log, seen, filtered


def test_crawl_matches_oracle(spark, tmp_path, corpus_path, seeds):
    job = _job(spark, tmp_path, corpus_path, seeds, "wh_main")
    rounds = job.run(max_rounds=50)
    assert rounds and rounds[-1].get("deferred", 0) == 0
    exp = _oracle(spark, corpus_path)
    log, seen, filtered = _engine_state(job.cat)
    assert log == exp["fetch_log"]          # crawl ordering, byte-for-byte
    assert seen == exp["url_seen"]          # final URL-seen set
    assert set(filtered) == set(exp["filtered"])
    for k, (status, reason) in exp["filtered"].items():
        assert filtered[k] == (status, reason), k

    # lineage recorded one row per round with partition counts
    lineage = job.cat.read("crawl_rounds").collect()
    assert len(lineage) == len(rounds)

    # full-text search works over the committed index (page_index is a
    # projection of pages_out, not a separate table)
    from chrono_scraper_spark.operators.index import page_index_from_pages_out

    pi = page_index_from_pages_out(job.cat.read("pages_out"))
    inv = job.cat.read("inverted_terms")
    some_word = pi.selectExpr("split(content, ' ')[0] w").first()["w"]
    hits = search(pi, inv, some_word, limit=5)
    assert hits.count() > 0


def test_resume_equals_uninterrupted(spark, tmp_path, corpus_path, seeds):
    ref = _job(spark, tmp_path, corpus_path, seeds, "wh_ref")
    ref.run(max_rounds=50)

    half = _job(spark, tmp_path, corpus_path, seeds, "wh_half")
    half.run_round(0)
    half.run_round(1)
    # fresh job object over the same catalog — resume from snapshots
    resumed = _job(spark, tmp_path, corpus_path, seeds, "wh_half")
    assert resumed.next_round() == 2
    resumed.run(max_rounds=50)

    assert _engine_state(ref.cat) == _engine_state(resumed.cat)


def test_torn_round_replay(spark, tmp_path, corpus_path, seeds):
    """Crash simulation: round 1 commits everything, then the crawl_rounds
    lineage pointer is rolled back (= crash before the round's commit point).
    Replaying round 1 against the pinned previous-round versions must
    converge to the identical final state."""
    ref = _job(spark, tmp_path, corpus_path, seeds, "wh_ref2")
    ref.run(max_rounds=50)

    job = _job(spark, tmp_path, corpus_path, seeds, "wh_torn")
    job.run_round(0)
    job.run_round(1)
    # roll back the lineage pointer only — all other tables keep round 1 data
    cur = job.cat._tdir("crawl_rounds") + "/_current"
    with open(cur) as f:
        v = int(f.read())
    with open(cur, "w") as f:
        f.write(str(v - 1))
    replay = _job(spark, tmp_path, corpus_path, seeds, "wh_torn")
    assert replay.next_round() == 1  # the torn round is not "done"
    replay.run(max_rounds=50)
    assert _engine_state(ref.cat) == _engine_state(replay.cat)


def test_mixed_html_pdf_corpus_end_to_end(spark, tmp_path, seeds):
    """PDF rows flow through the WHOLE pipeline: admitted by the CDX mime
    filter, scheduled, routed through the PDF parser, byte-identical text
    in pages_out, searchable in the index."""
    corpus = str(tmp_path / "pages_pdf")
    generate_pages(spark, 60, partitions=4, pdf_every=8).write.parquet(corpus)
    cat = SnapshotCatalog(spark, str(tmp_path / "wh_pdf"))
    job = CrawlJob(spark, cat, corpus, seeds, rps=10_000.0, burst=0,
                   round_seconds=60.0)
    job.run(max_rounds=3)

    log = cat.read("fetch_log")
    methods = {r["extract_method"] for r in
               log.select("extract_method").distinct().collect()}
    assert "pdf" in methods and "article" in methods
    # every completed pdf row's extracted text is byte-identical to source
    src = {(r["url"], r["ts14"]): r["text"] for r in
           spark.read.parquet(corpus).selectExpr(
               "url", "date_format(warc_ts,'yyyyMMddHHmmss') ts14",
               "text", "mime").collect()
           if r["mime"] == "application/pdf"}
    assert src, "corpus must contain pdf captures"
    got = {(r["url"], r["ts14"]): r["extracted_text"] for r in
           cat.read("pages_out").filter("round_idx >= 0").collect()}
    checked = 0
    for k, text in src.items():
        if k in got:           # short pdfs fail the word-count gate
            assert got[k] == text, k
            checked += 1
    assert checked > 0
