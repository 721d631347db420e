"""operators/recommend.py: topic extraction gates, content scoring,
trending decay, suggestion accumulation, domain discovery."""

from __future__ import annotations

from datetime import datetime, timedelta

from chrono_scraper_spark.operators import recommend as R

_T0 = datetime(2024, 1, 20, 0, 0, 0)

_I_SCHEMA = ("user_id long, doc_id long, interaction_type string, "
             "query string, ts timestamp")
_D_SCHEMA = "doc_id long, text string, lang string, source string, " \
            "n_chars long"


def test_doc_topics_gates(spark):
    # 'cat' too short, 'the' stopword, 'zz11' non-alpha, 'apple' count 1
    docs = spark.createDataFrame(
        [(1, "spark spark table table apple the the zz11 zz11 cat cat")],
        "doc_id long, text string")
    got = {(r["topic"], r["n"]) for r in R.doc_topics(docs).collect()}
    assert got == {("spark", 2), ("table", 2)}


def test_doc_topics_topk_word_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "gamma gamma alpha alpha beta beta")],
        "doc_id long, text string")
    got = {r["topic"] for r in R.doc_topics(docs, top_k=2).collect()}
    assert got == {"alpha", "beta"}  # count ties -> word ASC wins


def _docs(spark):
    return spark.createDataFrame(
        [(1, "spark spark table table", "en", "s1", 500),
         (2, "spark spark other other", "en", "s1", 500),
         (3, "nothing nothing here here", "fr", "s2", 500),
         (14, "blank blank words words", "fr", "s2", 500)],
        _D_SCHEMA)


def test_recommend_content_scoring(spark):
    inter = spark.createDataFrame(
        [(100, 1, "view", None, _T0)], _I_SCHEMA)
    got = {r["doc_id"]: r for r in R.recommend_content(
        _docs(spark), inter).collect()}
    # viewed page excluded
    assert 1 not in got
    # doc 2: src 300 + lang 200 + overlap 1/2 topics -> 200 + title 100
    # + long 100 = 900
    assert got[2]["score_milli"] == 900
    # doc 3: title 100 + long 100 = 200 (kept: > 100)
    assert got[3]["score_milli"] == 200
    # doc 14: 14 % 7 == 0 -> no title bonus; long 100 only -> dropped
    assert 14 not in got
    assert [r["doc_id"] for r in sorted(got.values(),
                                        key=lambda r: r["rec_rank"])] \
        == [2, 3]


def test_trending_decay_window_and_gate(spark):
    day = timedelta(days=1)
    inter = spark.createDataFrame(
        [(1, 10, "export", None, _T0),           # weight 300, age 0
         (2, 11, "view", None, _T0 - day),       # 100 * (W - 86400)
         (3, 11, "view", None, _T0 - day),
         (4, 12, "view", None, _T0 - 8 * day),   # outside 7-day window
         (5, 13, "export", None, _T0)],          # doc 13 gated (short)
        _I_SCHEMA)
    docs = spark.createDataFrame(
        [(10, "t", "en", "s1", 500), (11, "t", "en", "s1", 500),
         (12, "t", "en", "s1", 500), (13, "t", "en", "s1", 100)],
        _D_SCHEMA)
    got = {r["doc_id"]: r for r in
           R.trending_pages(inter, docs).collect()}
    W = 7 * 86400
    assert set(got) == {10, 11}
    assert got[10]["trend_score"] == 300 * W
    assert got[11]["trend_score"] == 2 * 100 * (W - 86400)
    assert got[10]["trend_rank"] == 1 and got[11]["trend_rank"] == 2
    assert got[11]["n_recent"] == 2


def test_search_suggest_prefix_cap_order(spark):
    rows = [(7, 0, "search", "term1", _T0)] * 12      # cap at 10
    rows += [(7, 0, "search", "term12", _T0)] * 3
    rows += [(7, 0, "search", "Xterm1x", _T0)]        # contains, lower
    rows += [(7, 0, "search", "term2", _T0)] * 5      # no match
    inter = spark.createDataFrame(rows, _I_SCHEMA)
    got = [(r["suggestion"], r["frequency"], r["score_deci"])
           for r in sorted(R.search_suggest(inter, "term1").collect(),
                           key=lambda r: r["sug_rank"])]
    # term1 freq 12 -> score capped at 10; then freq desc, text asc
    assert got == [("term1", 12, 10), ("term12", 3, 3),
                   ("xterm1x", 1, 1)]


def test_discover_domains_excludes_viewed(spark):
    docs = spark.createDataFrame(
        [(1, "t", "en", "s1", 500), (2, "t", "en", "s1", 500),
         (3, "t", "en", "s2", 500), (4, "t", "en", "s2", 500),
         (5, "t", "en", "s3", 500)], _D_SCHEMA)
    inter = spark.createDataFrame(
        [(9, 1, "view", None, _T0)], _I_SCHEMA)
    got = [(r["source"], r["page_count"], r["dom_rank"])
           for r in sorted(R.discover_domains(docs, inter).collect(),
                           key=lambda r: r["dom_rank"])]
    assert got == [("s2", 2, 1), ("s3", 1, 2)]  # s1 viewed -> excluded
