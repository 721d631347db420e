"""operators/consistency.py, entity_link.py, audit.py: cross-store
validation severities, hash parity issues, disambiguation score ladder,
anomaly thresholds."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from chrono_scraper_spark.operators import audit as AU
from chrono_scraper_spark.operators import consistency as CS
from chrono_scraper_spark.operators import entity_link as EL

_PAGE_SCHEMA = ("url string, ts14 string, host string, status int, "
                "length long, digest string, text string")


def _page(url, host, text, ts14="20200101000000", status=200, length=100,
          digest=None):
    import hashlib
    d = digest or hashlib.md5(text.encode()).hexdigest()
    return (url, ts14, host, status, length, d, text)


def test_row_count_parity_severity_ladder(spark):
    # a: equal -> info; b: 1 of 20 missing (5%) -> warning;
    # c: 2 of 4 missing (50%) -> error; d: replica-only host
    prim = [_page(f"u://a/{i}", "a", "t") for i in range(3)]
    prim += [_page(f"u://b/{i}", "b", "t") for i in range(20)]
    prim += [_page(f"u://c/{i}", "c", "t") for i in range(4)]
    repl = [_page(f"u://a/{i}", "a", "t") for i in range(3)]
    repl += [_page(f"u://b/{i}", "b", "t") for i in range(19)]
    repl += [_page(f"u://c/{i}", "c", "t") for i in range(2)]
    repl += [_page("u://d/0", "d", "t")]
    out = CS.row_count_parity(spark.createDataFrame(prim, _PAGE_SCHEMA),
                              spark.createDataFrame(repl, _PAGE_SCHEMA))
    got = {r["table_name"]: (r["difference"], r["is_consistent"],
                             r["severity"]) for r in out.collect()}
    assert got == {"a": (0, True, "info"), "b": (1, False, "warning"),
                   "c": (2, False, "error"), "d": (-1, False, "error")}


def test_record_hash_parity_issues(spark):
    prim = [_page("u://a/0", "a", "same"), _page("u://a/1", "a", "orig"),
            _page("u://a/2", "a", "gone")]
    repl = [_page("u://a/0", "a", "same"), _page("u://a/1", "a", "edit"),
            _page("u://a/3", "a", "new")]
    out = CS.record_hash_parity(spark.createDataFrame(prim, _PAGE_SCHEMA),
                                spark.createDataFrame(repl, _PAGE_SCHEMA))
    got = {r["url"]: r["issue"] for r in out.collect()}
    assert got == {"u://a/1": "hash_mismatch",
                   "u://a/2": "missing_in_replica",
                   "u://a/3": "missing_in_primary"}
    # consistent row filtered out
    assert "u://a/0" not in got


def test_record_hash_null_serialization(spark):
    # NULL length serializes as the literal 'null' (json.dumps analog),
    # so two NULLs hash equal and NULL != value hashes differ
    a = spark.createDataFrame(
        [("u", "t", "h", 200, None, "d", "x")], _PAGE_SCHEMA)
    b = spark.createDataFrame(
        [("u", "t", "h", 200, 5, "d", "x")], _PAGE_SCHEMA)
    assert CS.record_hash_parity(a, a).count() == 0
    out = CS.record_hash_parity(a, b).collect()
    assert [r["issue"] for r in out] == ["hash_mismatch"]


def test_page_business_rules_counts(spark):
    import hashlib
    ok = _page("u://a/0", "a", "fine")
    no_len = ("u://a/1", "20200101000000", "a", 200, None,
              hashlib.md5(b"body").hexdigest(), "body")
    bad_ts = _page("u://a/2", "a", "fine", ts14="00000000000000")
    bad_digest = ("u://a/3", "20200101000000", "a", 200, 9,
                  "0" * 32, "body")
    df = spark.createDataFrame([ok, no_len, bad_ts, bad_digest],
                               _PAGE_SCHEMA)
    got = {r["rule"]: (r["violation_count"], r["severity"],
                       r["is_consistent"])
           for r in CS.page_business_rules(df).collect()}
    assert got == {
        "content_without_byte_count": (1, "info", False),
        "invalid_timestamp": (1, "error", False),
        "digest_mismatch": (1, "warning", False),
    }


def test_page_business_rules_all_clean(spark):
    df = spark.createDataFrame([_page("u://a/0", "a", "fine")],
                               _PAGE_SCHEMA)
    rows = CS.page_business_rules(df).collect()
    assert len(rows) == 3 and all(r["is_consistent"] for r in rows)
    assert all(r["violation_count"] == 0 for r in rows)


# ---------------------------------------------------------------------------
# entity_link
# ---------------------------------------------------------------------------
_KB = [("Q1", "ada lovelace", "about ada mathematics"),
       ("Q2", "alan turing", "about alan computing"),
       ("Q3", "ada", "short label")]
_KB_SCHEMA = "qid string, label string, description string"


def _link(spark, mention, context="plain words"):
    m = spark.createDataFrame([(1, mention, context)],
                              "doc_id long, mention string, context string")
    kb = spark.createDataFrame(_KB, _KB_SCHEMA)
    return {(r["qid"], r["match_score"], r["total_score"])
            for r in EL.link_entities(m, kb).collect()}


def test_exact_match_wins(spark):
    got = _link(spark, "Ada Lovelace")
    assert len(got) == 1 and next(iter(got))[0] == "Q1"
    assert next(iter(got))[1] == 1.0


def test_label_in_query_07(spark):
    # 'alan turing senior' contains label 'alan turing' -> 0.7 base;
    # context pushes blended over 0.5 via description overlap
    got = _link(spark, "Alan Turing Senior", context="about computing work")
    assert len(got) == 1
    qid, match, total = next(iter(got))
    assert qid == "Q2" and match == 0.7


def test_short_label_penalty_and_substring(spark):
    # Neutral context: all context scores 0, blend = 0.7*match.  Query
    # 'ada' matches Q3 exactly (len 3: NO short-label penalty at exactly
    # 3) -> 1.0, total 0.7; Q1 gets substring 0.8 + desc boost 0.1 ->
    # 0.9, total 0.63.  Exact wins on the blend.
    got = _link(spark, "Ada", context="unrelated words")
    qid, match, total = next(iter(got))
    assert qid == "Q3" and match == 1.0 and total == 0.7


def test_context_overrides_exact_match(spark):
    # Context fully covering Q1's description flips the winner: Q1 total
    # = 0.9*0.7 + 1.0*0.3 = 0.93 beats Q3's 0.7 (wikidata_service.py
    # _select_best_with_context: blended winner > 0.5 takes it).
    got = _link(spark, "Ada", context="about ada mathematics")
    qid, match, total = next(iter(got))
    assert qid == "Q1" and match == 0.9 and total == 0.93


def test_unlinked_below_thresholds(spark):
    # no shared words with any candidate passes blocking; low-jaccard
    # single shared word stays below both thresholds with no context
    got = _link(spark, "ada smith", context="zz zz zz")
    # jaccard {ada,smith} vs {ada,lovelace} = 1/3 -> 0.333*0.7 < 0.5
    # and match 0.333 < 0.6... but Q3 'ada' IS a substring of the query
    # -> 0.7*0.8(short-label? len('ada')=3, no penalty)=0.7 -> raw path?
    # total = 0.49 <= 0.5, match 0.7 > 0.6 -> linked via raw fallback.
    assert {g[0] for g in got} == {"Q3"}


def test_completely_unlinked(spark):
    m = spark.createDataFrame([(1, "xyzzy plugh", "ctx")],
                              "doc_id long, mention string, context string")
    kb = spark.createDataFrame(_KB, _KB_SCHEMA)
    assert EL.link_entities(m, kb).count() == 0


# ---------------------------------------------------------------------------
# audit security profile
# ---------------------------------------------------------------------------
def _ev(uid, ts, etype="click"):
    return (uid, ts, etype)


def test_security_profile_thresholds(spark):
    base = datetime(2024, 1, 10, 12, 0, 0)
    rows = []
    # user 1: 101 events in one minute -> rate anomaly
    rows += [_ev(1, base.replace(second=0)) for _ in range(101)]
    # user 2: 11 errors in one hour -> failed-login anomaly
    rows += [_ev(2, base.replace(minute=m), "error") for m in range(11)]
    # user 3: 6 purchases in one hour -> bulk anomaly
    rows += [_ev(3, base.replace(minute=m), "purchase") for m in range(6)]
    # user 4: one event at 23:30 -> after-hours only
    rows += [_ev(4, datetime(2024, 1, 10, 23, 30, 0))]
    df = spark.createDataFrame(rows,
                               "user_id long, ts timestamp, "
                               "event_type string")
    got = {r["user_id"]: r for r in AU.security_profile(df).collect()}
    assert got[1]["rate_anomaly"] and not got[1]["failed_login_anomaly"]
    assert got[2]["failed_login_anomaly"] and got[2]["max_failed_per_hour"] == 11
    assert got[3]["bulk_anomaly"] and got[3]["max_bulk_per_hour"] == 6
    assert got[4]["after_hours_activity"] and not got[4]["rate_anomaly"]
    assert not got[4]["bulk_anomaly"]


def test_security_profile_boundary_not_anomalous(spark):
    base = datetime(2024, 1, 10, 12, 0, 0)
    rows = [_ev(5, base.replace(minute=m), "error") for m in range(10)]
    rows += [_ev(5, base.replace(minute=m, second=30), "purchase")
             for m in range(5)]
    df = spark.createDataFrame(rows,
                               "user_id long, ts timestamp, "
                               "event_type string")
    r = AU.security_profile(df).collect()[0]
    # exactly AT threshold is not an anomaly (strict >)
    assert r["max_failed_per_hour"] == 10 and not r["failed_login_anomaly"]
    assert r["max_bulk_per_hour"] == 5 and not r["bulk_anomaly"]
    assert not r["after_hours_activity"]
