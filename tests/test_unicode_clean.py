"""Unicode normalization + mojibake repair (operators/unicode_clean.py)."""

from __future__ import annotations

import unicodedata

from chrono_scraper_spark.operators.unicode_clean import (
    _clean_one,
    clean_unicode,
    fix_mojibake,
)


def test_fix_mojibake_kernel():
    # classic UTF-8-read-as-Latin-1
    assert fix_mojibake("caf\u00c3\u00a9") == "caf\u00e9"
    # cp1252 shadows (curly quote / em-dash territory)
    assert fix_mojibake("it\u00e2\u20ac\u2122s") == "it\u2019s"
    # clean text with no markers passes through byte-identical
    assert fix_mojibake("plain ascii text") == "plain ascii text"
    ok = "caf\u00e9 already fine"
    assert fix_mojibake(ok) == ok
    # marker present but repair impossible -> unchanged (no blind damage)
    weird = "\u00c3 alone at end \u00c3"
    assert fix_mojibake(weird) in (weird, fix_mojibake(weird))


def test_clean_one_kernel():
    s = "é x​y  z \x07q"
    c = _clean_one(s)
    assert c == "é xy  z q"
    assert unicodedata.is_normalized("NFC", c)
    # \t and \n survive the control strip
    assert _clean_one("a\tb\nc") == "a\tb\nc"


def test_clean_unicode_dataframe(spark):
    docs = spark.createDataFrame(
        [(1, "plain"),
         (2, "éclair​  x"),
         (3, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in clean_unicode(docs).collect()}
    assert got[1]["clean_text"] == "plain" and not got[1]["was_changed"]
    assert got[2]["clean_text"] == "\u00e9clair  x"
    # ZWSP removed (1) + NFC composition (1): two chars shorter
    assert got[2]["n_removed"] == 2 and got[2]["was_changed"]
    assert got[3]["clean_text"] == "" and not got[3]["was_changed"]


def test_clean_unicode_mojibake_path(spark):
    docs = spark.createDataFrame(
        [(1, "caf\u00c3\u00a9 au lait")], "doc_id long, text string")
    out = clean_unicode(docs, repair_mojibake=True).first()
    assert out["clean_text"] == "caf\u00e9 au lait"
    assert out["was_changed"]


def test_clean_unicode_plan_zero_shuffle(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = clean_unicode(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "EvalPython" in plan
