"""Extraction cascade: byte identity, word-count gate, fallback path,
quality/word-count columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from chrono_scraper_spark.operators import extraction as E


def test_byte_identity_over_corpus(spark, pages):
    out = E.with_extraction(pages)
    assert out.filter("extracted.text IS DISTINCT FROM text").count() == 0
    assert out.filter("extracted.method != 'article'").count() == 0


def test_word_count_gate(spark, pages):
    out = E.with_extraction(pages)
    bad = out.filter(
        ((F.col("extracted.word_count") > 50) & (F.col("fetch_status") != "completed"))
        | ((F.col("extracted.word_count") <= 50) & (F.col("fetch_status") != "failed"))
    ).count()
    assert bad == 0
    # corpus is built with ~20% short docs: both classes must be present
    assert out.filter("fetch_status = 'completed'").count() > 0
    assert out.filter("fetch_status = 'failed'").count() > 0


def test_extract_one_fallback_strip():
    html = b"<html><head><title>T</title></head><body><nav>x</nav>" \
           b"<div>hello world from a plain div</div></body></html>"
    text, title, method, wc = E.extract_one(html)
    assert method == "strip"
    assert title == "T"
    assert "hello world" in text and "x" not in text.split()


def test_extract_one_handles_null_and_garbage():
    assert E.extract_one(None) == (None, None, "none", 0)
    text, _, method, _ = E.extract_one(b"\xff\xfe\x00garbage")
    assert method == "strip"


def test_quality_and_counts(spark):
    df = spark.createDataFrame(
        [("one two three\n\nfour five", ), (None, ), ("", )], "text string")
    out = E.with_word_counts(E.with_quality_score(df)).collect()
    by_text = {r["text"]: r for r in out}
    r = by_text["one two three\n\nfour five"]
    assert r["word_count"] == 5 and r["character_count"] == 24
    assert 0.0 < r["quality_score"] <= 1.0
    assert by_text[None]["word_count"] == 0 and by_text[None]["character_count"] == 0
    assert by_text[""]["word_count"] == 0
