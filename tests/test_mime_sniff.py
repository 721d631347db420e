"""Content sniffing from magic bytes (operators/mime_sniff.py)."""

from __future__ import annotations

from chrono_scraper_spark.operators.mime_sniff import with_sniffed_mime

CASES = [
    # (name, payload, declared, want_sniff, want_effective)
    ("pdf", b"%PDF-1.4 xyz", "text/html",
     "application/pdf", "application/pdf"),
    ("gzip", b"\x1f\x8b\x08rest", None,
     "application/gzip", "application/gzip"),
    ("png", b"\x89PNG\r\n\x1a\nrest", "image/png",
     "image/png", "image/png"),
    ("jpeg", b"\xff\xd8\xff\xe0junk", "text/plain",
     "image/jpeg", "image/jpeg"),
    ("gif", b"GIF89a....", None, "image/gif", "image/gif"),
    ("wav", b"RIFF\x00\x00\x00\x00WAVEfmt ", None,
     "audio/wav", "audio/wav"),
    ("webp", b"RIFF\x00\x00\x00\x00WEBPVP8 ", None,
     "image/webp", "image/webp"),
    ("riff_other", b"RIFF\x00\x00\x00\x00AVI LIST", None,
     "application/octet-stream", "application/octet-stream"),
    ("bmp", b"BMxxxx", None, "image/bmp", "image/bmp"),
    ("zip", b"PK\x03\x04zzz", None,
     "application/zip", "application/zip"),
    ("warc", b"WARC/1.0\r\n", None,
     "application/warc", "application/warc"),
    ("rss", b'<?xml version="1.0"?><rss version="2.0"></rss>', None,
     "application/rss+xml", "application/rss+xml"),
    ("atom", b'<?xml version="1.0"?>\n<feed xmlns="x"></feed>', None,
     "application/atom+xml", "application/atom+xml"),
    ("xml", b'<?xml version="1.0"?><urlset></urlset>', None,
     "application/xml", "application/xml"),
    # the motivating case: HTML served as octet-stream -> sniff wins
    ("html_as_bin", b"  <!DOCTYPE html><html></html>",
     "application/octet-stream", "text/html", "text/html"),
    # BOM + leading whitespace stripped before the tag scan
    ("html_bom", "﻿<html><body>hi</body></html>".encode(), None,
     "text/html", "text/html"),
    # declared type with parameters is token-normalized
    ("html_params", b"<html></html>", "TEXT/HTML; charset=UTF-8",
     "text/html", "text/html"),
    # NUL byte in the first 512 bytes -> binary; informative declared
    # type still wins the dispatch (weak sniff)
    ("nul_bin", b"abc\x00def" + b"x" * 100, "text/plain",
     "application/octet-stream", "text/plain"),
    ("plain", b"just some text here", None, "text/plain", "text/plain"),
    ("none", None, "text/html", None, "text/html"),
]


def test_sniff_and_resolve(spark):
    df = spark.createDataFrame(
        [(n, p, d) for n, p, d, *_ in CASES],
        "name string, html binary, content_type string")
    got = {r["name"]: r for r in with_sniffed_mime(df).collect()}
    for name, _p, _d, want_sniff, want_eff in CASES:
        r = got[name]
        assert r["sniffed_mime"] == want_sniff, name
        assert r["effective_mime"] == want_eff, name


def test_mismatch_flag(spark):
    df = spark.createDataFrame(
        [("a", b"%PDF-1.4", "text/html"),
         ("b", b"<html></html>", "text/html"),
         ("c", b"<html></html>", None),
         ("d", None, "text/html")],
        "name string, html binary, content_type string")
    got = {r["name"]: r["mime_mismatch"]
           for r in with_sniffed_mime(df).collect()}
    assert got == {"a": True, "b": False, "c": False, "d": False}


def test_without_declared_column(spark):
    df = spark.createDataFrame([("a", b"%PDF-1.4")],
                               "name string, html binary")
    out = with_sniffed_mime(df)
    assert "effective_mime" not in out.columns
    assert out.collect()[0]["sniffed_mime"] == "application/pdf"


def test_plan_zero_shuffle(spark):
    df = spark.createDataFrame([("a", b"x", "t")],
                               "name string, html binary, content_type string")
    plan = with_sniffed_mime(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_nul_after_512_is_text(spark):
    payload = b"y" * 512 + b"\x00"
    df = spark.createDataFrame([("a", payload)], "name string, html binary")
    assert with_sniffed_mime(df).collect()[0]["sniffed_mime"] == "text/plain"
