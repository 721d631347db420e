"""Content sniffing from magic bytes — servers lie, payload prefixes don't.

The reference trusts the Wayback replay's ``Content-Type`` when routing
payloads into extractors (content_extraction_service.py routes on the
response header; wayback CDX rows carry ``mimetype`` as recorded).
Production crawls can't: a measurable slice of the web serves PDFs as
``text/html``, gzip bodies as ``text/plain``, and HTML as
``application/octet-stream``. This module is the WHATWG-MIMESNIFF-style
dispatch gate in front of the extraction cascade (E5): a first-match-wins
signature table over the payload's leading bytes, evaluated entirely as
JVM codegen expressions (hex-prefix equality + one decoded-prefix tag
scan) — zero shuffle, zero UDF, byte-replayable in the DuckDB oracle
(both engines uppercase-hex the same prefix and apply the same RE2
patterns).

Detection order (documented; first match wins):

1. **Binary magics** on the hex of the first 16 bytes: PDF ``%PDF-``,
   gzip ``1F 8B``, PNG, JPEG ``FF D8 FF``, GIF87a/89a, RIFF→WAVE/WEBP,
   BMP ``BM``, ZIP ``PK\\x03\\x04``, WARC ``WARC/``.
2. **XML** when the decoded, BOM/whitespace-stripped prefix starts with
   ``<?xml`` — refined to RSS / Atom / generic XML by the root tag in the
   first 256 decoded chars (feeds.py consumes these).
3. **HTML** when that prefix starts with one of the WHATWG tag-scan
   tokens (``<!doctype``, ``<html``, ``<head``, ``<body``, ``<div``,
   ``<p``, ``<script``, ``<title``, ``<h1``, ``<table``, ``<a``,
   ``<!--`` …).
4. **NUL sniff**: a 0x00 byte in the first 512 bytes → binary
   (``application/octet-stream``) — WHATWG's binary-data-byte rule,
   restricted to its most load-bearing byte.
5. Otherwise ``text/plain``.

Non-UTF-8 bytes in step 2-3's decoded prefix become replacement chars in
Spark's binary→string cast (never an error); oracle test corpora use
valid-UTF-8-or-magic payloads so the DuckDB ``decode()`` twin is exact.

``resolve_mime`` implements the dispatch policy for the extractor: a
*binary magic* (step 1) always overrides the declared header (that byte
evidence is unforgeable), while for text-ish sniffs the declared type
wins when it is a known extractable type — the header still carries
information the prefix can't (e.g. ``text/html`` vs an HTML fragment
inside a plain-text README).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (hex-prefix, mime) — longest-prefix-sensitive order (GIF before BMP's
#: 2-byte 'BM' is irrelevant, but WAVE/WEBP share RIFF so they match on
#: bytes 9-12 separately below).
MAGIC_HEX: list[tuple[str, str]] = [
    ("255044462D", "application/pdf"),      # %PDF-
    ("1F8B", "application/gzip"),
    ("89504E470D0A1A0A", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("474946383761", "image/gif"),          # GIF87a
    ("474946383961", "image/gif"),          # GIF89a
    ("424D", "image/bmp"),
    ("504B0304", "application/zip"),
    ("574152432F", "application/warc"),     # WARC/
]

#: WHATWG tag-scan tokens (lowercased; the decoded prefix is lowercased
#: before the startswith scan).
HTML_TOKENS: list[str] = [
    "<!doctype", "<html", "<head", "<body", "<div", "<p", "<script",
    "<title", "<h1", "<table", "<a ", "<a>", "<br", "<!--",
]

#: sniffs that came from step-1 byte magic — unforgeable, so they beat a
#: conflicting declared Content-Type in resolve_mime.
_MAGIC_MIMES = {m for _, m in MAGIC_HEX} | {"audio/wav", "image/webp"}


def _decoded_prefix(payload: Column) -> Column:
    """First 256 bytes as a lowercased string, UTF-8 BOM and leading
    whitespace stripped (binary→string cast; invalid bytes become
    replacement chars, never errors)."""
    s = F.substring(payload, 1, 256).cast("string")
    return F.lower(F.regexp_replace(s, r"^[﻿\s]+", ""))


def sniff_mime(payload: Column) -> Column:
    """Column expr: payload binary → sniffed mime token (module-doc
    order). NULL payload → NULL."""
    hx = F.hex(F.substring(payload, 1, 16))     # uppercase in Spark+DuckDB
    expr = None
    for mag, mime in MAGIC_HEX:
        cond = hx.startswith(mag)
        expr = F.when(cond, mime) if expr is None else expr.when(cond, mime)
    # RIFF container: bytes 1-4 'RIFF', bytes 9-12 pick the member type
    riff = hx.startswith("52494646")
    sub = F.hex(F.substring(payload, 9, 4))
    expr = (expr
            .when(riff & (sub == "57415645"), "audio/wav")
            .when(riff & (sub == "57454250"), "image/webp")
            .when(riff, "application/octet-stream"))
    pre = _decoded_prefix(payload)
    is_xml = pre.startswith("<?xml")
    expr = (expr
            .when(is_xml & pre.rlike("<rss[\\s>]"), "application/rss+xml")
            .when(is_xml & pre.rlike("<feed[\\s>]"), "application/atom+xml")
            .when(is_xml, "application/xml"))
    html_cond = None
    for tok in HTML_TOKENS:
        c = pre.startswith(tok)
        html_cond = c if html_cond is None else (html_cond | c)
    expr = expr.when(html_cond, "text/html")
    # NUL byte anywhere in the first 512 bytes: hex pair '00' at an even
    # offset (the anchored lazy scan keeps pair alignment)
    nul = F.hex(F.substring(payload, 1, 512)).rlike("^(?:..)*?00")
    expr = expr.when(nul, "application/octet-stream").otherwise("text/plain")
    return F.when(payload.isNull(), F.lit(None).cast("string")) \
        .otherwise(expr)


#: declared types that carry no routing information — treated as
#: no-claim, so the sniff wins (the motivating case: HTML served as
#: application/octet-stream).
_NO_CLAIM = ["application/octet-stream", "binary/octet-stream",
             "application/binary", "unknown/unknown"]


def resolve_mime(declared: Column, sniffed: Column) -> Column:
    """Dispatch policy (module docstring): byte magic beats the header;
    otherwise a non-null *informative* declared type wins (octet-stream
    and friends are no-claims); otherwise the sniff."""
    is_magic = sniffed.isin(*sorted(_MAGIC_MIMES))
    claim = F.when(~declared.isin(*_NO_CLAIM), declared)
    return (F.when(sniffed.isNull(), declared)
            .when(is_magic, sniffed)
            .otherwise(F.coalesce(claim, sniffed)))


def with_sniffed_mime(pages: DataFrame, payload_col: str = "html",
                      declared_col: str | None = "content_type") -> DataFrame:
    """Append ``sniffed_mime`` (+ ``mime_mismatch``, ``effective_mime``
    when a declared-type column exists). One zero-exchange projection;
    feed ``effective_mime`` into ``with_extraction(mime_col=...)`` so the
    cascade routes on evidence instead of the server's claim."""
    out = pages.withColumn("sniffed_mime", sniff_mime(F.col(payload_col)))
    if declared_col and declared_col in pages.columns:
        # media-type token only: parameters (";charset=…") stripped —
        # fetch_http already strips them, raw CDX mimetype columns may not
        decl = F.lower(F.trim(F.split(F.col(declared_col), ";").getItem(0)))
        decl = F.when(decl != "", decl)
        out = (out
               .withColumn("mime_mismatch",
                           decl.isNotNull()
                           & F.col("sniffed_mime").isNotNull()
                           & (decl != F.col("sniffed_mime")))
               .withColumn("effective_mime",
                           resolve_mime(decl, F.col("sniffed_mime"))))
    return out
