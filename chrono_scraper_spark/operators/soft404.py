"""Soft-404 detection: error pages served with HTTP 200.

A large fraction of "not found" responses on the real web return status
200 with an error page body (CMS catch-all routes, SPA shells, parked
domains). The reference never sees them — Wayback's CDX rows carry the
ORIGINAL capture status — but a live crawler (S7) must detect them or the
corpus fills with "Page Not Found" boilerplate and the recrawl scheduler
keeps revisiting tombstones. Classic treatment (Bar-Yossef et al., "Sic
transit gloria telae", WWW'04) probes a random sibling URL; at batch
scale the content-signal classifier below is the standard first pass.

One zero-exchange codegen projection — every signal is a built-in
string/regex expression over columns the extraction stage already
produced (title, text, http_status, url); RE2-compatible patterns shared
verbatim with the DuckDB oracle. Signals, with documented weights:

* ``phrase_404`` (weight 3): the title or the first 400 chars of text
  match a not-found phrase family ("page not found", "404 error",
  "does not exist", "no longer available", …);
* ``title_error`` (weight 2): the title *starts* with an error token
  (404/403/410/error/not found/oops);
* ``tiny_deep`` (weight 1): a near-empty body (< ``tiny_chars``) on a
  deep path (≥ 2 segments) — deep URLs with real content are rarely
  this small, while "/" being tiny is normal;

``soft404_score`` = weighted sum; ``is_soft404`` fires at score ≥ 3 on a
2xx status (a real 404 status needs no detector — weights mean one hard
phrase hit OR title+tiny both). Thresholds are per-deploy knobs; the
defaults are deliberately conservative (precision over recall: dropping
a live page costs more than keeping a tombstone one more round).

Composes with ``recrawl.recrawl_schedule`` (soft-404s leave the revisit
pool) and the E12 dead-letter convention (rows keep flowing; the flag,
not an exception, carries the verdict).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: not-found phrase family (lowercased match; RE2-safe: no backrefs).
PHRASE_404_RE = (
    "(page|file|article|document|content|url) (was )?(not found|"
    "could not be found|cannot be found|does not exist|no longer exists|"
    "is no longer available)"
    "|404 (error|not found|page)"
    "|error 404"
    "|nothing (was )?found (here|at this address)"
    "|the requested (url|page|resource) (was not found|does not exist)"
)

#: error-leading title tokens.
TITLE_ERROR_RE = r"^\s*(404|403|410|error\b|not found|oops\b)"

DEFAULT_TINY_CHARS = 256
DEFAULT_THRESHOLD = 3


def _path_depth(url: Column) -> Column:
    """Number of non-empty path segments after the host."""
    path = F.regexp_replace(url, r"^https?://[^/]*", "")
    path = F.regexp_replace(path, r"[?#].*$", "")
    return F.size(F.filter(F.split(path, "/"), lambda s: s != ""))


def soft404_flags(pages: DataFrame, *, url_col: str = "url",
                  status_col: str = "http_status",
                  title_col: str = "title", text_col: str = "text",
                  tiny_chars: int = DEFAULT_TINY_CHARS,
                  threshold: int = DEFAULT_THRESHOLD) -> DataFrame:
    """Append ``phrase_404``, ``title_error``, ``tiny_deep``,
    ``soft404_score``, ``is_soft404`` (module-doc semantics). NULL title/
    text count as empty; a NULL status is treated as 200 (replay rows
    predating live-status capture)."""
    title = F.lower(F.coalesce(F.col(title_col), F.lit("")))
    head = F.lower(F.substring(F.coalesce(F.col(text_col), F.lit("")),
                               1, 400))
    phrase = title.rlike(PHRASE_404_RE) | head.rlike(PHRASE_404_RE)
    title_err = title.rlike(TITLE_ERROR_RE)
    tiny_deep = ((F.length(F.coalesce(F.col(text_col), F.lit("")))
                  < F.lit(tiny_chars))
                 & (_path_depth(F.col(url_col)) >= 2))
    score = (phrase.cast("int") * 3 + title_err.cast("int") * 2
             + tiny_deep.cast("int"))
    status = F.coalesce(F.col(status_col), F.lit(200)) \
        if status_col in pages.columns else F.lit(200)
    ok2xx = (status >= 200) & (status < 300)
    return (pages
            .withColumn("phrase_404", phrase)
            .withColumn("title_error", title_err)
            .withColumn("tiny_deep", tiny_deep)
            .withColumn("soft404_score", score)
            .withColumn("is_soft404", ok2xx & (score >= threshold)))
