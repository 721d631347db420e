"""Investigation page comparison: field-level diff between two captures.

Reference: ``backend/app/services/investigation_service.py`` —
``_compare_pages`` (:386-474: per-field baseline/target comparison,
category weights title 0.8 / content 0.9 / metadata 0.4 / authorship 0.6
/ temporal 0.7, overall similarity ``1 - changed/compared``,
``is_significant`` = max category weight > 0.5) and
``_classify_change_type`` (:477-491: addition / deletion /
major_modification when the trimmed-length delta exceeds half the longer
side / else minor_modification).

The reference compares one (baseline, target) pair per API call; the
engine form runs the same comparison corpus-wide — per URL, earliest
capture vs latest capture — in two hash aggregations (field derivation
is zero-shuffle codegen; the pairing is one groupBy url). Weights are
integer milli units (repo convention). The significance ratio test is
exact integer arithmetic: ``|bl - tl| / max(bl, tl, 1) > 0.5`` ⟺
``2·|bl - tl| > max(bl, tl, 1)``.

Field analogs over the CDX corpus (title/content/meta_description/author
are Page model columns in the reference): title = first 64 chars,
content = full text, meta_description = first 160 chars, author = lang.
Captures are deterministically perturbed per (doc_id mod 4, capture
index) so every change_type branch appears: %4=0 adds a description,
%4=1 drops the author, %4=2 triples the content (major), %4=3 prefixes
the title (minor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# _compare_pages:439-455 category weights, milli units
FIELD_CATEGORY = {
    "title": ("title_change", 800),
    "content": ("content_change", 900),
    "meta_description": ("metadata_change", 400),
    "author": ("authorship_change", 600),
}


def with_compare_fields(pages: DataFrame) -> DataFrame:
    """Derive the four comparison fields per capture (+ perturbations)."""
    t = F.coalesce(F.col("text"), F.lit(""))
    mod4 = F.col("doc_id") % 4
    later = F.col("n_cap") > 0
    title = F.when((mod4 == 3) & later,
                   F.concat(F.lit("v"), F.col("n_cap").cast("string"),
                            F.lit(" "), F.substring(t, 1, 64)))\
        .otherwise(F.substring(t, 1, 64))
    content = F.when((mod4 == 2) & later,
                     F.concat(t, F.lit(" "), t, F.lit(" "), t)).otherwise(t)
    meta = F.when((mod4 == 0) & ~later, F.lit(""))\
        .otherwise(F.substring(t, 1, 160))
    author = F.when((mod4 == 1) & later, F.lit(""))\
        .otherwise(F.coalesce(F.col("lang"), F.lit("")))
    return (pages.withColumn("title", title)
            .withColumn("content", content)
            .withColumn("meta_description", meta)
            .withColumn("author", author))


def _classify(bl: F.Column, tl: F.Column) -> F.Column:
    """_classify_change_type:477-491 on trimmed lengths, integer-exact."""
    return (F.when((bl == 0) & (tl > 0), "addition")
            .when((bl > 0) & (tl == 0), "deletion")
            .when(F.abs(bl - tl) * 2 > F.greatest(bl, tl, F.lit(1)),
                  "major_modification")
            .otherwise("minor_modification"))


def _paired(pages: DataFrame) -> DataFrame:
    """Per URL: baseline (first capture) and target (latest capture)
    field values, URLs with ≥2 captures. Total order inside a URL is
    (ts14, doc_id, n_cap) — ts14 alone can tie when two documents share
    a colliding path (e.g. /index.html) and their timestamp components
    coincide.

    One hash aggregation (min_by/max_by on the struct ordering key, with
    map-side partials) — not a window sort + self-join, which would scan
    the corpus twice and shuffle it whole.
    """
    fields = with_compare_fields(pages)
    cols = list(FIELD_CATEGORY)
    key = F.struct("ts14", "doc_id", "n_cap")
    vals = F.struct(*cols)
    agg = (fields.groupBy("url")
           .agg(F.min_by(vals, key).alias("_b"),
                F.max_by(vals, key).alias("_t"),
                F.count("*").alias("_n")))
    return (agg.filter(F.col("_n") >= 2)
            .select("url",
                    *[F.col(f"_b.{c}").alias(f"b_{c}") for c in cols],
                    *[F.col(f"_t.{c}").alias(f"t_{c}") for c in cols]))


def compare_fields(pages: DataFrame) -> DataFrame:
    """Per (url, field) change rows — only fields whose baseline and
    target differ, like the reference's ``changes`` dict (:414-436).

    Columns: url, field, change_type, category, significance_milli.
    """
    paired = _paired(pages)
    per_field = []
    for c, (cat, weight) in FIELD_CATEGORY.items():
        b, t = F.col(f"b_{c}"), F.col(f"t_{c}")
        bl, tl = F.length(F.trim(b)), F.length(F.trim(t))
        per_field.append(F.when(b != t, F.struct(
            F.lit(c).alias("field"),
            _classify(bl, tl).alias("change_type"),
            F.lit(cat).alias("category"),
            F.lit(weight).cast("int").alias("significance_milli"))))
    exploded = (paired
                .select("url", F.explode(
                    F.filter(F.array(*per_field),
                             lambda s: s.isNotNull())).alias("ch")))
    return exploded.select("url", "ch.field", "ch.change_type",
                           "ch.category", "ch.significance_milli")


def compare_summary(pages: DataFrame) -> DataFrame:
    """Per-URL comparison summary (_compare_pages:457-474): fields
    changed out of 4 compared, overall similarity = 1 - changed/compared
    (milli), significance = max changed-category weight, is_significant
    = significance > 0.5, sorted distinct categories. URLs with ≥2
    captures; unchanged pairs report 0 changes at similarity 1000.
    """
    paired = _paired(pages)
    changed_flags, sig_terms, cat_terms = [], [], []
    for c, (cat, weight) in FIELD_CATEGORY.items():
        diff = F.col(f"b_{c}") != F.col(f"t_{c}")
        changed_flags.append(diff.cast("int"))
        sig_terms.append(F.when(diff, F.lit(weight)).otherwise(0))
        cat_terms.append(F.when(diff, F.lit(cat)))
    n_changed = sum(changed_flags[1:], changed_flags[0])
    significance = F.greatest(*sig_terms)
    cats = F.array_join(
        F.array_sort(F.filter(F.array(*cat_terms), lambda x: x.isNotNull())),
        "|")
    return (paired
            .withColumn("fields_changed", n_changed.cast("long"))
            .withColumn("similarity_milli",
                        (F.lit(1000) - n_changed * 250).cast("long"))
            .withColumn("significance_milli",
                        significance.cast("long"))
            .withColumn("is_significant", significance > 500)
            .withColumn("change_categories", cats)
            .select("url", "fields_changed", "similarity_milli",
                    "significance_milli", "is_significant",
                    "change_categories"))
