"""Cross-store consistency validation — the data-consistency-validator analog.

Reference semantics (backend/app/services/data_consistency_validator.py):

- ``RowCountValidator`` (:116-182): ``COUNT(*)`` parity between the primary
  store and the analytics replica; severity ``info`` when equal, ``error``
  when the absolute difference exceeds 10% of the primary count, else
  ``warning``.
- ``DataHashValidator`` (:190-347): a canonical serialization of each record
  (keys sorted, values normalized to strings) is sha256-hashed on both
  stores and compared per primary key.
- ``BusinessRuleValidator._validate_page_rules`` (:534-611): per-page rules
  at three severities — content present but the derived count column
  missing (info), invalid timestamp (error), and a value outside its
  invariant domain (warning).

Spark-first shape: both stores are DataFrames (at deployment: an Iceberg
table and its analytics export). Row-count parity is two map-side count
aggregates full-outer-joined on the partition key — no payload shuffle,
and the output is one row per partition, so the check itself is
metadata-sized at any corpus scale. Hash parity is a single full-outer
join on the record key with JVM-side ``sha2`` over the canonical
serialization — payloads never cross the Python boundary, the join is
key-partitioned (AQE splits skewed keys), and only mismatching rows
survive the filter, so the result stays violation-sized. Business rules
are a zero-shuffle projection + one map-side count aggregate. All three
would run unchanged over a 10^10-row table pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Canonical serialization field order = sorted key order, mirroring the
# reference's json.dumps(..., sort_keys=True) (:216-218). NULLs serialize as
# the literal 'null' exactly like JSON.
HASH_FIELDS = ("digest", "length", "status", "text", "ts14", "url")


def _canon(field: str) -> F.Column:
    return F.concat(
        F.lit(field + "="),
        F.coalesce(F.col(field).cast("string"), F.lit("null")),
    )


def record_hash(df: DataFrame) -> F.Column:
    """sha256 over the canonical 'k=v|k=v' serialization (sorted keys),
    the DataHashValidator._compute_record_hash analog (:203-218)."""
    return F.sha2(F.concat_ws("|", *[_canon(f) for f in HASH_FIELDS]), 256)


def row_count_parity(primary: DataFrame, replica: DataFrame,
                     part_col: str = "host") -> DataFrame:
    """Per-partition COUNT(*) parity (RowCountValidator :146-166).

    One row per partition value: counts on both sides, difference, the
    is_consistent flag, and the reference's severity ladder (equal →
    info; >10% of primary → error; else warning).
    """
    p = primary.groupBy(F.col(part_col).alias("table_name")) \
               .agg(F.count("*").alias("primary_count"))
    r = replica.groupBy(F.col(part_col).alias("table_name")) \
               .agg(F.count("*").alias("replica_count"))
    joined = (p.join(r, "table_name", "full_outer")
               .withColumn("primary_count",
                           F.coalesce("primary_count", F.lit(0)))
               .withColumn("replica_count",
                           F.coalesce("replica_count", F.lit(0))))
    diff = F.col("primary_count") - F.col("replica_count")
    return (joined
            .withColumn("difference", diff)
            .withColumn("is_consistent", diff == 0)
            .withColumn(
                "severity",
                F.when(diff == 0, F.lit("info"))
                 .when(F.abs(diff) >
                       F.col("primary_count") * F.lit(0.1), F.lit("error"))
                 .otherwise(F.lit("warning"))))


def record_hash_parity(primary: DataFrame, replica: DataFrame,
                       key_cols: tuple[str, str] = ("url", "ts14"),
                       ) -> DataFrame:
    """Record-level hash comparison (DataHashValidator :219-347).

    Full-outer join on the record key; emits ONLY the inconsistent rows:
    ``hash_mismatch`` (both present, hashes differ), ``missing_in_replica``
    and ``missing_in_primary`` (one side absent). Consistent records are
    filtered out executor-side, so the result is violation-sized.
    """
    keys = list(key_cols)
    p = primary.select(*keys, record_hash(primary).alias("primary_hash"))
    r = replica.select(*keys, record_hash(replica).alias("replica_hash"))
    j = p.join(r, keys, "full_outer")
    issue = (F.when(F.col("primary_hash").isNull(),
                    F.lit("missing_in_primary"))
              .when(F.col("replica_hash").isNull(),
                    F.lit("missing_in_replica"))
              .when(F.col("primary_hash") != F.col("replica_hash"),
                    F.lit("hash_mismatch")))
    return (j.withColumn("issue", issue)
             .filter(F.col("issue").isNotNull())
             .select(*keys, "issue", "primary_hash", "replica_hash"))


# (rule, severity) in the reference's rule order (:551-583): word-count
# analog info, timestamp validity error, invariant-domain warning.
PAGE_RULES: tuple[tuple[str, str], ...] = (
    ("content_without_byte_count", "info"),
    ("invalid_timestamp", "error"),
    ("digest_mismatch", "warning"),
)


def _rule_predicate(df: DataFrame, rule: str) -> F.Column:
    if rule == "content_without_byte_count":
        # page.content and not page.word_count (:551-553)
        return (F.length("text") > 0) & F.col("length").isNull()
    if rule == "invalid_timestamp":
        # page.unix_timestamp <= 0 (:565-567)
        return (F.col("ts14").isNull()
                | (F.col("ts14").cast("bigint") <= 0))
    if rule == "digest_mismatch":
        # quality_score outside [0,1] analog (:579-581): the stored digest
        # must equal the content hash — a value outside its invariant.
        return F.md5(F.col("text")) != F.col("digest")
    raise ValueError(f"unknown rule: {rule}")


def page_business_rules(df: DataFrame) -> DataFrame:
    """Violation counts per business rule (BusinessRuleValidator
    :534-611): one map-side aggregate over conditional counts — a single
    pass over the table, zero-row rules still emit a row (is_consistent
    true), mirroring the validator's 'all rules satisfied' result."""
    aggs = [
        F.sum(_rule_predicate(df, rule).cast("long")).alias(rule)
        for rule, _ in PAGE_RULES
    ]
    wide = df.agg(*aggs)
    rows = [
        wide.select(
            F.lit(rule).alias("rule"),
            F.lit(sev).alias("severity"),
            F.coalesce(F.col(rule), F.lit(0)).alias("violation_count"),
            (F.coalesce(F.col(rule), F.lit(0)) == 0).alias("is_consistent"),
        )
        for rule, sev in PAGE_RULES
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out
