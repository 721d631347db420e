"""As-of join (SURVEY §2.7 J8) — for each left row, the latest right row
at-or-before its timestamp per key (backward; forward = at-or-after).

The naive formulation (range theta-join, then keep max ts) explodes to a
pair space per key. The scalable plan is the union trick every TSDB engine
uses (kdb aj / pandas merge_asof semantics, one distributed shuffle):

1. tag both sides and UNION them on (key, ts) with right payloads nulled
   on left rows;
2. one window per key ordered by (ts, side) — right rows sort BEFORE left
   rows at equal ts, making the match inclusive — carrying
   ``last(payload, ignorenulls=True)`` forward;
3. keep left rows; payload columns now hold the as-of match.

Cost: ONE shuffle on the key (same as any join), no range explosion, no
per-key sort beyond the window's. Skew follows the key distribution like
any window; mega-keys split with the same salting used elsewhere.

Use in this engine: joining fetch-log rows to the politeness-budget or
robots snapshot that was IN FORCE at fetch time (config tables change
slowly; fetches are dense) — the reference resolves this row-at-a-time in
Python services, the engine resolves it set-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str = "ts", right_ts: str | None = None,
              direction: str = "backward",
              tolerance_us: int | None = None) -> DataFrame:
    """Left as-of join. Every non-key, non-ts right column comes back
    prefixed ``asof_``, plus ``asof_ts`` (the matched right timestamp);
    unmatched left rows keep nulls. ``tolerance_us`` voids matches staler
    than the given microseconds (both directions)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    right_ts = right_ts or left_ts
    payload = [c for c in right.columns if c not in on and c != right_ts]

    lhs = left.withColumn("__side", F.lit(1)) \
        .withColumn("__ts", F.col(left_ts)) \
        .withColumn("__asof_ts", F.lit(None).cast(right.schema[right_ts].dataType))
    for c in payload:
        lhs = lhs.withColumn(f"asof_{c}",
                             F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        *[F.col(k) for k in on],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c).alias(f"asof_{c}") for c in payload])
    for c in left.columns:
        if c not in on:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    merged = lhs.unionByName(rhs)

    asc = direction == "backward"
    order = [F.col("__ts").asc() if asc else F.col("__ts").desc(),
             F.col("__side").asc()]
    w = (Window.partitionBy(*on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = {f"asof_{c}": F.last(f"asof_{c}", ignorenulls=True).over(w)
               for c in payload}
    carried["__asof_ts"] = F.last("__asof_ts", ignorenulls=True).over(w)
    out = merged.withColumns(carried).filter(F.col("__side") == 1)

    if tolerance_us is not None:
        # cast: parquet naive timestamps arrive as TIMESTAMP_NTZ, which
        # unix_micros rejects
        gap = F.abs(F.unix_micros(F.col("__ts").cast("timestamp"))
                    - F.unix_micros(F.col("__asof_ts").cast("timestamp")))
        stale = F.col("__asof_ts").isNull() | (gap > tolerance_us)
        voided = {f"asof_{c}": F.when(stale, F.lit(None)).otherwise(
            F.col(f"asof_{c}")) for c in payload}
        voided["__asof_ts"] = F.when(stale, F.lit(None)).otherwise(
            F.col("__asof_ts"))
        out = out.withColumns(voided)

    return out.withColumnRenamed("__asof_ts", "asof_ts") \
        .drop("__side", "__ts")
