"""Build a perf-scale sf1.0 replica from the driver's sf0.1 testdata.

The driver's round-end measurement runs at a driver-generated sf1.0
(BENCH_r05.json: "sf": 1.0) that is not present on disk between rounds.
For optimization work we need a dataset of the same scale so that plan
choices (broadcast gates, AQE coalescing, scan splits) are exercised at the
measured size, not at sf0.1.  This script scales each sf0.1 table 10x by
key-shifted replication:

- every copy i shifts primary/foreign keys by ``i * (max_key + 1)`` so that
  join fan-outs and per-key group sizes match the base data (cardinalities
  scale linearly, like the driver's own generator: documents 5k@sf0.1 ->
  50k@sf1.0, per planutil.py's recorded footer shapes);
- ``documents.text`` gets a per-copy suffix token so text-dedup families
  keep a realistic duplicate rate instead of a degenerate 10x-dup corpus;
- dimension tables (region, nation) are kept verbatim, as TPC-H does;
- each table is written as a single parquet file (repartition(1)) matching
  the driver testdata's one-file one-row-group layout, which is exactly the
  shape scan_parallelism_floor exists to handle.

Output: /root/sfgen/sf1.0/<table>.parquet  (dir name must end in "sf1.0"
so bench.py parses sf=1.0 from it).  Perf-measurement data only — never an
oracle input.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chrono_scraper_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("CSS_SF_SRC", "/root/testdata/sf0.1")
DST = os.environ.get("CSS_SF_DST", "/root/sfgen/sf1.0")
COPIES = int(os.environ.get("CSS_SF_COPIES", "10"))

# table -> columns shifted by i * (max(col) + 1) of the OWNING table
KEY_OWNERS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": [],
}
# foreign keys: (table, col) -> owner (table, col)
FKS = {
    ("orders", "o_custkey"): ("customer", "c_custkey"),
    ("lineitem", "l_orderkey"): ("orders", "o_orderkey"),
    ("lineitem", "l_partkey"): ("part", "p_partkey"),
    ("lineitem", "l_suppkey"): ("supplier", "s_suppkey"),
}
VERBATIM = ["region", "nation"]


def main() -> None:
    spark = get_spark(app_name="make-sf1", shuffle_partitions=8)
    os.makedirs(DST, exist_ok=True)

    # pass 1: max key per owned column
    maxes: dict[tuple[str, str], int] = {}
    for table, cols in KEY_OWNERS.items():
        if not cols:
            continue
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        row = df.agg(*[F.max(c).alias(c) for c in cols]).first()
        for c in cols:
            maxes[(table, c)] = int(row[c]) + 1

    for table in list(KEY_OWNERS) + VERBATIM:
        src = f"{SRC}/{table}.parquet"
        base = spark.read.parquet(src)
        if table in VERBATIM:
            out = base
        else:
            shifts: dict[str, int] = {}
            for c in KEY_OWNERS[table]:
                shifts[c] = maxes[(table, c)]
            for (t, c), owner in FKS.items():
                if t == table:
                    shifts[c] = maxes[owner]
            parts = []
            for i in range(COPIES):
                cp = base
                for c, step in shifts.items():
                    cp = cp.withColumn(c, (F.col(c) + F.lit(i * step))
                                       .cast(dict(base.dtypes)[c]))
                if table == "documents" and i > 0:
                    cp = cp.withColumn(
                        "text", F.concat(F.col("text"),
                                         F.lit(f" copytag{i}")))
                parts.append(cp)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        tmp = f"{DST}/_tmp_{table}"
        out.repartition(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(tmp, part), f"{DST}/{table}.parquet")
        shutil.rmtree(tmp)
        print(table, "->", f"{DST}/{table}.parquet")
    with open(os.path.join(DST, "_DONE"), "w") as f:
        f.write("ok\n")
    spark.stop()


if __name__ == "__main__":
    main()
