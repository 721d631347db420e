"""Fetch-join strategy datapoint: shuffle join vs bucketed (bucket-local)
join on the corpus payload side, at the >broadcast-cutoff scale path.

Simulates the CrawlJob round fetch join with every corpus row scheduled
(the worst case — no broadcast possible): payload (url, ts14, html) ⋈
scheduled (url, ts14, host), then a byte-sum aggregate so the payload
column is actually materialized through the join.

Interleaved best-of-N per variant (this host's delivered throughput swings
2-4× between minute-scale windows — BENCH.md host-variance addendum).

Usage: python scripts/bench_bucketed_fetch.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from chrono_scraper_spark.corpus import generate_pages  # noqa: E402
from chrono_scraper_spark.session import get_spark  # noqa: E402
from chrono_scraper_spark.sources.cdx import (  # noqa: E402
    read_pages,
    write_bucketed_pages,
)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("CSS_BENCH_TRIALS", "3"))
    spark = get_spark(app_name="bench-bucketed-fetch",
                      master=f"local[{cpus}]", shuffle_partitions=64)
    spark.range(1).count()
    work = tempfile.mkdtemp(prefix="css-bucketed-")
    try:
        plain = os.path.join(work, "pages")
        generate_pages(spark, n_docs, words_scale=8) \
            .write.parquet(plain)
        write_bucketed_pages(spark.read.parquet(plain),
                             "bench_pages_bucketed",
                             os.path.join(work, "pages_bucketed"),
                             n_buckets=64)

        # scheduled set = EVERY capture (metadata only), the no-broadcast
        # worst case; built once and materialized so its cost is excluded
        sched = (spark.read.parquet(plain)
                 .select("url",
                         F.date_format("warc_ts",
                                       "yyyyMMddHHmmss").alias("ts14"),
                         "host")
                 .cache())
        n_sched = sched.count()

        def fetch_join(payload):
            j = payload.join(sched, ["url", "ts14"], "inner")
            return j.agg(F.sum(F.length("html")).alias("bytes"),
                         F.count(F.lit(1)).alias("rows")).first()

        def payload_plain():
            return (spark.read.parquet(plain)
                    .select("url",
                            F.date_format("warc_ts",
                                          "yyyyMMddHHmmss").alias("ts14"),
                            "html"))

        def payload_bucketed():
            return read_pages(spark, "table:bench_pages_bucketed") \
                .select("url", "ts14", "html")

        # broadcast OFF: this benchmarks the above-cutoff path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fetch_join(payload_plain())      # warm codegen both shapes
        fetch_join(payload_bucketed())

        results = {"shuffle": [], "bucketed": []}
        rows = None
        for _ in range(trials):
            for name, mk in (("shuffle", payload_plain),
                             ("bucketed", payload_bucketed)):
                t0 = time.time()
                out = fetch_join(mk())
                results[name].append(round(time.time() - t0, 3))
                rows = int(out["rows"])
        best = {k: min(v) for k, v in results.items()}
        print(json.dumps({
            "metric": "fetch_join_seconds",
            "n_docs": n_docs, "n_sched": n_sched, "join_rows": rows,
            "cpus": cpus,
            "shuffle_join_best_s": best["shuffle"],
            "bucketed_join_best_s": best["bucketed"],
            "speedup": round(best["shuffle"] / best["bucketed"], 3),
            "trials": results,
        }))
    finally:
        spark.sql("DROP TABLE IF EXISTS bench_pages_bucketed")
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
