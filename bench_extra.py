"""Round-6 supplementary benchmark: per-query timings with bench.py's exact
methodology (same session config, same cold+warm .count() protocol, same
clearCache between queries) but selectable query lists and repeat counts —
bench.py itself is frozen for measurement, so optimization evidence cites
this file. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [q1,q2,...]
    [CSS_BENCH_EXTRA_REPEATS=3]

Prints one JSON line: {"queries": {name: warm_best}, "queries_cold": {...},
"queries_warm_samples": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chrono_scraper_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "filter_decisions", "collapse_digest", "seen_antijoin_bloom",
    "politeness_schedule", "crawl_order", "daily_stats",
    "exact_dups", "fulltext_match", "ann_topk", "events_tumbling",
    "lineitem_rollup", "gopher_quality", "boilerplate_strip",
    "fasttext_quality", "pack_emit",
]


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("CSS_BENCH_EXTRA_REPEATS", "3"))
    os.environ.setdefault("CSS_DRIVER_MEM", "48g")

    from chrono_scraper_spark.entry_queries import QUERIES

    spark = get_spark(app_name="css-bench-extra", master=f"local[{cpus}]",
                      shuffle_partitions=int(
                          os.environ.get("CSS_BENCH_SHUFFLE", "64")))
    spark.range(1).count()
    warm, cold, samples = {}, {}, {}
    for name in names:
        t0 = time.time()
        n = QUERIES[name](spark, sf_dir).count()
        cold[name] = round(time.time() - t0, 3)
        runs = []
        for _ in range(repeats):
            t1 = time.time()
            n2 = QUERIES[name](spark, sf_dir).count()
            runs.append(round(time.time() - t1, 3))
            assert n == n2
        warm[name] = min(runs)
        samples[name] = runs
        spark.catalog.clearCache()
    print(json.dumps({"queries": warm, "queries_cold": cold,
                      "queries_warm_samples": samples,
                      "sum_warm": round(sum(warm.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
