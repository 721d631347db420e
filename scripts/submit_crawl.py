"""spark-submit entry point for the crawl pipeline (north_rule launch mode).

Cluster launch:

    # package the engine for the executors
    cd /root/repo && zip -qr /tmp/chrono_scraper_spark.zip chrono_scraper_spark

    spark-submit \
      --py-files /tmp/chrono_scraper_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.adaptive.skewJoin.enabled=true \
      scripts/submit_crawl.py \
      --pages /data/pages --warehouse /data/warehouse \
      --seeds /data/seeds.json --rps 1.0 --burst 5 --round-seconds 60 \
      --max-rounds 100

Local smoke (same file, no cluster):

    spark-submit --master 'local[8]' scripts/submit_crawl.py \
      --pages <corpus> --warehouse <dir> --seeds <seeds.json> --max-rounds 2

``--seeds`` is a JSON list of seed objects:
  [{"project_id": 1, "domain_name": "example.com", "match_type": "domain",
    "url_path": null, "from_date": null, "to_date": null}, ...]

No ``master()`` is set here — spark-submit provides it; on a cluster,
dynamic allocation sizes the executor fleet. Per-round counters, phase
timings and per-partition lineage are printed as JSON lines and persisted
in the ``crawl_rounds`` table.
"""

from __future__ import annotations

import argparse
import datetime
import json

from pyspark.sql import SparkSession


def parse_args():
    ap = argparse.ArgumentParser(description="chrono-scraper-spark crawl")
    ap.add_argument("--pages", required=True, help="corpus table path")
    ap.add_argument("--warehouse", required=True, help="catalog root")
    ap.add_argument("--seeds", required=True, help="seeds JSON file")
    ap.add_argument("--rps", type=float, default=1.0)
    ap.add_argument("--burst", type=int, default=5)
    ap.add_argument("--round-seconds", type=float, default=60.0)
    ap.add_argument("--max-rounds", type=int, default=100)
    ap.add_argument("--no-attachments", action="store_true")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    return ap.parse_args()


def main() -> None:
    args = parse_args()
    builder = (SparkSession.builder.appName("chrono-scraper-spark-crawl")
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.adaptive.skewJoin.enabled", "true")
               .config("spark.sql.execution.arrow.pyspark.enabled", "true")
               .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
               .config("spark.sql.session.timeZone", "UTC"))
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(args.shuffle_partitions))
    spark = builder.getOrCreate()

    from chrono_scraper_spark.plans.catalog import SnapshotCatalog
    from chrono_scraper_spark.plans.crawl import CrawlJob

    with open(args.seeds) as f:
        seed_rows = json.load(f)
    for s in seed_rows:
        for k in ("from_date", "to_date"):
            if s.get(k):
                s[k] = datetime.date.fromisoformat(s[k])
    seeds = spark.createDataFrame(
        [(s["project_id"], s["domain_name"], s["match_type"],
          s.get("url_path"), s.get("from_date"), s.get("to_date"))
         for s in seed_rows],
        "project_id int, domain_name string, match_type string, "
        "url_path string, from_date date, to_date date")

    job = CrawlJob(
        spark, SnapshotCatalog(spark, args.warehouse), args.pages, seeds,
        rps=args.rps, burst=args.burst, round_seconds=args.round_seconds,
        include_attachments=not args.no_attachments)
    start = job.next_round()
    if start:
        print(json.dumps({"resumed_from_round": start}))
    for counters in job.run(max_rounds=args.max_rounds):
        print(json.dumps(counters))


if __name__ == "__main__":
    main()
