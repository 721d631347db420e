"""Dump .explain('formatted') for named contract queries to plans/r06/.

Usage: python scripts/explain_r06.py [--suffix before|after] [names...]
Defaults to the 15 bench headline queries. Plans go to
plans/r06/<name>_<suffix>.txt (the round-6 optimization evidence files).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chrono_scraper_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "filter_decisions", "collapse_digest", "seen_antijoin_bloom",
    "politeness_schedule", "crawl_order", "daily_stats",
    "exact_dups", "fulltext_match", "ann_topk", "events_tumbling",
    "lineitem_rollup", "gopher_quality", "boilerplate_strip",
    "fasttext_quality", "pack_emit",
]


def main() -> None:
    args = sys.argv[1:]
    suffix = "before"
    if args and args[0] == "--suffix":
        suffix = args[1]
        args = args[2:]
    names = args or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from chrono_scraper_spark.entry_queries import QUERIES

    spark = get_spark(app_name="explain-r06")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
