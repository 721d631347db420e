"""Multi-round steady-state commit cost: proven-new merge fast path vs
forced existing-key probes.

The single-round scaling bench (bench_scaling.py) cannot see the cost that
dominates a LONG crawl: every round's four table MERGEs re-probing the
ACCUMULATED url_seen / fetch_log / pages_out / inverted_terms tables for
key collisions. With `expect_version` (catalog.py) a normal round skips
the probe — the delta was anti-joined against the same pinned snapshot —
so commit cost stays O(delta) as the catalog grows. This script runs the
SAME multi-round crawl twice (politeness budget low enough that the
mega-host drains over ~8 rounds) and prints per-round phase timings:

- variant "fastpath": the shipped behavior
- variant "probe":    merge_not_matched patched to ignore expect_version
                      (every commit anti-joins the accumulated table —
                      the pre-round-4 behavior)

Output: one JSON line per variant with per-round `commit_tables` /
`commit_filtered_log` seconds + totals, then a one-line summary. At 10^10
rows the probe variant's growth term is the whole round; here it is small
but visibly monotone while the fast path stays flat.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from chrono_scraper_spark.corpus import generate_pages  # noqa: E402
from chrono_scraper_spark.plans import catalog as catmod  # noqa: E402
from chrono_scraper_spark.plans.catalog import SnapshotCatalog  # noqa: E402
from chrono_scraper_spark.plans.crawl import CrawlJob  # noqa: E402
from chrono_scraper_spark.session import get_spark  # noqa: E402

N_DOCS = int(os.environ.get("CSS_ROUNDS_DOCS", "60000"))
RPS = float(os.environ.get("CSS_ROUNDS_RPS", "80"))
MAX_ROUNDS = int(os.environ.get("CSS_ROUNDS_MAX", "8"))
CPUS = os.environ.get("CSS_ROUNDS_CPUS", "32")


def _seeds(spark):
    return spark.createDataFrame(
        [(1, r"https://.*", "regex", None, None, None)],
        "project_id int, domain_name string, match_type string, "
        "url_path string, from_date date, to_date date")


def run_variant(spark, corpus_path: str, root: str, probe: bool) -> dict:
    orig = SnapshotCatalog.merge_not_matched
    if probe:
        def probing(self, table, new_rows, keys, **kw):
            kw.pop("expect_version", None)   # force the accumulated-key scan
            return orig(self, table, new_rows, keys, **kw)
        SnapshotCatalog.merge_not_matched = probing
    try:
        job = CrawlJob(spark, SnapshotCatalog(spark, root), corpus_path,
                       _seeds(spark), rps=RPS, burst=0, round_seconds=60.0)
        t0 = time.time()
        rounds = job.run(max_rounds=MAX_ROUNDS)
        wall = time.time() - t0
    finally:
        SnapshotCatalog.merge_not_matched = orig
    per_round = [r.get("timings", {}) for r in rounds]
    commits = [t.get("commit_tables", 0.0) + t.get("commit_filtered_log", 0.0)
               + t.get("commit_frontier", 0.0) for t in per_round]
    return {
        "variant": "probe" if probe else "fastpath",
        "rounds": len(rounds),
        "wall_seconds": round(wall, 3),
        "commit_seconds_per_round": [round(c, 3) for c in commits],
        "commit_seconds_total": round(sum(commits), 3),
        "phase_seconds_per_round": per_round,
        "urls_terminalized": sum(r.get("completed", 0) + r.get("failed", 0)
                                 for r in rounds),
    }


def merge_microbench(spark, base: str) -> None:
    """Isolated merge cost vs ACCUMULATED table size: a fixed 20k-row delta
    merged into url_seen-shaped tables of growing size (split over 16
    fragments like a 16-round catalog), probe vs fast path. The crawl-level
    comparison above shows parity at bench scale — the probe's anti-join is
    noise on ~1e5-row tables; THIS curve is the quantity that matters at
    10^10 rows: probe cost grows with the table, fast path stays flat."""
    from pyspark.sql import functions as F

    delta_n = 20_000
    for n in (100_000, 1_000_000, 4_000_000):
        for probe in (False, True):
            root = os.path.join(base, f"mb-{n}-{'p' if probe else 'f'}")
            if os.path.exists(root):
                import shutil
                shutil.rmtree(root)
            cat = SnapshotCatalog(spark, root)
            frag = n // 16
            ver = None
            for i in range(16):
                rows = spark.range(i * frag, (i + 1) * frag).select(
                    F.concat(F.lit("u"), F.col("id")).alias("url_canon"),
                    F.lit("20240101000000").alias("ts14"))
                m = cat.append("t", rows)
                ver = m["version"]
            delta = spark.range(n, n + delta_n).select(
                F.concat(F.lit("u"), F.col("id")).alias("url_canon"),
                F.lit("20240101000000").alias("ts14"))
            delta.count()  # materialize input side out of the timing
            t0 = time.time()
            cat.merge_not_matched(
                "t", delta, ["url_canon", "ts14"], assume_unique=True,
                **({} if probe else {"expect_version": ver}))
            dt = time.time() - t0
            print(json.dumps({
                "microbench": "merge_not_matched",
                "accumulated_rows": n,
                "delta_rows": delta_n,
                "variant": "probe" if probe else "fastpath",
                "seconds": round(dt, 3),
            }), flush=True)


def main() -> None:
    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=64)
    base = os.environ.get("CSS_ROUNDS_TMP", "/tmp/css-rounds")
    os.makedirs(base, exist_ok=True)
    if os.environ.get("CSS_ROUNDS_MICRO_ONLY"):
        merge_microbench(spark, base)
        return
    corpus_path = os.path.join(base, f"pages-{N_DOCS}")
    if not os.path.exists(corpus_path):
        generate_pages(spark, N_DOCS).write.mode("overwrite") \
            .parquet(corpus_path)

    # JVM/codegen warmup (same reason as bench.py): the first crawl of a
    # session pays ~40 s of whole-stage-codegen compile that would otherwise
    # land entirely on whichever variant runs first
    warm_root = os.path.join(base, "wh-warm")
    if os.path.exists(warm_root):
        import shutil
        shutil.rmtree(warm_root)
    warm_corpus = os.path.join(base, "pages-warm")
    if not os.path.exists(warm_corpus):
        generate_pages(spark, 500).write.mode("overwrite") \
            .parquet(warm_corpus)
    CrawlJob(spark, SnapshotCatalog(spark, warm_root), warm_corpus,
             _seeds(spark), rps=10_000.0, burst=0,
             round_seconds=60.0).run(max_rounds=3)

    results = []
    # interleave variants to split host-noise windows fairly
    for trial in range(int(os.environ.get("CSS_ROUNDS_TRIALS", "2"))):
        for probe in (False, True):
            root = os.path.join(base, f"wh-{'p' if probe else 'f'}-{trial}")
            if os.path.exists(root):
                import shutil
                shutil.rmtree(root)
            res = run_variant(spark, corpus_path, root, probe)
            res["trial"] = trial
            print(json.dumps(res), flush=True)
            results.append(res)

    def best(variant):
        return min((r for r in results if r["variant"] == variant),
                   key=lambda r: r["commit_seconds_total"])

    f, p = best("fastpath"), best("probe")
    print(json.dumps({
        "summary": "multi-round commit cost (best-of-trials)",
        "rounds": f["rounds"],
        "fastpath_commit_total_s": f["commit_seconds_total"],
        "probe_commit_total_s": p["commit_seconds_total"],
        "probe_over_fastpath": round(
            p["commit_seconds_total"] / max(f["commit_seconds_total"], 1e-9),
            3),
        "fastpath_per_round": f["commit_seconds_per_round"],
        "probe_per_round": p["commit_seconds_per_round"],
    }), flush=True)
    merge_microbench(spark, base)


if __name__ == "__main__":
    main()
