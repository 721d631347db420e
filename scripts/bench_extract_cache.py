"""E11 extraction-cache benchmark: cold (kernel runs) vs warm (cache-join
resolves every row) over the same corpus — the steady-state recrawl shape.

Prints one JSON line:
  {"cold_pages_per_sec": ..., "warm_pages_per_sec": ..., "speedup": ...,
   "pages": N}

Protocol notes: same best-of-N convention as bench.py (this VM's delivered
throughput swings between minute windows); the warm pass re-reads the
committed cache table, so it pays the parquet scan + join — exactly what a
production recrawl pays.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chrono_scraper_spark.corpus import generate_pages  # noqa: E402
from chrono_scraper_spark.operators.extraction import (  # noqa: E402
    with_extraction,
    with_extraction_cached,
)
from chrono_scraper_spark.plans.catalog import SnapshotCatalog  # noqa: E402
from chrono_scraper_spark.session import get_spark  # noqa: E402


def consume(df) -> float:
    t0 = time.monotonic()
    df.select(F.sum(F.length("extracted.text"))).collect()
    return time.monotonic() - t0


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_docs = int(os.environ.get("CSS_CACHE_BENCH_DOCS", "60000"))
    trials = int(os.environ.get("CSS_CACHE_BENCH_TRIALS", "3"))
    spark = get_spark(master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus) * 2)
    pages = generate_pages(spark, n_docs, words_scale=8).cache()
    n = pages.count()

    with tempfile.TemporaryDirectory() as tmp:
        cat = SnapshotCatalog(spark, os.path.join(tmp, "wh"))
        # populate cache once (also JIT/codegen warmup for both paths)
        with_extraction_cached(pages, cat).select(
            F.count(F.lit(1))).collect()
        cold = min(consume(with_extraction(pages)) for _ in range(trials))
        warm = min(consume(with_extraction_cached(
            pages, cat, update_cache=False)) for _ in range(trials))

    print(json.dumps({
        "pages": n,
        "cold_seconds": round(cold, 3),
        "warm_seconds": round(warm, 3),
        "cold_pages_per_sec": round(n / cold, 1),
        "warm_pages_per_sec": round(n / warm, 1),
        "speedup": round(cold / warm, 2),
    }))


if __name__ == "__main__":
    main()
