"""North-rule launch mode: the REAL ``spark-submit --py-files <zip>``
path (scripts/submit_crawl.py) — a fresh JVM, the engine shipped as a
zip exactly as a cluster would receive it, the crawl driven solely by
CLI args, counters emitted as JSON lines, and the warehouse left in the
same state the in-process CrawlJob produces."""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def _zip_package(tmp_path) -> str:
    zpath = str(tmp_path / "chrono_scraper_spark.zip")
    pkg = os.path.join(REPO, "chrono_scraper_spark")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_pyfiles_crawl(spark, tmp_path):
    from chrono_scraper_spark.corpus import generate_pages
    from chrono_scraper_spark.plans.catalog import SnapshotCatalog

    corpus = str(tmp_path / "pages")
    generate_pages(spark, 300, n_hosts=10).write.parquet(corpus)
    seeds = tmp_path / "seeds.json"
    seeds.write_text(json.dumps([{
        "project_id": 1, "domain_name": "https://.*",
        "match_type": "regex", "url_path": None,
        "from_date": None, "to_date": None}]))
    wh = str(tmp_path / "wh")

    env = dict(os.environ)
    env.pop("PYSPARK_DRIVER_PYTHON", None)
    # the zip must be the ONLY way executors see the package: run from a
    # neutral cwd so plain `import chrono_scraper_spark` cannot fall back
    # to the repo checkout
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", _zip_package(tmp_path),
         "--conf", "spark.sql.shuffle.partitions=8",
         os.path.join(REPO, "scripts", "submit_crawl.py"),
         "--pages", corpus, "--warehouse", wh,
         "--seeds", str(seeds), "--rps", "10000", "--burst", "0",
         "--round-seconds", "60", "--max-rounds", "2"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-3000:]

    counters = [json.loads(line) for line in proc.stdout.splitlines()
                if line.startswith("{")]
    assert counters and all("round" in c or "fetched" in c or c
                            for c in counters)

    # the submitted run's warehouse is a valid catalog this process can
    # read, with the crawl's output tables populated
    cat = SnapshotCatalog(spark, wh)
    n_seen = cat.read("url_seen").count()
    n_pages = cat.read("pages_out").count()
    assert n_seen > 0 and n_pages > 0
    assert cat.read("fetch_log").count() >= n_pages
