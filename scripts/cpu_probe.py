"""Hardware scaling probes (no Spark).

Measures what THIS machine actually delivers when stepping 8 → 32 worker
processes: on shared/virtualized hosts, aggregate cycles do not grow by the
core ratio (steal, frequency, memory-bandwidth effects). The scaling
benchmark normalizes against this ceiling — a real N→4N executor step
multiplies all resources, which a single box cannot emulate.

Two probes:

- **md5 burn** — cache-resident pure-ALU work; the optimistic ceiling.
- **extraction kernel** (if ``CSS_PROBE_CORPUS`` points at a pages parquet)
  — the engine's OWN single-threaded html→text kernel over real corpus
  pages via ``multiprocessing.Pool``, i.e. the same work Spark
  parallelizes but with zero engine overhead. String/regex work is
  memory-bandwidth-heavier than md5, so this ceiling is LOWER — and it is
  the honest normalization for the extract stage: no software on this box
  can scale the workload past what the bare kernel achieves.

Prints one JSON line: {"hw_scaling_8_to_32": <md5 ratio>,
"hw_efficiency": ..., "kernel_scaling_8_to_32": ..., "kernel_efficiency":
..., "kernel_pages_per_sec_32": ...} (kernel fields only with a corpus).
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import time

_BURN_SECONDS = 6.0
_KERNEL_PAGES: list = []  # populated in each worker via initializer


def _burn(_: int) -> int:
    h = b"x" * 4096
    t0 = time.time()
    c = 0
    while time.time() - t0 < _BURN_SECONDS:
        h = (hashlib.md5(h).digest() * 256)[:4096]
        c += 1
    return c


def aggregate(workers: int) -> int:
    with mp.Pool(workers) as p:
        return sum(p.map(_burn, range(workers)))


def _kernel_init(corpus: str) -> None:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import pyarrow.parquet as pq

    tbl = pq.read_table(corpus, columns=["html"])
    _KERNEL_PAGES.extend(h.as_py() for h in tbl["html"][:2000])


def _kernel_burn(_: int) -> int:
    from chrono_scraper_spark.operators.extraction import extract_one

    t0 = time.time()
    c = 0
    while time.time() - t0 < _BURN_SECONDS:
        extract_one(_KERNEL_PAGES[c % len(_KERNEL_PAGES)])
        c += 1
    return c


def kernel_aggregate(workers: int, corpus: str) -> int:
    with mp.Pool(workers, initializer=_kernel_init,
                 initargs=(corpus,)) as p:
        return sum(p.map(_kernel_burn, range(workers)))


def main() -> None:
    agg8 = aggregate(8)
    agg32 = aggregate(32)
    ratio = agg32 / agg8
    out = {
        "agg_8": agg8, "agg_32": agg32,
        "hw_scaling_8_to_32": round(ratio, 3),
        "hw_efficiency": round(ratio / 4, 3),
    }
    corpus = os.environ.get("CSS_PROBE_CORPUS")
    if corpus and os.path.exists(corpus):
        k8 = kernel_aggregate(8, corpus)
        k32 = kernel_aggregate(32, corpus)
        out.update({
            "kernel_scaling_8_to_32": round(k32 / k8, 3),
            "kernel_efficiency": round(k32 / k8 / 4, 3),
            "kernel_pages_per_sec_8": round(k8 / _BURN_SECONDS, 1),
            "kernel_pages_per_sec_32": round(k32 / _BURN_SECONDS, 1),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
