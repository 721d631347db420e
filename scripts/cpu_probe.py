"""Hardware scaling probes (no Spark).

Measures what THIS machine actually delivers when stepping 8 → 32 worker
processes: on shared/virtualized hosts, aggregate cycles do not grow by the
core ratio (steal, frequency, memory-bandwidth effects). The scaling
benchmark normalizes against this ceiling — a real N→4N executor step
multiplies all resources, which a single box cannot emulate.

Two probes:

- **md5 burn** — cache-resident pure-ALU work; the optimistic ceiling.
- **extraction kernel** (if ``CSS_PROBE_CORPUS`` points at a pages parquet
  DIRECTORY) — the engine's OWN single-threaded html→text kernel over real
  corpus pages via ``multiprocessing``, i.e. the same work Spark
  parallelizes but with zero engine overhead.

The kernel probe is FIXED-WORK weak scaling: the corpus' parquet files are
split disjointly across k workers, every page is extracted exactly ONCE,
and throughput = total pages / wall (a shared Barrier aligns the start;
each worker pre-loads its slice before the barrier so IO is untimed).
Streaming distinct pages matches the real workload's memory behavior — an
earlier variant had each worker CYCLE a small resident page set, which fits
in L3 at 8 workers but not at 32 and reported a "ceiling" 2.7× below what
the actual Spark stage achieves. A ceiling the system exceeds is not a
ceiling; this one is exceedance-proof by construction (same kernel, same
page mix, zero overhead).

Prints one JSON line: {"hw_scaling_8_to_32": <md5 ratio>,
"hw_efficiency": ..., "kernel_scaling_8_to_32": ..., "kernel_efficiency":
..., "kernel_pages_per_sec_32": ...} (kernel fields only with a corpus).
"""

from __future__ import annotations

import glob
import hashlib
import json
import multiprocessing as mp
import os
import time

_BURN_SECONDS = 6.0


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


def _kernel_worker(files: list[str], barrier, out_q) -> None:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import pyarrow.parquet as pq

    from chrono_scraper_spark.operators.extraction import extract_one

    pages = []
    for f in files:
        pages.extend(h.as_py() for h in
                     pq.read_table(f, columns=["html"])["html"])
    barrier.wait()          # all slices loaded — start together
    t0 = time.time()
    for p in pages:
        extract_one(p)
    out_q.put((len(pages), time.time() - t0))


def kernel_aggregate(workers: int, corpus: str,
                     max_files: int = 32) -> tuple[int, float]:
    """(pages, wall_seconds) for one fixed-work run: ``max_files`` corpus
    files split round-robin over ``workers`` processes, each page extracted
    once. Same file set at every worker count ⇒ identical total work."""
    files = sorted(glob.glob(os.path.join(corpus, "*.parquet")))[:max_files]
    slices = [files[i::workers] for i in range(workers)]
    slices = [s for s in slices if s]
    barrier = mp.Barrier(len(slices))
    out_q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_kernel_worker, args=(s, barrier, out_q))
             for s in slices]
    for p in procs:
        p.start()
    results = [out_q.get() for _ in procs]
    for p in procs:
        p.join()
    pages = sum(r[0] for r in results)
    wall = max(r[1] for r in results)
    return pages, wall


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
        rate = {}
        for workers in (8, 32):
            best = 0.0
            for _trial in range(2):          # best-of-2 per level
                pages, wall = kernel_aggregate(workers, corpus)
                best = max(best, pages / wall)
            rate[workers] = best
        out.update({
            "kernel_scaling_8_to_32": round(rate[32] / rate[8], 3),
            "kernel_efficiency": round(rate[32] / rate[8] / 4, 3),
            "kernel_pages_per_sec_8": round(rate[8], 1),
            "kernel_pages_per_sec_32": round(rate[32], 1),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
