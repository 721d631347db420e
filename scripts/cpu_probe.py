"""Pure-CPU hardware scaling probe (no Spark).

Measures what THIS machine actually delivers when stepping 8 → 32 worker
processes: on shared/virtualized hosts, aggregate cycles do not grow by the
core ratio (steal, frequency, memory-bandwidth effects). The scaling
benchmark normalizes against this ceiling — a real N→4N executor step
multiplies all resources, which a single box cannot emulate.

Prints one JSON line: {"agg_8": ..., "agg_32": ..., "hw_scaling_8_to_32":
<aggregate ratio>, "hw_efficiency": <ratio / 4>}.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import time


def _burn(_: int) -> int:
    h = b"x" * 4096
    t0 = time.time()
    c = 0
    while time.time() - t0 < 6.0:
        h = (hashlib.md5(h).digest() * 256)[:4096]
        c += 1
    return c


def aggregate(workers: int) -> int:
    with mp.Pool(workers) as p:
        return sum(p.map(_burn, range(workers)))


def main() -> None:
    agg8 = aggregate(8)
    agg32 = aggregate(32)
    ratio = agg32 / agg8
    print(json.dumps({
        "agg_8": agg8, "agg_32": agg32,
        "hw_scaling_8_to_32": round(ratio, 3),
        "hw_efficiency": round(ratio / 4, 3),
    }))


if __name__ == "__main__":
    main()
