"""N→4N scaling evidence (north_rule): run bench.py at local[8] and
local[32] in separate processes (same inputs, same code), report throughput
at both and the scaling efficiency, and rewrite the BENCH.md scaling
section.

Efficiency = (throughput_32 / throughput_8) / (32/8); the north_rule asks
for ≥ 0.8 between cluster sizes N and 4N.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    small, big = 8, 32
    r8 = run_at(small)
    print(json.dumps(r8))
    r32 = run_at(big)
    print(json.dumps(r32))
    thr8, thr32 = r8["value"], r32["value"]
    eff = (thr32 / thr8) / (big / small)
    summary = {
        "cpus_small": small, "cpus_big": big,
        "urls_per_sec_small": thr8, "urls_per_sec_big": thr32,
        "speedup": round(thr32 / thr8, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(f"""# BENCH — throughput + scaling evidence

Metric (BASELINE.json): frontier URLs processed/sec; scaling efficiency
≥0.8 from N to 4N executors, evidenced in-sandbox by running the identical
crawl job at `local[{small}]` and `local[{big}]` on the same generated
corpus ({r8['crawl']['n_docs']} docs → {r8['crawl']['frontier_urls']}
frontier URLs).

| parallelism | frontier URLs | crawl seconds | URLs/sec |
|---|---|---|---|
| local[{small}] | {r8['crawl']['frontier_urls']} | {r8['crawl']['crawl_seconds']} | {thr8} |
| local[{big}] | {r32['crawl']['frontier_urls']} | {r32['crawl']['crawl_seconds']} | {thr32} |

**Speedup {small}→{big} cores: {summary['speedup']}× (ideal {big//small}×);
scaling efficiency: {summary['scaling_efficiency']}** (north_rule target ≥0.8).

Headline query timings at local[{big}], sf={r32['sf']}:

| query | seconds |
|---|---|
""" + "\n".join(f"| {k} | {v} |" for k, v in r32["queries"].items()) + "\n")
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
