"""Pure-Python crawl oracle: reference crawl semantics over collected rows.

Simulates the reference pipeline (discover → collapse=digest → dedup →
filter chain → per-host budget → priority order → extract gate) row-by-row
in plain Python, independent of the Spark implementation. The e2e test
asserts the engine reproduces this oracle's crawl ordering, URL-seen set and
filtered set exactly — the round contract (north_rule: "matching the
reference's crawl ordering and URL-seen set under the same seed list +
politeness budget").
"""

from __future__ import annotations

from .oracle import decide


def _budget(round_idx: int, rps: float, burst: int, round_seconds: float) -> int:
    return int(rps * round_seconds) + (burst if round_idx == 0 else 0)


def crawl_oracle(rows: list[dict], *, rps: float, burst: int,
                 round_seconds: float, max_rounds: int = 100) -> dict:
    """``rows``: collected corpus rows (url, warc_ts, ts14, host, mime,
    status, digest, length, text). Returns fetch_log, url_seen, filtered."""
    # discover: server-side CDX filters (the test seed matches everything)
    cands = [r for r in rows
             if r["status"] == 200 and r["mime"] in ("text/html",
                                                     "application/pdf")]
    # D1 collapse=digest: earliest (warc_ts, url) per digest
    by_digest: dict = {}
    for r in sorted(cands, key=lambda r: (r["warc_ts"], r["url"])):
        by_digest.setdefault(r["digest"], r)
    cands = list(by_digest.values())
    # D2/D8 in-batch (url, ts14) dedup
    by_key: dict = {}
    for r in sorted(cands, key=lambda r: (r["warc_ts"], r["url"])):
        by_key.setdefault((r["url"], r["ts14"]), r)
    frontier = list(by_key.values())

    url_seen: dict = {}
    seen_digests: set = set()
    fetch_log: list = []
    filtered: dict = {}

    for round_idx in range(max_rounds):
        if not frontier:
            break
        frontier = [r for r in frontier if (r["url"], r["ts14"]) not in url_seen]
        pending = []
        for r in frontier:
            d = decide(r["url"], r["length"], r["digest"], seen_digests)
            if d["status"] == "pending":
                pending.append((r, d))
            else:
                filtered.setdefault((r["url"], r["ts14"]),
                                    (d["status"], d["reason"]))
        # per-host budget, rank by (priority desc, url, ts14)
        budget = _budget(round_idx, rps, burst, round_seconds)
        per_host: dict = {}
        for r, d in pending:
            per_host.setdefault(r["host"], []).append((r, d))
        scheduled, deferred = [], []
        for host, items in per_host.items():
            items.sort(key=lambda rd: (-rd[1]["priority_score"],
                                       rd[0]["url"], rd[0]["ts14"]))
            scheduled.extend(items[:budget])
            deferred.extend(items[budget:])
        # global crawl order within the round
        scheduled.sort(key=lambda rd: (-rd[1]["priority_score"],
                                       rd[0]["url"], rd[0]["ts14"]))
        for seq, (r, d) in enumerate(scheduled, start=1):
            wc = len(r["text"].split())
            status = "completed" if wc > 50 else "failed"
            url_seen[(r["url"], r["ts14"])] = (status, round_idx)
            if status == "completed":
                seen_digests.add(r["digest"])
            fetch_log.append((round_idx, seq, r["url"], r["ts14"], status))
        frontier = [r for r, _ in deferred]

    return {"fetch_log": fetch_log, "url_seen": url_seen, "filtered": filtered}
