"""Source-fallback router (SURVEY §2.11 T9).

The reference routes archive requests across wayback/Common-Crawl backends
with per-source strategies — IMMEDIATE fallback, RETRY_THEN_FALLBACK with
exponential backoff (≤30 s), CIRCUIT_BREAKER — and source priorities
(wayback=1, cc=2): ``archive_service_router.py:61-99,920-1010``. This is
driver-side control flow, not data flow: each "source" here is a callable
returning a DataFrame (a corpus scan, a CDX read, a live-fetch stage), and
the router deterministically decides which source served a round.

Determinism: no wall-clock sleeps — backoff is recorded in the attempt log
(``backoff_s``) rather than slept in tests; a live deployment passes
``sleeper=time.sleep``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

IMMEDIATE = "immediate"
RETRY_THEN_FALLBACK = "retry_then_fallback"
CIRCUIT_BREAKER = "circuit_breaker"


@dataclass
class Source:
    name: str
    fn: Callable  # () -> DataFrame (or raises)
    priority: int = 1  # lower = tried first (wayback=1, cc=2)
    strategy: str = RETRY_THEN_FALLBACK
    max_retries: int = 2
    backoff_base_s: float = 1.0
    backoff_cap_s: float = 30.0
    # circuit state
    failures: int = field(default=0, compare=False)
    trip_after: int = 3
    open: bool = field(default=False, compare=False)


class SourceRouter:
    """Try sources in priority order; per-source strategy decides retries
    and breaker state. Returns (DataFrame, attempt_log)."""

    def __init__(self, sources: list[Source], sleeper: Callable | None = None):
        self.sources = sorted(sources, key=lambda s: (s.priority, s.name))
        self.sleeper = sleeper  # None => record backoff, don't sleep

    def _attempts_for(self, src: Source) -> int:
        return 1 if src.strategy == IMMEDIATE else src.max_retries + 1

    def fetch(self):
        log: list[dict] = []
        for src in self.sources:
            if src.strategy == CIRCUIT_BREAKER and src.open:
                log.append({"source": src.name, "attempt": 0,
                            "outcome": "skipped_circuit_open",
                            "backoff_s": 0.0})
                continue
            for attempt in range(self._attempts_for(src)):
                backoff = min(src.backoff_base_s * (2 ** (attempt - 1)),
                              src.backoff_cap_s) if attempt else 0.0
                if backoff and self.sleeper is not None:
                    self.sleeper(backoff)
                try:
                    df = src.fn()
                except Exception as e:  # noqa: BLE001 — route, don't die
                    src.failures += 1
                    if (src.strategy == CIRCUIT_BREAKER
                            and src.failures >= src.trip_after):
                        src.open = True
                    log.append({"source": src.name, "attempt": attempt,
                                "outcome": f"error:{type(e).__name__}",
                                "backoff_s": backoff})
                    continue
                src.failures = 0
                log.append({"source": src.name, "attempt": attempt,
                            "outcome": "success", "backoff_s": backoff})
                return df, log
        raise RuntimeError(f"all sources failed: {log}")
