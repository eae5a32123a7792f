"""Per-host politeness scheduling: priority queue keyed by
``(priority, next_allowed_fetch_time)``.

The reference's politeness is a family of driver-side sleeps
(``crawl_delay/5`` per batch on the fast path, adaptive
``delay*batch/10`` on the HP path — SURVEY.md §4).  Here it becomes
frontier-shard state: each host has a clock advanced ``crawl_delay``
per fetch; a wave's budget for a host is however many fetches fit in
the wave horizon.

Two clock modes:

- **simulated** (default, ``clock=None``): a virtual clock that only
  advances by reservations — deterministic for tests/bench, no real
  sleeping.  This is what the conformance oracle models.
- **wall-clock** (``clock=time.monotonic`` or any zero-arg callable):
  ``next_allowed`` is anchored to real time, so a live-HTTP deployment
  enforces actual pacing — ``budget`` only grants fetches that fit in
  the real-time window, and ``wait_time`` tells a fetcher how long to
  sleep before a host is schedulable.  Injecting a fake callable keeps
  this path unit-testable without sleeping.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import Callable


@dataclass(order=True)
class _HostEntry:
    priority: int
    next_allowed: float
    host: str = field(compare=False)


class PolitenessQueue:
    """Tracks per-host (priority, next_allowed_fetch_time); hosts pop in
    (priority, next_allowed) order for wave planning."""

    def __init__(self, clock: Callable[[], float] | None = None):
        self.hosts: dict[str, dict] = {}
        self.clock = clock  # None = simulated virtual time

    def _now(self) -> float | None:
        return self.clock() if self.clock is not None else None

    def register(self, host: str, crawl_delay: float, priority: int = 0) -> None:
        self.hosts.setdefault(
            host,
            {"delay": float(crawl_delay), "next_allowed": 0.0, "priority": priority},
        )

    def budget(self, host: str, horizon: float) -> int:
        """How many fetches of ``host`` fit in a wave of ``horizon``
        seconds (≥1 when the host is schedulable at all, so progress is
        guaranteed even with delay > horizon).  In wall-clock mode the
        window starts at ``max(now, next_allowed)`` — a host still in
        its cool-down contributes the fetches that START in the
        remainder of the horizon: any positive window grants ≥1 fetch
        (a fetch only needs its start instant inside the horizon, even
        when the residual window is shorter than the delay); 0 only
        when the cool-down covers the whole horizon."""
        st = self.hosts[host]
        if st["delay"] <= 0:
            return 1_000_000_000
        now = self._now()
        if now is None:
            return max(1, int(horizon / st["delay"]))
        start = max(now, st["next_allowed"])
        window = horizon - (start - now)
        if window <= 0:
            return 0
        return max(1, int(window / st["delay"]))

    def reserve(self, host: str, n: int) -> float:
        """Advance the host's clock by n fetches; returns the new
        next_allowed time.  Wall-clock mode anchors at ``max(now,
        next_allowed)`` so idle time never banks free fetches."""
        st = self.hosts[host]
        now = self._now()
        base = st["next_allowed"] if now is None else max(now, st["next_allowed"])
        st["next_allowed"] = base + n * st["delay"]
        return st["next_allowed"]

    def wait_time(self, host: str) -> float:
        """Seconds a live fetcher must sleep before ``host`` is
        schedulable (0 in simulated mode or when already allowed)."""
        now = self._now()
        if now is None:
            return 0.0
        return max(0.0, self.hosts[host]["next_allowed"] - now)

    def order(self) -> list[str]:
        """Hosts in (priority, next_allowed) order — the dispatch order
        for wave planning."""
        heap = [
            _HostEntry(st["priority"], st["next_allowed"], h)
            for h, st in self.hosts.items()
        ]
        heapq.heapify(heap)
        return [heapq.heappop(heap).host for _ in range(len(heap))]

    # -- checkpointing -------------------------------------------------
    def state(self) -> dict:
        return {"hosts": self.hosts}

    def restore(self, state: dict) -> None:
        self.hosts = state["hosts"]
