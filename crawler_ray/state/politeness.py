"""Per-host politeness scheduling: priority queue keyed by
``(priority, next_allowed_fetch_time)``.

The reference's politeness is a family of driver-side sleeps
(``crawl_delay/5`` per batch on the fast path, adaptive
``delay*batch/10`` on the HP path — SURVEY.md §4).  Here it becomes
frontier-shard state: each host has a virtual clock advanced
``crawl_delay`` per fetch; a wave's budget for a host is however many
fetches fit in the wave horizon.  Clocks are *simulated* by default
(deterministic tests/bench — no real sleeping); an engine can map them
to wall-time when driving live HTTP.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field


@dataclass(order=True)
class _HostEntry:
    priority: int
    next_allowed: float
    host: str = field(compare=False)


class PolitenessQueue:
    """Tracks per-host (priority, next_allowed_fetch_time); hosts pop in
    (priority, next_allowed) order for wave planning."""

    def __init__(self):
        self.hosts: dict[str, dict] = {}

    def register(self, host: str, crawl_delay: float, priority: int = 0) -> None:
        self.hosts.setdefault(
            host,
            {"delay": float(crawl_delay), "next_allowed": 0.0, "priority": priority},
        )

    def budget(self, host: str, horizon: float) -> int:
        """How many fetches of ``host`` fit in a wave of ``horizon``
        virtual seconds (≥1 when the host is schedulable at all, so
        progress is guaranteed even with delay > horizon)."""
        st = self.hosts[host]
        if st["delay"] <= 0:
            return 1_000_000_000
        return max(1, int(horizon / st["delay"]))

    def reserve(self, host: str, n: int) -> float:
        """Advance the host's virtual clock by n fetches; returns the new
        next_allowed time."""
        st = self.hosts[host]
        st["next_allowed"] += n * st["delay"]
        return st["next_allowed"]

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
