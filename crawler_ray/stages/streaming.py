"""Stateful stream-shaped processing: incremental sessionization.

Ray Data has no event-time windows/watermarks (guide §streaming); for
stream semantics the input is treated as an ordered, partitioned log.
Batch-mode windowing lives in the queries (sessionize, tumbling,
sliding).  This module adds the *incremental* form the reference's
poll-loop worker implies: a pool of ``SessionState`` actors, one per
key-hash bucket, fed micro-batches in ts order; session state (last
event ts, open session id) survives across batches, so feeding the
same log in N chunks yields exactly the batch answer.

Ordering assumption (documented per the guide): batches must arrive in
non-decreasing ts order per key — the log's partition order.
"""

from __future__ import annotations

import pandas as pd

import ray


@ray.remote(num_cpus=0)
class SessionState:
    """Per-bucket incremental sessionizer (gap-based)."""

    def __init__(self, gap_s: float = 1800.0):
        self.gap_s = gap_s
        # user_id -> {"last_ts": pd.Timestamp, "n_sessions": int, "n_events": int}
        self.state: dict = {}

    def ingest(self, df: pd.DataFrame) -> int:
        df = df.sort_values(["ts", "event_id"])
        for user, g in df.groupby("user_id"):
            st = self.state.setdefault(
                user, {"last_ts": None, "n_sessions": 0, "n_events": 0}
            )
            for ts in g["ts"]:
                if (
                    st["last_ts"] is None
                    or (ts - st["last_ts"]).total_seconds() > self.gap_s
                ):
                    st["n_sessions"] += 1
                st["last_ts"] = ts
                st["n_events"] += 1
        return len(df)

    def snapshot(self) -> pd.DataFrame:
        rows = [
            {"user_id": u, "n_events": s["n_events"], "n_sessions": s["n_sessions"]}
            for u, s in self.state.items()
        ]
        return pd.DataFrame(rows)


class IncrementalSessionizer:
    """Driver-side facade: routes micro-batches to key-hash bucket
    actors and merges snapshots."""

    def __init__(self, n_buckets: int = 4, gap_s: float = 1800.0):
        self.n_buckets = n_buckets
        self.actors = [SessionState.remote(gap_s) for _ in range(n_buckets)]

    def ingest_batch(self, df: pd.DataFrame) -> None:
        buckets = df["user_id"].astype("int64") % self.n_buckets
        futures = []
        for b in range(self.n_buckets):
            part = df[buckets == b]
            if len(part):
                futures.append(self.actors[b].ingest.remote(part))
        ray.get(futures)

    def snapshot(self) -> pd.DataFrame:
        parts = ray.get([a.snapshot.remote() for a in self.actors])
        parts = [p for p in parts if len(p)]
        if not parts:
            return pd.DataFrame({"user_id": [], "n_events": [], "n_sessions": []})
        return (
            pd.concat(parts, ignore_index=True)
            .sort_values("user_id")
            .reset_index(drop=True)
        )
