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
    """Per-bucket incremental sessionizer (gap-based).

    ``idle_ttl_s`` bounds actor memory in a long-running stream: users
    idle longer than the TTL are EVICTED from the open-session map,
    their totals folded into a per-user closed accumulator
    (emit-on-evict — never silently dropped).  Exactness: with
    ``idle_ttl_s >= gap_s`` (enforced) and IN-ORDER arrival (the
    module's documented ordering assumption), any event from an
    evicted user arrives more than ``gap_s`` after their last event,
    so it would have opened a new session anyway — eviction changes
    no counts.  With OUT-OF-ORDER events across micro-batches that
    guarantee fails: a late event whose ts is within ``gap_s`` of the
    evicted user's last_ts opens a spurious extra session vs the
    no-TTL actor.  Such re-opens are COUNTED in ``late_reopens``
    (visible via :meth:`late_reopen_count`, the
    ``TumblingWindowState.late_dropped`` discipline) — never silent.
    Open state is then bounded by the users ACTIVE within one TTL, not
    all users ever seen (the watermark discipline of
    :class:`TumblingWindowState` applied to sessions)."""

    def __init__(self, gap_s: float = 1800.0, idle_ttl_s: float | None = None):
        if idle_ttl_s is not None and idle_ttl_s < gap_s:
            raise ValueError(
                f"idle_ttl_s ({idle_ttl_s}) must be >= gap_s ({gap_s}): "
                "evicting inside the session gap would split live sessions"
            )
        self.gap_s = gap_s
        self.idle_ttl_s = idle_ttl_s
        # user_id -> {"last_ts": pd.Timestamp, "n_sessions": int, "n_events": int}
        self.state: dict = {}
        # user_id -> {"n_sessions": int, "n_events": int, "last_ts"} (evicted)
        self.closed: dict = {}
        self.max_ts = None
        self.late_reopens = 0

    def ingest(self, df: pd.DataFrame) -> int:
        df = df.sort_values(["ts", "event_id"])
        for user, g in df.groupby("user_id"):
            if user not in self.state and user in self.closed:
                prev = self.closed[user].get("last_ts")
                if (
                    prev is not None
                    and (g["ts"].iloc[0] - prev).total_seconds() <= self.gap_s
                ):
                    # out-of-order arrival after eviction: the no-TTL
                    # actor would have merged this into the evicted
                    # session — count the spurious re-open, don't hide it
                    self.late_reopens += 1
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
        if len(df):
            m = df["ts"].iloc[-1]
            self.max_ts = m if self.max_ts is None else max(self.max_ts, m)
        if self.idle_ttl_s is not None and self.max_ts is not None:
            cutoff = self.max_ts - pd.Timedelta(seconds=self.idle_ttl_s)
            for user in [
                u for u, s in self.state.items() if s["last_ts"] < cutoff
            ]:
                acc = self.closed.setdefault(
                    user, {"n_sessions": 0, "n_events": 0, "last_ts": None}
                )
                st = self.state.pop(user)
                acc["n_sessions"] += st["n_sessions"]
                acc["n_events"] += st["n_events"]
                acc["last_ts"] = st["last_ts"]  # kept for late-reopen detection
        return len(df)

    def open_count(self) -> int:
        """Size of the open-session map (bounded by TTL-active users)."""
        return len(self.state)

    def late_reopen_count(self) -> int:
        """Sessions opened by out-of-order events arriving within gap_s
        of an evicted user's last_ts — spurious vs the no-TTL actor."""
        return self.late_reopens

    def snapshot(self) -> pd.DataFrame:
        merged: dict = {
            u: {"n_events": s["n_events"], "n_sessions": s["n_sessions"]}
            for u, s in self.closed.items()
        }
        for u, s in self.state.items():
            acc = merged.setdefault(u, {"n_events": 0, "n_sessions": 0})
            acc["n_events"] += s["n_events"]
            acc["n_sessions"] += s["n_sessions"]
        rows = [
            {"user_id": u, "n_events": s["n_events"], "n_sessions": s["n_sessions"]}
            for u, s in merged.items()
        ]
        return pd.DataFrame(rows)


@ray.remote(num_cpus=0)
class TumblingWindowState:
    """Per-bucket incremental tumbling-window counter with an
    event-time WATERMARK and bounded lateness — the streaming-window
    semantics Ray Data lacks natively:

    - watermark = max event time seen at batch START minus
      ``allowed_lateness_s``;
    - an event at or after the watermark updates its window (in-order
      OR late-but-allowed — late data merges into the still-open
      window);
    - an event before the watermark is counted in ``late_dropped``
      (recorded, never silent — the repo's no-silent-truncation rule);
    - ``emit_closed()`` flushes windows whose END is below the
      watermark: each closed window is emitted exactly once — a kept
      event has ``ts >= watermark`` and a closed window has
      ``end <= watermark``, so a closed window can never be re-opened
      and actor state is bounded by the OPEN windows only (no
      grows-forever emitted-set bookkeeping)."""

    def __init__(self, window_s: float = 3600.0, allowed_lateness_s: float = 900.0):
        self.window_s = float(window_s)
        self.late_s = float(allowed_lateness_s)
        self.counts: dict = {}  # (key, window_start_epoch_s) -> n
        self.max_ts: float | None = None
        self.late_dropped = 0

    def ingest(self, df: pd.DataFrame, key_col: str = "user_id") -> int:
        ts_s = df["ts"].astype("int64").to_numpy() / 1e9
        wm = None if self.max_ts is None else self.max_ts - self.late_s
        ok = ts_s >= wm if wm is not None else ts_s == ts_s
        self.late_dropped += int((~ok).sum())
        kept = df[ok]
        kept_ts = ts_s[ok]
        if len(kept):
            wstart = (kept_ts // self.window_s) * self.window_s
            g = (
                pd.DataFrame({"k": kept[key_col].to_numpy(), "w": wstart})
                .groupby(["k", "w"])
                .size()
            )
            for (k, w), n in g.items():
                self.counts[(k, w)] = self.counts.get((k, w), 0) + int(n)
        if len(ts_s):
            m = float(ts_s.max())
            self.max_ts = m if self.max_ts is None else max(self.max_ts, m)
        return len(kept)

    def emit_closed(self) -> pd.DataFrame:
        if self.max_ts is None:
            return pd.DataFrame({"key": [], "window_start": [], "n": []})
        wm = self.max_ts - self.late_s
        rows = []
        for (k, w), n in list(self.counts.items()):
            if w + self.window_s <= wm:
                rows.append({"key": k, "window_start": w, "n": n})
                del self.counts[(k, w)]
        return pd.DataFrame(rows, columns=["key", "window_start", "n"])

    def snapshot_open(self) -> pd.DataFrame:
        rows = [
            {"key": k, "window_start": w, "n": n}
            for (k, w), n in self.counts.items()
        ]
        return pd.DataFrame(rows, columns=["key", "window_start", "n"])

    def stats(self) -> dict:
        return {"late_dropped": self.late_dropped, "max_ts": self.max_ts}


class IncrementalSessionizer:
    """Driver-side facade: routes micro-batches to key-hash bucket
    actors and merges snapshots."""

    def __init__(
        self,
        n_buckets: int = 4,
        gap_s: float = 1800.0,
        idle_ttl_s: float | None = None,
    ):
        self.n_buckets = n_buckets
        self.actors = [
            SessionState.remote(gap_s, idle_ttl_s) for _ in range(n_buckets)
        ]

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
