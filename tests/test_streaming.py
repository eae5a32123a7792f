"""Incremental sessionization equals the batch sessionize query when
the log is fed in ts-ordered micro-batches."""

import pandas as pd
import pytest

from crawler_ray.pipelines.queries import q_sessionize
from crawler_ray.stages.streaming import IncrementalSessionizer


@pytest.mark.usefixtures("ray_session")
def test_incremental_matches_batch():
    sf = "/root/testdata/sf0.001"
    batch_answer = (
        q_sessionize(sf).to_pandas().sort_values("user_id").reset_index(drop=True)
    )

    events = pd.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).sort_values(["ts", "event_id"])
    inc = IncrementalSessionizer(n_buckets=3)
    # feed the ordered log in 7 uneven chunks
    n = len(events)
    cuts = [0, n // 7, n // 3, n // 2, 2 * n // 3, 5 * n // 6, n - 3, n]
    for a, b in zip(cuts, cuts[1:]):
        if b > a:
            inc.ingest_batch(events.iloc[a:b])
    snap = inc.snapshot()
    snap["user_id"] = snap["user_id"].astype(batch_answer["user_id"].dtype)
    snap["n_events"] = snap["n_events"].astype(batch_answer["n_events"].dtype)
    snap["n_sessions"] = snap["n_sessions"].astype(batch_answer["n_sessions"].dtype)
    pd.testing.assert_frame_equal(snap, batch_answer)


def test_tumbling_window_watermark(ray_session):
    import ray

    from crawler_ray.stages.streaming import TumblingWindowState

    actor = TumblingWindowState.remote(window_s=60.0, allowed_lateness_s=30.0)

    def mk(rows):
        df = pd.DataFrame(rows, columns=["user_id", "ts_s"])
        df["ts"] = pd.to_datetime(df["ts_s"], unit="s")
        return df[["user_id", "ts"]]

    # in-order batch: two windows for user 1
    ray.get(actor.ingest.remote(mk([(1, 10), (1, 20), (1, 70)])))
    # late-but-allowed: ts=50 >= watermark (70-30=40) → merges into [0,60)
    ray.get(actor.ingest.remote(mk([(1, 50), (1, 130)])))
    # too late: ts=20 < watermark (130-30=100) → recorded drop
    ray.get(actor.ingest.remote(mk([(1, 20), (1, 200)])))

    closed = ray.get(actor.emit_closed.remote())
    open_ = ray.get(actor.snapshot_open.remote())
    stats = ray.get(actor.stats.remote())

    assert stats["late_dropped"] == 1
    got = {
        (int(r["key"]), int(r["window_start"])): int(r["n"])
        for _, r in pd.concat([closed, open_], ignore_index=True).iterrows()
    }
    # [0,60): events at 10,20,50 (late 20 dropped, allowed 50 merged)
    # [60,120): 70; [120,180): 130; [180,240): 200
    assert got == {(1, 0): 3, (1, 60): 1, (1, 120): 1, (1, 180): 1}
    # closed windows are exactly those ending below watermark 170
    closed_keys = {int(w) for w in closed["window_start"]}
    assert closed_keys == {0, 60}
    # emit is exactly-once: a second emit returns nothing new
    again = ray.get(actor.emit_closed.remote())
    assert len(again) == 0


def test_tumbling_window_matches_batch_when_in_order(ray_session):
    import numpy as np
    import ray

    from crawler_ray.stages.streaming import TumblingWindowState

    rng = np.random.default_rng(9)
    n = 2000
    ts = np.sort(rng.integers(0, 50_000, size=n))
    users = rng.integers(0, 7, size=n)
    df = pd.DataFrame({"user_id": users, "ts": pd.to_datetime(ts, unit="s")})

    actor = TumblingWindowState.remote(window_s=3600.0, allowed_lateness_s=0.0)
    for i in range(0, n, 300):  # ordered micro-batches
        ray.get(actor.ingest.remote(df.iloc[i : i + 300]))
    inc = pd.concat(
        [ray.get(actor.emit_closed.remote()), ray.get(actor.snapshot_open.remote())],
        ignore_index=True,
    )
    batch = (
        df.assign(w=(ts // 3600) * 3600)
        .groupby(["user_id", "w"])
        .size()
        .reset_index(name="n")
    )
    inc_map = {
        (int(r["key"]), int(r["window_start"])): int(r["n"]) for _, r in inc.iterrows()
    }
    batch_map = {
        (int(r["user_id"]), int(r["w"])): int(r["n"]) for _, r in batch.iterrows()
    }
    assert inc_map == batch_map
    assert ray.get(actor.stats.remote())["late_dropped"] == 0


def test_session_ttl_eviction_bounded_and_exact(ray_session):
    """A long log of mostly one-shot users: with idle_ttl_s the open
    map stays bounded by TTL-active users while the snapshot still
    equals the no-TTL answer exactly (emit-on-evict, ttl >= gap)."""
    import numpy as np
    import ray

    from crawler_ray.stages.streaming import SessionState

    rng = np.random.default_rng(11)
    rows = []
    # 300 one-shot users spread over 30000s, plus one recurring user
    for i in range(300):
        rows.append((1000 + i, i * 100))
    for t in range(0, 30000, 500):
        rows.append((7, t))
    rows.sort(key=lambda r: r[1])
    df = pd.DataFrame(rows, columns=["user_id", "ts_s"])
    df["ts"] = pd.to_datetime(df["ts_s"], unit="s")
    df["event_id"] = range(len(df))
    df = df[["user_id", "ts", "event_id"]]

    plain = SessionState.remote(gap_s=600.0)
    ttl = SessionState.remote(gap_s=600.0, idle_ttl_s=1200.0)
    for i in range(0, len(df), 40):  # ts-ordered micro-batches
        chunk = df.iloc[i : i + 40]
        ray.get([plain.ingest.remote(chunk), ttl.ingest.remote(chunk)])

    open_n = ray.get(ttl.open_count.remote())
    # TTL-active users at the end: a handful, never all 301
    assert open_n <= 30, open_n
    a = ray.get(plain.snapshot.remote()).sort_values("user_id").reset_index(drop=True)
    b = ray.get(ttl.snapshot.remote()).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_session_ttl_below_gap_rejected(ray_session):
    import ray
    import pytest as _pytest

    from crawler_ray.stages.streaming import SessionState

    actor = SessionState.remote(gap_s=600.0, idle_ttl_s=60.0)
    with _pytest.raises(ray.exceptions.RayActorError):
        ray.get(actor.ingest.remote(pd.DataFrame(
            {"user_id": [1], "ts": [pd.Timestamp("2024-01-01")], "event_id": [0]}
        )))
