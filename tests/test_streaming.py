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
