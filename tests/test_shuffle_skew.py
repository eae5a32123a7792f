"""Skew utilities + hot-host crawl conformance."""

import pyarrow as pa
import pytest

import ray.data as rd

from crawler_ray.conformance.reference_bfs import crawl_site_reference
from crawler_ray.pipelines.crawl import CrawlEngine
from crawler_ray.sources.synth import demo_web, seeds_table
from crawler_ray.stages.shuffle import (
    add_salted_key,
    colocate_by,
    hot_keys_above,
    key_histogram,
)


@pytest.mark.usefixtures("ray_session")
def test_key_histogram_and_salting():
    keys = ["hot"] * 900 + [f"k{i}" for i in range(100)]
    ds = rd.from_arrow(pa.table({"host": keys, "v": list(range(1000))}))
    hist = {r["host"]: r["n_rows"] for r in key_histogram(ds, "host").take_all()}
    assert hist["hot"] == 900
    hot = hot_keys_above(ds, "host", fraction=0.5)
    assert hot == ["hot"]

    salted = add_salted_key(ds, "host", n_salt=8, hot_keys=hot)
    sk = salted.to_pandas()["salted_key"]
    hot_parts = sk[sk.str.startswith("hot#")].nunique()
    cold_parts = sk[~sk.str.startswith("hot#")].nunique()
    assert hot_parts > 1  # hot key fanned out
    assert all(s.endswith("#0") for s in sk[~sk.str.startswith("hot#")])

    # co-location: every output group holds exactly one salted key
    grouped = colocate_by(salted, "salted_key")
    assert grouped.count() == 1000


@pytest.mark.usefixtures("ray_session")
def test_hot_host_crawl_conformance():
    """One host holds ~50% of all URLs (SURVEY §7.7 skew fixture): the
    engine still matches the oracle exactly and makes progress on the
    cold hosts every wave (politeness bounds the hot host per wave)."""
    web = demo_web(n_sites=3, n_pages=60, seed=13, hot_host=True)
    seeds = seeds_table(web, max_pages=30).to_pylist()
    golden = {
        s["site_identifier"]: crawl_site_reference(web, s) for s in seeds
    }
    eng = CrawlEngine(web, seeds, num_shards=2)
    eng.run()
    for s in seeds:
        site = s["site_identifier"]
        assert eng.url_seen(site) == golden[site]["url_seen"]


def test_skew_aware_join_matches_plain(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.joins import bucketed_hash_join, skew_aware_hash_join

    rng = np.random.default_rng(5)
    # hot key "h" holds half the left rows
    lk = ["h"] * 500 + [f"k{i % 40}" for i in range(500)]
    left = rd.from_arrow(
        pa.table({"k": pa.array(lk, type=pa.string()),
                  "lv": pa.array(rng.integers(0, 100, len(lk)), type=pa.int64())})
    ).repartition(6)
    rk = ["h", "h"] + [f"k{i}" for i in range(40)]
    right = rd.from_arrow(
        pa.table({"k": pa.array(rk, type=pa.string()),
                  "rv": pa.array(rng.integers(0, 100, len(rk)), type=pa.int64())})
    ).repartition(3)
    ls = pa.schema([("k", pa.string()), ("lv", pa.int64())])
    rs = pa.schema([("k", pa.string()), ("rv", pa.int64())])

    def canon(ds):
        df = ds.to_pandas()
        for c in ("lv", "rv"):
            df[c] = df[c].astype("int64")
        return df.sort_values(["k", "lv", "rv"]).reset_index(drop=True)

    plain = canon(bucketed_hash_join(left, right, key="k",
                                     left_schema=ls, right_schema=rs))
    skew = canon(skew_aware_hash_join(left, right, key="k", hot_fraction=0.2,
                                      left_schema=ls, right_schema=rs))
    # the hot key fans out: 500 left x 2 right = 1000 rows for "h" alone
    assert (plain["k"] == "h").sum() == 1000
    pd.testing.assert_frame_equal(plain, skew)


def test_skew_aware_join_no_hot_keys_falls_back(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.joins import skew_aware_hash_join

    left = rd.from_arrow(
        pa.table({"k": pa.array(["a", "b", "c", "d", "e"], type=pa.string()),
                  "lv": pa.array([1, 2, 3, 4, 5], type=pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array(["b", "d"], type=pa.string()),
                  "rv": pa.array([20, 40], type=pa.int64())})
    )
    ls = pa.schema([("k", pa.string()), ("lv", pa.int64())])
    rs = pa.schema([("k", pa.string()), ("rv", pa.int64())])
    out = skew_aware_hash_join(left, right, key="k", hot_fraction=0.5,
                               left_schema=ls, right_schema=rs).to_pandas()
    assert sorted(out["k"]) == ["b", "d"]


def test_skew_join_empty_hot_right_falls_back(ray_session):
    """Left has a hot key the right side has NO rows for: the hot-side
    scan yields zero batches — must fall back to the plain bucketed
    join (exact: hot rows simply find no partner), not crash on
    pa.concat_tables([])."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.joins import skew_aware_hash_join

    lk = ["h"] * 50 + ["a", "b"]
    left = rd.from_arrow(
        pa.table({"k": pa.array(lk, type=pa.string()),
                  "lv": pa.array(list(range(len(lk))), type=pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array(["a", "b"], type=pa.string()),
                  "rv": pa.array([10, 20], type=pa.int64())})
    )
    ls = pa.schema([("k", pa.string()), ("lv", pa.int64())])
    rs = pa.schema([("k", pa.string()), ("rv", pa.int64())])
    out = skew_aware_hash_join(left, right, key="k", hot_fraction=0.3,
                               left_schema=ls, right_schema=rs).to_pandas()
    assert sorted(out["k"]) == ["a", "b"]


def test_skew_join_broadcast_budget_raises(ray_session):
    """An oversized hot-key RIGHT side must raise with salt-the-key
    guidance instead of concatenating onto the driver — the enforced
    form of the small-hot-right partitioning assumption."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from crawler_ray.stages.joins import skew_aware_hash_join

    n = 2000
    left = rd.from_arrow(
        pa.table({"k": pa.array(["h"] * 100 + ["c"] * 50, type=pa.string()),
                  "lv": pa.array(list(range(150)), type=pa.int64())})
    )
    # hot right side ~1.6 MB, budget 1 MB → must raise
    right = rd.from_arrow(
        pa.table({"k": pa.array(["h"] * n + ["c"], type=pa.string()),
                  "payload": pa.array(["x" * 800] * (n + 1), type=pa.string())})
    )
    ls = pa.schema([("k", pa.string()), ("lv", pa.int64())])
    rs = pa.schema([("k", pa.string()), ("payload", pa.string())])
    with _pytest.raises(ValueError, match="salt the key"):
        skew_aware_hash_join(
            left, right, key="k", hot_fraction=0.3,
            left_schema=ls, right_schema=rs,
            broadcast_budget_bytes=1 << 20,
        )


def test_salted_key_round_robins_hot_occurrences(ray_session):
    """The salt must vary across a hot key's occurrences (round-robin
    balance) and be deterministic across runs — the round-3 seed reused
    one salt sequence for equal-sized batches."""
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.shuffle import add_salted_key

    keys = ["hot"] * 800 + [f"k{i}" for i in range(200)]
    ds = rd.from_arrow(pa.table({"host": keys, "v": list(range(1000))}))
    out1 = add_salted_key(ds, "host", n_salt=8, hot_keys=["hot"]).to_pandas()
    out2 = add_salted_key(ds, "host", n_salt=8, hot_keys=["hot"]).to_pandas()
    assert (out1["salted_key"] == out2["salted_key"]).all()  # deterministic
    counts = out1.loc[
        out1["salted_key"].str.startswith("hot#"), "salted_key"
    ].value_counts()
    assert len(counts) == 8  # all sub-keys used
    assert counts.max() - counts.min() <= 8  # near-perfect balance
