"""HyperLogLog sketch: accuracy, mergeability, distributed operator."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from crawler_ray.functions.sketches import HyperLogLog, approx_distinct


def test_hll_accuracy_and_merge():
    h = HyperLogLog(p=12)
    h.add_many([f"user{i}" for i in range(20000)])
    est = h.estimate()
    assert abs(est - 20000) / 20000 < 0.05

    # mergeability: two halves == whole
    a = HyperLogLog(p=12).add_many([f"x{i}" for i in range(0, 10000)])
    b = HyperLogLog(p=12).add_many([f"x{i}" for i in range(5000, 15000)])
    a.merge(b)
    assert abs(a.estimate() - 15000) / 15000 < 0.05

    # serialization roundtrip
    c = HyperLogLog.from_bytes(a.to_bytes())
    assert c.estimate() == a.estimate()

    # duplicates don't inflate
    d = HyperLogLog(p=12).add_many(["same"] * 5000)
    assert d.estimate() < 3


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_operator():
    vals = [f"k{i % 3000}" for i in range(30000)]
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(8)
    est = approx_distinct(ds, "v", p=12)
    assert abs(est - 3000) / 3000 < 0.05


def test_misra_gries_guarantee():
    from collections import Counter

    from crawler_ray.functions.sketches import MisraGries

    # skewed stream: item "hot{i}" appears (1000 - 40*i) times
    stream = []
    for i in range(25):
        stream += [f"hot{i}"] * (1000 - 40 * i)
    stream += [f"tail{i}" for i in range(5000)]
    import random

    random.Random(7).shuffle(stream)
    n = len(stream)
    k = 32
    mg = MisraGries(k)
    # feed in chunks (exercises repeated trims)
    for i in range(0, n, 500):
        mg.add_many(stream[i : i + 500])
    exact = Counter(stream)
    bound = n / (k + 1)
    kept = dict(zip(*mg.to_items()))
    assert len(kept) <= k
    for item, c in exact.items():
        if c > bound:
            assert item in kept, f"{item} ({c} > {bound}) missing"
    # every kept count is a lower bound within the error bound
    for item, c in kept.items():
        assert c <= exact[item]
        assert exact[item] - c <= bound + 1e-9


def test_misra_gries_merge_matches_single_stream():
    from collections import Counter

    from crawler_ray.functions.sketches import MisraGries

    a_stream = ["x"] * 500 + ["y"] * 300 + [f"a{i}" for i in range(1000)]
    b_stream = ["x"] * 400 + ["z"] * 350 + [f"b{i}" for i in range(1000)]
    k = 16
    a = MisraGries(k).add_many(a_stream)
    b = MisraGries(k).add_many(b_stream)
    a.merge(b)
    n = len(a_stream) + len(b_stream)
    exact = Counter(a_stream + b_stream)
    bound = n / (k + 1)
    kept = dict(zip(*a.to_items()))
    assert len(kept) <= k
    for item, c in exact.items():
        if c > bound:
            assert item in kept
    for item, c in kept.items():
        assert c <= exact[item] and exact[item] - c <= bound + 1e-9


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_operator():
    from crawler_ray.functions.sketches import heavy_hitters

    rows = ["hot " * 50 + "cold"] * 40 + ["warm " * 25 + "cool"] * 40
    ds = rd.from_arrow(pa.table({"text": rows})).repartition(8)
    df = heavy_hitters(ds, "text", k=8, tokenize=lambda t: t.split())
    kept = dict(zip(df["item"], df["min_count"]))
    # 2000 "hot" + 1000 "warm" in 3080 tokens: both far over n/(k+1)
    assert "hot" in kept and "warm" in kept
    assert kept["hot"] <= 2000 and kept["warm"] <= 1000
    assert df["min_count"].is_monotonic_decreasing


def test_quantile_sketch_rank_error():
    """Rank error of quantile(q) within 2% of n at k=256 on 50k
    shuffled-uniform values (exact rank computed brute-force)."""
    from crawler_ray.functions.sketches import QuantileSketch

    rng = np.random.default_rng(3)
    vals = rng.permutation(np.arange(50_000, dtype=np.float64))
    s = QuantileSketch(k=256)
    for i in range(0, len(vals), 4096):
        s.add_many(vals[i : i + 4096])
    srt = np.sort(vals)
    n = len(vals)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = s.quantile(q)
        true_rank = q * n
        est_rank = np.searchsorted(srt, est, side="right")
        assert abs(est_rank - true_rank) <= 0.02 * n, (q, est_rank, true_rank)


def test_quantile_sketch_merge_matches_single_stream():
    """sketch(all) and merge(sketch(parts)) agree within the same rank
    bound — the mergeable-summaries contract that makes the sketch a
    valid map_batches partial."""
    from crawler_ray.functions.sketches import QuantileSketch

    rng = np.random.default_rng(7)
    vals = rng.normal(0, 100, size=30_000)
    whole = QuantileSketch(k=256).add_many(vals)
    merged = QuantileSketch(k=256)
    for i in range(0, len(vals), 3_000):
        merged.merge(QuantileSketch(k=256).add_many(vals[i : i + 3_000]))
    srt = np.sort(vals)
    n = len(vals)
    for q in (0.1, 0.5, 0.9):
        ra = np.searchsorted(srt, whole.quantile(q), side="right")
        rb = np.searchsorted(srt, merged.quantile(q), side="right")
        assert abs(ra - q * n) <= 0.03 * n
        assert abs(rb - q * n) <= 0.03 * n


@pytest.mark.usefixtures("ray_session")
def test_approx_quantiles_operator():
    """Distributed sketch quantiles within 3% rank error of the exact
    empirical quantiles of the events value column."""
    import pyarrow.parquet as pq

    from crawler_ray.functions.sketches import approx_quantiles

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(f"{sf}/events.parquet", columns=["value"]).repartition(8)
    got = approx_quantiles(ds, "value", [0.25, 0.5, 0.9], k=256)
    vals = np.sort(
        pq.read_table(f"{sf}/events.parquet", columns=["value"])["value"].to_numpy()
    )
    n = len(vals)
    for q, key in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
        est_rank = np.searchsorted(vals, got[key], side="right")
        assert abs(est_rank - q * n) <= 0.03 * n, (key, got[key])


def test_count_min_bounds_and_merge():
    """CM guarantees: estimate >= true count ALWAYS; estimate <=
    true + (e/width)*N for the test stream (width chosen so the bound
    bites); merging per-chunk sketches equals one single-pass sketch."""
    import math

    from crawler_ray.functions.sketches import CountMinSketch

    rng = np.random.default_rng(7)
    # zipf-ish stream over 500 items
    items = [f"tok{int(i)}" for i in rng.zipf(1.3, size=20_000) if i < 500]
    true = {}
    for it in items:
        true[it] = true.get(it, 0) + 1

    whole = CountMinSketch(width=512, depth=4)
    whole.add_many(items)
    eps_bound = math.e / 512 * whole.n
    over = 0
    for it, t in true.items():
        est = whole.estimate(it)
        assert est >= t, (it, est, t)  # one-sided guarantee is ALWAYS
        if est > t + eps_bound:
            over += 1
    # the upper bound is per-item probabilistic (holds w.p. 1 - e^-depth
    # ≈ 98.2% at depth 4): assert the failure RATE, not universality —
    # a universal assert would be hash-seed luck, brittle to any
    # innocuous _hash2 change
    assert over <= math.ceil(0.05 * len(true)), (over, len(true))

    merged = CountMinSketch(width=512, depth=4)
    for i in range(0, len(items), 3_000):
        part = CountMinSketch(width=512, depth=4)
        part.add_many(items[i : i + 3_000])
        merged.merge(part)
    assert np.array_equal(merged.table, whole.table)
    assert merged.n == whole.n


def test_cm_frequencies_operator(ray_session):
    """Distributed cm_frequencies over a Dataset matches the
    single-process sketch and upper-bounds exact counts."""
    import ray.data as rd

    from crawler_ray.functions.sketches import cm_frequencies

    texts = ["alpha beta alpha", "beta gamma", "alpha delta"] * 50
    ds = rd.from_items([{"text": t} for t in texts])
    got = cm_frequencies(
        ds, "text", ["alpha", "beta", "gamma", "delta", "absent"],
        tokenize=lambda t: t.split(),
    ).set_index("item")
    assert int(got.loc["alpha", "est_count"]) >= 150
    assert int(got.loc["beta", "est_count"]) >= 100
    assert int(got.loc["absent", "est_count"]) >= 0
    assert int(got["n_total"].iloc[0]) == 7 * 50
