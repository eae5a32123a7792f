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
