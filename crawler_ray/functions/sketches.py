"""Mergeable sketches: HyperLogLog approximate distinct counting.

Scale addition (not in the reference): per-batch sketches are emitted
inside ``map_batches`` and merged in a tiny reduce — the mergeable-
aggregate pattern the Ray guide prescribes for sketches.  Standard
public HLL (Flajolet et al.) with the small-range linear-counting
correction; registers are a numpy uint8 array (2^p bytes).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @staticmethod
    def _hash64(values) -> np.ndarray:
        out = np.empty(len(values), dtype=np.uint64)
        for i, v in enumerate(values):
            d = hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest()
            out[i] = int.from_bytes(d, "little")
        return out

    def add_many(self, values) -> "HyperLogLog":
        if len(values) == 0:
            return self
        h = self._hash64(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1 (≤ 64-p+1)
        ranks = np.zeros(len(h), dtype=np.uint8)
        shifted = rest
        for bit in range(64):
            mask = shifted >> np.uint64(63) == 0
            if not mask.any():
                break
            ranks[mask] += 1
            shifted = shifted << np.uint64(1)
            shifted[~mask] = np.uint64(1) << np.uint64(63)  # freeze finished
        ranks += 1
        np.maximum.at(self.registers, idx, ranks)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * math.log(m / zeros)  # linear counting
        return raw

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "HyperLogLog":
        obj = cls(p=raw[0])
        obj.registers = np.frombuffer(raw[1:], dtype=np.uint8).copy()
        return obj


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Distributed approximate COUNT(DISTINCT col): one HLL per batch,
    merged on the driver (sketches are tiny: 2^p bytes each)."""
    import pyarrow as pa

    def sketch(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p).add_many(batch[col].to_pylist())
        return pa.table({"sketch": pa.array([h.to_bytes()], type=pa.binary())})

    merged = HyperLogLog(p)
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        merged.merge(HyperLogLog.from_bytes(row["sketch"]))
    return merged.estimate()


class MisraGries:
    """Misra–Gries frequent-items sketch with capacity ``k``: after a
    stream of n items, every item with true count > n/(k+1) is
    guaranteed present, and each kept counter undercounts its true
    count by at most n/(k+1).  Sketches MERGE (sum counters, then
    subtract the (k+1)-th largest count and drop non-positives) with
    the same bound on the combined stream — the mergeable-summaries
    property (Agarwal et al., PODS'12) that makes the per-batch →
    tiny-reduce pipeline correct."""

    def __init__(self, k: int = 64):
        self.k = k
        self.counters: dict = {}

    def add_many(self, values) -> "MisraGries":
        from collections import Counter

        for v, n in Counter(values).items():
            self.counters[v] = self.counters.get(v, 0) + n
        self._trim()
        return self

    def _trim(self) -> None:
        if len(self.counters) <= self.k:
            return
        # subtract the (k+1)-th largest count: ≤ k counters survive
        d = sorted(self.counters.values(), reverse=True)[self.k]
        self.counters = {v: c - d for v, c in self.counters.items() if c > d}

    def merge(self, other: "MisraGries") -> "MisraGries":
        for v, n in other.counters.items():
            self.counters[v] = self.counters.get(v, 0) + n
        self._trim()
        return self

    def to_items(self) -> tuple[list, list]:
        items = sorted(self.counters.items(), key=lambda kv: (-kv[1], str(kv[0])))
        return [v for v, _ in items], [c for _, c in items]


def heavy_hitters(ds, col: str, k: int = 64, tokenize=None):
    """Distributed frequent-items: one Misra–Gries sketch per batch
    (``tokenize`` maps a cell to its items; identity when None), merged
    on the driver — each partial is ≤ k (item, count) pairs, so the
    collect is k × num_blocks rows regardless of corpus or vocabulary
    size.  Returns a pandas DataFrame (item, min_count) sorted by
    estimated frequency; min_count is the sketch's lower-bound count."""
    import json

    import pandas as pd
    import pyarrow as pa

    def sketch(batch: pa.Table) -> pa.Table:
        mg = MisraGries(k)
        for cell in batch[col].to_pylist():
            items = tokenize(cell) if tokenize else [cell]
            mg.add_many(items)
        vals, counts = mg.to_items()
        return pa.table(
            {"sketch": pa.array([json.dumps([vals, counts])], type=pa.string())}
        )

    merged = MisraGries(k)
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        vals, counts = json.loads(row["sketch"])
        other = MisraGries(k)
        other.counters = dict(zip(vals, counts))
        merged.merge(other)
    vals, counts = merged.to_items()
    return pd.DataFrame({"item": vals, "min_count": counts})


class QuantileSketch:
    """Mergeable quantile sketch (KLL-style levels with deterministic
    alternating compaction — public algorithm family: Karnin, Lang,
    Liberty, FOCS 2016; this is the simplified deterministic variant).

    Structure: ``levels[i]`` holds items of weight 2**i; when a level
    exceeds ``k`` items it is sorted and every other item (offset
    alternating per compaction, deterministic) is promoted to level
    i+1.  The alternating offset keeps the compaction unbiased in the
    long run while staying reproducible across runs and merge orders
    fed the same data order.

    Guarantees exercised by tests/test_sketches.py: rank error of
    ``quantile(q)`` within ~2/k of n on uniform data, and
    sketch(all) ≈ merge(sketch(parts)) within the same bound.  Use for
    streaming/mergeable percentiles; the EXACT path is the two-pass
    bucket histogram (pipelines.queries.q_price_quantiles)."""

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[list] = [[]]
        self._parity = 0
        self.n = 0

    def add_many(self, values) -> "QuantileSketch":
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        self.levels[0].extend(vals.tolist())
        self.n += len(vals)
        self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                buf = sorted(self.levels[i])
                off = self._parity & 1
                self._parity += 1
                promoted = buf[off::2]
                self.levels[i] = []
                if i + 1 == len(self.levels):
                    self.levels.append([])
                self.levels[i + 1].extend(promoted)
            i += 1

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        for i, items in enumerate(other.levels):
            while i >= len(self.levels):
                self.levels.append([])
            self.levels[i].extend(items)
        self.n += other.n
        self._compress()
        return self

    def quantile(self, q: float) -> float:
        items: list[tuple[float, int]] = []
        for i, level in enumerate(self.levels):
            w = 1 << i
            items.extend((v, w) for v in level)
        if not items:
            return float("nan")
        items.sort()
        total = sum(w for _, w in items)
        target = max(1, int(np.ceil(round(q * total, 9))))
        cum = 0
        for v, w in items:
            cum += w
            if cum >= target:
                return v
        return items[-1][0]

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps((self.k, self.levels, self._parity, self.n))

    @classmethod
    def from_bytes(cls, raw: bytes) -> "QuantileSketch":
        import pickle

        k, levels, parity, n = pickle.loads(raw)
        s = cls(k)
        s.levels, s._parity, s.n = levels, parity, n
        return s


def approx_quantiles(ds, col: str, qs: list[float], k: int = 256) -> dict:
    """Distributed approximate quantiles: one fixed-size
    ``QuantileSketch`` per block (map_batches partial), merged on the
    driver — the mergeable-summaries pattern (same shape as
    approx_distinct / heavy_hitters): the shuffle-free path for
    streaming percentiles over 100 TB."""

    def sketch(batch: pa.Table) -> pa.Table:
        s = QuantileSketch(k)
        s.add_many(batch[col].to_numpy(zero_copy_only=False))
        return pa.table({"blob": pa.array([s.to_bytes()], type=pa.binary())})

    merged = QuantileSketch(k)
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        merged.merge(QuantileSketch.from_bytes(row["blob"]))
    return {f"p{int(q * 100)}": merged.quantile(q) for q in qs}


class CountMinSketch:
    """Count-Min frequency sketch (Cormode & Muthukrishnan): ``depth``
    independent rows of ``width`` counters; point estimate = min over
    rows.  Guarantees (for non-negative counts): estimate ≥ true count
    ALWAYS; estimate ≤ true + (e/width)·N with probability
    1 − e^−depth.  Mergeable by elementwise add (same dims required),
    so per-block sketches reduce to one — the same
    mergeable-summaries pattern as HyperLogLog / MisraGries /
    QuantileSketch; this member answers POINT queries the others
    can't (MG only tracks the k heaviest)."""

    def __init__(self, width: int = 2048, depth: int = 4):
        self.width = width
        self.depth = depth
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.n = 0  # total added count (for the error bound)

    @staticmethod
    def _hash2(items) -> tuple[np.ndarray, np.ndarray]:
        # two independent keyed 64-bit hashes per item, fully
        # vectorized (a per-token Python digest loop would dominate the
        # sketch stage at corpus scale); double hashing base + r·step
        # gives the depth row functions
        import pandas as pd

        # categorize=False: pandas 2.2's categorize path is value-
        # UNSTABLE on object arrays — a sketch hashed with it would not
        # merge correctly across processes
        arr = np.asarray([str(x) for x in items], dtype=object)
        base = pd.util.hash_array(
            arr, hash_key="cm-base-hash-key!"[:16], categorize=False
        )
        step = pd.util.hash_array(
            arr, hash_key="cm-step-hash-key!"[:16], categorize=False
        )
        return base, step | np.uint64(1)  # odd step → full period

    def add_many(self, items) -> None:
        if not len(items):
            return
        base, step = self._hash2(items)
        w = np.uint64(self.width)
        # uint64 wraparound is the intended modular arithmetic
        with np.errstate(over="ignore"):
            for r in range(self.depth):
                cols = ((base + np.uint64(r) * step) % w).astype(np.int64)
                np.add.at(self.table[r], cols, 1)
        self.n += len(items)

    def estimate(self, item) -> int:
        base, step = self._hash2([item])
        w = np.uint64(self.width)
        with np.errstate(over="ignore"):
            return int(
                min(
                    self.table[r][int((base + np.uint64(r) * step)[0] % w)]
                    for r in range(self.depth)
                )
            )

    def merge(self, other: "CountMinSketch") -> None:
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("CountMinSketch dims must match to merge")
        self.table += other.table
        self.n += other.n

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps((self.width, self.depth, self.table, self.n))

    @classmethod
    def from_bytes(cls, raw: bytes) -> "CountMinSketch":
        import pickle

        width, depth, table, n = pickle.loads(raw)
        s = cls(width, depth)
        s.table, s.n = table, n
        return s


def cm_frequencies(
    ds, col: str, items: list, *, width: int = 2048, depth: int = 4, tokenize=None
):
    """Distributed Count-Min point-frequency estimates: one sketch per
    block (map_batches partial, width×depth ints each), merged on the
    driver, then queried for ``items``.  The collect is
    O(width·depth·blocks) bytes regardless of corpus or vocabulary
    size.  Returns a pandas DataFrame (item, est_count, n_total)."""
    import pandas as pd

    def sketch(batch: pa.Table) -> pa.Table:
        s = CountMinSketch(width, depth)
        for cell in batch[col].to_pylist():
            s.add_many(tokenize(cell) if tokenize else [cell])
        return pa.table({"blob": pa.array([s.to_bytes()], type=pa.binary())})

    merged = CountMinSketch(width, depth)
    for row in ds.map_batches(sketch, batch_format="pyarrow").take_all():
        merged.merge(CountMinSketch.from_bytes(row["blob"]))
    return pd.DataFrame(
        {
            "item": [str(i) for i in items],
            "est_count": [merged.estimate(i) for i in items],
            "n_total": [merged.n] * len(items),
        }
    )
