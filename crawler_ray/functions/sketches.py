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
