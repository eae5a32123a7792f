"""Numpy-backed Bloom filter for URL-seen membership.

The frontier's cross-shard fast path (SURVEY.md §7.5): a Bloom *may*
report false positives, so every shard backs it with an exact per-host
set — the Bloom prunes remote membership probes; it is never the source
of truth for dropping URLs (north_rule requires exact URL-seen match).

Double hashing (Kirsch–Mitzenmacher): h_i = h1 + i*h2 mod m, with h1/h2
from one blake2b digest — k probes from a single hash computation.
Batch add/contains are fully vectorized.  Serializable via
``to_bytes``/``from_bytes`` for checkpoints.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


def _hash_pair(items: list[str] | np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h1 = np.empty(len(items), dtype=np.uint64)
    h2 = np.empty(len(items), dtype=np.uint64)
    for i, s in enumerate(items):
        d = hashlib.blake2b(s.encode("utf-8"), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little") | 1  # odd → coprime stride
    return h1, h2


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        self.capacity = int(capacity)
        self.fp_rate = float(fp_rate)
        m = max(64, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = (m + 63) // 64 * 64
        self.k = max(1, round(self.m / capacity * math.log(2)))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)
        self.count = 0

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(n, k) bit positions."""
        i = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)

    def add_many(self, items: list[str]) -> None:
        if not items:
            return
        h1, h2 = _hash_pair(items)
        pos = self._positions(h1, h2).ravel()
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        self.count += len(items)

    def contains_many(self, items: list[str]) -> np.ndarray:
        if not items:
            return np.zeros(0, dtype=bool)
        h1, h2 = _hash_pair(items)
        pos = self._positions(h1, h2)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        bit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=1)

    def add(self, item: str) -> None:
        self.add_many([item])

    def __contains__(self, item: str) -> bool:
        return bool(self.contains_many([item])[0])

    # -- checkpointing -------------------------------------------------
    def to_bytes(self) -> bytes:
        header = f"{self.capacity},{self.fp_rate},{self.m},{self.k},{self.count}\n"
        return header.encode() + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "BloomFilter":
        nl = raw.index(b"\n")
        cap, fp, m, k, count = raw[:nl].decode().split(",")
        obj = cls.__new__(cls)
        obj.capacity = int(cap)
        obj.fp_rate = float(fp)
        obj.m = int(m)
        obj.k = int(k)
        obj.count = int(count)
        obj.bits = np.frombuffer(raw[nl + 1 :], dtype=np.uint64).copy()
        return obj
