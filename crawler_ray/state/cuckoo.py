"""Cuckoo filter: approximate membership *with deletion*.

The frontier uses it where URLs must be retractable — e.g. a fetch that
permanently fails after retries is removed so a later re-discovery can
requeue it (a Bloom filter cannot delete).  Standard design (Fan et al.,
"Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014, public):
4-slot buckets, 16-bit fingerprints, partial-key cuckoo hashing with
bounded eviction kicks.
"""

from __future__ import annotations

import hashlib

import numpy as np

_EMPTY = np.uint16(0)
_MAX_KICKS = 500


def _fingerprint_and_index(item: str, n_buckets: int) -> tuple[int, int]:
    d = hashlib.blake2b(item.encode("utf-8"), digest_size=16).digest()
    fp = (int.from_bytes(d[:2], "little") % 0xFFFF) + 1  # never 0
    idx = int.from_bytes(d[2:10], "little") % n_buckets
    return fp, idx


def _alt_index(idx: int, fp: int, n_buckets: int) -> int:
    h = int.from_bytes(
        hashlib.blake2b(fp.to_bytes(2, "little"), digest_size=8).digest(), "little"
    )
    return (idx ^ h) % n_buckets


class CuckooFilter:
    def __init__(self, capacity: int, bucket_size: int = 4, seed: int = 7):
        n_buckets = 1
        while n_buckets * bucket_size < capacity * 1.1:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.bucket_size = bucket_size
        self.table = np.zeros((n_buckets, bucket_size), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(seed)

    def _try_put(self, idx: int, fp: int) -> bool:
        row = self.table[idx]
        empties = np.nonzero(row == _EMPTY)[0]
        if empties.size:
            row[empties[0]] = fp
            return True
        return False

    def add(self, item: str) -> bool:
        fp, i1 = _fingerprint_and_index(item, self.n_buckets)
        i2 = _alt_index(i1, fp, self.n_buckets)
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            self.count += 1
            return True
        idx = i1 if self._rng.integers(2) else i2
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(self.bucket_size))
            fp, self.table[idx, slot] = int(self.table[idx, slot]), fp
            idx = _alt_index(idx, fp, self.n_buckets)
            if self._try_put(idx, fp):
                self.count += 1
                return True
        return False  # table full

    def __contains__(self, item: str) -> bool:
        fp, i1 = _fingerprint_and_index(item, self.n_buckets)
        i2 = _alt_index(i1, fp, self.n_buckets)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def remove(self, item: str) -> bool:
        fp, i1 = _fingerprint_and_index(item, self.n_buckets)
        for idx in (i1, _alt_index(i1, fp, self.n_buckets)):
            hits = np.nonzero(self.table[idx] == fp)[0]
            if hits.size:
                self.table[idx, hits[0]] = _EMPTY
                self.count -= 1
                return True
        return False

    # -- checkpointing -------------------------------------------------
    def to_bytes(self) -> bytes:
        header = f"{self.n_buckets},{self.bucket_size},{self.count}\n"
        return header.encode() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "CuckooFilter":
        nl = raw.index(b"\n")
        nb, bs, count = (int(x) for x in raw[:nl].decode().split(","))
        obj = cls.__new__(cls)
        obj.n_buckets = nb
        obj.bucket_size = bs
        obj.count = count
        obj.table = (
            np.frombuffer(raw[nl + 1 :], dtype=np.uint16).reshape(nb, bs).copy()
        )
        obj._rng = np.random.default_rng(7)
        return obj
