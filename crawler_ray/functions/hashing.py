"""Hashing kernels: content hashes, shingles, MinHash, SimHash,
rolling fingerprints.

``content_sha256`` reproduces the reference ledger hash
(src/feedback/processed_ledger.py:35-36: sha256 of utf-8 text).  The
sketch kernels (MinHash/SimHash/fingerprints) are new scale operators
(SURVEY.md §2.5 note): all hashing is deterministic (blake2b — no
process-seeded ``hash()``) so signatures are stable across workers,
and the per-permutation MinHash math is vectorized with numpy.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WORD = re.compile(r"\w+", re.UNICODE)

_MERSENNE61 = np.uint64((1 << 61) - 1)


def content_sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def content_md5(text: str) -> str:
    """md5 hex — used for oracle-SQL-comparable dedup keys (DuckDB md5())."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def stable_hash64(s: str) -> int:
    """Deterministic 64-bit hash of a string (blake2b, 8-byte digest)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


def tokens_of(text: str) -> list[str]:
    return _WORD.findall(text.lower())


def word_shingles(text: str, n: int = 3) -> list[str]:
    """Word n-gram shingles (lowercased)."""
    toks = tokens_of(text)
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def char_shingles(text: str, n: int = 5) -> list[str]:
    t = text.lower()
    if len(t) < n:
        return [t] if t else []
    return [t[i : i + n] for i in range(len(t) - n + 1)]


def shingle_hashes(text: str, n: int = 3, kind: str = "word") -> np.ndarray:
    """Unique 64-bit shingle hashes of a document (sorted uint64)."""
    shingles = word_shingles(text, n) if kind == "word" else char_shingles(text, n)
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    h = np.fromiter(
        (stable_hash64(s) for s in set(shingles)), dtype=np.uint64, count=len(set(shingles))
    )
    h.sort()
    return h


class MinHasher:
    """k-permutation MinHash over 64-bit shingle hashes.

    Universal hashing h_i(x) = (a_i * x + b_i) mod (2^61 - 1), with
    (a_i, b_i) drawn from a fixed seed so every worker computes the
    identical signature.  The permutation sweep is a (k × n) numpy
    broadcast — no Python loop over shingles.
    """

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, int(_MERSENNE61), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE61), size=num_perm, dtype=np.uint64)

    def signature(self, shingle_h: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 signature; all-max for empty docs."""
        if shingle_h.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (k, n) = a[:,None]*x[None,:] + b  — modular arithmetic in uint64
        # wraps mod 2^64; (2^64 mod p) correction is unnecessary for
        # MinHash quality, but we reduce mod p for well-distributed mins.
        prod = self.a[:, None] * shingle_h[None, :] + self.b[:, None]
        prod %= _MERSENNE61
        return prod.min(axis=1)

    def band_keys(self, sig: np.ndarray, num_bands: int) -> list[str]:
        """LSH band bucket keys: ``{band}:{hexdigest of band rows}``."""
        rows = self.num_perm // num_bands
        keys = []
        for band in range(num_bands):
            chunk = sig[band * rows : (band + 1) * rows]
            digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            keys.append(f"{band}:{digest}")
        return keys


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique uint64 shingle-hash arrays."""
    if a.size == 0 and b.size == 0:
        return 1.0
    if a.size == 0 or b.size == 0:
        return 0.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    return inter / (a.size + b.size - inter)


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens weighted by term frequency."""
    toks = tokens_of(text)
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    hashes = np.fromiter(
        (stable_hash64(t) for t in uniq), dtype=np.uint64, count=len(uniq)
    )
    bits = np.unpackbits(hashes.view(np.uint8)).reshape(len(uniq), 64)
    votes = (bits.astype(np.int64) * 2 - 1) * counts[:, None]
    col = votes.sum(axis=0) > 0
    return int(np.packbits(col.astype(np.uint8)).view(np.uint64)[0])


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str, window: int = 8, keep: int = 16) -> list[int]:
    """Winnowing-style document fingerprint: Karp-Rabin rolling hash over
    word tokens in windows of ``window``, keeping the ``keep`` smallest
    window hashes (sorted) — a compact, order-insensitive digest that
    survives small edits."""
    toks = tokens_of(text)
    if not toks:
        return []
    th = np.fromiter((stable_hash64(t) for t in toks), dtype=np.uint64, count=len(toks))
    if th.size <= window:
        return [int(hashlib.blake2b(th.tobytes(), digest_size=8).hexdigest(), 16)]
    base = np.uint64(1000003)
    powers = np.empty(window, dtype=np.uint64)
    powers[0] = 1
    with np.errstate(over="ignore"):
        for i in range(1, window):
            powers[i] = powers[i - 1] * base  # wraps mod 2^64 by design
        # windowed dot product with the power ladder (stride trick)
        strided = np.lib.stride_tricks.sliding_window_view(th, window)
        wh = (strided * powers[::-1]).sum(axis=1)
    wh = np.unique(wh)
    return [int(x) for x in wh[: min(keep, wh.size)]]
