"""Document fingerprinting via winnowing (rolling k-gram hashes).

Public algorithm: Schleimer, Wilkerson, Aiken, "Winnowing: Local
Algorithms for Document Fingerprinting" (SIGMOD 2003) — the MOSS
scheme.  The reference crawler has only whole-document sha256
(processed_ledger.py:35-41); winnowing is the sub-document fingerprint
a training-data pipeline needs for partial-overlap detection (quote
reuse, boilerplate plagiarism, near-dup candidates).

Guarantee (SIGMOD 2003, Thm 1 shape): any substring match of length at
least ``w + k - 1`` normalized characters between two documents yields
at least one SHARED fingerprint; conversely no fingerprint is selected
from a window the text does not contain.  Density: ~2/(w+1) of all
k-gram hashes are kept.

Determinism: the rolling hash is a degree-(k-1) polynomial over the
utf-8 bytes with odd base ``_BASE`` mod 2**64 (numpy uint64 wrapping IS
the modulus — fully vectorized, no Python loop over characters); the
winnowing rule picks the RIGHTMOST minimal hash of each window (the
paper's robust-winnowing tie rule), so fingerprints are reproducible
across runs, machines and partitionings.
"""

from __future__ import annotations

import re

import numpy as np

K_GRAM = 8  # k-gram length in normalized characters (utf-8 bytes)
WINDOW = 4  # winnowing window: guarantee length = WINDOW + K_GRAM - 1
_BASE = np.uint64(1000003)

_WS = re.compile(r"\s+")


def normalize_for_fingerprint(text: str) -> str:
    """Lowercase + collapse all whitespace runs to one space (the usual
    winnowing pre-pass so formatting changes don't shift k-grams)."""
    return _WS.sub(" ", (text or "").lower()).strip()


def _kgram_hashes(b: np.ndarray, k: int) -> np.ndarray:
    """All k-gram polynomial hashes of a uint8 byte array, mod 2**64.

    h[i] = sum_j b[i+j] * BASE^(k-1-j); computed as k shifted
    vector multiply-adds (k is small), never a per-char Python loop."""
    m = len(b) - k + 1
    h = np.zeros(m, dtype=np.uint64)
    pw = 1  # Python int, masked to 64 bits (scalar uint64 mul warns on wrap)
    # accumulate from the last k-gram byte backwards so pw = BASE^(k-1-j)
    for j in range(k - 1, -1, -1):
        h += b[j : j + m].astype(np.uint64) * np.uint64(pw)
        pw = (pw * int(_BASE)) & 0xFFFFFFFFFFFFFFFF
    return h


def winnow_fingerprints(
    text: str, k: int = K_GRAM, w: int = WINDOW
) -> np.ndarray:
    """Sorted unique winnowing fingerprints (uint64) of ``text``.

    Documents shorter than ``k`` normalized characters have no k-gram
    and return an empty set (recorded, not an error — the caller's
    n_fps column makes the degenerate case visible)."""
    norm = normalize_for_fingerprint(text)
    b = np.frombuffer(norm.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        return np.empty(0, dtype=np.uint64)
    h = _kgram_hashes(b, k)
    m = len(h)
    if m <= w:
        # fewer hashes than one window: keep the rightmost minimum
        i = m - 1 - int(np.argmin(h[::-1]))
        return np.unique(h[i : i + 1])
    wins = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost minimal hash per window (robust winnowing tie rule)
    right_arg = (w - 1) - np.argmin(wins[:, ::-1], axis=1)
    pos = np.unique(np.arange(m - w + 1) + right_arg)
    return np.unique(h[pos])


def fingerprint_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Resemblance of two fingerprint sets: |A∩B| / |A∪B| (0.0 when
    both are empty)."""
    if len(a) == 0 and len(b) == 0:
        return 0.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0
