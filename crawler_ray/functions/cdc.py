"""Content-defined chunking (CDC) with a gear rolling hash.

Public method: FastCDC / gear-hash chunking (Xia et al., USENIX ATC
2016, "FastCDC: a Fast and Efficient Content-Defined Chunking Approach
for Data Deduplication") — chunk boundaries are placed where a rolling
hash of the trailing bytes matches a mask, so boundaries (and
therefore chunk hashes) RESYNCHRONIZE after an insertion or deletion.
That is the property fixed-window schemes (the ExactSubstr operator's
64-char stride grid) lack: inserting one byte early in a document
shifts every downstream fixed window, but leaves all CDC chunks beyond
the edited one bit-identical — storage-style dedup survives edits.

The gear recurrence is ``h_i = (h_{i-1} << 1) + gear[b_i]`` over
uint64.  Because ``<< 64`` vanishes mod 2^64, ``h_i`` depends on
exactly the trailing 64 bytes::

    h_i = Σ_{j=0}^{63} gear[b_{i-j}] << j      (mod 2^64)

which this module evaluates VECTORIZED: one table lookup plus 64
shift-and-add passes over the whole byte array (numpy uint64, wrapping
arithmetic) — no per-byte Python in the hot path.  Boundary selection
(min/max enforcement) walks the ~n/avg_size candidate positions, not
the bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np

# deterministic 256-entry gear table (seeded once; any fixed random
# table works — the published method only needs it fixed and uniform)
GEAR = np.random.RandomState(0x5EED).randint(
    0, 2**64, size=256, dtype=np.uint64
)

# defaults sized for the short synthetic documents (48–553 chars at
# the test SFs): ~64-byte average chunks, 32/256 floor/ceiling.  A
# 100 TB deployment uses the paper's KB-scale settings (e.g. mask
# 0x1FFF ≈ 8 KiB average, 2 KiB min, 64 KiB max) — results change,
# the algorithm does not.
CDC_MASK = np.uint64(0x3F)
CDC_MIN = 32
CDC_MAX = 256


def gear_hashes(data: np.ndarray) -> np.ndarray:
    """Exact gear rolling hash at EVERY position of a uint8 array,
    vectorized (64 shift-add passes; see module docstring for why the
    64-term truncation is exact, not approximate)."""
    g = GEAR[data]
    n = len(g)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(64):
        if j >= n:
            break
        h[j:] += g[: n - j] << np.uint64(j)
    return h


def cdc_boundaries(
    data: bytes,
    mask: np.uint64 = CDC_MASK,
    min_size: int = CDC_MIN,
    max_size: int = CDC_MAX,
) -> list[int]:
    """Chunk END offsets (exclusive) for ``data``: a boundary lands
    after position ``i`` when ``h_i & mask == 0``, subject to
    ``min_size``/``max_size``; a chunk that reaches ``max_size`` is
    force-cut (the standard CDC cap), and the tail always closes the
    final chunk.  The walk is over candidate positions (≈ n/2^maskbits
    of them), not bytes."""
    n = len(data)
    if n == 0:
        return []
    arr = np.frombuffer(data, dtype=np.uint8)
    cand = np.nonzero((gear_hashes(arr) & mask) == 0)[0]
    ends: list[int] = []
    pos = 0
    while pos < n:
        lo, hi = pos + min_size, pos + max_size
        ci = int(np.searchsorted(cand, lo - 1))
        if ci < len(cand) and cand[ci] + 1 <= hi:
            cut = int(cand[ci]) + 1  # first in-window content match
        else:
            cut = min(hi, n)  # force-cut at the cap (or close the tail)
        ends.append(cut)
        pos = cut
    return ends


def cdc_chunk_hashes(text: str) -> list[str]:
    """md5 hex of each CDC chunk of ``text`` (utf-8 bytes)."""
    data = text.encode("utf-8", errors="replace")
    out = []
    pos = 0
    for end in cdc_boundaries(data):
        out.append(hashlib.md5(data[pos:end]).hexdigest())
        pos = end
    return out
