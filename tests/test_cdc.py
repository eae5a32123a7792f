"""Ground truth for the content-defined-chunking dedup operator
(functions/cdc.py + q_cdc_dup_chunks).

The kernel claims three things the sf tables cannot falsify: (1) the
vectorized gear hash equals the sequential recurrence bit-for-bit,
(2) chunk sizes respect min/max with the tail exempt, and (3) chunk
hashes RESYNCHRONIZE after an insertion — the property that separates
CDC from the fixed-window ExactSubstr operator.  The engine query is
then checked against a single-process brute force on a corpus with
offset-shifted shared passages.
"""

import hashlib

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_ray.functions.cdc import (
    CDC_MAX,
    CDC_MIN,
    GEAR,
    cdc_boundaries,
    cdc_chunk_hashes,
    gear_hashes,
)


def _ref_gear(data: np.ndarray) -> np.ndarray:
    h = 0
    out = []
    for b in data:
        h = ((h << 1) + int(GEAR[b])) & 0xFFFFFFFFFFFFFFFF
        out.append(h)
    return np.array(out, dtype=np.uint64)


@given(st.binary(min_size=0, max_size=600))
@settings(max_examples=60, deadline=None)
def test_gear_hash_matches_sequential_recurrence(data):
    arr = np.frombuffer(data, dtype=np.uint8)
    assert (gear_hashes(arr) == _ref_gear(arr)).all()


@given(st.binary(min_size=1, max_size=3000))
@settings(max_examples=60, deadline=None)
def test_boundaries_respect_min_max_and_cover(data):
    ends = cdc_boundaries(data)
    assert ends[-1] == len(data)
    sizes = np.diff([0] + ends)
    assert (sizes <= CDC_MAX).all()
    # every chunk except the final tail honors the floor
    assert (sizes[:-1] >= CDC_MIN).all()
    assert (sizes > 0).all()


def test_insertion_resynchronizes_chunks():
    """Prepending bytes to a document must leave the trailing chunks
    byte-identical (boundaries are content-defined, so they realign
    within ~one chunk of the edit).  A fixed-window scheme shifts
    EVERY window here — zero shared hashes."""
    rng = np.random.RandomState(11)
    body = bytes(rng.randint(0, 256, 4000).astype(np.uint8))

    def hashes(d: bytes) -> list[str]:
        out, pos = [], 0
        for e in cdc_boundaries(d):
            out.append(hashlib.md5(d[pos:e]).hexdigest())
            pos = e
        return out

    h_orig = hashes(body)
    h_edit = hashes(b"inserted prefix!" + body)
    # all but the first few chunks resync exactly
    shared = set(h_orig) & set(h_edit)
    assert len(shared) >= len(h_orig) - 3
    assert h_orig[-3:] == h_edit[-3:]


def test_cdc_dup_chunks_vs_brute_force(ray_session, tmp_path):
    """Engine per-doc (n_chunks, n_dup) equals a single-process brute
    force on a corpus where the shared passage sits at DIFFERENT byte
    offsets in each doc — the case the fixed-window operator misses by
    construction."""
    from crawler_ray.pipelines.queries import q_cdc_dup_chunks

    rng = np.random.RandomState(3)

    def rand_text(n):
        return "".join(
            chr(c) for c in rng.randint(97, 123, n)
        )

    shared = rand_text(400)
    docs = [
        rand_text(50) + shared,        # shared passage at offset 50
        rand_text(133) + shared,       # ... at offset 133
        rand_text(300),                # no shared content
        shared + rand_text(77),        # ... at offset 0
    ]
    pdf = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "text": docs})
    pdf.to_parquet(tmp_path / "documents.parquet")

    # brute force with the same kernel
    per_doc = {}
    owner: dict[str, set] = {}
    chunks = {d: cdc_chunk_hashes(t) for d, t in zip(pdf["doc_id"], docs)}
    for d, hs in chunks.items():
        for h in hs:
            owner.setdefault(h, set()).add(d)
    for d, hs in chunks.items():
        per_doc[int(d)] = (
            len(hs),
            sum(1 for h in hs if len(owner[h]) > 1),
        )

    got = (
        q_cdc_dup_chunks(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # every doc must be present — a silently-dropped doc would
    # otherwise shrink the loop below and still pass
    assert set(got["doc_id"].astype(int)) == set(per_doc)
    for _, r in got.iterrows():
        nc, nd = per_doc[int(r["doc_id"])]
        assert int(r["n_chunks"]) == nc
        assert int(r["n_dup"]) == nd
        assert r["dup_ratio"] == nd / nc
    # the offset-shifted docs DO share duplicated chunks (the point)
    assert per_doc[0][1] > 0 and per_doc[1][1] > 0 and per_doc[3][1] > 0
    assert per_doc[2][1] == 0
