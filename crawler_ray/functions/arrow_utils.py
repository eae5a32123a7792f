"""Small Arrow batch utilities.

``strip_md`` exists because pyarrow Schemas carrying the ``b'pandas'``
metadata blob are UNHASHABLE (``hash(schema)`` raises "unhashable
type: 'dict'"), which defeats Ray Data's block-schema deduplication in
``unify_schemas`` and spams "Failed to hash the schemas" warnings on
every block.  Both ``read_parquet`` (files written by pandas) and
``pa.Table.from_pandas`` attach that blob, so batch functions should
route through these helpers.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def strip_md(t: pa.Table) -> pa.Table:
    """Drop schema-level metadata (zero-copy) so schemas stay hashable."""
    if t.schema.metadata:
        return t.replace_schema_metadata(None)
    return t


def table_from_pandas(df: pd.DataFrame) -> pa.Table:
    """``pa.Table.from_pandas`` without the index and without the
    unhashable ``b'pandas'`` schema metadata."""
    return strip_md(pa.Table.from_pandas(df, preserve_index=False))


def hash_pkey(values, n_parts: int):
    """Deterministic partition key in ``[0, n_parts)`` from a value
    array — THE repo idiom for hash co-location (`groupby("pkey")` +
    vectorized per-partition combine).

    Integer arrays hash directly.  FLOAT arrays are normalized to
    int64 first (raising on non-integral / non-finite values): arrow
    nullable-int columns surface as float64 via ``to_numpy``, and
    hashing 12345.0 through the object path while another batch hashes
    int64 12345 would silently split one logical key across
    partitions.  Anything else goes through the object path with
    ``categorize=False`` pinned (pandas 2.2's categorize path is
    value-UNSTABLE on object arrays: the same string can hash
    differently inside different arrays)."""
    import numpy as np
    import pandas as pd

    arr = np.asarray(values)
    if arr.dtype.kind == "f":
        if len(arr) and (not np.isfinite(arr).all() or (arr != np.floor(arr)).any()):
            raise ValueError(
                "hash_pkey got a float array with NaN/inf or non-integral "
                "values — a null-bearing int column? drop/fill nulls before "
                "partitioning (silent float hashing would split keys)"
            )
        arr = arr.astype(np.int64)
    if arr.dtype.kind in ("i", "u", "b"):
        h = pd.util.hash_array(arr.astype(np.int64))
    else:
        h = pd.util.hash_array(arr.astype(object), categorize=False)
    return (h % np.uint64(n_parts)).astype(np.int64)


def segment_pairs(group_keys, values, max_width: int, label: str):
    """All unordered within-group pairs of ``values``, vectorized.

    ``group_keys``/``values`` must be sorted by group (and by value
    within group if callers rely on a < b ordering).  Groups are
    processed per SIZE CLASS: every group of width k contributes its
    pairs through one ``np.triu_indices(k, 1)`` matrix gather — no
    per-group Python loop.  A group wider than ``max_width`` RAISES
    (pair generation is O(k²); a silent cap would under-count) with
    ``label`` naming the guard for the caller's error contract.

    Returns ``(a, b)`` int64 arrays (empty when no group has ≥ 2
    rows).  Shared kernel of the market-basket pair miner and the
    triangle-count wedge generator — one copy of the subtle
    offsets/factorize arithmetic to keep correct."""
    import numpy as np
    import pandas as pd

    codes, _ = pd.factorize(group_keys)
    counts = np.bincount(codes) if len(codes) else np.array([], dtype=np.int64)
    vals = np.asarray(values)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    a_l, b_l = [], []
    for k in np.unique(counts):
        if k < 2:
            continue
        if k > max_width:
            raise ValueError(
                f"group with {k} rows exceeds {label}={max_width}: pair "
                "generation is O(k²) — raise the bound deliberately or "
                "pre-filter pathological groups"
            )
        idx = np.where(counts == k)[0]
        starts = offsets[idx]
        mat = vals[starts[:, None] + np.arange(k)[None, :]]
        iu, ju = np.triu_indices(k, 1)
        a_l.append(mat[:, iu].ravel())
        b_l.append(mat[:, ju].ravel())
    if not a_l:
        e = np.array([], dtype=np.int64)
        return e, e.copy()
    return (
        np.concatenate(a_l).astype(np.int64),
        np.concatenate(b_l).astype(np.int64),
    )


def canonical_undirected_edges(batch, src_col: str, dst_col: str, a_col: str, b_col: str):
    """Canonicalize a directed edge batch to unique undirected pairs:
    self-loops dropped, endpoints ordered low→high, within-batch
    duplicates collapsed.  Shared by the triangle counter and the
    link-components query (single copy of the keep/min/max/dedup
    sequence).  Returns a pandas DataFrame with columns
    (``a_col``, ``b_col``)."""
    import numpy as np
    import pandas as pd

    s = batch[src_col].to_numpy(zero_copy_only=False)
    d = batch[dst_col].to_numpy(zero_copy_only=False)
    keep = s != d
    s, d = s[keep], d[keep]
    return pd.DataFrame(
        {a_col: np.minimum(s, d), b_col: np.maximum(s, d)}
    ).drop_duplicates()
