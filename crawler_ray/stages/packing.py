"""Sequence packing: greedy first-fit-decreasing of documents into
fixed-token-budget training bins.

The training-data step after dedup/filter: concatenating short
documents up to a context-length budget keeps padding waste low.  The
packing here is PER BLOCK (``map_batches``, no shuffle): bins never
span blocks, so the operator parallelizes embarrassingly and a bin's
documents are co-located by construction — at 100 TB the alternative
(global packing) would be an all-to-all for a few % packing-density
gain.  Deterministic given block contents (docs sorted inside the
block before packing).

Not SQL-expressible (greedy stateful fold); verified by ground-truth
pytest instead (every doc packed exactly once, every bin within
budget unless a single oversized doc, FFD density sanity bound).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def ffd_pack(ids, lens, bin_budget: int) -> list[dict]:
    """First-fit-DECREASING fold shared by the per-block and
    per-partition packers: sort by (len desc, id) — deterministic and
    within 11/9·OPT + 1 bins of optimal.  A doc longer than the budget
    still gets its own bin, marked oversized — truncation is the
    caller's policy decision."""
    ids = np.asarray(ids)
    lens = np.asarray(lens, dtype=np.int64)
    order = np.lexsort((ids, -lens))
    bins: list[dict] = []
    for i in order:
        d, ln = ids[i], int(lens[i])
        placed = False
        for b in bins:
            if b["total"] + ln <= bin_budget:
                b["ids"].append(d)
                b["total"] += ln
                placed = True
                break
        if not placed:
            bins.append({"ids": [d], "total": ln, "oversized": ln > bin_budget})
    return bins


def pack_sequences(
    ds: Dataset,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    bin_budget: int = 4096,
) -> Dataset:
    """One output row per bin: ``(bin_id, doc_ids, n_docs,
    total_tokens, has_oversized)``.  ``bin_id`` is
    ``"<smallest doc id in block>:<index>"`` — unique across blocks
    because a doc lives in exactly one block.  NOTE bins depend on the
    engine's block boundaries: parallel packing is deterministic given
    blocks but NOT across differing block layouts — callers that need
    run-to-run identical manifests should co-locate docs into FIXED
    hash partitions first (see pipelines.queries.q_training_pipeline)
    and pack per partition."""

    def pack(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist())
        bins = ffd_pack(ids, batch[len_col].to_pylist(), bin_budget)
        anchor = ids.min() if len(ids) else 0
        return pa.table(
            {
                "bin_id": pa.array(
                    [f"{anchor}:{i}" for i in range(len(bins))], type=pa.string()
                ),
                "doc_ids": pa.array(
                    [[int(x) for x in b["ids"]] for b in bins],
                    type=pa.list_(pa.int64()),
                ),
                "n_docs": pa.array([len(b["ids"]) for b in bins], type=pa.int64()),
                "total_tokens": pa.array([b["total"] for b in bins], type=pa.int64()),
                "has_oversized": pa.array(
                    [bool(b.get("oversized", False)) for b in bins],
                    type=pa.bool_(),
                ),
            }
        )

    return ds.map_batches(pack, batch_format="pyarrow")
