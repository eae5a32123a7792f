"""Partitioning / skew utilities (SURVEY.md §7.4, §7.7).

Skew story of the crawl engine itself: *fetch/parse* skew does not
exist by construction — wave rows are chunked by row ranges, so a hot
host's pages spread evenly across tasks; *fetch politeness* keeps a
host serialized regardless of its size (per-host budget per wave); the
residual skew is shard *ingest* (per-site sequential enqueue), bounded
per wave by the politeness budget and overlapped across shards by
``run_parallel``.

For downstream per-key heavy stages (per-host scoring, per-user
sessionization) that DO key-partition, these helpers implement the
standard mitigations:

- ``add_salted_key``: split a hot key into ``key#salt`` sub-keys so a
  ``groupby`` fans it out over ``n_salt`` reducers (use when the
  per-group computation is associative / mergeable),
- ``colocate_by``: hash-co-locate rows by (salted) key via groupby —
  the explicit partitioned-exchange building block,
- ``key_histogram``: cheap per-key row counts (combiner-style) used to
  pick salts for the heavy hitters only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

from crawler_ray.functions.arrow_utils import table_from_pandas


def add_salted_key(
    ds: Dataset,
    key_col: str,
    n_salt: int,
    hot_keys: list[str] | None = None,
    out_col: str = "salted_key",
    seed: int = 42,
) -> Dataset:
    """``key#salt`` column; ``hot_keys=None`` salts every key, else only
    the listed heavy hitters (others keep ``key#0``)."""
    hot = set(hot_keys) if hot_keys is not None else None

    def salt(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        n = len(keys)
        # content-derived, deterministic (no process-salted hash()):
        # per-key base hash + within-batch occurrence index, so a hot
        # key's occurrences round-robin across all n_salt sub-keys even
        # when equal-sized batches repeat
        base = pd.util.hash_array(np.asarray(keys, dtype=object), categorize=False)
        salts = ((base + np.uint64(seed) + np.arange(n, dtype=np.uint64))
                 % np.uint64(n_salt)).astype(np.int64)
        out = [
            f"{k}#{salts[i] if (hot is None or k in hot) else 0}"
            for i, k in enumerate(keys)
        ]
        return batch.append_column(out_col, pa.array(out, type=pa.string()))

    return ds.map_batches(salt, batch_format="pyarrow")


def colocate_by(ds: Dataset, key_col: str) -> Dataset:
    """Hash-exchange so each output block holds whole key groups
    (the explicit partitioned shuffle; identity map_groups)."""

    def ident(g: pd.DataFrame) -> pa.Table:
        return table_from_pandas(g)

    return ds.groupby(key_col).map_groups(ident, batch_format="pandas")


def key_histogram(ds: Dataset, key_col: str) -> Dataset:
    """(key, n_rows) via per-batch partial counts then a tiny groupby —
    the combiner pattern; use its output to pick ``hot_keys``."""

    def partial(batch: pa.Table) -> pa.Table:
        df = (
            batch.select([key_col])
            .to_pandas()
            .groupby(key_col, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return table_from_pandas(df)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n_rows"))
    )


def hot_keys_above(ds: Dataset, key_col: str, fraction: float = 0.1) -> list[str]:
    """Keys holding more than ``fraction`` of all rows (driver-side —
    the histogram is tiny)."""
    hist = key_histogram(ds, key_col).to_pandas()
    total = hist["n_rows"].sum()
    return hist.loc[hist["n_rows"] > fraction * total, key_col].tolist()
