"""Link-graph centrality over a distributed edge table.

PageRank as a Ray-Data-first power iteration designed so the EDGE
table — the corpus-scale side (one row per crawled link; reference
pages carry ~30 links each, cf. /root/reference
src/crawler/high_performance_extractor.py's link extraction) — is
never reshuffled:

- edges are read once into a (materialized) Dataset and every
  iteration touches them only through ``map_batches`` (no all-to-all);
- the rank/degree state is the NODE-scale side, held as dense numpy
  vectors broadcast once per iteration via ``ray.put`` — under an
  explicit byte budget that RAISES with guidance when exceeded (the
  same contract as joins.py's broadcast budget), because a silent
  driver-side O(N) is exactly what the repo bans;
- each iteration's only shuffle is the grouped sum of per-block
  partial contributions — O(distinct dst per block) rows leave each
  block, never the edge list.

Over-budget node sets (≳32M nodes at the default 256 MiB) need the
bucketed-co-group variant — hash-partition BOTH ranks and edges by
``src`` bucket and join inside ``map_groups`` — which re-shuffles the
rank side only; its shape exists in ``stages/joins.bucketed_hash_join``
and is the documented scale-out path, not silently attempted here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

PAGERANK_BUDGET_BYTES = 256 << 20


def pagerank(
    edges: Dataset,
    n_nodes: int,
    *,
    alpha: float = 0.85,
    n_iter: int = 20,
    budget_bytes: int = PAGERANK_BUDGET_BYTES,
) -> pd.DataFrame:
    """Power-iteration PageRank over ``edges`` (``src``/``dst`` DENSE
    int64 node ids in ``[0, n_nodes)``).

    Dangling nodes (out-degree 0) redistribute their mass uniformly —
    the standard stochastic-matrix fix — so ranks sum to 1 every
    iteration.  Returns the full (node, rank) frame, node-ordered; the
    frame is O(n_nodes) and lives under the same byte budget as the
    iteration state.
    """
    state_bytes = 3 * 8 * n_nodes  # rank + inv_deg + contrib vectors
    if state_bytes > budget_bytes:
        raise ValueError(
            f"pagerank node state ({state_bytes >> 20} MiB for "
            f"{n_nodes} nodes) exceeds the {budget_bytes >> 20} MiB "
            "broadcast budget — use a bucketed co-group of ranks and "
            "edges by hash(src) (see stages/joins.bucketed_hash_join) "
            "instead of the broadcast iteration"
        )

    def deg_partial(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        u, c = np.unique(src, return_counts=True)
        return pa.table(
            {"src": pa.array(u, type=pa.int64()), "n": pa.array(c, type=pa.int64())}
        )

    # out-degree: per-block unique counts → grouped sum → ≤ n_nodes rows
    # on the driver (inside the declared budget by construction)
    deg_rows = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("src")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    deg = np.zeros(n_nodes, dtype=np.float64)
    deg[deg_rows["src"].to_numpy()] = deg_rows["n"].to_numpy()
    bad = deg_rows["src"].to_numpy()
    if len(bad) and (bad.min() < 0 or bad.max() >= n_nodes):
        raise ValueError(
            f"edge src ids must be dense in [0, {n_nodes}) — relabel first"
        )
    dangling = deg == 0.0
    inv_deg = np.zeros(n_nodes, dtype=np.float64)
    inv_deg[~dangling] = 1.0 / deg[~dangling]

    rank = np.full(n_nodes, 1.0 / n_nodes, dtype=np.float64)
    base = (1.0 - alpha) / n_nodes

    for _ in range(n_iter):
        # per-edge contribution factor, precombined driver-side (O(N))
        w_ref = ray.put(rank * inv_deg)

        def contrib_partial(batch: pa.Table) -> pa.Table:
            w = ray.get(w_ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            u, inv = np.unique(dst, return_inverse=True)
            c = np.bincount(inv, weights=w[src])
            return pa.table(
                {
                    "node": pa.array(u, type=pa.int64()),
                    "c": pa.array(c, type=pa.float64()),
                }
            )

        # the iteration's one shuffle: ≤ distinct-dst rows per block in,
        # ≤ n_nodes rows out (driver collect covered by the budget)
        contrib_rows = (
            edges.map_batches(contrib_partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()
        )
        contrib = np.zeros(n_nodes, dtype=np.float64)
        contrib[contrib_rows["node"].to_numpy()] = contrib_rows["c"].to_numpy()
        d_mass = float(rank[dangling].sum())
        rank = base + alpha * (contrib + d_mass / n_nodes)

    return pd.DataFrame(
        {"node": np.arange(n_nodes, dtype=np.int64), "rank": rank}
    )
