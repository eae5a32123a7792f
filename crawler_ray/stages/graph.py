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


TRIANGLE_MAX_ORIENTED_DEG = 4096  # raise-never-cap guard on wedge fan-out


def triangle_count(
    edges: Dataset,
    n_nodes: int,
    *,
    n_parts: int = 64,
    budget_bytes: int = PAGERANK_BUDGET_BYTES,
) -> int:
    """Exact global triangle count over an undirected edge table —
    the degree-ordered wedge-join algorithm (Cohen's MapReduce
    formulation; Suri & Vassilvitskii's hub taming):

    1. canonicalize + dedup edges map-side (u < v, self-loops out);
    2. ORIENT each edge from its lower-(degree, id) endpoint to the
       higher one — every wedge is then generated at its lowest-degree
       apex, so per-node oriented out-degree is O(sqrt(m)) on any
       graph and total wedge volume is O(m^1.5) worst-case instead of
       sum(deg²) (hub-proof);
    3. co-locate oriented edges by hash(src): one partition holds a
       node's full out-neighborhood; wedges (a, b) emit via one
       np.triu_indices pass per out-degree class (no per-node Python
       loop);
    4. co-locate wedges AND oriented edges by hash of the (a, b) pair:
       a triangle is a wedge whose closing edge sits in the same
       partition — counted with one vectorized merge per partition.

    The degree vector is node-scale numpy under the same byte budget
    contract as :func:`pagerank` (RAISES with the bucketed-co-group
    guidance when exceeded).  An oriented out-degree above
    TRIANGLE_MAX_ORIENTED_DEG raises — on a degree-ordered graph that
    means ~16M+ edges incident to mutually-high-degree nodes, a k²
    wedge blowup the caller must acknowledge, not a silent cap."""
    if 8 * n_nodes > budget_bytes:
        raise ValueError(
            f"triangle_count degree state (8×{n_nodes} B) exceeds the "
            f"{budget_bytes >> 20} MiB budget — bucket the degree table "
            "and orient via a bucketed join instead of the broadcast"
        )

    def canon(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        df = pd.DataFrame({"u": lo, "v": hi}).drop_duplicates()
        from crawler_ray.functions.arrow_utils import hash_pkey

        df["pkey"] = hash_pkey(
            df["u"].to_numpy() * np.int64(2654435761) + df["v"].to_numpy(), n_parts
        )
        return pa.table(
            {
                "u": pa.array(df["u"], type=pa.int64()),
                "v": pa.array(df["v"], type=pa.int64()),
                "pkey": pa.array(df["pkey"], type=pa.int64()),
            }
        )

    def dedup_part(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["u", "v"])
        return pa.table(
            {
                "u": pa.array(d["u"], type=pa.int64()),
                "v": pa.array(d["v"], type=pa.int64()),
            }
        )

    # one canonical copy of each undirected edge (pair-hash co-located)
    uniq = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(dedup_part, batch_format="pandas")
        .materialize()  # read twice below (degrees, then orientation)
    )

    def deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                batch["u"].to_numpy(zero_copy_only=False),
                batch["v"].to_numpy(zero_copy_only=False),
            ]
        )
        nodes, counts = np.unique(both, return_counts=True)
        return pa.table(
            {
                "node": pa.array(nodes, type=pa.int64()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    deg_rows = (
        uniq.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ n_nodes rows — inside the declared budget
    )
    deg = np.zeros(n_nodes, dtype=np.int64)
    deg[deg_rows["node"].to_numpy()] = deg_rows["n"].to_numpy()
    deg_ref = ray.put(deg)

    def orient(batch: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        # orient low (degree, id) → high: total order, hub-proof
        u_first = (dg[u] < dg[v]) | ((dg[u] == dg[v]) & (u < v))
        src = np.where(u_first, u, v)
        dst = np.where(u_first, v, u)
        from crawler_ray.functions.arrow_utils import hash_pkey

        pk = hash_pkey(src, n_parts)
        return pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
                "pkey": pa.array(pk, type=pa.int64()),
            }
        )

    oriented = uniq.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(g: pd.DataFrame) -> pa.Table:
        from crawler_ray.functions.arrow_utils import segment_pairs

        df = g.sort_values(["src", "dst"])
        # shared kernel with the market-basket pair miner (one copy of
        # the offsets/triu arithmetic + raise-never-cap guard)
        a, b = segment_pairs(
            df["src"].to_numpy(),
            df["dst"].to_numpy(),
            TRIANGLE_MAX_ORIENTED_DEG,
            "TRIANGLE_MAX_ORIENTED_DEG",
        )
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {"a": pa.array(lo, type=pa.int64()), "b": pa.array(hi, type=pa.int64())}
        )

    def pair_tag(role: str):
        def tag(batch: pa.Table) -> pa.Table:
            if role == "wedge":
                a = batch["a"].to_numpy(zero_copy_only=False)
                b = batch["b"].to_numpy(zero_copy_only=False)
            else:
                u = batch["src"].to_numpy(zero_copy_only=False)
                v = batch["dst"].to_numpy(zero_copy_only=False)
                a, b = np.minimum(u, v), np.maximum(u, v)
            from crawler_ray.functions.arrow_utils import hash_pkey

            pk = hash_pkey(
                a.astype(np.int64) * np.int64(2654435761) + b.astype(np.int64),
                n_parts,
            )
            return pa.table(
                {
                    "a": pa.array(a, type=pa.int64()),
                    "b": pa.array(b, type=pa.int64()),
                    "is_edge": pa.array(
                        np.full(len(a), role == "edge"), type=pa.bool_()
                    ),
                    "pkey": pa.array(pk, type=pa.int64()),
                }
            )

        return tag

    wedge_stream = (
        oriented.groupby("pkey")
        .map_groups(wedges, batch_format="pandas")
        .map_batches(pair_tag("wedge"), batch_format="pyarrow")
    )
    edge_stream = oriented.map_batches(pair_tag("edge"), batch_format="pyarrow")

    def close_count(g: pd.DataFrame) -> pa.Table:
        e = g[g["is_edge"]][["a", "b"]].drop_duplicates()
        w = g[~g["is_edge"]][["a", "b"]]
        if not len(w) or not len(e):
            n = 0
        else:
            n = int(len(w.merge(e, on=["a", "b"], how="inner")))
        return pa.table({"n": pa.array([n], type=pa.int64())})

    counts = (
        wedge_stream.union(edge_stream)
        .groupby("pkey")
        .map_groups(close_count, batch_format="pandas")
        .to_pandas()  # ≤ n_parts rows by construction
    )
    return int(counts["n"].sum())
