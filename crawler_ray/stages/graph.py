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

Over-budget node sets (≳32M nodes at the default 256 MiB) take
:func:`pagerank_bucketed` — ranks live in a hash-bucketed Dataset and
each iteration is two co-grouping shuffles; no node-scale driver or
broadcast state anywhere.  The broadcast variant RAISES (never a
silent fallback) and its message names the bucketed one.
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
            "broadcast budget — use pagerank_bucketed (ranks as a "
            "hash-bucketed Dataset, two co-group shuffles per "
            "iteration) instead of the broadcast iteration"
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
        from crawler_ray.functions.arrow_utils import (
            canonical_undirected_edges,
            hash_pkey,
        )

        df = canonical_undirected_edges(batch, "src", "dst", "u", "v")
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


def pagerank_bucketed(
    edges: Dataset,
    n_nodes: int,
    *,
    alpha: float = 0.85,
    n_iter: int = 20,
    n_buckets: int = 64,
) -> Dataset:
    """PageRank for node sets OVER the broadcast budget — the bucketed
    co-group variant :func:`pagerank`'s raise message points at.  No
    node-scale driver/broadcast state exists anywhere: ranks live in a
    (node, rank, inv_deg) Dataset hash-bucketed by node, edges are
    bucketed ONCE by src, and each iteration is two co-grouping
    shuffles —

    1. ranks ⋈ edges per src bucket (union + groupby + one vectorized
       pandas pass) → per-bucket partial contributions (≤ distinct dst
       per bucket rows);
    2. contributions re-bucket by dst and fold into the next rank
       table.

    The only driver-side values are scalars (dangling mass, the
    (1−α)/N base).  Results match :func:`pagerank` to float-sum
    reordering tolerance; each iteration materializes the new state so
    the lineage stays O(1) deep instead of O(n_iter)."""
    from crawler_ray.functions.arrow_utils import hash_pkey

    # --- out-degrees as a bucketed Dataset (node-scale, never driver)
    def deg_partial(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        u, c = np.unique(src, return_counts=True)
        if len(u) and (u.min() < 0 or u.max() >= n_nodes):
            raise ValueError(
                f"edge src ids must be dense in [0, {n_nodes}) — relabel first"
            )
        return pa.table(
            {
                "node": pa.array(u, type=pa.int64()),
                "deg": pa.array(c.astype(np.float64), type=pa.float64()),
                "bucket": pa.array(hash_pkey(u, n_buckets), type=pa.int64()),
            }
        )

    import ray.data as _rd

    def seed_state(batch: pa.Table) -> pa.Table:
        node = batch["id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(node, type=pa.int64()),
                "deg": pa.array(np.zeros(len(node)), type=pa.float64()),
                "bucket": pa.array(hash_pkey(node, n_buckets), type=pa.int64()),
            }
        )

    def build_state(g: pd.DataFrame) -> pa.Table:
        m = g.groupby("node", as_index=False).agg(deg=("deg", "sum"))
        deg = m["deg"].to_numpy()
        inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1.0), 0.0)
        # carry the bucket (pure function of node, computed ONCE here):
        # re-hashing the node-scale state 2x per iteration would cost
        # ~2 x n_iter x n_nodes redundant hashes on the giant graphs
        # this function exists for
        bkt = int(g["bucket"].iloc[0])
        return pa.table(
            {
                "node": pa.array(m["node"], type=pa.int64()),
                "rank": pa.array(
                    np.full(len(m), 1.0 / n_nodes), type=pa.float64()
                ),
                "inv": pa.array(inv, type=pa.float64()),
                "bucket": pa.array(
                    np.full(len(m), bkt, dtype=np.int64), type=pa.int64()
                ),
            }
        )

    nodes = _rd.range(n_nodes).map_batches(seed_state, batch_format="pyarrow")
    state = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .union(nodes)
        .groupby("bucket")
        .map_groups(build_state, batch_format="pandas")
        .materialize()
    )

    def tag_edges(batch: pa.Table) -> pa.Table:
        # dst_bucket computed once here (edges_b is materialized), so
        # per-iteration contribution rows inherit it instead of
        # re-hashing edge-scale dst arrays every sweep
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        # same dense-id contract as the broadcast pagerank's guard —
        # out-of-range ids would silently seed phantom state nodes
        # (mass > 1) or drop contribution mass in the fold
        for name, a in (("src", src), ("dst", dst)):
            if len(a) and (a.min() < 0 or a.max() >= n_nodes):
                raise ValueError(
                    f"edge {name} ids must be dense in [0, {n_nodes}) — "
                    "relabel first"
                )
        return pa.table(
            {
                "src": pa.array(src, type=pa.int64()),
                "dst": pa.array(dst, type=pa.int64()),
                "bucket": pa.array(hash_pkey(src, n_buckets), type=pa.int64()),
                "dst_bucket": pa.array(hash_pkey(dst, n_buckets), type=pa.int64()),
            }
        )

    edges_b = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    base = (1.0 - alpha) / n_nodes

    # unified co-group row layout: state rows carry (rank, inv),
    # edge rows carry dst, contrib rows carry c — is_a marks the side
    def as_state(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "bucket": batch["bucket"].cast(pa.int64()),  # carried, not re-hashed
                "node": batch["node"].cast(pa.int64()),
                "rank": batch["rank"].cast(pa.float64()),
                "inv": batch["inv"].cast(pa.float64()),
                "dst": pa.array(np.full(n, -1, dtype=np.int64)),
                "dstb": pa.array(np.full(n, -1, dtype=np.int64)),
                "is_a": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def as_edge(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        z = pa.array(np.zeros(n), type=pa.float64())
        return pa.table(
            {
                "bucket": batch["bucket"].cast(pa.int64()),
                "node": batch["src"].cast(pa.int64()),
                "rank": z,
                "inv": z,
                "dst": batch["dst"].cast(pa.int64()),
                "dstb": batch["dst_bucket"].cast(pa.int64()),
                "is_a": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    for _ in range(n_iter):
        # dangling mass: one tiny scalar aggregate (no node state)
        def dangling_partial(batch: pa.Table) -> pa.Table:
            inv = batch["inv"].to_numpy(zero_copy_only=False)
            r = batch["rank"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"m": pa.array([float(r[inv == 0.0].sum())], type=pa.float64())}
            )

        d_mass = sum(
            row["m"]
            for row in state.map_batches(
                dangling_partial, batch_format="pyarrow"
            ).take_all()
        )
        extra = alpha * d_mass / n_nodes + base  # per-node constant

        def contrib(g: pd.DataFrame) -> pa.Table:
            a = g[g["is_a"]]
            e = g[~g["is_a"]]
            if not len(e):
                return pa.table(
                    {
                        "node": pa.array([], type=pa.int64()),
                        "c": pa.array([], type=pa.float64()),
                        "bucket": pa.array([], type=pa.int64()),
                    }
                )
            w = pd.Series(
                (a["rank"] * a["inv"]).to_numpy(), index=a["node"].to_numpy()
            )
            we = e["node"].map(w).to_numpy()  # weight of each edge's src
            dst = e["dst"].to_numpy()
            u, first, idx = np.unique(dst, return_index=True, return_inverse=True)
            c = np.bincount(idx, weights=we)
            return pa.table(
                {
                    "node": pa.array(u, type=pa.int64()),
                    "c": pa.array(c, type=pa.float64()),
                    # dst bucket carried from the edge rows (hash of a
                    # pure function of node — identical at every
                    # occurrence, so taking the first is exact)
                    "bucket": pa.array(
                        e["dstb"].to_numpy()[first], type=pa.int64()
                    ),
                }
            )

        contribs = (
            state.map_batches(as_state, batch_format="pyarrow")
            .union(edges_b.map_batches(as_edge, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(contrib, batch_format="pandas")
        )

        def as_contrib(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "bucket": batch["bucket"].cast(pa.int64()),  # carried
                    "node": batch["node"].cast(pa.int64()),
                    "rank": pa.array(np.zeros(n), type=pa.float64()),
                    "inv": batch["c"].cast(pa.float64()),  # carry c in inv slot
                    "dst": pa.array(np.full(n, -1, dtype=np.int64)),
                    "dstb": pa.array(np.full(n, -1, dtype=np.int64)),
                    "is_a": pa.array(np.zeros(n, dtype=bool)),
                }
            )

        def fold(g: pd.DataFrame) -> pa.Table:
            a = g[g["is_a"]]
            c = g[~g["is_a"]]
            csum = (
                c.groupby("node")["inv"].sum()
                if len(c)
                else pd.Series(dtype=np.float64)
            )
            cc = a["node"].map(csum).fillna(0.0).to_numpy()
            new_rank = extra + alpha * cc
            return pa.table(
                {
                    "node": pa.array(a["node"], type=pa.int64()),
                    "rank": pa.array(new_rank, type=pa.float64()),
                    "inv": pa.array(a["inv"], type=pa.float64()),
                    "bucket": pa.array(a["bucket"], type=pa.int64()),
                }
            )

        state = (
            state.map_batches(as_state, batch_format="pyarrow")
            .union(contribs.map_batches(as_contrib, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(fold, batch_format="pandas")
            .materialize()  # O(1)-deep lineage across iterations
        )

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["node", "rank"])

    return state.map_batches(project, batch_format="pyarrow")


def bfs_distances(
    edges: Dataset,
    n_nodes: int,
    seeds: list[int],
    *,
    max_iter: int = 64,
    budget_bytes: int = PAGERANK_BUDGET_BYTES,
) -> pd.DataFrame:
    """Multi-source BFS hop distances over the edge table (the crawl-
    depth analytic: how many link hops from the seed set).  Same
    broadcast discipline as :func:`pagerank`: the node-scale distance
    vector is numpy under the byte budget (RAISES over budget — the
    bucketed co-group shape of :func:`pagerank_bucketed` is the
    scale-out path), the EDGE table is only ever ``map_batches``'d, and
    each round's one shuffle carries ≤ distinct-dst-per-block rows.
    Rounds stop as soon as a sweep relaxes nothing (≤ diameter + 1
    sweeps); unreachable nodes report -1."""
    if 8 * n_nodes > budget_bytes:
        raise ValueError(
            f"bfs_distances node state (8×{n_nodes} B) exceeds the "
            f"{budget_bytes >> 20} MiB budget — iterate with distances "
            "as a hash-bucketed Dataset (the pagerank_bucketed co-group "
            "shape) instead of the broadcast vector"
        )
    INF = np.int64(np.iinfo(np.int64).max // 2)
    dist = np.full(n_nodes, INF, dtype=np.int64)
    for s in seeds:
        if not (0 <= s < n_nodes):
            raise ValueError(f"seed {s} outside [0, {n_nodes})")
        dist[s] = 0

    for _ in range(max_iter):
        d_ref = ray.put(dist)

        def relax_partial(batch: pa.Table) -> pa.Table:
            d = ray.get(d_ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            for name, a in (("src", src), ("dst", dst)):
                if len(a) and (a.min() < 0 or a.max() >= n_nodes):
                    raise ValueError(
                        f"edge {name} ids must be dense in [0, {n_nodes}) — "
                        "negative ids would wrap via numpy indexing and "
                        "corrupt distances silently"
                    )
            cand = d[src] + 1
            better = cand < d[dst]
            if not better.any():
                return pa.table(
                    {
                        "node": pa.array([], type=pa.int64()),
                        "d": pa.array([], type=pa.int64()),
                    }
                )
            u, idx = np.unique(dst[better], return_inverse=True)
            best = np.full(len(u), int(INF), dtype=np.int64)
            np.minimum.at(best, idx, cand[better])
            return pa.table(
                {
                    "node": pa.array(u, type=pa.int64()),
                    "d": pa.array(best, type=pa.int64()),
                }
            )

        from ray.data.aggregate import Min as _Min

        rows = (
            edges.map_batches(relax_partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(_Min("d", alias_name="d"))
            .to_pandas()  # ≤ relaxed nodes — inside the declared budget
        )
        if not len(rows):
            break
        nodes = rows["node"].to_numpy()
        vals = rows["d"].to_numpy()
        improved = vals < dist[nodes]
        if not improved.any():
            break
        dist[nodes[improved]] = vals[improved]
    else:
        raise ValueError(
            f"bfs_distances did not converge in max_iter={max_iter} sweeps "
            "— raise max_iter for graphs of larger diameter"
        )

    out = dist.copy()
    out[out >= INF] = -1
    return pd.DataFrame(
        {"node": np.arange(n_nodes, dtype=np.int64), "dist": out}
    )
