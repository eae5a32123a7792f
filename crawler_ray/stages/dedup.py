"""Deduplication operators over a documents Dataset.

The reference's dedup is exact-only (URL first-seen + sha256 ledger —
SURVEY.md §2.5/§2.7); the approximate family (MinHash-LSH, SimHash,
n-gram Jaccard, embedding cosine) are the scale additions a 100 TB
training-data pipeline needs.

Design notes (scale):
- exact dedup: vectorized hash column inside ``map_batches`` → *partial*
  first-per-key inside each batch → one small ``groupby(hash)`` over
  the survivors (classic combiner: the shuffle moves at most one row
  per (hash, block), not every row).
- MinHash-LSH: signatures per batch (actor pool — hasher built once) →
  explode to (band_key, doc_id) rows → ``groupby(band_key)`` emits
  candidate pairs → exact-Jaccard verify → connected components by
  iterated min-label propagation (a groupby per round, no driver-side
  union-find over the full data).
- embedding near-dup: cosine over L2-normalized vectors; bucketed by
  random-hyperplane LSH so comparisons stay within buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Min

from crawler_ray.functions.hashing import (
    MinHasher,
    jaccard,
    shingle_hashes,
    simhash64,
)


# ---------------------------------------------------------------- exact
def add_content_hash(ds: Dataset, text_col: str = "text", algo: str = "md5") -> Dataset:
    import hashlib

    def _hash(batch: pa.Table) -> pa.Table:
        from crawler_ray.functions.arrow_utils import strip_md

        batch = strip_md(batch)
        fn = hashlib.md5 if algo == "md5" else hashlib.sha256
        hashes = [
            fn((t or "").encode("utf-8")).hexdigest()
            for t in batch[text_col].to_pylist()
        ]
        return batch.append_column("content_hash", pa.array(hashes, type=pa.string()))

    return ds.map_batches(_hash, batch_format="pyarrow")


# ------------------------------------------- pair-combine (scale path)
def combine_pairs_by_hash(
    pairs: Dataset,
    agg_spec: list,
    n_parts: int = 64,
) -> Dataset:
    """Aggregate candidate-pair rows down to one row per (id_a, id_b).

    Replaces ``pairs.groupby(["id_a", "id_b"]).aggregate(...)``: Ray
    Data's multi-key aggregate runs a per-group Python accumulator
    (~12k groups/s measured at sf0.1 — minutes of CPU once candidate
    pairs reach ~1M, for seconds of real work). Instead: (1) map-side
    partial combine per batch, (2) co-locate on ONE derived hash key
    with ``n_parts`` groups, (3) one vectorized pandas combine per
    partition. Exact for mergeable aggs only: 'size' partials merge by
    sum, 'sum' by sum, 'max' by max.

    ``agg_spec``: list of ``(out_name, src_col | None, op)`` with op in
    {'size', 'sum', 'max'}; src_col is ignored for 'size'.
    """
    part_ops, merge_ops = {}, {}
    for out, src, op in agg_spec:
        if op == "size":
            part_ops[out] = ("__one", "sum")
            merge_ops[out] = (out, "sum")
        elif op in ("sum", "max"):
            part_ops[out] = (src, op)
            merge_ops[out] = (out, op)
        else:
            raise ValueError(f"unsupported pair-agg op {op!r}")

    out_cols = list(part_ops)
    empty = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            **{c: pa.array([], type=pa.int64()) for c in out_cols},
            "pair_pkey": pa.array([], type=pa.int64()),
        }
    )

    def partial(g: pd.DataFrame) -> pa.Table:
        from crawler_ray.functions.arrow_utils import table_from_pandas

        if not len(g):
            return empty
        g = g.assign(__one=np.int64(1))
        comb = (
            g.groupby(["id_a", "id_b"], sort=False)
            .agg(**part_ops)
            .reset_index()
        )
        pk = (
            comb["id_a"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
            + comb["id_b"].to_numpy().astype(np.uint64)
        ) % np.uint64(n_parts)
        comb["pair_pkey"] = pk.astype(np.int64)
        return table_from_pandas(comb[["id_a", "id_b", *out_cols, "pair_pkey"]])

    def merge(g: pd.DataFrame) -> pa.Table:
        from crawler_ray.functions.arrow_utils import table_from_pandas

        comb = (
            g.groupby(["id_a", "id_b"], sort=False)
            .agg(**merge_ops)
            .reset_index()
        )
        return table_from_pandas(comb[["id_a", "id_b", *out_cols]])

    return (
        pairs.map_batches(partial, batch_format="pandas")
        .groupby("pair_pkey")
        .map_groups(merge, batch_format="pandas")
    )


def exact_dedup_first(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """Keep the first (min id) row per content hash.

    Two-phase: per-batch partial min (combiner) → global groupby over
    the tiny partial table → broadcast-free semi-join by re-reading?
    No — we keep it single-pass: group full rows by hash, keep min-id
    row per group (rows-per-group is tiny: only duplicates collide).
    """
    hashed = add_content_hash(ds, text_col)

    def first_per_group(g: pd.DataFrame) -> pa.Table:
        # return ARROW (hashable schema) — raw DataFrames re-attach the
        # unhashable b'pandas' metadata via Ray's conversion and spam
        # "Failed to hash the schemas" from every reduce worker
        from crawler_ray.functions.arrow_utils import table_from_pandas

        return table_from_pandas(g.sort_values(id_col).head(1))

    return hashed.groupby("content_hash").map_groups(
        first_per_group, batch_format="pandas"
    )


def duplicate_hash_stats(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """Per-hash (n_docs, first_doc_id) — the combiner-style aggregate
    (partial min/count per batch would pre-shrink this at scale)."""
    hashed = add_content_hash(ds, text_col)
    return hashed.groupby("content_hash").aggregate(
        Count(alias_name="n_docs"), Min(id_col, alias_name="first_doc_id")
    )


# ------------------------------------------------------------- MinHash
class MinHashStage:
    """Actor-pool stage: text → minhash signature + LSH band keys.
    Hasher coefficients are built once per actor (seeded)."""

    def __init__(
        self,
        text_col: str = "text",
        num_perm: int = 128,
        num_bands: int = 16,
        shingle_n: int = 3,
        seed: int = 42,
    ):
        self.text_col = text_col
        self.hasher = MinHasher(num_perm=num_perm, seed=seed)
        self.num_bands = num_bands
        self.shingle_n = shingle_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from crawler_ray.functions.arrow_utils import strip_md

        batch = strip_md(batch)
        sigs, bands = [], []
        for t in batch[self.text_col].to_pylist():
            sh = shingle_hashes(t or "", n=self.shingle_n)
            sig = self.hasher.signature(sh)
            sigs.append(sig.tolist())
            bands.append(self.hasher.band_keys(sig, self.num_bands))
        return batch.append_column(
            "minhash", pa.array(sigs, type=pa.list_(pa.uint64()))
        ).append_column("band_keys", pa.array(bands, type=pa.list_(pa.string())))


def minhash_candidate_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    num_bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int = 256,
) -> Dataset:
    """LSH candidate pairs (id_a < id_b), deduped across bands."""
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={
            "text_col": text_col,
            "num_perm": num_perm,
            "num_bands": num_bands,
            "shingle_n": shingle_n,
        },
        concurrency=(1, 16),
        batch_format="pyarrow",
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids, keys = [], []
        for i, bks in zip(batch[id_col].to_pylist(), batch["band_keys"].to_pylist()):
            for bk in bks:
                ids.append(i)
                keys.append(bk)
        key_arr = np.asarray(keys, dtype=object)
        # co-locate whole bands under a FIXED number of hash partitions:
        # grouping by the partition key (not the raw band_key) turns
        # thousands of tiny per-band python map_groups calls into a few
        # partition-sized vectorized ones
        pkey = (
            pd.util.hash_array(key_arr, categorize=False) % np.uint64(64)
        ).astype(np.int64)
        return pa.table(
            {
                "band_key": pa.array(keys, type=pa.string()),
                id_col: pa.array(ids),
                "pkey": pa.array(pkey),
            }
        )

    # no select_columns here: on a lazy Dataset it triggers a
    # schema-inference pre-execution of the whole upstream stage on one
    # block; explode projects what it needs and fuses with the sig stage
    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def pairs_of_partition(g: pd.DataFrame) -> pa.Table:
        # factorize → contiguous segments → triu per multi-doc bucket;
        # no per-group sub-DataFrame (pandas groupby iteration allocates
        # one per group — the measured 20× n-gram-Jaccard pathology)
        from crawler_ray.functions.arrow_utils import table_from_pandas

        codes, _ = pd.factorize(g["band_key"], sort=False)
        order = np.argsort(codes, kind="stable")
        codes_s = codes[order]
        ids = g[id_col].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])
        ends = np.r_[starts[1:], len(codes_s)]
        sizes = ends - starts
        cols_a, cols_b, cols_c = [], [], []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            members = np.sort(ids[s:e])
            m = e - s
            # O(n²) guard: a degenerate bucket (e.g. empty-text docs all
            # hashing identically) would explode; cap and RECORD the drop
            # so truncation is never silent (the capped bucket still
            # yields first-vs-rest pairs, clustering members transitively)
            if m > max_bucket_size:
                cols_a.append(np.full(m - 1, members[0]))
                cols_b.append(members[1:])
                cols_c.append(np.ones(m - 1, dtype=np.int64))
                continue
            ia, ib = np.triu_indices(m, k=1)
            cols_a.append(members[ia])
            cols_b.append(members[ib])
            cols_c.append(np.zeros(len(ia), dtype=np.int64))
        if not cols_a:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "bucket_capped": pa.array([], type=pa.int64()),
                }
            )
        return table_from_pandas(
            pd.DataFrame(
                {
                    "id_a": np.concatenate(cols_a).astype(np.int64),
                    "id_b": np.concatenate(cols_b).astype(np.int64),
                    "bucket_capped": np.concatenate(cols_c),
                }
            )
        )

    pairs = exploded.groupby("pkey").map_groups(
        pairs_of_partition, batch_format="pandas"
    )
    # dedup pairs found by multiple bands — n_bands doubles as an
    # LSH-confidence signal; hash-partition combine, not a multi-key
    # ray.data aggregate (Python-accumulator path, see combine_pairs_by_hash)
    return combine_pairs_by_hash(
        pairs,
        [("n_bands", None, "size"), ("bucket_capped", "bucket_capped", "max")],
    )


def verify_jaccard_joined(
    pairs: Dataset,
    docs: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    n_buckets: int = 32,
) -> Dataset:
    """Exact-Jaccard verification via two bucketed hash-joins of the
    candidate pairs against the docs table — the scale path: neither
    the corpus nor the pair set ever lands on the driver (boilerplate-
    heavy crawls make "candidates are small" a broken assumption)."""
    from crawler_ray.stages.joins import bucketed_hash_join

    def as_a(t: pa.Table) -> pa.Table:
        return pa.table({"id_a": t[id_col], "text_a": t[text_col]})

    def as_b(t: pa.Table) -> pa.Table:
        return pa.table({"id_b": t[id_col], "text_b": t[text_col]})

    # map-side projection (select_columns on a lazy Dataset would
    # pre-execute the upstream pair pipeline for schema inference)
    slim = pairs.map_batches(
        lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
    )
    j = bucketed_hash_join(
        slim, docs.map_batches(as_a, batch_format="pyarrow"), key="id_a",
        n_buckets=n_buckets,
        left_schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]),
        right_schema=pa.schema([("id_a", pa.int64()), ("text_a", pa.string())]),
    )

    def fix_ids(t: pa.Table) -> pa.Table:
        # union null-fill in the join promotes the absent side's int
        # columns to float64 (values < 2^53, exact) — cast back
        return pa.table(
            {
                "id_a": t["id_a"].cast(pa.int64()),
                "id_b": t["id_b"].cast(pa.int64()),
                "text_a": t["text_a"],
            }
        )

    j = bucketed_hash_join(
        j.map_batches(fix_ids, batch_format="pyarrow"),
        docs.map_batches(as_b, batch_format="pyarrow"),
        key="id_b",
        n_buckets=n_buckets,
        left_schema=pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("text_a", pa.string())]
        ),
        right_schema=pa.schema([("id_b", pa.int64()), ("text_b", pa.string())]),
    )

    def verify(batch: pa.Table) -> pa.Table:
        ja = [
            jaccard(
                shingle_hashes(a or "", n=shingle_n),
                shingle_hashes(b or "", n=shingle_n),
            )
            for a, b in zip(batch["text_a"].to_pylist(), batch["text_b"].to_pylist())
        ]
        out = pa.table(
            {
                "id_a": batch["id_a"].cast(pa.int64()),
                "id_b": batch["id_b"].cast(pa.int64()),
                "jaccard": pa.array(ja, type=pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return j.map_batches(verify, batch_format="pyarrow")


def verify_jaccard_pairs(
    pairs: Dataset,
    docs_by_id: dict,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> Dataset:
    """Exact-Jaccard verification against a broadcast id→text dict —
    only for call sites that already hold a SMALL doc subset (e.g. one
    site's pages).  For corpus-scale verification use
    :func:`verify_jaccard_joined`."""
    import ray as _ray

    def verify(batch: pa.Table) -> pa.Table:
        docs = _ray.get(docs_by_id) if isinstance(docs_by_id, _ray.ObjectRef) else docs_by_id
        ja = []
        for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
            sa = shingle_hashes(docs.get(a, ""), n=shingle_n)
            sb = shingle_hashes(docs.get(b, ""), n=shingle_n)
            ja.append(jaccard(sa, sb))
        out = batch.append_column("jaccard", pa.array(ja, type=pa.float64()))
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return pairs.map_batches(verify, batch_format="pyarrow")


def connected_components(
    pairs: Dataset,
    max_rounds: int = 10,
    n_buckets: int = 32,
    strict: bool = True,
) -> Dataset:
    """Min-label propagation over the dup-pair edge list: returns
    (doc_id, component) where component = min doc id of the cluster.

    Fully distributed: each round is one bucketed hash-join (labels onto
    edges by peer) + a label-shortcut join (pointer doubling:
    ``label ← label(label)``) + one grouped Min — the driver never holds
    a label map, so giant near-dup graphs (boilerplate-heavy 100 TB
    crawls) never materialize anywhere.  The shortcut step makes chains
    collapse in O(log₂ diameter) rounds, so the default ``max_rounds=10``
    covers components of diameter ≈ 2¹⁰ (the one-hop-only variant needed
    a round PER diameter step).  Convergence is detected by the total
    label sum (labels decrease monotonically; the sum is a single tiny
    driver scalar per round); if the loop exits without converging the
    function RAISES (``strict=True``, default) rather than silently
    returning split labels — pass ``strict=False`` to get the partial
    labels for diagnostics."""
    from ray.data.aggregate import Sum as _Sum

    from crawler_ray.stages.joins import bucketed_hash_join

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch["id_a"].combine_chunks()
        b = batch["id_b"].combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([a, b]),
                "peer": pa.concat_arrays([b, a]),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        import ray.data as _rd

        return _rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "label": pa.array([], type=pa.int64()),
                }
            )
        )

    # init: label(node) = min(node, all direct peers).
    # NOTE the repartition: Ray's sort-shuffle output block count equals
    # its input block count, and each round's union feeds the previous
    # round's blocks back in — without re-bounding, the label table's
    # block count grows ~3× per round (geometric), and by round 8 every
    # shuffle is thousands of partitions wide for the same few rows.
    # Pinning labels to n_buckets blocks per round keeps every round's
    # shuffle width constant.
    labels = (
        edges.map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["peer"]}),
            batch_format="pyarrow",
        )
        .union(
            edges.map_batches(
                lambda t: pa.table({"node": t["node"], "label": t["node"]}),
                batch_format="pyarrow",
            )
        )
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .repartition(n_buckets)
        .materialize()
    )
    prev_total = labels.aggregate(_Sum("label", alias_name="total"))["total"]

    converged = False
    for _ in range(max_rounds):
        peer_labels = labels.map_batches(
            lambda t: pa.table({"peer": t["node"], "peer_label": t["label"]}),
            batch_format="pyarrow",
        )
        # pointer doubling: ONE join serves both steps — the edge list
        # unioned with the label table read as edges (node → label)
        # joined against peer_labels yields both the neighbor
        # propagation AND label ← label(label), so a chain a→b→c→…
        # halves its unresolved depth every round instead of shrinking
        # by one hop (O(log₂ diameter) rounds), at one all-to-all join
        # per round.
        combined = edges.union(
            labels.map_batches(
                lambda t: pa.table({"node": t["node"], "peer": t["label"]}),
                batch_format="pyarrow",
            )
        )
        prop = bucketed_hash_join(
            combined, peer_labels, key="peer", n_buckets=n_buckets,
            left_schema=pa.schema([("node", pa.int64()), ("peer", pa.int64())]),
            right_schema=pa.schema([("peer", pa.int64()), ("peer_label", pa.int64())]),
        )
        prop_lab = prop.map_batches(
            # join null-fill promoted the one-sided int columns to
            # float64 (ids < 2^53, exact) — cast back
            lambda t: pa.table(
                {
                    "node": t["node"].cast(pa.int64()),
                    "label": t["peer_label"].cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        new_labels = (
            prop_lab.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(n_buckets)  # re-bound block growth (see init)
            .materialize()
        )
        total = new_labels.aggregate(_Sum("label", alias_name="total"))["total"]
        labels = new_labels
        if total == prev_total:
            converged = True
            break
        prev_total = total
    if not converged:
        # one extra propagation round could still be a no-op (the sum
        # check needs one quiet round to prove convergence) — but rather
        # than guess, refuse to hand back possibly-split labels
        msg = (
            f"connected_components did not converge within {max_rounds} "
            "pointer-doubling rounds (component diameter > "
            f"2^{max_rounds}); raise max_rounds"
        )
        if strict:
            raise RuntimeError(msg)
        import logging

        logging.getLogger(__name__).warning(msg)
    return labels


# ------------------------------------------------------------- SimHash
class SimHashStage:
    def __init__(self, text_col: str = "text", hamming_threshold: int = 3):
        self.text_col = text_col
        self.threshold = hamming_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from crawler_ray.functions.arrow_utils import strip_md

        batch = strip_md(batch)
        sims = [simhash64(t or "") for t in batch[self.text_col].to_pylist()]
        return batch.append_column("simhash", pa.array(sims, type=pa.uint64()))


def simhash_near_dups(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    hamming_threshold: int = 3,
    n_chunks: int = 4,
    n_buckets: int = 32,
) -> Dataset:
    """SimHash near-dup pairs: pigeonhole banding (a pair within
    hamming ≤ n_chunks−1 shares at least one exact 64/n_chunks-bit
    chunk) → per-chunk bucket groupby → candidate pairs → exact
    hamming verify by joining pairs against the (id, simhash) table —
    no driver-side corpus map, so the verify scales with the pair set,
    not the corpus."""
    from crawler_ray.stages.joins import bucketed_hash_join

    sims = ds.map_batches(
        SimHashStage, fn_constructor_kwargs={"text_col": text_col},
        concurrency=(1, 16), batch_format="pyarrow",
    ).map_batches(
        # map-side projection: select_columns on the lazy stage would
        # pre-execute it for schema inference
        lambda t, c=(id_col, "simhash"): t.select(list(c)),
        batch_format="pyarrow",
    ).materialize()
    bits = 64 // n_chunks

    def explode(batch: pa.Table) -> pa.Table:
        ids, keys = [], []
        for i, h in zip(batch[id_col].to_pylist(), batch["simhash"].to_pylist()):
            h = int(h)
            for c in range(n_chunks):
                chunk = (h >> (c * bits)) & ((1 << bits) - 1)
                ids.append(i)
                keys.append(f"{c}:{chunk:x}")
        pkey = (
            pd.util.hash_array(np.asarray(keys, dtype=object), categorize=False)
            % np.uint64(64)
        ).astype(np.int64)
        return pa.table(
            {
                "chunk_key": pa.array(keys, type=pa.string()),
                id_col: pa.array(ids),
                "pkey": pa.array(pkey),
            }
        )

    exploded = sims.map_batches(explode, batch_format="pyarrow")

    neighbor_cap = 256

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        # factorize → contiguous segments (no per-group sub-DataFrame —
        # pandas groupby iteration allocates one per group, the measured
        # 20× n-gram-Jaccard pathology)
        from crawler_ray.functions.arrow_utils import table_from_pandas

        codes, _ = pd.factorize(g["chunk_key"], sort=False)
        order = np.argsort(codes, kind="stable")
        codes_s = codes[order]
        ids = g[id_col].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])
        ends = np.r_[starts[1:], len(codes_s)]
        sizes = ends - starts
        cols_a, cols_b, cols_c = [], [], []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            members = np.sort(ids[s:e])
            m = e - s
            # sorted-neighbor pairs at distance ≤ cap, generated
            # DIRECTLY — O(m·cap) work and memory.  Building the full
            # triu index arrays first (O(m²)) just to filter them would
            # allocate gigabytes on a degenerate bucket (50k boilerplate
            # docs sharing a simhash chunk ⇒ ~1.2e9 index pairs).  The
            # cap is RECORDED per pair (bucket_capped=1) so truncation
            # is never silent — same contract as the MinHash path.
            maxd = min(m - 1, neighbor_cap)
            capped = int(m - 1 > neighbor_cap)
            ia = np.concatenate([members[:-d] for d in range(1, maxd + 1)])
            ib = np.concatenate([members[d:] for d in range(1, maxd + 1)])
            cols_a.append(ia)
            cols_b.append(ib)
            cols_c.append(np.full(len(ia), capped, dtype=np.int64))
        if not cols_a:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "bucket_capped": pa.array([], type=pa.int64()),
                }
            )
        return table_from_pandas(
            pd.DataFrame(
                {
                    "id_a": np.concatenate(cols_a).astype(np.int64),
                    "id_b": np.concatenate(cols_b).astype(np.int64),
                    "bucket_capped": np.concatenate(cols_c),
                }
            )
        )

    pairs = exploded.groupby("pkey").map_groups(
        bucket_pairs, batch_format="pandas"
    ).materialize()
    if pairs.count() == 0:
        return pairs
    uniq = combine_pairs_by_hash(
        pairs,
        [("n_chunks_hit", None, "size"), ("bucket_capped", "bucket_capped", "max")],
    )

    # 64-bit hashes travel through the join as hex STRINGS: the join's
    # union null-fill promotes one-sided numeric columns to float64,
    # which is lossy above 2^53 — strings survive bit-exact.
    def sim_side(side: str):
        def f(t: pa.Table) -> pa.Table:
            hexes = [f"{int(h):016x}" for h in t["simhash"].to_pylist()]
            return pa.table(
                {f"id_{side}": t[id_col], f"sim_{side}": pa.array(hexes, type=pa.string())}
            )

        return f

    j = bucketed_hash_join(
        uniq, sims.map_batches(sim_side("a"), batch_format="pyarrow"),
        key="id_a", n_buckets=n_buckets,
        left_schema=pa.schema(
            [
                ("id_a", pa.int64()),
                ("id_b", pa.int64()),
                ("n_chunks_hit", pa.int64()),
                ("bucket_capped", pa.int64()),
            ]
        ),
        right_schema=pa.schema([("id_a", pa.int64()), ("sim_a", pa.string())]),
    )

    def fix_mid(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": t["id_a"].cast(pa.int64()),
                "id_b": t["id_b"].cast(pa.int64()),
                "n_chunks_hit": t["n_chunks_hit"].cast(pa.int64()),
                "bucket_capped": t["bucket_capped"].cast(pa.int64()),
                "sim_a": t["sim_a"],
            }
        )

    j = bucketed_hash_join(
        j.map_batches(fix_mid, batch_format="pyarrow"),
        sims.map_batches(sim_side("b"), batch_format="pyarrow"),
        key="id_b", n_buckets=n_buckets,
        left_schema=pa.schema(
            [
                ("id_a", pa.int64()),
                ("id_b", pa.int64()),
                ("n_chunks_hit", pa.int64()),
                ("bucket_capped", pa.int64()),
                ("sim_a", pa.string()),
            ]
        ),
        right_schema=pa.schema([("id_b", pa.int64()), ("sim_b", pa.string())]),
    )

    def verify(batch: pa.Table) -> pa.Table:
        hams = [
            bin(int(a, 16) ^ int(b, 16)).count("1")
            for a, b in zip(batch["sim_a"].to_pylist(), batch["sim_b"].to_pylist())
        ]
        out = pa.table(
            {
                "id_a": batch["id_a"].cast(pa.int64()),
                "id_b": batch["id_b"].cast(pa.int64()),
                "n_chunks_hit": batch["n_chunks_hit"].cast(pa.int64()),
                "bucket_capped": batch["bucket_capped"].cast(pa.int64()),
                "hamming": pa.array(hams, type=pa.int32()),
            }
        )
        return out.filter(pc.less_equal(out["hamming"], hamming_threshold))

    return j.map_batches(verify, batch_format="pyarrow")


def simhash_dedup_keys(ds: Dataset, text_col: str = "text", prefix_bits: int = 16) -> Dataset:
    """SimHash + block key (top ``prefix_bits`` bits): near-dup
    candidates share a block — the groupby key for banding 64-bit
    simhashes (rotation-banding generalizes this)."""
    sims = ds.map_batches(
        SimHashStage, fn_constructor_kwargs={"text_col": text_col},
        concurrency=(1, 16), batch_format="pyarrow",
    )

    def block(batch: pa.Table) -> pa.Table:
        arr = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = (arr >> np.uint64(64 - prefix_bits)).astype(np.uint64)
        return batch.append_column("simhash_block", pa.array(key, type=pa.uint64()))

    return sims.map_batches(block, batch_format="pyarrow")


# -------------------------------------------------- embedding near-dup
class CosineDupStage:
    """Bucketed embedding near-dup: rows arrive grouped by LSH bucket
    (random hyperplane signs); emits intra-bucket pairs with cosine ≥
    threshold.  Used via groupby(bucket).map_groups."""

    def __init__(self, threshold: float = 0.95):
        self.threshold = threshold

    def __call__(self, g: pd.DataFrame) -> pa.Table:
        ids = g["vec_id"].to_numpy()
        mat = np.stack(g["embedding"].to_numpy())
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= self.threshold
        # arrow block with a pinned schema: a no-pair bucket must emit
        # the SAME schema as a pair-producing one, or the downstream
        # executor logs per-bundle schema-unification warnings
        return pa.table(
            {
                "id_a": pa.array(
                    np.minimum(ids[ia[keep]], ids[ib[keep]]), type=pa.int64()
                ),
                "id_b": pa.array(
                    np.maximum(ids[ia[keep]], ids[ib[keep]]), type=pa.int64()
                ),
                "cosine": pa.array(sims[ia[keep], ib[keep]], type=pa.float64()),
            }
        )


def add_hyperplane_bucket(
    ds: Dataset, dim: int, n_planes: int = 8, seed: int = 42,
    vec_col: str = "embedding",
) -> Dataset:
    """Random-hyperplane LSH bucket id per row (vectorized matmul)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32)

    def bucket(batch: pa.Table) -> pa.Table:
        mat = np.stack(
            [np.asarray(v, dtype=np.float32) for v in batch[vec_col].to_pylist()]
        )
        signs = (mat @ planes) > 0
        key = np.packbits(signs, axis=1, bitorder="little")[:, 0].astype(np.int64)
        if n_planes > 8:
            packed = np.packbits(signs, axis=1, bitorder="little")
            key = packed @ (256 ** np.arange(packed.shape[1], dtype=np.int64))
        return batch.append_column("bucket", pa.array(key, type=pa.int64()))

    return ds.map_batches(bucket, batch_format="pyarrow")


def embedding_near_dups(
    ds: Dataset, dim: int, threshold: float = 0.95, n_planes: int = 8,
    exact: bool = False,
) -> Dataset:
    """Near-duplicate embedding pairs.  ``exact=True`` puts everything
    in one bucket (brute force — oracle-checkable); the LSH-bucketed
    path is the scale route (misses only cross-bucket pairs)."""
    if exact:
        with_bucket = ds.map_batches(
            lambda t: t.append_column("bucket", pa.array([0] * t.num_rows, type=pa.int64())),
            batch_format="pyarrow",
        )
    else:
        with_bucket = add_hyperplane_bucket(ds, dim=dim, n_planes=n_planes)
    stage = CosineDupStage(threshold)

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        return stage(g)  # CosineDupStage emits schema-pinned Arrow

    return with_bucket.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")


# -------------------------------------------------- winnowing fingerprints
def fingerprint_docs(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
    k: int = 8, w: int = 4,
) -> Dataset:
    """Map-only explode to (doc_id, fp:int64, n_fps) rows — one row
    per winnowing fingerprint (functions.fingerprint; rolling k-gram
    polynomial hash + rightmost-min window selection).  ``fp`` is the
    uint64 hash REINTERPRETED as int64 bit-pattern (may be negative):
    grouped aggregates on a uint64 key above 2**63 fall back to Ray's
    pickled-object Arrow extension column, so the key stays
    Arrow-native int64 end to end.  ``n_fps`` rides along so the union
    size of a pair is derivable without another scan."""
    from crawler_ray.functions.fingerprint import winnow_fingerprints

    def explode(batch: pa.Table) -> pa.Table:
        ids, fps, counts = [], [], []
        for d, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            f = winnow_fingerprints(t or "", k=k, w=w).view(np.int64)
            ids.extend([d] * len(f))
            fps.extend(f.tolist())
            counts.extend([len(f)] * len(f))
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "fp": pa.array(fps, type=pa.int64()),
                "n_fps": pa.array(counts, type=pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def fingerprint_near_dups(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    threshold: float = 0.5,
    max_df: int = 256,
) -> Dataset:
    """Near-duplicate pairs by winnowing-fingerprint resemblance
    |A∩B| / |A∪B| ≥ threshold — the sub-document dedup signal (shared
    passages count even when whole-doc MinHash dilutes them).

    Fingerprints present in more than ``max_df`` documents are STOP
    FINGERPRINTS — boilerplate k-grams (common words, shared chrome) —
    and are excluded from the fingerprint space (both intersection and
    union), the MOSS rule (Schleimer et al., SIGMOD 2003 §5 discard
    over-frequent fingerprints).  This is a semantic definition, not a
    truncation: resemblance is exact over the filtered space at any
    corpus size, and it bounds every fp's doc list at ``max_df`` so the
    pair explosion is O(df²) with df ≤ max_df — no silent caps anywhere.

    Shape (all bounded, nothing corpus-sized on the driver):
    1. pass A: document frequency per fp (per-batch partial counts →
       grouped sum); fps with df > max_df collect to a tiny driver-side
       stop set (boilerplate only) broadcast into pass B;
    2. pass B: re-explode with stop fps dropped and per-doc n_fps
       recomputed post-filter (the text is winnowed twice — two map
       scans instead of materializing the exploded corpus);
    3. co-locate by hash(fp) % 64 fixed partitions; within a partition
       every fp's doc list yields pairs vectorized (triu), list size
       ≤ max_df by construction (asserted, raise not cap);
    4. one grouped count per (id_a, id_b): the number of co-occurring
       fingerprints IS |A∩B| exactly (each shared fp contributes one
       pair row);
    5. |A∪B| = n_fps_a + n_fps_b − |A∩B| using the n_fps values carried
       through the pair rows (no join / second scan needed);
    6. filter resemblance ≥ threshold (double division of exact ints).
    """
    from crawler_ray.functions.fingerprint import winnow_fingerprints

    # ---- pass A: stop-fingerprint set (df > max_df) ----
    fps0 = fingerprint_docs(ds, text_col=text_col, id_col=id_col, k=k, w=w)

    def df_partial(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            batch["fp"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "fp": pa.array(vals, type=pa.int64()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    df_ds = (
        fps0.map_batches(df_partial, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(_Sum("n", alias_name="df"))
    )

    def keep_stops(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["df"], max_df))

    stop_pdf = df_ds.map_batches(
        keep_stops, batch_format="pyarrow"
    ).to_pandas()  # boilerplate fps only — tiny by definition
    stop_arr = np.sort(stop_pdf["fp"].to_numpy().astype(np.int64))

    # ---- pass B: explode with stop fps dropped, n_fps post-filter ----
    def explode_filtered(batch: pa.Table) -> pa.Table:
        ids, fps, counts = [], [], []
        for d, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            f = winnow_fingerprints(t or "", k=k, w=w).view(np.int64)
            if len(stop_arr):
                f = f[~np.isin(f, stop_arr)]
            ids.extend([d] * len(f))
            fps.extend(f.tolist())
            counts.extend([len(f)] * len(f))
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "fp": pa.array(fps, type=pa.int64()),
                "n_fps": pa.array(counts, type=pa.int64()),
            }
        )

    def add_pkey(batch: pa.Table) -> pa.Table:
        pk = (
            batch["fp"].to_numpy(zero_copy_only=False).view(np.uint64)
            % np.uint64(64)
        ).astype(np.int64)
        return batch.append_column("pkey", pa.array(pk))

    exploded = ds.map_batches(
        explode_filtered, batch_format="pyarrow"
    ).map_batches(add_pkey, batch_format="pyarrow")

    def pairs_of_partition(g: pd.DataFrame) -> pa.Table:
        # factorize → contiguous segments → triu per multi-doc fp; no
        # per-group sub-DataFrame (pandas groupby iteration allocates
        # one per group — the measured 20× n-gram-Jaccard pathology)
        from crawler_ray.functions.arrow_utils import table_from_pandas

        codes, _ = pd.factorize(g["fp"], sort=False)
        order = np.argsort(codes, kind="stable")
        codes_s = codes[order]
        ids = g[id_col].to_numpy()[order]
        nfs = g["n_fps"].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])
        ends = np.r_[starts[1:], len(codes_s)]
        sizes = ends - starts
        if sizes.size and int(sizes.max()) > max_df:
            # impossible post stop-filter; raise, never cap
            bad = int(np.argmax(sizes))
            raise RuntimeError(
                f"fingerprint {g['fp'].iloc[int(order[starts[bad]])]} has "
                f"df={int(sizes.max())} > max_df={max_df} after the "
                "stop-fingerprint pass — pass A missed it"
            )
        cols_a, cols_b, cols_na, cols_nb = [], [], [], []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            seg = np.argsort(ids[s:e])
            members = ids[s:e][seg]
            nf = nfs[s:e][seg]
            ia, ib = np.triu_indices(e - s, k=1)
            cols_a.append(members[ia])
            cols_b.append(members[ib])
            cols_na.append(nf[ia])
            cols_nb.append(nf[ib])
        frames = (
            [
                pd.DataFrame(
                    {
                        "id_a": np.concatenate(cols_a).astype(np.int64),
                        "id_b": np.concatenate(cols_b).astype(np.int64),
                        "nf_a": np.concatenate(cols_na).astype(np.int64),
                        "nf_b": np.concatenate(cols_nb).astype(np.int64),
                    }
                )
            ]
            if cols_a
            else []
        )
        if not frames:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "nf_a": pa.array([], type=pa.int64()),
                    "nf_b": pa.array([], type=pa.int64()),
                }
            )
        return table_from_pandas(pd.concat(frames, ignore_index=True))

    pairs = exploded.groupby("pkey").map_groups(
        pairs_of_partition, batch_format="pandas"
    )
    counted = combine_pairs_by_hash(
        pairs,
        [
            ("n_shared", None, "size"),
            ("nf_a", "nf_a", "max"),
            ("nf_b", "nf_b", "max"),
        ],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        inter = batch["n_shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        union = (
            batch["nf_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            + batch["nf_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            - inter
        )
        res = inter / np.maximum(union, 1)
        out = pa.table(
            {
                "id_a": batch["id_a"].cast(pa.int64()),
                "id_b": batch["id_b"].cast(pa.int64()),
                "n_shared": pa.array(inter),
                "resemblance": pa.array(res, type=pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["resemblance"], threshold))

    return counted.map_batches(finalize, batch_format="pyarrow")


# --------------------------------------------------- exact n-gram Jaccard
def ngram_jaccard_near_dups(
    ds: Dataset,
    tokenize,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
    max_df: int = 64,
    stop_budget_bytes: int = 64 << 20,
) -> Dataset:
    """EXACT n-gram Jaccard near-duplicate pairs: |A∩B| / |A∪B| ≥
    threshold_num/threshold_den over each document's DISTINCT word
    n-gram set — the ground-truth resemblance that MinHash-LSH
    (`minhash_candidate_pairs`) only approximates.

    Grams present in more than ``max_df`` documents are STOP GRAMS
    excluded from the gram space on BOTH sides of the resemblance
    (the Schleimer/MOSS over-frequent-discard rule, same contract as
    ``fingerprint_near_dups``): a semantic definition, not a
    truncation, so the result is exact over the filtered space at any
    corpus size and every gram's doc list is ≤ max_df, bounding the
    pair explosion at O(df²), df ≤ max_df.

    The threshold is a rational ``num/den`` compared in integer math
    (``den·|A∩B| ≥ num·|A∪B|``) so the Ray and SQL sides agree
    bit-for-bit with no float in the decision.

    Scale shape (identical to fingerprint_near_dups, with gram strings
    instead of winnowed hashes — at 100 TB prefer the winnowing
    variant, whose gram space is ~1/w of this one):
    1. pass A: df per distinct (doc, gram) → grouped sum; grams with
       df > max_df form the stop set. |stop| ≤ total gram occurrences
       / max_df; a byte budget RAISES (never silently truncates) if
       the broadcast would exceed ``stop_budget_bytes`` — raise
       max_df or switch to fingerprint_near_dups instead.
    2. pass B: re-explode distinct grams minus stops with per-doc
       post-filter gram counts (two map scans, nothing materialized).
    3. co-locate by stable_hash64(gram) % 64 fixed partitions; pairs
       per gram via vectorized triu, list ≤ max_df (asserted, raised).
    4. grouped count per (id_a, id_b) = |A∩B| exactly;
       |A∪B| = ng_a + ng_b − |A∩B| from counts carried on pair rows.
    """
    from collections import Counter

    from crawler_ray.functions.hashing import stable_hash64

    def doc_grams(text: str) -> set:
        toks = tokenize(text or "")
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    # ---- pass A: document frequency per gram → stop-gram set ----
    def df_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(doc_grams(t))
        return pa.table(
            {
                "gram": pa.array(list(c.keys()), type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    df_ds = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(_Sum("n", alias_name="df"))
    )

    def keep_stops(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["df"], max_df))

    stop_pdf = df_ds.map_batches(keep_stops, batch_format="pyarrow").to_pandas()
    # an all-filtered Dataset yields a zero-COLUMN frame, not zero rows
    if "gram" not in stop_pdf.columns:
        stop_pdf = pd.DataFrame({"gram": pd.Series([], dtype=str)})
    stop_bytes = int(stop_pdf["gram"].str.len().sum()) if len(stop_pdf) else 0
    if stop_bytes > stop_budget_bytes:
        raise ValueError(
            f"stop-gram set is {stop_bytes}B > budget {stop_budget_bytes}B: "
            "raise max_df or use fingerprint_near_dups (winnowed space)"
        )
    stop_set = frozenset(stop_pdf["gram"])

    # ---- pass B: explode distinct grams minus stops ----
    def explode_filtered(batch: pa.Table) -> pa.Table:
        ids, grams, counts, pkeys = [], [], [], []
        for d, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            g = doc_grams(t) - stop_set
            ids.extend([d] * len(g))
            counts.extend([len(g)] * len(g))
            for gr in g:
                grams.append(gr)
                pkeys.append(stable_hash64(gr) % 64)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "gram": pa.array(grams, type=pa.string()),
                "ng": pa.array(counts, type=pa.int64()),
                "pkey": pa.array(pkeys, type=pa.int64()),
            }
        )

    exploded = ds.map_batches(explode_filtered, batch_format="pyarrow")

    _EMPTY_PAIRS = pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "n_partial": pa.array([], type=pa.int64()),
            "ng_a": pa.array([], type=pa.int64()),
            "ng_b": pa.array([], type=pa.int64()),
            "pkey2": pa.array([], type=pa.int64()),
        }
    )

    def pairs_of_partition(g: pd.DataFrame) -> pa.Table:
        # Vectorized: factorize grams → contiguous group boundaries →
        # triu pairs only for multi-doc grams, then a MAP-SIDE COMBINE
        # (each gram lives in exactly one pkey partition, so summing
        # per-partition pair partials is exact) — the global shuffle
        # carries distinct (id_a, id_b) per partition, not one row per
        # shared gram (Σ C(df,2) rows — the naive per-gram-DataFrame
        # form was 20× slower at sf0.1).
        from crawler_ray.functions.arrow_utils import table_from_pandas

        codes, _ = pd.factorize(g["gram"], sort=False)
        order = np.argsort(codes, kind="stable")
        codes_s = codes[order]
        ids = g[id_col].to_numpy()[order]
        ngs = g["ng"].to_numpy()[order]
        starts = np.flatnonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])
        ends = np.r_[starts[1:], len(codes_s)]
        sizes = ends - starts
        if sizes.size and int(sizes.max()) > max_df:
            # impossible post stop-filter; raise, never cap
            bad = int(np.argmax(sizes))
            raise RuntimeError(
                f"gram {g['gram'].iloc[int(order[starts[bad]])]!r} has "
                f"df={int(sizes.max())} > max_df={max_df} after the "
                "stop-gram pass — pass A missed it"
            )
        cols_a, cols_b, cols_na, cols_nb = [], [], [], []
        for s, e in zip(starts[sizes >= 2], ends[sizes >= 2]):
            seg = np.argsort(ids[s:e])
            members = ids[s:e][seg]
            ngseg = ngs[s:e][seg]
            ia, ib = np.triu_indices(e - s, k=1)
            cols_a.append(members[ia])
            cols_b.append(members[ib])
            cols_na.append(ngseg[ia])
            cols_nb.append(ngseg[ib])
        if not cols_a:
            return _EMPTY_PAIRS
        pdf = pd.DataFrame(
            {
                "id_a": np.concatenate(cols_a).astype(np.int64),
                "id_b": np.concatenate(cols_b).astype(np.int64),
                "ng_a": np.concatenate(cols_na).astype(np.int64),
                "ng_b": np.concatenate(cols_nb).astype(np.int64),
            }
        )
        comb = (
            pdf.groupby(["id_a", "id_b"], sort=False)
            .agg(
                n_partial=("ng_a", "size"),
                ng_a=("ng_a", "first"),
                ng_b=("ng_b", "first"),
            )
            .reset_index()
        )
        # second-stage partition key so the GLOBAL pair reduction is a
        # 64-group single-key co-location + vectorized pandas sum — a
        # ray.data multi-key aggregate over millions of 1-row (id_a,
        # id_b) groups runs a per-group Python accumulator (~12k
        # rows/s measured at sf0.1: 100s of wall for 3s of real work)
        pkey2 = (
            comb["id_a"].to_numpy().astype(np.uint64)
            * np.uint64(2654435761)
            + comb["id_b"].to_numpy().astype(np.uint64)
        ) % np.uint64(64)
        comb["pkey2"] = pkey2.astype(np.int64)
        return table_from_pandas(
            comb[["id_a", "id_b", "n_partial", "ng_a", "ng_b", "pkey2"]]
        )

    pairs = exploded.groupby("pkey").map_groups(
        pairs_of_partition, batch_format="pandas"
    )

    def combine_pairs(g: pd.DataFrame) -> pa.Table:
        from crawler_ray.functions.arrow_utils import table_from_pandas

        comb = (
            g.groupby(["id_a", "id_b"], sort=False)
            .agg(
                n_shared=("n_partial", "sum"),
                ng_a=("ng_a", "first"),
                ng_b=("ng_b", "first"),
            )
            .reset_index()
        )
        return table_from_pandas(comb)

    counted = pairs.groupby("pkey2").map_groups(
        combine_pairs, batch_format="pandas"
    )

    def finalize(batch: pa.Table) -> pa.Table:
        inter = batch["n_shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        union = (
            batch["ng_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            + batch["ng_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            - inter
        )
        keep = threshold_den * inter >= threshold_num * union  # integer-exact
        out = pa.table(
            {
                "id_a": batch["id_a"].cast(pa.int64()),
                "id_b": batch["id_b"].cast(pa.int64()),
                "n_shared": pa.array(inter),
            }
        )
        return out.filter(pa.array(keep))

    return counted.map_batches(finalize, batch_format="pyarrow")
