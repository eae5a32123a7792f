"""Join operators beyond broadcast lookups.

- :func:`bucketed_hash_join`: both-sides-large equi-join via explicit
  hash bucketing (the portable Ray Data pattern from the guide: add
  ``bucket = hash(key) % B`` to both sides, co-group per bucket, merge
  matching buckets with pandas inside ``map_groups``).  Document B and
  salt hot keys with stages.shuffle when one key dominates.
- :func:`asof_join_groups`: per-key as-of join (``pd.merge_asof``
  within ts-sorted groups) — the streaming-shaped join the reference
  lacks but a training-data pipeline needs (latest-prior-event
  semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from crawler_ray.functions.arrow_utils import table_from_pandas


def _with_bucket(ds: Dataset, key: str, n_buckets: int, side: str) -> Dataset:
    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False)
        if np.issubdtype(keys.dtype, np.number):
            bucket = (keys.astype(np.int64) % n_buckets).astype(np.int64)
        else:
            # deterministic across processes (pandas siphash, fixed key)
            bucket = (
                pd.util.hash_array(keys.astype(object), categorize=False)
                % np.uint64(n_buckets)
            ).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket)).append_column(
            "_side", pa.array([side] * batch.num_rows, type=pa.string())
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def _align_to(unified: pa.Schema, own_names: frozenset):
    """Map fn: project a side onto the unified two-side schema — own
    columns cast to the declared type, the other side's columns filled
    with typed nulls, in one fixed column order.  With BOTH sides
    aligned, the union is single-schema, so Ray's executor never logs
    "RefBundle with a different schema" and block-schema dedup works."""

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = [
            t[fld.name].cast(fld.type)
            if fld.name in own_names
            else pa.nulls(n, type=fld.type)
            for fld in unified
        ]
        return pa.Table.from_arrays(arrays, schema=unified)

    return f


def bucketed_hash_join(
    left: Dataset,
    right: Dataset,
    key: str,
    n_buckets: int = 32,
    how: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> Dataset:
    """Partitioned hash join on an integer key: one union + one
    co-grouping shuffle; each bucket merges with pandas.

    ``how`` is ``'inner'``, ``'left'``, or ``'outer'`` (full).  The
    outer modes are bucket-local-correct because bucketing is a
    FUNCTION of the key: every row of a key, matched or not, lands in
    exactly one bucket, so emitting that bucket's unmatched rows with
    typed-null other-side columns loses nothing.  They REQUIRE both
    declared schemas — null fill needs the other side's column types,
    and the inner path's all-null-column heuristic cannot distinguish
    "unmatched side" from "absent side".  Unmatched rows surface with
    NULL (not 0/"") other-side columns, matching SQL LEFT/FULL JOIN.
    Note the union's schema-widening fills the other side's columns
    with nulls, so pandas promotes int64 columns to float64 inside a
    bucket — the declared-schema path casts back; typed consumers of
    the schemaless inner path must cast themselves.

    When both ``left_schema`` and ``right_schema`` are given (callers
    with map-side projections know them statically — deriving them here
    via ``ds.schema()`` would pre-execute the lazy upstream pipeline),
    both sides are pre-aligned onto one unified schema so the union is
    single-schema: no per-bundle schema-unification warnings, and
    Ray's block-schema dedup stays effective.
    """
    if how not in ("inner", "left", "outer"):
        raise ValueError(
            f"bucketed_hash_join supports how='inner'|'left'|'outer', got {how!r}"
        )
    if how != "inner" and (left_schema is None or right_schema is None):
        raise ValueError(
            f"bucketed_hash_join how={how!r} requires left_schema and "
            "right_schema (typed null fill for unmatched rows)"
        )
    if left_schema is not None and right_schema is not None:
        # fail fast: a non-key column on BOTH sides would get pandas
        # _x/_y suffixes from merge, so merged.select(out_schema.names)
        # would raise KeyError deep inside map_groups — surface it here
        shared = (set(left_schema.names) & set(right_schema.names)) - {key}
        if shared:
            raise ValueError(
                f"bucketed_hash_join: columns {sorted(shared)} appear on "
                f"both sides besides the join key {key!r}; rename or "
                "project one side first (pandas merge would suffix them "
                "_x/_y and break the declared output schema)"
            )
        fields = list(left_schema) + [
            f for f in right_schema if f.name not in left_schema.names
        ]
        unified = pa.schema(fields)
        left = left.map_batches(
            _align_to(unified, frozenset(left_schema.names)), batch_format="pyarrow"
        )
        right = right.map_batches(
            _align_to(unified, frozenset(right_schema.names)), batch_format="pyarrow"
        )
    tagged = _with_bucket(left, key, n_buckets, "l").union(
        _with_bucket(right, key, n_buckets, "r")
    )
    # with declared schemas, recover each side's columns BY NAME — the
    # dropna heuristic would silently drop a column that is legitimately
    # all-null within one bucket, producing inconsistent block schemas —
    # and pin every output block (incl. empties) to the joined schema,
    # so the whole join stream is single-schema (no per-bundle
    # schema-unification warnings, block-schema dedup stays effective)
    l_names = list(left_schema.names) if left_schema is not None else None
    r_names = list(right_schema.names) if right_schema is not None else None
    out_schema = None
    if left_schema is not None and right_schema is not None:
        out_schema = pa.schema(
            list(left_schema)
            + [f for f in right_schema if f.name not in left_schema.names]
        )

    def merge_bucket(g: pd.DataFrame) -> pa.Table:
        # return ARROW blocks (incl. the empty case): empty no-column
        # pandas frames would pass through downstream map stages
        # unconverted and crash later all-to-alls with mixed block types
        l = g[g["_side"] == "l"].drop(columns=["_side", "bucket"])
        r = g[g["_side"] == "r"].drop(columns=["_side", "bucket"])
        if l_names is not None and r_names is not None:
            l, r = l[l_names], r[r_names]
        else:
            l = l.dropna(axis=1, how="all")
            r = r.dropna(axis=1, how="all")
        if (
            (how == "inner" and (l.empty or r.empty))
            or (how == "left" and l.empty)
            or (how == "outer" and l.empty and r.empty)
        ):
            return out_schema.empty_table() if out_schema is not None else pa.table({})
        # pandas merge handles an empty side for left/outer: the missing
        # side's columns come back all-NaN, which from_pandas maps to
        # nulls and the out_schema cast types correctly
        merged = table_from_pandas(l.merge(r, on=key, how=how))
        if out_schema is not None:
            merged = merged.select(out_schema.names).cast(out_schema)
        return merged

    return tagged.groupby("bucket").map_groups(merge_bucket, batch_format="pandas")


def bucketed_filter_join(
    left: Dataset,
    right_keys: Dataset,
    key: str,
    mode: str = "semi",
    n_buckets: int = 32,
    left_schema: pa.Schema | None = None,
) -> Dataset:
    """Semi / anti join with both sides large: keep left rows whose
    ``key`` does (semi) or does not (anti) appear in ``right_keys``.

    The right side is projected to the bare key column map-side, so the
    co-grouping shuffle moves only (key, bucket) for it — at 100 TB the
    filter side is a column, not a table.  Unlike ``bucketed_hash_join``
    the empty-right bucket is NOT an early-out: for anti it must pass
    the whole left side through.  Output blocks are pinned to
    ``left_schema`` (pass it to keep the pipeline single-schema and
    lazy; deriving it here via ``ds.schema()`` would pre-execute)."""
    if mode not in ("semi", "anti"):
        raise ValueError(f"mode must be 'semi' or 'anti', got {mode!r}")

    def key_only(t: pa.Table) -> pa.Table:
        return t.select([key])

    right = right_keys.map_batches(key_only, batch_format="pyarrow")
    if left_schema is not None:
        # align BOTH sides onto the left schema (the right side carries
        # only `key`; its other columns become typed nulls) so the union
        # is single-schema — no per-bundle schema-unification warnings
        left = left.map_batches(
            _align_to(left_schema, frozenset(left_schema.names)),
            batch_format="pyarrow",
        )
        right = right.map_batches(
            _align_to(left_schema, frozenset([key])), batch_format="pyarrow"
        )
    tagged = _with_bucket(left, key, n_buckets, "l").union(
        _with_bucket(right, key, n_buckets, "r")
    )
    out_names = list(left_schema.names) if left_schema is not None else None

    def filter_bucket(g: pd.DataFrame) -> pa.Table:
        l = g[g["_side"] == "l"].drop(columns=["_side", "bucket"])
        rk = g.loc[g["_side"] == "r", key]
        if out_names is not None:
            l = l[out_names]
        else:
            l = l.dropna(axis=1, how="all")
        hit = l[key].isin(set(rk))
        kept = l[hit] if mode == "semi" else l[~hit]
        if left_schema is not None:
            if kept.empty:
                # typed empty block — an empty pandas frame's object
                # columns would otherwise cast to null type and break
                # the all-empty-result schema
                return left_schema.empty_table()
            return table_from_pandas(kept).cast(left_schema)
        if kept.empty:
            return pa.table({})
        return table_from_pandas(kept)

    return tagged.groupby("bucket").map_groups(filter_bucket, batch_format="pandas")


def skew_aware_hash_join(
    left: Dataset,
    right: Dataset,
    key: str,
    n_buckets: int = 32,
    hot_fraction: float = 0.1,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    broadcast_budget_bytes: int = 256 << 20,
) -> Dataset:
    """Inner equi-join that routes HOT keys around the shuffle.

    A single dominant key (one host with half the corpus) makes one
    bucket of :func:`bucketed_hash_join` as large as the whole skewed
    side — the classic straggler.  This wrapper:

    1. histograms the LEFT key map-side (combiner → tiny groupby) and
       picks keys holding > ``hot_fraction`` of rows,
    2. joins hot-key left rows MAP-SIDE against a ``ray.put`` broadcast
       of the hot-key right rows (no shuffle touches the hot rows),
    3. joins the cold remainder with the normal bucketed shuffle join,
    4. unions the two streams (schemas pre-aligned when given).

    Partitioning assumption (documented AND enforced): the RIGHT side
    of each hot key fits in the object store — the fact⋈dimension skew
    shape.  ``broadcast_budget_bytes`` (default 256 MiB) hard-caps the
    driver-side hot-right concat; exceeding it RAISES with guidance to
    salt the key (stages.shuffle.add_salted_key) and merge the salted
    partials instead — a violated assumption must fail loudly, not OOM
    the driver.

    Cost note: ``left`` is evaluated up to THREE times (histogram +
    the two routed scans) and ``right`` twice — re-scanning is the
    right trade at 100 TB versus caching the input, but when the
    upstream pipeline feeding ``left`` is itself expensive, write it
    to parquet (or ``materialize()`` a small one) first."""
    from crawler_ray.stages.shuffle import hot_keys_above

    hot = hot_keys_above(left, key, fraction=hot_fraction)
    if not hot:
        return bucketed_hash_join(
            left, right, key=key, n_buckets=n_buckets,
            left_schema=left_schema, right_schema=right_schema,
        )
    hot_set = set(hot)

    def split(want_hot: bool):
        def f(t: pa.Table) -> pa.Table:
            mask = np.asarray(
                [v in hot_set for v in t[key].to_pylist()], dtype=bool
            )
            return t.filter(pa.array(mask if want_hot else ~mask))

        return f

    # hot path: broadcast the right rows of the hot keys once (small by
    # the enforced assumption; streamed batch-wise with a running byte
    # budget, never the whole right side)
    hot_batches: list[pa.Table] = []
    hot_bytes = 0
    for b in right.map_batches(split(True), batch_format="pyarrow").iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        hot_bytes += b.nbytes
        if hot_bytes > broadcast_budget_bytes:
            raise ValueError(
                f"skew_aware_hash_join: hot-key right side exceeds the "
                f"{broadcast_budget_bytes >> 20} MiB broadcast budget "
                f"(hot keys {sorted(map(str, hot_set))[:5]}...). Both sides "
                f"of a hot key are large — salt the key instead "
                f"(stages.shuffle.add_salted_key) and merge salted partials."
            )
        hot_batches.append(b)
    if not hot_batches:
        # the right side has no rows for any hot key: the hot-left rows
        # can find no partner, so the plain bucketed join over the FULL
        # sides is exact (and pa.concat_tables([]) would raise)
        return bucketed_hash_join(
            left, right, key=key, n_buckets=n_buckets,
            left_schema=left_schema, right_schema=right_schema,
        )
    hot_right_tbl = pa.concat_tables(hot_batches)
    hot_right_ref = ray.put(hot_right_tbl.to_pandas())

    def broadcast_merge(t: pa.Table) -> pa.Table:
        rdf = ray.get(hot_right_ref)
        merged = t.to_pandas().merge(rdf, on=key, how="inner")
        return table_from_pandas(merged)

    hot_joined = left.map_batches(split(True), batch_format="pyarrow").map_batches(
        broadcast_merge, batch_format="pyarrow"
    )
    cold_joined = bucketed_hash_join(
        left.map_batches(split(False), batch_format="pyarrow"),
        right.map_batches(split(False), batch_format="pyarrow"),
        key=key, n_buckets=n_buckets,
        left_schema=left_schema, right_schema=right_schema,
    )
    if left_schema is not None and right_schema is not None:
        out_schema = pa.schema(
            list(left_schema)
            + [f for f in right_schema if f.name not in left_schema.names]
        )
        align = _align_to(out_schema, frozenset(out_schema.names))
        hot_joined = hot_joined.map_batches(align, batch_format="pyarrow")
        cold_joined = cold_joined.map_batches(align, batch_format="pyarrow")
    return hot_joined.union(cold_joined)


def bloom_filter_join(
    left: Dataset,
    right_keys: Dataset,
    key: str,
    mode: str = "semi",
    fp_rate: float = 0.001,
    capacity_hint: int | None = None,
    n_buckets: int = 32,
    left_schema: pa.Schema | None = None,
) -> Dataset:
    """Bloom-accelerated semi/anti join: a broadcast Bloom over the
    right keys prefilters the left side MAP-SIDE, so the co-grouping
    shuffle carries only the rows the Bloom cannot decide.

    - Build: per-batch partial Blooms over the right keys (map_batches
      → tiny fixed-size bitset blobs), OR-merged on the driver
      (mergeable-sketch pattern), shipped once via ``ray.put``.
    - Prefilter: a Bloom miss is DEFINITE absence.  semi → drop misses
      immediately; anti → emit misses immediately (both exact).  Only
      Bloom HITS — true matches plus ~fp_rate·|left| false positives —
      continue to the exact :func:`bucketed_filter_join`.
    - Shuffle volume: |hits| instead of |left|, and the right side
      still ships key-only.  The result is EXACT for any fp_rate (false
      positives are re-checked; misses are never wrong by construction).

    ``capacity_hint`` sizes the Bloom (defaults to ``right_keys.count()``
    — an extra pass; pass the hint when the caller knows the
    cardinality, and size it to the key CARDINALITY, not the row
    count — the bitset and every per-batch partial scale with it).
    Keys are hashed as strings (int keys stringify).

    Cost note: ``right_keys`` is evaluated twice (Bloom build +
    verify), and in anti mode ``left`` twice (definite-miss scan +
    maybe scan) — map-only re-scans, the standard trade versus
    caching; pre-write expensive upstreams first."""
    from crawler_ray.state.bloom import BloomFilter

    if mode not in ("semi", "anti"):
        raise ValueError(f"mode must be 'semi' or 'anti', got {mode!r}")
    capacity = capacity_hint if capacity_hint is not None else right_keys.count()
    capacity = max(64, int(capacity))

    def partial_bloom(t: pa.Table) -> pa.Table:
        bf = BloomFilter(capacity, fp_rate)
        bf.add_many([str(v) for v in t[key].to_pylist()])
        return pa.table({"blob": pa.array([bf.to_bytes()], type=pa.binary())})

    merged = BloomFilter(capacity, fp_rate)
    for row in right_keys.map_batches(partial_bloom, batch_format="pyarrow").take_all():
        other = BloomFilter.from_bytes(row["blob"])
        merged.bits |= other.bits
        merged.count += other.count
    bloom_ref = ray.put(merged.to_bytes())

    class Prefilter:
        """hit=True keeps Bloom hits (semi verify set); hit=False keeps
        Bloom misses (anti definite set).  One actor-cached Bloom per
        worker — the bitset deserializes once, not per batch."""

        def __init__(self, keep_hits: bool):
            self.bf = BloomFilter.from_bytes(ray.get(bloom_ref))
            self.keep_hits = keep_hits

        def __call__(self, t: pa.Table) -> pa.Table:
            hits = self.bf.contains_many([str(v) for v in t[key].to_pylist()])
            mask = hits if self.keep_hits else ~hits
            return t.filter(pa.array(mask))

    if left_schema is not None:
        left = left.map_batches(
            _align_to(left_schema, frozenset(left_schema.names)),
            batch_format="pyarrow",
        )
    maybe = left.map_batches(
        Prefilter, fn_constructor_args=(True,), concurrency=(1, 8),
        batch_format="pyarrow",
    )
    verified = bucketed_filter_join(
        maybe, right_keys, key=key, mode=mode, n_buckets=n_buckets,
        left_schema=left_schema,
    )
    if mode == "semi":
        return verified
    definite = left.map_batches(
        Prefilter, fn_constructor_args=(False,), concurrency=(1, 8),
        batch_format="pyarrow",
    )
    return definite.union(verified)


def asof_join_groups(
    ds: Dataset,
    key: str,
    ts_col: str,
    left_filter,
    right_filter,
    value_col: str,
    out_col: str,
    tiebreak_col: str | None = None,
) -> Dataset:
    """Within each ``key`` group, for every left row find the latest
    right row with ``right.ts <= left.ts`` and emit its ``value_col``
    (null when none).  Partitioning assumption: one key's rows fit one
    group (salt by time range when a key is pathologically hot)."""

    def per_key(g: pd.DataFrame) -> pa.Table:
        sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
        lhs = g[left_filter(g)].sort_values(sort_cols)
        rhs = g[right_filter(g)].sort_values(sort_cols)
        if lhs.empty:
            # arrow empty (no-column pandas frames pass through later
            # pyarrow map stages unconverted and crash the all-to-all)
            return pa.table({})
        if rhs.empty:
            out = lhs.copy()
            out[out_col] = pd.NaT if np.issubdtype(g[value_col].dtype, np.datetime64) else None
            return table_from_pandas(out)
        rr = rhs[[ts_col]].copy()  # value_col may BE ts_col — copy, don't rename
        rr[out_col] = rhs[value_col].to_numpy()
        merged = pd.merge_asof(
            lhs,
            rr,
            on=ts_col,
            direction="backward",
            allow_exact_matches=True,
        )
        return table_from_pandas(merged)

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


# ------------------------------------------------------------- range join
def range_join_broadcast(
    ds: Dataset,
    value_col: str,
    intervals: pa.Table,
    lo_col: str = "lo",
    hi_col: str = "hi",
    keep_cols: tuple = ("label",),
    unmatched: str = "drop",
) -> Dataset:
    """Range (band) join of a big dataset against a SMALL table of
    non-overlapping, ascending intervals ``[lo, hi)`` — the broadcast
    side of an interval join (price bands, latency buckets, date
    ranges).  The reference has no joins at all; at 100 TB this is the
    only sane shape for a banded classification: the interval table is
    ``ray.put`` ONCE and every batch resolves membership with ONE
    vectorized ``np.searchsorted`` over the sorted lower bounds — no
    shuffle, no per-row loop, no cross product.

    ``hi`` may be null/inf on the last interval (open-ended).
    Intervals MUST be non-overlapping and sorted ascending by ``lo``
    (validated once up front — raise, not silently misclassify).
    ``unmatched='drop'`` filters rows outside every interval;
    ``'keep'`` emits them with null band columns.
    """
    los = np.asarray(intervals[lo_col].to_pylist(), dtype=np.float64)
    his = np.asarray(
        [np.inf if v is None else v for v in intervals[hi_col].to_pylist()],
        dtype=np.float64,
    )
    if not (np.all(np.diff(los) > 0) and np.all(his[:-1] <= los[1:]) and np.all(los < his)):
        raise ValueError(
            "range_join_broadcast requires non-overlapping ascending "
            "[lo, hi) intervals sorted by lo"
        )
    keep = {c: intervals[c].to_pylist() for c in keep_cols}
    ref = ray.put((los, his, keep))

    def classify(batch: pa.Table) -> pa.Table:
        los_, his_, keep_ = ray.get(ref)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(los_, v, side="right") - 1
        ok = (idx >= 0) & (v < his_[np.clip(idx, 0, len(his_) - 1)])
        if unmatched == "drop":
            batch = batch.filter(pa.array(ok))
            idx = idx[ok]
            ok = np.ones(len(idx), dtype=bool)
        out = batch
        for c, vals in keep_.items():
            arr = np.array(vals, dtype=object)[np.clip(idx, 0, len(vals) - 1)]
            arr[~ok] = None
            out = out.append_column(c, pa.array(arr.tolist()))
        return out

    return ds.map_batches(classify, batch_format="pyarrow")
