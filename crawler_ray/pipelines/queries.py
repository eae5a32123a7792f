"""Named operator queries over the driver testdata tables.

Each ``q_*`` function takes ``sf_dir`` and returns a Dataset / pyarrow
Table / pandas DataFrame; ``ORACLE_SQL`` holds the DuckDB-equivalent
SQL the driver runs side-by-side (CORRECTNESS gate).  Column names and
value semantics are kept bit-identical between both sides:

- sums over money/quantity columns are integer *cents* (float sums are
  order-dependent across engines; integer sums are exact),
- averages are computed as one double division of exact integer sums,
- derived scores mirror the reference formulas with identical
  operation order (crawler_ray.functions.textops docstrings cite the
  reference lines).

Scale shapes: reads prune columns (`columns=[...]`), aggregates
pre-combine inside ``map_batches`` before the groupby shuffle, small
join sides are broadcast via ``ray.put``, top-k merges per-block
partials.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from crawler_ray.functions.arrow_utils import hash_pkey, strip_md, table_from_pandas
from crawler_ray.functions.textops import content_quality
from crawler_ray.functions.textstats import detect_language, whitespace_token_count


def _read(path: str, columns=None, **kw):
    # Size-proportional block count: Ray oversplits small files (e.g. a
    # 0.6 MB file into 64 blocks to reach CPU parallelism), and sort-
    # shuffle partition count inherits the block count — so every
    # downstream groupby pays a 64-partition all-to-all for kilobytes of
    # data.  ~1 MB per block keeps small-SF shuffles narrow while large
    # inputs still fan out; real deployments read many files/row-groups
    # and never hit this path's ceiling.
    import os as _os

    is_dir = _os.path.isdir(path)
    if "override_num_blocks" not in kw:
        if is_dir:
            size = sum(
                _os.path.getsize(_os.path.join(r, f))
                for r, _, fs in _os.walk(path)
                for f in fs
            )
        else:
            size = _os.path.getsize(path)
        kw["override_num_blocks"] = max(4, min(64, size // (1 << 20) + 1))
    # read with an explicitly metadata-FREE schema: the driver's parquet
    # carries b'pandas' schema metadata whose dict payload makes
    # pa.Schema unhashable — Ray's read workers then log "Failed to
    # hash the schemas (for deduplication)" per block.  Declaring the
    # stripped (and column-projected) schema at the read kills the
    # warning at the source; strip_md stays as a fused no-op guard for
    # any metadata a downstream stage re-attaches.
    if "schema" not in kw:
        import pyarrow.parquet as _pq

        if is_dir:
            # read_schema wants one file; for a directory take the first
            # fragment's schema (all fragments share it by construction)
            full = (
                _pq.ParquetDataset(path).schema.remove_metadata()
            )
        else:
            full = _pq.read_schema(path).remove_metadata()
        # the declared schema must EQUAL the projected columns (Ray
        # casts read blocks to it), and a row filter's fields must be
        # inside it — callers list filter fields in `columns` and drop
        # them in a downstream projection if unwanted
        kw["schema"] = (
            pa.schema([full.field(c) for c in columns]) if columns else full
        )
    return rd.read_parquet(path, columns=columns, **kw).map_batches(
        strip_md, batch_format="pyarrow"
    )


def _doc(sf_dir: str, columns=None):
    return _read(f"{sf_dir}/documents.parquet", columns=columns)


# ------------------------------------------------------------------ 1
def q_kb_pattern_aggregate(sf_dir: str):
    """KB score aggregate (knowledge_base.py:43-51 shape): grouped
    totals + count + rounded average, with per-batch partial combine
    before the shuffle."""
    ds = _doc(sf_dir, ["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("source", as_index=False)["n_chars"].agg(
            ["sum", "count"]
        )
        df.columns = ["pattern", "ts", "n"]
        return table_from_pandas(df)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pattern")
        .aggregate(Sum("ts", alias_name="total_score"), Sum("n", alias_name="cnt"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        total = batch["total_score"].to_numpy(zero_copy_only=False)
        cnt = batch["cnt"].to_numpy(zero_copy_only=False)
        avg = np.round(total * 1.0 / cnt, 3)
        return batch.append_column("avg_score", pa.array(avg, type=pa.float64()))

    return agg.map_batches(finalize, batch_format="pyarrow")


# ------------------------------------------------------------------ 2
def q_exact_dedup_first(sf_dir: str):
    """Exact content dedup: first (min doc_id) per md5 hash + group size
    (ledger first-seen semantics, processed_ledger.py:35-41)."""
    ds = _doc(sf_dir, ["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hashes = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
        df = pd.DataFrame({"content_hash": hashes, "doc_id": ids})
        g = df.groupby("content_hash", as_index=False).agg(
            first_doc_id=("doc_id", "min"), n_docs=("doc_id", "size")
        )
        return table_from_pandas(g)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(
            Min("first_doc_id", alias_name="first_doc_id"),
            Sum("n_docs", alias_name="n_docs"),
        )
    )


# ------------------------------------------------------------------ 3
def q_token_counts(sf_dir: str):
    ds = _doc(sf_dir, ["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        n = [whitespace_token_count(t or "") for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pa.array(n, type=pa.int64())}
        )

    return ds.map_batches(count, batch_format="pyarrow")


# ------------------------------------------------------------------ 4
def q_doc_quality(sf_dir: str):
    """Reference content-quality heuristic per document
    (high_performance_extractor.py:409-447)."""
    ds = _doc(sf_dir, ["doc_id", "text"])

    def score(batch: pa.Table) -> pa.Table:
        q = [content_quality(t or "") for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "quality": pa.array(q, type=pa.float64())}
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ------------------------------------------------------------------ 5
def q_lang_distribution(sf_dir: str):
    ds = _doc(sf_dir, ["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


# ------------------------------------------------------------------ 6
def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type (streaming-shaped op as a
    groupby over (type, window))."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # DuckDB's .df() yields datetime64[us]; pin the same unit here so
        # the driver's dtype-sensitive value hash sees identical columns
        df["hour"] = df["ts"].dt.floor("h").astype("datetime64[us]")
        df["cents"] = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")
        )
        return table_from_pandas(g)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
    )

    def fix_unit(batch: pa.Table) -> pa.Table:
        # the groupby shuffle downcasts hour-aligned timestamps to [s];
        # restore [us] to match DuckDB's .df() output dtype exactly
        i = batch.schema.get_field_index("hour")
        return batch.set_column(i, "hour", batch["hour"].cast(pa.timestamp("us")))

    return agg.map_batches(fix_unit, batch_format="pyarrow")


# ------------------------------------------------------------------ 7
def q_nation_order_stats(sf_dir: str):
    """Broadcast join: orders ⋈ customer ⋈ nation (both small sides via
    ray.put dict lookups — no shuffle join)."""
    cust = _read(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = _read(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    cust_map = dict(zip(cust["c_custkey"], cust["c_nationkey"]))
    nation_map = dict(zip(nation["n_nationkey"], nation["n_name"]))
    # broadcast threshold: this dict-broadcast join is right while the
    # small side fits comfortably in the object store (customer is
    # ~SF × 150k rows × 2 ints ≈ 2.4 MB/SF — fine up to SF in the
    # thousands); past that, switch to stages.joins.bucketed_hash_join
    # (customer grows with SF; nation/region never do)
    lookup_ref = ray.put((cust_map, nation_map))

    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        cm, nm = ray.get(lookup_ref)
        df = batch.to_pandas()
        df["nation"] = df["o_custkey"].map(cm).map(nm)
        df["cents"] = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = df.groupby("nation", as_index=False).agg(
            n_orders=("cents", "size"), revenue_cents=("cents", "sum")
        )
        return table_from_pandas(g)

    return (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("nation")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
    )


# ------------------------------------------------------------------ 8
Q1_CUTOFF = "1998-09-02"


def q_lineitem_agg(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate with predicate pushdown at the
    read and per-batch partial combine."""
    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_shipdate"],
        filter=(pc.field("l_shipdate") <= pa.scalar(np.datetime64(Q1_CUTOFF, "us"))),
    )

    # pin the partial-aggregate block schema: an all-filtered-out batch
    # yields an EMPTY pandas groupby whose object key columns convert to
    # arrow `null` type — a different block schema, which trips the
    # executor's "RefBundle with a different schema" warning downstream
    partial_schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("sum_qty_cents", pa.int64()),
            ("sum_price_cents", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["qty_c"] = np.round(df["l_quantity"].to_numpy() * 100).astype(np.int64)
        df["price_c"] = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty_cents=("qty_c", "sum"),
            sum_price_cents=("price_c", "sum"),
            n=("qty_c", "size"),
        )
        return table_from_pandas(g).cast(partial_schema)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        # coalesce the partials (≤ |groups| rows per block) before the
        # groupby: the sort-shuffle's partition count inherits the block
        # count, and 64 partitions over 6 groups yields 58 EMPTY reduce
        # outputs whose no-column blocks trip the executor's RefBundle
        # schema warning.  4 blocks of combined partials is all the
        # shuffle this aggregate needs at any scale — the per-batch
        # combine already shrank the data to |groups| rows per block.
        .repartition(4)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty_cents", alias_name="sum_qty_cents"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("n", alias_name="n"),
        )
    )


def q_lineitem_corr(sf_dir: str):
    """Grouped Pearson correlation corr(l_quantity, l_extendedprice)
    per l_returnflag, from EXACT integer sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²) — the textbook mergeable aggregate, so
    one map-side combine per block and a |flags|-row shuffle.

    Exactness is the whole design: price is integer cents and per-row
    y² ≈ 1.1e14 would overflow an int64 SUM within a single 100k-row
    batch, so Σy² / Σxy / Σy travel as TWO int64 limbs (hi = Σ(v>>32),
    lo = Σ(v & 0xffffffff)) with a per-batch carry renormalization
    (lo's overflow folded into hi after each combine).  That keeps
    every shipped column exact in int64 up to ~2e9 blocks per group
    (hi ≤ 2.6e9 per block partial); the driver reconstructs arbitrary-
    precision Python ints from the ≤ |flags| final rows and evaluates
    the correlation there — bit-identical to the DuckDB twin, which
    computes the same integer sums in HUGEINT and the same final
    double expression.  x stays single-limb: quantities are ≤ 50 whole
    units, so Σx / Σx² fit int64 beyond 1e15 rows per group."""
    ds = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    _MASK = (1 << 32) - 1
    partial_schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("n", pa.int64()),
            ("sx", pa.int64()),
            ("sxx", pa.int64()),
            ("sy_hi", pa.int64()),
            ("sy_lo", pa.int64()),
            ("sxy_hi", pa.int64()),
            ("sxy_lo", pa.int64()),
            ("syy_hi", pa.int64()),
            ("syy_lo", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        x = np.round(df["l_quantity"].to_numpy()).astype(np.int64)
        y = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        y2 = y * y  # ≤ ~1.1e14 per row: fits int64 per ROW, not per sum
        df2 = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "x": x,
                "xx": x * x,
                "y": y,
                "xy": x * y,
                # y² split per row BEFORE summing: a batch-level split
                # would already have overflowed the batch sum
                "y2_hi": y2 >> 32,
                "y2_lo": y2 & _MASK,
            }
        )
        g = df2.groupby("l_returnflag", as_index=False).agg(
            n=("x", "size"),
            sx=("x", "sum"),
            sxx=("xx", "sum"),
            sy=("y", "sum"),
            sxy=("xy", "sum"),
            syy_hi=("y2_hi", "sum"),
            syy_lo=("y2_lo", "sum"),
        )
        # carry renormalization: fold each batch sum's high bits into
        # the hi limb so the GLOBAL Sum of lo limbs stays < 2^32/block
        for col, hi, lo in (("sy", "sy_hi", "sy_lo"), ("sxy", "sxy_hi", "sxy_lo")):
            g[hi] = g[col].to_numpy() >> 32
            g[lo] = g[col].to_numpy() & _MASK
        carry = g["syy_lo"].to_numpy() >> 32
        g["syy_hi"] = g["syy_hi"].to_numpy() + carry
        g["syy_lo"] = g["syy_lo"].to_numpy() & _MASK
        return table_from_pandas(
            g[[f.name for f in partial_schema]]
        ).cast(partial_schema)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(4)  # same narrow-shuffle rationale as q_lineitem_agg
        .groupby("l_returnflag")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
            Sum("sy_hi", alias_name="sy_hi"),
            Sum("sy_lo", alias_name="sy_lo"),
            Sum("sxy_hi", alias_name="sxy_hi"),
            Sum("sxy_lo", alias_name="sxy_lo"),
            Sum("syy_hi", alias_name="syy_hi"),
            Sum("syy_lo", alias_name="syy_lo"),
        )
        .to_pandas()  # ≤ |return flags| rows (3) by construction
    )

    rows = []
    for r in agg.itertuples(index=False):
        # arbitrary-precision reconstruction: int64 limbs → Python ints
        n, sx, sxx = int(r.n), int(r.sx), int(r.sxx)
        sy = (int(r.sy_hi) << 32) + int(r.sy_lo)
        sxy = (int(r.sxy_hi) << 32) + int(r.sxy_lo)
        syy = (int(r.syy_hi) << 32) + int(r.syy_lo)
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        corr = round(num / math.sqrt(float(vx) * float(vy)), 6)
        rows.append((r.l_returnflag, n, corr))
    return (
        pd.DataFrame(rows, columns=["l_returnflag", "n", "corr_qty_price"])
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )


# ------------------------------------------------------------------ 9
def q_top_docs_by_tokens(sf_dir: str):
    """Top-k: sort by token count desc (doc_id asc tiebreak), limit 10.
    Per-block partial top-k (the shuffle carries ≤10 rows per block),
    then a tiny driver merge — same shape as stages.ann."""
    counted = q_token_counts(sf_dir)

    def partial_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).head(10)
        return table_from_pandas(df)

    pruned = counted.map_batches(partial_topk, batch_format="pyarrow")
    df = pruned.to_pandas()  # ≤ 10 rows per block
    df = df.sort_values(["n_tokens", "doc_id"], ascending=[False, True]).head(10)
    return df.reset_index(drop=True)


# ----------------------------------------------------------------- 10
SESSION_GAP_S = 1800

# Hash-partition fan-out for the per-key window family (sessionize,
# LAG/rolling frames, arg-max).  The shuffle key is hash(key) % THIS,
# never the raw key — the point is a BOUNDED partition count (no
# per-user tiny groups, no key-cardinality shuffle).  16 sizes each
# partition at corpus/16, right for the test SFs; a deployment sizes
# it so one partition's rows fit a worker's heap (e.g. total_bytes /
# 512 MiB, thousands on a 100 TB events table).  Results are
# invariant to this value: partitions are unioned, never compared.
WINDOW_HASH_PARTITIONS = 16


def q_sessionize(sf_dir: str):
    """Session windows per user (gap > 30 min starts a new session).

    Shuffle by a BOUNDED hash-partition key (hash(user) % 16), not the
    raw user id: one vectorized pandas pass per partition handles all
    its users (sort by (user, ts) + per-user diff) instead of one
    Python ``map_groups`` call per user — thousands of tiny per-user
    groups is the classic groupby trap, and at 100 TB the per-user
    variant would also make the sort-shuffle key cardinality the user
    count."""
    ds = _read(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def add_pkey(batch: pa.Table) -> pa.Table:
        pk = (
            pd.util.hash_array(
                batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            % np.uint64(WINDOW_HASH_PARTITIONS)
        ).astype(np.int64)
        return batch.append_column("pkey", pa.array(pk))

    def sessions_part(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"])
        gaps = g.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds()
        g = g.assign(new_s=(gaps.isna() | (gaps > SESSION_GAP_S)).astype(np.int64))
        out = g.groupby("user_id", as_index=False, sort=False).agg(
            n_events=("new_s", "size"), n_sessions=("new_s", "sum")
        )
        return table_from_pandas(out)

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(sessions_part, batch_format="pandas")
    )


def q_user_event_deltas(sf_dir: str):
    """Value-motion windows per user, ordered by (ts, event_id):
    LAG delta (value vs the PREVIOUS event) and FIRST_VALUE baseline
    (value vs the user's FIRST event) — the two frame anchors the
    bounded histogram-rank path can't express (previous row /
    partition head, not a rank).  Complements q_event_gaps, which is
    the integer time-gap LAG; this one exercises LAG over a value
    column plus the FIRST_VALUE anchor nothing else covers.  Same
    bounded-cardinality shuffle as q_sessionize; per partition one
    vectorized pandas pass (sort + grouped shift/transform-first),
    never a per-user map_groups call.  First-event sentinel 0.0 keeps
    the LAG column null-free for the dtype-strict oracle (COALESCE
    twin); value-vs-first is naturally 0.0 on the first row.  Both
    outputs are float subtractions on operands identical to the SQL
    twin's — bit-equal."""
    ds = _read(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def add_pkey(batch: pa.Table) -> pa.Table:
        pk = (
            pd.util.hash_array(
                batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            % np.uint64(WINDOW_HASH_PARTITIONS)
        ).astype(np.int64)
        return batch.append_column("pkey", pa.array(pk))

    def deltas_part(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"])
        gb = g.groupby("user_id", sort=False)
        delta = (g["value"] - gb["value"].shift()).fillna(0.0)
        vs_first = g["value"] - gb["value"].transform("first")
        out = pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "value_delta": delta.to_numpy(),
                "value_vs_first": vs_first.to_numpy(),
            }
        )
        return table_from_pandas(out)

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(deltas_part, batch_format="pandas")
    )


def q_user_rolling_avg(sf_dir: str):
    """Rolling-frame window AVERAGE: 4-event moving average of value
    (in cents) per user, ordered by (ts, event_id) — ROWS BETWEEN 3
    PRECEDING AND CURRENT ROW.  Complements q_rolling_value_sum (the
    3-event SUM via pandas groupby().rolling()) with the other
    formulation of the same frame: grouped cumsum minus its own 4-lag
    — two flat vectorized passes with no per-group rolling object,
    which is the shape that stays cheap when a partition holds
    millions of tiny user groups.  Same 16-partition bounded shuffle
    as q_sessionize.  Sums are integer cents so the only float op is
    the final ROUND(sum/n, 6), identical operands to the SQL twin."""
    ds = _read(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def add_pkey(batch: pa.Table) -> pa.Table:
        pk = (
            pd.util.hash_array(
                batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            % np.uint64(WINDOW_HASH_PARTITIONS)
        ).astype(np.int64)
        return batch.append_column("pkey", pa.array(pk))

    def rolling_part(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"])
        g["cents"] = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        gb = g.groupby("user_id", sort=False)
        g["csum"] = gb["cents"].cumsum()
        # rolling(4) sum = cumsum − cumsum 4 rows back (same user);
        # float64 carries the lagged cumsum exactly (cents ≪ 2^53)
        lag4 = g.groupby("user_id", sort=False)["csum"].shift(4).fillna(0)
        rsum = g["csum"].to_numpy() - lag4.to_numpy()
        n = np.minimum(gb.cumcount().to_numpy() + 1, 4)
        out = pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": g["user_id"].to_numpy(),
                "avg4_cents": np.round(rsum / n, 6),
            }
        )
        return table_from_pandas(out)

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(rolling_part, batch_format="pandas")
    )


FUNNEL_STEPS = ("view", "click", "purchase")


def q_funnel_steps(sf_dir: str):
    """Ordered conversion funnel (sequential-pattern detection): how
    many users performed view → click → purchase IN ORDER, each step
    strictly after the user's FIRST qualifying event of the previous
    step.  This is the event-sequence operator the window family can't
    express (the predicate couples three different rows of the same
    partition by inequality, not rank or offset).

    Shape: pre-filter to the 3 funnel types at the read (cuts the
    shuffle to 3/5 of events), hash-partition by user (a user's events
    land in exactly one partition), ONE vectorized pandas pass per
    step inside each partition (grouped min → merge → strict-after
    mask → grouped min), partitions emit 3-row count partials and a
    tiny grouped sum folds them — the driver never sees per-user rows,
    so the state is O(partitions × 3) regardless of corpus size."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"])

    def add_pkey(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.is_in(batch["event_type"], value_set=pa.array(list(FUNNEL_STEPS)))
        )
        pk = (
            pd.util.hash_array(
                batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            % np.uint64(WINDOW_HASH_PARTITIONS)
        ).astype(np.int64)
        return batch.append_column("pkey", pa.array(pk))

    def funnel_part(g: pd.DataFrame) -> pa.Table:
        t_prev = g[g["event_type"] == FUNNEL_STEPS[0]].groupby("user_id")["ts"].min()
        counts = [len(t_prev)]
        for step in FUNNEL_STEPS[1:]:
            e = g[g["event_type"] == step]
            # per-row lookup of the user's previous-step anchor; users
            # who never reached it map to NaT and the strict > drops them
            ok = e[e["ts"] > e["user_id"].map(t_prev).to_numpy()]
            t_prev = ok.groupby("user_id")["ts"].min()
            counts.append(len(t_prev))
        return pa.table(
            {
                "step": pa.array([1, 2, 3], type=pa.int64()),
                "event_type": pa.array(list(FUNNEL_STEPS), type=pa.string()),
                "n_users": pa.array(counts, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(funnel_part, batch_format="pandas")
        .groupby(["step", "event_type"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def q_cohort_retention(sf_dir: str):
    """Cohort-retention matrix: users grouped by the ISO week of their
    FIRST event (the cohort), counted in every week they were active —
    the classic growth-analytics operator.  A per-user global property
    (cohort = min over ALL the user's events) feeds a per-(cohort,
    week) distinct count, which is exactly the shape the user-hash
    partition family handles: a user's events land in one partition,
    so the per-user min and the per-user distinct weeks are exact
    partition-locally and the partials ADD — one bounded shuffle, a
    tiny (weeks² upper-triangle) grouped sum, no corpus-wide distinct.

    Week truncation is Monday 00:00 (DuckDB date_trunc('week')
    semantics), kept in [us] so the dtype-strict oracle sees identical
    columns."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def add_pkey(batch: pa.Table) -> pa.Table:
        pk = (
            pd.util.hash_array(
                batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            % np.uint64(WINDOW_HASH_PARTITIONS)
        ).astype(np.int64)
        return batch.append_column("pkey", pa.array(pk))

    def cohort_part(g: pd.DataFrame) -> pa.Table:
        wk = (
            g["ts"].dt.normalize() - pd.to_timedelta(g["ts"].dt.weekday, unit="D")
        ).astype("datetime64[us]")
        pairs = pd.DataFrame(
            {"user_id": g["user_id"].to_numpy(), "week": wk.to_numpy()}
        ).drop_duplicates()
        cohort = pairs.groupby("user_id")["week"].min()
        pairs["cohort_week"] = pairs["user_id"].map(cohort).to_numpy()
        out = pairs.groupby(["cohort_week", "week"], as_index=False).agg(
            n_users=("user_id", "size")
        )
        return pa.table(
            {
                "cohort_week": pa.array(
                    out["cohort_week"].to_numpy(), type=pa.timestamp("us")
                ),
                "week": pa.array(out["week"].to_numpy(), type=pa.timestamp("us")),
                "n_users": pa.array(out["n_users"].to_numpy(), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(cohort_part, batch_format="pandas")
        .groupby(["cohort_week", "week"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )

    def fix_unit(batch: pa.Table) -> pa.Table:
        # the groupby shuffle downcasts week-aligned timestamps; restore
        # [us] to match DuckDB's .df() output dtype exactly
        for col in ("cohort_week", "week"):
            i = batch.schema.get_field_index(col)
            batch = batch.set_column(i, col, batch[col].cast(pa.timestamp("us")))
        return batch

    return agg.map_batches(fix_unit, batch_format="pyarrow")


def q_median_order_value(sf_dir: str):
    """EXACT grouped median (not a sketch): median order value per
    priority, interpolated for even group sizes exactly like SQL's
    quantile_cont(0.5).  Third member of the two-pass histogram-rank
    family, but with a twist the NTILE/DENSE_RANK/CUME_DIST members
    don't need: the second pass reads ONLY the bucket(s) that contain
    the two middle ranks — per group that is at most two value
    buckets, so the driver-side collect is bounded by
    2 × |groups| × max-bucket-population, never by rows.

    1. per-batch partial counts over (priority, cents >> shift) value
       buckets → tiny grouped sum; driver turns cumulative counts into
       the target ranks k1=(n+1)//2, k2=(n+2)//2 and the bucket each
       falls in (state ≤ |buckets| × |priorities|);
    2. a second scan keeps only rows whose (priority, bucket) is a
       target (broadcast set, ≤ 2 per group); the driver sorts each
       target bucket's cents and reads the two middle ranks by offset.
    Median = lo + 0.5·(hi − lo) on exact integer cents as doubles
    (both ≤ 2^53, so the interpolation is exact and bit-equal to the
    SQL twin), then one /100.0."""
    path = f"{sf_dir}/orders.parquet"
    shift = QUANTILE_BUCKET_SHIFT

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        df["bucket"] = cents >> shift
        g = df.groupby(["o_orderpriority", "bucket"], as_index=False).agg(
            n=("bucket", "size")
        )
        return table_from_pandas(g)

    hist = (
        _read(path, columns=["o_orderpriority", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ |buckets| × |priorities| rows by design
        .sort_values(["o_orderpriority", "bucket"])
        .reset_index(drop=True)
    )
    hist["cum"] = hist.groupby("o_orderpriority")["n"].cumsum()
    hist["cum_before"] = hist["cum"] - hist["n"]
    n_map = hist.groupby("o_orderpriority")["n"].sum().to_dict()

    # which (priority, bucket) holds each middle rank — ≤ 2 per group
    targets: set[tuple[str, int]] = set()
    cum_before_map: dict[tuple[str, int], int] = {}
    for prio, n in n_map.items():
        sub = hist[hist["o_orderpriority"] == prio]
        for k in ((n + 1) // 2, (n + 2) // 2):
            row = sub[sub["cum"] >= k].iloc[0]
            targets.add((prio, int(row["bucket"])))
            cum_before_map[(prio, int(row["bucket"]))] = int(row["cum_before"])

    def keep_targets(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        bucket = cents >> shift
        mask = [
            (p, int(b)) in targets
            for p, b in zip(df["o_orderpriority"].to_numpy(), bucket)
        ]
        out = pd.DataFrame(
            {
                "o_orderpriority": df["o_orderpriority"].to_numpy()[mask],
                "bucket": bucket[mask],
                "cents": cents[mask],
            }
        )
        return table_from_pandas(out)

    # bounded collect: only the ≤ 2 target buckets per priority survive
    # the filter — ≈ 2 × |priorities| × (rows / |buckets|) rows
    cand = (
        _read(path, columns=["o_orderpriority", "o_totalprice"])
        .map_batches(keep_targets, batch_format="pyarrow")
        .to_pandas()
    )

    out_rows = []
    for prio in sorted(n_map):
        n = n_map[prio]
        mids = []
        for k in ((n + 1) // 2, (n + 2) // 2):
            sub = hist[hist["o_orderpriority"] == prio]
            b = int(sub[sub["cum"] >= k].iloc[0]["bucket"])
            vals = np.sort(
                cand[
                    (cand["o_orderpriority"] == prio) & (cand["bucket"] == b)
                ]["cents"].to_numpy()
            )
            mids.append(float(vals[k - cum_before_map[(prio, b)] - 1]))
        lo, hi = mids
        out_rows.append((prio, (lo + 0.5 * (hi - lo)) / 100.0))
    return pd.DataFrame(
        out_rows, columns=["o_orderpriority", "median_price"]
    ).reset_index(drop=True)


# ----------------------------------------------------------------- 4b
def q_quality_signals(sf_dir: str):
    """Quality-signal feature vector per document (length/punct/
    stopword ratios — functions/textstats.py:quality_signals)."""
    from crawler_ray.functions.textstats import quality_signals

    ds = _doc(sf_dir, ["doc_id", "text"])

    def sig(batch: pa.Table) -> pa.Table:
        rows = [quality_signals(t or "") for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array([r["n_words"] for r in rows], type=pa.int64()),
                "mean_word_len": pa.array(
                    [r["mean_word_len"] for r in rows], type=pa.float64()
                ),
                "punct_ratio": pa.array(
                    [r["punct_ratio"] for r in rows], type=pa.float64()
                ),
                "stopword_ratio": pa.array(
                    [r["stopword_ratio"] for r in rows], type=pa.float64()
                ),
            }
        )

    return ds.map_batches(sig, batch_format="pyarrow")


# ----------------------------------------------------------------- 9a
def q_text_normalize(sf_dir: str):
    """Vectorized text normalization (pyarrow utf8 kernels — zero
    Python in the hot path): lowercase + whitespace-collapse + trim."""
    ds = _doc(sf_dir, ["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(batch["text"])
        t = pc.replace_substring_regex(t, r"\s+", " ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table({"doc_id": batch["doc_id"], "normalized": t})

    return ds.map_batches(norm, batch_format="pyarrow")


MASK_PATTERN = r"\b(customer|supplier|order)\b"


def q_mask_entities(sf_dir: str):
    """Entity masking (the PII-redaction shape): regex-replace target
    terms with a mask token — pure pyarrow.compute RE2 kernel, zero
    Python in the hot path, exact twin of DuckDB's regexp_replace
    'g'."""
    ds = _doc(sf_dir, ["doc_id", "text"])

    def mask(batch: pa.Table) -> pa.Table:
        t = pc.replace_substring_regex(batch["text"], MASK_PATTERN, "[MASK]")
        return pa.table({"doc_id": batch["doc_id"], "masked": t})

    return ds.map_batches(mask, batch_format="pyarrow")


def q_deterministic_sample(sf_dir: str):
    """Deterministic ~1-in-16 sample by content hash (first md5 hex
    nibble == '0'): reproducible sampling — the scale-safe alternative
    to seeded RNG rows, and SQL-expressible, unlike ds.random_sample."""
    import hashlib

    ds = _doc(sf_dir, ["doc_id", "text"])

    def pick(batch: pa.Table) -> pa.Table:
        keep = [
            hashlib.md5((t or "").encode()).hexdigest()[0] == "0"
            for t in batch["text"].to_pylist()
        ]
        return batch.filter(pa.array(keep)).select(["doc_id"])

    return ds.map_batches(pick, batch_format="pyarrow")


# ----------------------------------------------------------------- 8b
VOCAB_TOPK = 50
# ASCII-only token class: exact parity with RE2's `\w` in the SQL twin
# (Python re's unicode \w would also match hangul/CJK, DuckDB's not)
_VOCAB_TOKEN = re.compile(r"[a-z0-9_]+")


def q_vocab_topk(sf_dir: str):
    """Corpus vocabulary top-k (the word-count explode): per-batch
    partial token counts (a Counter per batch — the flat-map never
    materializes one row per token OCCURRENCE, only per distinct token
    per batch) → one grouped sum keyed by token → per-block partial
    top-k → tiny driver merge (≤ VOCAB_TOPK rows per block)."""
    ds = _doc(sf_dir, ["text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(_VOCAB_TOKEN.findall((t or "").lower()))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    summed = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n", "token"], ascending=[False, True]
        ).head(VOCAB_TOPK)
        return table_from_pandas(df)

    # driver merge of partial heads: ≤ VOCAB_TOPK × n_blocks rows
    merged = summed.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    merged = (
        merged.sort_values(["n", "token"], ascending=[False, True])
        .head(VOCAB_TOPK)
        .reset_index(drop=True)
    )
    merged["n"] = merged["n"].astype("int64")
    return merged[["token", "n"]]


BIGRAM_TOPK = 30


def q_bigram_topk(sf_dir: str):
    """Corpus bigram top-k (n-gram generation + count): same partial-
    Counter → grouped-sum → partial-top-k shape as vocab_topk, over
    adjacent token pairs.  The n-gram explode happens inside the batch
    Counter, so the shuffle carries distinct bigrams per batch, never
    one row per occurrence."""
    ds = _doc(sf_dir, ["text"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            toks = _VOCAB_TOKEN.findall((t or "").lower())
            c.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        return pa.table(
            {
                "bigram": pa.array(list(c.keys()), type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    summed = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["n", "bigram"], ascending=[False, True]
        ).head(BIGRAM_TOPK)
        return table_from_pandas(df)

    # driver merge of partial heads: ≤ BIGRAM_TOPK × n_blocks rows
    merged = summed.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    merged = (
        merged.sort_values(["n", "bigram"], ascending=[False, True])
        .head(BIGRAM_TOPK)
        .reset_index(drop=True)
    )
    merged["n"] = merged["n"].astype("int64")
    return merged[["bigram", "n"]]


# ----------------------------------------------------------------- 8c
STRATA_K = 5


def q_stratified_sample(sf_dir: str):
    """Stratified deterministic sample: the STRATA_K docs with smallest
    md5(text) per source (reproducible per-stratum sampling — the
    scale-safe alternative to seeded RNG).  Per-block partial head
    prunes first, so the per-source shuffle carries at most STRATA_K
    rows per (block, source), never the corpus."""
    ds = _doc(sf_dir, ["doc_id", "source", "text"])

    def hash_and_prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["h"] = [
            hashlib.md5((t or "").encode()).hexdigest() for t in df["text"]
        ]
        df = df.sort_values(["h", "doc_id"]).groupby("source", sort=False).head(
            STRATA_K
        )
        return table_from_pandas(df[["source", "doc_id", "h"]])

    def final_topk(g: pd.DataFrame) -> pa.Table:
        return table_from_pandas(
            g.sort_values(["h", "doc_id"]).head(STRATA_K)[["source", "doc_id"]]
        )

    return (
        ds.map_batches(hash_and_prune, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final_topk, batch_format="pandas")
    )


# ----------------------------------------------------------------- 8d
MIXTURE_TOTAL = 200  # sample budget allocated across sources


def q_source_mixture(sf_dir: str):
    """Temperature-weighted source-mixture sample (the domain/language
    mixture step of multilingual training pipelines — α = 0.5
    upsampling of small sources, Conneau & Lample 2019 §3.1): each
    source gets quota = total·⌊√n_s⌋ // Σ⌊√n_t⌋ — INTEGER math end to
    end, so the SQL twin is bit-identical with no float-boundary
    flooring — filled deterministically with the source's
    smallest-md5(text) docs (the stratified_sample rule).

    Scale shape: the per-source count table is |sources| rows (tiny,
    bounded — the one driver-side collect); quotas broadcast in the
    closure; per-block partial head keeps ≤ max-quota rows per
    (block, source) so the per-source shuffle never carries the
    corpus."""
    import math

    ds = _doc(sf_dir, ["doc_id", "source", "text"])
    counts = (
        ds.groupby("source").aggregate(Count(alias_name="n")).to_pandas()
    )  # bound: |sources| rows
    weights = {
        s: math.isqrt(int(n)) for s, n in zip(counts["source"], counts["n"])
    }
    wsum = sum(weights.values())
    quota = {s: (MIXTURE_TOTAL * w) // wsum for s, w in weights.items()}
    qmax = max(quota.values())

    def hash_and_prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["h"] = [
            hashlib.md5((t or "").encode()).hexdigest() for t in df["text"]
        ]
        df = df.sort_values(["h", "doc_id"]).groupby("source", sort=False).head(
            qmax
        )
        return table_from_pandas(df[["source", "doc_id", "h"]])

    def final_take(g: pd.DataFrame) -> pa.Table:
        q = quota.get(g["source"].iloc[0], 0)
        return table_from_pandas(
            g.sort_values(["h", "doc_id"]).head(q)[["source", "doc_id"]]
        )

    return (
        ds.map_batches(hash_and_prune, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final_take, batch_format="pandas")
    )


# ----------------------------------------------------------------- 9b
GROUP_TOPK = 3


def q_group_topk(sf_dir: str):
    """Per-group top-k: the 3 longest documents per source (n_chars
    desc, doc_id asc tiebreak).  Map-side partial head first — each
    block contributes at most GROUP_TOPK rows per source it contains —
    so the per-source shuffle and the final map_groups carry
    O(blocks × groups × k), never an unbounded fraction of the corpus
    (the q_stratified_sample shape; a raw map_groups over the
    20-cardinality ``source`` would put corpus/20 rows in one pandas
    group at 100 TB)."""
    ds = _doc(sf_dir, ["doc_id", "source", "n_chars"])

    def partial_head(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = (
            df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
            .groupby("source", sort=False)
            .head(GROUP_TOPK)
        )
        return table_from_pandas(df)

    def topk(g: pd.DataFrame) -> pa.Table:
        # arrow return: raw DataFrames re-attach the unhashable b'pandas'
        # schema metadata downstream (reduce-side warning spam)
        return table_from_pandas(
            g.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(
                GROUP_TOPK
            )
        )

    return (
        ds.map_batches(partial_head, batch_format="pyarrow")
        .groupby("source")
        .map_groups(topk, batch_format="pandas")
    )


# ---------------------------------------------------------------- 10b
WINDOW_S = 3600
SLIDE_S = 900


def q_sliding_window(sf_dir: str):
    """Sliding 1-hour windows every 15 min per event_type: each event
    replicates into WINDOW_S/SLIDE_S windows inside map_batches (no
    shuffle amplification beyond the window fan-out), then one grouped
    aggregate."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"])
    k = WINDOW_S // SLIDE_S

    def explode(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # pandas datetime64[us].astype(int64) yields µs; normalize to s
        epoch = df["ts"].astype("datetime64[us]").astype("int64") // 10**6
        frames = []
        for i in range(k):
            win = (epoch - i * SLIDE_S) // WINDOW_S * WINDOW_S + i * SLIDE_S
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": df["event_type"],
                        "win_start": win.astype("int64"),
                        "cents": np.round(df["value"].to_numpy() * 100).astype(np.int64),
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        g = out.groupby(["event_type", "win_start"], as_index=False).agg(
            n=("cents", "size"), sum_cents=("cents", "sum")
        )
        return table_from_pandas(g)

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "win_start"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_cents", alias_name="sum_cents"))
    )


# ----------------------------------------------------------------- 11
def q_distinct_sources(sf_dir: str):
    vals = sorted(_doc(sf_dir, ["source"]).unique("source"))
    return pa.table({"source": pa.array(vals, type=pa.string())})


# ----------------------------------------------------------------- 12
def q_packet_projection(sf_dir: str):
    """Packet text truncation projection (data_packet.py:23)."""
    ds = _doc(sf_dir, ["doc_id", "text"])

    def project(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = [
            (t[:500] + "...") if t is not None and len(t) > 500 else (t or "")
            for t in texts
        ]
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "extractedText": pa.array(out, type=pa.string()),
                "contentType": pa.array(["webpage_text"] * n, type=pa.string()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


# ----------------------------------------------------------------- 13
ANN_QUERY_ID = 0
ANN_K = 10


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 neighbors of vec_id=0 (float64 math,
    broadcast query, per-block partial top-k + tiny merge)."""
    from crawler_ray.stages.ann import brute_force_topk

    ds = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qrow = ds.filter(expr=f"vec_id == {ANN_QUERY_ID}").take(1)[0]
    queries = {"query_id": [ANN_QUERY_ID], "embedding": [np.asarray(qrow["embedding"], dtype=np.float64)]}
    rest = ds.filter(expr=f"vec_id != {ANN_QUERY_ID}")
    pdf = brute_force_topk(rest, queries, k=ANN_K)
    pdf = pdf.sort_values(["cosine", "vec_id"], ascending=[False, True]).reset_index(drop=True)
    pdf["rank"] = np.arange(1, len(pdf) + 1, dtype=np.int64)
    return pdf[["vec_id", "rank"]]


# ---------------------------------------------------------------- 13b
KNN_JOIN_NQ = 20  # query set: vec_id < KNN_JOIN_NQ
KNN_JOIN_K = 5


def q_knn_join(sf_dir: str):
    """Batch k-NN join — the multi-query form of ann_topk: every query
    vector (vec_id < KNN_JOIN_NQ) gets its KNN_JOIN_K nearest corpus
    neighbors (self excluded).  One broadcast of the whole query matrix
    (`ray.put` once, read per actor), per-block (nq × batch) matmul
    partial top-k, tiny per-query merge: the shuffle carries at most
    nq × k rows per block regardless of corpus size."""
    from crawler_ray.stages.ann import brute_force_topk

    ds = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qrows = ds.filter(expr=f"vec_id < {KNN_JOIN_NQ}").take(KNN_JOIN_NQ)
    queries = {
        "query_id": [r["vec_id"] for r in qrows],
        "embedding": [np.asarray(r["embedding"], dtype=np.float64) for r in qrows],
    }
    # k+1 partials: a query's own vector (cosine 1.0) occupies one slot
    # in its home block; dropping self afterwards still leaves ≥ k true
    # neighbors per query in the merged partials
    pdf = brute_force_topk(ds, queries, k=KNN_JOIN_K + 1)
    pdf = pdf[pdf["query_id"] != pdf["vec_id"]]
    pdf = pdf.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    pdf = pdf.groupby("query_id", as_index=False).head(KNN_JOIN_K).reset_index(drop=True)
    pdf["rank"] = (pdf.groupby("query_id").cumcount() + 1).astype(np.int64)
    return pdf[["query_id", "vec_id", "rank"]]


# ----------------------------------------------------------------- 14
DUP_COSINE_THRESHOLD = 0.4  # the synthetic embeddings are near-orthogonal


def q_embedding_near_dups(sf_dir: str):
    """All embedding pairs with cosine ≥ threshold (exact mode — the
    LSH-bucketed variant is the scale path in stages.dedup)."""
    from crawler_ray.stages.dedup import embedding_near_dups

    ds = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    dim = len(ds.take(1)[0]["embedding"])
    pairs = embedding_near_dups(ds, dim=dim, threshold=DUP_COSINE_THRESHOLD, exact=True)
    pdf = pairs.to_pandas()
    if pdf.empty:
        pdf = pd.DataFrame({"id_a": [], "id_b": []})
    pdf = pdf[["id_a", "id_b"]].astype(np.int64)
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------- 14a2
NGRAM_JACCARD_N = 3
NGRAM_JACCARD_NUM, NGRAM_JACCARD_DEN = 1, 2  # jaccard ≥ 1/2, integer-exact
NGRAM_JACCARD_MAX_DF = 64


def q_ngram_jaccard_near_dups(sf_dir: str):
    """Exact n-gram Jaccard near-dup pairs over the documents table
    (the ground truth MinHash approximates): DF-pruned gram space
    (df > max_df = stop grams, excluded on both sides — the MOSS
    rule), rational threshold compared in integer math so the SQL
    twin is bit-identical."""
    from crawler_ray.stages.dedup import ngram_jaccard_near_dups

    ds = _doc(sf_dir, ["doc_id", "text"])
    pairs = ngram_jaccard_near_dups(
        ds,
        tokenize=lambda t: _VOCAB_TOKEN.findall((t or "").lower()),
        n=NGRAM_JACCARD_N,
        threshold_num=NGRAM_JACCARD_NUM,
        threshold_den=NGRAM_JACCARD_DEN,
        max_df=NGRAM_JACCARD_MAX_DF,
    )
    pdf = pairs.to_pandas()
    if pdf.empty:
        pdf = pd.DataFrame({"id_a": [], "id_b": [], "n_shared": []})
    pdf = pdf[["id_a", "id_b", "n_shared"]].astype(np.int64)
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------- 14b
def q_order_lineitem_join(sf_dir: str):
    """Both-sides-large partitioned hash join (bucket co-grouping):
    lineitem ⋈ orders on orderkey → revenue stats per order priority."""
    from crawler_ray.stages.joins import bucketed_hash_join

    li = _read(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice"]
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        cents = np.round(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({"okey": batch["l_orderkey"], "price_cents": pa.array(cents)})

    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda t: pa.table({"okey": t["o_orderkey"], "priority": t["o_orderpriority"]}),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"), orders, key="okey", n_buckets=16,
        left_schema=pa.schema([("okey", pa.int64()), ("price_cents", pa.int64())]),
        right_schema=pa.schema([("okey", pa.int64()), ("priority", pa.string())]),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # the bucketed join's union promotes int64→float64 (null fill);
        # values are exact (< 2^53) — cast back so sums stay int64
        df["price_cents"] = df["price_cents"].astype(np.int64)
        df = df.groupby("priority", as_index=False).agg(
            n_items=("price_cents", "size"), revenue_cents=("price_cents", "sum")
        )
        return table_from_pandas(df)

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("priority")
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
    )


LATE_SHIP_US = 30 * 86_400 * 1_000_000  # EXISTS predicate horizon: 30 days

# prefix-scan time buckets: 2^40 us ≈ 12.7 days per bucket — bounds the
# per-bucket group at (rows per ~2 weeks); widen/narrow the shift to
# retune co-located group size vs driver histogram size (≤ |buckets|).
SCAN_BUCKET_SHIFT = 40


def q_cumulative_revenue(sf_dir: str):
    """GLOBAL running total — SUM(price) OVER (ORDER BY o_orderdate,
    o_orderkey ROWS UNBOUNDED PRECEDING) with NO partition key: the
    distributed prefix-scan primitive.  A naive window would sort the
    whole table into one ordered stream; this is the two-pass bucket
    histogram instead (the rank-family shape, extended from counts to
    sums):

    1. per-(date >> 40) bucket partial SUMs → grouped Sum → driver
       prefix offsets (state ≤ |buckets| rows — weeks, not orders);
    2. second scan co-located by bucket; within a bucket the exact
       int64-cents cumsum over the (date, orderkey) sort, plus the
       bucket's offset, is the global running total — no global sort,
       largest co-located unit is one time bucket."""
    shift = SCAN_BUCKET_SHIFT

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.round(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        # us-normalize before the int64 cast: results are unit-invariant
        # (ordering is), but the 2^40-us ≈ 12.7-day bucket-width contract
        # isn't — a ns parquet would silently shrink buckets to ~18 min
        date_us = batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "okey": batch["o_orderkey"],
                "date_us": date_us,
                "cents": pa.array(cents),
                "bucket": pc.shift_right(date_us, shift),
            }
        )

    base = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    ).map_batches(prep, batch_format="pyarrow")

    def bucket_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("bucket", as_index=False).agg(s=("cents", "sum"))
        return table_from_pandas(g)

    hist = (
        base.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("s", alias_name="s"))
        .to_pandas()  # ≤ |time buckets| rows by design
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    hist["offset"] = hist["s"].cumsum() - hist["s"]
    offsets = dict(zip(hist["bucket"], hist["offset"].astype(np.int64)))

    def scan(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["date_us", "okey"])
        cum = g["cents"].to_numpy(dtype=np.int64).cumsum()
        cum += offsets[int(g["bucket"].iloc[0])]
        return pa.table(
            {
                "o_orderkey": pa.array(g["okey"].to_numpy(), type=pa.int64()),
                "cum_cents": pa.array(cum, type=pa.int64()),
            }
        )

    return base.groupby("bucket").map_groups(scan, batch_format="pandas")


def q_orders_with_late_items(sf_dir: str):
    """TPC-H Q4 shape — correlated EXISTS with a predicate that
    compares columns from BOTH sides (l_shipdate > o_orderdate + 30d),
    then a grouped count by priority.  The EXISTS collapses to a
    per-orderkey MAX reduce (EXISTS(ship > cutoff) ⇔ max(ship) >
    cutoff), so no row explosion:

    - lineitem → per-batch partial max(ship) per orderkey → grouped
      Max (shuffle carries ≤ |orders| rows, not |lineitem|);
    - bucketed hash join with orders on orderkey (both sides large);
    - timestamp compare in exact int64 epoch-micros; final count is a
      5-group map-side partial → Sum."""
    from crawler_ray.stages.joins import bucketed_hash_join

    li = _read(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])

    def li_partial_max(batch: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "okey": batch["l_orderkey"],
                # normalize to us BEFORE the int64 cast: a ns-unit
                # parquet (pandas default) would otherwise compare
                # nanoseconds against the microsecond LATE_SHIP_US
                # constant and shrink the 30-day horizon ~1000×
                "ship_us": batch["l_shipdate"]
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
            }
        ).to_pandas()
        g = df.groupby("okey", as_index=False).agg(ship_us=("ship_us", "max"))
        return table_from_pandas(g)

    max_ship = (
        li.map_batches(li_partial_max, batch_format="pyarrow")
        .groupby("okey")
        .aggregate(Max("ship_us", alias_name="ship_us"))
    )

    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda t: pa.table(
            {
                "okey": t["o_orderkey"],
                # us-normalized like ship_us above (unit-safe int64)
                "odate_us": t["o_orderdate"]
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "priority": t["o_orderpriority"],
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        max_ship,
        orders,
        key="okey",
        n_buckets=16,
        left_schema=pa.schema([("okey", pa.int64()), ("ship_us", pa.int64())]),
        right_schema=pa.schema(
            [
                ("okey", pa.int64()),
                ("odate_us", pa.int64()),
                ("priority", pa.string()),
            ]
        ),
    )

    part_schema = pa.schema(
        [("priority", pa.string()), ("order_count", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # the bucketed join's union promotes int64→float64 (null fill);
        # epoch-micros < 2^53 stay exact — cast back before comparing
        ship = df["ship_us"].astype(np.int64)
        odate = df["odate_us"].astype(np.int64)
        late = df[ship > odate + LATE_SHIP_US]
        if late.empty:
            # typed empty, never inferred: a join bucket with zero late
            # orders would otherwise emit a null-typed priority block
            # and break the single-schema stream invariant
            return part_schema.empty_table()
        g = late.groupby("priority", as_index=False).agg(
            order_count=("priority", "size")
        )
        return table_from_pandas(g).cast(part_schema)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": batch["priority"],
                "order_count": batch["order_count"].cast(pa.int64()),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("priority")
        .aggregate(Sum("order_count", alias_name="order_count"))
        .map_batches(finish, batch_format="pyarrow")
    )


def q_asof_prior_view(sf_dir: str):
    """As-of join: for every click, the latest prior (or simultaneous)
    view by the same user — per-user merge_asof inside map_groups."""
    from crawler_ray.stages.joins import asof_join_groups

    ds = _read(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type", "ts"]
    )
    out = asof_join_groups(
        ds,
        key="user_id",
        ts_col="ts",
        left_filter=lambda g: g["event_type"] == "click",
        right_filter=lambda g: g["event_type"] == "view",
        value_col="ts",
        out_col="prior_view_ts",
        tiebreak_col="event_id",
    )
    pdf = out.to_pandas()[["event_id", "prior_view_ts"]]
    return pdf.sort_values("event_id").reset_index(drop=True)


# ---------------------------------------------------------------- 14c
def q_native_join(sf_dir: str):
    """Ray Data's native hash-partitioned ``Dataset.join`` (available in
    this Ray version — the portable bucketed join in stages.joins is
    the fallback pattern): supplier ⋈ nation → per-nation stats."""
    sup = _read(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey", "s_acctbal"]
    )
    nat = _read(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    joined = sup.join(
        nat,
        join_type="inner",
        num_partitions=8,
        on=("s_nationkey",),
        right_on=("n_nationkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["bal_cents"] = np.round(df["s_acctbal"].to_numpy() * 100).astype(np.int64)
        g = df.groupby("n_name", as_index=False).agg(
            n_suppliers=("bal_cents", "size"), bal_cents=("bal_cents", "sum")
        )
        return table_from_pandas(g)

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("n_suppliers", alias_name="n_suppliers"),
            Sum("bal_cents", alias_name="bal_cents"),
        )
    )


# ---------------------------------------------------------------- 14f
def q_customers_without_orders(sf_dir: str):
    """Anti-join with both sides large: customers who never placed an
    URGENT order (stages.joins.bucketed_filter_join — the filter side
    ships only its key column through the co-grouping shuffle; the
    priority predicate is pushed into the parquet read)."""
    from crawler_ray.stages.joins import bucketed_filter_join

    cust = _read(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
        filter=(pc.field("o_orderpriority") == "1-URGENT"),
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.select(["o_custkey"]).rename_columns(["c_custkey"])

    return bucketed_filter_join(
        cust,
        orders.map_batches(rename, batch_format="pyarrow"),
        key="c_custkey",
        mode="anti",
        left_schema=pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]),
    )


def q_active_suppliers(sf_dir: str):
    """Semi-join: suppliers with at least one lineitem — via the
    Bloom-ACCELERATED path (broadcast Bloom over the lineitem supplier
    keys prefilters map-side; only Bloom hits reach the exact shuffle).
    Oracle-gated, so the driver proves the Bloom path exact."""
    import pyarrow.parquet as _pq

    from crawler_ray.stages.joins import bloom_filter_join

    sup = _read(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    li = _read(f"{sf_dir}/lineitem.parquet", columns=["l_suppkey"])

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["s_suppkey"])

    # size the Bloom to the key CARDINALITY (suppliers), not the
    # filter-side row count — l_suppkey repeats ~60×, and the bitset
    # (and every per-batch partial shipped to the driver) scales with
    # the declared capacity
    cap = _pq.ParquetFile(f"{sf_dir}/supplier.parquet").metadata.num_rows
    return bloom_filter_join(
        sup,
        li.map_batches(rename, batch_format="pyarrow"),
        key="s_suppkey",
        mode="semi",
        capacity_hint=cap,
        left_schema=pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string())]),
    )


def _per_custkey_count(sf_dir: str, priority: str, out_col: str):
    """Per-custkey order count for one priority class, pre-aggregated
    map-side (each batch ships ≤ its distinct custkeys, not its rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = (
            batch.to_pandas()
            .groupby("o_custkey", as_index=False)
            .size()
            .rename(columns={"size": out_col})
        )
        return table_from_pandas(df)

    return (
        _read(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_orderpriority"],
            filter=(pc.field("o_orderpriority") == priority),
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum(out_col, alias_name=out_col))
        .map_batches(
            lambda t: t.rename_columns(["custkey", out_col]), batch_format="pyarrow"
        )
    )


# ---------------------------------------------------------------- 14g
def q_customer_urgent_left_join(sf_dir: str):
    """LEFT OUTER bucketed hash join with both sides large: every
    customer, with their URGENT-order count or a -1 sentinel when they
    placed none.  Unmatched left rows surface from the matched bucket
    (bucketing is a function of the key, so bucket-local null-fill is
    exact); the sentinel replaces SQL NULL because the driver's value
    hash compares NaN-vs-NaN (never equal) on nullable columns."""
    from crawler_ray.stages.joins import bucketed_hash_join

    cust = _read(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])

    def rekey(t: pa.Table) -> pa.Table:
        return t.rename_columns(["custkey", "c_name"])

    joined = bucketed_hash_join(
        cust.map_batches(rekey, batch_format="pyarrow"),
        _per_custkey_count(sf_dir, "1-URGENT", "n_urgent"),
        key="custkey",
        n_buckets=16,
        how="left",
        left_schema=pa.schema([("custkey", pa.int64()), ("c_name", pa.string())]),
        right_schema=pa.schema([("custkey", pa.int64()), ("n_urgent", pa.int64())]),
    )

    def sentinel(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("n_urgent"),
            "n_urgent",
            pc.fill_null(t["n_urgent"], pa.scalar(-1, type=pa.int64())),
        )

    return joined.map_batches(sentinel, batch_format="pyarrow")


def q_order_priority_full_join(sf_dir: str):
    """FULL OUTER bucketed hash join: per-custkey URGENT vs 5-LOW order
    counts — customers present on only one side get the -1 sentinel on
    the other (genuinely one-sided keys on both sides, so both
    unmatched paths are exercised)."""
    from crawler_ray.stages.joins import bucketed_hash_join

    joined = bucketed_hash_join(
        _per_custkey_count(sf_dir, "1-URGENT", "n_urgent"),
        _per_custkey_count(sf_dir, "5-LOW", "n_low"),
        key="custkey",
        n_buckets=16,
        how="outer",
        left_schema=pa.schema([("custkey", pa.int64()), ("n_urgent", pa.int64())]),
        right_schema=pa.schema([("custkey", pa.int64()), ("n_low", pa.int64())]),
    )

    def sentinel(t: pa.Table) -> pa.Table:
        for col in ("n_urgent", "n_low"):
            t = t.set_column(
                t.schema.get_field_index(col),
                col,
                pc.fill_null(t[col], pa.scalar(-1, type=pa.int64())),
            )
        return t

    return joined.map_batches(sentinel, batch_format="pyarrow")


def q_latest_order_per_customer(sf_dir: str):
    """Arg-max per key (last-crawl-wins dedup shape): each customer's
    most recent order, ties broken by the larger orderkey.  Map-side
    partial arg-max per batch (ships ≤ distinct custkeys per batch),
    then the same vectorized reduction per hash partition — the
    shuffle key cardinality stays 16, not |customers|."""
    ds = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    )

    def keep_latest(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).groupby(
            "o_custkey", as_index=False, sort=False
        ).tail(1)

    def partial(batch: pa.Table) -> pa.Table:
        df = keep_latest(batch.to_pandas())
        pk = (
            pd.util.hash_array(df["o_custkey"].to_numpy().astype(np.int64))
            % np.uint64(WINDOW_HASH_PARTITIONS)
        ).astype(np.int64)
        return table_from_pandas(df.assign(pkey=pk))

    def finalize(g: pd.DataFrame) -> pa.Table:
        df = keep_latest(g)
        return pa.table(
            {
                "custkey": pa.array(df["o_custkey"].to_numpy(), type=pa.int64()),
                "latest_okey": pa.array(df["o_orderkey"].to_numpy(), type=pa.int64()),
                "latest_date": pa.Array.from_pandas(
                    df["o_orderdate"], type=pa.timestamp("us")
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(finalize, batch_format="pandas")
    )


# ---------------------------------------------------------------- 10c
def q_event_gaps(sf_dir: str):
    """Window lag: per event, microseconds since the user's previous
    event (null for the first).  Same bounded hash-partition shape as
    sessionize — one vectorized pass per partition handles all its
    users; the shuffle key cardinality stays 16, not |users|."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"])

    def add_pkey(batch: pa.Table) -> pa.Table:
        pk = (
            pd.util.hash_array(
                batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            % np.uint64(WINDOW_HASH_PARTITIONS)
        ).astype(np.int64)
        return batch.append_column("pkey", pa.array(pk))

    def gaps_part(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"])
        # integer epoch-µs diffs (float total_seconds would round long
        # gaps); first-per-user stays null
        e = pd.Series(
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
            index=g.index,
        )
        # -1 sentinel for first-per-user (COALESCE twin in the SQL):
        # a nullable column would make the driver's value-hash compare
        # NaN-vs-NaN, which never matches
        gap = e.groupby(g["user_id"].to_numpy(), sort=False).diff().fillna(-1)
        return pa.table(
            {
                "event_id": pa.array(g["event_id"].to_numpy(), type=pa.int64()),
                "gap_us": pa.array(gap.astype(np.int64), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(gaps_part, batch_format="pandas")
    )


# ---------------------------------------------------------------- 10d
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")
PIVOT_COHORTS = 20


def q_events_pivot(sf_dir: str):
    """Pivot (long→wide conditional aggregate): per user cohort, one
    count column per event type.  The pivot happens map-side (each
    batch emits at most |cohorts| pre-pivoted rows), so the shuffle
    carries |cohorts| × |types| integers per block, never the events."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    cols = [f"n_{t}" for t in EVENT_TYPES]
    part_schema = pa.schema(
        [("cohort", pa.int64())] + [(c, pa.int64()) for c in cols]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["cohort"] = df["user_id"].to_numpy() % PIVOT_COHORTS
        for t, c in zip(EVENT_TYPES, cols):
            df[c] = (df["event_type"] == t).astype(np.int64)
        g = df.groupby("cohort", as_index=False)[cols].sum()
        return table_from_pandas(g).cast(part_schema)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby("cohort")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    )


def q_events_unpivot(sf_dir: str):
    """Unpivot / melt (wide→long, the pivot's inverse): the per-cohort
    wide count table explodes to (cohort, kind, n) rows map-side — a
    pure per-batch reshape (numpy repeat/tile, |types|× the rows, no
    shuffle beyond the pivot's own bounded aggregate), so zero-count
    cells survive, unlike a GROUP BY over the raw events."""
    wide = q_events_pivot(sf_dir)
    cols = [f"n_{t}" for t in EVENT_TYPES]

    def melt(batch: pa.Table) -> pa.Table:
        k = len(cols)
        cohort = np.repeat(batch["cohort"].to_numpy(zero_copy_only=False), k)
        kind = np.tile(np.array(cols, dtype=object), batch.num_rows)
        n = np.column_stack(
            [batch[c].to_numpy(zero_copy_only=False) for c in cols]
        ).reshape(-1)
        return pa.table(
            {
                "cohort": pa.array(cohort, type=pa.int64()),
                "kind": pa.array(kind, type=pa.string()),
                "n": pa.array(n, type=pa.int64()),
            }
        )

    return wide.map_batches(melt, batch_format="pyarrow")


# ---------------------------------------------------------------- 8d
QUANTILES = (0.5, 0.9)


# cents >> 13 (= $81.92 buckets, ~1.3k over TPC-H prices): the bucket
# count must sit WELL BELOW the per-block row count or the per-batch
# partial doesn't reduce anything and the groupby shuffles ~rowcount
# (measured: shift 8 → 40k buckets ≈ block rows → no reduction)
QUANTILE_BUCKET_SHIFT = 13


def q_price_quantiles(sf_dir: str):
    """Grouped EXACT quantiles without a global sort, in two bounded
    passes (prices are near-unique, so a raw value histogram would
    shuffle the full rowset — measured: 594k distinct of 599k rows at
    sf0.1):

    1. per-batch partial counts over QUANTIZED value buckets
       (cents >> 8) → one grouped sum whose key cardinality is bounded
       by the bucket count, never the row count; the driver walks the
       tiny (flag, bucket) histogram to locate, for each quantile, its
       bucket and the rank within it (rank ceil(q·n) — DuckDB
       quantile_disc semantics);
    2. a map-only second scan keeps just the rows in the selected
       buckets (≈ rows/buckets per group) and the exact value is
       picked from that tiny set.

    Scale contract: pass-1 shuffle ≤ |buckets| × |groups| rows, pass-2
    collect ≈ |rows|/|buckets| per chosen bucket — both bounded by the
    quantization knob, not the data."""
    path = f"{sf_dir}/lineitem.parquet"
    cols = ["l_returnflag", "l_extendedprice"]
    ds = _read(path, columns=cols)
    shift = QUANTILE_BUCKET_SHIFT
    part_schema = pa.schema(
        [("l_returnflag", pa.string()), ("bucket", pa.int64()), ("n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        df["bucket"] = cents >> shift
        g = df.groupby(["l_returnflag", "bucket"], as_index=False).agg(
            n=("bucket", "size")
        )
        return table_from_pandas(g).cast(part_schema)

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # bounded: ≤ |buckets| × |flags| rows by design
    )

    # locate each quantile's bucket + within-bucket rank
    targets: dict = {}  # (flag, bucket) -> list[(q, rank_within)]
    flags = []
    for flag, g in hist.groupby("l_returnflag"):
        flags.append(flag)
        g = g.sort_values("bucket")
        cum = g["n"].cumsum().to_numpy()
        n = int(cum[-1])
        for q in QUANTILES:
            rank = int(np.ceil(round(q * n, 9)))  # float-dust guard
            i = int(np.searchsorted(cum, rank))
            before = int(cum[i - 1]) if i else 0
            b = int(g["bucket"].to_numpy()[i])
            targets.setdefault((flag, b), []).append((q, rank - before))
    wanted = set(targets)

    def keep_selected(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        df["cents"] = cents
        df["bucket"] = cents >> shift
        mask = [
            (f, b) in wanted
            for f, b in zip(df["l_returnflag"].to_numpy(), df["bucket"].to_numpy())
        ]
        out = df.loc[mask, ["l_returnflag", "bucket", "cents"]]
        return table_from_pandas(out)

    picked_rows = (
        _read(path, columns=cols)
        .map_batches(keep_selected, batch_format="pyarrow")
        .to_pandas()  # ≈ rows/buckets per selected bucket — tiny
    )
    out: dict = {flag: {} for flag in flags}
    for (flag, b), wants in targets.items():
        vals = np.sort(
            picked_rows.loc[
                (picked_rows["l_returnflag"] == flag)
                & (picked_rows["bucket"] == b),
                "cents",
            ].to_numpy()
        )
        for q, rank_within in wants:
            out[flag][f"p{int(q * 100)}_cents"] = int(vals[rank_within - 1])
    return pd.DataFrame(
        [
            {"l_returnflag": flag, **{k: np.int64(v) for k, v in cols_.items()}}
            for flag, cols_ in sorted(out.items())
        ]
    )


# ---------------------------------------------------------------- 8e
def _orders_leaf_agg(sf_dir: str):
    """Shared leaf for rollup/cube: distributed partial+grouped
    aggregate of orders by (priority, status)."""
    ds = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )
    part_schema = pa.schema(
        [
            ("o_orderpriority", pa.string()),
            ("o_orderstatus", pa.string()),
            ("n_orders", pa.int64()),
            ("revenue_cents", pa.int64()),
        ]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["cents"] = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = df.groupby(["o_orderpriority", "o_orderstatus"], as_index=False).agg(
            n_orders=("cents", "size"), revenue_cents=("cents", "sum")
        )
        return table_from_pandas(g).cast(part_schema)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("revenue_cents", alias_name="revenue_cents"),
        )
    )


def q_revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus): the leaf level
    is a distributed partial+grouped aggregate; the two super-aggregate
    levels are re-aggregations of the TINY leaf table (|priorities| ×
    |statuses| rows), done in one single-block task — rolling up the
    group table instead of re-scanning the fact table."""
    leaf = _orders_leaf_agg(sf_dir)

    def rollup(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        lvl1 = df.groupby("o_orderpriority", as_index=False)[
            ["n_orders", "revenue_cents"]
        ].sum()
        lvl1["o_orderstatus"] = None
        lvl2 = pd.DataFrame(
            {
                "o_orderpriority": [None],
                "o_orderstatus": [None],
                "n_orders": [df["n_orders"].sum()],
                "revenue_cents": [df["revenue_cents"].sum()],
            }
        )
        allv = pd.concat([df, lvl1, lvl2], ignore_index=True)
        return pa.table(
            {
                "o_orderpriority": pa.array(allv["o_orderpriority"], type=pa.string(), from_pandas=True),
                "o_orderstatus": pa.array(allv["o_orderstatus"], type=pa.string(), from_pandas=True),
                "n_orders": pa.array(allv["n_orders"].astype(np.int64)),
                "revenue_cents": pa.array(allv["revenue_cents"].astype(np.int64)),
            }
        )

    return leaf.repartition(1).map_batches(rollup, batch_format="pyarrow")


# ---------------------------------------------------------------- 8g
def q_revenue_cube(sf_dir: str):
    """GROUP BY CUBE(o_orderpriority, o_orderstatus): all four grouping
    sets, derived like the rollup — one distributed leaf aggregate,
    the three super-aggregate levels re-aggregated from the tiny group
    table in a single-block task."""
    leaf_ds = _orders_leaf_agg(sf_dir)

    def cube(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        lvl_p = df.groupby("o_orderpriority", as_index=False)[
            ["n_orders", "revenue_cents"]
        ].sum()
        lvl_p["o_orderstatus"] = None
        lvl_s = df.groupby("o_orderstatus", as_index=False)[
            ["n_orders", "revenue_cents"]
        ].sum()
        lvl_s["o_orderpriority"] = None
        total = pd.DataFrame(
            {
                "o_orderpriority": [None],
                "o_orderstatus": [None],
                "n_orders": [df["n_orders"].sum()],
                "revenue_cents": [df["revenue_cents"].sum()],
            }
        )
        allv = pd.concat([df, lvl_p, lvl_s, total], ignore_index=True)
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    allv["o_orderpriority"], type=pa.string(), from_pandas=True
                ),
                "o_orderstatus": pa.array(
                    allv["o_orderstatus"], type=pa.string(), from_pandas=True
                ),
                "n_orders": pa.array(allv["n_orders"].astype(np.int64)),
                "revenue_cents": pa.array(allv["revenue_cents"].astype(np.int64)),
            }
        )

    return leaf_ds.repartition(1).map_batches(cube, batch_format="pyarrow")


# ---------------------------------------------------------------- 8f
def q_revenue_share(sf_dir: str):
    """Ratio-to-total window aggregate (SUM() OVER () twin): per
    priority, revenue and its share of the grand total.  Leaf is a
    distributed partial+grouped aggregate; the share division happens
    in one single-block task over the tiny group table — the window
    over the WHOLE table never touches the fact rows."""
    ds = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    )
    part_schema = pa.schema(
        [("o_orderpriority", pa.string()), ("revenue_cents", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["cents"] = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = df.groupby("o_orderpriority", as_index=False).agg(
            revenue_cents=("cents", "sum")
        )
        return table_from_pandas(g).cast(part_schema)

    leaf = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby("o_orderpriority")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )

    def share(t: pa.Table) -> pa.Table:
        rev = t["revenue_cents"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(rev.sum())
        # identical exact-int division on both engines → bit-equal doubles
        return t.append_column(
            "share", pa.array(rev / total, type=pa.float64())
        )

    return leaf.repartition(1).map_batches(share, batch_format="pyarrow")


# ---------------------------------------------------------------- 9c
NTILE_K = 4


def q_order_quartiles(sf_dir: str):
    """NTILE(4) within each order priority by (totalprice, orderkey),
    as a TWO-PASS histogram rank — no pandas group ever holds a whole
    priority partition (5 priorities would mean ~20% of ALL orders in
    one group at 100 TB; the q_price_quantiles shape instead):

    1. per-batch partial counts over (priority, price-cents >> shift)
       value buckets → one tiny grouped sum; the driver turns it into
       cumulative counts-before-bucket and per-priority totals — state
       bounded by |buckets| × |priorities|, never rows;
    2. a second scan co-locates rows by hash((priority, bucket)) % 256
       — the largest co-located unit is ONE price bucket (≈ rows /
       buckets), not one priority — sorts each (priority, bucket)
       sub-group vectorized, and derives the global rank as
       cum_before[bucket] + within-bucket rank; the NTILE id follows
       arithmetically from (rank, n) — SQL semantics: first n%k tiles
       get the extra row."""
    path = f"{sf_dir}/orders.parquet"
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    shift = QUANTILE_BUCKET_SHIFT
    part_schema = pa.schema(
        [("o_orderpriority", pa.string()), ("bucket", pa.int64()), ("n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        df["bucket"] = cents >> shift
        g = df.groupby(["o_orderpriority", "bucket"], as_index=False).agg(
            n=("bucket", "size")
        )
        return table_from_pandas(g).cast(part_schema)

    hist = (
        _read(path, columns=cols)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ |buckets| × |priorities| rows by design
        .sort_values(["o_orderpriority", "bucket"])
        .reset_index(drop=True)
    )
    hist["cum_before"] = (
        hist.groupby("o_orderpriority")["n"].cumsum() - hist["n"]
    )
    cb = hist[["o_orderpriority", "bucket", "cum_before"]]
    n_map = hist.groupby("o_orderpriority")["n"].sum().to_dict()

    def add_keys(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        df["cents"] = cents
        df["bucket"] = cents >> shift
        pk = (
            pd.util.hash_array(
                (df["o_orderpriority"] + ":" + df["bucket"].astype(str)).to_numpy(
                    dtype=object
                ),
                categorize=False,
            )
            % np.uint64(256)
        ).astype(np.int64)
        df["pkey"] = pk
        return table_from_pandas(
            df[["o_orderkey", "o_orderpriority", "cents", "bucket", "pkey"]]
        )

    def assign(g: pd.DataFrame) -> pa.Table:
        # one pkey partition = whole (priority, bucket) groups; all
        # vectorized — no Python loop over rows or sub-groups
        g = g.sort_values(["o_orderpriority", "bucket", "cents", "o_orderkey"])
        local = (
            g.groupby(["o_orderpriority", "bucket"], sort=False).cumcount() + 1
        ).to_numpy()
        m = g.merge(cb, on=["o_orderpriority", "bucket"], how="left")
        rank = m["cum_before"].to_numpy() + local
        n = g["o_orderpriority"].map(n_map).to_numpy()
        base, rem = n // NTILE_K, n % NTILE_K
        boundary = rem * (base + 1)
        tile = np.where(
            rank <= boundary,
            np.ceil(rank / np.maximum(base + 1, 1)),
            rem + np.ceil((rank - boundary) / np.maximum(base, 1)),
        ).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(g["o_orderkey"].to_numpy(), type=pa.int64()),
                "o_orderpriority": pa.array(g["o_orderpriority"], type=pa.string()),
                "quartile": pa.array(tile),
            }
        )

    return (
        _read(path, columns=cols)
        .map_batches(add_keys, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(assign, batch_format="pandas")
    )


# ---------------------------------------------------------------- 9d
EXPLODE_DOC_CAP = 20


def q_token_positions(sf_dir: str):
    """Positional explode (unnest WITH ORDINALITY twin): one row per
    token OCCURRENCE with its 1-based position, over a capped doc
    subset (the flat_map shape — output is rows-per-element, so cap
    the input, not the shuffle)."""
    ds = _read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=(pc.field("doc_id") < EXPLODE_DOC_CAP),
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids, toks, pos = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            tl = _VOCAB_TOKEN.findall((t or "").lower())
            ids.extend([d] * len(tl))
            toks.extend(tl)
            pos.extend(range(1, len(tl) + 1))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "token": pa.array(toks, type=pa.string()),
                "pos": pa.array(pos, type=pa.int64()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


# ---------------------------------------------------------------- 9f
DENSE_RANK_BUCKET_SHIFT = 6  # 64-wide n_chars value buckets


def q_doc_dense_rank(sf_dir: str):
    """DENSE_RANK per source by n_chars desc (ties share a rank), as a
    TWO-PASS distinct-value histogram — no pandas group ever holds a
    whole source partition (cardinality-20 ``source`` would mean
    corpus/20 rows per group at 100 TB):

    1. distinct (source, n_chars) pairs (per-batch dedup → grouped
       count) are bucketed (n_chars >> shift) and counted per (source,
       bucket); the driver computes, per bucket, how many DISTINCT
       values sit in higher buckets — dense rank's prefix.  Driver
       state ≤ |buckets| × |sources| (n_chars is an int, so a bucket
       holds ≤ 2^shift distinct values by construction);
    2. a second scan co-locates by hash((source, bucket)) % 256 — the
       largest co-located unit is one value bucket — and the rank is
       distinct_above[bucket] + within-bucket dense rank (vectorized
       first-occurrence cumsum over the descending sort)."""
    shift = DENSE_RANK_BUCKET_SHIFT
    ds = _doc(sf_dir, ["doc_id", "source", "n_chars"])

    def batch_distinct(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[["source", "n_chars"]].drop_duplicates()
        return table_from_pandas(df)

    def to_bucket_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["bucket"] = df["n_chars"].to_numpy() >> shift
        g = df.groupby(["source", "bucket"], as_index=False).agg(
            n_distinct=("n_chars", "size")
        )
        return table_from_pandas(g)

    hist = (
        _doc(sf_dir, ["source", "n_chars"])
        .map_batches(batch_distinct, batch_format="pyarrow")
        .groupby(["source", "n_chars"])
        .aggregate(Count())  # exact global distinct pairs
        .map_batches(to_bucket_partial, batch_format="pyarrow")
        .groupby(["source", "bucket"])
        .aggregate(Sum("n_distinct", alias_name="n_distinct"))
        .to_pandas()  # ≤ |buckets| × |sources| rows by design
        .sort_values(["source", "bucket"], ascending=[True, False])
        .reset_index(drop=True)
    )
    hist["distinct_above"] = (
        hist.groupby("source")["n_distinct"].cumsum() - hist["n_distinct"]
    )
    da = hist[["source", "bucket", "distinct_above"]]

    def add_keys(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["bucket"] = df["n_chars"].to_numpy() >> shift
        df["pkey"] = (
            pd.util.hash_array(
                (df["source"] + ":" + df["bucket"].astype(str)).to_numpy(
                    dtype=object
                ),
                categorize=False,
            )
            % np.uint64(256)
        ).astype(np.int64)
        return table_from_pandas(df)

    def rank(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            ["source", "bucket", "n_chars"], ascending=[True, True, False]
        )
        g["is_new"] = (~g.duplicated(subset=["source", "bucket", "n_chars"])).astype(
            np.int64
        )
        local = g.groupby(["source", "bucket"], sort=False)["is_new"].cumsum()
        m = g.merge(da, on=["source", "bucket"], how="left")
        r = m["distinct_above"].to_numpy() + local.to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), type=pa.int64()),
                "source": pa.array(g["source"], type=pa.string()),
                "rank": pa.array(r.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(add_keys, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(rank, batch_format="pandas")
    )


# ---------------------------------------------------------------- 9g
def q_doc_cume_dist(sf_dir: str):
    """CUME_DIST per source over n_chars ascending — the third member
    of the bounded two-pass window-rank family (NTILE, DENSE_RANK,
    CUME_DIST all share the histogram shape; no pandas group ever holds
    a whole source):

    1. row counts per (source, n_chars >> shift) bucket → driver
       computes rows-below-bucket + per-source totals (state ≤
       |buckets| × |sources|);
    2. second scan co-located by hash((source, bucket)) % 256; within a
       bucket the tie-inclusive rank is pandas rank(method='max'), and
       cume_dist = (rows_below + rank_max) / n — one double division of
       exact ints, bit-equal across engines."""
    shift = DENSE_RANK_BUCKET_SHIFT
    part_schema = pa.schema(
        [("source", pa.string()), ("bucket", pa.int64()), ("n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["bucket"] = df["n_chars"].to_numpy() >> shift
        g = df.groupby(["source", "bucket"], as_index=False).agg(n=("bucket", "size"))
        return table_from_pandas(g).cast(part_schema)

    hist = (
        _doc(sf_dir, ["source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ |buckets| × |sources| rows by design
        .sort_values(["source", "bucket"])
        .reset_index(drop=True)
    )
    hist["rows_below"] = hist.groupby("source")["n"].cumsum() - hist["n"]
    rb = hist[["source", "bucket", "rows_below"]]
    n_map = hist.groupby("source")["n"].sum().to_dict()

    def add_keys(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["bucket"] = df["n_chars"].to_numpy() >> shift
        df["pkey"] = (
            pd.util.hash_array(
                (df["source"] + ":" + df["bucket"].astype(str)).to_numpy(
                    dtype=object
                ),
                categorize=False,
            )
            % np.uint64(256)
        ).astype(np.int64)
        return table_from_pandas(df)

    def cume(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["source", "bucket", "n_chars"])
        rank_max = (
            g.groupby(["source", "bucket"], sort=False)["n_chars"]
            .rank(method="max")
            .to_numpy()
        )
        m = g.merge(rb, on=["source", "bucket"], how="left")
        n = g["source"].map(n_map).to_numpy()
        cd = (m["rows_below"].to_numpy() + rank_max) / n
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), type=pa.int64()),
                "source": pa.array(g["source"], type=pa.string()),
                "cd": pa.array(cd, type=pa.float64()),
            }
        )

    return (
        _doc(sf_dir, ["doc_id", "source", "n_chars"])
        .map_batches(add_keys, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(cume, batch_format="pandas")
    )


# ---------------------------------------------------------------- 9g2
def q_doc_percent_rank(sf_dir: str):
    """PERCENT_RANK per source over n_chars ascending — the fourth
    member of the bounded two-pass window-rank family (NTILE,
    DENSE_RANK, CUME_DIST, PERCENT_RANK all share the histogram shape;
    no pandas group ever holds a whole source):

    1. row counts per (source, n_chars >> shift) bucket → driver
       computes rows-below-bucket + per-source totals (state ≤
       |buckets| × |sources|);
    2. second scan co-located by hash((source, bucket)) % 256; within a
       bucket the tie-exclusive rank is pandas rank(method='min'), and
       percent_rank = (rows_below + rank_min - 1) / (n - 1) — one
       double division of exact ints, bit-equal across engines
       (SQL defines the n == 1 partition as 0.0; guarded the same)."""
    shift = DENSE_RANK_BUCKET_SHIFT
    part_schema = pa.schema(
        [("source", pa.string()), ("bucket", pa.int64()), ("n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["bucket"] = df["n_chars"].to_numpy() >> shift
        g = df.groupby(["source", "bucket"], as_index=False).agg(n=("bucket", "size"))
        return table_from_pandas(g).cast(part_schema)

    hist = (
        _doc(sf_dir, ["source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ |buckets| × |sources| rows by design
        .sort_values(["source", "bucket"])
        .reset_index(drop=True)
    )
    hist["rows_below"] = hist.groupby("source")["n"].cumsum() - hist["n"]
    rb = hist[["source", "bucket", "rows_below"]]
    n_map = hist.groupby("source")["n"].sum().to_dict()

    def add_keys(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["bucket"] = df["n_chars"].to_numpy() >> shift
        df["pkey"] = (
            pd.util.hash_array(
                (df["source"] + ":" + df["bucket"].astype(str)).to_numpy(
                    dtype=object
                ),
                categorize=False,
            )
            % np.uint64(256)
        ).astype(np.int64)
        return table_from_pandas(df)

    def prank(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["source", "bucket", "n_chars"])
        rank_min = (
            g.groupby(["source", "bucket"], sort=False)["n_chars"]
            .rank(method="min")
            .to_numpy()
        )
        m = g.merge(rb, on=["source", "bucket"], how="left")
        n = g["source"].map(n_map).to_numpy(dtype=np.float64)
        num = m["rows_below"].to_numpy() + rank_min - 1.0
        pr = np.where(n > 1.0, num / np.maximum(n - 1.0, 1.0), 0.0)
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), type=pa.int64()),
                "source": pa.array(g["source"], type=pa.string()),
                "pr": pa.array(pr, type=pa.float64()),
            }
        )

    return (
        _doc(sf_dir, ["doc_id", "source", "n_chars"])
        .map_batches(add_keys, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(prank, batch_format="pandas")
    )


# ---------------------------------------------------------------- 9h
TFIDF_TOPK = 5
TFIDF_MICRO = 1_000_000


def q_tfidf_top_terms(sf_dir: str):
    """TF-IDF top terms per source with an exact integer score
    (tf × 1e6 // df — floor division of exact counts, so both engines
    agree bit-for-bit; a float ln() idf would differ in the last ulp
    across libms):

    - tf: per-batch partial (source, token, n) counts, co-located by
      ``hash(source, token) % 256`` and merged with one vectorized
      pandas sum per partition (shuffle bounded by |vocab| × |sources|
      per block, never token occurrences; a multi-key Ray aggregate
      here would run a per-group Python accumulator over
      vocab-cardinality groups — the ~12k groups/s trap);
    - df: per-source presence summed over the tf table → tiny driver
      dict (≤ |vocab| entries), broadcast into the scoring map;
    - top-k per source: map-side partial head → final bounded
      map_groups (the group_topk shape)."""
    ds = _doc(sf_dir, ["source", "text"])
    part_schema = pa.schema(
        [
            ("source", pa.string()),
            ("token", pa.string()),
            ("n", pa.int64()),
            ("pkey", pa.int64()),
        ]
    )

    def partial_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for s, t in zip(batch["source"].to_pylist(), batch["text"].to_pylist()):
            for tok in _VOCAB_TOKEN.findall((t or "").lower()):
                c[(s, tok)] += 1
        if not c:
            return part_schema.empty_table()
        ks, ts, ns = zip(*[(s, tok, n) for (s, tok), n in c.items()])
        key = hash_pkey(
            [f"{s}\x00{t}" for s, t in zip(ks, ts)], 256
        )  # object path pins categorize=False (see hash_pkey)
        return pa.table(
            {
                "source": pa.array(ks, type=pa.string()),
                "token": pa.array(ts, type=pa.string()),
                "n": pa.array(ns, type=pa.int64()),
                "pkey": pa.array(key, type=pa.int64()),
            }
        )

    def merge_tf(g: pd.DataFrame) -> pa.Table:
        m = g.groupby(["source", "token"], as_index=False).agg(tf=("n", "sum"))
        return pa.table(
            {
                "source": pa.array(m["source"], type=pa.string()),
                "token": pa.array(m["token"], type=pa.string()),
                "tf": pa.array(m["tf"], type=pa.int64()),
            }
        )

    tf = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(merge_tf, batch_format="pandas")
        .materialize()  # read twice below (df collect + scoring) — without
        # this the whole tokenize+shuffle tf pipeline executes twice
    )

    def df_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "token": batch["token"],
                "one": pa.array([1] * batch.num_rows, type=pa.int64()),
            }
        )

    df_tbl = (
        tf.map_batches(df_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("one", alias_name="df"))
        .to_pandas()  # ≤ |vocab| rows by design
    )
    df_map = dict(zip(df_tbl["token"], df_tbl["df"].astype(np.int64)))

    def score_and_prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        dfv = df["token"].map(df_map).to_numpy().astype(np.int64)
        tfv = df["tf"].to_numpy().astype(np.int64)
        df["df"] = dfv
        df["tfidf_micro"] = (tfv * TFIDF_MICRO) // dfv
        df = (
            df.sort_values(["tfidf_micro", "token"], ascending=[False, True])
            .groupby("source", sort=False)
            .head(TFIDF_TOPK)
        )
        df["tf"] = df["tf"].astype(np.int64)
        return table_from_pandas(
            df[["source", "token", "tf", "df", "tfidf_micro"]]
        )

    def final_topk(g: pd.DataFrame) -> pa.Table:
        return table_from_pandas(
            g.sort_values(["tfidf_micro", "token"], ascending=[False, True]).head(
                TFIDF_TOPK
            )
        )

    return (
        tf.map_batches(score_and_prune, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final_topk, batch_format="pandas")
    )


# ---------------------------------------------------------------- 9i
REP_MICRO = 1_000_000


def q_repetition_signals(sf_dir: str):
    """Gopher-style repetition signals per document (Rae et al. 2021,
    "Scaling Language Models" App. A quality filters — public paper;
    the reference crawler has only the whole-doc quality score,
    functions/textops.py:108): fraction of token characters inside

    - the most frequent word 2-gram  (``top2_micro``),
    - the most frequent word 3-gram  (``top3_micro``),
    - ALL duplicated word 5-grams    (``dup5_micro``, count ≥ 2,
      summed over distinct grams — the documented simplification of
      Gopher's positional-union rule so the SQL twin is exact).

    All three are integer micro-fractions: numerators are exact int
    char counts (gram char length × occurrence count), one floor
    division by the doc's total token chars at the end — bit-equal
    across engines, no float accumulation.  Pure map (no shuffle);
    kernel shared with tests at
    functions.textstats.repetition_signals_micro."""
    from crawler_ray.functions.textstats import repetition_signals_micro

    ds = _doc(sf_dir, ["doc_id", "text"])

    def rep(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "top2_micro": [], "top3_micro": [], "dup5_micro": []}
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            t2, t3, d5 = repetition_signals_micro(t, REP_MICRO)
            out["doc_id"].append(d)
            out["top2_micro"].append(t2)
            out["top3_micro"].append(t3)
            out["dup5_micro"].append(d5)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "top2_micro": pa.array(out["top2_micro"], type=pa.int64()),
                "top3_micro": pa.array(out["top3_micro"], type=pa.int64()),
                "dup5_micro": pa.array(out["dup5_micro"], type=pa.int64()),
            }
        )

    return ds.map_batches(rep, batch_format="pyarrow")


# ---------------------------------------------------------------- 9n
CHUNK_LEN = 400
CHUNK_STRIDE = 300  # overlap = CHUNK_LEN - CHUNK_STRIDE = 100 chars


def q_doc_chunks(sf_dir: str):
    """Sliding-window document chunking for training (length 400,
    stride 300 → 100-char overlap): the flat-map explode every LLM
    data pipeline runs before tokenization/packing.  Pure map — each
    batch emits its own chunks, no shuffle; chunk boundaries are
    character offsets so the DuckDB substr() twin is exact.  Empty
    docs emit no chunks; a doc's last chunk may be shorter."""
    ds = _doc(sf_dir, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ids, cis, chunks = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            t = t or ""
            n = len(t)
            for ci in range((n + CHUNK_STRIDE - 1) // CHUNK_STRIDE):
                start = ci * CHUNK_STRIDE
                if start >= n:
                    break
                ids.append(d)
                cis.append(ci)
                chunks.append(t[start : start + CHUNK_LEN])
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "chunk_idx": pa.array(cis, type=pa.int64()),
                "chunk_len": pa.array(
                    [len(c) for c in chunks], type=pa.int64()
                ),
                "chunk_text": pa.array(chunks, type=pa.string()),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


# ---------------------------------------------------------------- 9o
SHUFFLE_EPOCH = "epoch1"
SHUFFLE_BUCKETS = 64


def q_epoch_shuffle(sf_dir: str):
    """Deterministic global training-epoch shuffle: every doc gets the
    position of its ``md5(epoch:doc_id)`` digest in the sorted digest
    order — reproducible across runs/engines, reshuffled by changing
    the epoch string.  Scale shape is the two-pass histogram rank (no
    global sort): pass 1 counts docs per 64 digest-prefix buckets
    (driver state = 64 ints → cumulative offsets); pass 2 co-locates
    by bucket and sorts WITHIN each bucket only, so global rank =
    bucket offset + within-bucket position and the largest pandas
    group is one digest-prefix bucket."""
    import hashlib

    ds = _doc(sf_dir, ["doc_id"])

    def key(batch: pa.Table) -> pa.Table:
        hx = [
            hashlib.md5(f"{SHUFFLE_EPOCH}:{d}".encode()).hexdigest()
            for d in batch["doc_id"].to_pylist()
        ]
        # order-preserving prefix bucket (NOT mod — mod interleaves
        # digest ranges and would break offset+within-bucket ranking)
        bucket = [int(h[:2], 16) // (256 // SHUFFLE_BUCKETS) for h in hx]
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "hx": pa.array(hx, type=pa.string()),
                "bucket": pa.array(bucket, type=pa.int64()),
            }
        )

    keyed = ds.map_batches(key, batch_format="pyarrow")

    def bucket_counts(batch: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            batch["bucket"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "bucket": pa.array(vals, type=pa.int64()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    hist = (
        keyed.map_batches(bucket_counts, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ SHUFFLE_BUCKETS rows
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    # driver state bound: ≤ SHUFFLE_BUCKETS (64) ints — independent of
    # corpus size; the broadcast below ships the same 64 ints
    offsets = dict(
        zip(hist["bucket"], hist["n"].cumsum().shift(fill_value=0).astype(np.int64))
    )

    def rank_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["hx", "doc_id"]).reset_index(drop=True)
        base = int(offsets[int(g["bucket"].iloc[0])])
        return pa.table(
            {
                "doc_id": pa.array(g["doc_id"].to_numpy(), type=pa.int64()),
                "pos": pa.array(
                    base + np.arange(1, len(g) + 1, dtype=np.int64)
                ),
            }
        )

    return keyed.groupby("bucket").map_groups(rank_bucket, batch_format="pandas")


# ---------------------------------------------------------------- 9p
CURATE_QUALITY_MIN = 0.3
CURATE_JACCARD = 0.6
CURATE_BIN_TOKENS = 256


# chunk key layout: doc_id << CHUNK_KEY_BITS | chunk_idx.  2^20 chunks
# per doc (~300 MB of text at stride 300) and 2^43 doc ids both fit
# int64; BOTH bounds are enforced with a raise — a silent collision
# would merge two docs' chunks in the packed manifest.
CHUNK_KEY_BITS = 20


def chunk_key(doc_id: int, chunk_idx: int) -> int:
    """The packed (doc, chunk) key used by the curation flagship."""
    return (int(doc_id) << CHUNK_KEY_BITS) | int(chunk_idx)


def training_pipeline(sf_dir: str):
    """End-to-end training-data curation flagship — the composition a
    100-TB corpus actually runs, every stage a documented scale shape:

    quality filter (pure map, content_quality ≥ 0.3)
      → exact dedup (first-seen per content hash, grouped)
      → near-dup removal (MinHash-LSH → verified Jaccard ≥ 0.6 →
        connected components → keep each cluster's min doc_id; the
        drop set leaves via a bucketed ANTI-join, never a broadcast
        of O(duplicates) driver state)
      → sliding-window chunking (400/300, flat-map)
      → whitespace token counts (vectorized)
      → FFD sequence packing into 256-token bins, per FIXED hash
        partition (per-block packing would follow run-varying block
        boundaries and break manifest determinism).

    Returns the packed-bin manifest as a DATASET (bin_id, n_docs,
    total_tokens, has_oversized, doc_ids) — O(corpus-tokens/256) rows
    at 100 TB, so the pipeline never collects it; callers stream it to
    parquet or aggregate it.  The sf-scale driver contract's tiny
    collect lives in the :func:`q_training_pipeline` wrapper only.
    Iterative CC inside → rows-only for the driver; integrity
    invariants (each chunk in exactly one bin, no surviving exact/near
    dups, budget respected, deterministic repeat) in
    tests/test_ground_truth.py."""
    from crawler_ray.functions.textstats import token_count_batch
    from crawler_ray.stages.dedup import (
        connected_components,
        exact_dedup_first,
        minhash_candidate_pairs,
        verify_jaccard_joined,
    )
    from crawler_ray.stages.joins import bucketed_filter_join

    ds = _doc(sf_dir, ["doc_id", "text"])

    def quality_filter(batch: pa.Table) -> pa.Table:
        keep = [
            content_quality(t or "") >= CURATE_QUALITY_MIN
            for t in batch["text"].to_pylist()
        ]
        return batch.filter(pa.array(keep))

    clean = ds.map_batches(quality_filter, batch_format="pyarrow")
    unique = exact_dedup_first(clean).select_columns(["doc_id", "text"])

    pairs = minhash_candidate_pairs(unique, num_perm=64, num_bands=16)
    verified = verify_jaccard_joined(pairs, unique, threshold=CURATE_JACCARD)
    labels = connected_components(verified)

    # per-label min is computable inside one group — each near-dup
    # cluster's non-canonical members become the drop set:
    drops = (
        labels.groupby("label")
        .map_groups(
            lambda g: table_from_pandas(
                g.loc[g["node"] != g["node"].min(), ["node"]].rename(
                    columns={"node": "doc_id"}
                )
            ),
            batch_format="pandas",
        )
    )
    survivors = bucketed_filter_join(
        unique,
        drops,
        key="doc_id",
        mode="anti",
        left_schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )

    def chunk(batch: pa.Table) -> pa.Table:
        ids, cis, texts = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            t = t or ""
            n = len(t)
            n_chunks = (n + CHUNK_STRIDE - 1) // CHUNK_STRIDE
            # raise, never collide: a wrapped chunk_idx or an
            # overflowed doc_id would silently merge two docs' chunks
            if n_chunks >= (1 << CHUNK_KEY_BITS):
                raise ValueError(
                    f"doc {d}: {n_chunks} chunks >= 2^{CHUNK_KEY_BITS} — "
                    "chunk key would collide with the next doc; split the "
                    "doc upstream or widen CHUNK_KEY_BITS"
                )
            if not 0 <= d < (1 << (63 - CHUNK_KEY_BITS)):
                raise ValueError(
                    f"doc_id {d} outside [0, 2^{63 - CHUNK_KEY_BITS}) — "
                    "chunk key would overflow int64"
                )
            for ci in range(n_chunks):
                start = ci * CHUNK_STRIDE
                if start >= n:
                    break
                ids.append(d)
                cis.append(ci)
                texts.append(t[start : start + CHUNK_LEN])
        toks = token_count_batch(texts)
        return pa.table(
            {
                "chunk_id": pa.array(
                    [chunk_key(d, c) for d, c in zip(ids, cis)], type=pa.int64()
                ),
                "n_tokens": pa.array(toks, type=pa.int64()),
            }
        )

    # pack within FIXED hash partitions (not raw blocks): block
    # boundaries vary run-to-run with parallelism, so per-block packing
    # would make the manifest nondeterministic — per-partition packing
    # is bit-stable AND keeps bins co-located at any scale
    def add_pkey(batch: pa.Table) -> pa.Table:
        pk = (
            batch["chunk_id"].to_numpy(zero_copy_only=False) >> CHUNK_KEY_BITS
        ) % 32
        return batch.append_column("pkey", pa.array(pk.astype(np.int64)))

    from crawler_ray.stages.packing import ffd_pack

    def pack_partition(g: pd.DataFrame) -> pa.Table:
        pk = int(g["pkey"].iloc[0])
        bins = ffd_pack(
            g["chunk_id"].to_numpy(), g["n_tokens"].to_numpy(), CURATE_BIN_TOKENS
        )
        return pa.table(
            {
                "bin_id": pa.array(
                    [f"{pk}:{i}" for i in range(len(bins))], type=pa.string()
                ),
                "doc_ids": pa.array(
                    [[int(x) for x in b["ids"]] for b in bins],
                    type=pa.list_(pa.int64()),
                ),
                "n_docs": pa.array([len(b["ids"]) for b in bins], type=pa.int64()),
                "total_tokens": pa.array(
                    [b["total"] for b in bins], type=pa.int64()
                ),
                "has_oversized": pa.array(
                    [bool(b.get("oversized", False)) for b in bins],
                    type=pa.bool_(),
                ),
            }
        )

    return (
        survivors.map_batches(chunk, batch_format="pyarrow")
        .map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(pack_partition, batch_format="pandas")
    )


def q_training_pipeline(sf_dir: str):
    """Driver-contract wrapper for :func:`training_pipeline`: collects
    the bin manifest into pandas for the sf-scale rows-only check.
    Bounded ONLY at test scale — at 100 TB the manifest is corpus-sized
    and callers must consume the Dataset (write_parquet / aggregate),
    which is why the collect lives here and not in the pipeline."""
    return (
        training_pipeline(sf_dir)
        .to_pandas()
        .sort_values("bin_id")
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------- 9q
DECON_N = 8
DECON_EVAL_MOD = 7
# broadcast budget for the eval-gram set (same raise-or-reroute
# contract as skew_aware_hash_join's broadcast_budget_bytes): real
# benchmarks are KBs and stay far under it; past the budget the
# query REROUTES to the bucketed semi-join instead of growing driver
# state with the corpus
DECON_BROADCAST_BUDGET_BYTES = 64 << 20


def _decon_doc_grams(text: str) -> set:
    toks = _VOCAB_TOKEN.findall((text or "").lower())
    return {
        " ".join(toks[i : i + DECON_N])
        for i in range(len(toks) - DECON_N + 1)
    }


def q_decontaminate(
    sf_dir: str,
    broadcast_budget_bytes: int = DECON_BROADCAST_BUDGET_BYTES,
):
    """Benchmark decontamination (GPT-3 App. C / Gopher-style n-gram
    overlap — public method): flag every training doc sharing at least
    one word 8-gram with the held-out eval set (here: doc_id % 7 == 0,
    a deterministic stand-in benchmark).  Output = contaminated doc →
    count of DISTINCT shared 8-grams, both exact ints.

    Scale shape, two-tier (round-5 fix — the gram set is BUDGETED):

    - broadcast path (the real-benchmark shape — eval sets are KBs):
      the eval side's distinct-gram set is accumulated driver-side
      under ``broadcast_budget_bytes`` and shipped once via
      ``ray.put``; the corpus pass is then a pure map (per-doc
      distinct grams ∩ broadcast set) — no shuffle.
    - join path (eval side larger than the budget — e.g. this
      stand-in's corpus-fraction eval split at 100 TB): accumulation
      STOPS at the budget and the query reroutes to a bucketed
      SEMI-join of per-doc distinct corpus grams against the eval
      gram stream, then a per-doc count — nothing corpus-sized on the
      driver on either path.  Both paths produce identical output
      (tested with a forced tiny budget)."""
    from crawler_ray.stages.joins import bucketed_filter_join

    ds = _doc(sf_dir, ["doc_id", "text"])

    def gram_rows(batch: pa.Table) -> pa.Table:
        # eval-side filter inline (Ray's filter expr has no modulo op)
        mod = batch["doc_id"].to_numpy(zero_copy_only=False) % DECON_EVAL_MOD
        batch = batch.filter(pa.array(mod == 0))
        grams = set()
        for t in batch["text"].to_pylist():
            grams |= _decon_doc_grams(t)
        return pa.table({"gram": pa.array(sorted(grams), type=pa.string())})

    eval_gram_ds = ds.map_batches(gram_rows, batch_format="pyarrow")

    # stream the eval grams under a RUNNING byte budget — bail to the
    # join path the moment it's exceeded (wasted work ≤ one budget's
    # worth of grams, never the whole eval side)
    eval_grams: set = set()
    approx_bytes = 0
    over_budget = False
    for b in eval_gram_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for g in b["gram"].to_pylist():
            if g not in eval_grams:
                eval_grams.add(g)
                approx_bytes += len(g) + 64  # str payload + set overhead
        if approx_bytes > broadcast_budget_bytes:
            over_budget = True
            break

    if not over_budget:
        ref = ray.put(eval_grams)

        def flag(batch: pa.Table) -> pa.Table:
            ev = ray.get(ref)
            ids, ns = [], []
            for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
                if d % DECON_EVAL_MOD == 0:
                    continue
                shared = len(_decon_doc_grams(t) & ev)
                if shared:
                    ids.append(d)
                    ns.append(shared)
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "n_shared": pa.array(ns, type=pa.int64()),
                }
            )

        return ds.map_batches(flag, batch_format="pyarrow")

    # ---- over-budget fallback: bucketed semi-join on the gram string
    # (exact — no hash-collision risk), per-doc distinct rows only
    del eval_grams  # release the partial driver set before the shuffle

    def corpus_gram_rows(batch: pa.Table) -> pa.Table:
        ids, grams = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if d % DECON_EVAL_MOD == 0:
                continue
            for g in sorted(_decon_doc_grams(t)):
                ids.append(d)
                grams.append(g)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "gram": pa.array(grams, type=pa.string()),
            }
        )

    corpus_grams = ds.map_batches(corpus_gram_rows, batch_format="pyarrow")
    shared = bucketed_filter_join(
        corpus_grams,
        eval_gram_ds,
        key="gram",
        mode="semi",
        left_schema=pa.schema([("doc_id", pa.int64()), ("gram", pa.string())]),
    )
    # per-doc rows are distinct grams by construction → count == n_shared
    return shared.groupby("doc_id").aggregate(Count(alias_name="n_shared"))


# ---------------------------------------------------------------- 9r
DUPSUB_W = 64
DUPSUB_STRIDE = 32


def q_duplicate_substrings(sf_dir: str):
    """ExactSubstr-style duplicate-span detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — public
    method, char-window approximation of the suffix-array form): fixed
    64-char windows at stride 32; a window occurring in ≥ 2 DISTINCT
    docs is a duplicated span.  Output per duplicated window: md5 hash,
    first (min) doc, distinct-doc count, total occurrences.

    Scale shape: flat-map explode (~1 row per 32 input chars) with
    per-(window, doc) pre-aggregation INSIDE the batch (a doc's text
    lives in one batch row, so a (window, doc) pair never splits
    across batches), then one mergeable groupby keyed on the 32-char
    md5 — the shuffle carries hashes, never window text; no driver
    state.  Group sizes are bounded by docs-per-window (boilerplate
    can make these hot, but the aggregate is a mergeable partial, not
    a map_groups materialization)."""
    from collections import Counter

    ds = _doc(sf_dir, ["doc_id", "text"])

    def windows(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()  # (w_hash, doc_id) -> occurrences
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            t = t or ""
            for off in range(0, len(t) - DUPSUB_W + 1, DUPSUB_STRIDE):
                w = t[off : off + DUPSUB_W]
                cnt[(hashlib.md5(w.encode()).hexdigest(), d)] += 1
        if not cnt:
            return pa.table(
                {
                    "w_hash": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "occ": pa.array([], type=pa.int64()),
                }
            )
        keys, occs = zip(*cnt.items())
        return pa.table(
            {
                "w_hash": pa.array([k[0] for k in keys], type=pa.string()),
                "doc_id": pa.array([k[1] for k in keys], type=pa.int64()),
                "occ": pa.array(occs, type=pa.int64()),
            }
        )

    grouped = (
        ds.map_batches(windows, batch_format="pyarrow")
        .groupby("w_hash")
        .aggregate(
            Min("doc_id", alias_name="first_doc_id"),
            Count(alias_name="n_docs"),  # rows are per-(window, doc)
            Sum("occ", alias_name="n_occurrences"),
        )
    )

    def dup_only(batch: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "w_hash": batch["w_hash"],
                "first_doc_id": batch["first_doc_id"].cast(pa.int64()),
                "n_docs": batch["n_docs"].cast(pa.int64()),
                "n_occurrences": batch["n_occurrences"].cast(pa.int64()),
            }
        )
        return out.filter(pc.greater_equal(out["n_docs"], 2))

    return grouped.map_batches(dup_only, batch_format="pyarrow")


# ---------------------------------------------------------------- 9m
LM_VOCAB = 4096


def q_bigram_lm_score(sf_dir: str):
    """CCNet-style language-model quality scoring (Wenzek et al. 2020,
    public): train an add-one-smoothed bigram LM on the corpus, then
    score every document by mean negative log-likelihood per bigram —
    low NLL ≈ fluent/common phrasing, high NLL ≈ gibberish.  The
    reference has only heuristic quality scores (textops.py:108).

    Scale shape: (1) unigram+bigram counts via per-batch Counter
    partials → grouped sums (bounded by distinct grams per block, never
    occurrences); (2) vocabulary pruned to the top LM_VOCAB tokens
    (count desc, token asc — deterministic), OOV → <unk>; (3) the
    count maps broadcast once via ray.put; (4) scoring is a pure map.
    Float NLL output → rows-only driver check; exact ground truth
    (naive reimplementation, same numpy log) in
    tests/test_ground_truth.py."""
    from collections import Counter

    ds = _doc(sf_dir, ["doc_id", "text"])

    def uni_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(_VOCAB_TOKEN.findall((t or "").lower()))
        if not c:
            return pa.table(
                {"token": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        ks, vs = zip(*c.items())
        return pa.table(
            {"token": pa.array(ks, type=pa.string()),
             "n": pa.array(vs, type=pa.int64())}
        )

    uni = (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    vocab = set(
        uni.sort_values(["n", "token"], ascending=[False, True])
        .head(LM_VOCAB)["token"]
    )

    def big_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        u: Counter = Counter()
        for t in batch["text"].to_pylist():
            toks = [
                w if w in vocab else "<unk>"
                for w in _VOCAB_TOKEN.findall((t or "").lower())
            ]
            u.update(toks)
            c.update(zip(toks, toks[1:]))
        rows = [(w1, w2, n) for (w1, w2), n in c.items()]
        rows += [(w, "", n) for w, n in u.items()]  # "" marks unigram rows
        if not rows:
            return pa.table(
                {"w1": pa.array([], type=pa.string()),
                 "w2": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        a, b, n = zip(*rows)
        return pa.table(
            {"w1": pa.array(a, type=pa.string()),
             "w2": pa.array(b, type=pa.string()),
             "n": pa.array(n, type=pa.int64())}
        )

    counts = (
        ds.map_batches(big_partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ distinct bigrams over the capped vocab
    )
    bi_map = {
        (r.w1, r.w2): int(r.n) for r in counts.itertuples() if r.w2 != ""
    }
    uni_map = {r.w1: int(r.n) for r in counts.itertuples() if r.w2 == ""}
    V = len(vocab) + 1  # +<unk>
    model = ray.put((vocab, bi_map, uni_map, V))

    def score(batch: pa.Table) -> pa.Table:
        vocab_, bi_, uni_, V_ = ray.get(model)
        ids, nbg, nll = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = [
                w if w in vocab_ else "<unk>"
                for w in _VOCAB_TOKEN.findall((t or "").lower())
            ]
            pairs = list(zip(toks, toks[1:]))
            ids.append(d)
            nbg.append(len(pairs))
            if not pairs:
                nll.append(0.0)
                continue
            s = 0.0
            for w1, w2 in pairs:
                s -= float(
                    np.log(
                        (bi_.get((w1, w2), 0) + 1) / (uni_.get(w1, 0) + V_)
                    )
                )
            nll.append(s / len(pairs))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_bigrams": pa.array(nbg, type=pa.int64()),
                "nll": pa.array(nll, type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------- 9l
WSAMPLE_K = 50


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted sample (probability ∝ size flavor): each
    doc gets an exact-integer priority ``H // w`` where H is the first
    15 md5 hex digits of the text (60 bits, uniform) and w = n_chars —
    heavier docs draw stochastically smaller priorities (the
    integer-arithmetic analogue of the Efraimidis–Spirakis u^(1/w)
    key, chosen so BOTH engines compare exact ints; float pow() keys
    would risk last-ulp order flips across libms).  Selection = the
    WSAMPLE_K smallest priorities.

    Scale shape: priority is a pure map; the top-k is a per-block
    partial head (≤ k rows per block) + tiny driver merge — no global
    sort of the corpus."""
    import hashlib

    ds = _doc(sf_dir, ["doc_id", "text", "n_chars"])

    def prio(batch: pa.Table) -> pa.Table:
        pr = [
            int(hashlib.md5((t or "").encode()).hexdigest()[:15], 16)
            // max(int(w), 1)
            for t, w in zip(
                batch["text"].to_pylist(), batch["n_chars"].to_pylist()
            )
        ]
        out = pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_chars": batch["n_chars"].cast(pa.int64()),
                "priority": pa.array(pr, type=pa.int64()),
            }
        )
        # per-block partial head: only k candidates leave each block
        df = out.to_pandas().nsmallest(WSAMPLE_K, ["priority", "doc_id"])
        return table_from_pandas(df)

    cand = ds.map_batches(prio, batch_format="pyarrow").to_pandas()
    return (
        cand.nsmallest(WSAMPLE_K, ["priority", "doc_id"])
        .sort_values(["priority", "doc_id"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------- 9k
KMEANS_K = 8
KMEANS_ITERS = 6


def q_kmeans_clusters(sf_dir: str):
    """Distributed full-corpus Lloyd's k-means over the embeddings
    table (stages.ann.kmeans_full: per-block k×dim partial sums →
    driver reduce per iteration — mergeable-summaries, no shuffle;
    iterative, so rows-only for the driver).  Returns per-cluster size
    and within-cluster SSE; ground truth (naive single-node Lloyd's,
    identical init) in tests/test_ground_truth.py."""
    from crawler_ray.stages.ann import kmeans_full

    ds = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    dim = len(ds.take(1)[0]["embedding"])
    _, _, assigned = kmeans_full(ds, dim, k=KMEANS_K, iters=KMEANS_ITERS)

    def part(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("cluster", as_index=False).agg(
            n=("cluster", "size"), sse=("sq_dist", "sum")
        )
        return table_from_pandas(df)

    out = (
        assigned.map_batches(part, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("n", alias_name="n"), Sum("sse", alias_name="sse"))
        .to_pandas()  # ≤ k rows
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype(np.int64)
    return out


# ---------------------------------------------------------------- 9j
PRICE_BANDS = [
    ("low", 0.0, 50_000.0),
    ("mid", 50_000.0, 150_000.0),
    ("high", 150_000.0, 300_000.0),
    ("premium", 300_000.0, None),
]


def q_order_price_bands(sf_dir: str):
    """Banded (range-join) classification of orders by total price —
    stages.joins.range_join_broadcast: the tiny interval table is
    broadcast once, membership per batch is ONE vectorized
    searchsorted (no shuffle, no cross product); then a grouped sum
    over the 4 band labels.  Sums are integer cents (round-then-cast,
    the repo's oracle-parity rule)."""
    from crawler_ray.stages.joins import range_join_broadcast

    bands = pa.table(
        {
            "label": pa.array([b[0] for b in PRICE_BANDS]),
            "lo": pa.array([b[1] for b in PRICE_BANDS], type=pa.float64()),
            "hi": pa.array([b[2] for b in PRICE_BANDS], type=pa.float64()),
        }
    )
    ds = _read(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    banded = range_join_broadcast(
        ds, "o_totalprice", bands, keep_cols=("label",)
    )

    def cents(batch: pa.Table) -> pa.Table:
        v = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band": batch["label"],
                "cents": pa.array(
                    np.round(v * 100).astype(np.int64), type=pa.int64()
                ),
            }
        )

    return (
        banded.map_batches(cents, batch_format="pyarrow")
        .groupby("band")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="sum_cents"))
    )


# ---------------------------------------------------------------- 10e
ROLL_WINDOW = 3


def q_rolling_value_sum(sf_dir: str):
    """Rolling per-key window frame (ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW): 3-event sliding sum of integer value-cents per user,
    ordered by (ts, event_id) — exact integer sums, vectorized rolling
    inside bounded hash partitions (sessionize's shuffle shape)."""
    ds = _read(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )

    def add_pkey(batch: pa.Table) -> pa.Table:
        pk = (
            pd.util.hash_array(
                batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            % np.uint64(WINDOW_HASH_PARTITIONS)
        ).astype(np.int64)
        return batch.append_column("pkey", pa.array(pk))

    def roll(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"])
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        s = (
            pd.Series(cents, index=g.index)
            .groupby(g["user_id"].to_numpy(), sort=False)
            .rolling(ROLL_WINDOW, min_periods=1)
            .sum()
            .to_numpy()
            .astype(np.int64)
        )
        return pa.table(
            {
                "event_id": pa.array(g["event_id"].to_numpy(), type=pa.int64()),
                "roll_cents": pa.array(s),
            }
        )

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(roll, batch_format="pandas")
    )


TIME_WINDOW_US = 3_600 * 1_000_000  # RANGE frame width: trailing 1 hour


def q_user_time_window_sum(sf_dir: str):
    """Time-based RANGE window frame — SUM(value) OVER (PARTITION BY
    user ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND
    CURRENT ROW): the VARIABLE-width frame the ROWS family
    (q_rolling_value_sum / q_user_rolling_avg) can't express — each
    row's frame holds however many events fall in its trailing hour,
    and equal-ts peers are in-frame regardless of order (RANGE
    semantics; ORDER BY ts alone, no tiebreaker, per the SQL frame
    rules).  Same bounded hash-partition shuffle as q_sessionize; per
    partition one pass: sort by (user, ts), prefix-sum of integer
    cents, then per USER segment two vectorized ``searchsorted`` calls
    resolve every row's frame [ts − 1 h, ts] as
    ``prefix[right] − prefix[left]`` (left: first ts ≥ cur − 1 h;
    right: ``side='right'`` on cur ts, which is what includes peers).
    The loop is per user segment with vectorized interiors — the
    sessionize discipline, never per row."""
    ds = _read(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def add_pkey(batch: pa.Table) -> pa.Table:
        pk = (
            pd.util.hash_array(
                batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            % np.uint64(WINDOW_HASH_PARTITIONS)
        ).astype(np.int64)
        return batch.append_column("pkey", pa.array(pk))

    def window_part(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts"])
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        prefix = np.concatenate(([0], np.cumsum(cents)))
        users = g["user_id"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, users[1:] != users[:-1], True])
        out = np.empty(len(g), dtype=np.int64)
        for s, e in zip(bounds[:-1], bounds[1:]):
            seg = ts[s:e]
            lo = np.searchsorted(seg, seg - TIME_WINDOW_US, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            out[s:e] = prefix[s + hi] - prefix[s + lo]
        return pa.table(
            {
                "event_id": pa.array(g["event_id"].to_numpy(), type=pa.int64()),
                "window_cents": pa.array(out),
            }
        )

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(window_part, batch_format="pandas")
    )


# ---------------------------------------------------------------- 11b
def q_nation_overlap(sf_dir: str):
    """INTERSECT: nation keys present in BOTH customer and supplier —
    distinct each side map-side (tiny partials), then the bucketed
    semi filter-join."""
    from crawler_ray.stages.joins import bucketed_filter_join

    def distinct_keys(path: str, col: str) -> "rd.Dataset":
        ds = _read(f"{sf_dir}/{path}.parquet", columns=[col])

        def partial(batch: pa.Table) -> pa.Table:
            u = np.unique(
                batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            return pa.table({"nationkey": pa.array(u, type=pa.int64())})

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("nationkey")
            .aggregate(Count(alias_name="_n"))
            .map_batches(
                lambda t: t.select(["nationkey"]), batch_format="pyarrow"
            )
        )

    return bucketed_filter_join(
        distinct_keys("customer", "c_nationkey"),
        distinct_keys("supplier", "s_nationkey"),
        key="nationkey",
        mode="semi",
        left_schema=pa.schema([("nationkey", pa.int64())]),
    )


# ---------------------------------------------------------------- 9e
STRAGG_DOC_CAP = 100


def q_source_doc_list(sf_dir: str):
    """Grouped string aggregation (string_agg / collect_list twin):
    per source, the ordered comma-joined doc ids of a capped subset.
    Per-block partial collect prunes map-side; the final per-group
    concat handles ≤ |cap| ids per group."""
    ds = _read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source"],
        filter=(pc.field("doc_id") < STRAGG_DOC_CAP),
    )

    def collect(g: pd.DataFrame) -> pa.Table:
        ids = sorted(int(x) for x in g["doc_id"])
        return pa.table(
            {
                "source": pa.array([g["source"].iloc[0]], type=pa.string()),
                "doc_list": pa.array(
                    [",".join(str(i) for i in ids)], type=pa.string()
                ),
                "n_docs": pa.array([len(ids)], type=pa.int64()),
            }
        )

    return ds.groupby("source").map_groups(collect, batch_format="pandas")


# ---------------------------------------------------------------- 14g
SKEW_HOT_FRACTION = 0.2


def q_skew_join_docs(sf_dir: str):
    """Skew-aware inner join, oracle-proven on genuinely skewed data:
    `lang='en'` holds ~44% of documents, so it exceeds
    SKEW_HOT_FRACTION and routes through the broadcast hot path while
    the cold langs take the bucketed shuffle
    (stages.joins.skew_aware_hash_join — the driver's oracle proves
    both routes and their union)."""
    from ray.data.aggregate import Sum as _Sum

    from crawler_ray.stages.joins import skew_aware_hash_join

    docs = _doc(sf_dir, ["doc_id", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("lang", as_index=False).size()
        df.columns = ["lang", "n"]
        return table_from_pandas(df)

    lang_counts = (
        _doc(sf_dir, ["lang"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(_Sum("n", alias_name="lang_docs"))
    )

    def pin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "lang_docs": t["lang_docs"].cast(pa.int64()),
            }
        )

    return skew_aware_hash_join(
        docs,
        lang_counts.map_batches(pin, batch_format="pyarrow"),
        key="lang",
        hot_fraction=SKEW_HOT_FRACTION,
        left_schema=pa.schema([("doc_id", pa.int64()), ("lang", pa.string())]),
        right_schema=pa.schema([("lang", pa.string()), ("lang_docs", pa.int64())]),
    )


# ----------------------------------------------------------------- 15
def _derived_url_expr_sql() -> str:
    """Deterministic synthetic URL per document, expressible in both
    engines: doc_id%5 picks the URL shape (valid page / member path /
    pdf / fragment / cross-host)."""
    return (
        "CASE doc_id % 5 "
        "WHEN 0 THEN 'http://www.' || source || '.co.kr/bbs/view' || CAST(doc_id AS VARCHAR) "
        "WHEN 1 THEN 'http://www.' || source || '.co.kr/member/join' "
        "WHEN 2 THEN 'http://www.' || source || '.co.kr/files/r' || CAST(doc_id AS VARCHAR) || '.pdf' "
        "WHEN 3 THEN 'http://www.' || source || '.co.kr/bbs/view' || CAST(doc_id AS VARCHAR) || '#top' "
        "ELSE 'http://other.example.net/bbs/view' || CAST(doc_id AS VARCHAR) END"
    )


def _derived_urls(batch: pa.Table) -> list[str]:
    out = []
    for d, s in zip(batch["doc_id"].to_pylist(), batch["source"].to_pylist()):
        m = d % 5
        if m == 0:
            out.append(f"http://www.{s}.co.kr/bbs/view{d}")
        elif m == 1:
            out.append(f"http://www.{s}.co.kr/member/join")
        elif m == 2:
            out.append(f"http://www.{s}.co.kr/files/r{d}.pdf")
        elif m == 3:
            out.append(f"http://www.{s}.co.kr/bbs/view{d}#top")
        else:
            out.append(f"http://other.example.net/bbs/view{d}")
    return out


def q_link_relevance(sf_dir: str):
    """Link-relevance prefilter (link_filter.py:26-46) over derived
    (anchor, URL) pairs — vectorized regex mask."""
    from crawler_ray.functions.linkfilter import relevance_mask

    ds = _doc(sf_dir, ["doc_id", "source", "text"])

    def apply(batch: pa.Table) -> pa.Table:
        urls = _derived_urls(batch)
        anchors = [t[:40] if t else "" for t in batch["text"].to_pylist()]
        mask = relevance_mask(anchors, urls)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "url": pa.array(urls, type=pa.string()),
                "relevant": mask,
            }
        )

    return ds.map_batches(apply, batch_format="pyarrow")


def q_url_validity(sf_dir: str):
    """Same-netloc URL validity predicate (url_validator.py:5-14) over
    derived URLs, base = the document's own site host."""
    from crawler_ray.functions.urls import valid_url_mask

    ds = _doc(sf_dir, ["doc_id", "source"])

    def apply(batch: pa.Table) -> pa.Table:
        urls = _derived_urls(batch)
        sources = batch["source"].to_pylist()
        valid = []
        # vectorize per netloc group (one regex per distinct host)
        import collections

        by_src = collections.defaultdict(list)
        for i, s in enumerate(sources):
            by_src[s].append(i)
        valid = [False] * len(urls)
        for s, idxs in by_src.items():
            mask = valid_url_mask([urls[i] for i in idxs], f"www.{s}.co.kr").to_pylist()
            for i, v in zip(idxs, mask):
                valid[i] = bool(v)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "valid": pa.array(valid, type=pa.bool_()),
            }
        )

    return ds.map_batches(apply, batch_format="pyarrow")


def q_site_identifier(sf_dir: str):
    """create_site_identifier (config.py:14-25) over derived URLs."""
    from crawler_ray.functions.urls import create_site_identifier

    ds = _doc(sf_dir, ["doc_id", "source"])

    def apply(batch: pa.Table) -> pa.Table:
        urls = _derived_urls(batch)
        idents = [create_site_identifier(u) for u in urls]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "site_identifier": pa.array(idents, type=pa.string()),
            }
        )

    return ds.map_batches(apply, batch_format="pyarrow")


PACKET_CRAWL_TIME = "2026-01-01T00:00:00Z"
PACKET_EXPIRY = "2026-01-31T00:00:00Z"


def q_packet_full(sf_dir: str):
    """Full packet projection incl. deterministic packetId (sha256 of
    site|url|content-hash, uuid-formatted) and fixed timestamps —
    data_packet.py:8-33 semantics with injectable clock/id."""
    import hashlib

    ds = _doc(sf_dir, ["doc_id", "source", "text"])

    def apply(batch: pa.Table) -> pa.Table:
        ids, urls_out, pids, texts_out, exp = [], [], [], [], []
        urls = _derived_urls(batch)
        for d, s, t, u in zip(
            batch["doc_id"].to_pylist(),
            batch["source"].to_pylist(),
            batch["text"].to_pylist(),
            urls,
        ):
            t = t or ""
            chash = hashlib.sha256(t.encode()).hexdigest()
            h = hashlib.sha256(f"{s}|{u}|{chash}".encode()).hexdigest()
            pid = f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
            ids.append(d)
            urls_out.append(u)
            pids.append(pid)
            texts_out.append(t[:500] + ("..." if len(t) > 500 else ""))
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "packetId": pa.array(pids, type=pa.string()),
                "contentUrl": pa.array(urls_out, type=pa.string()),
                "extractedText": pa.array(texts_out, type=pa.string()),
                "crawlTimestamp": pa.array([PACKET_CRAWL_TIME] * n, type=pa.string()),
                "dataExpiryDate": pa.array([PACKET_EXPIRY] * n, type=pa.string()),
            }
        )

    return ds.map_batches(apply, batch_format="pyarrow")


# ---------------------------------------------------------------- 14d
def q_source_profile(sf_dir: str):
    """Per-source profile: distinct-language count + discrete median of
    n_chars (DuckDB quantile_disc: sorted[ceil(q*n)-1]), both computed
    with BOUNDED per-group state (no group ever holds a whole source):

    - median via the two-pass bucket histogram of q_price_quantiles:
      per-(source, n_chars>>shift) counts → driver locates each
      source's median bucket + within-bucket rank → a map-only second
      scan keeps just the selected buckets (≈ rows/buckets per source);
    - n_langs via the exact distinct-pair aggregate (≤ |sources| ×
      |langs| rows by design)."""
    shift = DENSE_RANK_BUCKET_SHIFT
    part_schema = pa.schema(
        [("source", pa.string()), ("bucket", pa.int64()), ("n", pa.int64())]
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["bucket"] = df["n_chars"].to_numpy() >> shift
        g = df.groupby(["source", "bucket"], as_index=False).agg(n=("bucket", "size"))
        return table_from_pandas(g).cast(part_schema)

    hist = (
        _doc(sf_dir, ["source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # ≤ |buckets| × |sources| rows by design
        .sort_values(["source", "bucket"])
        .reset_index(drop=True)
    )
    targets: dict = {}  # (source, bucket) -> rank_within
    for src, g in hist.groupby("source"):
        cum = g["n"].cumsum().to_numpy()
        n = int(cum[-1])
        rank = max(int(np.ceil(round(0.5 * n, 9))), 1)
        i = int(np.searchsorted(cum, rank))
        before = int(cum[i - 1]) if i else 0
        targets[(src, int(g["bucket"].to_numpy()[i]))] = rank - before
    wanted = set(targets)

    def keep_selected(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["bucket"] = df["n_chars"].to_numpy() >> shift
        mask = [
            (s, b) in wanted
            for s, b in zip(df["source"].to_numpy(), df["bucket"].to_numpy())
        ]
        return table_from_pandas(df.loc[mask, ["source", "bucket", "n_chars"]])

    picked = (
        _doc(sf_dir, ["source", "n_chars"])
        .map_batches(keep_selected, batch_format="pyarrow")
        .to_pandas()  # ≈ rows/buckets per selected bucket — tiny
    )
    medians = {}
    for (src, b), rank_within in targets.items():
        vals = np.sort(
            picked.loc[
                (picked["source"] == src) & (picked["bucket"] == b), "n_chars"
            ].to_numpy()
        )
        medians[src] = int(vals[rank_within - 1])

    def lang_distinct(batch: pa.Table) -> pa.Table:
        return table_from_pandas(
            batch.to_pandas()[["source", "lang"]].drop_duplicates()
        )

    pairs = (
        _doc(sf_dir, ["source", "lang"])
        .map_batches(lang_distinct, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Count())
        .to_pandas()  # ≤ |sources| × |langs| rows by design
    )
    n_langs = pairs.groupby("source").size().to_dict()
    return pd.DataFrame(
        [
            {
                "source": src,
                "n_langs": np.int64(n_langs[src]),
                "median_chars": np.int64(medians[src]),
            }
            for src in sorted(medians)
        ]
    )


def q_recent_lineitems(sf_dir: str):
    """Equi + range-predicate join: lineitems shipped within 30 days of
    their order's date, counted per order priority (bucketed co-group
    join; the range predicate filters inside the joined batches)."""
    from crawler_ray.stages.joins import bucketed_hash_join

    li = _read(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(
        lambda t: pa.table({"okey": t["l_orderkey"], "shipdate": t["l_shipdate"]}),
        batch_format="pyarrow",
    )
    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda t: pa.table(
            {
                "okey": t["o_orderkey"],
                "odate": t["o_orderdate"],
                "priority": t["o_orderpriority"],
            }
        ),
        batch_format="pyarrow",
    )
    j = bucketed_hash_join(
        li, orders, key="okey", n_buckets=16,
        left_schema=pa.schema(
            [("okey", pa.int64()), ("shipdate", pa.timestamp("us"))]
        ),
        right_schema=pa.schema(
            [
                ("okey", pa.int64()),
                ("odate", pa.timestamp("us")),
                ("priority", pa.string()),
            ]
        ),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        keep = df["shipdate"] <= df["odate"] + pd.Timedelta(days=30)
        if not keep.any():
            return pa.table(
                {
                    "priority": pa.array([], type=pa.string()),
                    "n_recent": pa.array([], type=pa.int64()),
                }
            )
        g = df[keep].groupby("priority", as_index=False).agg(
            n_recent=("priority", "size")
        )
        return table_from_pandas(g)

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("priority")
        .aggregate(Sum("n_recent", alias_name="n_recent"))
    )


# ---------------------------------------------------------------- 14e
def q_salted_hot_key_agg(sf_dir: str):
    """Skew-safe grouped aggregate: key_histogram picks heavy hitters,
    hot keys fan out over ``key#salt`` sub-keys (no single reduce
    partition receives a whole hot group), then a second tiny groupby
    merges the sub-aggregates.  Values equal the plain GROUP BY — the
    salting is invisible to the result, which is the point."""
    from crawler_ray.stages.shuffle import add_salted_key, hot_keys_above

    ds = _doc(sf_dir, ["source", "n_chars"])
    hot = hot_keys_above(ds, "source", fraction=0.04)
    salted = add_salted_key(ds, "source", n_salt=4, hot_keys=hot)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("salted_key", as_index=False).agg(
            n=("n_chars", "size"), total=("n_chars", "sum")
        )
        return table_from_pandas(df)

    sub = (
        salted.map_batches(partial, batch_format="pyarrow")
        .groupby("salted_key")
        .aggregate(Sum("n", alias_name="n"), Sum("total", alias_name="total"))
    )

    def unsalt(batch: pa.Table) -> pa.Table:
        src = [k.rsplit("#", 1)[0] for k in batch["salted_key"].to_pylist()]
        return pa.table(
            {
                "source": pa.array(src, type=pa.string()),
                "n": batch["n"],
                "total": batch["total"],
            }
        )

    return (
        sub.map_batches(unsalt, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n", alias_name="n_docs"), Sum("total", alias_name="total_chars")
        )
    )


# -------------------------------------------- rows-only (non-SQL) ops
def _ivf_index_dir(sf_dir: str) -> str:
    """Stable per-corpus location for the persisted IVF index (testdata
    is read-only, so keying by realpath is safe)."""
    import hashlib as _hl
    import os

    # n_cells is part of the key so a knob change never reuses a stale index
    tag = _hl.md5(f"{os.path.realpath(sf_dir)}|cells=16".encode()).hexdigest()[:12]
    return f"/tmp/crawler_ray_ivf/{tag}"


def q_ann_ivf_topk(sf_dir: str):
    """IVF ANN top-10 for the same query as q_ann_topk (n_cells=16,
    nprobe=8).  The index is PERSISTED cell-partitioned parquet built
    once per corpus (build_ivf_index); this query loads it and reads
    only the probed cells' partition dirs — repeat calls never rescan
    or re-assign the corpus.  Seeded centroid training keeps the
    result deterministic."""
    from crawler_ray.stages.ann import ivf_topk

    ds = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qrow = ds.filter(expr=f"vec_id == {ANN_QUERY_ID}").take(1)[0]
    dim = len(qrow["embedding"])
    queries = {
        "query_id": [ANN_QUERY_ID],
        "embedding": [np.asarray(qrow["embedding"], dtype=np.float64)],
    }
    rest = ds.filter(expr=f"vec_id != {ANN_QUERY_ID}")
    pdf = ivf_topk(
        rest, queries, dim=dim, k=ANN_K, n_cells=16, nprobe=8,
        index_dir=_ivf_index_dir(sf_dir),
    )
    pdf = pdf.sort_values(["cosine", "vec_id"], ascending=[False, True]).reset_index(
        drop=True
    )
    pdf["rank"] = np.arange(1, len(pdf) + 1, dtype=np.int64)
    return pdf[["vec_id", "rank"]]


def q_semantic_dedup(sf_dir: str):
    """SemDeDup over the embeddings table: k-means (k=8, deterministic
    bottom-k-by-id init) then within-cluster greedy-leader cosine dedup
    at the corpus' near-dup threshold.  Iterative k-means + float
    cosines → rows-only; exact ground truth (naive Lloyd + driver-side
    greedy recompute) in tests/test_ground_truth.py."""
    from crawler_ray.stages.ann import semantic_dedup

    ds = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    dim = len(ds.take(1)[0]["embedding"])
    out = semantic_dedup(
        ds, dim=dim, k=8, threshold=DUP_COSINE_THRESHOLD
    ).to_pandas()
    out = out[["vec_id", "cluster", "kept", "dup_of"]].astype(
        {"vec_id": "int64", "cluster": "int64", "kept": "bool", "dup_of": "int64"}
    )
    return out.sort_values("vec_id").reset_index(drop=True)


def q_dsir_select(sf_dir: str):
    """DSIR importance resampling (Xie et al. 2023): select the 50 raw
    docs (source != 'src0') whose hashed-n-gram distribution best
    matches the in-corpus target domain 'src0', via Gumbel-top-k over
    length-normalized log importance weights (deterministic md5
    Gumbel keys).  Float log-weights → rows-only; exact ground truth
    (naive full recompute, same numpy ops) in
    tests/test_ground_truth.py."""
    from crawler_ray.stages.dsir import dsir_select

    ds = _doc(sf_dir, ["doc_id", "text", "source"])
    return dsir_select(ds, target_source="src0", k=50, n_buckets=1024)


def q_dedup_clusters(sf_dir: str):
    """End-to-end near-dup clustering: MinHash-LSH candidates →
    join-verified Jaccard ≥ 0.6 → join-based connected components →
    (component, n_docs) cluster sizes.  Nothing corpus-sized touches
    the driver at any stage."""
    from crawler_ray.stages.dedup import (
        connected_components,
        minhash_candidate_pairs,
        verify_jaccard_joined,
    )

    ds = _doc(sf_dir, ["doc_id", "text"])
    pairs = minhash_candidate_pairs(ds, num_perm=64, num_bands=16)
    verified = verify_jaccard_joined(pairs, ds, threshold=0.6)
    labels = connected_components(verified)
    pdf = labels.to_pandas()
    if pdf.empty:
        return pd.DataFrame({"component": [], "n_docs": []})
    g = pdf.groupby("label", as_index=False).agg(n_docs=("node", "size"))
    g = g.rename(columns={"label": "component"})
    return g.sort_values("component").reset_index(drop=True)


def q_minhash_near_dups(sf_dir: str):
    """MinHash-LSH near-dup candidate pairs, Jaccard-verified ≥ 0.6.

    Scale shape: nothing corpus-sized ever lands on the driver — the
    verify is a bucketed hash-join of candidate pairs against the docs
    table (boilerplate-heavy crawls break any "candidates are small"
    assumption)."""
    from crawler_ray.stages.dedup import minhash_candidate_pairs, verify_jaccard_joined

    ds = _doc(sf_dir, ["doc_id", "text"])
    # fully lazy end-to-end: one streaming execution covers signatures →
    # banding → pair dedup → the two verify joins
    pairs = minhash_candidate_pairs(ds, num_perm=64, num_bands=16)
    verified = verify_jaccard_joined(pairs, ds, threshold=0.6)
    pdf = verified.to_pandas()
    if pdf.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    pdf = pdf[["id_a", "id_b", "jaccard"]]
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_simhash_blocks(sf_dir: str):
    from crawler_ray.stages.dedup import simhash_dedup_keys

    ds = _doc(sf_dir, ["doc_id", "text"])
    out = simhash_dedup_keys(ds).select_columns(["doc_id", "simhash", "simhash_block"])
    return out


def q_doc_fingerprints(sf_dir: str):
    from crawler_ray.functions.hashing import rolling_fingerprint

    ds = _doc(sf_dir, ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        prints = [rolling_fingerprint(t or "") for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(
                    [[str(x) for x in p] for p in prints], type=pa.list_(pa.string())
                ),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


def q_fingerprint_near_dups(sf_dir: str):
    """Winnowing-fingerprint near-dup pairs (resemblance ≥ 0.5): the
    sub-document dedup signal — shared passages surface even when
    whole-document MinHash dilutes them.  Rolling k-gram hash +
    rightmost-min window selection (Schleimer et al., SIGMOD 2003);
    all-bounded shape documented on stages.dedup.fingerprint_near_dups;
    ground-truth pytest (exact all-pairs fingerprint Jaccard) in
    tests/test_ground_truth.py."""
    from crawler_ray.stages.dedup import fingerprint_near_dups

    ds = _doc(sf_dir, ["doc_id", "text"])
    pairs = fingerprint_near_dups(ds, threshold=0.5)
    return (
        pairs.to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def q_simhash_near_dups(sf_dir: str):
    """SimHash near-dup pairs (hamming ≤ 6) over documents."""
    from crawler_ray.stages.dedup import simhash_near_dups

    ds = _doc(sf_dir, ["doc_id", "text"])
    pairs = simhash_near_dups(ds, hamming_threshold=6)
    pdf = pairs.to_pandas()
    return pdf.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_approx_value_quantiles(sf_dir: str):
    """Mergeable-sketch quantiles of the events value column (KLL-style
    deterministic compaction; functions.sketches.QuantileSketch) — the
    shuffle-free streaming-percentile path; rank-error ground truth in
    tests/test_sketches.py.  The EXACT path is q_price_quantiles."""
    from crawler_ray.functions.sketches import approx_quantiles

    ds = _read(f"{sf_dir}/events.parquet", columns=["value"])
    got = approx_quantiles(ds, "value", [0.25, 0.5, 0.9], k=256)
    return pd.DataFrame(
        [{"quantile": k, "value": float(v)} for k, v in sorted(got.items())]
    )


def q_approx_distinct(sf_dir: str):
    """HyperLogLog approximate distinct counts (mergeable per-batch
    sketches) vs nothing-to-hide exact columns for context."""
    from crawler_ray.functions.sketches import approx_distinct

    docs = _doc(sf_dir, ["source"])
    events = _read(f"{sf_dir}/events.parquet", columns=["user_id"])
    return pd.DataFrame(
        {
            "column": ["documents.source", "events.user_id"],
            "approx_distinct": [
                round(approx_distinct(docs, "source")),
                round(approx_distinct(events, "user_id")),
            ],
        }
    )


HH_K = 64


def q_heavy_hitter_tokens(sf_dir: str):
    """Misra–Gries frequent tokens (capacity HH_K): the sketch path for
    top-token detection when the vocabulary is too large for the exact
    vocab_topk shuffle — each block ships ≤ HH_K (token, count) pairs.
    min_count is the sketch's guaranteed lower bound.  Ground-truth
    coverage: tests/test_sketches.py asserts the n/(k+1) guarantee and
    merge correctness against exact counts."""
    from crawler_ray.functions.sketches import heavy_hitters

    ds = _doc(sf_dir, ["text"])
    df = heavy_hitters(
        ds, "text", k=HH_K,
        tokenize=lambda t: _VOCAB_TOKEN.findall((t or "").lower()),
    )
    df["min_count"] = df["min_count"].astype("int64")
    return df


def q_quantized_embeddings(sf_dir: str):
    """Int8 symmetric per-vector quantization of the embedding column
    (stages/ann.py:quantize_embeddings — 4× density for the ANN
    corpus; ground-truth pytest bounds cosine distortion and top-10
    recall).  Emits (vec_id, q8_scale, n_codes)."""
    from crawler_ray.stages.ann import quantize_embeddings

    ds = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def project(t: pa.Table) -> pa.Table:
        n_codes = pa.array(
            [len(c) for c in t["embedding_q8"].to_pylist()], type=pa.int64()
        )
        return pa.table(
            {
                "vec_id": t["vec_id"],
                "q8_scale": t["q8_scale"],
                "n_codes": n_codes,
            }
        )

    return quantize_embeddings(ds).map_batches(project, batch_format="pyarrow")


PACK_BUDGET = 4096


def q_pack_sequences(sf_dir: str):
    """Greedy per-block sequence packing into PACK_BUDGET-char training
    bins (stages/packing.py — not SQL-expressible; ground-truth pytest
    asserts exact coverage + budget bounds)."""
    from crawler_ray.stages.packing import pack_sequences

    ds = _doc(sf_dir, ["doc_id", "n_chars"])
    return pack_sequences(ds, id_col="doc_id", len_col="n_chars",
                          bin_budget=PACK_BUDGET)


def q_media_features(sf_dir: str):
    """Multimodal plumbing: deterministic media table → image-decode +
    audio-feature actor stages (codecs stubbed; schema/layout real)."""
    import ray.data as _rd

    from crawler_ray.stages.multimodal import (
        audio_features,
        decode_images,
        synth_media_table,
    )

    media = _rd.from_arrow(synth_media_table(n=96, seed=42))
    img = decode_images(media).select_columns(["media_ref", "media_type", "height", "width"])
    aud = audio_features(media).select_columns(["media_ref", "duration_s", "n_frames"])
    ipd = img.to_pandas()
    apd = aud.to_pandas()
    return ipd.merge(apd, on="media_ref").sort_values("media_ref").reset_index(drop=True)


def q_link_pagerank(sf_dir: str):
    """PageRank over the synthetic web's crawlable link graph (the
    deterministic F-fixture graph, like q_interleaved_spans — the sf
    tables carry no edge list).  Rows-only entry: iterative algorithms
    are the documented non-SQL-expressible category; correctness is
    pinned by the power-iteration ground-truth test
    (tests/test_ground_truth.py::test_pagerank_ground_truth).

    Scale shape (stages/graph.py): the edge table is only ever
    map_batches'd — never reshuffled; node-scale rank/degree state is
    numpy under an explicit byte budget that RAISES with the bucketed
    co-group guidance when exceeded."""
    import ray.data as _rd

    from crawler_ray.sources.synth import demo_web, link_edges
    from crawler_ray.stages.graph import pagerank

    web = demo_web(n_sites=4, n_pages=200, seed=42)
    edges = link_edges(web)
    n_nodes = sum(s.n_pages for s in web.sites.values())
    return pagerank(_rd.from_arrow(edges), n_nodes, alpha=0.85, n_iter=20)


def q_interleaved_spans(sf_dir: str):
    """The input_hint interleaved table end-to-end: deterministic F3
    fixture → per-doc span stats + delimiter-string round-trip check
    (kind/text/media_ref/offset preserved)."""
    import ray.data as _rd

    from crawler_ray.functions.spans import parse_main_text, render_main_text, span_key
    from crawler_ray.sources.synth import interleaved_documents

    docs = _rd.from_arrow(interleaved_documents(n_docs=200, seed=42))

    def stats(batch: pa.Table) -> pa.Table:
        ids, n_spans, n_media, n_fail, ok = [], [], [], [], []
        for d, spans in zip(batch["doc_id"].to_pylist(), batch["spans"].to_pylist()):
            spans = spans or []
            rendered = render_main_text(spans)
            back = parse_main_text(rendered)
            ids.append(d)
            n_spans.append(len(spans))
            n_media.append(sum(1 for s in spans if s["kind"] == "media"))
            n_fail.append(sum(1 for s in spans if s["kind"] == "media_failed"))
            ok.append([span_key(s) for s in back] == [span_key(s) for s in spans])
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.string()),
                "n_spans": pa.array(n_spans, type=pa.int32()),
                "n_media": pa.array(n_media, type=pa.int32()),
                "n_failures": pa.array(n_fail, type=pa.int32()),
                "roundtrip_ok": pa.array(ok, type=pa.bool_()),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


def q_language_id(sf_dir: str):
    """Heuristic language ID vs the stored label (accuracy by lang)."""
    ds = _doc(sf_dir, ["doc_id", "text", "lang"])

    def pred(batch: pa.Table) -> pa.Table:
        p = [detect_language(t or "") for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "predicted": pa.array(p, type=pa.string()),
            }
        )

    return ds.map_batches(pred, batch_format="pyarrow")


# --------------------------------------------------------------- 21a
# Multi-way join chains + classic warehouse shapes (round 5 widening).
Q5_REGION = "ASIA"
Q5_DATE_LO = "1995-01-01"
Q5_DATE_HI = "1996-01-01"


def q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape: revenue by nation where customer and supplier
    share the nation, restricted to one region and one order-date year
    — a FOUR-way large-table join chain (lineitem ⋈ orders ⋈ customer
    ⋈ supplier) on Ray Data's native hash-partitioned joins, with the
    two dimension tables (nation, region — ≤ 25 / 5 rows by schema)
    read driver-side and applied as read-time key filters.

    Scale notes: every fact read is column-pruned and the date / nation
    predicates are pushed into the parquet scan; the joins hash-
    partition on their keys (no broadcast of a large side anywhere);
    revenue is exact-integer `cents × (100 − discount%)` computed
    MAP-SIDE before the widest join so the lineitem side ships two
    ints, and the grouped sum is order-independent and bit-equal to
    the SQL twin.  The chain uses the repo's sort-shuffle
    ``bucketed_hash_join`` rather than three concurrent native hash
    joins: each native join's aggregator pool reserves ~50% of cluster
    CPUs in long-lived actors, so three in one streaming plan deadlock
    on small CPU budgets (and fight each other on any budget), while
    the sort-shuffle joins are plain all-to-alls with no standing
    reservation."""
    import pyarrow.parquet as _pq

    reg = _pq.read_table(f"{sf_dir}/region.parquet").to_pandas()  # ≤ 5 rows
    nat = _pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()  # ≤ 25 rows
    rkey = int(reg.loc[reg["r_name"] == Q5_REGION, "r_regionkey"].iloc[0])
    nmap = {
        int(k): str(v)
        for k, v, r in zip(nat["n_nationkey"], nat["n_name"], nat["n_regionkey"])
        if int(r) == rkey
    }
    nation_keys = sorted(nmap)

    from crawler_ray.stages.joins import bucketed_hash_join

    lo = np.datetime64(Q5_DATE_LO, "us")
    hi = np.datetime64(Q5_DATE_HI, "us")
    cust = _read(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=pc.field("c_nationkey").isin(nation_keys),
    ).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_nationkey"]),
        batch_format="pyarrow",
    )
    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    ).map_batches(
        lambda t: t.select(["o_orderkey", "o_custkey"]), batch_format="pyarrow"
    )

    def li_project(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(df["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": pa.array(df["l_orderkey"], type=pa.int64()),
                "l_suppkey": pa.array(df["l_suppkey"], type=pa.int64()),
                "revenue_milli": pa.array(cents * (100 - disc), type=pa.int64()),
            }
        )

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_project, batch_format="pyarrow")
    sup = _read(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        filter=pc.field("s_nationkey").isin(nation_keys),
    ).map_batches(
        lambda t: t.rename_columns(["l_suppkey", "s_nationkey"]),
        batch_format="pyarrow",
    )

    i64 = pa.int64()
    oc = bucketed_hash_join(
        orders,
        cust,
        key="o_custkey",
        left_schema=pa.schema([("o_orderkey", i64), ("o_custkey", i64)]),
        right_schema=pa.schema([("o_custkey", i64), ("c_nationkey", i64)]),
    ).map_batches(
        lambda t: t.select(["o_orderkey", "c_nationkey"]).rename_columns(
            ["l_orderkey", "c_nationkey"]
        ),
        batch_format="pyarrow",
    )
    lioc = bucketed_hash_join(
        li,
        oc,
        key="l_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", i64), ("l_suppkey", i64), ("revenue_milli", i64)]
        ),
        right_schema=pa.schema([("l_orderkey", i64), ("c_nationkey", i64)]),
    )
    full = bucketed_hash_join(
        lioc,
        sup,
        key="l_suppkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", i64),
                ("l_suppkey", i64),
                ("revenue_milli", i64),
                ("c_nationkey", i64),
            ]
        ),
        right_schema=pa.schema([("l_suppkey", i64), ("s_nationkey", i64)]),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["c_nationkey"] == df["s_nationkey"]]
        g = df.groupby("s_nationkey", as_index=False).agg(
            n_items=("revenue_milli", "size"), revenue_milli=("revenue_milli", "sum")
        )
        # explicit schema: an all-filtered batch otherwise yields a
        # column-less empty block that trips schema unification
        return pa.table(
            {
                "s_nationkey": pa.array(g["s_nationkey"], type=pa.int64()),
                "n_items": pa.array(g["n_items"], type=pa.int64()),
                "revenue_milli": pa.array(g["revenue_milli"], type=pa.int64()),
            }
        )

    agg = (
        full.map_batches(partial, batch_format="pyarrow")
        .groupby("s_nationkey")
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("revenue_milli", alias_name="revenue_milli"),
        )
        .to_pandas()  # ≤ |nations in region| rows by construction
    )
    agg["n_name"] = agg["s_nationkey"].map(nmap)
    return agg[["n_name", "n_items", "revenue_milli"]]


LARGE_VOLUME_QTY = 300


def q_large_volume_customers(sf_dir: str):
    """TPC-H Q18 shape (grouped HAVING, then join the survivors back):
    orders whose total lineitem quantity exceeds LARGE_VOLUME_QTY, with
    the buyer's name.  The HAVING survivors are the join side — by
    construction a vanishing fraction of orders (the threshold sits
    near the max basket sum: 46 of 150k orders at sf0.01), so they are
    collected driver-side (bounded by threshold selectivity, the
    documented invariant) and pushed back into BOTH fact reads as
    key-IN filters — the second pass scans prune at the parquet layer
    instead of shuffling anything."""
    li = _read(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["qty"] = np.round(df["l_quantity"].to_numpy()).astype(np.int64)
        g = df.groupby("l_orderkey", as_index=False).agg(qty=("qty", "sum"))
        return table_from_pandas(g)

    def tag(batch: pa.Table) -> pa.Table:
        pk = (batch["l_orderkey"].to_numpy() % np.int64(256)).astype(np.int64)
        return batch.append_column("pkey", pa.array(pk))

    def sum_filter(g: pd.DataFrame) -> pa.Table:
        # an orderkey lives in exactly one pkey partition, so this
        # vectorized per-partition sum IS the global sum — no per-group
        # Python accumulator (Ray's groupby(key).aggregate runs one,
        # ~12k groups/s; 1.5M order groups at sf1+ would be minutes)
        s = g.groupby("l_orderkey", as_index=False).agg(total_qty=("qty", "sum"))
        s = s[s["total_qty"] > LARGE_VOLUME_QTY]
        return pa.table(
            {
                "l_orderkey": pa.array(s["l_orderkey"], type=pa.int64()),
                "total_qty": pa.array(s["total_qty"], type=pa.int64()),
            }
        )

    sums = (
        li.map_batches(partial, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(sum_filter, batch_format="pandas")
        .to_pandas()  # bounded: HAVING survivors only (threshold selectivity)
    )
    if sums.empty:
        return pd.DataFrame(
            columns=["custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty"]
        )
    okeys = [int(k) for k in sums["l_orderkey"]]
    orders = (
        _read(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
            filter=pc.field("o_orderkey").isin(okeys),
        ).to_pandas()  # ≤ |survivors| rows by the read filter
    )
    merged = orders.merge(sums, left_on="o_orderkey", right_on="l_orderkey")
    ckeys = sorted({int(c) for c in merged["o_custkey"]})
    cust = (
        _read(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name"],
            filter=pc.field("c_custkey").isin(ckeys),
        ).to_pandas()  # ≤ |survivors| rows by the read filter
    )
    out = merged.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out = out.rename(columns={"c_custkey": "custkey"})
    out["total_qty"] = out["total_qty"].astype(np.int64)
    return out[["custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty"]]


BASKET_TOPK = 20
BASKET_PARTITIONS = 64
BASKET_MAX_PARTS = 128  # raise-never-cap guard on per-order basket width


def q_market_basket_pairs(sf_dir: str):
    """Market-basket co-occurrence: the BASKET_TOPK most frequent part
    PAIRS appearing together in an order (the classic self-join that
    explodes quadratically if done naively).  Scale shape: baskets
    co-locate by ``l_orderkey % BASKET_PARTITIONS`` (an order lives in
    exactly one partition, so pair generation is partition-local);
    within a partition, orders are grouped by basket size k and pairs
    for ALL same-size baskets are emitted in one `np.triu_indices`
    matrix op (no per-order Python loop); per-partition pair counts are
    map-side partials, so the only all-to-all carries (pair, count)
    partials, never raw pairs.  A basket wider than BASKET_MAX_PARTS
    RAISES (k² blowup is a data bug, not a silent cap — the repo's
    raise-never-cap rule).  The global pair reduction reuses
    stages.dedup.combine_pairs_by_hash — Ray's multi-key
    groupby([p1,p2]).aggregate runs a per-group Python accumulator
    (~12k groups/s), minutes of CPU at the ~1M pairs sf0.1 already
    produces; the single-hash-key vectorized combine took the sf0.1
    leg from ~26 s to ~4 s."""
    ds = _read(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])

    def tag(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates(["l_orderkey", "l_partkey"])
        df["pkey"] = (df["l_orderkey"] % BASKET_PARTITIONS).astype(np.int64)
        return table_from_pandas(df)

    def gen_pairs(g: pd.DataFrame) -> pa.Table:
        from crawler_ray.functions.arrow_utils import segment_pairs

        df = g.drop_duplicates(["l_orderkey", "l_partkey"]).sort_values(
            ["l_orderkey", "l_partkey"]
        )
        # rows sorted by (order, part) → pairs come out a < b
        a, b = segment_pairs(
            df["l_orderkey"].to_numpy(),
            df["l_partkey"].to_numpy(),
            BASKET_MAX_PARTS,
            "BASKET_MAX_PARTS",
        )
        if not len(a):
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        out = pd.DataFrame({"id_a": a, "id_b": b}).groupby(
            ["id_a", "id_b"], as_index=False
        ).size()
        out = out.rename(columns={"size": "n"})
        return table_from_pandas(out)

    from crawler_ray.stages.dedup import combine_pairs_by_hash

    counts = combine_pairs_by_hash(
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(gen_pairs, batch_format="pandas"),
        [("n", "n", "sum")],
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().rename(columns={"id_a": "p1", "id_b": "p2"})
        df = df.sort_values(["n", "p1", "p2"], ascending=[False, True, True])
        return table_from_pandas(df[["p1", "p2", "n"]].head(BASKET_TOPK))

    merged = counts.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    # driver merge bounded: ≤ BASKET_TOPK rows per block reach here
    merged = merged.sort_values(["n", "p1", "p2"], ascending=[False, True, True])
    return merged.head(BASKET_TOPK).reset_index(drop=True)


TOP_EVENT_PARTITIONS = 256


def q_user_top_event(sf_dir: str):
    """Mode per group (most frequent event_type per user, lexicographic
    tiebreak) — the grouped-argmax twin of ``ROW_NUMBER() OVER
    (PARTITION BY user ORDER BY cnt DESC, type) = 1``.  Map-side
    partial counts shrink the shuffle to the (user, type) count table
    (≤ users × |event types| rows); the argmax pass co-locates by
    ``hash(user) % TOP_EVENT_PARTITIONS`` so no pandas group ever holds
    one user per group (billions of tiny groups) nor one giant group —
    the partition is the unit, and first-per-user is one vectorized
    sort + drop_duplicates inside it."""
    ev = _read(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["user_id", "event_type"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        g["pkey"] = (g["user_id"] % TOP_EVENT_PARTITIONS).astype(np.int64)
        return table_from_pandas(g)

    def argmax(g: pd.DataFrame) -> pa.Table:
        # a user's partial counts all live in this partition: merge
        # them here (globally exact), then take first-per-user — no
        # multi-key Ray aggregate over user×type (user-cardinality
        # groups, per-group Python accumulator)
        m = g.groupby(["user_id", "event_type"], as_index=False).agg(n=("n", "sum"))
        top = (
            m.sort_values(["user_id", "n", "event_type"], ascending=[True, False, True])
            .drop_duplicates("user_id")
            .rename(columns={"event_type": "top_event"})
        )
        return table_from_pandas(top[["user_id", "top_event", "n"]])

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(argmax, batch_format="pandas")
    )


POSTINGS_K = 20
POSTINGS_PARTITIONS = 256


def q_posting_lists(sf_dir: str):
    """Inverted-index build: per token, the document frequency and the
    posting list of the first POSTINGS_K doc_ids (ascending).  The
    explode emits DISTINCT (token, doc) pairs per document map-side (a
    doc contributes each token once regardless of term frequency), so
    the one all-to-all ships exactly the index entries; tokens co-locate
    by ``hash(token) % POSTINGS_PARTITIONS`` — a partition holds many
    whole tokens, and df/postings are computed per token with one sort
    + segment pass.  Posting lists are BOUNDED at POSTINGS_K (full df is
    still exact) so a stopword's group cannot materialize a corpus-sized
    list — the standard truncated-postings discipline."""
    docs = _doc(sf_dir, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ids, toks = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for tok in set(_VOCAB_TOKEN.findall((t or "").lower())):
                ids.append(d)
                toks.append(tok)
        if not toks:
            # typed empty block: a default empty DataFrame would emit
            # (double, double) columns and break the single-schema stream
            return pa.table(
                {
                    "token": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "pkey": pa.array([], type=pa.int64()),
                }
            )
        out = pd.DataFrame({"token": toks, "doc_id": ids})
        out["pkey"] = hash_pkey(out["token"].to_numpy(dtype=object), POSTINGS_PARTITIONS)
        return table_from_pandas(out)

    def build(g: pd.DataFrame) -> pa.Table:
        df = g.sort_values(["token", "doc_id"])
        tokens, dfreq, postings = [], [], []
        for tok, sub in df.groupby("token", sort=False):
            ids = sub["doc_id"].to_numpy()
            tokens.append(tok)
            dfreq.append(len(ids))
            postings.append(",".join(str(int(i)) for i in ids[:POSTINGS_K]))
        return pa.table(
            {
                "token": pa.array(tokens, type=pa.string()),
                "df": pa.array(dfreq, type=pa.int64()),
                "postings": pa.array(postings, type=pa.string()),
            }
        )

    return (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(build, batch_format="pandas")
    )


def q_parts_above_brand_avg(sf_dir: str):
    """Correlated-subquery shape (`price > AVG(price) per brand`) as
    two passes: exact integer per-brand sums → one double division →
    broadcast the ≤ |brands| avg map → vectorized filter.  The
    broadcast side is bounded by brand cardinality (25), never rows."""
    path = f"{sf_dir}/part.parquet"
    cols = ["p_partkey", "p_brand", "p_retailprice"]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["cents"] = np.round(df["p_retailprice"].to_numpy() * 100).astype(np.int64)
        g = df.groupby("p_brand", as_index=False).agg(
            cents=("cents", "sum"), n=("cents", "size")
        )
        return table_from_pandas(g)

    sums = (
        _read(path, columns=["p_brand", "p_retailprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
        .to_pandas()  # ≤ |brands| rows by construction
    )
    avg_map = {
        str(b): float(c) / float(n)
        for b, c, n in zip(sums["p_brand"], sums["cents"], sums["n"])
    }
    avg_ref = ray.put(avg_map)

    def above(batch: pa.Table) -> pa.Table:
        amap = ray.get(avg_ref)
        df = batch.to_pandas()
        cents = np.round(df["p_retailprice"].to_numpy() * 100).astype(np.int64)
        thr = df["p_brand"].map(amap).to_numpy(dtype=np.float64)
        keep = cents > thr
        return pa.table(
            {
                "p_partkey": pa.array(
                    df["p_partkey"].to_numpy()[keep], type=pa.int64()
                ),
                "p_brand": pa.array(
                    df["p_brand"].to_numpy()[keep], type=pa.string()
                ),
                "retail_cents": pa.array(cents[keep], type=pa.int64()),
            }
        )

    return _read(path, columns=cols).map_batches(above, batch_format="pyarrow")


def q_daily_active_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per day — the two-level aggregate
    that makes exact distinct scale: map-side (day, user) dedup +
    per-pair event counts shrink the first shuffle to the distinct-pair
    table; the second pass counts pairs per day map-side, so the final
    groupby carries ≤ |days| × blocks partial rows.  No sketch — the
    HLL variant is q_approx_distinct; this is its exact twin."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # int64 epoch-µs day key: timestamp keys degrade to coarser
        # units through shuffle/pandas round-trips (precision-warning
        # spam); ints survive exactly, cast back once at the end
        df["day_us"] = (
            df["ts"].dt.floor("D").astype("datetime64[us]").astype(np.int64)
        )
        g = df.groupby(["day_us", "user_id"], as_index=False).size()
        g = g.rename(columns={"size": "n_events"})
        g["pkey"] = hash_pkey(g["user_id"].to_numpy(), 256)
        return table_from_pandas(g)

    def per_day(g: pd.DataFrame) -> pa.Table:
        # a user's pairs all live in this partition, so merging batch
        # partials per (day, user) here is globally exact — no
        # multi-key Ray aggregate over day×user (corpus-scale groups,
        # per-group Python accumulator)
        m = g.groupby(["day_us", "user_id"], as_index=False).agg(
            n_events=("n_events", "sum")
        )
        p = m.groupby("day_us", as_index=False).agg(
            n_users=("user_id", "size"), n_events=("n_events", "sum")
        )
        return table_from_pandas(p)

    agg = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(per_day, batch_format="pandas")
        .groupby("day_us")
        .aggregate(
            Sum("n_users", alias_name="n_users"),
            Sum("n_events", alias_name="n_events"),
        )
    )

    def to_ts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": batch["day_us"].cast(pa.timestamp("us")),
                "n_users": batch["n_users"],
                "n_events": batch["n_events"],
            }
        )

    return agg.map_batches(to_ts, batch_format="pyarrow")


def q_new_vs_returning(sf_dir: str):
    """Per-day split of active users into NEW (first-ever activity is
    that day) vs RETURNING — the first-touch attribution shape.  The
    distinct (user, day) activity table co-locates by
    ``hash(user) % WINDOW_HASH_PARTITIONS``, so each user's full day
    history sits in one partition and first-day marking is one
    vectorized groupby-min compare; day totals then aggregate from
    map-side partials.  No per-user driver state anywhere."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        day_us = (
            df["ts"].dt.floor("D").astype("datetime64[us]").astype(np.int64)
        )
        g = pd.DataFrame({"user_id": df["user_id"], "day_us": day_us})
        g = g.drop_duplicates()
        g["pkey"] = hash_pkey(g["user_id"].to_numpy(), WINDOW_HASH_PARTITIONS)
        return table_from_pandas(g)

    def mark_new(g: pd.DataFrame) -> pa.Table:
        df = g.drop_duplicates(["user_id", "day_us"])
        first = df.groupby("user_id")["day_us"].transform("min")
        out = pd.DataFrame(
            {
                "day_us": df["day_us"],
                "n_new": (df["day_us"] == first).astype(np.int64),
                "n_returning": (df["day_us"] != first).astype(np.int64),
            }
        )
        p = out.groupby("day_us", as_index=False).agg(
            n_new=("n_new", "sum"), n_returning=("n_returning", "sum")
        )
        return table_from_pandas(p)

    agg = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(mark_new, batch_format="pandas")
        .groupby("day_us")
        .aggregate(
            Sum("n_new", alias_name="n_new"),
            Sum("n_returning", alias_name="n_returning"),
        )
    )

    def to_ts(batch: pa.Table) -> pa.Table:
        day = batch["day_us"].cast(pa.timestamp("us"))
        return pa.table(
            {
                "day": day,
                "n_new": batch["n_new"],
                "n_returning": batch["n_returning"],
            }
        )

    return agg.map_batches(to_ts, batch_format="pyarrow")


def q_event_transitions(sf_dir: str):
    """First-order Markov transition counts over per-user event
    sequences (prev type → next type, ordered by ts with event_id
    tiebreak) — the sequence-mining shape behind session-path analysis.
    Same bounded hash-partition discipline as q_event_gaps: a user's
    whole sequence sits in one of WINDOW_HASH_PARTITIONS partitions,
    the within-user shift is one vectorized pass, and only (prev, next,
    partial count) rows reach the final groupby."""
    ds = _read(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts", "event_type"]
    )

    def add_pkey(batch: pa.Table) -> pa.Table:
        pk = hash_pkey(
            batch["user_id"].to_numpy(zero_copy_only=False), WINDOW_HASH_PARTITIONS
        )
        return batch.append_column("pkey", pa.array(pk))

    def transitions(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["user_id", "ts", "event_id"])
        same_user = g["user_id"].to_numpy() == np.roll(g["user_id"].to_numpy(), 1)
        same_user[0] = False
        prev = np.roll(g["event_type"].to_numpy(), 1)
        keep = same_user
        out = pd.DataFrame(
            {"prev_type": prev[keep], "next_type": g["event_type"].to_numpy()[keep]}
        )
        p = out.groupby(["prev_type", "next_type"], as_index=False).size()
        p = p.rename(columns={"size": "n"})
        return table_from_pandas(p)

    return (
        ds.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(transitions, batch_format="pandas")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def q_distinct_parts_per_supplier(sf_dir: str):
    """Exact grouped distinct count over the biggest fact table
    (COUNT(DISTINCT l_partkey) per supplier): map-side pair dedup
    shrinks the shuffle to distinct-per-batch (supplier, part) pairs,
    co-located by ``hash(supplier) % 256`` — a supplier lives in
    exactly one partition, so one vectorized drop_duplicates + groupby
    size per partition IS the global distinct count.  No multi-key
    Ray aggregate (a per-group Python accumulator at ~12k groups/s —
    minutes of CPU once distinct pairs reach ~1M)."""
    ds = _read(f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"])

    def dedup(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates(["l_suppkey", "l_partkey"])
        df["pkey"] = hash_pkey(df["l_suppkey"].to_numpy(), 256)
        return table_from_pandas(df)

    def count_parts(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["l_suppkey", "l_partkey"])
        c = d.groupby("l_suppkey", as_index=False).agg(n_parts=("l_partkey", "size"))
        return pa.table(
            {
                "l_suppkey": pa.array(c["l_suppkey"], type=pa.int64()),
                "n_parts": pa.array(c["n_parts"], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(dedup, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(count_parts, batch_format="pandas")
    )


def q_orders_above_customer_avg(sf_dir: str):
    """Correlated subquery against a LARGE dimension (orders above
    their own customer's average order value): unlike
    q_parts_above_brand_avg (25 brands → broadcast), the per-customer
    average table is customer-cardinality, so it flows back through a
    bucketed hash join on the customer key — the self-join-aggregation
    shape at scale.  Averages are one double division of exact integer
    sums, bit-equal to the SQL twin."""
    from crawler_ray.stages.joins import bucketed_hash_join

    path = f"{sf_dir}/orders.parquet"

    def project(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(df["o_orderkey"], type=pa.int64()),
                "o_custkey": pa.array(df["o_custkey"], type=pa.int64()),
                "totalprice_cents": pa.array(cents, type=pa.int64()),
            }
        )

    orders = (
        _read(path, columns=["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(project, batch_format="pyarrow")
        .materialize()  # read twice (avgs branch + join left side) — Ray
        # Data has no CSE, so an unmaterialized shared subtree would scan
        # the fact table twice
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("o_custkey", as_index=False).agg(
            cents=("totalprice_cents", "sum"), n=("totalprice_cents", "size")
        )
        return table_from_pandas(g)

    def to_avg(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"].cast(pa.int64()),
                "avg_cents": pc.divide(
                    batch["cents"].cast(pa.float64()), batch["n"].cast(pa.float64())
                ),
            }
        )

    avgs = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("cents", alias_name="cents"), Sum("n", alias_name="n"))
        .map_batches(to_avg, batch_format="pyarrow")
    )

    i64, f64 = pa.int64(), pa.float64()
    joined = bucketed_hash_join(
        orders,
        avgs,
        key="o_custkey",
        left_schema=pa.schema(
            [("o_orderkey", i64), ("o_custkey", i64), ("totalprice_cents", i64)]
        ),
        right_schema=pa.schema([("o_custkey", i64), ("avg_cents", f64)]),
    )

    def above(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        keep = df["totalprice_cents"].to_numpy() > df["avg_cents"].to_numpy()
        out = df.loc[keep, ["o_orderkey", "o_custkey", "totalprice_cents"]]
        return pa.table(
            {
                "o_orderkey": pa.array(out["o_orderkey"], type=pa.int64()),
                "o_custkey": pa.array(out["o_custkey"], type=pa.int64()),
                "totalprice_cents": pa.array(out["totalprice_cents"], type=pa.int64()),
            }
        )

    return joined.map_batches(above, batch_format="pyarrow")


def q_parts_in_all_regions(sf_dir: str):
    """Relational division (parts ordered by customers of EVERY
    region): two bucketed large-large joins carry (order → region)
    then (part → region); map-side pair dedup shrinks the shuffle to
    distinct (part, region); the division itself is `count(distinct
    region) == |regions|` on the tiny per-part table.  The tiny
    nation→region map applies as a vectorized broadcast lookup at the
    customer read — never a shuffle."""
    import pyarrow.parquet as _pq

    from crawler_ray.stages.joins import bucketed_hash_join

    nat = _pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()  # ≤ 25 rows
    n_regions = int(
        _pq.read_table(f"{sf_dir}/region.parquet").num_rows
    )  # ≤ 5 by schema
    n2r = {int(k): int(r) for k, r in zip(nat["n_nationkey"], nat["n_regionkey"])}
    n2r_ref = ray.put(n2r)

    def cust_region(batch: pa.Table) -> pa.Table:
        m = ray.get(n2r_ref)
        df = batch.to_pandas()
        return pa.table(
            {
                "o_custkey": pa.array(df["c_custkey"], type=pa.int64()),
                "region": pa.array(
                    df["c_nationkey"].map(m).astype(np.int64), type=pa.int64()
                ),
            }
        )

    cust = _read(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(cust_region, batch_format="pyarrow")
    orders = _read(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])

    i64 = pa.int64()
    order_region = bucketed_hash_join(
        orders,
        cust,
        key="o_custkey",
        left_schema=pa.schema([("o_orderkey", i64), ("o_custkey", i64)]),
        right_schema=pa.schema([("o_custkey", i64), ("region", i64)]),
    ).map_batches(
        lambda t: t.select(["o_orderkey", "region"]).rename_columns(
            ["l_orderkey", "region"]
        ),
        batch_format="pyarrow",
    )

    li = _read(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    part_region = bucketed_hash_join(
        li,
        order_region,
        key="l_orderkey",
        left_schema=pa.schema([("l_orderkey", i64), ("l_partkey", i64)]),
        right_schema=pa.schema([("l_orderkey", i64), ("region", i64)]),
    )

    def dedup(batch: pa.Table) -> pa.Table:
        # map-side dedup + part-hash co-location: a part lives in one
        # partition, so the division check is one vectorized pass there
        # (no multi-key Ray aggregate — per-group Python accumulator)
        df = batch.to_pandas()[["l_partkey", "region"]].drop_duplicates()
        df["pkey"] = hash_pkey(df["l_partkey"].to_numpy(), 256)
        return table_from_pandas(df)

    def divide(g: pd.DataFrame) -> pa.Table:
        d = g.drop_duplicates(["l_partkey", "region"])
        c = d.groupby("l_partkey", as_index=False).agg(n_regions=("region", "size"))
        keep = c.loc[c["n_regions"] == n_regions, "l_partkey"]
        return pa.table({"p_partkey": pa.array(keep, type=pa.int64())})

    return (
        part_region.map_batches(dedup, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(divide, batch_format="pandas")
    )


def q_user_longest_streak(sf_dir: str):
    """Gaps-and-islands (longest run of CONSECUTIVE active days per
    user) — the classic windowed sequence shape (`day − ROW_NUMBER()`
    island key in SQL).  Distinct (user, day) pairs co-locate by user
    hash; within a partition one sort + two vectorized diffs find every
    island, so no per-user Python loop and no user ever spans
    partitions.  Day arithmetic is integer epoch-days throughout."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        day = (
            df["ts"].dt.floor("D").astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        g = pd.DataFrame({"user_id": df["user_id"], "day": day}).drop_duplicates()
        g["pkey"] = hash_pkey(g["user_id"].to_numpy(), WINDOW_HASH_PARTITIONS)
        return table_from_pandas(g)

    def streaks(g: pd.DataFrame) -> pa.Table:
        df = g.drop_duplicates(["user_id", "day"]).sort_values(["user_id", "day"])
        u = df["user_id"].to_numpy()
        d = df["day"].to_numpy()
        # island id: cumulative count of breaks (new user OR day gap > 1)
        brk = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            brk[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] != 1)
        island = np.cumsum(brk)
        runs = pd.DataFrame({"user_id": u, "island": island})
        lengths = runs.groupby(["user_id", "island"], as_index=False).size()
        best = lengths.groupby("user_id", as_index=False)["size"].max()
        return pa.table(
            {
                "user_id": pa.array(best["user_id"], type=pa.int64()),
                "longest_streak": pa.array(best["size"], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(streaks, batch_format="pandas")
    )


def q_monthly_revenue_growth(sf_dir: str):
    """Month-over-month revenue growth (tumbling month window + LAG on
    the aggregate): the corpus-scale work is one map-side partial sum
    per (month) → tiny grouped sum; the LAG/pct-change runs on the
    ≤ |months| driver-side table (bounded by calendar length, never
    rows).  Growth is a single double division of exact integer cents;
    the first month reports -1 sentinel (COALESCE twin)."""
    ds = _read(f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        month_us = (
            df["o_orderdate"]
            .dt.to_period("M")
            .dt.to_timestamp()
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        cents = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = pd.DataFrame({"month_us": month_us, "revenue_cents": cents})
        p = g.groupby("month_us", as_index=False).agg(
            revenue_cents=("revenue_cents", "sum")
        )
        return table_from_pandas(p)

    months = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("month_us")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .to_pandas()  # ≤ |months| rows — bounded by calendar length
        .sort_values("month_us")
        .reset_index(drop=True)
    )
    prev = months["revenue_cents"].shift(1)
    growth = (months["revenue_cents"] - prev) / prev
    months["growth"] = growth.fillna(-1.0)
    months["month"] = months["month_us"].astype("datetime64[us]")
    return months[["month", "revenue_cents", "growth"]]


def q_events_heatmap(sf_dir: str):
    """Day-of-week × hour-of-day activity heatmap (the ops-dashboard
    shape): pure map-side bucketing into ≤ 7×24 cells, then one tiny
    grouped sum — no key ever exceeds 168 groups regardless of corpus
    size.  DOW is ISO (Monday=1) to match DuckDB's isodow."""
    ds = _read(f"{sf_dir}/events.parquet", columns=["ts"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        dow = (df["ts"].dt.dayofweek + 1).astype(np.int64)  # ISO Monday=1
        hour = df["ts"].dt.hour.astype(np.int64)
        g = pd.DataFrame({"dow": dow, "hour": hour})
        p = g.groupby(["dow", "hour"], as_index=False).size()
        p = p.rename(columns={"size": "n"})
        return table_from_pandas(p)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["dow", "hour"])
        .aggregate(Sum("n", alias_name="n"))
    )


def q_props_value_stats(sf_dir: str):
    """Semi-structured (JSON) column extraction: per event_type stats
    of the ``$.k`` field inside the ``props`` JSON string.  The hot
    path is one VECTORIZED regex extract per batch (`"k": <int>` —
    the overwhelmingly common shape); rows the regex can't handle
    (reordered keys, nesting, whitespace variants) fall back to real
    ``json.loads`` row-wise — exactness first, vectorization for the
    common case.  Missing/null k is excluded from sum/count-k but not
    from n (SQL COUNT/SUM null semantics)."""
    import json as _json

    ds = _read(f"{sf_dir}/events.parquet", columns=["event_type", "props"])
    pat = re.compile(r'^\{"k":\s*(-?\d+)\}$')

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        s = df["props"].astype("string")
        # numeric from the start: assigning fallback ints into the
        # string-dtype extract result would raise "Must provide strings"
        kv = pd.to_numeric(s.str.extract(pat, expand=False), errors="coerce")
        miss = kv.isna() & s.notna()
        if miss.any():
            def slow(v):
                try:
                    x = _json.loads(v).get("k")
                    return float(x) if isinstance(x, int) else np.nan
                except (ValueError, TypeError, AttributeError):
                    return np.nan

            kv = kv.astype(np.float64)
            kv.loc[miss] = s[miss].map(slow).astype(np.float64)
        g = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "k": kv,
                "has_k": kv.notna().astype(np.int64),
            }
        )
        p = g.groupby("event_type", as_index=False).agg(
            n=("k", "size"),
            n_k=("has_k", "sum"),
            sum_k=("k", lambda c: np.int64(c.fillna(0).sum())),
        )
        p["sum_k"] = p["sum_k"].astype(np.int64)
        return table_from_pandas(p)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_k", alias_name="n_k"),
            Sum("sum_k", alias_name="sum_k"),
        )
    )


# Paragraph-occurrence fan-out shared by the Dolma family
# (q_dup_paragraph_ratio, q_paragraph_dedup): a paragraph's EVERY
# occurrence lands in one hash partition.  The split ('\n'), the trim
# set (' \t\r') and THIS partition count are semantics the SQL twins
# of BOTH queries encode — change them here and in both oracles only.
PARA_HASH_PARTITIONS = 256


def _explode_paragraphs(batch: pa.Table, with_idx: bool) -> pa.Table:
    """(doc_id, [idx,] para, pkey) occurrence rows for one batch.

    Position ``idx`` counts BLANK paragraphs too (the SQL twins zip
    ``range(len(split))`` before filtering), and blank = empty after
    the exact SQL trim set."""
    ids, idxs, paras = [], [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        for i, p in enumerate((t or "").split("\n")):
            if p.strip(" \t\r"):  # exact twin of the SQL trim set
                ids.append(d)
                idxs.append(i)
                paras.append(p)
    if not paras:
        cols = {"doc_id": pa.array([], type=pa.int64())}
        if with_idx:
            cols["idx"] = pa.array([], type=pa.int64())
        cols["para"] = pa.array([], type=pa.string())
        cols["pkey"] = pa.array([], type=pa.int64())
        return pa.table(cols)
    out = pd.DataFrame({"doc_id": ids, "para": paras})
    if with_idx:
        out.insert(1, "idx", idxs)
    out["pkey"] = hash_pkey(
        out["para"].to_numpy(dtype=object), PARA_HASH_PARTITIONS
    )
    return table_from_pandas(out)


def _dup_unit_ratio(exploded, unit_col: str, n_col: str):
    """Shared per-doc duplicated-unit pipeline (used by the paragraph
    and CDC-chunk dedup signals): ``exploded`` holds (doc_id,
    ``unit_col``, pkey) occurrence rows co-located by unit-hash
    partition — a unit's every occurrence lands in one partition, so
    'appears in ≥ 2 distinct docs' is decided there with one
    vectorized nunique; per-doc (``n_col``, n_dup) partials flow to a
    tiny grouped sum and the ratio is one double division of exact
    counts."""

    def mark(g: pd.DataFrame) -> pa.Table:
        ndocs = g.groupby(unit_col)["doc_id"].nunique()
        dup = g[unit_col].map(ndocs).to_numpy() > 1
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                n_col: np.int64(1),
                "n_dup": dup.astype(np.int64),
            }
        )
        p = out.groupby("doc_id", as_index=False).agg(
            **{n_col: (n_col, "sum"), "n_dup": ("n_dup", "sum")}
        )
        return table_from_pandas(p)

    agg = (
        exploded.groupby("pkey")
        .map_groups(mark, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(Sum(n_col, alias_name=n_col), Sum("n_dup", alias_name="n_dup"))
    )

    def ratio(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                n_col: batch[n_col].cast(pa.int64()),
                "n_dup": batch["n_dup"].cast(pa.int64()),
                "dup_ratio": pc.divide(
                    batch["n_dup"].cast(pa.float64()),
                    batch[n_col].cast(pa.float64()),
                ),
            }
        )

    return agg.map_batches(ratio, batch_format="pyarrow")


def q_dup_paragraph_ratio(sf_dir: str):
    """Per-document duplicated-paragraph ratio (the Dolma/Gopher
    paragraph-dedup signal: what fraction of a doc's paragraphs also
    appear in OTHER documents).  One shuffle total — the shared
    :func:`_dup_unit_ratio` pipeline over the paragraph exploder.
    Blank/whitespace paragraphs are excluded on both sides."""
    ds = _doc(sf_dir, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        return _explode_paragraphs(batch, with_idx=False)

    return _dup_unit_ratio(
        ds.map_batches(explode, batch_format="pyarrow"), "para", "n_para"
    )


# reassembly-side partition fan-out for q_paragraph_dedup: survivors
# co-locate by hash(doc) % THIS, bounded like WINDOW_HASH_PARTITIONS
PARA_DOC_PARTITIONS = 64


def q_paragraph_dedup(sf_dir: str):
    """Corpus-wide paragraph-dedup TRANSFORM (Dolma's paragraph-level
    exact dedup, the rewrite that q_dup_paragraph_ratio only signals):
    every duplicated paragraph keeps only its FIRST occurrence in
    (doc_id, position) order; each doc is reassembled from its
    surviving paragraphs in original order, with blank/whitespace
    paragraphs excluded on both sides (the ratio query's trim set).
    Docs that lose every paragraph drop out — the SQL GROUP BY
    semantics, mirrored exactly.

    Two shuffles, the inherent minimum for this op: (1) occurrences
    co-locate by paragraph-hash partition — a paragraph's every
    occurrence lands in one partition, so first-seen is decided there
    with one vectorized sort + drop_duplicates; (2) survivors
    co-locate by doc-hash partition for the ordered reassembly.  Both
    keys are BOUNDED hash partitions (PARA_HASH_PARTITIONS /
    PARA_DOC_PARTITIONS), never raw paragraph/doc cardinality."""
    ds = _doc(sf_dir, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        return _explode_paragraphs(batch, with_idx=True)

    def first_seen(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["para", "doc_id", "idx"]).drop_duplicates(
            "para", keep="first"
        )
        g = g[["doc_id", "idx", "para"]].copy()
        g["dkey"] = hash_pkey(g["doc_id"].to_numpy(), PARA_DOC_PARTITIONS)
        return table_from_pandas(g)

    def reassemble(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["doc_id", "idx"])
        out = (
            g.groupby("doc_id", as_index=False, sort=False).agg(
                text_dedup=("para", "\n".join), n_kept=("para", "size")
            )
        )
        out["n_kept"] = out["n_kept"].astype(np.int64)
        return table_from_pandas(out)

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(first_seen, batch_format="pandas")
        .groupby("dkey")
        .map_groups(reassemble, batch_format="pandas")
    )


CM_QUERY_DOCS = 5  # query tokens drawn from the first docs (deterministic)


def q_cm_token_freqs(sf_dir: str):
    """Count-Min point-frequency estimates for a deterministic token
    set (the distinct tokens of the first CM_QUERY_DOCS documents)
    over the whole corpus — the sketch member that answers POINT
    queries (Misra–Gries only tracks the heaviest k).  One
    width×depth sketch per block, merged on the driver: the collect
    is O(width·depth·blocks) bytes regardless of corpus or vocabulary.
    Rows-only: ground truth (est ≥ true, est ≤ true + (e/width)·N,
    merge ≡ single-pass) lives in tests/test_sketches.py."""
    from crawler_ray.functions.sketches import cm_frequencies

    head = _read(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=(pc.field("doc_id") < CM_QUERY_DOCS),
    ).to_pandas()  # ≤ CM_QUERY_DOCS rows by the read filter
    items = sorted(
        {t for txt in head["text"] for t in _VOCAB_TOKEN.findall((txt or "").lower())}
    )
    ds = _doc(sf_dir, ["text"])
    return cm_frequencies(
        ds,
        "text",
        items,
        tokenize=lambda t: _VOCAB_TOKEN.findall((t or "").lower()),
    )


def q_link_components(sf_dir: str):
    """Weakly-connected components of the link graph — reuses the
    distributed min-label propagation built for near-dup clustering
    (stages/dedup.connected_components: pointer-doubling bucketed
    joins, no driver label map, strict non-convergence raise).
    Rows-only (iterative); ground truth vs single-process union-find
    in tests/test_ground_truth.py.  Returns per-component sizes
    (component = min node id)."""
    import ray.data as _rd

    from crawler_ray.sources.synth import demo_web, link_edges
    from crawler_ray.stages.dedup import connected_components

    web = demo_web(n_sites=4, n_pages=200, seed=42)
    edges = link_edges(web)

    def canon(batch: pa.Table) -> pa.Table:
        from crawler_ray.functions.arrow_utils import canonical_undirected_edges

        return table_from_pandas(
            canonical_undirected_edges(batch, "src", "dst", "id_a", "id_b")
        )

    labels = connected_components(
        _rd.from_arrow(edges).map_batches(canon, batch_format="pyarrow")
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("label", as_index=False).size()
        g = g.rename(columns={"label": "component", "size": "n_nodes"})
        return table_from_pandas(g)

    return (
        labels.map_batches(partial, batch_format="pyarrow")
        .groupby("component")
        .aggregate(Sum("n_nodes", alias_name="n_nodes"))
    )


def q_link_distances(sf_dir: str):
    """Multi-source BFS hop distance from the seed pages (page 0 of
    every site — the crawl-depth analytic: how deep each page sits
    behind the seed list).  stages/graph.bfs_distances: broadcast
    distance vector under the byte budget, edge table map_batches-only,
    one grouped-Min shuffle per sweep, early stop at convergence.
    Rows-only; ground truth vs single-process BFS in
    tests/test_ground_truth.py.  Returns the distance histogram."""
    import ray.data as _rd

    from crawler_ray.sources.synth import demo_web, link_edges
    from crawler_ray.stages.graph import bfs_distances

    web = demo_web(n_sites=4, n_pages=200, seed=42)
    edges = link_edges(web)
    hosts = sorted(web.sites)
    seeds, off = [], 0
    for h in hosts:
        seeds.append(off)  # page 0 of each site is its seed
        off += web.sites[h].n_pages
    dist = bfs_distances(_rd.from_arrow(edges), off, seeds)
    hist = dist.groupby("dist", as_index=False).size()
    hist = hist.rename(columns={"size": "n_nodes"}).sort_values("dist")
    return hist.reset_index(drop=True)


def q_link_triangles(sf_dir: str):
    """Exact triangle count over the synthetic web's link graph
    (stages/graph.triangle_count — degree-ordered wedge join: orient
    low→high degree, generate wedges at the low-degree apex, close
    them against the pair-hash-co-located edge set; hub-proof
    O(m^1.5) wedge volume).  Rows-only: iterative/graph category;
    ground truth vs a single-process adjacency-set count in
    tests/test_ground_truth.py."""
    import ray.data as _rd

    from crawler_ray.sources.synth import demo_web, link_edges
    from crawler_ray.stages.graph import triangle_count

    web = demo_web(n_sites=4, n_pages=200, seed=42)
    edges = link_edges(web)
    n_nodes = sum(s.n_pages for s in web.sites.values())
    n = triangle_count(_rd.from_arrow(edges), n_nodes)
    return pd.DataFrame({"n_triangles": [n]})


# ----------------------------------------------------------------- 96
RET_DATE_LO = "1996-01-01"
RET_DATE_HI = "1996-04-01"
RET_TOPK = 20


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape: the RET_TOPK customers who generated the most
    revenue from RETURNED items in one quarter.  lineitem (returnflag
    pushed into the scan) ⋈ orders (date range pushed) on orderkey via
    the sort-shuffle bucketed join; revenue is pre-projected to exact
    integer milli-cents MAP-SIDE so the join ships two ints per row.

    Top-k is the per-block-partial shape: after the distributed
    per-customer sum, each block emits at most RET_TOPK rows, so the
    driver merge holds ≤ k × blocks rows — never |customers| (which is
    corpus-scale at 100 TB).  The k winners' names/balances/nations
    are then fetched with a key-IN parquet read (k rows), not a join.
    Ordering is deterministic under ties: (revenue desc, custkey asc),
    mirrored in the SQL twin's ORDER BY."""
    import pyarrow.parquet as _pq

    from crawler_ray.stages.joins import bucketed_hash_join

    lo = np.datetime64(RET_DATE_LO, "us")
    hi = np.datetime64(RET_DATE_HI, "us")

    def li_project(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(df["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": pa.array(df["l_orderkey"], type=pa.int64()),
                "revenue_milli": pa.array(cents * (100 - disc), type=pa.int64()),
            }
        )

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
        filter=pc.field("l_returnflag") == "R",
    ).map_batches(li_project, batch_format="pyarrow")
    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    ).map_batches(
        lambda t: t.select(["o_orderkey", "o_custkey"]).rename_columns(
            ["l_orderkey", "custkey"]
        ),
        batch_format="pyarrow",
    )

    i64 = pa.int64()
    joined = bucketed_hash_join(
        li,
        orders,
        key="l_orderkey",
        left_schema=pa.schema([("l_orderkey", i64), ("revenue_milli", i64)]),
        right_schema=pa.schema([("l_orderkey", i64), ("custkey", i64)]),
    )

    def partial_sum(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("custkey", as_index=False).agg(
            revenue_milli=("revenue_milli", "sum")
        )
        return pa.table(
            {
                "custkey": pa.array(g["custkey"], type=pa.int64()),
                "revenue_milli": pa.array(g["revenue_milli"], type=pa.int64()),
            }
        )

    def partial_head(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["revenue_milli", "custkey"], ascending=[False, True]
        ).head(RET_TOPK)
        return table_from_pandas(df)

    per_cust = (
        joined.map_batches(partial_sum, batch_format="pyarrow")
        .groupby("custkey")
        .aggregate(Sum("revenue_milli", alias_name="revenue_milli"))
        .map_batches(partial_head, batch_format="pyarrow")
    )
    # ≤ RET_TOPK × blocks rows by the partial-head invariant above
    top = (
        per_cust.to_pandas()
        .sort_values(["revenue_milli", "custkey"], ascending=[False, True])
        .head(RET_TOPK)
        .reset_index(drop=True)
    )

    keys = [int(k) for k in top["custkey"]]
    cust = _pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
        filters=[("c_custkey", "in", keys)],
    ).to_pandas()  # == RET_TOPK rows by construction
    nat = _pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()  # ≤ 25 rows by schema
    cust = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    cust["acctbal_cents"] = np.round(cust["c_acctbal"].to_numpy() * 100).astype(
        np.int64
    )
    out = top.merge(
        cust[["c_custkey", "c_name", "acctbal_cents", "n_name"]],
        left_on="custkey",
        right_on="c_custkey",
    )
    return out[["custkey", "c_name", "revenue_milli", "acctbal_cents", "n_name"]]


# ----------------------------------------------------------------- 97
PROMO_YEAR = 1997


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape, widened to a per-month series: the share of
    revenue from PROMO-type parts for each ship-month of PROMO_YEAR.
    lineitem ⋈ part on partkey — part is projected MAP-SIDE down to
    (partkey, is_promo:int64) so the join ships a boolean-as-int, and
    the join is the sort-shuffle bucketed hash join (both sides large
    at 100 TB; no broadcast).  Revenue stays exact-integer milli-cents
    end to end; the one double appears in the final share division on
    the ≤ 12-row month table, bit-equal to the SQL twin's
    CAST(...)/CAST(...)."""
    from crawler_ray.stages.joins import bucketed_hash_join

    lo = np.datetime64(f"{PROMO_YEAR}-01-01", "us")
    hi = np.datetime64(f"{PROMO_YEAR + 1}-01-01", "us")

    def li_project(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(df["l_discount"].to_numpy() * 100).astype(np.int64)
        ship = df["l_shipdate"].astype("datetime64[us]")
        month = (ship.dt.year * 100 + ship.dt.month).astype(np.int64)
        return pa.table(
            {
                "p_partkey": pa.array(df["l_partkey"], type=pa.int64()),
                "ship_month": pa.array(month, type=pa.int64()),
                "revenue_milli": pa.array(cents * (100 - disc), type=pa.int64()),
            }
        )

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    ).map_batches(li_project, batch_format="pyarrow")

    def part_project(batch: pa.Table) -> pa.Table:
        is_promo = pc.cast(
            pc.equal(batch["p_type"], pa.scalar("PROMO")), pa.int64()
        )
        return pa.table(
            {
                "p_partkey": pc.cast(batch["p_partkey"], pa.int64()),
                "is_promo": is_promo,
            }
        )

    part = _read(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(part_project, batch_format="pyarrow")

    i64 = pa.int64()
    joined = bucketed_hash_join(
        li,
        part,
        key="p_partkey",
        left_schema=pa.schema(
            [("p_partkey", i64), ("ship_month", i64), ("revenue_milli", i64)]
        ),
        right_schema=pa.schema([("p_partkey", i64), ("is_promo", i64)]),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rev = df["revenue_milli"].to_numpy()
        df["promo_milli"] = np.where(df["is_promo"].to_numpy() == 1, rev, 0)
        g = df.groupby("ship_month", as_index=False).agg(
            promo_milli=("promo_milli", "sum"), total_milli=("revenue_milli", "sum")
        )
        return pa.table(
            {
                "ship_month": pa.array(g["ship_month"], type=pa.int64()),
                "promo_milli": pa.array(g["promo_milli"], type=pa.int64()),
                "total_milli": pa.array(g["total_milli"], type=pa.int64()),
            }
        )

    months = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("ship_month")
        .aggregate(
            Sum("promo_milli", alias_name="promo_milli"),
            Sum("total_milli", alias_name="total_milli"),
        )
        .to_pandas()  # ≤ 12 rows by the year filter
    )
    months["promo_share"] = months["promo_milli"].astype(np.float64) / months[
        "total_milli"
    ].astype(np.float64)
    return months[["ship_month", "promo_milli", "total_milli", "promo_share"]]


# ----------------------------------------------------------------- 98
Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_7"
Q7_SHIP_LO = "1996-01-01"
Q7_SHIP_HI = "1998-01-01"


def q_shipping_volume(sf_dir: str):
    """TPC-H Q7 shape: yearly revenue shipped between two nations in
    either direction (supplier in one, customer in the other).  The
    nation dimension (≤ 25 rows by schema) resolves names driver-side;
    supplier and customer scans are pruned to the two nations at the
    parquet layer, so the join sides carry only the relevant fraction.
    Chain: (orders ⋈ customer) on custkey, then lineitem ⋈ supplier on
    suppkey, then the two on orderkey — all sort-shuffle bucketed
    joins, revenue pre-projected to exact integer milli-cents and the
    ship-year extracted MAP-SIDE so the widest join ships four ints."""
    import pyarrow.parquet as _pq

    from crawler_ray.stages.joins import bucketed_hash_join

    nat = _pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()  # ≤ 25 rows
    nmap = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"].astype(str)))
    key_a = int(nat.loc[nat["n_name"] == Q7_NATION_A, "n_nationkey"].iloc[0])
    key_b = int(nat.loc[nat["n_name"] == Q7_NATION_B, "n_nationkey"].iloc[0])
    pair = [key_a, key_b]

    lo = np.datetime64(Q7_SHIP_LO, "us")
    hi = np.datetime64(Q7_SHIP_HI, "us")

    def li_project(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(df["l_discount"].to_numpy() * 100).astype(np.int64)
        year = df["l_shipdate"].astype("datetime64[us]").dt.year.astype(np.int64)
        return pa.table(
            {
                "l_orderkey": pa.array(df["l_orderkey"], type=pa.int64()),
                "l_suppkey": pa.array(df["l_suppkey"], type=pa.int64()),
                "l_year": pa.array(year, type=pa.int64()),
                "revenue_milli": pa.array(cents * (100 - disc), type=pa.int64()),
            }
        )

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    ).map_batches(li_project, batch_format="pyarrow")
    sup = _read(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"],
        filter=pc.field("s_nationkey").isin(pair),
    ).map_batches(
        lambda t: t.rename_columns(["l_suppkey", "supp_nation_key"]),
        batch_format="pyarrow",
    )
    orders = _read(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = _read(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
        filter=pc.field("c_nationkey").isin(pair),
    ).map_batches(
        lambda t: t.rename_columns(["o_custkey", "cust_nation_key"]),
        batch_format="pyarrow",
    )

    i64 = pa.int64()
    lis = bucketed_hash_join(
        li,
        sup,
        key="l_suppkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", i64),
                ("l_suppkey", i64),
                ("l_year", i64),
                ("revenue_milli", i64),
            ]
        ),
        right_schema=pa.schema([("l_suppkey", i64), ("supp_nation_key", i64)]),
    ).map_batches(
        lambda t: t.select(
            ["l_orderkey", "l_year", "revenue_milli", "supp_nation_key"]
        ),
        batch_format="pyarrow",
    )
    oc = bucketed_hash_join(
        orders,
        cust,
        key="o_custkey",
        left_schema=pa.schema([("o_orderkey", i64), ("o_custkey", i64)]),
        right_schema=pa.schema([("o_custkey", i64), ("cust_nation_key", i64)]),
    ).map_batches(
        lambda t: t.select(["o_orderkey", "cust_nation_key"]).rename_columns(
            ["l_orderkey", "cust_nation_key"]
        ),
        batch_format="pyarrow",
    )
    full = bucketed_hash_join(
        lis,
        oc,
        key="l_orderkey",
        left_schema=pa.schema(
            [
                ("l_orderkey", i64),
                ("l_year", i64),
                ("revenue_milli", i64),
                ("supp_nation_key", i64),
            ]
        ),
        right_schema=pa.schema([("l_orderkey", i64), ("cust_nation_key", i64)]),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["supp_nation_key"] != df["cust_nation_key"]]
        g = df.groupby(
            ["supp_nation_key", "cust_nation_key", "l_year"], as_index=False
        ).agg(revenue_milli=("revenue_milli", "sum"))
        return pa.table(
            {
                "supp_nation_key": pa.array(g["supp_nation_key"], type=pa.int64()),
                "cust_nation_key": pa.array(g["cust_nation_key"], type=pa.int64()),
                "l_year": pa.array(g["l_year"], type=pa.int64()),
                "revenue_milli": pa.array(g["revenue_milli"], type=pa.int64()),
            }
        )

    agg = (
        full.map_batches(partial, batch_format="pyarrow")
        .groupby(["supp_nation_key", "cust_nation_key", "l_year"])
        .aggregate(Sum("revenue_milli", alias_name="revenue_milli"))
        .to_pandas()  # ≤ 2 directions × years — bounded by construction
    )
    agg["supp_nation"] = agg["supp_nation_key"].map(nmap)
    agg["cust_nation"] = agg["cust_nation_key"].map(nmap)
    return agg[["supp_nation", "cust_nation", "l_year", "revenue_milli"]]


# ----------------------------------------------------------------- 99
def q_customer_order_counts(sf_dir: str):
    """TPC-H Q13 shape (count-of-counts): how many customers placed
    exactly N orders, INCLUDING the zero-order bucket.  The classic
    formulation is a customer LEFT JOIN orders; here the join is
    eliminated entirely: per-custkey counts come from one map-side
    partial combine + groupby over orders (each batch ships its
    distinct custkeys, not its rows), the N-distribution is a second
    tiny groupby (≤ max-orders-per-customer rows), and the zero bucket
    is |customer| − Σ custdist — one count aggregate over the customer
    scan, no shuffle of the customer table at all.  Valid because
    o_custkey ⊆ c_custkey (FK), which the SQL twin's LEFT JOIN also
    assumes."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("o_custkey", as_index=False).agg(n=("o_custkey", "size"))
        return pa.table(
            {
                "o_custkey": pa.array(g["o_custkey"], type=pa.int64()),
                "n": pa.array(g["n"], type=pa.int64()),
            }
        )

    per_cust = (
        _read(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="c_count"))
    )
    dist = (
        per_cust.groupby("c_count")
        .aggregate(Count(alias_name="custdist"))
        .to_pandas()  # ≤ max orders per customer rows — bounded
    )
    n_cust = _read(f"{sf_dir}/customer.parquet", columns=["c_custkey"]).count()
    zero = int(n_cust) - int(dist["custdist"].sum())
    if zero > 0:
        dist = pd.concat(
            [dist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    dist["c_count"] = dist["c_count"].astype(np.int64)
    dist["custdist"] = dist["custdist"].astype(np.int64)
    return dist.sort_values("c_count").reset_index(drop=True)


# ---------------------------------------------------------------- 100
Q22_NATIONS = (1, 3, 5, 7, 9)
# "lapsed" cutoff: the classic Q22 NOT EXISTS(orders) is degenerate on
# the synthetic tables (every customer has orders), so the anti-join
# side is orders SINCE this date — same join shape, non-empty answer
Q22_SINCE = "2001-01-01"


def q_idle_rich_customers(sf_dir: str):
    """TPC-H Q22 shape: customers in a nation subset with
    above-average positive balances who placed no order since
    ``Q22_SINCE``, counted per nation.  The global average is a
    two-int scalar (Sum+Count aggregate over the pruned customer scan
    — exact integer cents, one double division driver-side); the
    "no recent order" side is the bucketed ANTI-join where the orders
    side is date-pruned at the parquet layer and ships only its key
    column through the shuffle.  Final per-nation rollup is a map-side
    partial combine + groupby (≤ |Q22_NATIONS| rows out)."""
    from crawler_ray.stages.joins import bucketed_filter_join

    nations = list(Q22_NATIONS)

    def project(batch: pa.Table) -> pa.Table:
        bal = pc.cast(pc.round(pc.multiply(batch["c_acctbal"], 100.0)), pa.int64())
        return pa.table(
            {
                "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
                "cntrycode": pc.cast(batch["c_nationkey"], pa.int64()),
                "bal_cents": bal,
            }
        )

    sel = (
        _read(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
            filter=pc.field("c_nationkey").isin(nations),
        )
        .map_batches(project, batch_format="pyarrow")
        .materialize()  # read twice below (stats + rich); Ray Data has
        # no CSE, an unmaterialized shared subtree would scan the
        # customer parquet twice
    )

    pos = sel.filter(expr="bal_cents > 0")
    stats = pos.aggregate(
        Sum("bal_cents", alias_name="s"), Count(alias_name="n")
    )  # two-int global scalar
    if not stats["n"]:  # no positive balance in the subset: the SQL
        # twin returns 0 rows; mirror it instead of float(None)
        return pd.DataFrame(
            {
                "cntrycode": pd.Series(dtype=np.int64),
                "numcust": pd.Series(dtype=np.int64),
                "totacctbal_cents": pd.Series(dtype=np.int64),
            }
        )
    avg_cents = float(stats["s"]) / float(stats["n"])

    rich = sel.map_batches(
        lambda t: t.filter(pc.greater(t["bal_cents"], pa.scalar(avg_cents))),
        batch_format="pyarrow",
    )
    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") >= np.datetime64(Q22_SINCE, "us"),
    ).map_batches(
        lambda t: t.select(["o_custkey"]).rename_columns(["c_custkey"]),
        batch_format="pyarrow",
    )
    i64 = pa.int64()
    idle = bucketed_filter_join(
        rich,
        orders,
        key="c_custkey",
        mode="anti",
        left_schema=pa.schema(
            [("c_custkey", i64), ("cntrycode", i64), ("bal_cents", i64)]
        ),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("cntrycode", as_index=False).agg(
            numcust=("c_custkey", "size"), totacctbal_cents=("bal_cents", "sum")
        )
        return pa.table(
            {
                "cntrycode": pa.array(g["cntrycode"], type=pa.int64()),
                "numcust": pa.array(g["numcust"], type=pa.int64()),
                "totacctbal_cents": pa.array(
                    g["totacctbal_cents"], type=pa.int64()
                ),
            }
        )

    return (
        idle.map_batches(partial, batch_format="pyarrow")
        .groupby("cntrycode")
        .aggregate(
            Sum("numcust", alias_name="numcust"),
            Sum("totacctbal_cents", alias_name="totacctbal_cents"),
        )
    )


# ---------------------------------------------------------------- 101
Q15_DATE_LO = "1996-01-01"
Q15_DATE_HI = "1996-04-01"


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the GLOBAL maximum.  Pass 1 reduces lineitem to per-supplier exact
    integer revenue (map-side partial combine → groupby Sum),
    materialized ONCE — its size is |distinct suppliers in the
    quarter|, already reduced corpus-free; pass 2 is a Max aggregate
    over that small table (a scalar) and an equality filter.  Winner
    names resolve via a key-IN parquet read (≤ ties rows), never a
    join.  Exact-integer revenue makes the argmax tie-set
    deterministic across engines."""
    import pyarrow.parquet as _pq

    lo = np.datetime64(Q15_DATE_LO, "us")
    hi = np.datetime64(Q15_DATE_HI, "us")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(df["l_discount"].to_numpy() * 100).astype(np.int64)
        df["revenue_milli"] = cents * (100 - disc)
        g = df.groupby("l_suppkey", as_index=False).agg(
            revenue_milli=("revenue_milli", "sum")
        )
        return pa.table(
            {
                "suppkey": pa.array(g["l_suppkey"], type=pa.int64()),
                "revenue_milli": pa.array(g["revenue_milli"], type=pa.int64()),
            }
        )

    per_supp = (
        _read(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
            filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("suppkey")
        .aggregate(Sum("revenue_milli", alias_name="revenue_milli"))
        .materialize()  # |suppliers-in-quarter| rows, read twice below
    )
    best = per_supp.aggregate(Max("revenue_milli", alias_name="m"))["m"]
    if best is None:  # empty quarter: the SQL twin returns 0 rows
        return pd.DataFrame(
            {
                "suppkey": pd.Series(dtype=np.int64),
                "s_name": pd.Series(dtype=object),
                "revenue_milli": pd.Series(dtype=np.int64),
            }
        )
    winners = per_supp.filter(expr=f"revenue_milli == {int(best)}").to_pandas()
    # ≤ tie-set rows by the equality filter
    keys = [int(k) for k in winners["suppkey"]]
    sup = _pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", keys)],
    ).to_pandas()
    out = winners.merge(sup, left_on="suppkey", right_on="s_suppkey")
    return out[["suppkey", "s_name", "revenue_milli"]]


# ---------------------------------------------------------------- 102
Q19_TIERS = (
    ("Brand#1", 1, 15, 1, 11),
    ("Brand#2", 1, 25, 10, 20),
    ("Brand#3", 1, 35, 20, 30),
)


def q_brand_tier_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue from lineitem ⋈ part under a
    DISJUNCTION of (brand, size-range, quantity-range) tiers.  The
    part side is pruned at the parquet layer to the three brands and
    projected map-side to (partkey, brand, size) ints; lineitem is
    pruned to the quantity hull [min_q, max_q] across tiers.  The
    disjunct evaluation happens post-join as one vectorized numpy mask
    (no per-row Python), reduced to a (n_items, revenue_milli) global
    scalar pair — the aggregate ships two ints per block."""
    from crawler_ray.stages.joins import bucketed_hash_join

    brands = sorted({t[0] for t in Q19_TIERS})
    qmin = min(t[3] for t in Q19_TIERS)
    qmax = max(t[4] for t in Q19_TIERS)

    def li_project(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(df["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "p_partkey": pa.array(df["l_partkey"], type=pa.int64()),
                "qty": pa.array(
                    np.round(df["l_quantity"].to_numpy()).astype(np.int64),
                    type=pa.int64(),
                ),
                "revenue_milli": pa.array(cents * (100 - disc), type=pa.int64()),
            }
        )

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_quantity") >= float(qmin))
        & (pc.field("l_quantity") <= float(qmax)),
    ).map_batches(li_project, batch_format="pyarrow")

    bidx = {b: i for i, b in enumerate(brands)}

    def part_project(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.table(
            {
                "p_partkey": pa.array(df["p_partkey"], type=pa.int64()),
                "brand_i": pa.array(
                    df["p_brand"].map(bidx), type=pa.int64()
                ),
                "p_size": pa.array(df["p_size"], type=pa.int64()),
            }
        )

    part = _read(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
        filter=pc.field("p_brand").isin(brands),
    ).map_batches(part_project, batch_format="pyarrow")

    i64 = pa.int64()
    joined = bucketed_hash_join(
        li,
        part,
        key="p_partkey",
        left_schema=pa.schema(
            [("p_partkey", i64), ("qty", i64), ("revenue_milli", i64)]
        ),
        right_schema=pa.schema(
            [("p_partkey", i64), ("brand_i", i64), ("p_size", i64)]
        ),
    )

    tiers = [
        (bidx[b], slo, shi, qlo, qhi) for b, slo, shi, qlo, qhi in Q19_TIERS
    ]

    def score(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        bi = df["brand_i"].to_numpy()
        sz = df["p_size"].to_numpy()
        q = df["qty"].to_numpy()
        mask = np.zeros(len(df), dtype=bool)
        for tb, slo, shi, qlo, qhi in tiers:
            mask |= (bi == tb) & (sz >= slo) & (sz <= shi) & (q >= qlo) & (q <= qhi)
        rev = df["revenue_milli"].to_numpy()[mask]
        return pa.table(
            {
                "n_items": pa.array([int(mask.sum())], type=pa.int64()),
                "revenue_milli": pa.array([int(rev.sum())], type=pa.int64()),
            }
        )

    tot = joined.map_batches(score, batch_format="pyarrow").aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("revenue_milli", alias_name="revenue_milli"),
    )
    return pd.DataFrame(
        {
            "n_items": [np.int64(tot["n_items"] or 0)],
            "revenue_milli": [np.int64(tot["revenue_milli"] or 0)],
        }
    )


# ---------------------------------------------------------------- 103
Q3_SEGMENT = "BUILDING"
Q3_DATE = "1997-03-15"
Q3_TOPK = 10
# o_orderpriority values are a fixed 5-value enum; join legs carry the
# leading digit as an int64 and the string is restored driver-side
_PRIORITY_BY_DIGIT = {
    1: "1-URGENT",
    2: "2-HIGH",
    3: "3-MEDIUM",
    4: "4-NOT SPECIFIED",
    5: "5-LOW",
}


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape (shipping priority): top-k unshipped orders by
    revenue for one market segment.  The customer table never joins:
    it reduces map-side to bare custkeys (segment pushed into the
    scan) and prunes orders via the bucketed SEMI join — the shuffle
    ships one key column for it.  Orders ⋈ lineitem is the bucketed
    hash join on orderkey with every carried column pre-encoded int64
    (orderdate → epoch days, priority → leading digit), revenue is
    exact integer milli-cents, and orderdate/priority ride the
    per-orderkey groupby as Max aggregates (constant per group — the
    FK functional dependency the SQL twin's GROUP BY also leans on).
    Top-k is per-block partial head, so the driver merge holds
    ≤ k × blocks rows, never |orders|."""
    from crawler_ray.stages.joins import bucketed_filter_join, bucketed_hash_join

    cutoff = np.datetime64(Q3_DATE, "us")
    i64 = pa.int64()

    cust_keys = _read(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
        filter=pc.field("c_mktsegment") == Q3_SEGMENT,
    ).map_batches(
        lambda t: t.select(["c_custkey"]).rename_columns(["custkey"]),
        batch_format="pyarrow",
    )

    def orders_project(batch: pa.Table) -> pa.Table:
        days = pc.cast(pc.cast(batch["o_orderdate"], pa.date32()), pa.int32())
        prio = pc.cast(pc.utf8_slice_codeunits(batch["o_orderpriority"], 0, 1), i64)
        return pa.table(
            {
                "custkey": pc.cast(batch["o_custkey"], i64),
                "l_orderkey": pc.cast(batch["o_orderkey"], i64),
                "odate_day": pc.cast(days, i64),
                "prio": prio,
            }
        )

    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
        filter=pc.field("o_orderdate") < cutoff,
    ).map_batches(orders_project, batch_format="pyarrow")
    orders = bucketed_filter_join(
        orders,
        cust_keys,
        key="custkey",
        mode="semi",
        left_schema=pa.schema(
            [("custkey", i64), ("l_orderkey", i64), ("odate_day", i64), ("prio", i64)]
        ),
    ).map_batches(
        lambda t: t.select(["l_orderkey", "odate_day", "prio"]),
        batch_format="pyarrow",
    )

    def li_project(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(df["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": pa.array(df["l_orderkey"], type=pa.int64()),
                "revenue_milli": pa.array(cents * (100 - disc), type=pa.int64()),
            }
        )

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pc.field("l_shipdate") > cutoff,
    ).map_batches(li_project, batch_format="pyarrow")

    joined = bucketed_hash_join(
        li,
        orders,
        key="l_orderkey",
        left_schema=pa.schema([("l_orderkey", i64), ("revenue_milli", i64)]),
        right_schema=pa.schema(
            [("l_orderkey", i64), ("odate_day", i64), ("prio", i64)]
        ),
    )

    def partial_sum(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("l_orderkey", as_index=False).agg(
            revenue_milli=("revenue_milli", "sum"),
            odate_day=("odate_day", "max"),
            prio=("prio", "max"),
        )
        return pa.table(
            {
                "l_orderkey": pa.array(g["l_orderkey"], type=pa.int64()),
                "revenue_milli": pa.array(g["revenue_milli"], type=pa.int64()),
                "odate_day": pa.array(g["odate_day"], type=pa.int64()),
                "prio": pa.array(g["prio"], type=pa.int64()),
            }
        )

    def partial_head(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(
            ["revenue_milli", "l_orderkey"], ascending=[False, True]
        ).head(Q3_TOPK)
        return table_from_pandas(df)

    per_order = (
        joined.map_batches(partial_sum, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(
            Sum("revenue_milli", alias_name="revenue_milli"),
            Max("odate_day", alias_name="odate_day"),
            Max("prio", alias_name="prio"),
        )
        .map_batches(partial_head, batch_format="pyarrow")
    )
    # ≤ Q3_TOPK × blocks rows by the partial-head invariant above
    top = (
        per_order.to_pandas()
        .sort_values(["revenue_milli", "l_orderkey"], ascending=[False, True])
        .head(Q3_TOPK)
        .reset_index(drop=True)
    )
    top["o_orderpriority"] = top["prio"].map(_PRIORITY_BY_DIGIT)
    return top[["l_orderkey", "revenue_milli", "odate_day", "o_orderpriority"]]


# ---------------------------------------------------------------- 104
Q6_YEAR_LO = "1996-01-01"
Q6_YEAR_HI = "1997-01-01"
Q6_DISC_CENTS = (5, 6, 7)  # BETWEEN 0.05 AND 0.07 on an exact-cent grid
Q6_MAX_QTY = 24


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape (forecasting revenue change): a pure
    filter-and-reduce with EVERY predicate pushed to the parquet scan
    (shipdate year, discount band, quantity cap) — only the two money
    columns of the qualifying rows ever leave storage.  Revenue is
    extendedprice × discount in exact integer milli-cents; the
    aggregate ships a two-int partial per block.  The discount band is
    matched on the exact-cent grid (discounts are cent-quantized in
    the data), dodging the float BETWEEN boundary entirely."""
    lo = np.datetime64(Q6_YEAR_LO, "us")
    hi = np.datetime64(Q6_YEAR_HI, "us")
    dlo = min(Q6_DISC_CENTS) / 100.0
    dhi = max(Q6_DISC_CENTS) / 100.0

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(df["l_discount"].to_numpy() * 100).astype(np.int64)
        keep = np.isin(disc, list(Q6_DISC_CENTS))
        rev = cents[keep] * disc[keep]
        return pa.table(
            {
                "forecast_milli": pa.array([int(rev.sum())], type=pa.int64()),
                "n_items": pa.array([int(keep.sum())], type=pa.int64()),
            }
        )

    tot = (
        _read(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_extendedprice", "l_discount", "l_shipdate", "l_quantity"],
            filter=(pc.field("l_shipdate") >= lo)
            & (pc.field("l_shipdate") < hi)
            & (pc.field("l_discount") >= dlo - 0.005)
            & (pc.field("l_discount") <= dhi + 0.005)
            & (pc.field("l_quantity") < float(Q6_MAX_QTY)),
        )
        .map_batches(partial, batch_format="pyarrow")
        .aggregate(
            Sum("forecast_milli", alias_name="forecast_milli"),
            Sum("n_items", alias_name="n_items"),
        )
    )
    return pd.DataFrame(
        {
            "forecast_milli": [np.int64(tot["forecast_milli"] or 0)],
            "n_items": [np.int64(tot["n_items"] or 0)],
        }
    )


# ---------------------------------------------------------------- 105
Q17_BRAND = "Brand#2"


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from
    lineitems whose quantity is below 20% of the per-part average, for
    one brand.  The part table reduces to bare keys (brand pushed into
    the scan) and prunes lineitem via the bucketed SEMI join.  The
    correlated per-part average needs whole groups, so survivors
    pre-reduce map-side onto the (partkey, qty) integer grid (exact —
    quantities are integral; the shuffle ships ≤ |qty domain| rows per
    part per batch, never raw lineitems), hash-partition on partkey
    into WINDOW_HASH_PARTITIONS buckets, and ONE vectorized pandas
    groupby per bucket evaluates the predicate —
    rewritten to exact integers (qty < avg/5  ⇔  5·qty·cnt < totq,
    quantities are integral in the data), so there is no float
    boundary for engines to disagree on.  Each bucket emits a two-int
    partial; output is the global (total_cents, n_small) pair plus
    avg_yearly_cents = total/7 as one double division."""
    from crawler_ray.stages.joins import bucketed_filter_join

    i64 = pa.int64()
    part_keys = _read(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"],
        filter=pc.field("p_brand") == Q17_BRAND,
    ).map_batches(
        lambda t: t.select(["p_partkey"]).rename_columns(["l_partkey"]),
        batch_format="pyarrow",
    )

    def li_project(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.table(
            {
                "l_partkey": pa.array(df["l_partkey"], type=pa.int64()),
                "qty": pa.array(
                    np.round(df["l_quantity"].to_numpy()).astype(np.int64),
                    type=pa.int64(),
                ),
                "cents": pa.array(
                    np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        )

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(li_project, batch_format="pyarrow")
    li = bucketed_filter_join(
        li,
        part_keys,
        key="l_partkey",
        mode="semi",
        left_schema=pa.schema([("l_partkey", i64), ("qty", i64), ("cents", i64)]),
    )

    def partial_by_qty(batch: pa.Table) -> pa.Table:
        # map-side EXACT pre-reduction: quantities live on a small
        # integer grid, so (partkey, qty) → (n, cents_sum) loses
        # nothing and the shuffle ships ≤ |qty domain| rows per part
        # per batch instead of raw lineitems
        df = batch.to_pandas()
        g = df.groupby(["l_partkey", "qty"], as_index=False).agg(
            n=("qty", "size"), cents_sum=("cents", "sum")
        )
        pk = hash_pkey(g["l_partkey"].to_numpy(), WINDOW_HASH_PARTITIONS)
        return pa.table(
            {
                "l_partkey": pa.array(g["l_partkey"], type=pa.int64()),
                "qty": pa.array(g["qty"], type=pa.int64()),
                "n": pa.array(g["n"], type=pa.int64()),
                "cents_sum": pa.array(g["cents_sum"], type=pa.int64()),
                "pkey": pa.array(pk, type=pa.int64()),
            }
        )

    def bucket_reduce(g: pd.DataFrame) -> pa.Table:
        # one vectorized groupby per hash bucket — parts are whole
        # here (pkey partitions by partkey; bucket sizing invariant
        # documented at WINDOW_HASH_PARTITIONS), so the per-part
        # average is exact.  Merge the (partkey, qty) partials first:
        # cnt = Σn, totq = Σ qty·n — still exact integers
        m = g.groupby(["l_partkey", "qty"], as_index=False).agg(
            n=("n", "sum"), cents_sum=("cents_sum", "sum")
        )
        per = (
            m.assign(qn=m["qty"] * m["n"])
            .groupby("l_partkey")
            .agg(cnt=("n", "sum"), totq=("qn", "sum"))
        )
        cnt = per["cnt"].reindex(m["l_partkey"]).to_numpy()
        totq = per["totq"].reindex(m["l_partkey"]).to_numpy()
        small = 5 * m["qty"].to_numpy() * cnt < totq
        return pa.table(
            {
                "total_cents": pa.array(
                    [int(m["cents_sum"].to_numpy()[small].sum())],
                    type=pa.int64(),
                ),
                "n_small": pa.array(
                    [int(m["n"].to_numpy()[small].sum())], type=pa.int64()
                ),
            }
        )

    tot = (
        li.map_batches(partial_by_qty, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(bucket_reduce, batch_format="pandas")
        .aggregate(
            Sum("total_cents", alias_name="total_cents"),
            Sum("n_small", alias_name="n_small"),
        )
    )
    total = np.int64(tot["total_cents"] or 0)
    return pd.DataFrame(
        {
            "total_cents": [total],
            "n_small": [np.int64(tot["n_small"] or 0)],
            "avg_yearly_cents": [float(total) / 7.0],
        }
    )


# ---------------------------------------------------------------- 106
Q21_LATE_DAYS = 100  # "kept waiting": shipped >100 days after order
Q21_TOPK = 10


def q_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape (suppliers who kept orders waiting): suppliers
    who were the SOLE late shipper in a finished multi-supplier order.
    The tables lack commit/receipt dates, so "late" is shipdate more
    than Q21_LATE_DAYS after the order date (the repo's Q4 convention).
    orders ships only (orderkey, epoch-day) through the bucketed hash
    join; the per-order exists/not-exists pair (≥2 distinct suppliers,
    exactly 1 distinct LATE supplier) needs whole orders, so joined
    rows pre-reduce map-side to distinct (order, supplier, late)
    triples (exact — per-line multiplicity never matters downstream),
    hash-partition on orderkey, and ONE vectorized pandas
    reduction per bucket finds the sole-late-supplier orders.  The
    per-supplier count is a map-side partial combine → groupby Sum;
    top-k via per-block partial heads and winner names by key-IN
    parquet read — the driver never holds |suppliers|."""
    import pyarrow.parquet as _pq

    from crawler_ray.stages.joins import bucketed_hash_join

    i64 = pa.int64()

    def li_project(batch: pa.Table) -> pa.Table:
        days = pc.cast(pc.cast(batch["l_shipdate"], pa.date32()), pa.int32())
        return pa.table(
            {
                "l_orderkey": pc.cast(batch["l_orderkey"], i64),
                "suppkey": pc.cast(batch["l_suppkey"], i64),
                "ship_day": pc.cast(days, i64),
            }
        )

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(li_project, batch_format="pyarrow")

    def orders_project(batch: pa.Table) -> pa.Table:
        days = pc.cast(pc.cast(batch["o_orderdate"], pa.date32()), pa.int32())
        return pa.table(
            {
                "l_orderkey": pc.cast(batch["o_orderkey"], i64),
                "odate_day": pc.cast(days, i64),
            }
        )

    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"],
        filter=pc.field("o_orderstatus") == "F",
    ).map_batches(orders_project, batch_format="pyarrow")

    joined = bucketed_hash_join(
        li,
        orders,
        key="l_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", i64), ("suppkey", i64), ("ship_day", i64)]
        ),
        right_schema=pa.schema([("l_orderkey", i64), ("odate_day", i64)]),
    )

    def add_pkey(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["late"] = (
            df["ship_day"].to_numpy() - df["odate_day"].to_numpy() > Q21_LATE_DAYS
        ).astype(np.int64)
        # map-side EXACT pre-reduction: sole_late only reads DISTINCT
        # (order, supplier, late) triples, so per-line multiplicity is
        # dropped before the shuffle (≤ 2 rows per (order, supplier)
        # pair leave each batch; bucket sizing invariant documented at
        # WINDOW_HASH_PARTITIONS)
        df = df[["l_orderkey", "suppkey", "late"]].drop_duplicates()
        pk = hash_pkey(df["l_orderkey"].to_numpy(), WINDOW_HASH_PARTITIONS)
        return table_from_pandas(df.assign(pkey=pk))

    def sole_late(g: pd.DataFrame) -> pa.Table:
        # whole orders per bucket (pkey partitions by orderkey): keep
        # orders with ≥2 distinct suppliers and exactly 1 distinct
        # late supplier, emit (suppkey, numwait-partial)
        u = g[["l_orderkey", "suppkey", "late"]].drop_duplicates(
            ["l_orderkey", "suppkey", "late"]
        )
        per = u.groupby("l_orderkey").agg(
            ns=("suppkey", "nunique"),
        )
        late_u = u[u["late"] == 1]
        nl = late_u.groupby("l_orderkey")["suppkey"].nunique()
        per["nl"] = nl.reindex(per.index).fillna(0).astype(np.int64)
        keep = per[(per["ns"] >= 2) & (per["nl"] == 1)].index
        winners = late_u[late_u["l_orderkey"].isin(keep)]
        out = winners.groupby("suppkey", as_index=False).agg(
            numwait=("l_orderkey", "nunique")
        )
        return pa.table(
            {
                "suppkey": pa.array(out["suppkey"], type=pa.int64()),
                "numwait": pa.array(out["numwait"], type=pa.int64()),
            }
        )

    def partial_head(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["numwait", "suppkey"], ascending=[False, True]).head(
            Q21_TOPK
        )
        return table_from_pandas(df)

    per_supp = (
        joined.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(sole_late, batch_format="pandas")
        .groupby("suppkey")
        .aggregate(Sum("numwait", alias_name="numwait"))
        .map_batches(partial_head, batch_format="pyarrow")
    )
    # ≤ Q21_TOPK × blocks rows by the partial-head invariant above
    top = (
        per_supp.to_pandas()
        .sort_values(["numwait", "suppkey"], ascending=[False, True])
        .head(Q21_TOPK)
        .reset_index(drop=True)
    )
    keys = [int(k) for k in top["suppkey"]]
    sup = _pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"],
        filters=[("s_suppkey", "in", keys)],
    ).to_pandas()  # == Q21_TOPK rows by construction
    out = top.merge(sup, left_on="suppkey", right_on="s_suppkey")
    return out[["suppkey", "s_name", "numwait"]]


# ---------------------------------------------------------------- 107
Q8_TYPE = "STANDARD"  # part market under consideration
Q8_REGION = 2  # customers' region (r_regionkey)
Q8_NATION = 7  # supplier nation whose share is measured (in region 2)
Q8_DATE_LO = "1996-01-01"
Q8_DATE_HI = "1998-01-01"


def q_nation_market_share(sf_dir: str):
    """TPC-H Q8 shape (national market share): the fraction of revenue
    in one region's market for one part type supplied by one nation,
    per order year.  Three chained bucketed hash joins, each leg
    projected map-side to bare int64s before its shuffle: part prunes
    lineitem via the SEMI join (type pushed into the scan); orders
    (date range pushed) contributes (custkey, year); customer
    contributes c_nationkey, mapped to an in-region flag through the
    25-row nation→region dict (a Python constant per task, never a
    shuffle) and filtered BEFORE the supplier join so out-of-market
    rows exit early; supplier contributes an is-target-nation 0/1.
    The final reduce ships (year, total_milli, nation_milli) int
    partials; the share is one double division per year driver-side
    (≤ 2 rows)."""
    import pyarrow.parquet as _pq

    from crawler_ray.stages.joins import bucketed_filter_join, bucketed_hash_join

    i64 = pa.int64()
    lo = np.datetime64(Q8_DATE_LO, "us")
    hi = np.datetime64(Q8_DATE_HI, "us")

    part_keys = _read(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_type"],
        filter=pc.field("p_type") == Q8_TYPE,
    ).map_batches(
        lambda t: t.select(["p_partkey"]).rename_columns(["l_partkey"]),
        batch_format="pyarrow",
    )

    def li_project(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cents = np.round(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.round(df["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table(
            {
                "l_partkey": pa.array(df["l_partkey"], type=pa.int64()),
                "l_orderkey": pa.array(df["l_orderkey"], type=pa.int64()),
                "suppkey": pa.array(df["l_suppkey"], type=pa.int64()),
                "rev_milli": pa.array(cents * (100 - disc), type=pa.int64()),
            }
        )

    li = _read(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_partkey",
            "l_orderkey",
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
        ],
    ).map_batches(li_project, batch_format="pyarrow")
    li = bucketed_filter_join(
        li,
        part_keys,
        key="l_partkey",
        mode="semi",
        left_schema=pa.schema(
            [
                ("l_partkey", i64),
                ("l_orderkey", i64),
                ("suppkey", i64),
                ("rev_milli", i64),
            ]
        ),
    ).map_batches(
        lambda t: t.select(["l_orderkey", "suppkey", "rev_milli"]),
        batch_format="pyarrow",
    )

    def orders_project(batch: pa.Table) -> pa.Table:
        yr = pc.cast(pc.year(batch["o_orderdate"]), i64)
        return pa.table(
            {
                "l_orderkey": pc.cast(batch["o_orderkey"], i64),
                "custkey": pc.cast(batch["o_custkey"], i64),
                "o_year": yr,
            }
        )

    orders = _read(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo) & (pc.field("o_orderdate") < hi),
    ).map_batches(orders_project, batch_format="pyarrow")

    j1 = bucketed_hash_join(
        li,
        orders,
        key="l_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", i64), ("suppkey", i64), ("rev_milli", i64)]
        ),
        right_schema=pa.schema(
            [("l_orderkey", i64), ("custkey", i64), ("o_year", i64)]
        ),
    ).map_batches(
        lambda t: t.select(["suppkey", "rev_milli", "custkey", "o_year"]),
        batch_format="pyarrow",
    )

    cust = _read(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "custkey": pc.cast(t["c_custkey"], pa.int64()),
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    j2 = bucketed_hash_join(
        j1,
        cust,
        key="custkey",
        left_schema=pa.schema(
            [("custkey", i64), ("suppkey", i64), ("rev_milli", i64), ("o_year", i64)]
        ),
        right_schema=pa.schema([("custkey", i64), ("c_nationkey", i64)]),
    )

    # nation→region is a 25-row schema constant: a per-task dict, not a
    # join (the SQL twin routes it through nation/region for parity)
    nat = _pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    region_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_regionkey"].astype(int)))
    in_region = frozenset(k for k, r in region_of.items() if r == Q8_REGION)

    def region_filter(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        keep = df["c_nationkey"].isin(in_region).to_numpy()
        df = df.loc[keep, ["suppkey", "rev_milli", "o_year"]]
        return pa.table(
            {
                "suppkey": pa.array(df["suppkey"], type=pa.int64()),
                "rev_milli": pa.array(df["rev_milli"], type=pa.int64()),
                "o_year": pa.array(df["o_year"], type=pa.int64()),
            }
        )

    market = j2.map_batches(region_filter, batch_format="pyarrow")

    supp = _read(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "suppkey": pc.cast(t["s_suppkey"], pa.int64()),
                "is_target": pc.cast(
                    pc.equal(t["s_nationkey"], pa.scalar(Q8_NATION)), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    j3 = bucketed_hash_join(
        market,
        supp,
        key="suppkey",
        left_schema=pa.schema(
            [("suppkey", i64), ("rev_milli", i64), ("o_year", i64)]
        ),
        right_schema=pa.schema([("suppkey", i64), ("is_target", i64)]),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["nation_milli"] = df["rev_milli"] * df["is_target"]
        g = df.groupby("o_year", as_index=False).agg(
            total_milli=("rev_milli", "sum"), nation_milli=("nation_milli", "sum")
        )
        return pa.table(
            {
                "o_year": pa.array(g["o_year"], type=pa.int64()),
                "total_milli": pa.array(g["total_milli"], type=pa.int64()),
                "nation_milli": pa.array(g["nation_milli"], type=pa.int64()),
            }
        )

    agg = (
        j3.map_batches(partial, batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(
            Sum("total_milli", alias_name="total_milli"),
            Sum("nation_milli", alias_name="nation_milli"),
        )
        .to_pandas()  # ≤ |years in Q8 range| rows — bounded
    )
    agg = agg.sort_values("o_year").reset_index(drop=True)
    agg["o_year"] = agg["o_year"].astype(np.int64)
    agg["total_milli"] = agg["total_milli"].astype(np.int64)
    agg["nation_milli"] = agg["nation_milli"].astype(np.int64)
    agg["mkt_share"] = agg["nation_milli"].astype(float) / agg["total_milli"].astype(
        float
    )
    return agg[["o_year", "total_milli", "nation_milli", "mkt_share"]]


# ---------------------------------------------------------------- 108
def q_cdc_dup_chunks(sf_dir: str):
    """Per-document duplicated-content ratio under CONTENT-DEFINED
    chunking (FastCDC / gear rolling hash, Xia et al. 2016): what
    fraction of a doc's CDC chunks also appear byte-identical in OTHER
    documents.  Unlike the fixed-window ExactSubstr operator
    (q_duplicate_substrings), CDC boundaries resynchronize after an
    insertion/deletion, so shared passages are found even when their
    byte offsets differ between docs — the storage-dedup property,
    pinned by the resync test in tests/test_cdc.py.

    Scale shape: the gear hash is evaluated VECTORIZED over each
    doc's bytes (64 shift-add numpy passes, no per-byte Python —
    functions/cdc.py); dup marking and the per-doc ratio are the
    shared :func:`_dup_unit_ratio` pipeline (ONE shuffle carrying md5
    hex, never chunk bytes).  Not SQL-expressible (the rolling-hash
    recurrence), so this is a rows-only entry backed by the
    brute-force ground-truth test."""
    from crawler_ray.functions.cdc import cdc_chunk_hashes

    ds = _doc(sf_dir, ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for h in cdc_chunk_hashes(t or ""):
                ids.append(d)
                hashes.append(h)
        if not hashes:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "chash": pa.array([], type=pa.string()),
                    "pkey": pa.array([], type=pa.int64()),
                }
            )
        out = pd.DataFrame({"doc_id": ids, "chash": hashes})
        out["pkey"] = hash_pkey(
            out["chash"].to_numpy(dtype=object), PARA_HASH_PARTITIONS
        )
        return table_from_pandas(out)

    return _dup_unit_ratio(
        ds.map_batches(explode, batch_format="pyarrow"), "chash", "n_chunks"
    )


# ---------------------------------------------------------------- 109
D4_QUOTA = 25  # per-cluster sample quota (D4 flattens cluster density)


def q_d4_diverse_sample(sf_dir: str):
    """D4-style cluster-diverse sampling (Tirumala et al. 2023, "D4:
    Improving LLM Pretraining via Document De-Duplication and
    Diversification" — public method): k-means the embedding space,
    then draw a FIXED quota per cluster so dense regions stop
    dominating the sample.  Clustering is the existing mergeable
    kmeans_full (k×dim partials, no shuffle); within-cluster selection
    is the D4_QUOTA smallest md5(vec_id) values — deterministic,
    order-free, and engine-independent.  Selection uses the per-block
    partial-head shape: each block emits ≤ quota rows per cluster it
    sees, the per-cluster merge handles ≤ quota × blocks rows — never
    a full cluster in one task (clusters are corpus/k at 100 TB).
    Iterative + hash-ordered, so rows-only; ground truth recomputes
    single-process in tests/test_d4_sample.py."""
    from crawler_ray.stages.ann import kmeans_full

    ds = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    dim = len(ds.take(1)[0]["embedding"])
    _, _, assigned = kmeans_full(ds, dim, k=KMEANS_K, iters=KMEANS_ITERS)
    return _cluster_quota_take(assigned, D4_QUOTA)


def _cluster_quota_take(assigned, quota: int):
    """Fixed per-cluster quota in md5(vec_id) order over a Dataset
    carrying (vec_id, cluster, …) — the per-block partial-head shape:
    each block emits ≤ quota rows per cluster it sees, the per-cluster
    merge handles ≤ quota × blocks rows, never a full cluster."""

    def partial_take(batch: pa.Table) -> pa.Table:
        # select BEFORE to_pandas: the embedding column must never
        # materialize into Python lists on this corpus-wide map
        df = batch.select(["vec_id", "cluster"]).to_pandas()
        df["h"] = [
            hashlib.md5(str(int(v)).encode()).hexdigest() for v in df["vec_id"]
        ]
        df = (
            df.sort_values(["cluster", "h", "vec_id"])
            .groupby("cluster", sort=False)
            .head(quota)
        )
        return pa.table(
            {
                "cluster": pa.array(df["cluster"], type=pa.int64()),
                "vec_id": pa.array(df["vec_id"], type=pa.int64()),
                "h": pa.array(df["h"], type=pa.string()),
            }
        )

    def final_take(g: pd.DataFrame) -> pa.Table:
        df = g.sort_values(["h", "vec_id"]).head(quota)
        return pa.table(
            {
                "cluster": pa.array(df["cluster"], type=pa.int64()),
                "vec_id": pa.array(df["vec_id"], type=pa.int64()),
            }
        )

    return (
        assigned.map_batches(partial_take, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(final_take, batch_format="pandas")
        # ≤ quota × blocks rows reach each cluster group by the
        # partial-take invariant above
    )


# ---------------------------------------------------------------- 110
def q_d4_pipeline(sf_dir: str):
    """The FULL D4 method (Tirumala et al. 2023): SemDeDup first
    (within-cluster greedy cosine dedup removes near-duplicates), then
    cluster-diverse quota sampling over the SURVIVORS — reusing the
    SAME k-means assignment for both phases, exactly as the paper
    composes them (one clustering pays for dedup and diversification).
    The dedup stage is the existing semantic_dedup (O(c²) in-cluster
    contract with the max_cluster_size raise); the sampling stage is
    the shared :func:`_cluster_quota_take` partial-head shape.
    Iterative + float cosines → rows-only; ground truth composes the
    two stages' own single-process recomputes in
    tests/test_d4_sample.py."""
    from crawler_ray.stages.ann import semantic_dedup

    ds = _read(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    dim = len(ds.take(1)[0]["embedding"])
    dedup = semantic_dedup(
        ds, dim=dim, k=KMEANS_K, threshold=DUP_COSINE_THRESHOLD, iters=KMEANS_ITERS
    )
    survivors = dedup.filter(expr="kept == True").map_batches(
        lambda t: t.select(["vec_id", "cluster"]), batch_format="pyarrow"
    )
    return _cluster_quota_take(survivors, D4_QUOTA)


# ---------------------------------------------------------------- 111
def q_compression_ratio(sf_dir: str):
    """Per-document DEFLATE compression ratio (compressed/raw bytes at
    zlib level 6) — the low-entropy/repetitiveness quality signal the
    Gopher and FineWeb pipeline families apply (highly repetitive or
    template text compresses far below natural prose, near-random text
    barely compresses).  A pure map: no shuffle, no state, zlib is
    byte-deterministic across platforms for a fixed level so the
    output is stable.  Not SQL-expressible (no DEFLATE in SQL) →
    rows-only, with an exact single-process recompute in
    tests/test_ground_truth.py."""
    import zlib

    ds = _doc(sf_dir, ["doc_id", "text"])

    def ratio(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        raw, comp = [], []
        for t in batch["text"].to_pylist():
            b = (t or "").encode("utf-8", errors="replace")
            raw.append(len(b))
            comp.append(len(zlib.compress(b, 6)))
        raw_a = np.array(raw, dtype=np.int64)
        comp_a = np.array(comp, dtype=np.int64)
        # empty docs: ratio 1.0 by convention (nothing to compress)
        r = np.where(raw_a > 0, comp_a / np.maximum(raw_a, 1), 1.0)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "raw_bytes": pa.array(raw_a, type=pa.int64()),
                "compressed_bytes": pa.array(comp_a, type=pa.int64()),
                "compression_ratio": pa.array(r, type=pa.float64()),
            }
        )

    return ds.map_batches(ratio, batch_format="pyarrow")


# ------------------------------------------------------------- oracle
_QUALITY_SQL = """
SELECT doc_id,
  CASE WHEN text IS NULL OR text = '' THEN 0.0 ELSE
    LEAST(1.0,
      (CASE WHEN length(trim(text, ' \t\n\r')) > 1000 THEN 0.4
            WHEN length(trim(text, ' \t\n\r')) > 500 THEN 0.3
            WHEN length(trim(text, ' \t\n\r')) > 100 THEN 0.2 ELSE 0.0 END
       + CASE WHEN array_length(list_filter(string_split(text, '.'),
                    s -> length(trim(s, ' \t\n\r')) > 10)) >= 5 THEN 0.3
              WHEN array_length(list_filter(string_split(text, '.'),
                    s -> length(trim(s, ' \t\n\r')) > 10)) >= 2 THEN 0.2 ELSE 0.0 END
       + CASE WHEN ((CASE WHEN contains(text,'설명') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'내용') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'정보') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'소개') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'개요') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'현황') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'실적') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'계획') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'전략') THEN 1 ELSE 0 END)) >= 3 THEN 0.2
              WHEN ((CASE WHEN contains(text,'설명') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'내용') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'정보') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'소개') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'개요') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'현황') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'실적') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'계획') THEN 1 ELSE 0 END)
                  + (CASE WHEN contains(text,'전략') THEN 1 ELSE 0 END)) >= 1 THEN 0.1
              ELSE 0.0 END)
      * (array_length(list_distinct(string_split(text, chr(10)))) * 1.0
         / array_length(string_split(text, chr(10)))))
  END AS quality
FROM documents
"""

_URL_EXPR = _derived_url_expr_sql()

ORACLE_SQL: dict[str, str] = {
    "local_supplier_volume": (
        "SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_items, "
        "CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT) * "
        "(100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) AS BIGINT)"
        " AS revenue_milli "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        f"WHERE r.r_name = '{Q5_REGION}' "
        "AND c.c_nationkey = s.s_nationkey "
        f"AND o.o_orderdate >= TIMESTAMP '{Q5_DATE_LO}' "
        f"AND o.o_orderdate < TIMESTAMP '{Q5_DATE_HI}' "
        "GROUP BY n.n_name"
    ),
    "large_volume_customers": (
        "SELECT c.c_custkey AS custkey, c.c_name, o.o_orderkey, "
        "o.o_orderdate, t.total_qty "
        "FROM (SELECT l_orderkey, CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT))"
        " AS BIGINT) AS total_qty FROM lineitem GROUP BY l_orderkey "
        f"HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > {LARGE_VOLUME_QTY}) t "
        "JOIN orders o ON o.o_orderkey = t.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey"
    ),
    "market_basket_pairs": (
        "WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) "
        "SELECT a.l_partkey AS p1, c.l_partkey AS p2, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey "
        "AND a.l_partkey < c.l_partkey "
        f"GROUP BY 1, 2 ORDER BY n DESC, p1, p2 LIMIT {BASKET_TOPK}"
    ),
    "user_top_event": (
        "SELECT user_id, event_type AS top_event, n FROM ("
        "SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "ROW_NUMBER() OVER (PARTITION BY user_id "
        "ORDER BY COUNT(*) DESC, event_type) AS rn "
        "FROM events GROUP BY user_id, event_type) WHERE rn = 1"
    ),
    "posting_lists": (
        "WITH tok AS (SELECT DISTINCT doc_id, unnest(regexp_extract_all("
        "lower(text), '[a-z0-9_]+')) AS token FROM documents), "
        "ranked AS (SELECT token, doc_id, "
        "ROW_NUMBER() OVER (PARTITION BY token ORDER BY doc_id) AS rn, "
        "COUNT(*) OVER (PARTITION BY token) AS df FROM tok) "
        "SELECT token, CAST(MAX(df) AS BIGINT) AS df, "
        "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings "
        f"FROM ranked WHERE rn <= {POSTINGS_K} GROUP BY token"
    ),
    "paragraph_dedup": (
        "WITH para AS (SELECT doc_id, "
        "unnest(string_split(text, chr(10))) AS p, "
        "unnest(range(len(string_split(text, chr(10))))) AS idx "
        "FROM documents), "
        "kept AS (SELECT doc_id, idx, p FROM para"
        " WHERE length(trim(p, ' \t\r')) > 0), "
        "firsts AS (SELECT doc_id, idx, p, ROW_NUMBER() OVER ("
        "PARTITION BY p ORDER BY doc_id, idx) AS rn FROM kept) "
        "SELECT doc_id, string_agg(p, chr(10) ORDER BY idx) AS text_dedup, "
        "CAST(COUNT(*) AS BIGINT) AS n_kept "
        "FROM firsts WHERE rn = 1 GROUP BY doc_id"
    ),
    "dup_paragraph_ratio": (
        "WITH para AS (SELECT doc_id, unnest(string_split(text, chr(10)))"
        " AS p FROM documents), "
        "kept AS (SELECT doc_id, p FROM para"
        " WHERE length(trim(p, ' \t\r')) > 0), "
        "nd AS (SELECT p, COUNT(DISTINCT doc_id) AS ndocs FROM kept GROUP BY p) "
        "SELECT k.doc_id, CAST(COUNT(*) AS BIGINT) AS n_para, "
        "CAST(SUM(CASE WHEN nd.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_dup, "
        "CAST(SUM(CASE WHEN nd.ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / "
        "COUNT(*) AS dup_ratio "
        "FROM kept k JOIN nd ON k.p = nd.p GROUP BY k.doc_id"
    ),
    "props_value_stats": (
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COUNT(json_extract(props, '$.k')) AS BIGINT) AS n_k, "
        "CAST(COALESCE(SUM(CAST(json_extract(props, '$.k') AS BIGINT)), 0)"
        " AS BIGINT) AS sum_k "
        "FROM events GROUP BY event_type"
    ),
    "user_longest_streak": (
        "WITH act AS (SELECT DISTINCT user_id, "
        "CAST(date_trunc('day', ts) AS DATE) AS day FROM events), "
        "isl AS (SELECT user_id, day - CAST(ROW_NUMBER() OVER ("
        "PARTITION BY user_id ORDER BY day) AS INTEGER) AS island FROM act), "
        "runs AS (SELECT user_id, island, COUNT(*) AS len FROM isl "
        "GROUP BY user_id, island) "
        "SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak "
        "FROM runs GROUP BY user_id"
    ),
    "monthly_revenue_growth": (
        "WITH m AS (SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)"
        " AS month, "
        "CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)"
        " AS revenue_cents "
        "FROM orders GROUP BY 1) "
        "SELECT month, revenue_cents, "
        "COALESCE((revenue_cents - LAG(revenue_cents) OVER (ORDER BY month))"
        " / CAST(LAG(revenue_cents) OVER (ORDER BY month) AS DOUBLE), -1.0)"
        " AS growth FROM m"
    ),
    "events_heatmap": (
        "SELECT CAST(isodow(ts) AS BIGINT) AS dow, "
        "CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2"
    ),
    "orders_above_customer_avg": (
        "SELECT o.o_orderkey, o.o_custkey, "
        "CAST(ROUND(o.o_totalprice*100) AS BIGINT) AS totalprice_cents "
        "FROM orders o JOIN (SELECT o_custkey, "
        "CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE) / "
        "COUNT(*) AS avg_cents FROM orders GROUP BY o_custkey) a "
        "USING (o_custkey) "
        "WHERE CAST(ROUND(o.o_totalprice*100) AS BIGINT) > a.avg_cents"
    ),
    "parts_in_all_regions": (
        "SELECT l.l_partkey AS p_partkey FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY l.l_partkey "
        "HAVING COUNT(DISTINCT n.n_regionkey) = (SELECT COUNT(*) FROM region)"
    ),
    "daily_active_users": (
        "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users, "
        "CAST(COUNT(*) AS BIGINT) AS n_events "
        "FROM events GROUP BY 1"
    ),
    "new_vs_returning": (
        "WITH act AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id "
        "FROM events), "
        "f AS (SELECT user_id, MIN(day) AS first_day FROM act GROUP BY user_id) "
        "SELECT CAST(a.day AS TIMESTAMP) AS day, "
        "CAST(SUM(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_new, "
        "CAST(SUM(CASE WHEN a.day <> f.first_day THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n_returning "
        "FROM act a JOIN f USING (user_id) GROUP BY a.day"
    ),
    "event_transitions": (
        "SELECT prev_type, event_type AS next_type, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM ("
        "SELECT event_type, LAG(event_type) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events) "
        "WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type"
    ),
    "distinct_parts_per_supplier": (
        "SELECT l_suppkey, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts "
        "FROM lineitem GROUP BY l_suppkey"
    ),
    "parts_above_brand_avg": (
        "SELECT p.p_partkey, p.p_brand, "
        "CAST(ROUND(p.p_retailprice*100) AS BIGINT) AS retail_cents "
        "FROM part p JOIN (SELECT p_brand, "
        "CAST(SUM(CAST(ROUND(p_retailprice*100) AS BIGINT)) AS DOUBLE) / "
        "COUNT(*) AS avg_cents FROM part GROUP BY p_brand) a "
        "ON p.p_brand = a.p_brand "
        "WHERE CAST(ROUND(p.p_retailprice*100) AS BIGINT) > a.avg_cents"
    ),
    "order_lineitem_join": (
        "SELECT o.o_orderpriority AS priority, COUNT(*) AS n_items, "
        "CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY o.o_orderpriority"
    ),
    "cumulative_revenue": (
        "SELECT o_orderkey, CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) "
        "OVER (ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) "
        "AS BIGINT) AS cum_cents FROM orders"
    ),
    "orders_with_late_items": (
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count "
        "FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey "
        "AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY) "
        "GROUP BY o_orderpriority"
    ),
    "native_join": (
        "SELECT n.n_name, COUNT(*) AS n_suppliers, "
        "CAST(SUM(CAST(ROUND(s.s_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents "
        "FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "GROUP BY n.n_name"
    ),
    "customer_urgent_left_join": (
        "SELECT c.c_custkey AS custkey, c.c_name, "
        "CAST(COALESCE(u.n_urgent, -1) AS BIGINT) AS n_urgent "
        "FROM customer c LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_urgent "
        "FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) u "
        "ON c.c_custkey = u.o_custkey"
    ),
    "order_priority_full_join": (
        "SELECT COALESCE(u.o_custkey, l.o_custkey) AS custkey, "
        "CAST(COALESCE(u.n_urgent, -1) AS BIGINT) AS n_urgent, "
        "CAST(COALESCE(l.n_low, -1) AS BIGINT) AS n_low "
        "FROM (SELECT o_custkey, COUNT(*) AS n_urgent FROM orders "
        "WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey) u "
        "FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_low FROM orders "
        "WHERE o_orderpriority = '5-LOW' GROUP BY o_custkey) l "
        "ON u.o_custkey = l.o_custkey"
    ),
    "latest_order_per_customer": (
        "SELECT o_custkey AS custkey, o_orderkey AS latest_okey, "
        "o_orderdate AS latest_date FROM ("
        "SELECT o_custkey, o_orderkey, o_orderdate, ROW_NUMBER() OVER ("
        "PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC"
        ") AS rn FROM orders) WHERE rn = 1"
    ),
    "asof_prior_view": (
        "SELECT c.event_id, MAX(v.ts) AS prior_view_ts "
        "FROM events c LEFT JOIN events v "
        "ON v.user_id = c.user_id AND v.event_type = 'view' AND v.ts <= c.ts "
        "WHERE c.event_type = 'click' GROUP BY c.event_id ORDER BY c.event_id"
    ),
    "link_relevance": (
        "SELECT doc_id, url, NOT ("
        "regexp_matches(substr(text, 1, 40), '(?i)로그인|가입|약관|정책|개인정보|이용안내|사이트맵|찾아오시는|채용|문의|고객센터|패밀리사이트') "
        "OR regexp_matches(url, '(?i)/login|/member|/join|/policy|/recruit|/sitemap|/auth|/cart|/order') "
        "OR regexp_matches(url, '(?i)\\.(pdf|hwp|zip|rar|exe|dmg|jpg|png|gif|mp4|mp3|doc|docx|xls|xlsx|ppt|pptx)$')"
        ") AS relevant "
        f"FROM (SELECT doc_id, text, {_URL_EXPR} AS url FROM documents)"
    ),
    "url_validity": (
        "SELECT doc_id, (doc_id % 5 IN (0, 1, 2)) AS valid FROM documents"
    ),
    "site_identifier": (
        "SELECT doc_id, CASE WHEN doc_id % 5 = 4 THEN 'example_other' "
        "ELSE source END AS site_identifier FROM documents"
    ),
    "packet_full": (
        "WITH t AS (SELECT doc_id, source, text, "
        f"{_URL_EXPR} AS url FROM documents), "
        "h AS (SELECT doc_id, url, text, "
        "sha256(source || '|' || url || '|' || sha256(text)) AS hh FROM t) "
        "SELECT doc_id, substr(hh,1,8)||'-'||substr(hh,9,4)||'-'||substr(hh,13,4)"
        "||'-'||substr(hh,17,4)||'-'||substr(hh,21,12) AS packetId, "
        "url AS contentUrl, CASE WHEN length(text) > 500 THEN substr(text,1,500)||'...' "
        "ELSE text END AS extractedText, "
        f"'{PACKET_CRAWL_TIME}' AS crawlTimestamp, '{PACKET_EXPIRY}' AS dataExpiryDate FROM h"
    ),
    # NOTE: every SUM is wrapped in an outer CAST(... AS BIGINT): DuckDB's
    # SUM over integers returns HUGEINT, which `.df()` converts to float64,
    # while the Ray side emits int64 — the driver's value hash is
    # dtype-sensitive, so both sides must land on int64.
    "kb_pattern_aggregate": (
        "SELECT source AS pattern, CAST(SUM(n_chars) AS BIGINT) AS total_score, "
        "COUNT(*) AS cnt, "
        "ROUND(SUM(n_chars)*1.0/COUNT(*), 3) AS avg_score FROM documents GROUP BY source"
    ),
    "exact_dedup_first": (
        "SELECT md5(text) AS content_hash, MIN(doc_id) AS first_doc_id, "
        "COUNT(*) AS n_docs FROM documents GROUP BY md5(text)"
    ),
    "token_counts": (
        "SELECT doc_id, CAST(array_length(string_split_regex(trim(text, ' \t\n\r'), "
        "'\\s+')) AS BIGINT) AS n_tokens FROM documents"
    ),
    "doc_quality": _QUALITY_SQL,
    "lang_distribution": "SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang",
    "events_hourly": (
        "SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n, "
        "CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_cents "
        "FROM events GROUP BY event_type, date_trunc('hour', ts)"
    ),
    "sliding_window": (
        "SELECT event_type, "
        # floor(epoch) — a bare ::BIGINT cast would ROUND sub-second ts
        f"CAST((CAST(floor(epoch(ts)) AS BIGINT) - k * {SLIDE_S}) // {WINDOW_S} * {WINDOW_S} + k * {SLIDE_S} AS BIGINT) AS win_start, "
        "COUNT(*) AS n, CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_cents "
        f"FROM events, (SELECT unnest(range({WINDOW_S // SLIDE_S})) AS k) "
        "GROUP BY event_type, win_start"
    ),
    "nation_order_stats": (
        "SELECT n.n_name AS nation, COUNT(*) AS n_orders, "
        "CAST(SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name"
    ),
    "lineitem_agg": (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_cents, "
        "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents, "
        "COUNT(*) AS n FROM lineitem "
        f"WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "lineitem_corr": (
        # same exact-integer sufficient statistics as the engine
        # (HUGEINT here, two int64 limbs there), then the SAME final
        # double expression — identical operands, identical result
        "WITH b AS (SELECT l_returnflag, "
        "CAST(ROUND(l_quantity) AS BIGINT) AS x, "
        "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS y FROM lineitem), "
        "s AS (SELECT l_returnflag, COUNT(*) AS n, SUM(x) AS sx, "
        "SUM(x*x) AS sxx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(y*y) AS syy "
        "FROM b GROUP BY l_returnflag) "
        "SELECT l_returnflag, n, "
        "ROUND((n*sxy - sx*sy) / SQRT(CAST(n*sxx - sx*sx AS DOUBLE) * "
        "CAST(n*syy - sy*sy AS DOUBLE)), 6) AS corr_qty_price "
        "FROM s ORDER BY l_returnflag"
    ),
    "top_docs_by_tokens": (
        "SELECT doc_id, n_tokens FROM (SELECT doc_id, "
        "CAST(array_length(string_split_regex(trim(text, ' \t\n\r'), '\\s+')) AS BIGINT) "
        "AS n_tokens FROM documents) ORDER BY n_tokens DESC, doc_id LIMIT 10"
    ),
    "quality_signals": (
        "WITH w AS (SELECT doc_id, text, "
        "string_split_regex(trim(text, ' \t\n\r'), '\\s+') AS words FROM documents) "
        "SELECT doc_id, CAST(array_length(words) AS BIGINT) AS n_words, "
        "CASE WHEN array_length(words) = 0 THEN 0.0 ELSE "
        "length(regexp_replace(text, '\\s', '', 'g')) * 1.0 / array_length(words) END "
        "AS mean_word_len, "
        "CASE WHEN length(text) = 0 THEN 0.0 ELSE "
        "(length(text) - length(regexp_replace(text, "
        "'[.,;:!?…·''\"()\\[\\]{}]', '', 'g'))) * 1.0 / length(text) END AS punct_ratio, "
        "CASE WHEN array_length(words) = 0 THEN 0.0 ELSE "
        "array_length(list_filter(words, x -> lower(x) IN "
        "('the','and','of','a','to','in','is','that','it','for'))) * 1.0 "
        "/ array_length(words) END AS stopword_ratio "
        "FROM w"
    ),
    "text_normalize": (
        "SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) "
        "AS normalized FROM documents"
    ),
    "deterministic_sample": (
        "SELECT doc_id FROM documents WHERE substr(md5(text), 1, 1) = '0'"
    ),
    "mask_entities": (
        "SELECT doc_id, regexp_replace(text, "
        r"'\b(customer|supplier|order)\b', '[MASK]', 'g') AS masked "
        "FROM documents"
    ),
    "vocab_topk": (
        "SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM ("
        "SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS token "
        "FROM documents) GROUP BY token "
        f"ORDER BY n DESC, token LIMIT {VOCAB_TOPK}"
    ),
    "bigram_topk": (
        "WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z0-9_]+')"
        " AS tl FROM documents), "
        "z AS (SELECT unnest(list_zip(tl[1:len(tl)-1], tl[2:len(tl)])) AS p "
        "FROM toks WHERE len(tl) >= 2) "
        "SELECT p[1] || ' ' || p[2] AS bigram, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM z GROUP BY 1 ORDER BY n DESC, bigram LIMIT {BIGRAM_TOPK}"
    ),
    "stratified_sample": (
        "SELECT source, doc_id FROM ("
        "SELECT source, doc_id, ROW_NUMBER() OVER ("
        "PARTITION BY source ORDER BY md5(text), doc_id) AS rn FROM documents"
        f") WHERE rn <= {STRATA_K}"
    ),
    "source_mixture": (
        "WITH n AS (SELECT source, count(*) AS n FROM documents "
        "GROUP BY source), "
        "w AS (SELECT source, CAST(floor(sqrt(n)) AS BIGINT) AS w FROM n), "
        f"q AS (SELECT source, CAST(({MIXTURE_TOTAL} * w) // "
        "(SELECT sum(w) FROM w) AS BIGINT) AS quota FROM w), "
        "r AS (SELECT source, doc_id, ROW_NUMBER() OVER ("
        "PARTITION BY source ORDER BY md5(text), doc_id) AS rn "
        "FROM documents) "
        "SELECT r.source, r.doc_id FROM r JOIN q USING (source) "
        "WHERE rn <= quota ORDER BY source, doc_id"
    ),
    "customers_without_orders": (
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_custkey NOT IN ("
        "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')"
    ),
    "active_suppliers": (
        "SELECT s_suppkey, s_name FROM supplier "
        "WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)"
    ),
    "event_gaps": (
        "SELECT event_id, COALESCE(epoch_us(ts) - LAG(epoch_us(ts)) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id), -1) AS gap_us FROM events"
    ),
    "events_pivot": (
        "SELECT CAST(user_id % 20 AS BIGINT) AS cohort, "
        + ", ".join(
            f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_{t}"
            for t in EVENT_TYPES
        )
        + " FROM events GROUP BY 1"
    ),
    "events_unpivot": (
        "WITH wide AS (SELECT CAST(user_id % 20 AS BIGINT) AS cohort, "
        + ", ".join(
            f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_{t}"
            for t in EVENT_TYPES
        )
        + " FROM events GROUP BY 1) "
        + " UNION ALL ".join(
            f"SELECT cohort, 'n_{t}' AS kind, n_{t} AS n FROM wide"
            for t in EVENT_TYPES
        )
    ),
    "price_quantiles": (
        "SELECT l_returnflag, "
        + ", ".join(
            f"CAST(quantile_disc(CAST(ROUND(l_extendedprice * 100) AS BIGINT), "
            f"{q}) AS BIGINT) AS p{int(q * 100)}_cents"
            for q in QUANTILES
        )
        + " FROM lineitem GROUP BY l_returnflag"
    ),
    "revenue_cube": (
        "SELECT o_orderpriority, o_orderstatus, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
        " AS revenue_cents "
        "FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)"
    ),
    "revenue_share": (
        "SELECT o_orderpriority, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
        " AS revenue_cents, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / "
        "CAST(SUM(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))) OVER ()"
        " AS DOUBLE) AS share "
        "FROM orders GROUP BY o_orderpriority"
    ),
    "order_quartiles": (
        "SELECT o_orderkey, o_orderpriority, "
        f"CAST(NTILE({NTILE_K}) OVER (PARTITION BY o_orderpriority "
        "ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile "
        "FROM orders"
    ),
    "token_positions": (
        "SELECT doc_id, unnest(tl) AS token, "
        "CAST(unnest(range(1, len(tl)+1)) AS BIGINT) AS pos "
        "FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+')"
        f" AS tl FROM documents WHERE doc_id < {EXPLODE_DOC_CAP})"
    ),
    "doc_dense_rank": (
        "SELECT doc_id, source, CAST(DENSE_RANK() OVER ("
        "PARTITION BY source ORDER BY n_chars DESC) AS BIGINT) AS rank "
        "FROM documents"
    ),
    "doc_cume_dist": (
        "SELECT doc_id, source, CUME_DIST() OVER ("
        "PARTITION BY source ORDER BY n_chars) AS cd FROM documents"
    ),
    "doc_percent_rank": (
        "SELECT doc_id, source, PERCENT_RANK() OVER ("
        "PARTITION BY source ORDER BY n_chars) AS pr FROM documents"
    ),
    "tfidf_top_terms": (
        "WITH tok AS (SELECT source, unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9_]+')) AS token FROM documents), "
        "tf AS (SELECT source, token, COUNT(*) AS tf FROM tok GROUP BY source, token), "
        "df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token) "
        "SELECT source, token, tf, df, tfidf_micro FROM ("
        f"SELECT tf.source, tf.token, tf.tf, df.df, "
        f"CAST((tf.tf * {TFIDF_MICRO}) // df.df AS BIGINT) AS tfidf_micro, "
        f"ROW_NUMBER() OVER (PARTITION BY tf.source ORDER BY "
        f"(tf.tf * {TFIDF_MICRO}) // df.df DESC, tf.token) AS rn "
        "FROM tf JOIN df USING (token)) "
        f"WHERE rn <= {TFIDF_TOPK}"
    ),
    "repetition_signals": (
        "WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), "
        "'[a-z0-9_]+') AS tl FROM documents), "
        "base AS (SELECT doc_id, tl, CAST(COALESCE(list_sum("
        "list_transform(tl, t -> length(t))), 0) AS BIGINT) AS total FROM tok), "
        "g2 AS (SELECT doc_id, unnest(list_transform(range(1, len(tl)), "
        "i -> tl[i] || ' ' || tl[i+1])) AS gram FROM base WHERE len(tl) >= 2), "
        "c2 AS (SELECT doc_id, CAST(MAX(cnt * chars) AS BIGINT) AS num FROM ("
        "SELECT doc_id, COUNT(*) AS cnt, length(gram) - 1 AS chars "
        "FROM g2 GROUP BY doc_id, gram) GROUP BY doc_id), "
        "g3 AS (SELECT doc_id, unnest(list_transform(range(1, len(tl) - 1), "
        "i -> tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2])) AS gram "
        "FROM base WHERE len(tl) >= 3), "
        "c3 AS (SELECT doc_id, CAST(MAX(cnt * chars) AS BIGINT) AS num FROM ("
        "SELECT doc_id, COUNT(*) AS cnt, length(gram) - 2 AS chars "
        "FROM g3 GROUP BY doc_id, gram) GROUP BY doc_id), "
        "g5 AS (SELECT doc_id, unnest(list_transform(range(1, len(tl) - 3), "
        "i -> tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] || ' ' || tl[i+3] "
        "|| ' ' || tl[i+4])) AS gram FROM base WHERE len(tl) >= 5), "
        "c5 AS (SELECT doc_id, CAST(SUM(cnt * chars) AS BIGINT) AS num FROM ("
        "SELECT doc_id, COUNT(*) AS cnt, length(gram) - 4 AS chars "
        "FROM g5 GROUP BY doc_id, gram) WHERE cnt >= 2 GROUP BY doc_id) "
        "SELECT b.doc_id, "
        f"CASE WHEN b.total = 0 THEN 0 ELSE CAST(COALESCE(c2.num, 0) * {REP_MICRO} // b.total AS BIGINT) END AS top2_micro, "
        f"CASE WHEN b.total = 0 THEN 0 ELSE CAST(COALESCE(c3.num, 0) * {REP_MICRO} // b.total AS BIGINT) END AS top3_micro, "
        f"CASE WHEN b.total = 0 THEN 0 ELSE CAST(COALESCE(c5.num, 0) * {REP_MICRO} // b.total AS BIGINT) END AS dup5_micro "
        "FROM base b LEFT JOIN c2 USING (doc_id) "
        "LEFT JOIN c3 USING (doc_id) LEFT JOIN c5 USING (doc_id)"
    ),
    "decontaminate": (
        "WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), "
        "'[a-z0-9_]+') AS tl FROM documents), "
        f"g AS (SELECT doc_id, unnest(list_transform(range(1, len(tl) - {DECON_N - 2}), "
        "i -> "
        + " || ' ' || ".join(
            ("tl[i]" if j == 0 else f"tl[i+{j}]") for j in range(DECON_N)
        )
        + f")) AS gram FROM tok WHERE len(tl) >= {DECON_N}), "
        f"ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {DECON_EVAL_MOD} = 0), "
        f"dg AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % {DECON_EVAL_MOD} != 0) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared "
        "FROM dg JOIN ev USING (gram) GROUP BY doc_id"
    ),
    # unnest(range(...)) instead of LATERAL generate_series: this
    # DuckDB build rejects lateral column params in table functions, so
    # the offset list is a constant range filtered per row
    "duplicate_substrings": (
        "WITH idx AS (SELECT unnest(range(1, "
        f"(SELECT CAST(MAX(length(text)) AS BIGINT) FROM documents), {DUPSUB_STRIDE})) AS i), "
        f"g AS (SELECT doc_id, substr(text, CAST(i AS BIGINT), {DUPSUB_W}) AS w "
        f"FROM documents, idx WHERE i + {DUPSUB_W - 1} <= length(text)), "
        "d AS (SELECT w, doc_id, COUNT(*) AS occ FROM g GROUP BY w, doc_id) "
        "SELECT md5(w) AS w_hash, MIN(doc_id) AS first_doc_id, "
        "COUNT(*) AS n_docs, CAST(SUM(occ) AS BIGINT) AS n_occurrences "
        "FROM d GROUP BY w HAVING COUNT(*) >= 2"
    ),
    "doc_chunks": (
        "SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx, "
        f"CAST(length(substr(text, ci * {CHUNK_STRIDE} + 1, {CHUNK_LEN})) AS BIGINT) AS chunk_len, "
        f"substr(text, ci * {CHUNK_STRIDE} + 1, {CHUNK_LEN}) AS chunk_text "
        "FROM (SELECT doc_id, text, unnest(range(0, "
        f"(length(text) + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE})) AS ci "
        "FROM documents)"
    ),
    "epoch_shuffle": (
        "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY "
        f"md5(concat('{SHUFFLE_EPOCH}:', doc_id)), doc_id) AS BIGINT) AS pos "
        "FROM documents"
    ),
    "weighted_sample": (
        "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, priority "
        "FROM (SELECT doc_id, n_chars, "
        "CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) "
        "// GREATEST(CAST(n_chars AS BIGINT), 1) AS priority "
        "FROM documents) "
        f"ORDER BY priority, doc_id LIMIT {WSAMPLE_K}"
    ),
    "order_price_bands": (
        "SELECT b.label AS band, CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents "
        "FROM orders o JOIN (VALUES "
        + ", ".join(
            "('%s', %s, %s)" % (l, lo, "NULL" if hi is None else hi)
            for l, lo, hi in PRICE_BANDS
        )
        + ") b(label, lo, hi) ON o.o_totalprice >= b.lo "
        "AND (b.hi IS NULL OR o.o_totalprice < b.hi) GROUP BY b.label"
    ),
    "user_time_window_sum": (
        "SELECT event_id, CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER ("
        "PARTITION BY user_id ORDER BY ts "
        "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
        "AS BIGINT) AS window_cents FROM events"
    ),
    "rolling_value_sum": (
        "SELECT event_id, CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER ("
        "PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_cents "
        "FROM events"
    ),
    "nation_overlap": (
        "SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer "
        "INTERSECT "
        "SELECT CAST(s_nationkey AS BIGINT) FROM supplier"
    ),
    "source_doc_list": (
        "SELECT source, string_agg(CAST(doc_id AS VARCHAR), ','"
        " ORDER BY doc_id) AS doc_list, "
        "CAST(COUNT(*) AS BIGINT) AS n_docs "
        f"FROM documents WHERE doc_id < {STRAGG_DOC_CAP} GROUP BY source"
    ),
    "skew_join_docs": (
        "SELECT d.doc_id, d.lang, s.lang_docs FROM documents d JOIN ("
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS lang_docs FROM documents"
        " GROUP BY lang) s USING (lang)"
    ),
    "revenue_rollup": (
        "SELECT o_orderpriority, o_orderstatus, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
        " AS revenue_cents "
        "FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)"
    ),
    "group_topk": (
        "SELECT doc_id, source, n_chars FROM ("
        "SELECT doc_id, source, n_chars, ROW_NUMBER() OVER ("
        "PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn FROM documents"
        f") WHERE rn <= {GROUP_TOPK}"
    ),
    "sessionize": (
        "WITH lagged AS (SELECT user_id, ts, "
        "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts "
        "FROM events) "
        "SELECT user_id, COUNT(*) AS n_events, "
        "CAST(SUM(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 1800 SECOND "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions FROM lagged GROUP BY user_id"
    ),
    "user_event_deltas": (
        "SELECT event_id, user_id, "
        "COALESCE(value - LAG(value) OVER w, 0.0) AS value_delta, "
        "value - FIRST_VALUE(value) OVER w AS value_vs_first "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
    ),
    "user_rolling_avg": (
        "SELECT event_id, user_id, "
        "ROUND(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w * 1.0 / "
        "COUNT(*) OVER w, 6) AS avg4_cents FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
    ),
    "funnel_steps": (
        "WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events "
        "WHERE event_type='view' GROUP BY user_id), "
        "s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e "
        "JOIN s1 ON e.user_id = s1.user_id "
        "WHERE e.event_type='click' AND e.ts > s1.t1 GROUP BY e.user_id), "
        "s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e "
        "JOIN s2 ON e.user_id = s2.user_id "
        "WHERE e.event_type='purchase' AND e.ts > s2.t2 GROUP BY e.user_id) "
        "SELECT * FROM ("
        "SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type, "
        "(SELECT count(*) FROM s1) AS n_users "
        "UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2) "
        "UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)"
        ") ORDER BY step"
    ),
    "cohort_retention": (
        "WITH fw AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week "
        "FROM events GROUP BY user_id), "
        "aw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week "
        "FROM events) "
        "SELECT f.cohort_week, a.week, count(*) AS n_users "
        "FROM fw f JOIN aw a ON f.user_id = a.user_id "
        "GROUP BY f.cohort_week, a.week ORDER BY f.cohort_week, a.week"
    ),
    "median_order_value": (
        "SELECT o_orderpriority, "
        "median(CAST(ROUND(o_totalprice*100) AS BIGINT)) / 100.0 "
        "AS median_price FROM orders GROUP BY o_orderpriority "
        "ORDER BY o_orderpriority"
    ),
    "distinct_sources": "SELECT DISTINCT source FROM documents ORDER BY source",
    "source_profile": (
        "SELECT source, COUNT(DISTINCT lang) AS n_langs, "
        "quantile_disc(n_chars, 0.5) AS median_chars FROM documents GROUP BY source"
    ),
    "recent_lineitems": (
        "SELECT o.o_orderpriority AS priority, COUNT(*) AS n_recent "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY "
        "GROUP BY o.o_orderpriority"
    ),
    "salted_hot_key_agg": (
        "SELECT source, COUNT(*) AS n_docs, "
        "CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM documents GROUP BY source"
    ),
    "packet_projection": (
        "SELECT doc_id, CASE WHEN length(text) > 500 THEN substr(text, 1, 500) || '...' "
        "ELSE text END AS extractedText, 'webpage_text' AS contentType FROM documents"
    ),
    "ann_topk": (
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings "
        f"WHERE vec_id = {ANN_QUERY_ID}), "
        "s AS (SELECT e.vec_id, list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
        "(SELECT qe FROM q)) AS sim FROM embeddings e "
        f"WHERE e.vec_id <> {ANN_QUERY_ID}) "
        "SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank "
        f"FROM s ORDER BY sim DESC, vec_id LIMIT {ANN_K}"
    ),
    "knn_join": (
        "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe "
        f"FROM embeddings WHERE vec_id < {KNN_JOIN_NQ}), "
        "s AS (SELECT q.query_id, e.vec_id, list_cosine_similarity("
        "CAST(e.embedding AS DOUBLE[]), q.qe) AS sim "
        "FROM embeddings e, q WHERE e.vec_id <> q.query_id) "
        "SELECT query_id, vec_id, rank FROM ("
        "SELECT query_id, vec_id, CAST(ROW_NUMBER() OVER ("
        "PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank FROM s"
        f") WHERE rank <= {KNN_JOIN_K}"
    ),
    "ngram_jaccard_near_dups": (
        "WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), "
        "'[a-z0-9_]+') AS w FROM documents), "
        "pos AS (SELECT doc_id, w, unnest(range(1, greatest(len(w) - "
        f"{NGRAM_JACCARD_N - 2}, 1))) AS i FROM toks), "
        "grams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+"
        f"{NGRAM_JACCARD_N - 1}], ' ') AS gram FROM pos), "
        "kept AS (SELECT gram FROM grams GROUP BY gram "
        f"HAVING count(*) <= {NGRAM_JACCARD_MAX_DF}), "
        "fg AS (SELECT g.doc_id, g.gram FROM grams g JOIN kept USING (gram)), "
        "cnt AS (SELECT doc_id, count(*) AS ng FROM fg GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "count(*) AS n_shared FROM fg a JOIN fg b USING (gram) "
        "WHERE a.doc_id < b.doc_id GROUP BY 1, 2) "
        "SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared "
        "FROM inter JOIN cnt ca ON ca.doc_id = id_a "
        "JOIN cnt cb ON cb.doc_id = id_b "
        f"WHERE {NGRAM_JACCARD_DEN} * n_shared >= {NGRAM_JACCARD_NUM} * "
        "(ca.ng + cb.ng - n_shared) ORDER BY id_a, id_b"
    ),
    "embedding_near_dups": (
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM embeddings a, embeddings b "
        "WHERE a.vec_id < b.vec_id AND list_cosine_similarity("
        "CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= "
        f"{DUP_COSINE_THRESHOLD} ORDER BY id_a, id_b"
    ),
    "returned_revenue": (
        "WITH rev AS (SELECT o.o_custkey AS custkey, "
        "CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT) * "
        "(100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) AS BIGINT)"
        " AS revenue_milli "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE l.l_returnflag = 'R' "
        f"AND o.o_orderdate >= TIMESTAMP '{RET_DATE_LO}' "
        f"AND o.o_orderdate < TIMESTAMP '{RET_DATE_HI}' "
        "GROUP BY o.o_custkey "
        f"ORDER BY revenue_milli DESC, custkey LIMIT {RET_TOPK}) "
        "SELECT r.custkey, c.c_name, r.revenue_milli, "
        "CAST(ROUND(c.c_acctbal*100) AS BIGINT) AS acctbal_cents, n.n_name "
        "FROM rev r JOIN customer c ON c.c_custkey = r.custkey "
        "JOIN nation n ON n.n_nationkey = c.c_nationkey"
    ),
    "promo_revenue": (
        "WITH li AS (SELECT l_partkey, "
        "CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT) AS ship_month, "
        "CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
        "(100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS milli "
        "FROM lineitem "
        f"WHERE l_shipdate >= TIMESTAMP '{PROMO_YEAR}-01-01' "
        f"AND l_shipdate < TIMESTAMP '{PROMO_YEAR + 1}-01-01') "
        "SELECT li.ship_month, "
        "CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN li.milli ELSE 0 END)"
        " AS BIGINT) AS promo_milli, "
        "CAST(SUM(li.milli) AS BIGINT) AS total_milli, "
        "CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN li.milli ELSE 0 END)"
        " AS DOUBLE) / CAST(SUM(li.milli) AS DOUBLE) AS promo_share "
        "FROM li JOIN part p ON p.p_partkey = li.l_partkey "
        "GROUP BY li.ship_month"
    ),
    "shipping_volume": (
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(year(l.l_shipdate) AS BIGINT) AS l_year, "
        "CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT) * "
        "(100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) AS BIGINT)"
        " AS revenue_milli "
        "FROM lineitem l "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        "JOIN nation n1 ON n1.n_nationkey = s.s_nationkey "
        "JOIN nation n2 ON n2.n_nationkey = c.c_nationkey "
        f"WHERE ((n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}') "
        f"OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}')) "
        f"AND l.l_shipdate >= TIMESTAMP '{Q7_SHIP_LO}' "
        f"AND l.l_shipdate < TIMESTAMP '{Q7_SHIP_HI}' "
        "GROUP BY 1, 2, 3"
    ),
    "customer_order_counts": (
        "WITH oc AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM orders GROUP BY o_custkey), "
        "j AS (SELECT c.c_custkey, COALESCE(oc.n, 0) AS c_count "
        "FROM customer c LEFT JOIN oc ON c.c_custkey = oc.o_custkey) "
        "SELECT CAST(c_count AS BIGINT) AS c_count, "
        "CAST(COUNT(*) AS BIGINT) AS custdist FROM j GROUP BY c_count"
    ),
    "idle_rich_customers": (
        "WITH sel AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT)"
        " AS cntrycode, "
        "CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_cents FROM customer "
        f"WHERE c_nationkey IN {Q22_NATIONS}), "
        "a AS (SELECT CAST(SUM(bal_cents) AS DOUBLE) / COUNT(*) AS avg_bal "
        "FROM sel WHERE bal_cents > 0) "
        "SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust, "
        "CAST(SUM(bal_cents) AS BIGINT) AS totacctbal_cents "
        "FROM sel, a WHERE bal_cents > avg_bal "
        "AND NOT EXISTS (SELECT 1 FROM orders o"
        " WHERE o.o_custkey = sel.c_custkey"
        f" AND o.o_orderdate >= TIMESTAMP '{Q22_SINCE}') "
        "GROUP BY cntrycode"
    ),
    "top_supplier": (
        "WITH r AS (SELECT l_suppkey AS suppkey, "
        "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
        "(100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)"
        " AS revenue_milli "
        "FROM lineitem "
        f"WHERE l_shipdate >= TIMESTAMP '{Q15_DATE_LO}' "
        f"AND l_shipdate < TIMESTAMP '{Q15_DATE_HI}' "
        "GROUP BY l_suppkey) "
        "SELECT r.suppkey, s.s_name, r.revenue_milli "
        "FROM r JOIN supplier s ON s.s_suppkey = r.suppkey "
        "WHERE r.revenue_milli = (SELECT MAX(revenue_milli) FROM r)"
    ),
    "brand_tier_revenue": (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_items, "
        "CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT) * "
        "(100 - CAST(ROUND(l.l_discount*100) AS BIGINT))), 0) AS BIGINT)"
        " AS revenue_milli "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE "
        + " OR ".join(
            f"(p.p_brand = '{b}' AND p.p_size BETWEEN {slo} AND {shi} "
            f"AND CAST(ROUND(l.l_quantity) AS BIGINT) BETWEEN {qlo} AND {qhi})"
            for b, slo, shi, qlo, qhi in Q19_TIERS
        )
    ),
    "shipping_priority": (
        "SELECT l_orderkey, revenue_milli, odate_day, o_orderpriority FROM ("
        "SELECT l.l_orderkey, "
        "CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT) * "
        "(100 - CAST(ROUND(l.l_discount*100) AS BIGINT))) AS BIGINT)"
        " AS revenue_milli, "
        "CAST(DATEDIFF('day', DATE '1970-01-01',"
        " CAST(o.o_orderdate AS DATE)) AS BIGINT) AS odate_day, "
        "o.o_orderpriority "
        "FROM lineitem l "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        f"WHERE c.c_mktsegment = '{Q3_SEGMENT}' "
        f"AND o.o_orderdate < TIMESTAMP '{Q3_DATE}' "
        f"AND l.l_shipdate > TIMESTAMP '{Q3_DATE}' "
        "GROUP BY 1, 3, 4) "
        f"ORDER BY revenue_milli DESC, l_orderkey LIMIT {Q3_TOPK}"
    ),
    "forecast_revenue": (
        "SELECT CAST(COALESCE(SUM("
        "CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
        "CAST(ROUND(l_discount*100) AS BIGINT)), 0) AS BIGINT)"
        " AS forecast_milli, "
        "CAST(COUNT(*) AS BIGINT) AS n_items "
        "FROM lineitem "
        f"WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR_LO}' "
        f"AND l_shipdate < TIMESTAMP '{Q6_YEAR_HI}' "
        f"AND CAST(ROUND(l_discount*100) AS BIGINT) IN {Q6_DISC_CENTS} "
        f"AND l_quantity < {Q6_MAX_QTY}"
    ),
    "small_qty_revenue": (
        "WITH li AS (SELECT l_partkey, "
        "CAST(ROUND(l_quantity) AS BIGINT) AS qty, "
        "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents FROM lineitem "
        "WHERE l_partkey IN "
        f"(SELECT p_partkey FROM part WHERE p_brand = '{Q17_BRAND}')), "
        "g AS (SELECT l_partkey, COUNT(*) AS cnt, SUM(qty) AS totq "
        "FROM li GROUP BY l_partkey) "
        "SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS total_cents, "
        "CAST(COUNT(*) AS BIGINT) AS n_small, "
        "CAST(COALESCE(SUM(cents), 0) AS DOUBLE) / 7.0 AS avg_yearly_cents "
        "FROM li JOIN g ON g.l_partkey = li.l_partkey "
        "WHERE 5 * li.qty * g.cnt < g.totq"
    ),
    "waiting_suppliers": (
        "WITH j AS (SELECT l.l_orderkey, CAST(l.l_suppkey AS BIGINT)"
        " AS suppkey, "
        "CASE WHEN DATEDIFF('day', CAST(o.o_orderdate AS DATE), "
        f"CAST(l.l_shipdate AS DATE)) > {Q21_LATE_DAYS} THEN 1 ELSE 0 END"
        " AS late "
        "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "WHERE o.o_orderstatus = 'F'), "
        "g AS (SELECT l_orderkey, COUNT(DISTINCT suppkey) AS ns, "
        "COUNT(DISTINCT CASE WHEN late = 1 THEN suppkey END) AS nl "
        "FROM j GROUP BY l_orderkey), "
        "w AS (SELECT DISTINCT j.l_orderkey, j.suppkey FROM j "
        "JOIN g ON g.l_orderkey = j.l_orderkey "
        "WHERE j.late = 1 AND g.ns >= 2 AND g.nl = 1), "
        "t AS (SELECT suppkey, CAST(COUNT(*) AS BIGINT) AS numwait "
        "FROM w GROUP BY suppkey "
        f"ORDER BY numwait DESC, suppkey LIMIT {Q21_TOPK}) "
        "SELECT t.suppkey, s.s_name, t.numwait FROM t "
        "JOIN supplier s ON s.s_suppkey = t.suppkey"
    ),
    "nation_market_share": (
        "WITH m AS (SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year, "
        "CAST(ROUND(l.l_extendedprice*100) AS BIGINT) * "
        "(100 - CAST(ROUND(l.l_discount*100) AS BIGINT)) AS rev_milli, "
        f"CASE WHEN s.s_nationkey = {Q8_NATION} THEN 1 ELSE 0 END"
        " AS is_target "
        "FROM lineitem l "
        "JOIN orders o ON o.o_orderkey = l.l_orderkey "
        "JOIN customer c ON c.c_custkey = o.o_custkey "
        "JOIN nation n ON n.n_nationkey = c.c_nationkey "
        "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
        "WHERE l.l_partkey IN "
        f"(SELECT p_partkey FROM part WHERE p_type = '{Q8_TYPE}') "
        f"AND n.n_regionkey = {Q8_REGION} "
        f"AND o.o_orderdate >= TIMESTAMP '{Q8_DATE_LO}' "
        f"AND o.o_orderdate < TIMESTAMP '{Q8_DATE_HI}') "
        "SELECT o_year, CAST(SUM(rev_milli) AS BIGINT) AS total_milli, "
        "CAST(SUM(rev_milli * is_target) AS BIGINT) AS nation_milli, "
        "CAST(SUM(rev_milli * is_target) AS DOUBLE) / "
        "CAST(SUM(rev_milli) AS DOUBLE) AS mkt_share "
        "FROM m GROUP BY o_year"
    ),
}

QUERIES = {
    "kb_pattern_aggregate": q_kb_pattern_aggregate,
    "exact_dedup_first": q_exact_dedup_first,
    "token_counts": q_token_counts,
    "doc_quality": q_doc_quality,
    "quality_signals": q_quality_signals,
    "lang_distribution": q_lang_distribution,
    "events_hourly": q_events_hourly,
    "sliding_window": q_sliding_window,
    "nation_order_stats": q_nation_order_stats,
    "order_lineitem_join": q_order_lineitem_join,
    "orders_with_late_items": q_orders_with_late_items,
    "cumulative_revenue": q_cumulative_revenue,
    "native_join": q_native_join,
    "asof_prior_view": q_asof_prior_view,
    "lineitem_agg": q_lineitem_agg,
    "lineitem_corr": q_lineitem_corr,
    "top_docs_by_tokens": q_top_docs_by_tokens,
    "group_topk": q_group_topk,
    "text_normalize": q_text_normalize,
    "deterministic_sample": q_deterministic_sample,
    "mask_entities": q_mask_entities,
    "vocab_topk": q_vocab_topk,
    "bigram_topk": q_bigram_topk,
    "stratified_sample": q_stratified_sample,
    "source_mixture": q_source_mixture,
    "customers_without_orders": q_customers_without_orders,
    "active_suppliers": q_active_suppliers,
    "customer_urgent_left_join": q_customer_urgent_left_join,
    "order_priority_full_join": q_order_priority_full_join,
    "latest_order_per_customer": q_latest_order_per_customer,
    "event_gaps": q_event_gaps,
    "events_pivot": q_events_pivot,
    "events_unpivot": q_events_unpivot,
    "price_quantiles": q_price_quantiles,
    "revenue_rollup": q_revenue_rollup,
    "revenue_cube": q_revenue_cube,
    "revenue_share": q_revenue_share,
    "order_quartiles": q_order_quartiles,
    "token_positions": q_token_positions,
    "source_doc_list": q_source_doc_list,
    "doc_dense_rank": q_doc_dense_rank,
    "rolling_value_sum": q_rolling_value_sum,
    "user_time_window_sum": q_user_time_window_sum,
    "nation_overlap": q_nation_overlap,
    "skew_join_docs": q_skew_join_docs,
    "sessionize": q_sessionize,
    "user_event_deltas": q_user_event_deltas,
    "user_rolling_avg": q_user_rolling_avg,
    "funnel_steps": q_funnel_steps,
    "cohort_retention": q_cohort_retention,
    "median_order_value": q_median_order_value,
    "distinct_sources": q_distinct_sources,
    "packet_projection": q_packet_projection,
    "ann_topk": q_ann_topk,
    "knn_join": q_knn_join,
    "embedding_near_dups": q_embedding_near_dups,
    "ngram_jaccard_near_dups": q_ngram_jaccard_near_dups,
    "link_relevance": q_link_relevance,
    "url_validity": q_url_validity,
    "site_identifier": q_site_identifier,
    "packet_full": q_packet_full,
    "source_profile": q_source_profile,
    "recent_lineitems": q_recent_lineitems,
    "salted_hot_key_agg": q_salted_hot_key_agg,
    "doc_cume_dist": q_doc_cume_dist,
    "doc_percent_rank": q_doc_percent_rank,
    "tfidf_top_terms": q_tfidf_top_terms,
    "repetition_signals": q_repetition_signals,
    "order_price_bands": q_order_price_bands,
    "weighted_sample": q_weighted_sample,
    "doc_chunks": q_doc_chunks,
    "epoch_shuffle": q_epoch_shuffle,
    "decontaminate": q_decontaminate,
    "duplicate_substrings": q_duplicate_substrings,
    "local_supplier_volume": q_local_supplier_volume,
    "large_volume_customers": q_large_volume_customers,
    "market_basket_pairs": q_market_basket_pairs,
    "user_top_event": q_user_top_event,
    "posting_lists": q_posting_lists,
    "parts_above_brand_avg": q_parts_above_brand_avg,
    "daily_active_users": q_daily_active_users,
    "new_vs_returning": q_new_vs_returning,
    "event_transitions": q_event_transitions,
    "distinct_parts_per_supplier": q_distinct_parts_per_supplier,
    "orders_above_customer_avg": q_orders_above_customer_avg,
    "parts_in_all_regions": q_parts_in_all_regions,
    "user_longest_streak": q_user_longest_streak,
    "monthly_revenue_growth": q_monthly_revenue_growth,
    "events_heatmap": q_events_heatmap,
    "props_value_stats": q_props_value_stats,
    "dup_paragraph_ratio": q_dup_paragraph_ratio,
    "paragraph_dedup": q_paragraph_dedup,
    "returned_revenue": q_returned_revenue,
    "promo_revenue": q_promo_revenue,
    "shipping_volume": q_shipping_volume,
    "customer_order_counts": q_customer_order_counts,
    "idle_rich_customers": q_idle_rich_customers,
    "top_supplier": q_top_supplier,
    "brand_tier_revenue": q_brand_tier_revenue,
    "shipping_priority": q_shipping_priority,
    "forecast_revenue": q_forecast_revenue,
    "small_qty_revenue": q_small_qty_revenue,
    "waiting_suppliers": q_waiting_suppliers,
    "nation_market_share": q_nation_market_share,
    # non-SQL-expressible (driver records rows-only checks)
    "cdc_dup_chunks": q_cdc_dup_chunks,
    "d4_diverse_sample": q_d4_diverse_sample,
    "d4_pipeline": q_d4_pipeline,
    "compression_ratio": q_compression_ratio,
    "semantic_dedup": q_semantic_dedup,
    "dsir_select": q_dsir_select,
    "kmeans_clusters": q_kmeans_clusters,
    "bigram_lm_score": q_bigram_lm_score,
    "training_pipeline": q_training_pipeline,
    "dedup_clusters": q_dedup_clusters,
    "ann_ivf_topk": q_ann_ivf_topk,
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_blocks": q_simhash_blocks,
    "simhash_near_dups": q_simhash_near_dups,
    "doc_fingerprints": q_doc_fingerprints,
    "fingerprint_near_dups": q_fingerprint_near_dups,
    "language_id": q_language_id,
    "media_features": q_media_features,
    "approx_distinct": q_approx_distinct,
    "approx_value_quantiles": q_approx_value_quantiles,
    "heavy_hitter_tokens": q_heavy_hitter_tokens,
    "pack_sequences": q_pack_sequences,
    "quantized_embeddings": q_quantized_embeddings,
    "interleaved_spans": q_interleaved_spans,
    "link_pagerank": q_link_pagerank,
    "link_triangles": q_link_triangles,
    "link_components": q_link_components,
    "link_distances": q_link_distances,
    "cm_token_freqs": q_cm_token_freqs,
}
