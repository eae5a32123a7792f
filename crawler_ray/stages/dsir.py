"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
NeurIPS, public: arXiv:2302.03169).

Selects raw-corpus documents whose hashed-n-gram feature distribution
best matches a small TARGET corpus: learn bag-of-n-grams bucket
distributions p (target) and q (raw), weight every raw doc by its log
importance ratio sum(log p/q over its n-gram buckets), then sample
without replacement via Gumbel-top-k.  The reference engine
(eyjs/crawler) has only heuristic quality scores (`textops.py:108`) —
this is the published importance-resampling upgrade a training-data
pipeline uses for domain-targeted selection.

Scale contract (the part that matters at 100 TB):
- driver state is TWO ``n_buckets``-long int64 histograms (default
  1024 buckets ≈ 16 KiB) — never token- or doc-cardinality;
- the learned log-weight vector is broadcast ONCE via ``ray.put``;
- scoring is a pure map over batches;
- top-k is per-block partial heads merged driver-side (≤ k rows per
  block reach the driver, k itself bounded by the caller).

Determinism: bucket hashing is md5-based (stable across processes —
Python's ``hash()`` is salted) and the Gumbel keys derive from
md5(doc_id), so the same corpus always yields the same selection
(the paper samples with fresh randomness; a reproducible pipeline
needs replayable noise, same policy as q_deterministic_sample).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

_TOKEN = re.compile(r"[a-z0-9가-힣]+")


def _bucket_of(ngram: str, n_buckets: int) -> int:
    return int.from_bytes(
        hashlib.md5(ngram.encode("utf-8")).digest()[:8], "big"
    ) % n_buckets


def _doc_buckets(text: str, n_buckets: int, cache: dict) -> np.ndarray:
    """Unigram + bigram hashed-feature buckets of one document
    (the paper's hashed n-gram featurization, n ∈ {1, 2})."""
    toks = _TOKEN.findall((text or "").lower())
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out = np.empty(len(grams), dtype=np.int64)
    for i, g in enumerate(grams):
        b = cache.get(g)
        if b is None:
            b = _bucket_of(g, n_buckets)
            cache[g] = b
        out[i] = b
    return out


def _gumbel_key(doc_id: int) -> float:
    """Deterministic Gumbel(0,1) noise from md5(doc_id): u ∈ (0,1)
    from the top 53 bits, g = -log(-log u)."""
    h = int.from_bytes(
        hashlib.md5(f"dsir:{doc_id}".encode()).digest()[:8], "big"
    )
    u = (h >> 11) / float(1 << 53)
    u = min(max(u, 1e-12), 1.0 - 1e-12)
    return float(-np.log(-np.log(u)))


def dsir_select(
    ds: Dataset,
    *,
    target_source: str,
    k: int = 50,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> pd.DataFrame:
    """Gumbel-top-k DSIR selection of raw docs (source != target)
    toward the hashed-n-gram distribution of the target docs.

    Returns a k-row pandas frame (id, source, logw, gumbel_logw) —
    bounded by k, which is why a driver-side return is acceptable
    here; the scoring itself never leaves the cluster.
    """

    def hist_partial(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        tgt = np.zeros(n_buckets, dtype=np.int64)
        raw = np.zeros(n_buckets, dtype=np.int64)
        srcs = batch[source_col].to_pylist()
        for text, src in zip(batch[text_col].to_pylist(), srcs):
            b = _doc_buckets(text, n_buckets, cache)
            np.add.at(tgt if src == target_source else raw, b, 1)
        return pa.table(
            {
                "bucket": pa.array(np.arange(n_buckets), type=pa.int64()),
                "n_tgt": pa.array(tgt),
                "n_raw": pa.array(raw),
            }
        )

    from ray.data.aggregate import Sum

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_tgt", alias_name="n_tgt"), Sum("n_raw", alias_name="n_raw"))
        .to_pandas()  # ≤ n_buckets rows by construction
        .sort_values("bucket")
    )
    tgt = np.zeros(n_buckets, dtype=np.int64)
    raw = np.zeros(n_buckets, dtype=np.int64)
    tgt[hist["bucket"].to_numpy()] = hist["n_tgt"].to_numpy()
    raw[hist["bucket"].to_numpy()] = hist["n_raw"].to_numpy()
    # add-one smoothing (the paper's bag-of-ngrams models are
    # smoothed the same way), then per-bucket log importance ratio
    p = (tgt + 1.0) / (tgt.sum() + n_buckets)
    q = (raw + 1.0) / (raw.sum() + n_buckets)
    logw_ref = ray.put(np.log(p) - np.log(q))

    def score_partial(batch: pa.Table) -> pa.Table:
        logw = ray.get(logw_ref)
        cache: dict = {}
        ids, srcs, texts = (
            batch[id_col].to_pylist(),
            batch[source_col].to_pylist(),
            batch[text_col].to_pylist(),
        )
        rows = {"id": [], "source": [], "logw": [], "gumbel_logw": []}
        for did, src, text in zip(ids, srcs, texts):
            if src == target_source:
                continue  # selection runs over the RAW corpus only
            b = _doc_buckets(text, n_buckets, cache)
            # mean (not sum) log ratio: length-normalized, like the
            # paper's per-example importance weight over its features
            lw = float(logw[b].mean()) if len(b) else float(logw.mean())
            rows["id"].append(did)
            rows["source"].append(src)
            rows["logw"].append(lw)
            rows["gumbel_logw"].append(lw + _gumbel_key(did))
        df = pd.DataFrame(rows)
        # per-block partial head: only ≤ k candidate rows leave a block
        df = df.sort_values(
            ["gumbel_logw", "id"], ascending=[False, True]
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema(
                [
                    ("id", pa.int64()),
                    ("source", pa.string()),
                    ("logw", pa.float64()),
                    ("gumbel_logw", pa.float64()),
                ]
            )
        )

    cand = ds.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    # driver merge of the partial heads: ≤ k × n_blocks rows
    return (
        cand.sort_values(["gumbel_logw", "id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
