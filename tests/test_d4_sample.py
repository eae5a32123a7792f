"""Ground truth for the D4-style cluster-diverse sampler: the engine's
per-cluster quota selection must equal a single-process recompute with
the SAME clustering (naive Lloyd's, identical bottom-k init — the
equivalence kmeans_full's own ground-truth test already pins) and the
same md5(vec_id) selection order; density flattening must hold (a
dense blob does not crowd out a sparse one)."""

import hashlib

import numpy as np
import pandas as pd


def _naive_kmeans(vecs, ids, k, iters):
    order = np.argsort(ids)[:k]
    cents = vecs[order].astype(np.float64).copy()
    for _ in range(iters):
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                cents[c] = vecs[m].mean(axis=0)
    d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1)


def test_d4_sample_vs_single_process(ray_session, tmp_path):
    from crawler_ray.pipelines.queries import (
        D4_QUOTA,
        KMEANS_ITERS,
        KMEANS_K,
        q_d4_diverse_sample,
    )

    rng = np.random.RandomState(42)
    # dense blob (400 vecs) + sparse shells (100 vecs spread out):
    # proportional sampling would give the blob 80% of the sample;
    # the D4 quota caps every cluster at D4_QUOTA
    dense = rng.normal(0, 0.05, size=(400, 8)) + 5.0
    sparse = rng.normal(0, 3.0, size=(100, 8)) - 5.0
    vecs = np.vstack([dense, sparse]).astype(np.float32)
    ids = np.arange(len(vecs), dtype=np.int64)
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    pdf.to_parquet(tmp_path / "embeddings.parquet")

    got = (
        q_d4_diverse_sample(str(tmp_path))
        .to_pandas()
        .sort_values(["cluster", "vec_id"])
        .reset_index(drop=True)
    )

    assign = _naive_kmeans(vecs.astype(np.float64), ids, KMEANS_K, KMEANS_ITERS)
    truth = set()
    df = pd.DataFrame(
        {
            "vec_id": ids,
            "cluster": assign,
            "h": [hashlib.md5(str(int(v)).encode()).hexdigest() for v in ids],
        }
    )
    for c, g in df.groupby("cluster"):
        truth |= set(g.sort_values(["h", "vec_id"]).head(D4_QUOTA)["vec_id"])

    assert set(got["vec_id"].astype(int)) == truth
    # quota respected per cluster
    per = got.groupby("cluster").size()
    assert (per <= D4_QUOTA).all()
    # density flattening: the sparse side contributes ≥ one full-quota
    # cluster's worth despite being 20% of the corpus
    n_sparse = int((got["vec_id"] >= 400).sum())
    assert n_sparse >= D4_QUOTA


def test_d4_pipeline_composes_dedup_then_quota(ray_session, tmp_path):
    """The full D4 pipeline equals: SemDeDup survivors (the engine's
    own oracle-tested q_semantic_dedup output) → per-cluster quota in
    md5 order — i.e. a dropped near-duplicate can never appear in the
    sample, and the sample equals the quota-take recomputed
    single-process over exactly the survivor set."""
    import hashlib

    from crawler_ray.pipelines.queries import (
        D4_QUOTA,
        q_d4_pipeline,
        q_semantic_dedup,
    )

    rng = np.random.RandomState(5)
    base = rng.normal(0, 1, size=(60, 8))
    # 30 near-duplicates of the first 30 vectors (tiny perturbation →
    # cosine ≈ 1 within a cluster) + 10 lone outliers
    vecs = np.vstack(
        [base, base[:30] + rng.normal(0, 1e-4, size=(30, 8))]
    ).astype(np.float32)
    ids = np.arange(len(vecs), dtype=np.int64)
    pdf = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    pdf.to_parquet(tmp_path / "embeddings.parquet")

    dedup = q_semantic_dedup(str(tmp_path))
    survivors = dedup[dedup["kept"]]
    assert len(survivors) < len(pdf), "fixture must actually dedup"

    truth = set()
    sv = survivors.assign(
        h=[hashlib.md5(str(int(v)).encode()).hexdigest() for v in survivors["vec_id"]]
    )
    for _, g in sv.groupby("cluster"):
        truth |= set(g.sort_values(["h", "vec_id"]).head(D4_QUOTA)["vec_id"])

    got = q_d4_pipeline(str(tmp_path)).to_pandas()
    assert set(got["vec_id"].astype(int)) == truth
    dropped = set(dedup[~dedup["kept"]]["vec_id"])
    assert not (set(got["vec_id"].astype(int)) & dropped)
