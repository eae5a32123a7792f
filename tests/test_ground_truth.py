"""Brute-force ground-truth checks for the rows-only queries.

The driver's CORRECTNESS gate marks these queries ``no_oracle`` (no
DuckDB-expressible equivalent), so each gets an exhaustive small-N
ground truth computed here instead: exact all-pairs Jaccard / hamming /
cosine on sf0.001, driver-side union-find for clustering, the stored
``lang`` labels for language-ID.  "rows-only" thus means "verified,
just not SQL-verified" — VERDICT r2 item 2.
"""

import itertools

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def doc_texts():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


@pytest.fixture(scope="module")
def true_jaccard_pairs(doc_texts):
    """Exact all-pairs 3-shingle Jaccard ≥ 0.6 over all 500 docs."""
    from crawler_ray.functions.hashing import jaccard, shingle_hashes

    ids = sorted(doc_texts)
    sh = {i: shingle_hashes(doc_texts[i] or "", n=3) for i in ids}
    out = {}
    for a, b in itertools.combinations(ids, 2):
        ja = jaccard(sh[a], sh[b])
        if ja >= 0.6:
            out[(a, b)] = ja
    return out


def test_minhash_near_dups_ground_truth(ray_session, true_jaccard_pairs):
    """Engine pairs vs exhaustive truth: the verify stage is EXACT
    (precision 1.0 and bit-equal jaccard values); LSH recall at
    64 perms × 16 bands on j≈0.95 dup pairs is ~1.0 — assert ≥ 0.9 so
    an LSH regression (bad banding, dropped buckets) fails loudly."""
    from crawler_ray.pipelines.queries import q_minhash_near_dups

    got = q_minhash_near_dups(SF)
    engine = {
        (int(r.id_a), int(r.id_b)): r.jaccard for r in got.itertuples(index=False)
    }
    # precision: every emitted pair is a true pair with the exact value
    for p, ja in engine.items():
        assert p in true_jaccard_pairs, f"false positive {p}"
        assert ja == pytest.approx(true_jaccard_pairs[p], abs=1e-12)
    # recall
    assert true_jaccard_pairs, "fixture must contain true pairs"
    recall = len(engine) / len(true_jaccard_pairs)
    assert recall >= 0.9, f"LSH recall {recall:.2f} < 0.9"


def test_dedup_clusters_ground_truth(ray_session, true_jaccard_pairs):
    """Distributed connected components vs a driver-side union-find over
    the same exhaustive pair set (identical when LSH recall is 1.0 —
    asserted via the cluster multiset to stay robust to a single missed
    pair)."""
    from crawler_ray.pipelines.queries import q_dedup_clusters, q_minhash_near_dups

    # union-find over the pairs the ENGINE verified (tests the CC
    # operator exactly, independent of LSH recall) ...
    engine_pairs = [
        (int(r.id_a), int(r.id_b))
        for r in q_minhash_near_dups(SF).itertuples(index=False)
    ]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in engine_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth: dict[int, list[int]] = {}
    for n in parent:
        truth.setdefault(find(n), []).append(n)

    got = q_dedup_clusters(SF)
    engine_clusters = dict(zip(got["component"].astype(int), got["n_docs"].astype(int)))
    assert engine_clusters == {c: len(m) for c, m in truth.items()}
    # ... and vs the EXHAUSTIVE truth (catches LSH misses too, as long
    # as recall is 1.0 at this SF — which it is for j≈0.95 dups)
    tparent: dict[int, int] = {}

    def tfind(x):
        tparent.setdefault(x, x)
        while tparent[x] != x:
            tparent[x] = tparent[tparent[x]]
            x = tparent[x]
        return x

    for a, b in true_jaccard_pairs:
        ra, rb = tfind(a), tfind(b)
        if ra != rb:
            tparent[max(ra, rb)] = min(ra, rb)
    tclusters: dict[int, int] = {}
    for n in tparent:
        tclusters.setdefault(tfind(n), 0)
        tclusters[tfind(n)] += 1
    assert engine_clusters == tclusters


def test_simhash_near_dups_ground_truth(ray_session, doc_texts):
    """Engine pairs vs exhaustive all-pairs hamming: the verify stage is
    exact (precision 1.0, exact distances); the pigeonhole banding with
    n_chunks=4 GUARANTEES every pair with hamming ≤ 3 is recalled
    (such a pair shares at least one 16-bit chunk); recall above 3 is
    partial by design — assert the guaranteed floor plus a measured
    overall floor."""
    from crawler_ray.functions.hashing import simhash64
    from crawler_ray.pipelines.queries import q_simhash_near_dups

    sims = {i: simhash64(t or "") for i, t in doc_texts.items()}
    ids = sorted(sims)
    truth = {
        (a, b): bin(sims[a] ^ sims[b]).count("1")
        for a, b in itertools.combinations(ids, 2)
        if bin(sims[a] ^ sims[b]).count("1") <= 6
    }
    got = q_simhash_near_dups(SF)
    engine = {
        (int(r.id_a), int(r.id_b)): int(r.hamming)
        for r in got.itertuples(index=False)
    }
    for p, h in engine.items():
        assert truth.get(p) == h, f"false positive / wrong distance {p}: {h}"
    guaranteed = {p for p, h in truth.items() if h <= 3}
    assert guaranteed <= set(engine), "pigeonhole guarantee violated"
    assert truth, "fixture must contain true pairs"
    recall = len(engine) / len(truth)
    assert recall >= 0.5, f"overall simhash recall {recall:.2f} < 0.5"


def test_simhash_blocks_ground_truth(ray_session, doc_texts):
    """simhash == simhash64(text) per row; block == top-16 bits."""
    from crawler_ray.functions.hashing import simhash64
    from crawler_ray.pipelines.queries import q_simhash_blocks

    out = q_simhash_blocks(SF).to_pandas()
    assert len(out) == len(doc_texts)
    for r in out.itertuples(index=False):
        want = simhash64(doc_texts[int(r.doc_id)] or "")
        assert int(r.simhash) == want
        assert int(r.simhash_block) == want >> 48


def test_ann_ivf_recall_ground_truth(ray_session):
    """IVF top-10 vs exact numpy cosine top-10: with n_cells=16 /
    nprobe=8 over 500 near-orthogonal vectors the probed cells must
    retain most true neighbors — assert recall@10 ≥ 0.6 and that the
    reported cosines are exact for every returned id."""
    from crawler_ray.pipelines.queries import ANN_K, ANN_QUERY_ID, q_ann_ivf_topk

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist())
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    q = mat[ids == ANN_QUERY_ID][0]
    mask = ids != ANN_QUERY_ID
    rest, rest_ids = mat[mask], ids[mask]
    cos = (rest @ q) / (
        np.linalg.norm(rest, axis=1) * np.linalg.norm(q) + 1e-300
    )
    true_top = set(rest_ids[np.argsort(-cos)][:ANN_K].tolist())
    got = q_ann_ivf_topk(SF)
    got_ids = set(got["vec_id"].astype(int))
    recall = len(got_ids & true_top) / ANN_K
    assert recall >= 0.6, f"IVF recall@10 {recall:.2f} < 0.6"


def test_language_id_ground_truth(ray_session, doc_texts):
    """Two-part ground truth.  (The testdata's stored ``lang`` column is
    decorative metadata — zh/es/fr-labeled docs all carry latin English
    words — so label-accuracy is NOT a valid oracle here.)

    1. The distributed pipeline agrees row-for-row with a driver-side
       per-row recompute of the same detector (the operator is a pure
       function of text).
    2. The detector itself discriminates real scripts/stopwords on a
       known-language fixture (a silent regression to one class fails).
    """
    from crawler_ray.functions.textstats import detect_language
    from crawler_ray.pipelines.queries import q_language_id

    out = q_language_id(SF).to_pandas()
    assert len(out) == len(doc_texts)
    by_id = dict(zip(out["doc_id"].astype(int), out["predicted"]))
    for i, t in doc_texts.items():
        assert by_id[i] == detect_language(t or "")

    fixture = {
        "the quick brown fox jumps over the lazy dog and it was very good": "en",
        "le chat est sur la table et il ne veut pas descendre du tout": "fr",
        "el perro está en la casa y no quiere salir de la habitación": "es",
        "der Hund ist im Haus und er will nicht aus dem Zimmer gehen": "de",
        "안녕하세요 오늘 날씨가 정말 좋네요 공원에 산책하러 갑시다": "ko",
        "今日は天気がいいですね公園へ散歩にいきましょう": "ja",
        "привет как дела сегодня хорошая погода пойдем гулять в парк": "ru",
        "": "und",
    }
    for text, want in fixture.items():
        assert detect_language(text) == want, (text, want)


def test_doc_fingerprints_ground_truth(ray_session, doc_texts):
    """Rolling Karp-Rabin window hashes vs an independent per-window
    direct polynomial evaluation (no stride tricks, no vectorization):
    the keep-smallest selection must agree hash-for-hash."""
    from crawler_ray.functions.hashing import stable_hash64, tokens_of
    from crawler_ray.pipelines.queries import q_doc_fingerprints

    def direct(text: str, window: int = 8, keep: int = 16) -> list[str]:
        import hashlib

        toks = tokens_of(text)
        if not toks:
            return []
        th = [stable_hash64(t) for t in toks]
        if len(th) <= window:
            arr = np.asarray(th, dtype=np.uint64)
            return [
                str(int(hashlib.blake2b(arr.tobytes(), digest_size=8).hexdigest(), 16))
            ]
        base, mod = 1000003, 1 << 64
        hs = set()
        for i in range(len(th) - window + 1):
            h = 0
            for x in th[i : i + window]:
                h = (h * base + int(x)) % mod
            hs.add(h)
        return [str(x) for x in sorted(hs)[:keep]]

    out = q_doc_fingerprints(SF).to_pandas()
    by_id = dict(zip(out["doc_id"].astype(int), out["fingerprint"]))
    assert len(by_id) == len(doc_texts)
    for i in list(doc_texts)[:50]:  # 50 docs × O(len) direct eval
        assert list(by_id[i]) == direct(doc_texts[i] or "")


def test_approx_distinct_ground_truth(ray_session):
    """HLL estimates vs exact distinct counts on the same tables."""
    from crawler_ray.pipelines.queries import q_approx_distinct

    out = q_approx_distinct(SF).set_index("column")["approx_distinct"]
    exact_src = (
        pq.read_table(f"{SF}/documents.parquet", columns=["source"])["source"]
        .to_pandas()
        .nunique()
    )
    exact_usr = (
        pq.read_table(f"{SF}/events.parquet", columns=["user_id"])["user_id"]
        .to_pandas()
        .nunique()
    )
    assert abs(out["documents.source"] - exact_src) / exact_src <= 0.1
    assert abs(out["events.user_id"] - exact_usr) / exact_usr <= 0.1


def test_media_features_ground_truth(ray_session):
    """The deterministic fake decode is still a CONTRACT: features must
    be a pure function of the payload bytes — two independent runs and
    a direct recompute from the synthetic table must agree."""
    from crawler_ray.pipelines.queries import q_media_features
    from crawler_ray.stages.multimodal import synth_media_table

    a = q_media_features(SF)
    b = q_media_features(SF)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    t = synth_media_table(n=96, seed=42)
    assert set(a["media_ref"]) == set(t["media_ref"].to_pylist())


def test_interleaved_spans_ground_truth(ray_session):
    """Span round-trip holds for every doc and the span stats match a
    driver-side recount of the same deterministic fixture."""
    from crawler_ray.pipelines.queries import q_interleaved_spans
    from crawler_ray.sources.synth import interleaved_documents

    out = q_interleaved_spans(SF).to_pandas().set_index("doc_id")
    fixture = interleaved_documents(n_docs=200, seed=42)
    assert bool(out["roundtrip_ok"].all())
    for d, spans in zip(
        fixture["doc_id"].to_pylist(), fixture["spans"].to_pylist()
    ):
        row = out.loc[d]
        spans = spans or []
        assert int(row["n_spans"]) == len(spans)
        assert int(row["n_media"]) == sum(1 for s in spans if s["kind"] == "media")


def test_pack_sequences_ground_truth(ray_session):
    """Every doc packed exactly once; every bin within budget unless a
    single oversized doc; FFD sanity: bin count <= 2x the fractional
    lower bound (FFD guarantees 11/9 OPT + 1; 2x is a loose, stable
    assertion)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(3)
    n, budget = 500, 1000
    lens = rng.integers(50, 700, size=n).astype(np.int64)
    lens[7] = 1500  # oversized
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(n), type=pa.int64()),
                  "n_tokens": pa.array(lens)})
    ).repartition(4)
    bins = pack_sequences(ds, len_col="n_tokens", bin_budget=budget).to_pandas()

    packed = [d for ids in bins["doc_ids"] for d in ids]
    assert sorted(packed) == list(range(n))  # exact coverage, no dupes
    by_doc = dict(zip(range(n), lens))
    for _, row in bins.iterrows():
        total = sum(by_doc[d] for d in row["doc_ids"])
        assert total == row["total_tokens"]
        if not row["has_oversized"]:
            assert total <= budget
        else:
            assert len(row["doc_ids"]) == 1
    lower_bound = int(np.ceil(lens.sum() / budget))
    assert len(bins) <= 2 * lower_bound
    assert bins["bin_id"].is_unique


def test_int8_quantization_cosine_and_recall(ray_session):
    """Quantize→dequantize must preserve cosine structure: per-pair
    cosine distortion < 0.02 on unit-ish vectors, and brute-force ANN
    over dequantized vectors keeps >= 9/10 of the exact top-10."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.ann import (
        brute_force_topk,
        dequantize_matrix,
        quantize_embeddings,
    )

    rng = np.random.default_rng(12)
    n, dim = 300, 32
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(n), type=pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in mat], type=pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(4)

    qds = quantize_embeddings(ds)
    out = qds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    deq = dequantize_matrix(out["embedding_q8"].tolist(), out["q8_scale"].to_numpy())

    def unit(m):
        return m / np.linalg.norm(m, axis=1, keepdims=True)

    cos_orig = unit(mat) @ unit(mat).T
    cos_deq = unit(deq) @ unit(deq).T
    assert np.abs(cos_orig - cos_deq).max() < 0.02

    # ANN recall on the dequantized corpus
    q = {"query_id": [0], "embedding": [mat[5].astype(np.float64)]}
    exact = set(brute_force_topk(ds, q, k=10)["vec_id"])
    dq_tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in deq], type=pa.list_(pa.float32())
            ),
        }
    )
    approx = set(brute_force_topk(rd.from_arrow(dq_tbl).repartition(4), q, k=10)["vec_id"])
    assert len(exact & approx) >= 9


def _naive_winnow(text: str, k: int = 8, w: int = 4) -> set:
    """Independent, loop-based winnowing reimplementation: direct
    per-k-gram polynomial evaluation with Python ints (no vectorized
    rolling), explicit window scan choosing the rightmost minimum."""
    import re as _re

    norm = _re.sub(r"\s+", " ", (text or "").lower()).strip()
    b = norm.encode("utf-8")
    k_ = k
    if len(b) < k_:
        return set()
    B, M = 1000003, 1 << 64
    hashes = []
    for i in range(len(b) - k_ + 1):
        h = 0
        for c in b[i : i + k_]:
            h = (h * B + c) % M
        hashes.append(h)
    if len(hashes) <= w:
        window = hashes
        mn = min(window)
        ri = max(i for i, v in enumerate(window) if v == mn)
        return {window[ri]}
    out = set()
    for i in range(len(hashes) - w + 1):
        window = hashes[i : i + w]
        mn = min(window)
        ri = max(j for j, v in enumerate(window) if v == mn)
        out.add(window[ri])
    return out


def test_winnow_fingerprints_ground_truth(doc_texts):
    """Vectorized winnowing ≡ the naive loop implementation on every
    sf0.001 doc, plus the SIGMOD-2003 guarantee on a constructed pair:
    documents sharing a passage ≥ w+k-1 chars share ≥ 1 fingerprint."""
    from crawler_ray.functions.fingerprint import (
        K_GRAM,
        WINDOW,
        winnow_fingerprints,
    )

    for i, t in list(doc_texts.items())[:200]:
        fast = set(int(x) for x in winnow_fingerprints(t or ""))
        assert fast == _naive_winnow(t or ""), f"doc {i}"

    shared = "x" * (K_GRAM + WINDOW - 1)  # exactly the guarantee length
    a = "aaaa bbbb " + shared + " cccc"
    b = "zzzz qqqq rrrr " + shared + " pppp kkkk"
    fa = set(int(x) for x in winnow_fingerprints(a))
    fb = set(int(x) for x in winnow_fingerprints(b))
    assert fa & fb, "guarantee violated: shared passage, no shared fingerprint"
    # and empty/short docs degrade to empty sets, not errors
    assert len(winnow_fingerprints("")) == 0
    assert len(winnow_fingerprints("ab")) == 0


def test_fingerprint_near_dups_ground_truth(ray_session, doc_texts):
    """Engine pairs vs exhaustive all-pairs fingerprint Jaccard over
    all sf0.001 docs, under the same stop-fingerprint rule the engine
    defines (df > max_df fps excluded from the space — the MOSS
    discard-over-frequent rule): exact pair set AND bit-equal
    resemblance values (no LSH recall slack — fingerprint co-location
    is exact)."""
    import itertools as _it
    from collections import Counter

    from crawler_ray.functions.fingerprint import (
        fingerprint_jaccard,
        winnow_fingerprints,
    )
    from crawler_ray.pipelines.queries import q_fingerprint_near_dups

    MAX_DF = 256  # engine default (stages.dedup.fingerprint_near_dups)
    ids = sorted(doc_texts)
    raw = {i: winnow_fingerprints(doc_texts[i] or "") for i in ids}
    df = Counter()
    for f in raw.values():
        df.update(int(x) for x in f)
    stop = {f for f, n in df.items() if n > MAX_DF}
    assert stop, "fixture should exercise the stop-fingerprint path"
    fps = {
        i: np.array(
            sorted(int(x) for x in f if int(x) not in stop), dtype=np.uint64
        )
        for i, f in raw.items()
    }
    truth = {}
    for a, b in _it.combinations(ids, 2):
        r = fingerprint_jaccard(fps[a], fps[b])
        if r >= 0.5:
            truth[(a, b)] = r

    got = q_fingerprint_near_dups(SF)
    engine = {
        (int(r.id_a), int(r.id_b)): r.resemblance
        for r in got.itertuples(index=False)
    }
    assert truth, "fixture must contain true near-dup pairs"
    assert set(engine) == set(truth)
    for p, r in engine.items():
        assert r == pytest.approx(truth[p], abs=1e-12)


def test_ngram_jaccard_near_dups_ground_truth(ray_session, doc_texts):
    """Engine pairs vs exhaustive all-pairs DISTINCT-trigram Jaccard
    over all sf0.001 docs (the oracle-backed exact operator — same
    tokenizer, same DF-prune rule, integer threshold math): exact pair
    set AND exact intersection counts, no approximation slack."""
    import re as _re
    from collections import Counter

    from crawler_ray.pipelines.queries import (
        NGRAM_JACCARD_MAX_DF,
        q_ngram_jaccard_near_dups,
    )

    tok = _re.compile(r"[a-z0-9_]+")
    ids = sorted(doc_texts)
    grams = {}
    for i in ids:
        toks = tok.findall((doc_texts[i] or "").lower())
        grams[i] = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
    df = Counter()
    for g in grams.values():
        df.update(g)
    stop = {g for g, n in df.items() if n > NGRAM_JACCARD_MAX_DF}
    fg = {i: g - stop for i, g in grams.items()}
    truth = {}
    for a, b in itertools.combinations(ids, 2):
        inter = len(fg[a] & fg[b])
        if inter and 2 * inter >= len(fg[a]) + len(fg[b]) - inter:
            truth[(a, b)] = inter
    assert truth, "fixture must contain true near-dup pairs"

    got = q_ngram_jaccard_near_dups(SF)
    engine = {
        (int(r.id_a), int(r.id_b)): int(r.n_shared)
        for r in got.itertuples(index=False)
    }
    assert engine == truth


def test_ngram_jaccard_stop_gram_and_budget(ray_session):
    """The DF-prune path on a constructed corpus: a boilerplate
    trigram shared by every doc (df > max_df) must be excluded from
    the gram space on both sides (pairs judged on the residual grams
    only), and an undersized stop budget must RAISE, never truncate."""
    import ray.data as rd

    from crawler_ray.stages.dedup import ngram_jaccard_near_dups

    boiler = "all rights reserved"
    rows = [
        # docs 0/1: identical residual after the boilerplate is dropped
        {"doc_id": 0, "text": f"{boiler} alpha beta gamma delta"},
        {"doc_id": 1, "text": f"{boiler} alpha beta gamma delta"},
        # doc 2 shares ONLY the boilerplate → no pair once it's a stop gram
        {"doc_id": 2, "text": f"{boiler} omega psi chi phi"},
        {"doc_id": 3, "text": f"{boiler} one two three four"},
    ]
    ds = rd.from_items(rows)
    tok = lambda t: t.lower().split()  # noqa: E731
    pairs = ngram_jaccard_near_dups(
        ds, tokenize=tok, n=3, threshold_num=1, threshold_den=2, max_df=2
    ).to_pandas()
    got = {
        (int(r.id_a), int(r.id_b)): int(r.n_shared)
        for r in pairs.itertuples(index=False)
    }
    # "reserved alpha beta" etc. differ per doc; docs 0/1 share all
    # residual grams, docs 2/3 share none beyond the stopped boilerplate
    assert set(got) == {(0, 1)}
    assert got[(0, 1)] >= 2

    with pytest.raises(ValueError, match="stop-gram set"):
        ngram_jaccard_near_dups(
            ds, tokenize=tok, n=3, max_df=2, stop_budget_bytes=1
        ).to_pandas()


def test_source_mixture_skewed_ground_truth(ray_session, tmp_path):
    """Temperature-mixture math on a SKEWED corpus (the sf sources are
    uniform, so their quotas degenerate to equal — this exercises the
    α=0.5 upsampling for real): integer quotas ∝ ⌊√n_s⌋, small source
    over-represented relative to its share, quota > group size degrades
    to the whole group, and the engine matches both a brute force and
    the DuckDB oracle twin on the same table."""
    import hashlib as _hl
    import math as _math

    import duckdb

    from crawler_ray.pipelines.queries import (
        MIXTURE_TOTAL,
        ORACLE_SQL,
        q_source_mixture,
    )

    rows = []
    did = 0
    for src, n_docs in (("big", 320), ("mid", 45), ("tiny", 4)):
        for _ in range(n_docs):
            rows.append(
                {"doc_id": did, "source": src, "text": f"doc {did} of {src}"}
            )
            did += 1
    pdf = pd.DataFrame(rows)
    pdf.to_parquet(tmp_path / "documents.parquet")

    # brute force with the same integer math
    cnt = pdf.groupby("source").size()
    w = {s: _math.isqrt(int(n)) for s, n in cnt.items()}
    quota = {s: (MIXTURE_TOTAL * ww) // sum(w.values()) for s, ww in w.items()}
    assert quota["tiny"] > 4, "quota must exceed the tiny group size"
    # α=0.5 upsampling: tiny's quota share must beat its corpus share
    assert quota["tiny"] / MIXTURE_TOTAL > 4 / len(pdf)
    pdf["h"] = [_hl.md5(t.encode()).hexdigest() for t in pdf["text"]]
    truth = set()
    for s, g in pdf.sort_values(["h", "doc_id"]).groupby("source"):
        truth |= set(g.head(quota[s])["doc_id"])

    got = q_source_mixture(str(tmp_path)).to_pandas()
    assert set(got["doc_id"].astype(int)) == truth
    assert len(got) == len(truth)

    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = con.execute(ORACLE_SQL["source_mixture"]).df()
    assert set(oracle["doc_id"].astype(int)) == truth


def test_repetition_signals_dup_path_vs_sql_twin():
    """The driver corpus never repeats a 5-gram (dup5_micro is 0 for
    every sf doc), so the oracle gate alone cannot falsify the dup
    path.  This fixture constructs documents WITH repeated passages
    and checks the shared kernel against the very same DuckDB SQL the
    driver runs — exact integer equality on all three signals."""
    import duckdb

    from crawler_ray.functions.textstats import repetition_signals_micro
    from crawler_ray.pipelines.queries import ORACLE_SQL

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "the cat sat on the mat the cat sat on the mat extra words",
                "aa bb cc dd ee aa bb cc dd ee aa bb cc dd ee",  # heavy dup5
                "unique words only never repeated anywhere at all today",
                "",  # empty -> all zeros
                "one two",  # shorter than 5 tokens -> dup5 = 0
                "x y x y x y x y x y x y",  # top2 dominates
            ],
        }
    )
    con = duckdb.connect()
    con.execute("PRAGMA threads=2")
    con.register("documents", docs)
    got = (
        con.execute(ORACLE_SQL["repetition_signals"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        [
            (d, *repetition_signals_micro(t))
            for d, t in zip(docs.doc_id, docs.text)
        ],
        columns=["doc_id", "top2_micro", "top3_micro", "dup5_micro"],
    )
    assert (got.dup5_micro > 0).sum() >= 2, "fixture must exercise dup5"
    for c in exp.columns:
        assert (got[c].astype(np.int64) == exp[c].astype(np.int64)).all(), c


def test_kmeans_full_ground_truth(ray_session):
    """Distributed Lloyd's (per-block partial sums, driver reduce) vs a
    naive single-node reimplementation with the identical init (the k
    smallest vec_ids) and iteration count: same per-iteration inertia
    (to fp-sum reassociation), same final assignments, and the engine's
    per-cluster (n, sse) table matches the naive one exactly on sizes."""
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.queries import (
        KMEANS_ITERS,
        KMEANS_K,
        q_kmeans_clusters,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = np.argsort(tbl["vec_id"].to_numpy())
    X = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )[order]
    k = KMEANS_K
    C = X[:k].copy()
    hist = []
    for _ in range(KMEANS_ITERS):
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        a = np.argmin(d2, axis=1)
        hist.append(float(d2[np.arange(len(a)), a].sum()))
        for c in range(k):
            m = X[a == c]
            if len(m):
                C[c] = m.mean(axis=0)
    d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
    a_final = np.argmin(d2, axis=1)
    naive = (
        pd.DataFrame({"cluster": a_final, "sq_dist": d2[np.arange(len(a_final)), a_final]})
        .groupby("cluster", as_index=False)
        .agg(n=("cluster", "size"), sse=("sq_dist", "sum"))
        .sort_values("cluster")
        .reset_index(drop=True)
    )

    got = q_kmeans_clusters(SF)
    assert len(got) == len(naive)
    assert (got["cluster"].to_numpy() == naive["cluster"].to_numpy()).all()
    assert (got["n"].to_numpy() == naive["n"].to_numpy()).all()
    np.testing.assert_allclose(got["sse"].to_numpy(), naive["sse"].to_numpy(), rtol=1e-9)
    # inertia decreases monotonically (Lloyd's invariant)
    assert all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1))


def test_bigram_lm_score_ground_truth(ray_session, doc_texts):
    """Engine LM scores vs a naive full-corpus reimplementation of the
    same add-one bigram model (same vocab prune rule, same np.log):
    per-doc NLL equal to 1e-12 and the fluency ordering sane (a
    constructed in-vocab doc scores below a gibberish one)."""
    import re as _re
    from collections import Counter

    from crawler_ray.pipelines.queries import LM_VOCAB, q_bigram_lm_score

    TOK = _re.compile(r"[a-z0-9_]+")
    uni_raw = Counter()
    for t in doc_texts.values():
        uni_raw.update(TOK.findall((t or "").lower()))
    vocab = set(
        pd.DataFrame(uni_raw.items(), columns=["token", "n"])
        .sort_values(["n", "token"], ascending=[False, True])
        .head(LM_VOCAB)["token"]
    )
    bi, uni = Counter(), Counter()
    toks_by_doc = {}
    for d, t in doc_texts.items():
        toks = [w if w in vocab else "<unk>" for w in TOK.findall((t or "").lower())]
        toks_by_doc[d] = toks
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    V = len(vocab) + 1
    expect = {}
    for d, toks in toks_by_doc.items():
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            expect[d] = (0, 0.0)
            continue
        s = 0.0
        for w1, w2 in pairs:
            s -= float(np.log((bi.get((w1, w2), 0) + 1) / (uni.get(w1, 0) + V)))
        expect[d] = (len(pairs), s / len(pairs))

    got = q_bigram_lm_score(SF).to_pandas()
    assert len(got) == len(expect)
    for r in got.itertuples(index=False):
        nb, nll = expect[int(r.doc_id)]
        assert int(r.n_bigrams) == nb
        assert abs(r.nll - nll) < 1e-12, (r.doc_id, r.nll, nll)


def test_training_pipeline_integrity(ray_session, doc_texts, true_jaccard_pairs):
    """Invariants of the curation flagship (q_training_pipeline) that
    a naive reimplementation can check without replicating LSH recall:

    - deterministic: two runs produce identical manifests;
    - bins: n_docs == len(doc_ids); total_tokens == recomputed chunk
      token sums; budget respected unless has_oversized;
    - coverage: the flattened chunk ids exactly partition the chunks
      of the surviving docs (each chunk in exactly one bin);
    - survivors: all pass the quality gate, no two share a text, and
      every dropped doc is accounted for — low quality, exact dup of
      a smaller-id doc, or true-Jaccard ≥ 0.6 near-dup of some doc."""
    import hashlib as _hl

    from crawler_ray.functions.textops import content_quality
    from crawler_ray.functions.textstats import whitespace_token_count
    from crawler_ray.pipelines.queries import (
        CHUNK_KEY_BITS,
        CHUNK_LEN,
        CHUNK_STRIDE,
        CURATE_BIN_TOKENS,
        CURATE_QUALITY_MIN,
        chunk_key,
        q_training_pipeline,
    )

    m1 = q_training_pipeline(SF)
    m2 = q_training_pipeline(SF)
    pd.testing.assert_frame_equal(m1, m2)

    chunk_ids = [c for ids in m1["doc_ids"] for c in ids]
    assert len(chunk_ids) == len(set(chunk_ids)), "chunk packed twice"
    assert (m1["n_docs"] == m1["doc_ids"].map(len)).all()

    survivors = sorted({c >> CHUNK_KEY_BITS for c in chunk_ids})
    # reconstruct each survivor's chunks + token counts
    expect_chunks = {}
    for d in survivors:
        t = doc_texts[d] or ""
        for ci in range((len(t) + CHUNK_STRIDE - 1) // CHUNK_STRIDE):
            s = ci * CHUNK_STRIDE
            if s >= len(t):
                break
            expect_chunks[chunk_key(d, ci)] = whitespace_token_count(
                t[s : s + CHUNK_LEN]
            )
    assert set(chunk_ids) == set(expect_chunks), "chunks don't partition"
    for r in m1.itertuples(index=False):
        total = sum(expect_chunks[c] for c in r.doc_ids)
        assert total == r.total_tokens
        assert r.total_tokens <= CURATE_BIN_TOKENS or r.has_oversized

    surv_set = set(survivors)
    texts = {d: doc_texts[d] or "" for d in doc_texts}
    assert all(content_quality(texts[d]) >= CURATE_QUALITY_MIN for d in surv_set)
    hashes = [_hl.md5(texts[d].encode()).hexdigest() for d in survivors]
    assert len(hashes) == len(set(hashes)), "exact dup survived"

    near = {a for a, _ in true_jaccard_pairs} | {b for _, b in true_jaccard_pairs}
    first_by_hash = {}
    for d in sorted(texts):
        h = _hl.md5(texts[d].encode()).hexdigest()
        first_by_hash.setdefault(h, d)
    for d in sorted(texts):
        if d in surv_set:
            continue
        ok = (
            content_quality(texts[d]) < CURATE_QUALITY_MIN
            or first_by_hash[_hl.md5(texts[d].encode()).hexdigest()] != d
            or d in near
        )
        assert ok, f"doc {d} dropped without a reason"
    assert surv_set, "pipeline must keep something"
    assert len(surv_set) < len(texts), "pipeline must drop something"


def test_decontaminate_join_path_matches_broadcast(ray_session):
    """The over-budget reroute (round-5 fix): forcing a tiny broadcast
    budget pushes q_decontaminate onto the bucketed semi-join path,
    which must produce EXACTLY the broadcast path's output."""
    from crawler_ray.pipelines.queries import q_decontaminate

    def collect(ds):
        return (
            ds.to_pandas()
            .astype({"doc_id": "int64", "n_shared": "int64"})
            .sort_values("doc_id")
            .reset_index(drop=True)[["doc_id", "n_shared"]]
        )

    broadcast = collect(q_decontaminate(SF))
    joined = collect(q_decontaminate(SF, broadcast_budget_bytes=128))
    assert len(broadcast) > 0  # the stand-in eval split does contaminate
    pd.testing.assert_frame_equal(broadcast, joined)


def test_semantic_dedup_ground_truth(ray_session):
    """SemDeDup vs a naive driver-side recompute: identical k-means
    (same bottom-k-by-id init, same iteration count), then the same
    greedy-leader within-cluster pass — kept set, dup_of attribution
    and cluster assignment must match row-for-row, and the operator
    must actually drop the planted near-dup embeddings."""
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.queries import (
        DUP_COSINE_THRESHOLD,
        q_semantic_dedup,
    )

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = np.argsort(tbl["vec_id"].to_numpy())
    ids = tbl["vec_id"].to_numpy()[order]
    X = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )[order]
    k, iters = 8, 8
    C = X[:k].copy()
    for _ in range(iters):
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        a = np.argmin(d2, axis=1)
        for c in range(k):
            m = X[a == c]
            if len(m):
                C[c] = m.mean(axis=0)
    d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
    a = np.argmin(d2, axis=1)

    M = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    kept = np.ones(len(ids), dtype=bool)
    dup_of = np.full(len(ids), -1, dtype=np.int64)
    for c in range(k):
        members = np.where(a == c)[0]  # ids ascend within members
        S = M[members] @ M[members].T
        for pos in range(1, len(members)):
            prior = [p for p in range(pos) if kept[members[p]]]
            hits = [p for p in prior if S[pos, p] >= DUP_COSINE_THRESHOLD]
            if hits:
                i = members[pos]
                kept[i] = False
                dup_of[i] = ids[members[hits[0]]]
    naive = pd.DataFrame(
        {"vec_id": ids, "cluster": a.astype(np.int64), "kept": kept, "dup_of": dup_of}
    ).sort_values("vec_id").reset_index(drop=True)

    got = q_semantic_dedup(SF)
    pd.testing.assert_frame_equal(got, naive)
    assert (~got["kept"]).sum() > 0, "planted near-dups must be dropped"
    # every drop's leader is kept, in the same cluster, and earlier
    row = got.set_index("vec_id")
    for r in got[~got["kept"]].itertuples(index=False):
        assert bool(row.loc[r.dup_of, "kept"])
        assert int(row.loc[r.dup_of, "cluster"]) == int(r.cluster)
        assert r.dup_of < r.vec_id


def test_dsir_select_ground_truth(ray_session):
    """Naive single-process DSIR recompute (same md5 bucket hashing,
    same add-one smoothing, same deterministic Gumbel keys) must match
    the engine's distributed histogram + partial-head path exactly:
    same 50 doc ids in the same order, bit-equal log weights."""
    from crawler_ray.pipelines.queries import q_dsir_select
    from crawler_ray.stages.dsir import _doc_buckets, _gumbel_key

    N_BUCKETS, K, TARGET = 1024, 50, "src0"
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    docs = t.to_pandas()

    cache: dict = {}
    tgt = np.zeros(N_BUCKETS, dtype=np.int64)
    raw = np.zeros(N_BUCKETS, dtype=np.int64)
    buckets = {}
    for r in docs.itertuples(index=False):
        b = _doc_buckets(r.text, N_BUCKETS, cache)
        buckets[r.doc_id] = b
        np.add.at(tgt if r.source == TARGET else raw, b, 1)
    assert tgt.sum() > 0 and raw.sum() > 0

    p = (tgt + 1.0) / (tgt.sum() + N_BUCKETS)
    q = (raw + 1.0) / (raw.sum() + N_BUCKETS)
    logw = np.log(p) - np.log(q)

    rows = []
    for r in docs.itertuples(index=False):
        if r.source == TARGET:
            continue
        b = buckets[r.doc_id]
        lw = float(logw[b].mean()) if len(b) else float(logw.mean())
        rows.append((r.doc_id, r.source, lw, lw + _gumbel_key(r.doc_id)))
    naive = (
        pd.DataFrame(rows, columns=["id", "source", "logw", "gumbel_logw"])
        .sort_values(["gumbel_logw", "id"], ascending=[False, True])
        .head(K)
        .reset_index(drop=True)
    )

    got = q_dsir_select(SF)
    assert len(got) == K
    pd.testing.assert_frame_equal(got, naive)
    # no target-domain rows selected; selection is biased toward the
    # target distribution vs a uniform draw (mean logw of selected set
    # exceeds the raw-corpus mean logw)
    assert (got["source"] != TARGET).all()
    raw_mean = np.mean([r[2] for r in rows])
    assert got["logw"].mean() > raw_mean


def test_lineitem_corr_exact_past_int64(ray_session, tmp_path):
    """The two-limb sufficient-statistic design must stay EXACT where a
    naive int64 Σy² overflows: 90k rows at max-scale prices puts
    Σy² ≈ 9.9e18 > 2^63-1.  Ground truth is arbitrary-precision Python
    ints over the same rows."""
    import math

    import pyarrow as pa

    from crawler_ray.pipelines.queries import q_lineitem_corr

    rng = np.random.default_rng(7)
    n = 300_000  # ≥ ~92k max-price rows per GROUP overflow int64 Σy²
    qty = rng.integers(1, 51, n).astype(np.float64)
    # prices near the sf0.1 max (104999.91) so per-row y² ≈ 1.1e14
    price = np.round(rng.uniform(95_000.0, 105_000.0, n), 2)
    flag = np.where(np.arange(n) % 3 == 0, "A", "N")
    pa.parquet.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(flag),
                "l_quantity": pa.array(qty),
                "l_extendedprice": pa.array(price),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )

    # exact recompute with unbounded ints
    x = [int(v) for v in np.round(qty)]
    y = [int(v) for v in np.round(price * 100)]
    truth = {}
    for f in ("A", "N"):
        idx = [i for i in range(n) if flag[i] == f]
        N = len(idx)
        sx = sum(x[i] for i in idx)
        sy = sum(y[i] for i in idx)
        sxx = sum(x[i] * x[i] for i in idx)
        syy = sum(y[i] * y[i] for i in idx)
        sxy = sum(x[i] * y[i] for i in idx)
        assert syy > 2**63 - 1, "fixture must overflow a naive int64 sum"
        truth[f] = (
            N,
            round(
                (N * sxy - sx * sy)
                / math.sqrt(float(N * sxx - sx * sx) * float(N * syy - sy * sy)),
                6,
            ),
        )

    got = q_lineitem_corr(str(tmp_path))
    assert list(got["l_returnflag"]) == ["A", "N"]
    for r in got.itertuples(index=False):
        tn, tc = truth[r.l_returnflag]
        assert int(r.n) == tn
        assert float(r.corr_qty_price) == tc  # bit-equal, not approx


def test_funnel_steps_ground_truth(ray_session, tmp_path):
    """Funnel ordering semantics the sf events can't falsify in
    isolation: a click BEFORE the first view must not count, a
    same-timestamp click is NOT strictly after the view, a purchase
    before the qualifying click must not count, and a user with no
    view contributes to no step.  Engine vs hand truth vs the DuckDB
    oracle twin on the same table."""
    import duckdb

    from crawler_ray.pipelines.queries import ORACLE_SQL, q_funnel_steps

    T = pd.Timestamp("2025-01-01")
    s = pd.Timedelta(seconds=1)
    rows = [
        # user 1: full ordered funnel
        (1, T, "view"), (1, T + s, "click"), (1, T + 2 * s, "purchase"),
        # user 2: click strictly BEFORE the first view -> step 1 only
        (2, T, "click"), (2, T + s, "view"),
        # user 3: view then click, no purchase -> steps 1-2
        (3, T, "view"), (3, T + s, "click"),
        # user 4: purchase BEFORE the qualifying click -> steps 1-2
        (4, T, "purchase"), (4, T + s, "view"), (4, T + 2 * s, "click"),
        # user 5: no view at all -> no steps
        (5, T, "click"), (5, T + s, "purchase"),
        # user 6: click at the SAME ts as the view -> not strictly after
        (6, T, "view"), (6, T, "click"),
        # noise event type: ignored entirely
        (1, T, "error"),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf["event_id"] = np.arange(len(pdf), dtype=np.int64)
    pdf["value"] = 1.0
    pdf.to_parquet(tmp_path / "events.parquet")

    got = (
        q_funnel_steps(str(tmp_path))
        .to_pandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    assert list(got["event_type"]) == ["view", "click", "purchase"]
    # steps: view={1,2,3,4,6}, click-after-view={1,3,4}, purchase={1}
    assert list(got["n_users"]) == [5, 3, 1]

    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    oracle = con.execute(ORACLE_SQL["funnel_steps"]).df()
    assert list(oracle["n_users"].astype(int)) == list(got["n_users"].astype(int))


def test_median_order_value_ground_truth(ray_session, tmp_path):
    """Exact-median edge cases the sf orders can't isolate: an EVEN
    group whose two middle ranks land in DIFFERENT histogram buckets
    (the targeted second pass must fetch both), an odd group, and a
    duplicate-heavy group where the median value repeats.  Bit-equal
    vs numpy interpolation and the DuckDB quantile_cont twin."""
    import duckdb

    from crawler_ray.pipelines.queries import (
        ORACLE_SQL,
        QUANTILE_BUCKET_SHIFT,
        q_median_order_value,
    )

    w = 1 << QUANTILE_BUCKET_SHIFT  # bucket width in cents
    groups = {
        # even n; middles straddle a bucket boundary: w-1 and w cents
        "1-URGENT": [0.01, (w - 1) / 100.0, w / 100.0, (3 * w) / 100.0],
        # odd n inside one bucket
        "2-HIGH": [5.00, 7.00, 11.00],
        # duplicate-heavy even group: median value repeats
        "3-MEDIUM": [2.00, 2.00, 2.00, 9.00],
    }
    rows = []
    for prio, vals in groups.items():
        for v in vals:
            rows.append((len(rows) + 1, prio, v))
    pdf = pd.DataFrame(rows, columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    pdf.to_parquet(tmp_path / "orders.parquet")

    got = q_median_order_value(str(tmp_path))
    truth = {
        p: float(np.median(np.round(np.array(v) * 100).astype(np.int64))) / 100.0
        for p, v in groups.items()
    }
    assert list(got["o_orderpriority"]) == sorted(groups)
    for r in got.itertuples(index=False):
        assert float(r.median_price) == truth[r.o_orderpriority]  # bit-equal

    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet')"
    )
    oracle = con.execute(ORACLE_SQL["median_order_value"]).df()
    assert list(oracle["median_price"]) == [
        float(r.median_price) for r in got.itertuples(index=False)
    ]


def test_cohort_retention_ground_truth(ray_session, tmp_path):
    """Cohort semantics on a constructed table: cohorts anchored to
    Monday truncation (a Sunday-starting user belongs to the PRIOR
    Monday's week), multiple events in one week count the user once,
    and a user's cohort is the week of their FIRST event even when
    most activity is later.  Engine vs hand truth vs the DuckDB twin."""
    import duckdb

    from crawler_ray.pipelines.queries import ORACLE_SQL, q_cohort_retention

    mon = pd.Timestamp("2025-01-06")  # a Monday
    wk = pd.Timedelta(days=7)
    rows = [
        # user 1: cohort week 0, active weeks 0, 1, 2 (twice in week 1)
        (1, mon), (1, mon + wk), (1, mon + wk + pd.Timedelta(days=2)),
        (1, mon + 2 * wk),
        # user 2: FIRST event Sunday 23:59 of week 0 -> cohort week 0
        (2, mon + pd.Timedelta(days=6, hours=23, minutes=59)), (2, mon + wk),
        # user 3: cohort week 1 only
        (3, mon + wk + pd.Timedelta(days=3)),
        # user 4: cohort week 0, then gap, active again week 2
        (4, mon + pd.Timedelta(days=1)), (4, mon + 2 * wk),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf["event_id"] = np.arange(len(pdf), dtype=np.int64)
    pdf["event_type"] = "view"
    pdf["value"] = 1.0
    pdf.to_parquet(tmp_path / "events.parquet")

    got = (
        q_cohort_retention(str(tmp_path))
        .to_pandas()
        .sort_values(["cohort_week", "week"])
        .reset_index(drop=True)
    )
    w0, w1, w2 = mon, mon + wk, mon + 2 * wk
    truth = {
        (w0, w0): 3,  # users 1, 2, 4
        (w0, w1): 2,  # users 1, 2
        (w0, w2): 2,  # users 1, 4
        (w1, w1): 1,  # user 3
    }
    assert len(got) == len(truth)
    for r in got.itertuples(index=False):
        assert truth[(r.cohort_week, r.week)] == int(r.n_users)
    assert str(got["cohort_week"].dtype) == "datetime64[us]"

    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    oracle = con.execute(ORACLE_SQL["cohort_retention"]).df()
    assert list(oracle["n_users"].astype(int)) == list(got["n_users"].astype(int))


def test_pagerank_ground_truth(ray_session):
    """PageRank vs a single-process numpy power iteration with the
    identical formula (damping 0.85, uniform dangling redistribution,
    same iteration count) on the same deterministic link graph.
    Checks mass conservation and that ranks agree to float-sum
    reordering tolerance (the engine sums per-block partials in a
    different order, so bit-equality is not the contract here)."""
    import ray.data as rd

    from crawler_ray.sources.synth import demo_web, link_edges
    from crawler_ray.stages.graph import pagerank

    web = demo_web(n_sites=3, n_pages=80, seed=7)
    edges = link_edges(web)
    n = sum(s.n_pages for s in web.sites.values())

    got = pagerank(rd.from_arrow(edges), n, alpha=0.85, n_iter=20)
    assert list(got["node"]) == list(range(n))
    assert abs(float(got["rank"].sum()) - 1.0) < 1e-9  # stochastic

    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    deg = np.bincount(src, minlength=n).astype(np.float64)
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    r = np.full(n, 1.0 / n)
    for _ in range(20):
        w = r * inv
        contrib = np.bincount(dst, weights=w[src], minlength=n)
        r = (1 - 0.85) / n + 0.85 * (contrib + r[deg == 0].sum() / n)
    assert np.allclose(got["rank"].to_numpy(), r, rtol=1e-9, atol=1e-12)
    # the graph must actually differentiate nodes for this to mean much
    assert got["rank"].nunique() > n // 2


def test_pagerank_budget_raise(ray_session):
    """Over-budget node state must RAISE with the co-group guidance,
    never fall back to a silent driver-side O(N)."""
    import pytest
    import ray.data as rd

    from crawler_ray.stages.graph import pagerank

    edges = rd.from_items([{"src": 0, "dst": 1}])
    with pytest.raises(ValueError, match="pagerank_bucketed"):
        pagerank(edges, n_nodes=10**9, budget_bytes=1 << 20)


def test_triangle_count_ground_truth(ray_session):
    """Distributed degree-ordered wedge-join triangle count equals a
    single-process adjacency-set count on the demo-web link graph,
    and on a hand graph with hubs and duplicate/reversed edges."""
    import itertools

    import ray.data as rd

    from crawler_ray.sources.synth import demo_web, link_edges
    from crawler_ray.stages.graph import triangle_count

    def brute(src, dst, n):
        adj = [set() for _ in range(n)]
        for s, d in zip(src, dst):
            if s != d:
                adj[s].add(d)
                adj[d].add(s)
        t = 0
        for v in range(n):
            for a, b in itertools.combinations(sorted(adj[v]), 2):
                if a > v and b > v and b in adj[a]:
                    t += 1
        return t

    web = demo_web(n_sites=4, n_pages=200, seed=42)
    edges = link_edges(web)
    n_nodes = sum(s.n_pages for s in web.sites.values())
    src = edges["src"].to_pylist()
    dst = edges["dst"].to_pylist()
    expect = brute(src, dst, n_nodes)
    got = triangle_count(rd.from_arrow(edges), n_nodes)
    assert got == expect and expect > 0

    # hub + duplicates + reversed pairs: wheel graph around node 0
    n = 12
    hub_src = [0] * (n - 1) + list(range(1, n - 1)) + [n - 1]
    hub_dst = list(range(1, n)) + list(range(2, n)) + [1]
    # duplicates and reversals must not change the count
    src2 = hub_src + hub_dst
    dst2 = hub_dst + hub_src
    expect2 = brute(src2, dst2, n)
    got2 = triangle_count(
        rd.from_arrow(
            __import__("pyarrow").table(
                {
                    "src": __import__("pyarrow").array(src2, type=__import__("pyarrow").int64()),
                    "dst": __import__("pyarrow").array(dst2, type=__import__("pyarrow").int64()),
                }
            )
        ),
        n,
    )
    assert got2 == expect2 == n - 1


def test_pagerank_bucketed_matches_broadcast(ray_session):
    """The over-budget co-group variant must agree with the broadcast
    iteration to float-sum reordering tolerance and conserve mass —
    it's the path the broadcast raise message directs 32M+-node
    graphs to, so equivalence is the whole contract."""
    import ray.data as rd

    from crawler_ray.sources.synth import demo_web, link_edges
    from crawler_ray.stages.graph import pagerank, pagerank_bucketed

    web = demo_web(n_sites=3, n_pages=60, seed=7)
    edges = link_edges(web)
    n = sum(s.n_pages for s in web.sites.values())

    a = pagerank(rd.from_arrow(edges), n, alpha=0.85, n_iter=3)
    b = (
        pagerank_bucketed(
            rd.from_arrow(edges), n, alpha=0.85, n_iter=3, n_buckets=8
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert list(b["node"]) == list(range(n))
    assert abs(float(b["rank"].sum()) - 1.0) < 1e-9
    assert np.allclose(
        a["rank"].to_numpy(), b["rank"].to_numpy(), rtol=1e-9, atol=1e-12
    )


def test_link_components_ground_truth(ray_session):
    """Link-graph weakly-connected components vs driver union-find on
    the same edge table (component sizes and count must agree)."""
    from crawler_ray.pipelines.queries import q_link_components
    from crawler_ray.sources.synth import demo_web, link_edges

    web = demo_web(n_sites=4, n_pages=200, seed=42)
    edges = link_edges(web)
    n = sum(s.n_pages for s in web.sites.values())

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(edges["src"].to_pylist(), edges["dst"].to_pylist()):
        if s != d:
            a, b = find(s), find(d)
            if a != b:
                parent[max(a, b)] = min(a, b)
    from collections import Counter

    truth = Counter(find(x) for x in range(n))
    # engine labels only nodes that appear in edges; isolated nodes
    # (if any) are absent from both edge-derived sides
    in_edges = set(edges["src"].to_pylist()) | set(edges["dst"].to_pylist())
    truth_sizes = sorted(
        sum(1 for x in range(n) if find(x) == c and x in in_edges)
        for c in set(find(x) for x in in_edges)
    )

    got = (
        q_link_components("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("component")
        .reset_index(drop=True)
    )
    assert sorted(got["n_nodes"]) == truth_sizes
    assert int(got["n_nodes"].sum()) == len(in_edges)


def test_bfs_distances_ground_truth(ray_session):
    """Distributed BFS vs single-process BFS on the link graph
    (multi-source, unreachable = -1), plus the budget raise."""
    from collections import deque

    import pytest
    import ray.data as rd

    from crawler_ray.sources.synth import demo_web, link_edges
    from crawler_ray.stages.graph import bfs_distances

    web = demo_web(n_sites=4, n_pages=200, seed=42)
    edges = link_edges(web)
    hosts = sorted(web.sites)
    seeds, off = [], 0
    for h in hosts:
        seeds.append(off)
        off += web.sites[h].n_pages

    adj = [[] for _ in range(off)]
    for s, d in zip(edges["src"].to_pylist(), edges["dst"].to_pylist()):
        adj[s].append(d)
    truth = [-1] * off
    q = deque()
    for s in seeds:
        truth[s] = 0
        q.append(s)
    while q:
        v = q.popleft()
        for w in adj[v]:
            if truth[w] == -1:
                truth[w] = truth[v] + 1
                q.append(w)

    got = bfs_distances(rd.from_arrow(edges), off, seeds)
    assert list(got["node"]) == list(range(off))
    assert list(got["dist"]) == truth

    with pytest.raises(ValueError, match="pagerank_bucketed"):
        bfs_distances(
            rd.from_items([{"src": 0, "dst": 1}]), 10**9, [0], budget_bytes=1 << 20
        )


def test_cumulative_revenue_ground_truth(ray_session, tmp_path):
    """Global prefix-scan edge cases the sf orders can't isolate:
    dates straddling a 2^SCAN_BUCKET_SHIFT-us bucket boundary (the
    driver offset must carry across), duplicate dates (tie broken by
    o_orderkey), and an empty leading bucket gap.  Bit-equal vs the
    single-process int64-cents cumsum and the DuckDB window twin."""
    import duckdb

    from crawler_ray.pipelines.queries import (
        ORACLE_SQL,
        SCAN_BUCKET_SHIFT,
        q_cumulative_revenue,
    )

    w_us = 1 << SCAN_BUCKET_SHIFT  # bucket width in microseconds
    # rows deliberately out of insertion order vs (date, key) order
    rows = [
        # (o_orderkey, date_us, o_totalprice)
        (5, 3 * w_us + 17, 1.01),  # later bucket after a gap (bucket 3)
        (2, w_us - 1, 2.50),  # last us of bucket 0
        (1, w_us - 1, 0.07),  # duplicate date: key 1 must rank first
        (3, w_us, 10.00),  # first us of bucket 1 (boundary straddle)
        (4, w_us + 5, 4.99),
    ]
    pdf = pd.DataFrame(rows, columns=["o_orderkey", "date_us", "o_totalprice"])
    pdf["o_orderdate"] = pd.to_datetime(pdf["date_us"], unit="us")
    pdf[["o_orderkey", "o_orderdate", "o_totalprice"]].to_parquet(
        tmp_path / "orders.parquet"
    )

    got = (
        q_cumulative_revenue(str(tmp_path))
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )

    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    cum, truth = 0, {}
    for k, _, price in ordered:
        cum += int(round(price * 100))
        truth[k] = cum
    assert list(got["o_orderkey"]) == [1, 2, 3, 4, 5]
    assert [truth[k] for k in got["o_orderkey"]] == list(got["cum_cents"])

    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet')"
    )
    oracle = (
        con.execute(ORACLE_SQL["cumulative_revenue"])
        .df()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert list(oracle["cum_cents"]) == list(got["cum_cents"])


def test_user_time_window_sum_ground_truth(ray_session, tmp_path):
    """RANGE-frame cases the sf events can't isolate: equal-ts PEERS
    (both must see the full peer sum — RANGE, not ROWS, semantics), a
    row exactly 1 h after another (inclusive frame start), and one
    just past it (excluded).  Bit-equal vs a brute-force per-row frame
    sum and the DuckDB RANGE window twin."""
    import duckdb

    from crawler_ray.pipelines.queries import (
        ORACLE_SQL,
        TIME_WINDOW_US,
        q_user_time_window_sum,
    )

    h = TIME_WINDOW_US
    rows = [
        # (event_id, user_id, ts_us, value)
        (1, 7, 0, 1.00),
        (2, 7, h, 2.00),  # exactly 1 h later: frame includes row 1
        (3, 7, 2 * h + 1, 4.00),  # 1 h + 1 us after row 2: row 2 excluded
        (4, 7, 3 * h, 8.00),  # peers:
        (5, 7, 3 * h, 16.00),  # both rows 4+5 see 8+16
        (6, 9, 3 * h, 32.00),  # other user, same ts: isolated
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts_us"], unit="us")
    pdf[["event_id", "user_id", "ts", "value"]].to_parquet(
        tmp_path / "events.parquet"
    )

    got = (
        q_user_time_window_sum(str(tmp_path))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    truth = {}
    for eid, uid, ts, _ in rows:
        truth[eid] = sum(
            int(round(v * 100))
            for _, u2, t2, v in rows
            if u2 == uid and ts - h <= t2 <= ts
        )
    assert list(got["event_id"]) == [1, 2, 3, 4, 5, 6]
    assert [truth[e] for e in got["event_id"]] == list(got["window_cents"])
    # the peer case, explicitly: rows 4+5 (peers, 8+16) plus row 3
    # (2 h + 1 us = inside the [2 h, 3 h] frame, value 4) = 28.00
    assert truth[4] == truth[5] == 2800

    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    oracle = (
        con.execute(ORACLE_SQL["user_time_window_sum"])
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(oracle["window_cents"]) == list(got["window_cents"])


def test_paragraph_dedup_ground_truth(ray_session, tmp_path):
    """The sf documents are single-paragraph and fully distinct, so
    the oracle row is degenerate there; this is the real coverage:
    multi-paragraph docs with cross-doc AND within-doc duplicate
    paragraphs, blank lines (excluded but position-counted), a doc
    that loses every paragraph (must drop out), and first-occurrence
    priority by (doc_id, position).  Checked vs a single-process
    recomputation and the DuckDB twin."""
    import duckdb

    from crawler_ray.pipelines.queries import ORACLE_SQL, q_paragraph_dedup

    docs = {
        1: "alpha\nbeta\n\ngamma\nbeta",  # within-doc dup (beta), blank line
        2: "beta\ndelta\nalpha",  # cross-doc dups (beta, alpha)
        3: "beta\nalpha",  # loses everything -> drops out
        4: "  \t\nepsilon",  # leading whitespace-only paragraph
    }
    pdf = pd.DataFrame(
        {"doc_id": list(docs), "text": [docs[k] for k in docs]}
    )
    pdf.to_parquet(tmp_path / "documents.parquet")

    got = (
        q_paragraph_dedup(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    # single-process recomputation
    seen, kept = set(), {}
    for d in sorted(docs):
        for i, p in enumerate(docs[d].split("\n")):
            if p.strip(" \t\r") and p not in seen:
                seen.add(p)
                kept.setdefault(d, []).append(p)
    truth = {d: "\n".join(ps) for d, ps in kept.items()}
    assert list(got["doc_id"]) == sorted(truth)  # doc 3 dropped
    assert 3 not in set(got["doc_id"])
    for r in got.itertuples(index=False):
        assert r.text_dedup == truth[r.doc_id]
        assert r.n_kept == len(kept[r.doc_id])

    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    oracle = (
        con.execute(ORACLE_SQL["paragraph_dedup"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(oracle["doc_id"]) == list(got["doc_id"])
    assert list(oracle["text_dedup"]) == list(got["text_dedup"])
    assert list(oracle["n_kept"]) == list(got["n_kept"])


def test_orders_with_late_items_ground_truth(ray_session, tmp_path):
    """Q4-EXISTS cases the sf data can't isolate: the exactly-30-days
    boundary (NOT late — strict >), a 30 d + 1 us ship (late), an
    order with no lineitems (EXISTS false), and enough never-late
    orders that some of the 16 join buckets carry ZERO late rows (the
    typed-empty partial path).  Plus the fully-degenerate corpus (no
    late orders anywhere) → zero rows.  Checked vs the DuckDB twin."""
    import duckdb

    from crawler_ray.pipelines.queries import (
        LATE_SHIP_US,
        ORACLE_SQL,
        q_orders_with_late_items,
    )

    base = 1_000_000_000_000  # epoch us
    orders, lines = [], []
    # o1: boundary ship == odate + 30 d exactly -> NOT late
    orders.append((1, base, "1-URGENT"))
    lines.append((1, base + LATE_SHIP_US))
    # o2: 30 d + 1 us -> late
    orders.append((2, base, "1-URGENT"))
    lines.append((2, base + LATE_SHIP_US + 1))
    # o3: no lineitems at all -> EXISTS false
    orders.append((3, base, "2-HIGH"))
    # o4: several on-time items, one late -> late (max-reduce)
    orders.append((4, base, "3-MEDIUM"))
    lines += [(4, base + 10), (4, base + LATE_SHIP_US + 5), (4, base)]
    # o5..o24: never late, spread over keys so several of the 16 join
    # buckets hold only non-late orders (exercises the typed empty)
    for k in range(5, 25):
        orders.append((k, base, "4-NOT SPECIFIED"))
        lines.append((k, base + k))

    def write(dirpath, orders, lines):
        od = pd.DataFrame(
            orders, columns=["o_orderkey", "odate_us", "o_orderpriority"]
        )
        od["o_orderdate"] = pd.to_datetime(od.pop("odate_us"), unit="us")
        od.to_parquet(f"{dirpath}/orders.parquet")
        ld = pd.DataFrame(lines, columns=["l_orderkey", "ship_us"])
        ld["l_shipdate"] = pd.to_datetime(ld.pop("ship_us"), unit="us")
        ld.to_parquet(f"{dirpath}/lineitem.parquet")

    write(tmp_path, orders, lines)
    got = (
        q_orders_with_late_items(str(tmp_path))
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    # only o2 (1-URGENT) and o4 (3-MEDIUM) are late
    assert list(got["o_orderpriority"]) == ["1-URGENT", "3-MEDIUM"]
    assert list(got["order_count"]) == [1, 1]

    con = duckdb.connect()
    con.execute("SET threads=2")
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    oracle = (
        con.execute(ORACLE_SQL["orders_with_late_items"])
        .df()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert list(oracle["o_orderpriority"]) == list(got["o_orderpriority"])
    assert list(oracle["order_count"]) == list(got["order_count"])

    # fully degenerate: no late orders anywhere -> zero rows (the SQL
    # twin returns zero rows too; schema of an empty stream is not
    # part of the contract)
    d2 = tmp_path / "nolate"
    d2.mkdir()
    write(d2, [(k, base, "2-HIGH") for k in range(1, 9)],
          [(k, base + k) for k in range(1, 9)])
    empty = q_orders_with_late_items(str(d2)).to_pandas()
    assert len(empty) == 0


def test_compression_ratio_exact(ray_session, tmp_path):
    """zlib is byte-deterministic at a fixed level: the engine's
    per-doc DEFLATE ratio must equal a direct recompute, a repetitive
    doc must compress far below a high-entropy one, and the empty doc
    takes the documented 1.0 convention."""
    import zlib

    import numpy as np
    import pandas as pd

    from crawler_ray.pipelines.queries import q_compression_ratio

    rng = np.random.RandomState(9)
    docs = [
        "spam " * 400,                       # highly repetitive
        "".join(chr(c) for c in rng.randint(33, 127, 2000)),  # high entropy
        "",                                   # empty -> ratio 1.0
        "a normal short sentence.",
    ]
    pdf = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "text": docs})
    pdf.to_parquet(tmp_path / "documents.parquet")

    got = (
        q_compression_ratio(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == 4
    for i, t in enumerate(docs):
        b = t.encode("utf-8")
        assert int(got.loc[i, "raw_bytes"]) == len(b)
        assert int(got.loc[i, "compressed_bytes"]) == len(zlib.compress(b, 6))
        expect = len(zlib.compress(b, 6)) / len(b) if b else 1.0
        assert got.loc[i, "compression_ratio"] == expect
    # the quality-signal ordering the filter relies on
    assert got.loc[0, "compression_ratio"] < 0.1
    assert got.loc[1, "compression_ratio"] > 0.7
