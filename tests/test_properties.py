"""Property-based tests (hypothesis): invariants that example tests
can't sweep — span round-trip over arbitrary content, and
scalar-vs-vectorized predicate equivalence (the class of bug where the
regex path diverges from the urlparse path on odd inputs)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_ray.functions.spans import (
    parse_main_text,
    render_main_text,
    span_key,
)
from crawler_ray.functions.urls import is_valid_url, valid_url_mask

# Span text must not itself contain the reference's delimiter markers
# (the reference's own format has the same ambiguity — a page whose text
# embeds the marker literally is indistinguishable from a real marker).
_span_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
).filter(lambda s: "--- [첨부" not in s and "\n\n---" not in s)

_name = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N")), min_size=1, max_size=20
)


@st.composite
def span_sequences(draw):
    """Interleaved sequences mirroring what AttachmentEnricher emits:
    at most one leading text span, then media/media_failed spans."""
    spans = []
    off = 0
    text = draw(_span_text)
    if text:
        spans.append({"kind": "text", "text": text, "media_ref": "", "offset": off})
        off += 1
    for _ in range(draw(st.integers(0, 4))):
        kind = draw(st.sampled_from(["media", "media_failed"]))
        body = draw(_span_text) if kind == "media" else ""
        if kind == "media" and not body.strip():
            body = "x"  # empty media text renders as a failure marker
        spans.append(
            {"kind": kind, "text": body, "media_ref": draw(_name), "offset": off}
        )
        off += 1
    return spans


@settings(max_examples=200, deadline=None)
@given(span_sequences())
def test_span_roundtrip_property(spans):
    rendered = render_main_text(spans)
    back = parse_main_text(rendered)
    assert [span_key(s) for s in back] == [span_key(s) for s in spans]


_urls = st.one_of(
    # well-formed-ish URLs with varied schemes/cases/suffixes
    st.builds(
        lambda scheme, host, path, frag: f"{scheme}://{host}{path}{frag}",
        st.sampled_from(["http", "https", "HTTP", "Https", "ftp", "javascript"]),
        st.sampled_from(["www.ex.co.kr", "WWW.ex.co.kr", "other.net", "ex.co.kr"]),
        st.sampled_from(["", "/", "/a/b", "/a?q=1", "/javascript:void(0)"]),
        st.sampled_from(["", "#top", "#"]),
    ),
    # junk
    st.text(max_size=40),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_urls, min_size=1, max_size=20))
def test_valid_url_mask_matches_scalar(urls):
    base = "www.ex.co.kr"
    scalar = [is_valid_url(u, base) for u in urls]
    vector = [bool(v) for v in valid_url_mask(urls, base).to_pylist()]
    assert vector == scalar


@settings(max_examples=10, deadline=None)
@given(
    lk=st.lists(st.integers(0, 30), min_size=0, max_size=60),
    rk=st.lists(st.integers(0, 30), min_size=0, max_size=40),
)
def test_bucketed_hash_join_matches_pandas_merge(ray_session, lk, rk):
    """For arbitrary key multisets, the distributed bucketed join must
    equal a plain pandas inner merge (same multiset of output rows)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.joins import bucketed_hash_join

    ldf = pd.DataFrame({"k": pd.array(lk, dtype="int64"),
                        "lv": pd.array(range(len(lk)), dtype="int64")})
    rdf = pd.DataFrame({"k": pd.array(rk, dtype="int64"),
                        "rv": pd.array(range(len(rk)), dtype="int64")})
    expected = ldf.merge(rdf, on="k").sort_values(["k", "lv", "rv"]).reset_index(drop=True)

    left = rd.from_arrow(pa.Table.from_pandas(ldf, preserve_index=False))
    right = rd.from_arrow(pa.Table.from_pandas(rdf, preserve_index=False))
    got = bucketed_hash_join(
        left, right, key="k", n_buckets=7,
        left_schema=pa.schema([("k", pa.int64()), ("lv", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("rv", pa.int64())]),
    ).to_pandas()
    if len(expected) == 0:
        assert len(got) == 0
        return
    for c in ("k", "lv", "rv"):
        got[c] = got[c].astype("int64")
    got = got.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected)


@settings(max_examples=8, deadline=None)
@given(
    lk=st.lists(st.integers(0, 30), min_size=0, max_size=60),
    rk=st.lists(st.integers(0, 30), min_size=0, max_size=40),
    how=st.sampled_from(["left", "outer"]),
)
def test_bucketed_outer_join_matches_pandas_merge(ray_session, lk, rk, how):
    """LEFT/FULL OUTER bucketed joins must equal pandas merge for
    arbitrary key multisets — including keys present on only one side
    (null-filled other-side columns, surfaced from the key's bucket)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.stages.joins import bucketed_hash_join

    ldf = pd.DataFrame({"k": pd.array(lk, dtype="int64"),
                        "lv": pd.array(range(len(lk)), dtype="int64")})
    rdf = pd.DataFrame({"k": pd.array(rk, dtype="int64"),
                        "rv": pd.array(range(len(rk)), dtype="int64")})
    expected = ldf.merge(rdf, on="k", how=how)

    left = rd.from_arrow(pa.Table.from_pandas(ldf, preserve_index=False))
    right = rd.from_arrow(pa.Table.from_pandas(rdf, preserve_index=False))
    got = bucketed_hash_join(
        left, right, key="k", n_buckets=7, how=how,
        left_schema=pa.schema([("k", pa.int64()), ("lv", pa.int64())]),
        right_schema=pa.schema([("k", pa.int64()), ("rv", pa.int64())]),
    ).to_pandas()
    assert len(got) == len(expected)
    if len(expected) == 0:
        return
    # nullable int64 → float64 for a NaN-tolerant value compare
    def canon(df):
        out = df.astype({c: "float64" for c in ("k", "lv", "rv")})
        return (out.sort_values(["k", "lv", "rv"], na_position="last")
                   .reset_index(drop=True))
    g, e = canon(got), canon(expected)
    for c in ("k", "lv", "rv"):
        assert np.allclose(g[c].to_numpy(), e[c].to_numpy(), equal_nan=True), c


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1 << 44),  # date_us: straddles 2^40 buckets
            st.integers(0, 10**6),  # cents
        ),
        min_size=1,
        max_size=50,
    )
)
def test_cumulative_revenue_matches_bruteforce(ray_session, rows):
    """For arbitrary (date, price) multisets the distributed two-pass
    prefix-scan must equal the single-process sorted cumsum — dates
    land in random 2^40-us buckets, so the driver offset carry is
    exercised across arbitrary bucket layouts (incl. gaps and
    single-bucket degenerate cases)."""
    import tempfile

    import pandas as pd

    from crawler_ray.pipelines.queries import q_cumulative_revenue

    d = tempfile.mkdtemp(prefix="cumrev_")
    pdf = pd.DataFrame(
        {
            "o_orderkey": range(1, len(rows) + 1),
            "o_orderdate": pd.to_datetime([r[0] for r in rows], unit="us"),
            "o_totalprice": [r[1] / 100.0 for r in rows],
        }
    )
    pdf.to_parquet(f"{d}/orders.parquet")

    got = (
        q_cumulative_revenue(d)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    order = sorted(range(len(rows)), key=lambda i: (rows[i][0], i + 1))
    cum, truth = 0, {}
    for i in order:
        cum += rows[i][1]
        truth[i + 1] = cum
    assert [truth[k] for k in got["o_orderkey"]] == list(got["cum_cents"])


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # user
            st.integers(0, 4 * 3_600 * 1_000_000),  # ts us in a 4h span
            st.integers(0, 10**4),  # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_user_time_window_sum_matches_bruteforce(ray_session, rows):
    """For arbitrary event sets (few users, colliding timestamps) the
    RANGE-frame sum must equal the O(n²) per-row frame sum — peers
    (duplicate ts within a user) must all see the full peer total."""
    import tempfile

    import pandas as pd

    from crawler_ray.pipelines.queries import (
        TIME_WINDOW_US,
        q_user_time_window_sum,
    )

    d = tempfile.mkdtemp(prefix="timewin_")
    pdf = pd.DataFrame(
        {
            "event_id": range(1, len(rows) + 1),
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
            "value": [r[2] / 100.0 for r in rows],
        }
    )
    pdf.to_parquet(f"{d}/events.parquet")

    got = (
        q_user_time_window_sum(d)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    truth = {
        eid: sum(
            c2
            for (u2, t2, c2) in rows
            if u2 == u and t - TIME_WINDOW_US <= t2 <= t
        )
        for eid, (u, t, _) in enumerate(rows, start=1)
    }
    assert [truth[e] for e in got["event_id"]] == list(got["window_cents"])


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="ab \t", max_size=3),  # tiny alphabet: dups likely
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_paragraph_dedup_matches_bruteforce(ray_session, docs):
    """For arbitrary paragraph lists (blanks, within-doc and cross-doc
    dups) the distributed first-occurrence dedup + reassembly must
    equal the single-process scan in (doc_id, position) order; docs
    losing every paragraph must vanish."""
    import tempfile

    import pandas as pd

    from crawler_ray.pipelines.queries import q_paragraph_dedup

    d = tempfile.mkdtemp(prefix="paradedup_")
    pdf = pd.DataFrame(
        {
            "doc_id": range(1, len(docs) + 1),
            "text": ["\n".join(ps) for ps in docs],
        }
    )
    pdf.to_parquet(f"{d}/documents.parquet")

    raw = q_paragraph_dedup(d).to_pandas()
    seen, truth = set(), {}
    for did, ps in enumerate(docs, start=1):
        kept = []
        for p in ps:
            if p.strip(" \t\r") and p not in seen:
                seen.add(p)
                kept.append(p)
        if kept:
            truth[did] = "\n".join(kept)
    if not truth:
        # all-blank corpus: zero rows, like the SQL twin's GROUP BY
        assert len(raw) == 0
        return
    got = raw.sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == sorted(truth)
    for r in got.itertuples(index=False):
        assert r.text_dedup == truth[r.doc_id]
