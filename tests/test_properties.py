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
