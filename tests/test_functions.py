"""Unit tests for the pure operator kernels (SURVEY.md §2.2/§2.8).

Golden in/out pairs encode the reference semantics precisely — these
are the conformance fixtures FIXTURES.md F5 calls for.
"""

import numpy as np
import pytest

from crawler_ray.functions import hashing, linkfilter, packet, spans, textops, textstats, urls


# ---------------------------------------------------------------- urls
def test_site_identifier():
    assert urls.create_site_identifier("http://www.fss.or.kr/fss/main.jsp") == "fss"
    assert urls.create_site_identifier("https://www.kyobo-life.co.kr/x") == "kyobo_life"
    # >2 labels, 2nd not co/go/or → second-level reordering
    assert urls.create_site_identifier("http://news.portal.com/a") == "portal_news"
    assert urls.create_site_identifier("http://site00.example.test/page/0") == "example_site00"


def test_is_valid_url():
    base = "site.test"
    assert urls.is_valid_url("http://site.test/a", base)
    assert urls.is_valid_url("https://site.test/a?q=1", base)
    assert not urls.is_valid_url("http://other.test/a", base)
    assert not urls.is_valid_url("ftp://site.test/a", base)
    assert not urls.is_valid_url("http://site.test/a#frag", base)
    assert not urls.is_valid_url("javascript:void(0)", base)


def test_valid_url_mask_matches_scalar():
    base = "site.test"
    candidates = [
        "http://site.test/a",
        "http://site.test/a#x",
        "https://site.test/",
        "http://evil.test/a",
        "javascript:void(0)",
        "http://site.test",
    ]
    mask = urls.valid_url_mask(candidates, base).to_pylist()
    expected = [urls.is_valid_url(u, base) for u in candidates]
    assert mask == expected


def test_kb_pattern():
    assert urls.kb_pattern("http://a.test/bbs/view.do") == "/bbs"
    assert urls.kb_pattern("http://a.test/bbs/list") == "/bbs/list"
    assert urls.kb_pattern("http://a.test/") == "/"
    assert urls.kb_pattern("http://a.test/x/file.pdf") == "/x"


def test_viewer_rewrite():
    out = urls.viewer_file_url(
        "http://a.test/viewer?file=%2Ffiles%2Fdoc.pdf", "http://a.test/"
    )
    assert out == "http://a.test/files/doc.pdf"
    assert urls.viewer_file_url("http://a.test/page?x=1", "http://a.test/") is None


def test_split_links():
    base = "http://a.test/"
    links = [
        ("http://a.test/page/1", "one"),
        ("http://a.test/files/r.pdf", "report"),
        ("http://a.test/viewer?file=%2Ffiles%2Fr2.hwp", "viewer"),
        ("http://a.test/files/r.pdf", "dup report"),
        ("http://b.test/files/x.pdf", "other-host pdf"),
    ]
    page_links, attachments = urls.split_links(links, base, "a.test")
    assert attachments == [
        "http://a.test/files/r.pdf",
        "http://a.test/files/r2.hwp",
    ]
    assert [u for u, _ in page_links] == [
        "http://a.test/page/1",
        "http://b.test/files/x.pdf",
    ]


# ------------------------------------------------------------- textops
def test_clean_text_hp_collapses_and_filters():
    # whitespace collapse makes one long line; noise regexes removed
    out = textops.clean_text_hp("hello   world\n다운로드  this line stays long enough")
    assert "다운로드" not in out
    assert "hello world" in out
    # short residue dropped entirely
    assert textops.clean_text_hp("short") == ""


def test_final_text_clean_lines():
    src = "\n".join(
        [
            "이 줄은 충분히 길어서 남아야 합니다 정보 포함",
            "짧은 줄",  # <10 chars → dropped
            "목록으로 돌아가기 링크입니다 노이즈",  # noise keyword → dropped
            "작성자 : 홍길동 담당 부서 표기",  # metadata prefix → dropped
            "Copyright 2024 someone All rights reserved",  # noise
            "두번째로 남아야 하는 정상적인 본문 줄 입니다",
        ]
    )
    out = textops.final_text_clean(src).split("\n")
    assert out == [
        "이 줄은 충분히 길어서 남아야 합니다 정보 포함",
        "두번째로 남아야 하는 정상적인 본문 줄 입니다",
    ]


def test_content_quality_buckets():
    assert textops.content_quality("") == 0.0
    long_text = ("word " * 250).strip()  # >1000 chars, no sentences/keywords
    assert textops.content_quality(long_text) == pytest.approx(0.4)
    sent = "This is a long enough sentence. " * 6  # >100 chars, ≥5 sentences
    assert textops.content_quality(sent) == pytest.approx(0.2 + 0.3)
    with_kw = sent + " 설명 내용 정보"
    assert textops.content_quality(with_kw) == pytest.approx(0.2 + 0.3 + 0.2)
    # duplicate lines halve the score via uniqueness ratio
    dup = "a line that is long enough to count ok.\n" * 4
    uniq_ratio = 2 / 5  # 4 identical lines + trailing '' → 2 unique of 5
    assert textops.content_quality(dup) == pytest.approx(
        textops.content_quality(dup.rstrip("\n") + "\n") )


def test_is_low_quality_text():
    # <5 lines → never flagged
    assert not textops.is_low_quality_text("a\nb\nc\nd")
    listy = "\n".join(f"notice {i} 2024-01-0{i%9+1}" for i in range(10))
    assert textops.is_low_quality_text(listy)
    prose = "\n".join(
        "This paragraph line is definitely longer than fifty characters in total length."
        for _ in range(10)
    )
    assert not textops.is_low_quality_text(prose)


# ---------------------------------------------------------- linkfilter
def test_link_filter():
    assert linkfilter.is_link_relevant("공지사항", "http://a.test/bbs/1")
    assert not linkfilter.is_link_relevant("로그인", "http://a.test/bbs/1")
    assert not linkfilter.is_link_relevant("notice", "http://a.test/member/join")
    assert not linkfilter.is_link_relevant("notice", "http://a.test/f.pdf")
    texts = ["공지", "로그인", "뉴스"]
    us = ["http://a.test/a", "http://a.test/b", "http://a.test/c.zip"]
    assert linkfilter.relevance_mask(texts, us).to_pylist() == [True, False, False]


# --------------------------------------------------------------- spans
def test_span_roundtrip():
    sp = [
        spans.make_span("text", "본문 텍스트 첫 부분", "", 0),
        spans.make_span("media", "첨부 내용 텍스트", "doc1.pdf", 1),
        spans.make_span("media_failed", "", "bad.hwp", 2),
        spans.make_span("text", "후속 본문", "", 3),
    ]
    rendered = spans.render_main_text(sp)
    assert "--- [첨부 파일 시작: doc1.pdf] ---" in rendered
    assert "--- [첨부 파일 처리 실패: bad.hwp] ---" in rendered
    back = spans.parse_main_text(rendered)
    assert [spans.span_key(s) for s in back] == [spans.span_key(s) for s in sp]
    assert spans.has_media_failure(sp)
    assert not spans.has_media_failure(sp[:2])


# ------------------------------------------------------------- hashing
def test_hashing_deterministic():
    assert hashing.content_sha256("abc") == hashing.content_sha256("abc")
    assert hashing.stable_hash64("x") == hashing.stable_hash64("x")
    mh = hashing.MinHasher(num_perm=64)
    a = hashing.shingle_hashes("the quick brown fox jumps over the lazy dog", n=2)
    b = hashing.shingle_hashes("the quick brown fox jumps over the lazy cat", n=2)
    sig_a, sig_b = mh.signature(a), mh.signature(b)
    est = float(np.mean(sig_a == sig_b))
    true_j = hashing.jaccard(a, b)
    assert abs(est - true_j) < 0.25
    assert hashing.jaccard(a, a) == 1.0


def test_simhash_similarity():
    a = hashing.simhash64("ray data crawler engine with spans and filters")
    b = hashing.simhash64("ray data crawler engine with spans and filter")
    c = hashing.simhash64("completely different words entirely unrelated text")
    assert hashing.hamming64(a, b) < hashing.hamming64(a, c)


def test_rolling_fingerprint_stability():
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    f1 = hashing.rolling_fingerprint(t)
    f2 = hashing.rolling_fingerprint(t)
    assert f1 == f2 and len(f1) > 0


# ------------------------------------------------------------- textstats
def test_language_detection():
    assert textstats.detect_language("금융 시장 현황 및 감독 정책 정보") == "ko"
    assert textstats.detect_language("the cat sat on the mat and the dog") == "en"
    assert textstats.detect_language("") == "und"


def test_token_counts():
    assert textstats.whitespace_token_count("a b  c") == 3
    assert textstats.bpe_token_count("hello, world 123") == 4


# --------------------------------------------------------------- packet
def test_packet_truncation():
    long = "x" * 600
    assert packet.truncate_text(long) == "x" * 500 + "..."
    assert packet.truncate_text("short") == "short"
    p1 = packet.deterministic_packet_id("s", "u", "h")
    p2 = packet.deterministic_packet_id("s", "u", "h")
    assert p1 == p2 and len(p1) == 36


def test_hash_pkey_value_stable_across_arrays():
    """Regression for pandas 2.2's categorize-path instability: the
    SAME key must map to the SAME partition regardless of which other
    values share its array (observed: identical strings hashing
    differently inside different arrays with categorize=True on this
    corpus — silently splitting a key across hash partitions).
    Exercises ASCII, Korean, and mixed arrays plus int keys."""
    import numpy as np

    from crawler_ray.functions.arrow_utils import hash_pkey

    keys = ["alpha", "베타코드", "src0\x00a", "x" * 300]
    ref = {k: int(hash_pkey(np.asarray([k], dtype=object), 64)[0]) for k in keys}
    # embed each key in several very different arrays
    fillers = [
        [f"tok{i}" for i in range(500)],
        [f"문서{i}\x00{i%7}" for i in range(300)],
        ["z"],
    ]
    for filler in fillers:
        for k in keys:
            arr = np.asarray(filler + [k] + filler[:3], dtype=object)
            got = int(hash_pkey(arr, 64)[len(filler)])
            assert got == ref[k], (k, got, ref[k])
    # int path: stable and equal regardless of array contents
    a = int(hash_pkey(np.asarray([12345], dtype=np.int64), 64)[0])
    b = int(hash_pkey(np.arange(1000, dtype=np.int64) * 0 + 12345, 64)[17])
    assert a == b


def test_segment_pairs_kernel():
    """Shared pair-generation kernel: per-group pairs, empty cases,
    and the raise-never-cap guard."""
    import numpy as np
    import pytest

    from crawler_ray.functions.arrow_utils import segment_pairs

    g = np.array([1, 1, 2, 2, 2, 3])
    v = np.array([10, 20, 1, 2, 3, 99])
    a, b = segment_pairs(g, v, max_width=8, label="T")
    assert sorted(zip(a, b)) == [(1, 2), (1, 3), (2, 3), (10, 20)]
    a, b = segment_pairs(np.array([5]), np.array([1]), 8, "T")
    assert len(a) == 0 and len(b) == 0
    a, b = segment_pairs(np.array([], dtype=int), np.array([], dtype=int), 8, "T")
    assert len(a) == 0
    with pytest.raises(ValueError, match="T=2"):
        segment_pairs(np.zeros(3, dtype=int), np.arange(3), 2, "T")
