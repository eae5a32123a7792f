"""Text cleaning, quality scoring, and low-quality predicates.

Each function reproduces one reference kernel bit-for-bit (the exact
regex lists and thresholds are part of the conformance contract):

- ``clean_text_hp``       src/crawler/high_performance_extractor.py:376-407
- ``clean_text_fast``     src/agent/fast_crawler_agent.py:289-307
- ``final_text_clean``    src/crawler/data_extractor_2.py:109-123
- ``content_quality``     src/crawler/high_performance_extractor.py:409-447
- ``is_low_quality_text`` src/agent/llm_processing_worker.py:37-56

All are pure scalar fns; ``*_batch`` variants map them over numpy
object arrays for use inside ``map_batches`` (regexes are compiled once
at module import, so stateless-task dispatch stays cheap).
"""

from __future__ import annotations

import re

import numpy as np

_WS = re.compile(r"\s+")
_MULTI_NL = re.compile(r"\n\s*\n")
_TRIPLE_NL = re.compile(r"(\n\s*){3,}")

# Noise patterns of the high-performance cleaner (applied to the
# whitespace-collapsed text, case-insensitive).
_HP_NOISE = [
    re.compile(r"다운로드|뷰어|첨부파일|목록으로|이전글|다음글|맨위로", re.IGNORECASE),
    re.compile(r"Copyright.*All rights reserved", re.IGNORECASE),
    re.compile(r"찾아오시는 길|개인정보처리방침", re.IGNORECASE),
    re.compile(r"작성자\s*[:：]\s*\S+", re.IGNORECASE),
    re.compile(r"등록일\s*[:：]\s*\d{4}[-/.]\d{1,2}[-/.]\d{1,2}", re.IGNORECASE),
    re.compile(r"조회수\s*[:：]\s*\d+", re.IGNORECASE),
]

# Noise patterns of the fast-agent cleaner.
_FAST_NOISE = [
    re.compile(r"다운로드|뷰어|첨부파일|목록으로|이전글|다음글", re.IGNORECASE),
    re.compile(r"Copyright.*All rights reserved", re.IGNORECASE),
    re.compile(r"개인정보처리방침|이용약관", re.IGNORECASE),
]

# Per-line noise keywords of the data_extractor_2 cleaner (substring).
NOISE_KEYWORDS = (
    "다운로드",
    "뷰어",
    "첨부파일",
    "목록으로",
    "이전글",
    "다음글",
    "맨위로",
    "Copyright",
    "All rights reserved",
    "찾아오시는 길",
    "개인정보처리방침",
    "유용한 정보가 되었나요?",
)

_META_PREFIX = re.compile(r"^\s*(작성자|등록일|조회수|담당부서|키워드|분류)\s*[:\s]")

INFO_KEYWORDS = ("설명", "내용", "정보", "소개", "개요", "현황", "실적", "계획", "전략")

_DATE_PATTERN = re.compile(r"\d{4}-\d{2}-\d{2}")


def clean_text_hp(text: str) -> str:
    """High-performance-extractor cleaner: collapse whitespace, strip
    noise regexes, then drop (post-collapse) lines shorter than 10."""
    if not text:
        return ""
    text = _WS.sub(" ", text)
    text = _MULTI_NL.sub("\n\n", text)
    for pattern in _HP_NOISE:
        text = pattern.sub("", text)
    cleaned = [ln.strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in cleaned if len(ln) >= 10)


def clean_text_fast(text: str) -> str:
    """Fast-agent cleaner: collapse whitespace, 3 noise regexes, strip."""
    if not text:
        return ""
    text = _WS.sub(" ", text)
    for pattern in _FAST_NOISE:
        text = pattern.sub("", text)
    return text.strip()


def final_text_clean(text: str) -> str:
    """data_extractor_2 per-line cleaner: squeeze ≥3 blank lines, drop
    lines <10 chars, noise-keyword lines, and metadata-prefix lines."""
    text = _TRIPLE_NL.sub("\n\n", text)
    out = []
    for line in text.split("\n"):
        stripped = line.strip()
        if not stripped or len(stripped) < 10:
            continue
        if any(kw in stripped for kw in NOISE_KEYWORDS):
            continue
        if _META_PREFIX.match(stripped):
            continue
        out.append(stripped)
    return "\n".join(out)


def content_quality(text: str) -> float:
    """0–1 heuristic quality score: length buckets + sentence-count
    buckets + info-keyword buckets, scaled by line-uniqueness, cap 1.0."""
    if not text:
        return 0.0
    score = 0.0
    text_len = len(text.strip())
    if text_len > 1000:
        score += 0.4
    elif text_len > 500:
        score += 0.3
    elif text_len > 100:
        score += 0.2
    sentence_count = sum(1 for s in text.split(".") if len(s.strip()) > 10)
    if sentence_count >= 5:
        score += 0.3
    elif sentence_count >= 2:
        score += 0.2
    keyword_count = sum(1 for kw in INFO_KEYWORDS if kw in text)
    if keyword_count >= 3:
        score += 0.2
    elif keyword_count >= 1:
        score += 0.1
    lines = text.split("\n")
    if lines:
        score *= len(set(lines)) / len(lines)
    return min(1.0, score)


def is_low_quality_text(text: str) -> bool:
    """List-page detector: ≥70% of lines are short (<50 chars stripped,
    weight 1) or date-bearing (YYYY-MM-DD, weight 0.5).  Texts of <5
    lines are never flagged."""
    lines = text.split("\n")
    if len(lines) < 5:
        return False
    short = 0.0
    for line in lines:
        if len(line.strip()) < 50:
            short += 1
        if _DATE_PATTERN.search(line):
            short += 0.5
    return (short / len(lines)) > 0.7


def _map_str(fn, arr) -> np.ndarray:
    return np.array([fn(x if x is not None else "") for x in arr], dtype=object)


def clean_text_hp_batch(arr) -> np.ndarray:
    return _map_str(clean_text_hp, arr)


def final_text_clean_batch(arr) -> np.ndarray:
    return _map_str(final_text_clean, arr)


def content_quality_batch(arr) -> np.ndarray:
    return np.array(
        [content_quality(x if x is not None else "") for x in arr], dtype=np.float64
    )


def is_low_quality_batch(arr) -> np.ndarray:
    return np.array(
        [is_low_quality_text(x if x is not None else "") for x in arr], dtype=bool
    )
