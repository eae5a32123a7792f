"""Text analysis kernels for the training-data pipeline operators:
language ID, token counting, quality signals.

These are scale additions beyond the reference (SURVEY task brief):
each has a vectorized batch form for ``map_batches`` hot paths.
"""

from __future__ import annotations

import re

import numpy as np

_WS_TOKEN = re.compile(r"\S+")
# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols
# (a public GPT-2-style pre-tokenization pattern simplification).
_BPE_TOKEN = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

_HANGUL = re.compile(r"[가-힣]")
_LATIN = re.compile(r"[A-Za-z]")
_CYRILLIC = re.compile(r"[Ѐ-ӿ]")
_CJK = re.compile(r"[一-鿿]")
_KANA = re.compile(r"[぀-ヿ]")

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "por", "para"},
    "it": {"il", "la", "che", "di", "e", "un", "una", "per", "con", "del"},
}

_PUNCT = re.compile(r"[.,;:!?…·'\"()\[\]{}]")


def whitespace_token_count(text: str) -> int:
    return len(_WS_TOKEN.findall(text))


def bpe_token_count(text: str) -> int:
    """Approximate subword token count via a BPE-ish regex pre-tokenizer."""
    return len(_BPE_TOKEN.findall(text))


def detect_language(text: str) -> str:
    """Cheap script+stopword language heuristic.

    Script vote first (ko/zh/ja/ru by unicode ranges); latin-script text
    is resolved by stopword hit-rate over a small per-language list;
    returns 'und' for empty/undecidable text.
    """
    if not text:
        return "und"
    sample = text[:2000]
    n = len(sample)
    if _HANGUL.search(sample) and len(_HANGUL.findall(sample)) / n > 0.05:
        return "ko"
    if _KANA.search(sample):
        return "ja"
    if _CJK.search(sample) and len(_CJK.findall(sample)) / n > 0.05:
        return "zh"
    if _CYRILLIC.search(sample) and len(_CYRILLIC.findall(sample)) / n > 0.05:
        return "ru"
    if not _LATIN.search(sample):
        return "und"
    words = [w.lower() for w in _WS_TOKEN.findall(sample)]
    if not words:
        return "und"
    best, best_hits = "en", -1.0
    for lang, stops in _STOPWORDS.items():
        hits = sum(1 for w in words if w in stops) / len(words)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best if best_hits > 0 else "en"


def quality_signals(text: str) -> dict:
    """Length/punct/stopword-ratio quality features for filtering."""
    n = len(text)
    words = _WS_TOKEN.findall(text)
    n_words = len(words)
    mean_word_len = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    punct = len(_PUNCT.findall(text))
    lowered = [w.lower() for w in words]
    stop_hits = sum(1 for w in lowered if w in _STOPWORDS["en"])
    lines = text.split("\n")
    uniq_lines = len(set(lines)) / len(lines) if lines else 0.0
    return {
        "n_chars": n,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "punct_ratio": (punct / n) if n else 0.0,
        "stopword_ratio": (stop_hits / n_words) if n_words else 0.0,
        "line_uniqueness": uniq_lines,
    }


def token_count_batch(arr) -> np.ndarray:
    return np.array(
        [whitespace_token_count(x or "") for x in arr], dtype=np.int64
    )


def bpe_count_batch(arr) -> np.ndarray:
    return np.array([bpe_token_count(x or "") for x in arr], dtype=np.int64)


def detect_language_batch(arr) -> np.ndarray:
    return np.array([detect_language(x or "") for x in arr], dtype=object)


_GRAM_TOKEN = re.compile(r"[a-z0-9_]+")


def repetition_signals_micro(text: str, micro: int = 1_000_000) -> tuple:
    """Gopher-style repetition signals (Rae et al. 2021, App. A —
    public paper) as integer micro-fractions of total token chars:
    (top2_micro, top3_micro, dup5_micro).

    - topN: chars of the most frequent word N-gram × its count;
    - dup5: chars of ALL word 5-grams with count ≥ 2, summed over
      DISTINCT grams (documented simplification of the paper's
      positional-union rule so the DuckDB SQL twin is exact).

    Numerators are exact ints; one floor division at the end —
    bit-equal across engines.  Kernel shared by
    pipelines.queries.q_repetition_signals and its tests."""
    from collections import Counter

    toks = _GRAM_TOKEN.findall((text or "").lower())
    lens = [len(w) for w in toks]
    total = sum(lens)
    out = []
    for n, mode in ((2, "top"), (3, "top"), (5, "dup")):
        if total == 0 or len(toks) < n:
            out.append(0)
            continue
        c: dict = Counter()
        chars: dict = {}
        for i in range(len(toks) - n + 1):
            g = tuple(toks[i : i + n])
            c[g] += 1
            if g not in chars:
                chars[g] = sum(lens[i : i + n])
        if mode == "top":
            num = max(cnt * chars[g] for g, cnt in c.items())
        else:
            num = sum(cnt * chars[g] for g, cnt in c.items() if cnt >= 2)
        out.append((num * micro) // total)
    return tuple(out)
