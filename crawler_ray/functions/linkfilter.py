"""Link-relevance prefilter (skips LLM evaluation for nav/file links).

Reproduces src/utils/link_filter.py:7-46 of the reference: a link is
worth evaluating only if its anchor text has no navigation keyword, its
URL has no excluded path segment, and it is not a file download.

``relevance_mask`` is the vectorized form (pyarrow regex kernels) used
on the edges table.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EXCLUDED_TEXT_RE = (
    r"로그인|가입|약관|정책|개인정보|이용안내|사이트맵|찾아오시는|채용|문의|고객센터|패밀리사이트"
)
EXCLUDED_URL_RE = r"/login|/member|/join|/policy|/recruit|/sitemap|/auth|/cart|/order"
FILE_EXT_RE = (
    r"\.(pdf|hwp|zip|rar|exe|dmg|jpg|png|gif|mp4|mp3|doc|docx|xls|xlsx|ppt|pptx)$"
)

_TEXT = re.compile(EXCLUDED_TEXT_RE, re.IGNORECASE)
_URL = re.compile(EXCLUDED_URL_RE, re.IGNORECASE)
_EXT = re.compile(FILE_EXT_RE, re.IGNORECASE)


def is_link_relevant(link_text: str, url: str) -> bool:
    if _TEXT.search(link_text):
        return False
    if _URL.search(url):
        return False
    if _EXT.search(url):
        return False
    return True


def relevance_mask(link_texts, urls) -> pa.Array:
    """Vectorized ``is_link_relevant`` over arrays of anchors/URLs."""
    if isinstance(link_texts, (list, np.ndarray)):
        link_texts = pa.array(link_texts, type=pa.string())
    if isinstance(urls, (list, np.ndarray)):
        urls = pa.array(urls, type=pa.string())
    bad_text = pc.match_substring_regex(link_texts, EXCLUDED_TEXT_RE, ignore_case=True)
    bad_url = pc.match_substring_regex(urls, EXCLUDED_URL_RE, ignore_case=True)
    bad_ext = pc.match_substring_regex(urls, FILE_EXT_RE, ignore_case=True)
    ok = pc.invert(pc.or_(pc.or_(bad_text, bad_url), bad_ext))
    return ok
