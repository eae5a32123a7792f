"""URL algebra: identifiers, validity, KB patterns, viewer rewrites.

Semantics match the reference exactly (conformance-critical):
- ``create_site_identifier``: src/config.py:14-25
- ``is_valid_url``: src/utils/url_validator.py:5-14
- ``kb_pattern``: src/feedback/knowledge_base.py:37-41
- ``viewer_file_url`` (PDF-viewer ``?file=`` rewrite):
  src/crawler/data_extractor_2.py:182-187
- attachment-extension registry: src/crawler/data_extractor_2.py:36-40

Vectorized variants (``*_mask``) run on pyarrow arrays with
``pyarrow.compute`` kernels for the hot link-routing path.
"""

from __future__ import annotations

import posixpath
import re
from urllib.parse import parse_qs, unquote, urljoin, urlparse

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# File extensions the attachment parser registry knows how to parse.
ATTACHMENT_EXTS = (".pdf", ".docx", ".xlsx", ".xls", ".pptx", ".hwp")

_NETLOC_RE = re.compile(r"^https?://([^/?#]+)")


def host_of(url: str) -> str:
    """netloc of an absolute URL ('' if not parseable)."""
    m = _NETLOC_RE.match(url)
    return m.group(1) if m else urlparse(url).netloc


def create_site_identifier(url: str) -> str:
    """Derive a stable site identifier from a URL.

    Strip ``www.``; if the domain has >2 labels and the second label is
    not a Korean SLD (``co``/``go``/``or``), use ``{label2}_{label1}``;
    otherwise the first label.  ``-`` → ``_``.
    """
    try:
        netloc = urlparse(url).netloc
        parts = netloc.replace("www.", "").split(".")
        if len(parts) > 2 and parts[1] not in ("co", "go", "or"):
            identifier = f"{parts[1]}_{parts[0]}"
        else:
            identifier = parts[0]
        return identifier.replace("-", "_")
    except Exception:
        return f"site_{hash(url)}"


def is_valid_url(url: str, base_netloc: str) -> bool:
    """Crawlable-link predicate: http(s), same netloc, no fragment,
    no ``javascript:void(0)``."""
    try:
        parsed = urlparse(url)
        if parsed.scheme not in ("http", "https"):
            return False
        if parsed.netloc != base_netloc:
            return False
        if "#" in url or "javascript:void(0)" in url:
            return False
        return True
    except Exception:
        return False


def valid_url_mask(urls: pa.Array, base_netloc: str) -> pa.Array:
    """Vectorized ``is_valid_url`` over a pyarrow string array."""
    if isinstance(urls, (list, tuple, np.ndarray)):
        urls = pa.array(urls, type=pa.string())
    # scheme is case-insensitive (urlparse lowercases it in the scalar
    # predicate); netloc comparison stays case-sensitive to match
    # urlparse netloc equality exactly
    scheme_ok = pc.match_substring_regex(
        urls, r"^(?i:https?)://" + re.escape(base_netloc) + r"([/?].*)?$"
    )
    no_frag = pc.invert(pc.match_substring(urls, "#"))
    no_js = pc.invert(pc.match_substring(urls, "javascript:void(0)"))
    return pc.and_(pc.and_(scheme_ok, no_frag), no_js)


def kb_pattern(url: str) -> str:
    """Knowledge-base key: the URL path, or its parent directory when
    the last path segment looks like a file (contains a ``.``)."""
    try:
        path = urlparse(url).path
        last = path.split("/")[-1]
        if "." in last:
            parent = posixpath.dirname(path)
            return parent if parent else "/"
        return path
    except Exception:
        return "/"


def viewer_file_url(viewer_url: str, base_url: str) -> str | None:
    """Rewrite a document-viewer URL carrying ``?file=<enc>`` to the
    real file URL (absolutized against ``base_url``)."""
    try:
        query_params = parse_qs(urlparse(viewer_url).query)
        if "file" in query_params:
            return urljoin(base_url, unquote(query_params["file"][0]))
    except Exception:
        return None
    return None


def url_extension(url: str) -> str:
    """Lower-cased extension of the URL *path* ('' if none)."""
    path = urlparse(url).path
    _, ext = posixpath.splitext(path)
    return ext.lower()


def is_attachment_url(url: str) -> bool:
    return url_extension(url) in ATTACHMENT_EXTS


def split_links(
    links: list[tuple[str, str]], base_url: str, base_netloc: str
) -> tuple[list[tuple[str, str]], list[str]]:
    """Split raw anchors into (page_links, attachment_urls).

    Viewer ``?file=`` URLs are rewritten to the real file URL;
    attachment URLs must be same-netloc and parseable-extension;
    attachments are deduped in first-seen order within the page.
    (Semantics: the link-routing branch of the reference extractor.)
    """
    page_links: list[tuple[str, str]] = []
    attachments: list[str] = []
    seen = set()
    for absolute_url, text in links:
        real = viewer_file_url(absolute_url, base_url)
        if real is not None:
            if real not in seen:
                seen.add(real)
                attachments.append(real)
            continue
        if (
            is_attachment_url(absolute_url)
            and host_of(absolute_url) == base_netloc
        ):
            if absolute_url not in seen:
                seen.add(absolute_url)
                attachments.append(absolute_url)
            continue
        page_links.append((absolute_url, text))
    return page_links, attachments
