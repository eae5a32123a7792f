"""HTML parsing + extraction as pure, picklable batch functions.

Reimplements the reference's high-performance extraction profile
(src/crawler/high_performance_extractor.py:262-374) on the stdlib
``html.parser`` (lxml/bs4 are not available in this environment):

1. boilerplate removal (scripts, styles, meta, embedded, frames, forms),
2. title from ``<title>`` else the URL,
3. main content = the highest-text-length element among a priority
   selector list (main, article, #content, #main, .content, .article,
   .post, div[class~=content/article/post], body) after stripping
   script/style/nav/footer/header descendants,
4. links: every ``a[href]`` in document order, skipping ``#``/
   ``javascript:`` hrefs, absolutized, same-netloc only, anchor text
   required non-empty,
5. ``clean_text_hp`` + ``content_quality`` on the selected text.

The alternative scored-candidate profile of the reference
(src/crawler/data_extractor_2.py:44-107) is ``select_content_scored``.

Used as a stateless ``ds.map_batches(parse_batch, batch_format="pyarrow")``
stage — Ray's task pool replaces the reference's ProcessPoolExecutor.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin, urlparse

import pyarrow as pa

from crawler_ray.functions.textops import (
    clean_text_hp,
    content_quality,
    final_text_clean,
)

_VOID = {
    "br", "img", "meta", "link", "input", "hr", "area", "base", "col",
    "embed", "source", "track", "wbr",
}

_CLEANER_DROP = {"script", "style", "meta", "object", "embed", "iframe", "frame", "form"}


class Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict | None = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # Node | str

    # -- traversal -----------------------------------------------------
    def iter(self):
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter()

    def text_content(self) -> str:
        parts: list[str] = []

        def walk(n: "Node"):
            for c in n.children:
                if isinstance(c, str):
                    parts.append(c)
                else:
                    walk(c)

        walk(self)
        return "".join(parts)

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        parts: list[str] = []

        def walk(n: Node):
            for c in n.children:
                if isinstance(c, str):
                    s = c.strip() if strip else c
                    if s:
                        parts.append(s)
                else:
                    walk(c)

        walk(self)
        return separator.join(parts)

    def classes(self) -> list[str]:
        return (self.attrs.get("class") or "").split()

    def remove_descendants(self, tags: set[str]):
        for n in self.iter():
            n.children = [
                c
                for c in n.children
                if not (isinstance(c, Node) and c.tag in tags)
            ]


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def build_tree(html: str) -> Node:
    p = _TreeBuilder()
    p.feed(html)
    p.close()
    return p.root


def clean_boilerplate(root: Node) -> Node:
    """Equivalent of the lxml Cleaner pass (scripts/style/meta/embedded/
    frames/forms dropped)."""
    for n in root.iter():
        n.children = [
            c
            for c in n.children
            if not (isinstance(c, Node) and c.tag in _CLEANER_DROP)
        ]
    return root


def _first(root: Node, tag: str) -> Node | None:
    for n in root.iter():
        if n.tag == tag:
            return n
    return None


def extract_title(root: Node, url: str) -> str:
    t = _first(root, "title")
    if t is not None:
        s = t.text_content().strip()
        if s:
            return s
    return url


_SELECTORS = [
    lambda n: n.tag == "main",
    lambda n: n.tag == "article",
    lambda n: n.attrs.get("id") == "content",
    lambda n: n.attrs.get("id") == "main",
    lambda n: n.attrs.get("class") == "content",
    lambda n: n.attrs.get("class") == "article",
    lambda n: n.attrs.get("class") == "post",
    lambda n: n.tag == "div" and "content" in (n.attrs.get("class") or ""),
    lambda n: n.tag == "div" and "article" in (n.attrs.get("class") or ""),
    lambda n: n.tag == "div" and "post" in (n.attrs.get("class") or ""),
    lambda n: n.tag == "body",
]

_CONTENT_NOISE = {"script", "style", "nav", "footer", "header"}


def select_content_hp(root: Node) -> str:
    """Priority-selector main-content extraction (longest text wins),
    then the hp text cleaner."""
    best, max_score = "", 0
    for match in _SELECTORS:
        for node in list(root.iter()):
            if not match(node):
                continue
            node.remove_descendants(_CONTENT_NOISE)
            text = node.text_content()
            if not text:
                continue
            score = len(text.strip())
            if score > max_score:
                max_score = score
                best = text
    return clean_text_hp(best)


_SCORED_BOILER = {
    "script", "style", "header", "footer", "nav", "aside", "form",
    "button", "iframe", "figure",
}
_NOISE_BLOCK_KEYWORDS = (
    "comment", "related", "share", "social", "extra", "footer", "header",
    "nav", "menu", "button", "author", "widget",
)
_CONTENT_BOOST_KEYWORDS = ("content", "article", "post", "body", "main", "view")


def _content_score(node: Node) -> float:
    """Content-density score: pure_text_len × (1 − link_density²), with a
    1.5× boost for content-ish id/class; <100-char candidates score 0."""
    if node.tag in ("script", "style", "a"):
        return 0.0
    text = node.get_text(strip=True)
    text_length = len(text)
    if text_length < 100:
        return 0.0
    link_text_length = sum(
        len(a.get_text(strip=True)) for a in node.iter() if a.tag == "a"
    )
    link_density = link_text_length / max(1, text_length)
    score = (text_length - link_text_length) * (1 - link_density**2)
    tag_id = (node.attrs.get("id") or "").lower()
    tag_class = " ".join(node.classes()).lower()
    if any(k in tag_id or k in tag_class for k in _CONTENT_BOOST_KEYWORDS):
        score *= 1.5
    return score


def select_content_scored(root: Node) -> str:
    """data_extractor_2 profile: boilerplate strip → best-scoring
    div/article/section → noise-block removal → per-line clean."""
    for n in root.iter():
        n.children = [
            c for c in n.children if not (isinstance(c, Node) and c.tag in _SCORED_BOILER)
        ]
    best, high = None, 0.0
    for node in root.iter():
        if node.tag in ("div", "article", "section"):
            s = _content_score(node)
            if s > high:
                high, best = s, node
    if best is None:
        best = _first(root, "body") or root
    drop = []
    for node in best.iter():
        if node.tag in ("div", "section", "ul", "li", "table"):
            tag_id = (node.attrs.get("id") or "").lower()
            tag_class = " ".join(node.classes()).lower()
            if any(k in tag_id or k in tag_class for k in _NOISE_BLOCK_KEYWORDS):
                drop.append(node)
    drop_set = set(map(id, drop))
    for n in best.iter():
        n.children = [
            c for c in n.children if not (isinstance(c, Node) and id(c) in drop_set)
        ]
    raw = best.get_text(separator="\n", strip=False)
    return final_text_clean(raw)


def extract_links(
    root: Node, current_url: str, base_url: str
) -> list[tuple[str, str]]:
    """All anchors in document order; skip fragment/javascript hrefs;
    absolutize; same-netloc; anchor text required non-empty."""
    base_netloc = urlparse(base_url).netloc
    links: list[tuple[str, str]] = []
    for node in root.iter():
        if node.tag != "a":
            continue
        href = node.attrs.get("href")
        if not href or href.startswith("#") or href.startswith("javascript:"):
            continue
        absolute_url = urljoin(current_url, href)
        if urlparse(absolute_url).netloc != base_netloc:
            continue
        link_text = node.text_content().strip()
        if link_text:
            links.append((absolute_url, link_text))
    return links


def extract_links_with_context(
    root: Node, current_url: str, cap: int = 100
) -> list[dict]:
    """Link-with-context extraction variant (reference
    src/crawler/aio_extractor.py:147-157): every ``a[href]`` in document
    order with anchor text ≥ 2 chars, URL absolutized and
    fragment-stripped, http(s) schemes only (NO same-netloc
    restriction), keeping ``{url, text[:100], context}`` where context
    is the parent element's stripped text capped at 100 chars."""
    out: list[dict] = []

    def walk(node: Node) -> None:
        # node is the parent of each child anchor we visit
        for c in node.children:
            if not isinstance(c, Node):
                continue
            if c.tag == "a":
                href = c.attrs.get("href")
                if href:
                    text = c.text_content().strip()
                    if text and len(text) >= 2:
                        full = urljoin(current_url, href).split("#")[0]
                        if urlparse(full).scheme in ("http", "https"):
                            out.append(
                                {
                                    "url": full,
                                    "text": text[:cap],
                                    "context": node.get_text(strip=True)[:cap],
                                }
                            )
            walk(c)

    walk(root)
    return out


def extract_page(
    html: str, url: str, base_url: str, profile: str = "hp"
) -> dict | None:
    """Parse one page → {url, title, main_text, links, quality_score};
    None on parse failure (kept as data, not task failure, upstream)."""
    try:
        root = build_tree(html)
        clean_boilerplate(root)
        title = extract_title(root, url)
        links = extract_links(root, url, base_url)
        if profile == "hp":
            main_text = select_content_hp(root)
        else:
            main_text = select_content_scored(root)
        return {
            "url": url,
            "title": title,
            "main_text": main_text,
            "links": links,
            "quality_score": content_quality(main_text),
        }
    except Exception:
        return None


LINKS_TYPE = pa.list_(pa.struct([("url", pa.string()), ("text", pa.string())]))


def parse_batch(batch: pa.Table, profile: str = "hp") -> pa.Table:
    """Vectorized wrapper: (url, base_url, status, html) →
    (url, ok, title, main_text, links, quality_score) preserving input
    order.  Fetch failures (status != 200 / empty html) stay as rows
    with ok=false so wave ordering is deterministic."""
    urls = batch["url"].to_pylist()
    bases = batch["base_url"].to_pylist()
    statuses = batch["status"].to_pylist()
    htmls = batch["html"].to_pylist()
    ok, titles, texts, links_col, quality = [], [], [], [], []
    for url, base, status, html in zip(urls, bases, statuses, htmls):
        page = None
        if status == 200 and html:
            page = extract_page(html, url, base)
        if page is None:
            ok.append(False)
            titles.append("")
            texts.append("")
            links_col.append([])
            quality.append(0.0)
        else:
            ok.append(True)
            titles.append(page["title"])
            texts.append(page["main_text"])
            links_col.append(
                [{"url": u, "text": t} for u, t in page["links"]]
            )
            quality.append(page["quality_score"])
    out = {
        "url": batch["url"],
        "ok": pa.array(ok, type=pa.bool_()),
        "title": pa.array(titles, type=pa.string()),
        "main_text": pa.array(texts, type=pa.string()),
        "links": pa.array(links_col, type=LINKS_TYPE),
        "quality_score": pa.array(quality, type=pa.float64()),
    }
    for extra in ("site", "dispatch_index", "wave"):
        if extra in batch.column_names:
            out[extra] = batch[extra]
    return pa.table(out)
