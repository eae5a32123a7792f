"""Deterministic synthetic web + interleaved-document generators.

Everything is a pure function of ``(seed, host, page_id)`` — no state,
no materialized tables — so a 10^10-URL frontier is *virtual*: the
fetch stage computes a page's HTML on demand (FIXTURES.md F2).  Fetch
actors hold only the lightweight :class:`SyntheticWeb` config.

Page anatomy (exercises every reference kernel):
- ``<title>``, ``<nav>`` boilerplate (nav keywords the link filter must
  drop), a ``<div id="content">`` main block scored highest by the
  content-selection heuristic, a footer with Copyright noise lines,
- deterministic body text (some pages are "list pages" — many short
  date-bearing lines — that ``is_low_quality_text`` must reject),
- links in fixed document order: child pages, duplicate links
  (first-seen dedup), invalid links (fragments, javascript:void(0),
  cross-host), nav links, attachment links (``.pdf``/``.hwp``) and
  viewer-style ``?file=`` URLs (the rewrite path),
- deterministic attachment payloads, some of which "fail to parse"
  (→ ``media_failed`` spans).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

_WORDS = (
    "market report policy finance supervision bank notice data credit "
    "insurance stability audit plan review system service digital risk "
    "capital fund exchange growth index rate board committee press "
    "release announcement regulation guide program support measure"
).split()

_KO_SENT = (
    "금융 시장 현황 및 감독 정책 정보 를 제공 합니다",
    "본 자료 는 주요 실적 과 향후 계획 에 대한 설명 입니다",
    "위원회 는 시장 안정 을 위한 전략 과 개요 를 발표 했습니다",
    "소비자 보호 를 위한 제도 개선 내용 과 소개 자료 입니다",
)

_NAV_TEXTS = ("로그인", "사이트맵", "개인정보처리방침", "채용안내", "고객센터")


def _h(*parts) -> int:
    """Deterministic 64-bit hash of heterogeneous parts."""
    s = "\x1f".join(str(p) for p in parts)
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


@dataclass(frozen=True)
class SiteSpec:
    """Parameters of one synthetic host (all content derives from these)."""

    host: str
    n_pages: int = 200          # URL id space of the host
    fanout: int = 8             # child links per page
    seed: int = 42
    list_page_rate: float = 0.2  # fraction of pages that look like list pages
    fail_rate: float = 0.05      # HTTP failure rate (404/500)
    attach_rate: float = 0.3     # pages carrying attachment links
    attach_fail_rate: float = 0.3  # attachments whose parse fails
    dup_link_rate: float = 0.25  # extra duplicate links
    cross_host_rate: float = 0.15
    disallow_prefix: str = "/private"  # robots-disallowed subtree
    private_rate: float = 0.1    # pages living under the disallowed prefix
    page_weight: int = 1         # body-size multiplier (bench realism:
                                 # real pages are 10-100× this template)

    def base_url(self) -> str:
        return f"http://{self.host}/page/0"

    def page_url(self, page_id: int) -> str:
        r = _h(self.seed, self.host, "private", page_id) % 1000
        if page_id != 0 and r < self.private_rate * 1000:
            return f"http://{self.host}{self.disallow_prefix}/page/{page_id}"
        return f"http://{self.host}/page/{page_id}"


class SyntheticWeb:
    """A picklable, stateless 'internet' serving deterministic pages.

    ``fetch(url)`` → ``(status:int, content_type:str, body:str)``.
    """

    def __init__(self, sites: list[SiteSpec]):
        self.sites = {s.host: s for s in sites}

    # -- helpers -------------------------------------------------------
    def _page_id(self, url: str) -> int | None:
        try:
            tail = url.rsplit("/page/", 1)
            if len(tail) != 2:
                return None
            return int(tail[1].split("?")[0])
        except ValueError:
            return None

    def robots_txt(self, host: str) -> str:
        spec = self.sites.get(host)
        if spec is None:
            return "User-agent: *\nDisallow:\n"
        return f"User-agent: *\nDisallow: {spec.disallow_prefix}/\n"

    def _body_text(self, spec: SiteSpec, page_id: int) -> list[str]:
        """Deterministic paragraph lines for the content block."""
        r = _h(spec.seed, spec.host, "kind", page_id) % 1000
        lines: list[str] = []
        if r < spec.list_page_rate * 1000 and page_id != 0:
            # list page: short date-bearing rows
            for j in range(12):
                d = _h(spec.seed, page_id, "d", j)
                lines.append(
                    f"notice {d % 97} 2024-{1 + d % 12:02d}-{1 + d % 28:02d}"
                )
        else:
            n_sent = (3 + _h(spec.seed, page_id, "ns") % 6) * spec.page_weight
            for j in range(n_sent):
                hj = _h(spec.seed, spec.host, page_id, "s", j)
                words = [_WORDS[(hj >> (k * 5)) % len(_WORDS)] for k in range(9)]
                lines.append(" ".join(words).capitalize() + " for the quarter.")
            ko = _KO_SENT[_h(spec.seed, page_id, "ko") % len(_KO_SENT)]
            lines.append(ko + " 자세한 내용 은 본문 을 참고 하십시오")
        return lines

    def _links(self, spec: SiteSpec, page_id: int) -> list[tuple[str, str]]:
        """(href, anchor_text) in fixed document order."""
        out: list[tuple[str, str]] = []
        for j in range(spec.fanout):
            child = _h(spec.seed, spec.host, "child", page_id, j) % spec.n_pages
            out.append((spec.page_url(child), f"article {child} 안내"))
            if _h(spec.seed, page_id, "dup", j) % 1000 < spec.dup_link_rate * 1000:
                out.append((spec.page_url(child), f"related {child}"))
        # invalid / filtered links in deterministic positions
        out.append((f"http://{spec.host}/page/{page_id}#top", "맨위로 이동합니다"))
        out.append(("javascript:void(0)", "메뉴 열기 버튼"))
        other_hosts = [h for h in self.sites if h != spec.host]
        if other_hosts and _h(spec.seed, page_id, "x") % 1000 < spec.cross_host_rate * 1000:
            oh = other_hosts[_h(spec.seed, page_id, "xh") % len(other_hosts)]
            out.append((f"http://{oh}/page/0", "external partner site"))
        nav = _NAV_TEXTS[_h(spec.seed, page_id, "nav") % len(_NAV_TEXTS)]
        out.append((f"http://{spec.host}/member/login", nav))
        # attachments
        if _h(spec.seed, page_id, "att") % 1000 < spec.attach_rate * 1000:
            fid = _h(spec.seed, page_id, "fid") % 10_000
            out.append((f"http://{spec.host}/files/doc{fid}.pdf", "보고서 다운로드"))
            if fid % 3 == 0:
                out.append(
                    (
                        f"http://{spec.host}/viewer?file=%2Ffiles%2Fann{fid}.hwp",
                        "공고문 뷰어",
                    )
                )
        return out

    def page_html(self, spec: SiteSpec, page_id: int) -> str:
        lines = self._body_text(spec, page_id)
        body = "\n".join(f"<p>{ln}</p>" for ln in lines)
        anchors = "\n".join(
            f'<a href="{href}">{text}</a>' for href, text in self._links(spec, page_id)
        )
        return (
            "<html><head><title>"
            f"Page {page_id} — {spec.host}"
            "</title></head><body>\n"
            '<nav class="menu"><a href="/member/login">로그인</a> 사이트맵 이용안내</nav>\n'
            '<div id="content">\n'
            f"{body}\n{anchors}\n"
            "</div>\n"
            '<footer class="footer">Copyright 2024 synthetic. All rights reserved.\n'
            "찾아오시는 길 안내</footer>\n"
            "</body></html>"
        )

    def attachment_text(self, url: str) -> str | None:
        """Parsed text of an attachment URL, or None when parsing 'fails'
        (deterministic per URL)."""
        host = url.split("/")[2]
        spec = self.sites.get(host)
        if spec is None:
            return None
        if _h(spec.seed, "afail", url) % 1000 < spec.attach_fail_rate * 1000:
            return None
        hj = _h(spec.seed, "atext", url)
        words = [_WORDS[(hj >> (k * 5)) % len(_WORDS)] for k in range(30)]
        return (
            "붙임 자료 의 주요 내용 은 다음 과 같습니다.\n"
            + " ".join(words)
            + "\n세부 실적 및 계획 은 본문 참조."
        )

    def fetch(self, url: str) -> tuple[int, str, str]:
        """(status, content_type, body).  Non-HTML URLs get a binary-ish
        marker body; unknown hosts/pages 404."""
        try:
            host = url.split("/")[2]
        except IndexError:
            return (404, "text/plain", "")
        spec = self.sites.get(host)
        if spec is None:
            return (404, "text/plain", "")
        if url.endswith("/robots.txt"):
            return (200, "text/plain", self.robots_txt(host))
        page_id = self._page_id(url)
        if page_id is None or not (0 <= page_id < spec.n_pages):
            return (404, "text/plain", "")
        r = _h(spec.seed, "status", spec.host, page_id) % 1000
        if page_id != 0 and r < spec.fail_rate * 1000:
            return (500 if r % 2 else 404, "text/html", "")
        return (200, "text/html", self.page_html(spec, page_id))


def demo_web(
    n_sites: int = 4,
    n_pages: int = 200,
    seed: int = 42,
    hot_host: bool = False,
    **overrides,
) -> SyntheticWeb:
    """Small deterministic multi-site web.  ``hot_host=True`` makes
    site00 hold ~50% of all URLs (skew fixture)."""
    sites = []
    for i in range(n_sites):
        pages = n_pages
        if hot_host:
            pages = n_pages * (n_sites - 1) if i == 0 else n_pages
        sites.append(
            SiteSpec(host=f"site{i:02d}.example.test", n_pages=pages, seed=seed + i, **overrides)
        )
    return SyntheticWeb(sites)


def seeds_table(web: SyntheticWeb, max_pages: int = 60, crawl_delay: float = 1.0) -> pa.Table:
    """Seed table (FIXTURES.md F1 shape) for a synthetic web."""
    from crawler_ray.functions.urls import create_site_identifier

    rows = {
        "site_identifier": [],
        "site_name": [],
        "base_url": [],
        "instruction_prompt": [],
        "max_pages": [],
        "crawl_delay": [],
    }
    for host, spec in web.sites.items():
        rows["site_identifier"].append(create_site_identifier(spec.base_url()))
        rows["site_name"].append(f"synthetic {host}")
        rows["base_url"].append(spec.base_url())
        rows["instruction_prompt"].append("금융 정책 및 시장 정보 수집")
        rows["max_pages"].append(max_pages)
        rows["crawl_delay"].append(crawl_delay)
    from crawler_ray.schemas import SEEDS

    return pa.table(rows, schema=SEEDS)


def interleaved_documents(n_docs: int = 200, seed: int = 42) -> pa.Table:
    """F3 fixture: interleaved text+media documents in the input_hint
    shape (doc_id, spans) with mixed kinds and boilerplate lines."""
    from crawler_ray.functions.spans import make_span, spans_array

    rng = np.random.default_rng(seed)
    doc_ids, span_rows = [], []
    for i in range(n_docs):
        n_spans = int(rng.integers(1, 9))
        spans = []
        for off in range(n_spans):
            kind_roll = rng.random()
            if kind_roll < 0.6:
                words = rng.choice(_WORDS, size=12).tolist()
                ko = _KO_SENT[int(rng.integers(0, len(_KO_SENT)))]
                text = " ".join(words) + "\n" + ko + "\n다운로드 안내"
                spans.append(make_span("text", text, "", off))
            elif kind_roll < 0.85:
                words = rng.choice(_WORDS, size=20).tolist()
                spans.append(
                    make_span(
                        "media",
                        " ".join(words),
                        f"files/doc{int(rng.integers(0, 5000))}.pdf",
                        off,
                    )
                )
            else:
                spans.append(
                    make_span(
                        "media_failed", "", f"files/bad{int(rng.integers(0, 500))}.hwp", off
                    )
                )
        # canonical form: coalesce ADJACENT text spans — the reference's
        # main_text serialization concatenates text runs verbatim, so
        # two adjacent text spans are indistinguishable after a
        # render→parse round trip; the canonical interleaved table has
        # exactly one text span between media markers (what a real
        # html-main-text + attachment-blocks page produces)
        coalesced: list[dict] = []
        for s in spans:
            if coalesced and s["kind"] == "text" and coalesced[-1]["kind"] == "text":
                coalesced[-1] = make_span(
                    "text",
                    coalesced[-1]["text"] + s["text"],
                    "",
                    coalesced[-1]["offset"],
                )
            else:
                coalesced.append(
                    make_span(s["kind"], s["text"], s["media_ref"], len(coalesced))
                )
        doc_ids.append(f"doc{i:06d}")
        span_rows.append(coalesced)
    return pa.table(
        {"doc_id": pa.array(doc_ids, type=pa.string()), "spans": spans_array(span_rows)}
    )


def link_edges(web: SyntheticWeb) -> pa.Table:
    """Deterministic (src, dst) edge table of the synthetic web's
    crawlable link graph with DENSE int64 node ids (host-offset +
    page id — the shape ``stages/graph.pagerank`` requires).

    Edges are the page-to-page links a crawler would follow: same-host
    child links (duplicates collapsed, as the frontier's first-seen
    dedup would) and cross-host links; fragments, javascript:, nav,
    viewer and attachment links are not nodes of the page graph.
    """
    hosts = sorted(web.sites)
    base: dict[str, int] = {}
    off = 0
    for h in hosts:
        base[h] = off
        off += web.sites[h].n_pages
    src_l: list[int] = []
    dst_l: list[int] = []
    for h in hosts:
        spec = web.sites[h]
        for p in range(spec.n_pages):
            seen: set[int] = set()
            for href, _ in web._links(spec, p):
                if "#" in href or href.startswith("javascript:"):
                    continue
                try:
                    tail = href.split("://", 1)[1]
                except IndexError:
                    continue
                link_host = tail.split("/", 1)[0]
                if link_host not in web.sites:
                    continue
                pid = web._page_id(href)
                if pid is None or not (0 <= pid < web.sites[link_host].n_pages):
                    continue
                nid = base[link_host] + pid
                if nid in seen:
                    continue
                seen.add(nid)
                src_l.append(base[h] + p)
                dst_l.append(nid)
    return pa.table(
        {
            "src": pa.array(src_l, type=pa.int64()),
            "dst": pa.array(dst_l, type=pa.int64()),
        }
    )
