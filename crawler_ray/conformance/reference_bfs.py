"""Golden-trace oracle: a faithful, single-process reimplementation of
the reference crawler's BFS control flow (SURVEY.md §3.4 rules).

Reproduces, per site:
1. FIFO frontier; seed = base_url, pre-marked visited
   (fast_crawler_agent.py:53-54);
2. dequeue-time KB filters (should_ignore count≥3 ∧ avg<0.4;
   is_problematic failure≥3 — knowledge_base.py:61-67);
3. batch dispatch of ``batch_size`` URLs; results processed in
   submission order (asyncio.gather order preservation);
4. per-page: skip if no content; ledger change-detection; enqueue the
   page's valid, unseen links in document order, first-seen wins;
5. ``max_pages`` counting per profile (hp: dispatched;
   fast: non-empty pages), queue cap 10,000.

The *data plane* (HTML parse, link split, attachment spans) reuses the
same pure kernels as the engine — the oracle's job is to pin the
*control flow* the distributed engine must reproduce.  Output: the
golden crawl trace ``(site, wave, fetch_order, url)``, the final
URL-seen set, per-document spans, ledger, and KB states.
"""

from __future__ import annotations

import posixpath
from collections import deque
from urllib.parse import urlparse

from crawler_ray.functions.hashing import content_sha256
from crawler_ray.functions.spans import make_span, render_main_text
from crawler_ray.functions.urls import is_valid_url, kb_pattern, split_links
from crawler_ray.stages.parse import extract_page

QUEUE_CAP = 10_000


def _batch_size(profile: str, max_pages: int) -> int:
    if profile == "fast":
        return max(1, min(20, max_pages // 5))
    return max(1, min(100, max_pages // 10))


def crawl_site_reference(
    web,
    config: dict,
    profile: str = "hp",
    route_attachments: bool = True,
    kb: dict | None = None,
    ledger: dict | None = None,
    feedback_fn=None,
    batch_cap: int | None = None,
    allow_fn=None,
) -> dict:
    """Crawl one site with exact reference semantics.

    ``feedback_fn(url, spans) -> float | None`` optionally emulates the
    worker's KB score feedback *synchronously after each wave* (the
    conformance mode the engine matches when feedback is enabled).

    Returns {trace, url_seen, pages, ledger, kb} where trace is a list
    of (wave, fetch_order, url) and pages maps url → span list.
    """
    base_url = config["base_url"]
    base_netloc = urlparse(base_url).netloc
    max_pages = int(config.get("max_pages", 50))
    link_cap = 50 if profile == "fast" else None
    count_dispatched = profile != "fast"
    ledger_add_at_crawl = profile != "fast"

    queue: deque[str] = deque([base_url])
    visited: set[str] = {base_url}
    failed: set[str] = set()
    kb = dict(kb or {})
    ledger = dict(ledger or {})
    pages_counted = 0
    fetch_order = 0
    wave = 0
    trace: list[tuple[int, int, str]] = []
    pages: dict[str, list[dict]] = {}

    def kb_should_ignore(url: str) -> bool:
        e = kb.get(kb_pattern(url))
        return bool(e and e["count"] >= 3 and e["avg_score"] < 0.4)

    def kb_is_problematic(url: str) -> bool:
        e = kb.get(kb_pattern(url))
        return bool(e and e["failure_count"] >= 3)

    def kb_update_score(url: str, score: float) -> None:
        p = kb_pattern(url)
        if not p:
            return
        e = kb.setdefault(
            p, {"total_score": 0, "count": 0, "avg_score": 0, "failure_count": 0}
        )
        if score < 0:  # -1 sentinel: parse-failure feedback (update_failure)
            e["failure_count"] += 1
            return
        e["total_score"] += score
        e["count"] += 1
        e["avg_score"] = round(e["total_score"] / e["count"], 3)

    bs = _batch_size(profile, max_pages)
    if batch_cap is not None:
        # politeness budget: at most `cap` fetches of one host per wave
        # (engine: PolitenessQueue.budget(horizon) caps plan_wave)
        bs = min(bs, max(1, batch_cap))

    while queue and pages_counted < max_pages:
        # -- collect batch (KB filter at dequeue) ----------------------
        batch: list[str] = []
        while len(batch) < bs and queue:
            url = queue.popleft()
            if kb_should_ignore(url):
                continue
            if kb_is_problematic(url):
                continue
            batch.append(url)
        if not batch:
            break
        if count_dispatched:
            pages_counted += len(batch)

        # -- fetch + parse in submission order -------------------------
        wave_scores: list[tuple[str, float]] = []
        for url in batch:
            trace.append((wave, fetch_order, url))
            fetch_order += 1
            status, ctype, body = web.fetch(url)
            page = None
            if status == 200 and "text/html" in ctype and body:
                page = extract_page(body, url, base_url)
            if page is None or not page["main_text"] and not route_attachments:
                continue
            pairs = page["links"]
            if route_attachments:
                page_links, attachments = split_links(pairs, base_url, base_netloc)
            else:
                page_links, attachments = pairs, []
            if link_cap is not None:
                page_links = page_links[:link_cap]
            spans = (
                [make_span("text", page["main_text"], "", 0)]
                if page["main_text"]
                else []
            )
            off = len(spans)
            for a_url in attachments:
                name = posixpath.basename(urlparse(a_url).path) or a_url
                text = web.attachment_text(a_url)
                if text:
                    spans.append(make_span("media", text, name, off))
                else:
                    spans.append(make_span("media_failed", "", name, off))
                off += 1
            content_text = render_main_text(spans)
            if not content_text:
                if not count_dispatched:
                    pass  # empty page never counts on the fast path
                continue
            if not count_dispatched:
                pages_counted += 1
            old = ledger.get(url)
            if old is not None and old == content_sha256(content_text):
                continue
            if ledger_add_at_crawl:
                ledger[url] = content_sha256(content_text)
            pages[url] = spans
            if feedback_fn is not None:
                score = feedback_fn(url, spans)
                if score is not None:
                    wave_scores.append((url, score))
            for link_url, _text in page_links:
                if link_url in visited or link_url in failed:
                    continue
                if not is_valid_url(link_url, base_netloc):
                    continue
                if allow_fn is not None and not allow_fn(link_url):
                    continue  # robots (additive capability, engine parity)
                if len(queue) > QUEUE_CAP:
                    continue
                visited.add(link_url)
                queue.append(link_url)
        # -- wave-synchronous feedback ---------------------------------
        for url, score in wave_scores:
            kb_update_score(url, score)
        wave += 1

    return {
        "trace": trace,
        "url_seen": sorted(visited),
        "pages": pages,
        "ledger": ledger,
        "kb": kb,
    }
