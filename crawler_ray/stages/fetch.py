"""Fetch + attachment-enrichment actor-pool stages.

``Fetcher`` is the stateful fetch stage: a callable class for
``ds.map_batches(Fetcher, fn_constructor_args=(web_ref,), concurrency=N)``
whose per-actor state (the synthetic web, or an HTTP session in a live
deployment) is built once in ``__init__`` and shared across batches.
The synthetic web is broadcast once via ``ray.put`` and read per actor
— never re-shipped per batch.

``AttachmentEnricher`` reproduces the reference's attachment inlining
(src/crawler/data_extractor_2.py:163-180,206-222) structurally: page
links are split into page edges vs attachment/media edges (viewer
``?file=`` rewrite included), attachment text is parsed (synthetically)
and becomes ``media`` spans; parse failures become ``media_failed``
spans.  Output rows carry the final interleaved ``spans`` column and
the ledger content hash.

Fetch failures remain *data* (``status`` column), never task failures,
so wave ordering stays deterministic (SURVEY.md §4 retries row).
"""

from __future__ import annotations

import posixpath
from urllib.parse import urlparse

import pyarrow as pa

import ray

from crawler_ray.functions.hashing import content_sha256
from crawler_ray.functions.spans import (
    attachment_block,
    make_span,
    render_main_text,
    spans_array,
)
from crawler_ray.functions.urls import split_links
from crawler_ray.schemas import SPANS_TYPE
from crawler_ray.stages.parse import LINKS_TYPE


def _resolve(web_or_ref):
    if isinstance(web_or_ref, ray.ObjectRef):
        return ray.get(web_or_ref)
    return web_or_ref


class Fetcher:
    """Actor-pool fetch stage: (url, …) → (+status, +html, +attempts).

    Content-type gating matches the reference fetcher
    (high_performance_extractor.py:201-247): only ``text/html`` 200s
    yield html; everything else becomes an empty-html row.  Transient
    (5xx) failures are retried up to ``max_retries`` times per row —
    the tenacity-retry semantics of the reference
    (aio_extractor.py:24-29) with failures kept as *data* so wave
    ordering stays deterministic.
    """

    def __init__(self, web_or_ref, max_retries: int = 0):
        self.web = _resolve(web_or_ref)
        self.max_retries = max_retries

    def _fetch_once(self, url: str) -> tuple[int, str]:
        status, ctype, body = self.web.fetch(url)
        if status == 200 and "text/html" in ctype:
            return status, body
        return status, ""

    def __call__(self, batch: pa.Table) -> pa.Table:
        statuses, htmls, attempts = [], [], []
        for url in batch["url"].to_pylist():
            status, body = self._fetch_once(url)
            tries = 1
            while status >= 500 and tries <= self.max_retries:
                status, body = self._fetch_once(url)
                tries += 1
            statuses.append(status)
            htmls.append(body)
            attempts.append(tries)
        return (
            batch.append_column("status", pa.array(statuses, type=pa.int16()))
            .append_column("html", pa.array(htmls, type=pa.string()))
            .append_column("attempts", pa.array(attempts, type=pa.int16()))
        )


class LiveFetcher:
    """Live-HTTP fetch actor (API parity with :class:`Fetcher`): an
    aiohttp session built once per actor with the reference's connector
    envelope (pool 100 / 20-per-host, DNS cache 300 s — SURVEY §2.3).
    This sandbox has no network and no aiohttp, so construction raises;
    the class documents exactly what a deployment swaps in.  Pacing: a
    live deployment builds the frontier with
    ``PolitenessQueue(clock=time.monotonic)`` and the fetcher sleeps
    ``politeness.wait_time(host)`` before each host's batch — wall-clock
    enforcement of the same (priority, next_allowed) schedule the
    simulated mode plans."""

    def __init__(self, max_retries: int = 3, timeout_s: float = 30.0):
        try:
            import aiohttp  # type: ignore  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "aiohttp is not installed in this environment; use the "
                "SyntheticWeb Fetcher, or deploy with aiohttp available "
                "(connector: limit=100, limit_per_host=20, ttl_dns_cache=300)"
            ) from e
        self.max_retries = max_retries
        self.timeout_s = timeout_s


class AttachmentEnricher:
    """Actor-pool stage after parse: splits links, parses attachments,
    assembles the interleaved spans column + content hash."""

    def __init__(self, web_or_ref, route_attachments: bool = True, link_cap: int | None = None):
        self.web = _resolve(web_or_ref)
        self.route_attachments = route_attachments
        self.link_cap = link_cap

    def _attachment_spans(
        self, attachments: list[str], offset0: int
    ) -> tuple[list[dict], list[dict]]:
        """Returns (spans, failures): a parse failure both becomes a
        ``media_failed`` span AND a forensics row (reference saves raw
        bytes + .meta.json per failure, data_extractor_2.py:145-161 —
        here the payload lands behind a deterministic object ref)."""
        spans, failures = [], []
        off = offset0
        for url in attachments:
            name = posixpath.basename(urlparse(url).path) or url
            text = self.web.attachment_text(url)
            if text:
                spans.append(make_span("media", text, name, off))
            else:
                spans.append(make_span("media_failed", "", name, off))
                failures.append(
                    {
                        "name": name,
                        "attachment_url": url,
                        "reason": "parse_failed",
                        "payload_ref": f"raw/{content_sha256(url)[:16]}.bin",
                    }
                )
            off += 1
        return spans, failures

    def __call__(self, batch: pa.Table) -> pa.Table:
        links_col = batch["links"].to_pylist()
        texts = batch["main_text"].to_pylist()
        oks = batch["ok"].to_pylist()
        urls = batch["url"].to_pylist()
        bases = batch["base_url"].to_pylist() if "base_url" in batch.column_names else urls

        page_links_out, spans_out, hashes, fails_out = [], [], [], []
        for ok, url, base, text, links in zip(oks, urls, bases, texts, links_col):
            if not ok:
                page_links_out.append([])
                spans_out.append([])
                hashes.append("")
                fails_out.append([])
                continue
            pairs = [(l["url"], l["text"]) for l in (links or [])]
            if self.route_attachments:
                base_netloc = urlparse(base).netloc
                page_links, attachments = split_links(pairs, base, base_netloc)
            else:
                page_links, attachments = pairs, []
            if self.link_cap is not None:
                page_links = page_links[: self.link_cap]
            spans = [make_span("text", text, "", 0)] if text else []
            att_spans, failures = self._attachment_spans(attachments, len(spans))
            spans.extend(att_spans)
            # ledger hash covers the full interleaved text (de2 semantics:
            # attachments are inlined into main_text before hashing)
            content_text = render_main_text(spans)
            page_links_out.append([{"url": u, "text": t} for u, t in page_links])
            spans_out.append(spans)
            hashes.append(content_sha256(content_text) if content_text else "")
            fails_out.append(failures)

        from crawler_ray.schemas import FAILED_ATTACHMENT_STRUCT

        out = {}
        for name in batch.column_names:
            if name in ("links", "html"):
                continue
            out[name] = batch[name]
        out["page_links"] = pa.array(page_links_out, type=LINKS_TYPE)
        out["spans"] = spans_array(spans_out)
        out["content_sha256"] = pa.array(hashes, type=pa.string())
        out["failed_attachments"] = pa.array(
            fails_out, type=pa.list_(FAILED_ATTACHMENT_STRUCT)
        )
        return pa.table(out)


class CrawlWaveStage:
    """Fused fetch→parse→enrich stage: one actor pool per wave instead
    of three (wave latency matters — the crawl is wave-iterative, and
    actor-pool startup is per-Dataset-execution overhead).

    Semantically identical to
    ``map_batches(Fetcher) → map_batches(parse_batch) →
    map_batches(AttachmentEnricher)``; kept fused for the engine's hot
    path, while the individual stages remain the composable API.
    """

    def __init__(self, web_or_ref, route_attachments: bool = True, link_cap: int | None = None):
        self.fetcher = Fetcher(web_or_ref)
        self.enricher = AttachmentEnricher(
            self.fetcher.web, route_attachments, link_cap
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from crawler_ray.stages.parse import parse_batch

        fetched = self.fetcher(batch)
        # parse_batch drops non-carried columns; re-attach base_url for enrich
        parsed = parse_batch(fetched)
        parsed = parsed.append_column("base_url", fetched["base_url"])
        return self.enricher(parsed)


# Worker-global cache for the stateless-task fetch path: Ray worker
# processes are long-lived, so the broadcast web is fetched from the
# object store once per worker (not per wave/batch).  This avoids the
# per-wave actor-pool startup cost of the iterative crawl loop; the
# actor-pool classes above remain the right tool when per-actor state
# is genuinely heavy (live aiohttp sessions, models).
_STAGE_CACHE: dict[str, CrawlWaveStage] = {}


def crawl_wave_stateless(
    batch: pa.Table, web_ref, route_attachments: bool, link_cap: int | None
) -> pa.Table:
    key = f"{getattr(web_ref, 'hex', lambda: id(web_ref))()}|{route_attachments}|{link_cap}"
    stage = _STAGE_CACHE.get(key)
    if stage is None:
        stage = CrawlWaveStage(web_ref, route_attachments, link_cap)
        _STAGE_CACHE[key] = stage
    return stage(batch)
