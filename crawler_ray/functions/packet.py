"""Final data-packet projection.

Reproduces the reference packet builder (src/packet/data_packet.py:8-33)
as a deterministic columnar projection: camelCase-nested structs
flattened to columns, extracted text truncated to 500 chars + "...",
crawl timestamp + 30-day expiry.  Randomness (uuid) and wall-clock are
injectable so tests and distributed replays are reproducible.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

TRUNCATE_AT = 500
EXPIRY_DAYS = 30
GATE_TRUNCATE = 1500   # gatekeeper prompt slice  (src/llm/llm_client.py:43)
ANALYZE_TRUNCATE = 4000  # deep-analysis slice (local) (src/llm/llm_client.py:72-74)


def truncate_text(text: str, limit: int = TRUNCATE_AT) -> str:
    """``text[:500] + '...'`` when longer — exact reference semantics."""
    return text[:limit] + ("..." if len(text) > limit else "")


def deterministic_packet_id(site_identifier: str, url: str, content_hash: str) -> str:
    """Stable stand-in for ``uuid.uuid4()``: packet identity derived from
    (site, url, content) so replays and retries emit identical packets."""
    h = hashlib.sha256(f"{site_identifier}|{url}|{content_hash}".encode()).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


def make_packet(
    agent_id: str,
    config: dict,
    url: str,
    title: str,
    extracted_text: str,
    relevance_score: float,
    language: str,
    summary: str,
    keywords: list[str],
    content_hash: str,
    crawl_time: datetime,
) -> dict:
    """Flat (columnar-friendly) packet row; nested names preserved as
    ``sourceInfo_*`` / ``crawledContent_*`` / ``metadata_*`` prefixes."""
    return {
        "packetId": deterministic_packet_id(
            config.get("site_identifier", ""), url, content_hash
        ),
        "agentId": agent_id,
        "sourceInfo_siteIdentifier": config.get("site_identifier"),
        "sourceInfo_siteName": config.get("site_name"),
        "sourceInfo_baseUrl": config.get("base_url"),
        "sourceInfo_instructionPrompt": config.get("instruction_prompt"),
        "crawledContent_contentUrl": url,
        "crawledContent_contentType": "webpage_text",
        "crawledContent_title": title,
        "crawledContent_extractedText": truncate_text(extracted_text),
        "crawledContent_relevanceScore": relevance_score,
        "crawledContent_language": language,
        "crawledContent_summary": summary,
        "crawledContent_keywords": keywords,
        "metadata_crawlTimestamp": crawl_time.strftime("%Y-%m-%dT%H:%M:%SZ"),
        "metadata_dataExpiryDate": (crawl_time + timedelta(days=EXPIRY_DAYS)).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        ),
        "metadata_sourcePageUrl": url,
    }
