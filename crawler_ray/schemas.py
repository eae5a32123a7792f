"""Arrow schemas for every table the engine produces or consumes.

Mirrors SURVEY.md §7.1.  The ``documents`` spans column is exactly the
BASELINE.json ``input_hint`` shape: one row per document, ``spans`` an
ordered list of ``(kind, text, media_ref, offset)`` structs where
``kind ∈ {text, media, media_failed}`` — the structured form of the
reference's delimiter-interleaved ``main_text``
(reference: src/crawler/data_extractor_2.py:175,180,220-222).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

SPANS_TYPE = pa.list_(SPAN_STRUCT)

SPAN_KINDS = ("text", "media", "media_failed")

SEEDS = pa.schema(
    [
        ("site_identifier", pa.string()),
        ("site_name", pa.string()),
        ("base_url", pa.string()),
        ("instruction_prompt", pa.string()),
        ("max_pages", pa.int32()),
        ("crawl_delay", pa.float64()),
    ]
)

FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("priority", pa.int32()),
        ("wave", pa.int32()),
        ("parent_order", pa.int64()),
        ("link_index", pa.int32()),
        ("discovered_at", pa.int64()),
    ]
)

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("site_identifier", pa.string()),
        ("fetch_order", pa.int64()),
        ("wave", pa.int32()),
        ("status", pa.int16()),
        ("title", pa.string()),
        ("content_sha256", pa.string()),
        ("spans", SPANS_TYPE),
        ("quality_score", pa.float64()),
    ]
)

DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", SPANS_TYPE),
        ("site_identifier", pa.string()),
        ("relevance_score", pa.float64()),
        ("summary", pa.string()),
        ("keywords", pa.list_(pa.string())),
        ("accepted", pa.bool_()),
        ("reject_reason", pa.string()),
    ]
)

# forensics side table for attachment parse failures — the reference
# archives the raw bytes + a .meta.json per failure
# (src/crawler/data_extractor_2.py:145-161); here the payload is an
# object-store/bucket reference, not inlined bytes
FAILED_ATTACHMENT_STRUCT = pa.struct(
    [
        ("name", pa.string()),
        ("attachment_url", pa.string()),
        ("reason", pa.string()),
        ("payload_ref", pa.string()),
    ]
)

FAILED_ATTACHMENTS = pa.schema(
    [
        ("site", pa.string()),
        ("page_url", pa.string()),
        ("name", pa.string()),
        ("attachment_url", pa.string()),
        ("reason", pa.string()),
        ("payload_ref", pa.string()),
    ]
)

KB = pa.schema(
    [
        ("pattern", pa.string()),
        ("total_score", pa.float64()),
        ("count", pa.int64()),
        ("avg_score", pa.float64()),
        ("failure_count", pa.int64()),
    ]
)

LEDGER = pa.schema(
    [
        ("url", pa.string()),
        ("content_sha256", pa.string()),
    ]
)

METRICS = pa.schema(
    [
        ("wave", pa.int32()),
        ("partition", pa.int32()),
        ("fetched", pa.int64()),
        ("parsed", pa.int64()),
        ("filtered", pa.int64()),
        ("accepted", pa.int64()),
        ("wall_s", pa.float64()),
    ]
)
