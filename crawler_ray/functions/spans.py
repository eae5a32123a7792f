"""Interleaved span column ⇄ delimiter-marked main_text.

The reference represents a page body as a single string where attachment
text is inlined between Korean delimiter markers
(src/crawler/data_extractor_2.py:163-180, appended at :220-222):

    <html main text>
    \n\n--- [첨부 파일 시작: <name>] ---\n<attachment text>\n--- [첨부 파일 끝] ---\n
    \n\n--- [첨부 파일 처리 실패: <name>] ---\n        (on parse failure)

We formalize that as the Arrow column
``spans: list<struct<kind:string, text:string, media_ref:string, offset:int32>>``
with ``kind ∈ {text, media, media_failed}`` (BASELINE.json input_hint).
Round-trip invariant: ``parse_main_text(render_main_text(spans))``
preserves ``(kind, text, media_ref, order)`` per row.
"""

from __future__ import annotations

import re

import pyarrow as pa

from crawler_ray.schemas import SPANS_TYPE

ATTACH_START = "--- [첨부 파일 시작: {name}] ---"
ATTACH_END = "--- [첨부 파일 끝] ---"
ATTACH_FAIL = "--- [첨부 파일 처리 실패: {name}] ---"

_MARK = re.compile(
    r"\n\n--- \[첨부 파일 (시작|처리 실패): (.*?)\] ---\n", re.DOTALL
)
_END = "\n--- [첨부 파일 끝] ---\n"


def make_span(kind: str, text: str, media_ref: str, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def attachment_block(name: str, text: str) -> str:
    """The exact string the reference appends for a parsed attachment."""
    return f"\n\n--- [첨부 파일 시작: {name}] ---\n{text}\n--- [첨부 파일 끝] ---\n"


def attachment_failure_block(name: str) -> str:
    return f"\n\n--- [첨부 파일 처리 실패: {name}] ---\n"


def render_main_text(spans: list[dict]) -> str:
    """Serialize a span sequence to the reference's main_text string.

    ``text`` spans concatenate verbatim; ``media`` spans render as
    delimiter blocks named by ``media_ref``; ``media_failed`` spans as
    failure markers.
    """
    parts: list[str] = []
    for span in sorted(spans, key=lambda s: s["offset"]):
        kind = span["kind"]
        if kind == "text":
            parts.append(span["text"])
        elif kind == "media":
            parts.append(attachment_block(span["media_ref"], span["text"]))
        elif kind == "media_failed":
            parts.append(attachment_failure_block(span["media_ref"]))
        else:
            raise ValueError(f"unknown span kind: {kind!r}")
    return "".join(parts)


def parse_main_text(main_text: str) -> list[dict]:
    """Parse a delimiter-marked main_text back into ordered spans."""
    spans: list[dict] = []
    pos = 0
    offset = 0

    def _push_text(chunk: str):
        nonlocal offset
        if chunk:
            spans.append(make_span("text", chunk, "", offset))
            offset += 1

    for m in _MARK.finditer(main_text):
        _push_text(main_text[pos : m.start()])
        kind, name = m.group(1), m.group(2)
        if kind == "시작":
            end = main_text.find(_END, m.end())
            if end == -1:
                # Unterminated block: treat the rest as attachment text.
                spans.append(make_span("media", main_text[m.end() :], name, offset))
                offset += 1
                pos = len(main_text)
            else:
                spans.append(make_span("media", main_text[m.end() : end], name, offset))
                offset += 1
                pos = end + len(_END)
        else:  # 처리 실패
            spans.append(make_span("media_failed", "", name, offset))
            offset += 1
            pos = m.end()
        if pos > len(main_text):
            break
    _push_text(main_text[pos:])
    return spans


def span_key(span: dict) -> tuple:
    """The per-row conformance invariant: (kind, text, media_ref, order)."""
    return (span["kind"], span["text"], span["media_ref"], span["offset"])


def has_media_failure(spans: list[dict]) -> bool:
    """Structured form of the reference's substring test
    ``"--- 첨부 파일 처리 실패:" in text`` (llm_processing_worker.py:88-92)."""
    return any(s["kind"] == "media_failed" for s in spans)


def text_of_spans(spans: list[dict]) -> str:
    """Concatenated text content (text + parsed media text) in order —
    the string the quality/scoring stages operate on."""
    return render_main_text(spans)


def spans_array(rows: list[list[dict]]) -> pa.Array:
    """Build the Arrow spans column from Python span lists."""
    return pa.array(rows, type=SPANS_TYPE)
