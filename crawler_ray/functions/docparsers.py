"""Attachment document parsers: extension → parser registry.

Mirrors the reference's registry design (data_extractor_2.py:36-40,
126-143): adding a format = one registry entry.  The real parser
libraries (pypdf, python-docx, openpyxl-backed pandas Excel, python-pptx,
pyhwp) are not installed in this environment, so each parser is gated
behind an import-try; without its library a parser raises
:class:`ParserUnavailable` and the attachment flows to the
``media_failed`` span path (exactly the reference's failure sink
behavior, :145-161), never crashing the stage.

``parse_attachment(ext, data)`` is the single dispatch point used by
the enrichment stage; ``register_parser`` is the user-extension hook.
"""

from __future__ import annotations

import io
from collections.abc import Callable


class ParserUnavailable(RuntimeError):
    """The parser library for this format is not installed."""


def _parse_pdf(data: bytes) -> str:
    try:
        from pypdf import PdfReader  # type: ignore
    except ImportError as e:
        raise ParserUnavailable("pypdf not installed") from e
    reader = PdfReader(io.BytesIO(data))
    return "\n".join(t for t in (p.extract_text() for p in reader.pages) if t)


def _parse_docx(data: bytes) -> str:
    try:
        from docx import Document  # type: ignore
    except ImportError as e:
        raise ParserUnavailable("python-docx not installed") from e
    return "\n".join(p.text for p in Document(io.BytesIO(data)).paragraphs if p.text)


def _parse_excel(data: bytes) -> str:
    try:
        import pandas as pd

        xls = pd.ExcelFile(io.BytesIO(data))  # needs openpyxl/xlrd engine
    except ImportError as e:
        raise ParserUnavailable("excel engine not installed") from e
    return "\n\n".join(xls.parse(name).to_string() for name in xls.sheet_names)


def _parse_pptx(data: bytes) -> str:
    try:
        from pptx import Presentation  # type: ignore
    except ImportError as e:
        raise ParserUnavailable("python-pptx not installed") from e
    prs = Presentation(io.BytesIO(data))
    return "\n".join(
        shape.text
        for slide in prs.slides
        for shape in slide.shapes
        if hasattr(shape, "text")
    )


def _parse_hwp(data: bytes) -> str:
    try:
        import hwp5  # type: ignore
    except ImportError as e:
        raise ParserUnavailable("pyhwp not installed") from e
    text = hwp5.HWPFile(io.BytesIO(data)).body.text()
    if not text:
        raise ValueError("extracted HWP text is empty")
    return text


PARSER_REGISTRY: dict[str, Callable[[bytes], str]] = {
    ".pdf": _parse_pdf,
    ".docx": _parse_docx,
    ".xlsx": _parse_excel,
    ".xls": _parse_excel,
    ".pptx": _parse_pptx,
    ".hwp": _parse_hwp,
}


def register_parser(ext: str, fn: Callable[[bytes], str]) -> None:
    """User-extension hook: one entry adds a format (reference §2.10)."""
    PARSER_REGISTRY[ext.lower()] = fn


def parse_attachment(ext: str, data: bytes) -> str | None:
    """Dispatch on extension; None for unregistered formats; raises
    ParserUnavailable / parser errors for the failure-sink path."""
    parser = PARSER_REGISTRY.get(ext.lower())
    if parser is None:
        return None
    text = parser(data)
    if not text:
        raise ValueError("parser returned empty text")
    return text
