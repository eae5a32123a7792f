"""Parser registry (import-gated) + fetch retry semantics."""

import pyarrow as pa
import pytest

from crawler_ray.functions.docparsers import (
    PARSER_REGISTRY,
    ParserUnavailable,
    parse_attachment,
    register_parser,
)
from crawler_ray.stages.fetch import Fetcher, LiveFetcher


def test_registry_dispatch_and_extension():
    assert parse_attachment(".unknown", b"x") is None
    # real libs absent in this env → ParserUnavailable, never a crash path
    with pytest.raises(ParserUnavailable):
        parse_attachment(".pdf", b"%PDF-1.4")
    with pytest.raises(ParserUnavailable):
        parse_attachment(".hwp", b"\x00")
    # user extension: one entry adds a format
    register_parser(".txt", lambda b: b.decode("utf-8"))
    try:
        assert parse_attachment(".TXT", "안녕".encode()) == "안녕"
        with pytest.raises(ValueError):
            parse_attachment(".txt", b"")  # empty text → failure sink
    finally:
        PARSER_REGISTRY.pop(".txt", None)


class FlakyWeb:
    """5xx twice, then 200 — retry fixture."""

    def __init__(self):
        self.calls = {}

    def fetch(self, url):
        n = self.calls.get(url, 0)
        self.calls[url] = n + 1
        if n < 2:
            return (503, "text/html", "")
        return (200, "text/html", "<html><title>ok</title></html>")


def test_fetcher_retries_transient_failures():
    batch = pa.table({"url": ["http://a.test/1"]})
    out0 = Fetcher(FlakyWeb(), max_retries=0)(batch)
    assert out0["status"][0].as_py() == 503
    out3 = Fetcher(FlakyWeb(), max_retries=3)(batch)
    assert out3["status"][0].as_py() == 200
    assert out3["attempts"][0].as_py() == 3
    # 404s are NOT retried (permanent)
    class NF:
        def fetch(self, url):
            return (404, "text/plain", "")

    out404 = Fetcher(NF(), max_retries=3)(batch)
    assert out404["attempts"][0].as_py() == 1


def test_live_fetcher_gated():
    with pytest.raises(NotImplementedError):
        LiveFetcher()
