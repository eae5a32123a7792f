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


@pytest.mark.usefixtures("ray_session")
def test_failed_attachments_side_table(tmp_path):
    """An attachment parse failure lands BOTH as a media_failed span in
    the pages table AND as a row in the <out>_failed_attachments
    forensics side table (reference data_extractor_2.py:145-161)."""
    import pyarrow.parquet as pq

    from crawler_ray.pipelines.crawl import CrawlEngine
    from crawler_ray.sources.synth import demo_web, seeds_table

    web = demo_web(n_sites=2, n_pages=80, seed=55)
    seeds = seeds_table(web, max_pages=40).to_pylist()
    out_dir = str(tmp_path / "pages")
    eng = CrawlEngine(web, seeds, num_shards=2, output_dir=out_dir)
    eng.run()

    pages = pq.read_table(out_dir)
    failed_names = set()
    for spans in pages["spans"].to_pylist():
        for s in spans or []:
            if s["kind"] == "media_failed":
                failed_names.add(s["media_ref"])
    assert failed_names, "synthetic web should produce at least one parse failure"
    assert "failed_attachments" not in pages.column_names  # side table, not in-row

    side = pq.read_table(f"{out_dir}_failed_attachments")
    # `wave` is the hive partition column (per-wave lineage for free)
    assert set(side.column_names) == {
        "site", "page_url", "name", "attachment_url", "reason", "payload_ref", "wave"
    }
    assert set(side["name"].to_pylist()) == failed_names
    assert all(r == "parse_failed" for r in side["reason"].to_pylist())
    assert all(p.startswith("raw/") for p in side["payload_ref"].to_pylist())
