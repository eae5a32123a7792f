"""Crawl-trace conformance: the Ray engine must reproduce the
reference-BFS oracle's crawl order, URL-seen set, span sequences,
ledger, and KB state exactly (SURVEY.md §3.4 / §5)."""

import pyarrow.parquet as pq
import pytest

from crawler_ray.conformance.reference_bfs import crawl_site_reference
from crawler_ray.functions.spans import span_key
from crawler_ray.pipelines.crawl import CrawlEngine
from crawler_ray.sources.synth import demo_web, seeds_table
from crawler_ray.stages.scoring import mock_feedback_score


def _seed_dicts(web, max_pages=40):
    return seeds_table(web, max_pages=max_pages).to_pylist()


def _oracle(web, seeds, **kw):
    return {
        s["site_identifier"]: crawl_site_reference(web, s, **kw) for s in seeds
    }


@pytest.mark.usefixtures("ray_session")
def test_engine_matches_oracle_order_and_seen(tmp_path):
    web = demo_web(n_sites=3, n_pages=80, seed=11)
    seeds = _seed_dicts(web, max_pages=40)
    golden = _oracle(web, seeds)

    out = str(tmp_path / "pages")
    eng = CrawlEngine(web, seeds, num_shards=2, output_dir=out, fetch_concurrency=2)
    eng.run()

    # crawl order: read back the pages output and compare dispatch order
    table = pq.read_table(out, columns=["site", "wave", "dispatch_index", "url"])
    rows = sorted(
        zip(
            table["site"].to_pylist(),
            table["wave"].to_pylist(),
            table["dispatch_index"].to_pylist(),
            table["url"].to_pylist(),
        )
    )
    by_site = {}
    for site, wave, idx, url in rows:
        by_site.setdefault(site, []).append((wave, idx, url))
    for s in seeds:
        site = s["site_identifier"]
        assert by_site[site] == golden[site]["trace"], f"trace mismatch for {site}"
        assert eng.url_seen(site) == golden[site]["url_seen"]

    # ledger equality
    ledger = {}
    for row in eng.ledger_table():
        ledger.setdefault(row["site"], {})[row["url"]] = row["content_sha256"]
    for s in seeds:
        site = s["site_identifier"]
        assert ledger.get(site, {}) == golden[site]["ledger"]


@pytest.mark.usefixtures("ray_session")
def test_engine_span_sequence_equality(tmp_path):
    """Per-row invariant: span sequences (kind, text, media_ref, order)
    equal the oracle's for every saved page."""
    web = demo_web(n_sites=2, n_pages=60, seed=23)
    seeds = _seed_dicts(web, max_pages=30)
    golden = _oracle(web, seeds)

    out = str(tmp_path / "pages")
    eng = CrawlEngine(web, seeds, num_shards=1, output_dir=out)
    eng.run()

    table = pq.read_table(out, columns=["site", "url", "ok", "spans", "content_sha256"])
    engine_pages = {}
    for site, url, ok, spans in zip(
        table["site"].to_pylist(),
        table["url"].to_pylist(),
        table["ok"].to_pylist(),
        table["spans"].to_pylist(),
    ):
        if ok and spans:
            engine_pages[(site, url)] = spans

    n_checked = 0
    for s in seeds:
        site = s["site_identifier"]
        for url, gspans in golden[site]["pages"].items():
            espans = engine_pages.get((site, url))
            assert espans is not None, f"missing page {url}"
            assert [span_key(x) for x in espans] == [span_key(x) for x in gspans]
            n_checked += 1
    assert n_checked > 20
    kinds = {sp["kind"] for spans in engine_pages.values() for sp in spans}
    assert "media" in kinds and "media_failed" in kinds


@pytest.mark.usefixtures("ray_session")
def test_engine_feedback_kb_matches_oracle():
    """Wave-synchronous KB feedback: engine KB == oracle KB when both
    apply the same deterministic worker scores after each wave."""
    web = demo_web(n_sites=2, n_pages=60, seed=7)
    seeds = _seed_dicts(web, max_pages=30)
    prompts = {s["site_identifier"]: s["instruction_prompt"] for s in seeds}

    def fb(site):
        def f(url, spans):
            s = mock_feedback_score(url, spans, prompts[site])
            return s

        return f

    golden = {
        s["site_identifier"]: crawl_site_reference(
            web, s, feedback_fn=fb(s["site_identifier"])
        )
        for s in seeds
    }

    eng = CrawlEngine(web, seeds, num_shards=2, feedback=True)
    eng.run()

    kb_engine = {}
    for row in eng.kb_table():
        site = row.pop("site")
        pattern = row.pop("pattern")
        kb_engine.setdefault(site, {})[pattern] = row
    for s in seeds:
        site = s["site_identifier"]
        gkb = golden[site]["kb"]
        ekb = kb_engine.get(site, {})
        assert ekb == gkb, f"KB mismatch for {site}"


@pytest.mark.usefixtures("ray_session")
def test_fast_profile_conformance(tmp_path):
    web = demo_web(n_sites=2, n_pages=50, seed=31)
    seeds = _seed_dicts(web, max_pages=25)
    golden = {
        s["site_identifier"]: crawl_site_reference(web, s, profile="fast")
        for s in seeds
    }
    out = str(tmp_path / "pages")
    eng = CrawlEngine(web, seeds, num_shards=1, profile="fast", output_dir=out)
    eng.run()
    table = pq.read_table(out, columns=["site", "wave", "dispatch_index", "url"])
    by_site = {}
    for site, wave, idx, url in sorted(
        zip(
            table["site"].to_pylist(),
            table["wave"].to_pylist(),
            table["dispatch_index"].to_pylist(),
            table["url"].to_pylist(),
        )
    ):
        by_site.setdefault(site, []).append((wave, idx, url))
    for s in seeds:
        site = s["site_identifier"]
        assert by_site[site] == golden[site]["trace"]
        assert eng.url_seen(site) == golden[site]["url_seen"]


@pytest.mark.usefixtures("ray_session")
def test_recrawl_ledger_conformance(tmp_path):
    """Re-crawl with a prior ledger: unchanged pages are skipped (no
    save, no enqueue → the frontier starves early), exactly as the
    oracle with the same preloaded ledger."""
    web = demo_web(n_sites=2, n_pages=60, seed=29)
    seeds = _seed_dicts(web, max_pages=30)

    # first crawl produces the ledgers
    first = {s["site_identifier"]: crawl_site_reference(web, s) for s in seeds}

    golden = {
        s["site_identifier"]: crawl_site_reference(
            web, s, ledger=first[s["site_identifier"]]["ledger"]
        )
        for s in seeds
    }
    out = str(tmp_path / "pages")
    eng = CrawlEngine(web, seeds, num_shards=1, output_dir=out)
    for s in seeds:
        site = s["site_identifier"]
        shard = eng.shards[eng._site_shard[site]]
        import ray as _ray

        _ray.get(shard.preload_ledger.remote(site, first[site]["ledger"]))
    eng.run()

    table = pq.read_table(out, columns=["site", "wave", "dispatch_index", "url"])
    by_site = {}
    for site, wave, idx, url in sorted(
        zip(
            table["site"].to_pylist(),
            table["wave"].to_pylist(),
            table["dispatch_index"].to_pylist(),
            table["url"].to_pylist(),
        )
    ):
        by_site.setdefault(site, []).append((wave, idx, url))
    for s in seeds:
        site = s["site_identifier"]
        assert by_site[site] == golden[site]["trace"]
        assert eng.url_seen(site) == golden[site]["url_seen"]
        # the re-crawl is drastically shorter: seed unchanged → starve
        assert len(golden[site]["trace"]) < len(first[site]["trace"])
        # nothing re-saved (all content unchanged)
        assert golden[site]["pages"] == {}


@pytest.mark.usefixtures("ray_session")
def test_politeness_budget_conformance(tmp_path):
    """Same politeness budget on both sides (north_rule phrasing): a
    wave horizon of 3 s at delay 1 s caps each host to 3 fetches/wave;
    the engine must match an oracle capped identically."""
    web = demo_web(n_sites=2, n_pages=60, seed=17)
    seeds = _seed_dicts(web, max_pages=24)
    golden = {
        s["site_identifier"]: crawl_site_reference(web, s, batch_cap=3)
        for s in seeds
    }
    out = str(tmp_path / "pages")
    eng = CrawlEngine(web, seeds, num_shards=1, output_dir=out, wave_horizon=3.0)
    eng.run()
    table = pq.read_table(out, columns=["site", "wave", "dispatch_index", "url"])
    by_site = {}
    for site, wave, idx, url in sorted(
        zip(
            table["site"].to_pylist(),
            table["wave"].to_pylist(),
            table["dispatch_index"].to_pylist(),
            table["url"].to_pylist(),
        )
    ):
        by_site.setdefault(site, []).append((wave, idx, url))
    for s in seeds:
        site = s["site_identifier"]
        assert by_site[site] == golden[site]["trace"]
        assert eng.url_seen(site) == golden[site]["url_seen"]
    # no wave exceeded the budget
    waves = {}
    for site, rows in by_site.items():
        for wave, _, _ in rows:
            waves[(site, wave)] = waves.get((site, wave), 0) + 1
    assert max(waves.values()) <= 3


@pytest.mark.usefixtures("ray_session")
def test_robots_filtering():
    """With robots enabled the engine matches a robots-aware oracle
    EXACTLY (trace-equivalent frontier), and never sees a disallowed
    URL (additive capability, not in ref)."""
    from crawler_ray.state.robots import is_allowed, parse_robots
    from urllib.parse import urlparse

    web = demo_web(n_sites=1, n_pages=60, seed=5, private_rate=0.3)
    seeds = _seed_dicts(web, max_pages=30)

    rules_by_host = {
        h: parse_robots(web.robots_txt(h)) for h in web.sites
    }

    def allow(url: str) -> bool:
        p = urlparse(url)
        return is_allowed(rules_by_host[p.netloc], p.path or "/")

    golden = {
        s["site_identifier"]: crawl_site_reference(web, s, allow_fn=allow)
        for s in seeds
    }
    eng = CrawlEngine(web, seeds, num_shards=1, robots_enabled=True)
    eng.run()
    site = seeds[0]["site_identifier"]
    seen = eng.url_seen(site)
    assert all("/private/" not in u for u in seen)
    assert seen == golden[site]["url_seen"]
