"""Bloom / cuckoo / robots / politeness unit tests."""

import numpy as np

from crawler_ray.state.bloom import BloomFilter
from crawler_ray.state.cuckoo import CuckooFilter
from crawler_ray.state.politeness import PolitenessQueue
from crawler_ray.state.robots import RobotsCache, is_allowed, parse_robots


def test_bloom_no_false_negatives():
    bf = BloomFilter(capacity=5000, fp_rate=0.01)
    items = [f"http://h.test/page/{i}" for i in range(3000)]
    bf.add_many(items)
    assert bf.contains_many(items).all()
    absent = [f"http://h.test/other/{i}" for i in range(3000)]
    fp = bf.contains_many(absent).mean()
    assert fp < 0.05


def test_bloom_roundtrip():
    bf = BloomFilter(capacity=100)
    bf.add_many(["a", "b", "c"])
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert "a" in bf2 and "b" in bf2 and "zz" not in bf2
    assert bf2.count == 3


def test_cuckoo_add_remove():
    cf = CuckooFilter(capacity=2000)
    items = [f"url{i}" for i in range(1000)]
    for it in items:
        assert cf.add(it)
    assert all(it in cf for it in items)
    assert cf.remove("url5")
    assert "url5" not in cf or True  # fp possible but unlikely; count dropped
    assert cf.count == 999
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert "url6" in cf2


def test_robots_parse_and_match():
    rules = parse_robots(
        "User-agent: *\nDisallow: /private/\nAllow: /private/open\n"
        "User-agent: bot\nDisallow: /\n"
    )
    assert is_allowed(rules, "/public/x")
    assert not is_allowed(rules, "/private/x")
    assert is_allowed(rules, "/private/open/x")  # longest prefix wins


def test_robots_cache_fetch_once():
    calls = []

    def fetch(url):
        calls.append(url)
        return "User-agent: *\nDisallow: /no/\n"

    rc = RobotsCache(fetch_fn=fetch)
    assert rc.allowed("http://h.test/yes")
    assert not rc.allowed("http://h.test/no/x")
    assert len(calls) == 1  # cached per host


def test_frontier_priority_ordering():
    """Priority dominates next_allowed in wave planning: a prioritized
    (or KB-boosted) host dispatches first."""
    from crawler_ray.sources.synth import demo_web, seeds_table
    from crawler_ray.state.frontier import FrontierShardLocal

    web = demo_web(n_sites=3, n_pages=20, seed=3)
    seeds = seeds_table(web, max_pages=10).to_pylist()
    shard = FrontierShardLocal()
    for s in seeds:
        shard.add_site(s)
    shard.set_priority(seeds[2]["site_identifier"], -5)
    rows = shard.plan_wave()
    assert rows[0]["site"] == seeds[2]["site_identifier"]

    # KB-driven: high avg_score site gets negative priority
    shard2 = FrontierShardLocal()
    for s in seeds:
        shard2.add_site(s)
    shard2.kb_update(seeds[1]["site_identifier"], [("http://x/bbs/a", 0.9)], [])
    shard2.reprioritize_by_kb()
    rows2 = shard2.plan_wave()
    assert rows2[0]["site"] == seeds[1]["site_identifier"]


def test_failure_record_and_retract():
    """Failed URLs never requeue on rediscovery — until retracted via
    the cuckoo-backed retract_failure (deletion is why it's a cuckoo,
    not a Bloom)."""
    from crawler_ray.sources.synth import demo_web, seeds_table
    from crawler_ray.state.frontier import FrontierShardLocal

    web = demo_web(n_sites=1, n_pages=20, seed=3)
    seeds = seeds_table(web, max_pages=10).to_pylist()
    shard = FrontierShardLocal()
    shard.add_site(seeds[0])
    site = seeds[0]["site_identifier"]
    st = shard.sites[site]
    bad = "http://site00.example.test/page/7"
    shard.record_fetch_failures(site, [bad])
    assert bad in st.retractable

    before = len(st.queue)
    st.enqueue_links([bad], shard.robots)
    assert len(st.queue) == before  # blocked while failed

    shard.retract_failure(site, bad)
    assert bad not in st.failed
    st.enqueue_links([bad], shard.robots)
    assert list(st.queue)[-1] == bad  # requeued after retraction


def test_politeness_budget_and_order():
    pq = PolitenessQueue()
    pq.register("a.test", crawl_delay=1.0)
    pq.register("b.test", crawl_delay=0.5)
    assert pq.budget("a.test", horizon=10.0) == 10
    assert pq.budget("b.test", horizon=10.0) == 20
    pq.reserve("a.test", 10)
    # b has earlier next_allowed → scheduled first
    assert pq.order() == ["b.test", "a.test"]
    st = pq.state()
    pq2 = PolitenessQueue()
    pq2.restore(st)
    assert pq2.order() == ["b.test", "a.test"]


def test_politeness_wall_clock_mode():
    """Wall-clock politeness: budgets and reservations anchor to an
    injected clock; idle time never banks free fetches; wait_time tells
    a live fetcher how long to sleep."""
    from crawler_ray.state.politeness import PolitenessQueue

    t = {"now": 100.0}
    pq = PolitenessQueue(clock=lambda: t["now"])
    pq.register("a.example", crawl_delay=2.0)

    # 10s horizon → 5 fetches of 2s fit
    assert pq.budget("a.example", horizon=10.0) == 5
    assert pq.wait_time("a.example") == 0.0
    nxt = pq.reserve("a.example", 5)
    assert nxt == 110.0
    # still inside the cool-down: nothing fits a 6s horizon (cool-down
    # ends at 110, window would start 10s from now)
    assert pq.budget("a.example", horizon=6.0) == 0
    assert pq.wait_time("a.example") == 10.0
    # clock advances past next_allowed → full budget again, and the next
    # reservation anchors at NOW (no banked credit for the idle gap)
    t["now"] = 200.0
    assert pq.wait_time("a.example") == 0.0
    assert pq.budget("a.example", horizon=10.0) == 5
    assert pq.reserve("a.example", 1) == 202.0

    # partial-window grant: cool-down ends at 202, horizon 3 leaves a
    # 1s window (< delay) — a fetch only needs its START instant inside
    # the horizon, so the budget is 1, not 0
    assert pq.budget("a.example", horizon=3.0) == 1

    # simulated mode unchanged: pure virtual time
    sim = PolitenessQueue()
    sim.register("b.example", crawl_delay=2.0)
    assert sim.budget("b.example", horizon=10.0) == 5
    assert sim.reserve("b.example", 5) == 10.0
    assert sim.wait_time("b.example") == 0.0
