"""Wall-clock politeness conformance probe (VERDICT r4 item 8).

The frontier's politeness clock has a wall-clock mode
(state/politeness.py: ``clock=time.monotonic``) for live deployments;
this test runs the PARALLEL crawl path with it enabled and measures
per-host dispatch timestamps (the ``t_plan`` lineage column), asserting
the engine never grants a host more fetches than its ``crawl_delay``
budget allows per unit wall time — and that the crawl therefore takes
at least the politeness-mandated wall time.
"""

import time

import pytest

from crawler_ray.pipelines.crawl import CrawlEngine
from crawler_ray.sources.synth import demo_web, seeds_table
from crawler_ray.state.frontier import shard_of

DELAY = 0.15
HORIZON = 0.30
MAX_PAGES = 12


@pytest.mark.usefixtures("ray_session")
def test_parallel_wall_clock_politeness_spacing():
    web = demo_web(n_sites=2, n_pages=40, seed=11)
    seeds = seeds_table(web, max_pages=MAX_PAGES, crawl_delay=DELAY).to_pylist()
    eng = CrawlEngine(
        web,
        seeds,
        num_shards=2,
        wave_horizon=HORIZON,
        wall_clock_politeness=True,
    )
    t_start = time.time()
    res = eng.run_parallel()
    elapsed = time.time() - t_start
    assert res["dispatched"] > 0 and res["saved"] > 0

    # hosts per shard (sites hash to shards; both sites share DELAY)
    hosts_per_shard: dict[int, int] = {}
    for s in seeds:
        host = s["base_url"].split("/")[2]
        i = shard_of(host, eng.num_shards)
        hosts_per_shard[i] = hosts_per_shard.get(i, 0) + 1

    # UPPER bound — per-shard dispatch counts vs the wall-clock budget:
    # by the k-th wave's plan instant t_k, a host may have been granted
    # at most (t_k - t_0 + HORIZON)/DELAY fetches (+1 per wave for the
    # guaranteed-progress grant and plan-RPC timing slack)
    by_shard: dict[int, list[dict]] = {}
    for m in eng.metrics:
        by_shard.setdefault(m["partition"], []).append(m)
    checked_waves = 0
    for shard_idx, ms in by_shard.items():
        n_hosts = hosts_per_shard.get(shard_idx, 0)
        if n_hosts == 0:
            continue
        ms = sorted(ms, key=lambda m: m["wave"])
        t0 = ms[0]["t_plan"]
        cum = 0
        for m in ms:
            cum += m["fetched"]
            allowance = n_hosts * (
                (m["t_plan"] - t0 + HORIZON) / DELAY + 2
            )
            assert cum <= allowance, (
                f"shard {shard_idx} wave {m['wave']}: {cum} fetches granted "
                f"by +{m['t_plan'] - t0:.2f}s exceeds politeness allowance "
                f"{allowance:.1f} (delay={DELAY}, horizon={HORIZON})"
            )
            checked_waves += 1
    assert checked_waves >= 4, "probe needs multiple politeness-paced waves"

    # LOWER bound — pacing is real wall time, not bookkeeping: a host
    # dispatching m pages needs >= (m*DELAY - HORIZON) seconds
    per_host_pages = res["dispatched"] / len(seeds)
    min_elapsed = per_host_pages * DELAY - HORIZON
    assert elapsed >= 0.7 * min_elapsed, (
        f"crawl finished in {elapsed:.2f}s but politeness mandates "
        f">= {min_elapsed:.2f}s — wall-clock pacing not enforced"
    )
