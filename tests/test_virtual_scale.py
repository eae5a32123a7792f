"""The 10^10-URL frontier is *virtual*: pages are a pure function of
(seed, host, page_id), so a crawl over a 10^8-page-per-host × many-host
URL space (≥10^10 ids) materializes nothing but the visited prefix."""

import pytest

from crawler_ray.conformance.reference_bfs import crawl_site_reference
from crawler_ray.pipelines.crawl import CrawlEngine
from crawler_ray.sources.synth import SiteSpec, SyntheticWeb, seeds_table
from crawler_ray.state.bloom import BloomFilter


@pytest.mark.usefixtures("ray_session")
def test_crawl_over_huge_virtual_id_space():
    # 128 hosts × 10^8 ids ≈ 1.3×10^10 virtual URLs; crawl a tiny budget
    sites = [
        SiteSpec(host=f"big{i:03d}.example.test", n_pages=10**8, seed=1000 + i)
        for i in range(128)
    ]
    web = SyntheticWeb(sites[:2])  # two hosts is enough to *crawl*; the
    # id space per host is the scale point
    seeds = seeds_table(web, max_pages=30).to_pylist()
    golden = {s["site_identifier"]: crawl_site_reference(web, s) for s in seeds}
    eng = CrawlEngine(web, seeds, num_shards=1, bloom_capacity=1 << 12)
    eng.run()
    for s in seeds:
        site = s["site_identifier"]
        seen = eng.url_seen(site)
        assert seen == golden[site]["url_seen"]
        # the frontier touched URLs deep in the 10^8 id space
        ids = [int(u.rsplit("/", 1)[1]) for u in seen if "/page/" in u]
        assert max(ids) > 10**6


def test_bloom_memory_envelope_for_1e10():
    """Sizing note (not an allocation test): a 10^10-key Bloom at 1% fp
    is ~11.2 GiB of bits — sharded over 256 frontier shards that is
    ~45 MiB per shard, well inside a worker heap."""
    bf = BloomFilter(capacity=10**10 // 256, fp_rate=0.01)
    per_shard_mib = bf.bits.nbytes / (1 << 20)
    assert 40 < per_shard_mib < 60
