"""Checkpoint/resume: a crawl killed after wave k and resumed from the
checkpoint produces byte-identical output to an uninterrupted run
(SURVEY.md §5.5)."""

import shutil

import pyarrow.parquet as pq
import pytest

from crawler_ray.pipelines.crawl import CrawlEngine
from crawler_ray.sources.synth import demo_web, seeds_table


@pytest.mark.usefixtures("ray_session")
def test_resume_matches_uninterrupted(tmp_path):
    web = demo_web(n_sites=2, n_pages=80, seed=55)
    seeds = seeds_table(web, max_pages=40).to_pylist()

    full_dir = str(tmp_path / "full")
    full = CrawlEngine(web, seeds, num_shards=2, output_dir=full_dir)
    full.run()
    tf = pq.read_table(full_dir).sort_by(
        [("site", "ascending"), ("dispatch_index", "ascending")]
    )

    part_dir = str(tmp_path / "part")
    ckpt_dir = str(tmp_path / "ckpt")
    e1 = CrawlEngine(web, seeds, num_shards=2, output_dir=part_dir, checkpoint_dir=ckpt_dir)
    e1.run(max_waves=4)
    assert e1.wave == 4

    # crash: fresh engine + actors, restore from the latest checkpoint
    e2 = CrawlEngine(web, seeds, num_shards=2, output_dir=part_dir, checkpoint_dir=ckpt_dir)
    ck = CrawlEngine.latest_checkpoint(ckpt_dir)
    assert ck is not None and ck.endswith("wave_00003")
    assert e2.restore(ck) == 4
    e2.run()

    tp = pq.read_table(part_dir).sort_by(
        [("site", "ascending"), ("dispatch_index", "ascending")]
    )
    cols = ["site", "dispatch_index", "url", "content_sha256"]
    assert tf.select(cols).to_pylist() == tp.select(cols).to_pylist()
    # frontier state equality too: same URL-seen set after resume
    for s in seeds:
        site = s["site_identifier"]
        assert full.url_seen(site) == e2.url_seen(site)


@pytest.mark.usefixtures("ray_session")
def test_checkpoint_blob_roundtrip():
    from crawler_ray.state.frontier import FrontierShardLocal

    web = demo_web(n_sites=1, n_pages=30, seed=9)
    seeds = seeds_table(web, max_pages=10).to_pylist()
    shard = FrontierShardLocal(bloom_capacity=1 << 12)
    shard.add_site(seeds[0])
    rows = shard.plan_wave()
    site = seeds[0]["site_identifier"]
    shard.ingest_results(
        site,
        [
            {
                "url": rows[0]["url"],
                "ok": True,
                "content_sha256": "h1",
                "links": ["http://site00.example.test/page/5"],
            }
        ],
    )
    shard.kb_update(site, [(rows[0]["url"], 0.8)], [])
    blob = shard.checkpoint_blob()

    shard2 = FrontierShardLocal()
    shard2.restore_blob(blob)
    assert shard2.url_seen(site) == shard.url_seen(site)
    assert shard2.kb_table() == shard.kb_table()
    assert shard2.ledger_table() == shard.ledger_table()
    # restored queue continues identically
    assert [r["url"] for r in shard2.plan_wave()] == [r["url"] for r in shard.plan_wave()]
