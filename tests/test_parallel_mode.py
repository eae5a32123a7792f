"""Parallel (per-shard) crawl mode: equivalence with sequential mode,
page sink layout, per-shard checkpoint/resume."""

import pyarrow.parquet as pq
import pytest

from crawler_ray.pipelines.crawl import CrawlEngine
from crawler_ray.sources.synth import demo_web, seeds_table


def _rows(path):
    t = pq.read_table(path, columns=["site", "dispatch_index", "url", "content_sha256"])
    return sorted(
        zip(
            t["site"].to_pylist(),
            t["dispatch_index"].to_pylist(),
            t["url"].to_pylist(),
            t["content_sha256"].to_pylist(),
        )
    )


@pytest.mark.usefixtures("ray_session")
def test_parallel_equals_sequential(tmp_path):
    web = demo_web(n_sites=3, n_pages=60, seed=71)
    seeds = seeds_table(web, max_pages=30).to_pylist()

    seq_dir = str(tmp_path / "seq")
    CrawlEngine(web, seeds, num_shards=2, output_dir=seq_dir).run()

    par_dir = str(tmp_path / "par")
    par = CrawlEngine(web, seeds, num_shards=2, output_dir=par_dir)
    par.run_parallel()

    assert _rows(seq_dir) == _rows(par_dir)
    # shard-partitioned layout exists
    import os

    shards = [d for d in os.listdir(par_dir) if d.startswith("shard=")]
    assert len(shards) >= 1
    # per-partition lineage/metrics recorded
    mt = pq.read_table(par_dir.rstrip("/") + "_metrics.parquet")
    assert mt.num_rows > 0
    assert set(mt.column("partition").to_pylist()) <= {0, 1}
    import pyarrow.compute as pc

    assert pc.sum(mt.column("fetched")).as_py() == len(_rows(par_dir))


@pytest.mark.usefixtures("ray_session")
def test_parallel_checkpoint_resume(tmp_path):
    web = demo_web(n_sites=2, n_pages=60, seed=73)
    seeds = seeds_table(web, max_pages=30).to_pylist()

    full_dir = str(tmp_path / "full")
    CrawlEngine(web, seeds, num_shards=2, output_dir=full_dir).run()

    # interrupted parallel run: monkey-limit by small max_pages? Instead,
    # run fully, then simulate crash-after-wave-2 by restoring from the
    # wave-2 checkpoints in fresh actors and re-running to completion.
    par_dir = str(tmp_path / "par")
    ckpt = str(tmp_path / "ckpt")
    e1 = CrawlEngine(web, seeds, num_shards=2, output_dir=par_dir, checkpoint_dir=ckpt)
    e1.run_parallel()

    import os
    import shutil

    # roll every populated shard back to its wave-1 checkpoint (a shard
    # may own no sites depending on host hashing — skip those)
    populated = [d for d in os.listdir(ckpt) if d.startswith("shard_")]
    assert populated
    for d in populated:
        sdir = os.path.join(ckpt, d)
        for f in sorted(os.listdir(sdir)):
            if f > "wave_00001.pkl":
                os.remove(os.path.join(sdir, f))

    e2 = CrawlEngine(web, seeds, num_shards=2, output_dir=par_dir, checkpoint_dir=ckpt)
    starts = e2.restore_parallel()
    assert all(
        starts[int(d.split("_")[1])] == 2 for d in populated
    )
    # stale page partitions after the restored wave were pruned
    for d in populated:
        i = int(d.split("_")[1])
        sdir = os.path.join(par_dir, f"shard={i}")
        if os.path.isdir(sdir):
            assert all(int(x.split("=")[1]) <= 1 for x in os.listdir(sdir))
    e2.run_parallel(start_waves=starts)

    assert _rows(full_dir) == _rows(par_dir)
