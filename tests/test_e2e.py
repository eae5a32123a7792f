"""End-to-end crawl→refine composition + incremental refine mode."""

import pyarrow.parquet as pq
import pytest

from crawler_ray.pipelines.e2e import crawl_and_refine, refine_new_waves
from crawler_ray.sources.synth import demo_web, seeds_table


@pytest.mark.usefixtures("ray_session")
def test_crawl_and_refine(tmp_path):
    web = demo_web(n_sites=2, n_pages=50, seed=41)
    seeds = seeds_table(web, max_pages=20).to_pylist()
    out = crawl_and_refine(
        web, seeds, pages_dir=str(tmp_path / "pages"), docs_dir=str(tmp_path / "docs")
    )
    df = out.select_columns(
        ["doc_id", "site_identifier", "accepted", "reject_reason", "relevance_score"]
    ).to_pandas()
    assert len(df) > 10
    assert df["doc_id"].str.startswith("http://").all()
    assert df["accepted"].any() or (df["reject_reason"] != "").any()
    # verdict consistency
    bad = df[(df["accepted"]) & (df["relevance_score"] < 0.6)]
    assert bad.empty


@pytest.mark.usefixtures("ray_session")
def test_compact_parquet(tmp_path):
    import os

    from crawler_ray.pipelines.crawl import CrawlEngine
    from crawler_ray.sources.io import compact_parquet

    web = demo_web(n_sites=2, n_pages=40, seed=47)
    seeds = seeds_table(web, max_pages=16).to_pylist()
    pages = str(tmp_path / "pages")
    CrawlEngine(web, seeds, num_shards=1, output_dir=pages).run()
    n_files_before = sum(len(fs) for _, _, fs in os.walk(pages))
    n = compact_parquet(pages, str(tmp_path / "compact"))
    t_before = pq.read_table(pages)
    t_after = pq.read_table(str(tmp_path / "compact"))
    assert n == t_before.num_rows == t_after.num_rows
    n_files_after = sum(len(fs) for _, _, fs in os.walk(str(tmp_path / "compact")))
    assert n_files_after < n_files_before
    # content preserved (order-insensitive)
    cols = ["site", "dispatch_index", "url"]
    a = sorted(zip(*[t_before[c].to_pylist() for c in cols]))
    b = sorted(zip(*[t_after[c].to_pylist() for c in cols]))
    assert a == b


@pytest.mark.usefixtures("ray_session")
def test_refine_new_waves_incremental(tmp_path):
    from crawler_ray.pipelines.crawl import CrawlEngine

    web = demo_web(n_sites=2, n_pages=50, seed=43)
    seeds = seeds_table(web, max_pages=20).to_pylist()
    pages = str(tmp_path / "pages")
    docs = str(tmp_path / "docs")
    eng = CrawlEngine(web, seeds, num_shards=1, output_dir=pages)
    eng.run(max_waves=3)

    first = refine_new_waves(pages, docs, default_prompt="table data")
    assert len(first) == 3
    # nothing new → no work
    assert refine_new_waves(pages, docs, default_prompt="table data") == []

    # more crawl waves appear → only the new ones are refined
    eng.run(max_waves=5)
    second = refine_new_waves(pages, docs, default_prompt="table data")
    assert len(second) == 2
    t = pq.read_table(docs)
    assert t.num_rows > 0
    assert "accepted" in t.column_names
