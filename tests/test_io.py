"""IO helpers: seeds roundtrip, lance gating, context profiles."""

import pyarrow.parquet as pq
import pytest

from crawler_ray.sources.io import HAVE_LANCE, read_seeds, read_table, write_arrow
from crawler_ray.sources.synth import demo_web, seeds_table


def test_seeds_parquet_roundtrip(tmp_path):
    web = demo_web(n_sites=3, n_pages=10)
    seeds = seeds_table(web, max_pages=25, crawl_delay=0.5)
    path = str(tmp_path / "seeds.parquet")
    write_arrow(seeds, path)
    back = read_seeds(path)
    assert back.equals(seeds)
    assert back.column("max_pages").to_pylist() == [25, 25, 25]


def test_seeds_xlsx_gated(tmp_path):
    # openpyxl absent in this env → clear NotImplementedError, not a crash
    p = tmp_path / "prompt.xlsx"
    p.write_bytes(b"not a real xlsx")
    with pytest.raises((NotImplementedError, ValueError, Exception)):
        read_seeds(str(p))


@pytest.mark.usefixtures("ray_session")
def test_read_table_parquet_fallback(tmp_path):
    assert not HAVE_LANCE  # this environment has no lance — parquet path
    web = demo_web(n_sites=1, n_pages=10)
    seeds = seeds_table(web)
    d = str(tmp_path / "t.parquet")
    write_arrow(seeds, d)
    ds = read_table(d, columns=["site_identifier", "base_url"])
    assert ds.count() == 1
    assert set(ds.schema().names) == {"site_identifier", "base_url"}


def test_context_profiles(ray_session):
    from crawler_ray.context import MIB, configure_default, configure_for_wide_rows

    ctx = configure_default()
    assert ctx.enable_progress_bars is False
    ctx2 = configure_for_wide_rows(target_block_mib=192)
    assert ctx2.target_max_block_size == 192 * MIB


@pytest.mark.usefixtures("ray_session")
def test_jsonl_round_trip(tmp_path):
    import json

    import pyarrow as pa
    import ray.data as rd

    from crawler_ray.sources.io import read_jsonl, write_jsonl

    spans = [
        json.dumps([{"kind": "text", "text": "hello", "media_ref": None, "offset": 0}]),
        json.dumps([{"kind": "media", "text": None, "media_ref": "m/1.png", "offset": 0}]),
        json.dumps([]),
    ]
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"], type=pa.string()),
            "spans": pa.array(spans, type=pa.string()),
            "n": pa.array([1, 2, 3], type=pa.int64()),
        }
    )
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(rd.from_arrow(t), out)
    back = read_jsonl(out)
    df = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df["doc_id"].tolist() == ["a", "b", "c"]
    assert df["n"].tolist() == [1, 2, 3]
    # span payloads survive byte-identical (JSON strings in, JSON strings out)
    assert df["spans"].tolist() == spans


@pytest.mark.usefixtures("ray_session")
def test_partitioned_write_and_pruned_read(tmp_path):
    """Hive-partitioned sink by a derived key + partition-pruned read:
    the resumable-output layout (one directory per partition, a failed
    run re-writes only missing partitions; a reader scans only the
    partitions it needs)."""
    import pyarrow as pa
    import ray.data as rd

    t = pa.table(
        {
            "doc_id": pa.array(range(100), type=pa.int64()),
            "lang": pa.array([("en", "de", "fr")[i % 3] for i in range(100)]),
            "n": pa.array([i * 2 for i in range(100)], type=pa.int64()),
        }
    )
    out = str(tmp_path / "parts")
    rd.from_arrow(t).repartition(4).write_parquet(out, partition_cols=["lang"])

    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert dirs == ["lang=de", "lang=en", "lang=fr"]

    # pruned read: only the en partition's files are scanned
    en = rd.read_parquet(os.path.join(out, "lang=en")).to_pandas()
    assert len(en) == 34
    assert sorted(en["doc_id"])[:3] == [0, 3, 6]

    # full read restores the partition column from the path
    full = rd.read_parquet(out).to_pandas()
    assert len(full) == 100 and set(full["lang"]) == {"en", "de", "fr"}
