"""End-to-end composition: crawl → interleaved pages → worker quality
filter → final documents table (+ incremental refine).

The reference's producer/consumer split (crawled_data directory queue
polled by the LLM worker — llm_processing_worker.py:58-76) becomes:

- batch mode: one streaming Dataset pipeline over the crawl's page
  output (no directory polling — the crawl and the filter are stages
  of one lazy pipeline),
- incremental mode (:func:`refine_new_waves`): the crawl writes
  hive-partitioned ``wave=K`` dirs; a refine manifest records which
  wave partitions have been refined; each call processes only new
  partitions — the directory-queue semantics, resumable and exactly-once
  at wave granularity (the reference's file-move completion semantics
  map to the manifest entry).
"""

from __future__ import annotations

import json
import os

import ray.data as rd
from ray.data import Dataset

from crawler_ray.pipelines.crawl import CrawlEngine
from crawler_ray.pipelines.quality import filter_interleaved


def crawl_and_refine(
    web,
    seeds: list[dict],
    pages_dir: str,
    docs_dir: str | None = None,
    num_shards: int = 2,
    feedback: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    **engine_kwargs,
) -> Dataset:
    """Crawl the (synthetic) web, then refine the crawled pages into the
    final accepted/rejected documents table (input_hint shape + verdict
    columns).  Returns the refined Dataset (written when docs_dir)."""
    prompts = {s["site_identifier"]: s.get("instruction_prompt", "") for s in seeds}
    engine = CrawlEngine(
        web,
        seeds,
        num_shards=num_shards,
        output_dir=pages_dir,
        feedback=feedback,
        **engine_kwargs,
    )
    engine.run()

    # deliberately NOT reading the hive `wave` partition column: its
    # per-fragment type inference is unstable (string vs dict<int32>)
    # and the refine stage doesn't need it
    pages = rd.read_parquet(
        pages_dir, columns=["site", "url", "ok", "spans", "content_sha256"]
    )
    pages = pages.filter(expr="ok == True")

    def to_doc_ids(batch):
        import pyarrow as pa

        return batch.append_column(
            "doc_id", batch["url"]
        ).append_column("site_identifier", batch["site"])

    docs = pages.map_batches(to_doc_ids, batch_format="pyarrow")
    refined = filter_interleaved(
        docs, prompts_by_site=prompts, concurrency=concurrency or _default_pool()
    )
    if docs_dir:
        refined.write_parquet(docs_dir)
        return rd.read_parquet(docs_dir)
    return refined


def _default_pool() -> tuple[int, int]:
    """Autoscaling actor-pool bound derived from the cluster size (no
    hard concurrency pin — a fixed ``2`` would starve the gatekeeper/
    analyzer pools on any larger cluster)."""
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return (1, max(2, ncpu // 2))


# ------------------------------------------------------- incremental
def _manifest_path(docs_dir: str) -> str:
    return docs_dir.rstrip("/") + "_refined_waves.json"


def refine_new_waves(
    pages_dir: str,
    docs_dir: str,
    prompts_by_site: dict[str, str] | None = None,
    default_prompt: str = "",
    concurrency: int | tuple[int, int] | None = None,
) -> list[str]:
    """Process crawl wave partitions that are not yet in the refine
    manifest; returns the list of newly-refined partition names.
    Idempotent per partition (crash before the manifest write → the
    partition is re-refined and its output overwritten)."""
    done: set[str] = set()
    mp = _manifest_path(docs_dir)
    if os.path.exists(mp):
        with open(mp) as f:
            done = set(json.load(f)["waves"])
    waves = sorted(
        d for d in os.listdir(pages_dir) if d.startswith("wave=") and d not in done
    )
    for wave_dir in waves:
        ds = rd.read_parquet(os.path.join(pages_dir, wave_dir))
        ds = ds.filter(expr="ok == True")

        def to_doc(batch):
            return batch.append_column("doc_id", batch["url"]).append_column(
                "site_identifier", batch["site"]
            )

        docs = ds.map_batches(to_doc, batch_format="pyarrow")
        refined = filter_interleaved(
            docs, prompts_by_site=prompts_by_site, default_prompt=default_prompt,
            concurrency=concurrency or _default_pool(),
        )
        # plain (non-hive) partition dir name: the refined rows carry no
        # wave column, so a `wave=` dir would make readers infer a
        # partition column with unstable typing
        refined.write_parquet(os.path.join(docs_dir, wave_dir.replace("=", "_")))
        done.add(wave_dir)
        with open(mp + ".tmp", "w") as f:
            json.dump({"waves": sorted(done)}, f)
        os.replace(mp + ".tmp", mp)
    return waves
