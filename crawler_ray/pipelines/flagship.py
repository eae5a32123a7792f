"""Flagship document-refinement pipeline (the reference worker's
multi-stage filter re-expressed as one streaming Dataset pipeline —
src/agent/llm_processing_worker.py:78-124).

read_parquet(documents, pruned columns)
  → heuristic stage  (vectorized: quality score, low-quality predicate,
                      language, token counts)
  → gatekeeper stage (actor pool — cheap relevance gate)
  → analyzer stage   (actor pool — only gate-passed rows analyzed)
  → verdict + packet projection (accepted/reject_reason columns; the
    rejects stay in-table for metrics/lineage, as SURVEY.md §2.1's
    reject-archiver maps to a rejects table)

Everything streams; nothing materializes the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from crawler_ray.functions.arrow_utils import strip_md
from crawler_ray.functions.textops import content_quality_batch, is_low_quality_batch
from crawler_ray.functions.textstats import detect_language_batch, token_count_batch
from crawler_ray.stages.scoring import RELEVANCE_THRESHOLD, AnalyzerStage, GatekeeperStage

# gate vocabulary matching the synthetic corpus so the two-stage filter
# actually bifurcates (gatekeeper prunes, analyzer thresholds)
DEFAULT_PROMPT = "table query stream window data"


def heuristic_stage(batch: pa.Table) -> pa.Table:
    batch = strip_md(batch)
    texts = batch["text"].to_pylist()
    return (
        batch.append_column(
            "quality_score", pa.array(content_quality_batch(texts), type=pa.float64())
        )
        .append_column(
            "low_quality", pa.array(is_low_quality_batch(texts), type=pa.bool_())
        )
        .append_column(
            "detected_lang",
            pa.array(detect_language_batch(texts), type=pa.string()),
        )
        .append_column("n_tokens", pa.array(token_count_batch(texts), type=pa.int64()))
    )


def verdict_stage(batch: pa.Table) -> pa.Table:
    low = batch["low_quality"].to_numpy(zero_copy_only=False)
    gate = batch["gate_passed"].to_numpy(zero_copy_only=False)
    score = batch["relevance_score"].to_numpy(zero_copy_only=False)
    accepted = (~low) & gate & (score >= RELEVANCE_THRESHOLD)
    reasons = np.where(
        low,
        "low_quality",
        np.where(~gate, "gatekeeper", np.where(accepted, "", "below_threshold")),
    )
    texts = batch["text"].to_pylist()
    truncated = [
        (t[:500] + "...") if t is not None and len(t) > 500 else (t or "") for t in texts
    ]
    return (
        batch.append_column("accepted", pa.array(accepted, type=pa.bool_()))
        .append_column("reject_reason", pa.array(reasons.tolist(), type=pa.string()))
        .append_column("extractedText", pa.array(truncated, type=pa.string()))
    )


def refine_documents(
    sf_dir: str,
    prompt: str = DEFAULT_PROMPT,
    concurrency: int = 4,
    batch_size: int = 1024,
) -> Dataset:
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    # whole-block strip BEFORE any batch_size coalescing: unify_schemas
    # runs when blocks coalesce, and parquet blocks carry unhashable
    # b'pandas' metadata until stripped
    ds = ds.map_batches(strip_md, batch_format="pyarrow")
    ds = ds.map_batches(heuristic_stage, batch_format="pyarrow", batch_size=batch_size)
    # site prompt map: the flat corpus carries `source` as the site key
    prompts = {f"src{i}": prompt for i in range(64)}
    ds = ds.map_batches(
        lambda t: t.append_column(
            "site_identifier", t["source"]
        ).append_column("url", t["source"]),
        batch_format="pyarrow",
    )
    # autoscaling pools (min 1): two fixed-size pools of `concurrency`
    # actors would reserve every CPU on a small cluster and starve the
    # read/consume stages (deadlock) — size to the node, don't squat it
    ds = ds.map_batches(
        GatekeeperStage,
        fn_constructor_args=(prompts,),
        concurrency=(1, concurrency),
        batch_size=batch_size,
        batch_format="pyarrow",
        num_cpus=1,
    )
    ds = ds.map_batches(
        AnalyzerStage,
        fn_constructor_args=(prompts,),
        concurrency=(1, concurrency),
        batch_size=batch_size,
        batch_format="pyarrow",
        num_cpus=1,
    )
    ds = ds.map_batches(verdict_stage, batch_format="pyarrow", batch_size=batch_size)
    return ds
