"""Span-based quality-filter pipeline — the reference LLM worker's
staged filter over *interleaved* documents (input_hint shape).

Stage order mirrors src/agent/llm_processing_worker.py:78-124 exactly:

  stage 0  media_failed span present        → reject "parse_failure"
           (structured form of the substring test at :88-92)
           + KB failure feedback
  stage 1  list-page heuristic (:95-100)    → reject "low_quality", KB 0
  stage 2  gatekeeper (:103-108)            → reject "gatekeeper",  KB 0
  stage 3  analyzer (:111-119): score ≥ 0.6 → accept + packet fields,
           else reject "below_threshold"; KB learns the score either way

Output: one Dataset with ``accepted`` / ``reject_reason`` columns (the
reject archiver becomes a rejects table — SURVEY.md §2.1), packet
projection fields for accepted rows, and a KB-feedback aggregate
computed as a grouped aggregate over URL patterns (the distributed
form of the reference's per-update JSON writes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

from crawler_ray.functions.spans import has_media_failure, render_main_text
from crawler_ray.functions.textops import is_low_quality_text
from crawler_ray.functions.urls import kb_pattern
from crawler_ray.stages.scoring import (
    RELEVANCE_THRESHOLD,
    mock_analyze,
    mock_gate,
)


class SpanWorkerStage:
    """Actor-pool stage applying worker stages 0–3 per interleaved doc.
    A real deployment swaps ``mock_gate``/``mock_analyze`` for LLM
    clients loaded once per actor in ``__init__``."""

    def __init__(self, prompts_by_site: dict[str, str] | None = None, default_prompt: str = ""):
        self.prompts = prompts_by_site or {}
        self.default_prompt = default_prompt

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch["spans"].to_pylist()
        ids = batch["doc_id"].to_pylist()
        sites = (
            batch["site_identifier"].to_pylist()
            if "site_identifier" in batch.column_names
            else [""] * len(ids)
        )
        accepted, reasons, scores, summaries, keywords, fb = [], [], [], [], [], []
        for doc_id, site, spans in zip(ids, sites, spans_col):
            prompt = self.prompts.get(site, self.default_prompt)
            spans = spans or []
            if has_media_failure(spans):
                accepted.append(False)
                reasons.append("parse_failure")
                scores.append(0.0)
                summaries.append(None)
                keywords.append(None)
                fb.append(-1.0)
                continue
            text = render_main_text(spans)
            if is_low_quality_text(text):
                accepted.append(False)
                reasons.append("low_quality")
                scores.append(0.0)
                summaries.append(None)
                keywords.append(None)
                fb.append(0.0)
                continue
            if not mock_gate(text, prompt):
                accepted.append(False)
                reasons.append("gatekeeper")
                scores.append(0.0)
                summaries.append(None)
                keywords.append(None)
                fb.append(0.0)
                continue
            res = mock_analyze(text, str(doc_id), prompt)
            ok = res["relevance_score"] >= RELEVANCE_THRESHOLD
            accepted.append(ok)
            reasons.append("" if ok else "below_threshold")
            scores.append(res["relevance_score"])
            summaries.append(res["summary"])
            keywords.append(res["keywords"])
            fb.append(res["relevance_score"])
        return (
            batch.append_column("accepted", pa.array(accepted, type=pa.bool_()))
            .append_column("reject_reason", pa.array(reasons, type=pa.string()))
            .append_column("relevance_score", pa.array(scores, type=pa.float64()))
            .append_column("summary", pa.array(summaries, type=pa.string()))
            .append_column("keywords", pa.array(keywords, type=pa.list_(pa.string())))
            .append_column("fb_score", pa.array(fb, type=pa.float64()))
        )


def filter_interleaved(
    ds: Dataset,
    prompts_by_site: dict[str, str] | None = None,
    default_prompt: str = "",
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 512,
) -> Dataset:
    return ds.map_batches(
        SpanWorkerStage,
        fn_constructor_args=(prompts_by_site, default_prompt),
        concurrency=concurrency if isinstance(concurrency, tuple) else (1, concurrency),
        batch_size=batch_size,
        batch_format="pyarrow",
        num_cpus=1,
    )


def kb_feedback_aggregate(filtered: Dataset, url_col: str = "doc_id") -> Dataset:
    """The KB update as a grouped aggregate: per URL pattern, summed
    scores / counts / failure counts (mergeable partials — the
    distributed equivalent of knowledge_base.py:43-59)."""

    def to_updates(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pylist()
        fb = batch["fb_score"].to_pylist()
        pats, sc, cnt, fail = [], [], [], []
        for u, s in zip(urls, fb):
            if s is None:
                continue
            pats.append(kb_pattern(str(u)))
            if s < 0:
                sc.append(0.0)
                cnt.append(0)
                fail.append(1)
            else:
                sc.append(s)
                cnt.append(1)
                fail.append(0)
        return pa.table(
            {
                "pattern": pa.array(pats, type=pa.string()),
                "score": pa.array(sc, type=pa.float64()),
                "cnt": pa.array(cnt, type=pa.int64()),
                "fail": pa.array(fail, type=pa.int64()),
            }
        )

    agg = (
        filtered.map_batches(to_updates, batch_format="pyarrow")
        .groupby("pattern")
        .aggregate(
            Sum("score", alias_name="total_score"),
            Sum("cnt", alias_name="count"),
            Sum("fail", alias_name="failure_count"),
        )
    )

    def finalize(df: pd.DataFrame) -> pa.Table:
        from crawler_ray.functions.arrow_utils import table_from_pandas

        df["avg_score"] = np.where(
            df["count"] > 0, (df["total_score"] / df["count"]).round(3), 0.0
        )
        return table_from_pandas(df)

    return agg.map_batches(finalize, batch_format="pandas")
