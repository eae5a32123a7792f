"""Multi-stage content scoring: heuristic gate → LLM gatekeeper →
deep analysis (reference: src/agent/llm_processing_worker.py:78-124,
src/llm/llm_client.py:38-97).

The two LLM stages are actor-pool ``map_batches`` classes so a real
model/client would be loaded once per actor; here they are seeded
deterministic stand-ins (FIXTURES.md F6):

- gatekeeper: token-overlap between the site's instruction prompt and
  ``text[:1500]`` (the reference's prompt-slice constant),
- analyzer: ``{summary, keywords, relevance_score}`` derived from a
  hash of (url, prompt) plus content signals, so threshold filtering
  (≥0.6) and KB feedback are exactly reproducible across engine,
  oracle, and retries.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from crawler_ray.functions.hashing import tokens_of
from crawler_ray.functions.packet import ANALYZE_TRUNCATE, GATE_TRUNCATE
from crawler_ray.functions.textops import is_low_quality_text

RELEVANCE_THRESHOLD = 0.6  # config/settings.py:65


def mock_gate(text: str, instruction_prompt: str) -> bool:
    """Deterministic gatekeeper: any prompt token (len>1) present in the
    first 1500 chars of the text."""
    sample = set(tokens_of(text[:GATE_TRUNCATE]))
    prompt_toks = [t for t in tokens_of(instruction_prompt) if len(t) > 1]
    if not prompt_toks:
        return True
    return any(t in sample for t in prompt_toks)


def mock_analyze(text: str, url: str, instruction_prompt: str) -> dict:
    """Deterministic analyzer: relevance in [0,1) from a stable hash of
    (url, prompt), summary = first 80 chars, keywords = 5 most frequent
    long tokens of the analysis slice."""
    h = hashlib.sha256(f"{url}|{instruction_prompt}".encode("utf-8")).digest()
    relevance = round(int.from_bytes(h[:4], "little") / 2**32, 3)
    sample = text[:ANALYZE_TRUNCATE]
    toks = [t for t in tokens_of(sample) if len(t) > 3]
    uniq, counts = (
        np.unique(np.array(toks, dtype=object), return_counts=True)
        if toks
        else (np.array([], dtype=object), np.array([], dtype=np.int64))
    )
    order = np.argsort(-counts, kind="stable")
    keywords = [str(u) for u in uniq[order][:5]]
    return {
        "summary": sample[:80],
        "keywords": keywords,
        "relevance_score": relevance,
        "language": "ko" if any("가" <= c <= "힣" for c in sample) else "en",
    }


def mock_feedback_score(url: str, spans: list[dict], instruction_prompt: str = "") -> float:
    """The score the worker feeds back to the KB for one page — used by
    both the engine and the conformance oracle.  Stage-1/2 rejections
    feed 0 (llm_processing_worker.py:95-108); otherwise the analyzer
    relevance."""
    from crawler_ray.functions.spans import has_media_failure, render_main_text

    if has_media_failure(spans):
        return -1.0  # sentinel: failure feedback (kb.update_failure)
    text = render_main_text(spans)
    if is_low_quality_text(text):
        return 0.0
    if not mock_gate(text, instruction_prompt):
        return 0.0
    return mock_analyze(text, url, instruction_prompt)["relevance_score"]


class GatekeeperStage:
    """Actor-pool stage 2: cheap relevance gate before costly analysis.
    Adds ``gate_passed`` — rows are *not* dropped here so the reject
    pipeline can archive them with a reason."""

    def __init__(self, prompts_by_site: dict[str, str] | None = None):
        self.prompts = prompts_by_site or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        sites = (
            batch["site_identifier"].to_pylist()
            if "site_identifier" in batch.column_names
            else [""] * len(texts)
        )
        passed = [
            mock_gate(t or "", self.prompts.get(s, "")) for t, s in zip(texts, sites)
        ]
        return batch.append_column("gate_passed", pa.array(passed, type=pa.bool_()))


class AnalyzerStage:
    """Actor-pool stage 3: deep analysis -> summary/keywords/relevance.
    Only rows with ``gate_passed`` are analyzed (cost model of the
    reference's two-stage design); gated-out rows get nulls + score 0."""

    def __init__(self, prompts_by_site: dict[str, str] | None = None):
        self.prompts = prompts_by_site or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        urls = batch["url"].to_pylist() if "url" in batch.column_names else [""] * len(texts)
        sites = (
            batch["site_identifier"].to_pylist()
            if "site_identifier" in batch.column_names
            else [""] * len(texts)
        )
        gates = (
            batch["gate_passed"].to_pylist()
            if "gate_passed" in batch.column_names
            else [True] * len(texts)
        )
        summaries, keywords, scores, langs = [], [], [], []
        for text, url, site, gate in zip(texts, urls, sites, gates):
            if not gate:
                # empty (not null) so downstream pandas/tensor conversions
                # of the list column stay well-typed
                summaries.append("")
                keywords.append([])
                scores.append(0.0)
                langs.append("")
                continue
            res = mock_analyze(text or "", url, self.prompts.get(site, ""))
            summaries.append(res["summary"])
            keywords.append(res["keywords"])
            scores.append(res["relevance_score"])
            langs.append(res["language"])
        return (
            batch.append_column("summary", pa.array(summaries, type=pa.string()))
            .append_column("keywords", pa.array(keywords, type=pa.list_(pa.string())))
            .append_column("relevance_score", pa.array(scores, type=pa.float64()))
            .append_column("language", pa.array(langs, type=pa.string()))
        )
