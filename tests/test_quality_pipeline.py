"""Span-based worker pipeline over the interleaved fixture (F3)."""

import pyarrow as pa
import pytest

import ray.data as rd

from crawler_ray.pipelines.quality import filter_interleaved, kb_feedback_aggregate
from crawler_ray.sources.synth import interleaved_documents


@pytest.mark.usefixtures("ray_session")
def test_filter_interleaved_stages():
    docs = interleaved_documents(n_docs=120, seed=42)
    ds = rd.from_arrow(docs)
    out = filter_interleaved(ds, default_prompt="table data 정보 내용", concurrency=2)
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    reasons = set(t.column("reject_reason").to_pylist())
    # every stage of the worker filter fires on the fixture
    assert "parse_failure" in reasons
    assert "below_threshold" in reasons or "gatekeeper" in reasons
    acc = t.column("accepted").to_pylist()
    scores = t.column("relevance_score").to_pylist()
    for a, s, r in zip(acc, scores, t.column("reject_reason").to_pylist()):
        if a:
            assert s >= 0.6 and r == ""
    # determinism: rerun produces identical verdicts
    out2 = filter_interleaved(rd.from_arrow(docs), default_prompt="table data 정보 내용", concurrency=2)
    t2 = pa.concat_tables(list(out2.iter_batches(batch_format="pyarrow")))
    assert t.column("accepted").to_pylist() == t2.column("accepted").to_pylist()


@pytest.mark.usefixtures("ray_session")
def test_kb_feedback_aggregate():
    docs = interleaved_documents(n_docs=80, seed=7)
    ds = rd.from_arrow(docs)
    filtered = filter_interleaved(ds, default_prompt="table data", concurrency=2)
    kb = kb_feedback_aggregate(filtered).to_pandas()
    assert {"pattern", "total_score", "count", "failure_count", "avg_score"} <= set(kb.columns)
    assert kb["failure_count"].sum() > 0  # media_failed docs fed failures
    scored = kb[kb["count"] > 0]
    assert ((scored["avg_score"] - (scored["total_score"] / scored["count"]).round(3)).abs() < 1e-9).all()
