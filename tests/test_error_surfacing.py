"""Error surfacing — reference `tests/test_error_surfacing.py` (4
tests): embedder failures must propagate from add/search instead of
being silently swallowed, and dimension mismatches are rejected up
front (VERDICT r3 item 7)."""

from __future__ import annotations

import pytest

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor


class BrokenEmbedder:
    def __init__(self, dims: int = 16):
        self._dims = dims

    def embed(self, texts):
        raise RuntimeError("embed failed")

    @property
    def dimensions(self):
        return self._dims


class TestBrokenEmbedderOnAdd:
    def test_add_with_broken_embedder_raises(self, spark):
        ext = ScriptedExtractor(
            outputs=[{"facts": ["alice works at acme"], "entities": [],
                      "relations": []}]
        )
        eng = MemoryEngine(spark, extractor=ext, embedder=BrokenEmbedder())
        with pytest.raises(RuntimeError, match="embed failed"):
            eng.add("Alice works at Acme Corp", user_id="u")

    def test_add_raw_with_broken_embedder_raises(self, spark):
        eng = MemoryEngine(spark, embedder=BrokenEmbedder())
        with pytest.raises(RuntimeError, match="embed failed"):
            eng.add("raw text", user_id="u", infer=False)

    def test_failed_add_leaves_store_unchanged(self, spark):
        eng = MemoryEngine(spark, now_fn=lambda: 1_000)
        eng.add("good fact", user_id="u", infer=False)
        eng.embedder = BrokenEmbedder()
        with pytest.raises(RuntimeError):
            eng.add("bad fact", user_id="u", infer=False)
        texts = [r["text"] for r in eng.get_all(user_id="u").collect()]
        assert texts == ["good fact"]  # no partial write from the failure


class TestBrokenEmbedderOnSearch:
    def test_search_with_broken_embedder_raises(self, spark):
        eng = MemoryEngine(spark, now_fn=lambda: 1_000)
        eng.add("a fact", user_id="u", infer=False)
        eng.embedder = BrokenEmbedder()
        with pytest.raises(RuntimeError, match="embed failed"):
            eng.search("a fact", user_id="u")

    def test_search_with_explicit_vec_skips_embedder(self, spark):
        # query_vec path must not touch the embedder at all
        eng = MemoryEngine(spark, now_fn=lambda: 1_000)
        eng.add("a fact", user_id="u", infer=False)
        dims = eng.embedder.dimensions
        eng.embedder = BrokenEmbedder(dims)
        hits = eng.search(
            query_vec=[1.0] + [0.0] * (dims - 1), user_id="u", k=1
        ).collect()
        assert len(hits) == 1


class TestDimensionValidation:
    def test_query_vec_dimension_mismatch_rejected(self, spark):
        eng = MemoryEngine(spark, now_fn=lambda: 1_000)
        eng.add("a fact", user_id="u", infer=False)
        with pytest.raises(ValueError, match="dims"):
            eng.search(query_vec=[1.0, 2.0], user_id="u")

    def test_search_without_query_or_vec_rejected(self, spark):
        eng = MemoryEngine(spark)
        with pytest.raises(ValueError):
            eng.search(user_id="u")


class TestPolicyFallbacks:
    """Policy (LLM-boundary) failures degrade, data-path failures
    propagate — the reference's split (`reconciliation/memories.py:
    98-104` vs embedder errors)."""

    def test_reconciler_error_falls_back_to_add(self, spark):
        ext = ScriptedExtractor(
            outputs=[{"facts": ["resilient fact"], "entities": [],
                      "relations": []}]
        )

        class Boom:
            def reconcile(self, facts, candidates, prompt=None):
                raise RuntimeError("llm down")

        eng = MemoryEngine(
            spark, extractor=ext, reconciler=Boom(), now_fn=lambda: 1_000
        )
        res = eng.add("resilient fact", user_id="u")
        assert len(res.added_ids) == 1  # fact not lost
        texts = [r["text"] for r in eng.get_all(user_id="u").collect()]
        assert texts == ["resilient fact"]

    def test_reranker_error_falls_back_to_original_order(self, spark):
        class Boom:
            def rerank(self, q, rows, k):
                raise RuntimeError("rerank down")

        eng = MemoryEngine(spark, reranker=Boom(), now_fn=lambda: 1_000)
        eng.add("a fact", user_id="u", infer=False)
        rows = eng.search("a fact", user_id="u", k=1).collect()
        assert len(rows) == 1  # degraded, not broken

    def test_extractor_error_yields_empty_add(self, spark):
        class Boom:
            def extract(self, text, prompt=None):
                raise RuntimeError("llm down")

        eng = MemoryEngine(spark, extractor=Boom(), now_fn=lambda: 1_000)
        res = eng.add("some text", user_id="u")
        assert not res.added_ids  # no-op, not an exception
        assert eng.get_all(user_id="u").count() == 0
