"""Reranker protocol + scoring-reranker parity (reference
`tests/test_reranker.py`, 5 cases over `reranker.py`): protocol
satisfaction, empty passthrough, score-and-sort-descending, top-k
truncation — plus the engine integration (rerank over the widened 2k
pool, reference `manager.py` search path)."""

from __future__ import annotations

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import (
    IdentityReranker,
    Reranker,
    ScoringReranker,
)


class TestRerankerProtocol:
    def test_scoring_reranker_satisfies_protocol(self):
        assert isinstance(ScoringReranker(lambda q, r: 0.0), Reranker)
        assert isinstance(IdentityReranker(), Reranker)

    def test_custom_reranker_satisfies_protocol(self):
        class MyReranker:
            def rerank(self, query, results, top_k):
                return results[:top_k]

        assert isinstance(MyReranker(), Reranker)


class TestScoringReranker:
    def test_rerank_empty(self):
        rr = ScoringReranker(lambda q, r: 1.0)
        assert rr.rerank("query", [], 5) == []

    def test_rerank_scores_and_sorts(self):
        """Policy scores replace the originals and order flips
        (ref test_rerank_scores_and_sorts)."""
        results = [
            {"id": 1, "text": "alice likes hiking", "score": 0.5},
            {"id": 2, "text": "bob likes cooking", "score": 0.8},
        ]
        scores = {"alice likes hiking": 0.9, "bob likes cooking": 0.2}
        rr = ScoringReranker(lambda q, r: scores[r["text"]])
        out = rr.rerank("hiking", results, 10)
        assert [r["id"] for r in out] == [1, 2]
        assert out[0]["score"] == 0.9 and out[1]["score"] == 0.2

    def test_rerank_top_k(self):
        results = [{"id": i, "text": t, "score": 0.5} for i, t in enumerate("abc")]
        scores = {"a": 0.9, "b": 0.7, "c": 0.3}
        rr = ScoringReranker(lambda q, r: scores[r["text"]])
        out = rr.rerank("query", results, 2)
        assert [r["text"] for r in out] == ["a", "b"]

    def test_per_item_scorer_failure_keeps_original(self):
        """One failing score call keeps that row's original score
        (ref `reranker.py:95-101`)."""

        def scorer(q, r):
            if r["text"] == "bad":
                raise RuntimeError("boom")
            return 0.9

        rr = ScoringReranker(scorer)
        out = rr.rerank("q", [{"id": 1, "text": "bad", "score": 0.4},
                              {"id": 2, "text": "ok", "score": 0.1}], 5)
        assert {r["text"]: r["score"] for r in out} == {"ok": 0.9, "bad": 0.4}

    def test_input_rows_not_mutated(self):
        rows = [{"id": 1, "text": "x", "score": 0.5}]
        ScoringReranker(lambda q, r: 0.99).rerank("q", rows, 5)
        assert rows[0]["score"] == 0.5


class TestEngineIntegration:
    def test_scoring_reranker_reorders_search(self, spark):
        """The engine surfaces reranked order and scores."""
        wanted = "the boosted memory"
        eng = MemoryEngine(
            spark,
            reranker=ScoringReranker(
                lambda q, r: 0.99 if r["text"] == wanted else 0.01
            ),
        )
        for t in ["an ordinary memory", wanted, "another ordinary one"]:
            eng.add(t, user_id="u", infer=False)
        rows = eng.search("memory", user_id="u", k=2).collect()
        assert rows[0]["text"] == wanted
        assert abs(rows[0]["score"] - 0.99) < 1e-9
        assert len(rows) == 2
