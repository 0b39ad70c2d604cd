"""Tracing / instrumentation — reference `tests/test_instrumentation.py`
themes (9 tests): opt-in flag semantics, zero side effects when
disabled, trace_operation's no-op contract with and without an OTel
install, and the per-stage ingest trace (VERDICT r3 item 8)."""

from __future__ import annotations

import sys

import pytest

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor
from grafeo_memory_spark.tracing import SpanRecorder, trace_operation


def _engine(spark, **kw):
    ext = ScriptedExtractor(
        outputs=[
            {
                "facts": ["pat lives in rome"],
                "entities": [{"name": "pat", "entity_type": "person"},
                             {"name": "rome", "entity_type": "location"}],
                "relations": [{"source": "pat", "target": "rome",
                               "relation_type": "lives_in"}],
            }
        ]
    )
    kw.setdefault("enable_episodes", True)
    return MemoryEngine(spark, extractor=ext, now_fn=lambda: 1_000, **kw)


class TestInstrumentConfig:
    def test_instrument_default_off(self, spark):
        eng = _engine(spark)
        assert eng.tracer is None

    def test_instrument_true_creates_recorder(self, spark):
        eng = _engine(spark, instrument=True)
        assert isinstance(eng.tracer, SpanRecorder)

    def test_explain_ingest_requires_instrument(self, spark):
        eng = _engine(spark)
        with pytest.raises(RuntimeError):
            eng.explain_ingest()


class TestTraceOperation:
    def test_disabled_yields_none(self):
        with trace_operation("test-op") as span:
            assert span is None

    def test_disabled_explicit(self):
        with trace_operation(
            "test-op", enabled=False, attributes={"key": "val"}
        ) as span:
            assert span is None

    def test_enabled_without_otel_yields_none(self):
        # hide opentelemetry if present — the deferred import must
        # degrade to a no-op, never raise (reference `_tracing.py:24-29`)
        real = sys.modules.get("opentelemetry.trace")
        sys.modules["opentelemetry.trace"] = None  # type: ignore[assignment]
        try:
            with trace_operation("test-op", enabled=True) as span:
                assert span is None
        finally:
            if real is not None:
                sys.modules["opentelemetry.trace"] = real
            else:
                sys.modules.pop("opentelemetry.trace", None)

    def test_recorder_span_times_and_attributes(self):
        rec = SpanRecorder()
        rec.begin()
        with trace_operation(
            "stage", enabled=True, recorder=rec, attributes={"n": 3}
        ) as sp:
            assert sp is not None and sp.attributes["n"] == 3
        steps = rec.steps()
        assert [s["name"] for s in steps] == ["stage"]
        assert steps[0]["duration_ms"] >= 0
        assert steps[0]["detail"] == {"n": 3}

    def test_recorder_span_records_error(self):
        rec = SpanRecorder()
        rec.begin()
        with pytest.raises(ValueError):
            with trace_operation("boom", enabled=True, recorder=rec):
                raise ValueError("nope")
        (step,) = rec.steps()
        assert step["error"] == "ValueError: nope"
        assert step["duration_ms"] >= 0  # end stamped despite the raise


class TestIngestTrace:
    def test_add_records_stage_spans(self, spark):
        eng = _engine(spark, instrument=True)
        eng.add("pat lives in rome", user_id="u", session_id="s1")
        names = [s["name"] for s in eng.explain_ingest()]
        # episodes on → the "episode" span replaces "session_chain"
        # (reference `manager.py:240-245` episode/elif gating)
        assert names == [
            "normalize", "extract", "embed", "reconcile_probe",
            "reconcile", "execute_decisions", "store_graph",
            "episode",
        ]
        steps = {s["name"]: s for s in eng.explain_ingest()}
        assert steps["extract"]["detail"]["facts"] == 1
        assert steps["execute_decisions"]["detail"]["decisions"] == 1
        assert steps["store_graph"]["detail"]["entities"] == 2
        assert all(s["duration_ms"] >= 0 for s in steps.values())

    def test_each_add_resets_trace(self, spark):
        eng = _engine(spark, instrument=True)
        eng.add("first", user_id="u", infer=False)
        first = [s["name"] for s in eng.explain_ingest()]
        eng.add("second", user_id="u", infer=False)
        second = [s["name"] for s in eng.explain_ingest()]
        # one trace per add(): no accumulation across calls
        assert first == second
        assert first.count("execute_decisions") == 1

    def test_disabled_add_has_no_trace_overhead(self, spark):
        eng = _engine(spark)  # instrument off
        res = eng.add("pat lives in rome", user_id="u")
        assert res.added_ids  # ingest worked identically
        assert eng.tracer is None


class TestYolo:
    """Reference `MemoryConfig.yolo` (`types.py:148-171`)."""

    def test_yolo_enables_everything(self, spark):
        eng = MemoryEngine.yolo(spark, now_fn=lambda: 1_000)
        assert isinstance(eng.tracer, SpanRecorder)
        assert eng.enable_episodes and eng.enable_graph_algorithms
        assert eng.usage_callback is not None  # stderr logger default

    def test_yolo_overrides_win(self, spark):
        seen = []
        eng = MemoryEngine.yolo(
            spark, instrument=False,
            usage_callback=lambda op, u: seen.append(op),
            now_fn=lambda: 1_000,
        )
        assert eng.tracer is None  # explicit override beats the default
        eng.add("a fact", user_id="u", infer=False)
        assert seen == []  # raw add fires no policy usage
