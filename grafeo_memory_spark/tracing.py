"""Zero-cost tracing for ingest and search (reference `_tracing.py`,
33 LoC: an opt-in OTel span context manager with a deferred import, plus
the ExplainStep trace in `manager.py:795-834`).

Two layers, matching the reference's split:

- :func:`trace_operation` — the reference's exact contract: a context
  manager that opens an OpenTelemetry span when ``enabled=True`` and
  opentelemetry is importable, and no-ops (yields ``None``) otherwise.
  Zero overhead when disabled: the otel import never happens.
- :class:`SpanRecorder` — an in-process span sink used by the engine's
  ``instrument=True`` mode. OTel isn't a dependency of this repo (and
  isn't in the test container), so the recorder is the surface that
  `explain_ingest()` reads and tests assert on; when OTel *is*
  importable, `trace_operation` additionally emits real spans.

Spark note: span timings bracket *driver-side orchestration* (policy
calls, action submission). Distributed execution time lives in the
Spark UI / event logs per job; the span's job boundary is the action
call, which is the right join point between the two systems.
"""

from __future__ import annotations

import contextlib
import time
from collections.abc import Generator
from dataclasses import dataclass, field
from typing import Any


@contextlib.contextmanager
def trace_operation(
    name: str,
    *,
    enabled: bool = False,
    attributes: dict[str, Any] | None = None,
    recorder: "SpanRecorder | None" = None,
) -> Generator[Any, None, None]:
    """Create a span when enabled, else no-op (reference
    `_tracing.py:11-33`). Yields the recorder's span when recording,
    the OTel span when only OTel is active, else ``None``."""
    if not enabled:
        yield None
        return

    if recorder is not None:
        with recorder.span(name, attributes) as sp:
            _emit_otel(name, attributes)
            yield sp
        return

    otel_cm = _otel_span(name, attributes)
    if otel_cm is None:
        yield None
        return
    with otel_cm as span:
        yield span


def _otel_span(name: str, attributes: dict[str, Any] | None):
    try:
        from opentelemetry.trace import get_tracer
    except ImportError:
        return None
    tracer = get_tracer("grafeo-memory-spark")
    return tracer.start_as_current_span(name, attributes=attributes or {})


def _emit_otel(name: str, attributes: dict[str, Any] | None) -> None:
    cm = _otel_span(name, attributes)
    if cm is not None:
        with cm:
            pass


@dataclass
class Span:
    name: str
    start_ms: float
    end_ms: float | None = None
    attributes: dict[str, Any] = field(default_factory=dict)
    error: str | None = None

    @property
    def duration_ms(self) -> float:
        end = self.end_ms if self.end_ms is not None else time.monotonic() * 1e3
        return end - self.start_ms


class SpanRecorder:
    """Collects spans per top-level operation. ``begin()`` starts a new
    trace (one engine API call = one trace); spans nest by wall-clock
    containment only — flat list, reference ExplainStep style."""

    def __init__(self) -> None:
        self.spans: list[Span] = []

    def begin(self) -> None:
        self.spans = []

    @contextlib.contextmanager
    def span(
        self, name: str, attributes: dict[str, Any] | None = None
    ) -> Generator[Span, None, None]:
        sp = Span(
            name=name,
            start_ms=time.monotonic() * 1e3,
            attributes=dict(attributes or {}),
        )
        self.spans.append(sp)
        try:
            yield sp
        except Exception as exc:
            sp.error = f"{type(exc).__name__}: {exc}"
            raise
        finally:
            sp.end_ms = time.monotonic() * 1e3

    def steps(self) -> list[dict[str, Any]]:
        """Reference ExplainResult shape: one dict per span."""
        return [
            {
                "name": s.name,
                "duration_ms": round(s.duration_ms, 3),
                "detail": dict(s.attributes),
                **({"error": s.error} if s.error else {}),
            }
            for s in self.spans
        ]
