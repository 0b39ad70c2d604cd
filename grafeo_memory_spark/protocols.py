"""Pluggable policy-layer protocols (SURVEY.md §2.13, P1-P6).

The reference keeps every non-deterministic stage (embeddings, LLM
extraction/reconciliation, re-ranking) behind small protocols
(`embedding.py:8-19`, `reranker.py:43-47`, `protocol.py:52-124`) and its
test suite swaps in deterministic fakes (`tests/mock_llm.py:12-63`).
Same pattern here: the engine code only sees these interfaces; tests and
fixture generation use the deterministic implementations below.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field
from typing import Any, Protocol, runtime_checkable


@runtime_checkable
class EmbeddingClient(Protocol):
    """P1 — text → vector (reference `embedding.py:8-19`)."""

    @property
    def dimensions(self) -> int: ...

    def embed(self, texts: list[str]) -> list[list[float]]: ...


@runtime_checkable
class Reranker(Protocol):
    """P2 — re-score a candidate list (reference `reranker.py:43-47`).

    ``results`` is a list of dicts carrying at least ``id``, ``text`` and
    ``score``; returns the same shape, re-ordered/truncated to ``top_k``.
    """

    def rerank(
        self, query: str, results: list[dict[str, Any]], top_k: int
    ) -> list[dict[str, Any]]: ...


@runtime_checkable
class Extractor(Protocol):
    """P4-shaped — extract facts/entities/relations from text (the LLM
    extraction agents, reference `extraction/entities.py:69-132`).

    Returns ``{"facts": [str], "entities": [{"name", "entity_type"}],
    "relations": [{"source", "target", "relation_type"}]}``.

    ``prompt`` is the P5 custom-prompt slot (reference
    `extraction/entities.py:74-81`: a custom system prompt replaces the
    built-in one). The engine only passes it when one is configured, so
    prompt-unaware extractors keep working unchanged.
    """

    def extract(self, text: str, prompt: str | None = None) -> dict[str, Any]: ...


@runtime_checkable
class Reconciler(Protocol):
    """P4-shaped — decide ADD/UPDATE/DELETE/NONE per new fact given
    similar existing memories (reference `reconciliation/memories.py:68-108`).

    Returns ``{"decisions": [{"action", "text", "target_memory_id"}]}``.

    ``prompt`` is the P5 custom-update-prompt slot (reference
    `types.py:66`, threaded like `extraction/facts.py:36-44`); passed
    only when configured.
    """

    def reconcile(
        self,
        facts: list[str],
        candidates: list[dict[str, Any]],
        prompt: str | None = None,
    ) -> dict[str, Any]: ...


@runtime_checkable
class ImageDescriber(Protocol):
    """P-vision — convert image URLs to text descriptions feeding the
    extraction pipeline (reference `vision.py:24-66`,
    `describe_images`). One description per input URL; implementations
    fall back to a placeholder on per-image failure so the pipeline can
    continue (reference `vision.py:51-53`)."""

    def describe(self, image_urls: list[str]) -> list[str]: ...


class ScriptedDescriber:
    """Deterministic vision mock (the engine-test analog of the
    reference's `tests/test_vision.py` fixtures): describes each URL as
    a stable function of the URL itself, or replays scripted outputs."""

    def __init__(self, outputs: list[str] | None = None):
        self._outputs = list(outputs) if outputs else None

    def describe(self, image_urls: list[str]) -> list[str]:
        if self._outputs is not None:
            out, self._outputs = (
                self._outputs[: len(image_urls)],
                self._outputs[len(image_urls):],
            )
            return out + ["[image: undescribed]"] * (len(image_urls) - len(out))
        return [f"image at {u}" for u in image_urls]


class HashEmbedder:
    """Deterministic unit-vector embedder (the reference's test device,
    `tests/mock_llm.py:12-43`): sha256 of the text seeds the components,
    so similarity scores and kNN results are reproducible everywhere —
    Python, Spark and the DuckDB oracle see identical float32 vectors.
    """

    def __init__(self, dimensions: int = 16):
        # reference `types.py` MemoryConfig validation: dimensions must
        # be a positive integer (tests/test_config_validation.py)
        if dimensions <= 0:
            raise ValueError(
                f"embedding dimensions must be positive, got {dimensions}"
            )
        self._dims = dimensions

    @property
    def dimensions(self) -> int:
        return self._dims

    def embed_one(self, text: str) -> list[float]:
        raw: list[float] = []
        counter = 0
        while len(raw) < self._dims:
            h = hashlib.sha256(f"{text}\x00{counter}".encode()).digest()
            # 4 bytes → one float in [-1, 1)
            for i in range(0, len(h) - 3, 4):
                if len(raw) >= self._dims:
                    break
                u = int.from_bytes(h[i : i + 4], "big")
                raw.append(u / 2**31 - 1.0)
            counter += 1
        norm = math.sqrt(sum(x * x for x in raw))
        if norm == 0:
            raw[0] = 1.0
            norm = 1.0
        # round-trip through float32 so parquet storage is exact
        import struct as _struct

        return [
            _struct.unpack("f", _struct.pack("f", x / norm))[0] for x in raw
        ]

    def embed(self, texts: list[str]) -> list[list[float]]:
        return [self.embed_one(t) for t in texts]


@dataclass
class ScriptedExtractor:
    """Replays canned extraction outputs sequentially — the reference's
    `make_test_model(outputs)` pattern (`tests/mock_llm.py:46-63`)."""

    outputs: list[dict[str, Any]]
    _i: int = field(default=0, init=False)
    #: last P5 prompt the engine passed (None = built-in), for tests
    last_prompt: str | None = field(default=None, init=False)

    def extract(self, text: str, prompt: str | None = None) -> dict[str, Any]:
        self.last_prompt = prompt
        if self._i >= len(self.outputs):
            return {"facts": [], "entities": [], "relations": []}
        out = self.outputs[self._i]
        self._i += 1
        return out


@dataclass
class ScriptedReconciler:
    """Replays canned reconciliation decisions; when exhausted, defaults
    to ADD-everything (the reference's no-candidates fast path,
    `reconciliation/memories.py:88-90`)."""

    outputs: list[dict[str, Any]] = field(default_factory=list)
    _i: int = field(default=0, init=False)
    #: last P5 update-prompt the engine passed, for tests
    last_prompt: str | None = field(default=None, init=False)

    def reconcile(
        self,
        facts: list[str],
        candidates: list[dict[str, Any]],
        prompt: str | None = None,
    ) -> dict[str, Any]:
        self.last_prompt = prompt
        if self._i < len(self.outputs):
            out = self.outputs[self._i]
            self._i += 1
            return out
        return {
            "decisions": [
                {"action": "ADD", "text": f, "target_memory_id": None}
                for f in facts
            ]
        }


class IdentityReranker:
    """Deterministic P2 stand-in: keeps the incoming order, truncates."""

    def rerank(
        self, query: str, results: list[dict[str, Any]], top_k: int
    ) -> list[dict[str, Any]]:
        return results[:top_k]


class ScoringReranker:
    """P2 — the reference LLMReranker's contract (`reranker.py:50-118`)
    with a pluggable scorer: score every candidate with
    ``score_fn(query, result) -> float``, replace ``score``, sort
    descending, truncate to ``top_k``. A per-result scorer failure keeps
    that result's original score (reference `reranker.py:95-101`
    per-item error handling)."""

    def __init__(self, score_fn):
        self._score_fn = score_fn

    def rerank(
        self, query: str, results: list[dict[str, Any]], top_k: int
    ) -> list[dict[str, Any]]:
        if not results:
            return []
        rescored = []
        for r in results:
            try:
                s = float(self._score_fn(query, r))
            except Exception:
                s = r.get("score", 0.0)
            rescored.append({**r, "score": s})
        rescored.sort(key=lambda r: r["score"], reverse=True)
        return rescored[:top_k]


@dataclass
class RunUsage:
    """A6/P6 — usage accumulation (reference `RunUsage.incr`,
    `manager.py:177-193`, `types.py:330-347`): counts per policy-layer
    call, summed across an operation. Token fields stay zero under the
    deterministic mocks but keep the reference's shape for real
    providers."""

    calls: int = 0
    input_tokens: int = 0
    output_tokens: int = 0

    def incr(self, other: "RunUsage") -> None:
        self.calls += other.calls
        self.input_tokens += other.input_tokens
        self.output_tokens += other.output_tokens


def normalize_entity_name(name: str) -> str:
    """X7 — the reference's prompt contract stores entity names
    lowercase_underscored (`prompts.py:65-66`)."""
    return "_".join(name.strip().lower().split())
