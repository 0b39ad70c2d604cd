"""Async facade over :class:`MemoryEngine`, mirroring the reference's
``AsyncMemoryManager`` (reference `manager.py:2305-2512`).

Surface parity follows the reference's split exactly:

- coroutine methods for the LLM/IO-shaped operations — ``add``,
  ``add_batch``, ``search``, ``update``, ``get_all``, ``delete``,
  ``delete_all``, ``summarize``, ``history``, ``explain`` — plus
  ``async with`` lifecycle (`__aenter__`/`__aexit__`,
  reference `manager.py:2321-2325`);
- plain-sync methods for pure introspection — ``set_importance``,
  ``get_episodes``, ``get_provenance``, ``episode_chain``,
  ``get_communities``, ``stats`` (reference `manager.py:2448-2478`
  keeps these sync on the async manager too).

The reference's async core exists to overlap LLM calls with other
coroutines; Spark actions block the calling thread, so every async
method here delegates to the sync engine via ``asyncio.to_thread`` —
the event loop stays responsive while Spark runs the job. Like the
reference (and the sync engine, see `manager.py` module docstring),
this is a single-writer facade: overlapping *mutating* awaits from
multiple tasks must be serialized by the caller.
"""

from __future__ import annotations

import asyncio
from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from grafeo_memory_spark.manager import MemoryEngine


class AsyncMemoryEngine:
    """Async counterpart of :class:`MemoryEngine`.

    Usage::

        async with AsyncMemoryEngine(spark) as memory:
            await memory.add("I work at Acme Corp as a data scientist")
            results = await memory.search("Where does the user work?")
    """

    def __init__(self, spark: SparkSession | None = None, *, engine: MemoryEngine | None = None, **kw):
        """Build over a fresh :class:`MemoryEngine` (constructor kwargs
        pass through) or wrap an existing ``engine``."""
        if engine is not None:
            if kw or spark is not None:
                raise ValueError("pass either engine= or constructor kwargs, not both")
            self._engine = engine
        else:
            if spark is None:
                raise ValueError("need a SparkSession (or engine=)")
            self._engine = MemoryEngine(spark, **kw)

    # ------------------------------------------------------ lifecycle
    @classmethod
    def open(cls, spark: SparkSession, path: str, **kw) -> "AsyncMemoryEngine":
        """S1 — open a persisted store directory (async facade)."""
        return cls(engine=MemoryEngine.open(spark, path, **kw))

    @classmethod
    def yolo(cls, spark: SparkSession, **kw) -> "AsyncMemoryEngine":
        """Every optional feature on (reference `MemoryConfig.yolo`)."""
        return cls(engine=MemoryEngine.yolo(spark, **kw))

    @property
    def engine(self) -> MemoryEngine:
        """The wrapped sync engine (for APIs not lifted to async)."""
        return self._engine

    @property
    def store(self):
        return self._engine.store

    async def __aenter__(self) -> "AsyncMemoryEngine":
        return self

    async def __aexit__(self, *exc: object) -> None:
        self.close()

    def close(self) -> None:
        self._engine.close()

    # ------------------------------------------------------ coroutines
    async def add(self, messages, **kw) -> Any:
        """Extract facts and store them (reference `manager.py:2327`)."""
        return await asyncio.to_thread(self._engine.add, messages, **kw)

    async def add_batch(self, messages_list: Sequence, **kw) -> Any:
        """Batch ingest (reference `manager.py:2349`)."""
        return await asyncio.to_thread(self._engine.add_batch, messages_list, **kw)

    async def search(self, query: str | None = None, *, grouped: bool = False, **kw):
        """Search memories (reference `manager.py:2371-2405`): with
        ``grouped=True`` returns the session-bucketed dict, matching the
        reference's ``search(grouped=True)`` fold-in."""
        if grouped:
            return await asyncio.to_thread(self._engine.search_grouped, query, **kw)
        return await asyncio.to_thread(self._engine.search, query, **kw)

    async def update(self, memory_id: int, text: str, **kw) -> Any:
        """Update a memory's text (reference `manager.py:2407`)."""
        return await asyncio.to_thread(self._engine.update, memory_id, text, **kw)

    async def get_all(self, **kw) -> DataFrame:
        """All memories for a user (reference `manager.py:2411`)."""
        return await asyncio.to_thread(self._engine.get_all, **kw)

    async def delete(self, memory_id: int, **kw) -> bool:
        """Delete one memory; False for bad ids (reference `manager.py:2420`)."""
        return await asyncio.to_thread(self._engine.delete, memory_id, **kw)

    async def delete_all(self, *, user_id: str) -> int:
        """Delete all of a user's memories, returning the count
        (reference `manager.py:2428`)."""
        return await asyncio.to_thread(self._engine.delete_all, user_id=user_id)

    async def summarize(self, *, user_id: str, **kw) -> list[int]:
        """Consolidate old memories (reference `manager.py:2437`)."""
        return await asyncio.to_thread(self._engine.summarize, user_id=user_id, **kw)

    async def history(self, memory_id: int) -> DataFrame:
        """Change history for a memory (reference `manager.py:2451`)."""
        return await asyncio.to_thread(self._engine.history, memory_id)

    async def explain(self) -> list[str]:
        """Stage trace of the most recent search (reference
        `manager.py:2480` — async on the async manager)."""
        return await asyncio.to_thread(self._engine.explain)

    async def temporal_chain(self, memory_id: int, **kw) -> DataFrame:
        return await asyncio.to_thread(self._engine.temporal_chain, memory_id, **kw)

    async def detect_communities(self, **kw) -> Any:
        return await asyncio.to_thread(self._engine.detect_communities, **kw)

    # ------------------------------------------- sync passthroughs
    # The reference keeps these sync even on AsyncMemoryManager
    # (`manager.py:2448-2478`): cheap introspection, no LLM calls.
    def set_importance(self, memory_id: int, importance: float) -> bool:
        return self._engine.set_importance(memory_id, importance)

    def get_episodes(self, **kw) -> Any:
        return self._engine.get_episodes(**kw)

    def get_provenance(self, memory_id: int) -> DataFrame:
        return self._engine.get_provenance(memory_id)

    def episode_chain(self, episode_id: int, **kw) -> Any:
        return self._engine.episode_chain(episode_id, **kw)

    def get_communities(self, **kw) -> DataFrame:
        return self._engine.get_communities(**kw)

    def stats(self, **kw) -> dict[str, Any]:
        return self._engine.stats(**kw)

    def explain_ingest(self) -> list[dict[str, Any]]:
        return self._engine.explain_ingest()
