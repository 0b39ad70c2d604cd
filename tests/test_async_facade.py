"""AsyncMemoryEngine parity with the reference's AsyncMemoryManager
(reference `manager.py:2305-2512`; test themes from
`tests/test_manager.py` TestAsync* / test_async_* and
`tests/test_new_features.py` async cases). Reference tests drive the
async facade with plain ``asyncio.run`` inside sync tests — same here."""

from __future__ import annotations

import asyncio

import pytest

from grafeo_memory_spark.async_manager import AsyncMemoryEngine
from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor, ScriptedReconciler


def _mk(spark, outputs=None, **kw):
    t = [1_000_000]

    def now():
        t[0] += 1000
        return t[0]

    if outputs is not None:
        kw.setdefault("extractor", ScriptedExtractor(outputs))
    return AsyncMemoryEngine(spark, now_fn=now, **kw)


class TestAsyncLifecycle:
    def test_async_context_manager(self, spark):
        """`async with` should add and close (ref test_async_context_manager)."""

        async def _run():
            async with _mk(spark) as memory:
                res = await memory.add("async context test", infer=False)
                assert len(res.added_ids) == 1

        asyncio.run(_run())

    def test_engine_wrap_rejects_extra_kwargs(self, spark):
        eng = MemoryEngine(spark)
        with pytest.raises(ValueError):
            AsyncMemoryEngine(spark, engine=eng)
        with pytest.raises(ValueError):
            AsyncMemoryEngine()

    def test_wraps_existing_engine(self, spark):
        eng = MemoryEngine(spark)
        a = AsyncMemoryEngine(engine=eng)
        assert a.engine is eng

        async def _run():
            await a.add("wrapped", infer=False)

        asyncio.run(_run())
        assert eng.store.memories.count() == 1


class TestAsyncAddSearch:
    def test_async_add_and_search(self, spark):
        """Round-trip through coroutines (ref test_async_add_and_search)."""
        mem = _mk(
            spark,
            outputs=[{"facts": ["alice works at acme"], "entities": [], "relations": []}],
        )

        async def _run():
            res = await mem.add("alice works at acme", user_id="u")
            assert len(res.added_ids) == 1
            rows = (await mem.search("acme", user_id="u", k=5)).collect()
            assert any("acme" in r["text"] for r in rows)

        asyncio.run(_run())

    def test_async_raw_mode(self, spark):
        """infer=False stores the message verbatim (ref test_async_raw_mode)."""
        mem = _mk(spark)

        async def _run():
            res = await mem.add("raw async fact", infer=False)
            assert len(res.added_ids) == 1
            rows = (await mem.get_all()).collect()
            assert rows[0]["text"] == "raw async fact"

        asyncio.run(_run())

    def test_async_batch_add(self, spark):
        """add_batch aggregates events (ref test_async_batch_add)."""
        mem = _mk(spark)

        async def _run():
            res = await mem.add_batch(["fact one", "fact two", "fact three"], infer=False)
            assert len(res.added_ids) == 3

        asyncio.run(_run())

    def test_async_grouped_search(self, spark):
        """search(grouped=True) buckets by session (ref test_async_grouped_search)."""
        mem = _mk(spark)

        async def _run():
            await mem.add("meeting notes alpha", user_id="u", session_id="s1", infer=False)
            await mem.add("meeting notes beta", user_id="u", session_id="s2", infer=False)
            groups = await mem.search("meeting notes", user_id="u", grouped=True)
            assert set(groups) == {"s1", "s2"}

        asyncio.run(_run())


class TestAsyncMutation:
    def test_async_update_and_history(self, spark):
        """update rewrites in place and records history under the same
        id (ref test_async_update; reference `_update` is in-place)."""
        mem = _mk(spark)

        async def _run():
            res = await mem.add("alice works at acme", infer=False)
            mid = res.added_ids[0]
            up = await mem.update(mid, "alice works at globex")
            assert up.updated_ids == [mid]
            hist = (await mem.history(mid)).collect()
            assert [h["event"] for h in hist] == ["ADD", "UPDATE"]
            texts = [r["text"] for r in (await mem.get_all()).collect()]
            assert texts == ["alice works at globex"]

        asyncio.run(_run())

    def test_async_delete(self, spark):
        """delete → True once, False after; bad id → False (ref test_async_delete)."""
        mem = _mk(spark)

        async def _run():
            res = await mem.add("to be deleted", infer=False)
            mid = res.added_ids[0]
            assert await mem.delete(mid) is True
            assert await mem.delete(mid) is False
            assert await mem.delete("not-an-id") is False

        asyncio.run(_run())

    def test_async_delete_all(self, spark):
        """delete_all returns the per-user count (ref test_async_delete_all)."""
        mem = _mk(spark)

        async def _run():
            for i in range(3):
                await mem.add(f"u1 fact {i}", user_id="u1", infer=False)
            await mem.add("u2 fact", user_id="u2", infer=False)
            assert await mem.delete_all(user_id="u1") == 3
            assert (await mem.get_all(user_id="u2")).count() == 1

        asyncio.run(_run())

    def test_async_summarize(self, spark):
        """summarize consolidates old memories (ref test_async_summarize)."""
        mem = _mk(spark)

        async def _run():
            for i in range(8):
                await mem.add(f"old fact number {i}", user_id="u", infer=False)
            sids = await mem.summarize(user_id="u", preserve_recent=2)
            assert len(sids) >= 1

        asyncio.run(_run())

    def test_async_set_importance_is_sync(self, spark):
        """set_importance stays sync on the async manager (ref
        `manager.py:2448`) and round-trips (ref test_async_set_importance)."""
        mem = _mk(spark)

        async def _run():
            res = await mem.add("important thing", infer=False)
            return res.added_ids[0]

        mid = asyncio.run(_run())
        assert mem.set_importance(mid, 0.25) is True
        row = mem.store.memories.where(f"id = {mid}").collect()[0]
        assert abs(row["importance"] - 0.25) < 1e-9
        assert mem.set_importance(999_999, 0.5) is False


class TestAsyncIntrospection:
    def test_async_stats(self, spark):
        """stats stays sync and counts all types (ref test_async_stats)."""
        mem = _mk(spark)

        async def _run():
            await mem.add("a fact", infer=False)

        asyncio.run(_run())
        st = mem.stats()
        assert st["total_memories"] == 1

    def test_async_explain(self, spark):
        """explain returns the latest search's stage list (ref test_async_explain)."""
        mem = _mk(spark)

        async def _run():
            await mem.add("exploring the pipeline", infer=False)
            await mem.search("pipeline")
            stages = await mem.explain()
            assert stages and isinstance(stages[0], str)

        asyncio.run(_run())

    def test_async_get_episodes(self, spark):
        """get_episodes stays sync (ref test_async_get_episodes)."""
        mem = _mk(spark, enable_episodes=True)

        async def _run():
            await mem.add("episodic fact", user_id="u", session_id="s", infer=False)

        asyncio.run(_run())
        eps = mem.get_episodes(user_id="u")
        assert eps.count() == 1

    def test_concurrent_reads_interleave(self, spark):
        """Read-only coroutines may overlap — the loop is not blocked
        while Spark runs (the point of the to_thread delegation)."""
        mem = _mk(spark)

        async def _run():
            for i in range(4):
                await mem.add(f"parallel fact {i}", user_id="u", infer=False)
            dfs = await asyncio.gather(
                mem.search("parallel", user_id="u", k=2),
                mem.search("fact", user_id="u", k=2),
                mem.get_all(user_id="u"),
            )
            return [d.count() for d in dfs]

        counts = asyncio.run(_run())
        assert counts == [2, 2, 4]
