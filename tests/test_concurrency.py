"""Concurrent mutation safety (reference `tests/test_concurrency.py`,
T7/T8): overlapping add() calls — gathered coroutines on the async
facade, or raw threads on the sync engine — must lose no data and must
not contaminate other users. The engine serializes writers on a
reentrant engine-global lock (`manager.py` module docstring; reference
locks per user at `manager.py:283-284`)."""

from __future__ import annotations

import asyncio
import threading

from grafeo_memory_spark.async_manager import AsyncMemoryEngine
from grafeo_memory_spark.manager import MemoryEngine


class TestConcurrentAddSameUser:
    def test_concurrent_adds_no_data_loss(self, spark):
        """10 gathered adds for one user → 10 distinct memories
        (ref test_concurrent_adds_no_data_loss)."""

        async def _run():
            async with AsyncMemoryEngine(spark) as mem:
                tasks = [
                    mem.add(f"thread {t} fact {i}", user_id="shared", infer=False)
                    for t in (1, 2)
                    for i in range(5)
                ]
                await asyncio.gather(*tasks)
                rows = (await mem.get_all(user_id="shared")).collect()
                texts = [r["text"] for r in rows]
                assert len(texts) == 10
                assert len(set(texts)) == 10

        asyncio.run(_run())

    def test_concurrent_adds_all_texts_present(self, spark):
        """Every gathered text lands (ref test_concurrent_adds_all_texts_present)."""

        async def _run():
            async with AsyncMemoryEngine(spark) as mem:
                wanted = [f"concurrent fact {i}" for i in range(10)]
                await asyncio.gather(
                    *[mem.add(t, user_id="u", infer=False) for t in wanted]
                )
                stored = {
                    r["text"] for r in (await mem.get_all(user_id="u")).collect()
                }
                for t in wanted:
                    assert t in stored, f"missing: {t}"

        asyncio.run(_run())


class TestConcurrentAddDifferentUsers:
    def test_user_isolation_under_concurrency(self, spark):
        """Interleaved adds for two users never cross user boundaries
        (ref test_user_isolation_under_concurrency)."""

        async def _run():
            async with AsyncMemoryEngine(spark) as mem:
                tasks = []
                for i in range(5):
                    tasks.append(mem.add(f"alice fact {i}", user_id="alice", infer=False))
                    tasks.append(mem.add(f"bob fact {i}", user_id="bob", infer=False))
                await asyncio.gather(*tasks)
                a = {r["text"] for r in (await mem.get_all(user_id="alice")).collect()}
                b = {r["text"] for r in (await mem.get_all(user_id="bob")).collect()}
                assert len(a) == 5 and all(t.startswith("alice") for t in a)
                assert len(b) == 5 and all(t.startswith("bob") for t in b)

        asyncio.run(_run())

    def test_three_users_concurrent(self, spark):
        """Three users × 4 adds each, fully interleaved
        (ref test_three_users_concurrent)."""

        async def _run():
            async with AsyncMemoryEngine(spark) as mem:
                users = ["u1", "u2", "u3"]
                await asyncio.gather(
                    *[
                        mem.add(f"{u} item {i}", user_id=u, infer=False)
                        for i in range(4)
                        for u in users
                    ]
                )
                for u in users:
                    rows = (await mem.get_all(user_id=u)).collect()
                    assert sorted(r["text"] for r in rows) == [
                        f"{u} item {i}" for i in range(4)
                    ]

        asyncio.run(_run())


class TestThreadedSyncEngine:
    def test_threaded_adds_serialize_on_engine_lock(self, spark):
        """Raw threads against the sync engine also lose nothing — the
        @_locked write path is the thread-safety contract, not just the
        async facade."""
        eng = MemoryEngine(spark)
        errs: list[Exception] = []

        def work(tid: int):
            try:
                for i in range(3):
                    eng.add(f"t{tid} fact {i}", user_id="shared", infer=False)
            except Exception as e:  # pragma: no cover - failure detail
                errs.append(e)

        threads = [threading.Thread(target=work, args=(t,)) for t in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        texts = [r["text"] for r in eng.get_all(user_id="shared").collect()]
        assert len(texts) == 12 and len(set(texts)) == 12
