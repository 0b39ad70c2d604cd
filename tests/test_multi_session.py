"""Sequential-session lifecycle (reference `tests/test_multi_session.py`
B3 regression, 4 cases): repeatedly opening, using, and closing engines
in one process — in-memory and persisted — must not corrupt shared
state (the Spark analog of the reference's event-loop teardown bug:
the caller-owned SparkSession must survive every engine close)."""

from __future__ import annotations

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor


class TestMultiSessionLifecycle:
    def test_open_add_close_three_times_in_memory(self, spark):
        for i in range(3):
            eng = MemoryEngine(spark)
            res = eng.add(f"fact {i}", infer=False)
            assert len(res.added_ids) == 1
            eng.close()
        # the shared session is still usable after three closes
        assert spark.range(1).count() == 1

    def test_open_add_close_three_times_persistent(self, spark, tmp_path):
        """Each session reopens the prior save; the third reopen sees
        all memories and can search (ref
        test_open_add_close_three_times_persistent)."""
        path = str(tmp_path / "b3_store")
        for i in range(3):
            if i == 0:
                eng = MemoryEngine(spark)
            else:
                eng = MemoryEngine.open(spark, path)
            eng.add(f"fact {i}", user_id="u", infer=False)
            eng.save(path)
            eng.close()

        eng = MemoryEngine.open(spark, path)
        texts = sorted(r["text"] for r in eng.get_all(user_id="u").collect())
        assert texts == ["fact 0", "fact 1", "fact 2"]
        assert eng.search("fact", user_id="u", k=5).count() >= 1
        eng.close()

    def test_context_manager_reuse_pattern(self, spark):
        per_session = []
        for i in range(3):
            with MemoryEngine(spark) as mem:
                per_session.append(mem.add(f"session {i} fact", infer=False))
        assert len(per_session) == 3
        assert all(len(r.added_ids) == 1 for r in per_session)

    def test_add_with_infer_across_sessions(self, spark):
        for i in range(3):
            ext = ScriptedExtractor(
                [{"facts": [f"fact {i}"], "entities": [], "relations": []}]
            )
            with MemoryEngine(spark, extractor=ext) as mem:
                res = mem.add(f"Some text for session {i}")
                assert len(res.added_ids) >= 1
