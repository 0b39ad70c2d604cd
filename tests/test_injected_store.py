"""Injected-store contracts — reference `tests/test_db_injection.py`
themes (6 tests): an engine over an externally constructed Store must
respect its contents, resume id allocation from its maxima, share
nothing across engines, and never mutate the injected frames in place
(Store is immutable; engines replace, not update) (VERDICT r3 item 7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.store import empty_store


def _prebuilt_store(spark):
    st = empty_store(spark)
    mem = spark.createDataFrame(
        [(50, "injected fact", "u", 500, [1.0] + [0.0] * 15)],
        "id long, text string, user_id string, created_at long, "
        "embedding array<float>",
    )
    return st.with_(
        memories=st.memories.unionByName(mem, allowMissingColumns=True)
    )


class TestInjectedStore:
    def test_engine_reads_injected_rows(self, spark):
        eng = MemoryEngine(spark, store=_prebuilt_store(spark))
        texts = [r["text"] for r in eng.get_all(user_id="u").collect()]
        assert texts == ["injected fact"]

    def test_default_engine_creates_empty_store(self, spark):
        eng = MemoryEngine(spark)
        assert eng.store.memories.count() == 0
        assert eng.get_all(user_id="anyone").count() == 0

    def test_id_allocation_resumes_from_injected_max(self, spark):
        eng = MemoryEngine(
            spark, store=_prebuilt_store(spark), now_fn=lambda: 1_000
        )
        res = eng.add("new fact", user_id="u", infer=False)
        assert min(res.added_ids) > 50

    def test_injected_frames_not_mutated_in_place(self, spark):
        st = _prebuilt_store(spark)
        injected_memories = st.memories
        eng = MemoryEngine(spark, store=st, now_fn=lambda: 1_000)
        eng.add("new fact", user_id="u", infer=False)
        # engine replaced its Store; the caller's DataFrame is untouched
        assert injected_memories.count() == 1
        assert st.memories is injected_memories
        assert eng.store.memories.count() == 2

    def test_two_engines_do_not_share_state(self, spark):
        a = MemoryEngine(spark, now_fn=lambda: 1_000)
        b = MemoryEngine(spark, now_fn=lambda: 1_000)
        a.add("only in a", user_id="u", infer=False)
        assert b.get_all(user_id="u").count() == 0

    def test_search_over_injected_store(self, spark):
        eng = MemoryEngine(
            spark, store=_prebuilt_store(spark), now_fn=lambda: 1_000
        )
        hits = eng.search(
            query_vec=[1.0] + [0.0] * 15, user_id="u", k=1
        ).collect()
        assert len(hits) == 1 and hits[0]["memory_id"] == 50


class TestContextManager:
    """Reference `with manager:` usage pattern; close() never touches
    the caller-owned SparkSession (test_db_injection semantics)."""

    def test_context_manager_roundtrip(self, spark):
        with MemoryEngine(spark, now_fn=lambda: 1_000) as eng:
            eng.add("ctx fact", user_id="u", infer=False)
            assert eng.get_all(user_id="u").count() == 1
        # session survives close — a second engine works immediately
        eng2 = MemoryEngine(spark, now_fn=lambda: 2_000)
        eng2.add("after close", user_id="u", infer=False)
        assert eng2.get_all(user_id="u").count() == 1

    def test_sequential_context_sessions(self, spark, tmp_path):
        path = str(tmp_path / "db")
        with MemoryEngine(spark, now_fn=lambda: 1_000) as eng:
            eng.add("one", user_id="u", infer=False)
            eng.save(path)
        with MemoryEngine.open(spark, path, now_fn=lambda: 2_000) as eng:
            eng.add("two", user_id="u", infer=False)
            eng.save(path)
        texts = {
            r["text"]
            for r in MemoryEngine.open(spark, path)
            .get_all(user_id="u")
            .collect()
        }
        assert texts == {"one", "two"}
