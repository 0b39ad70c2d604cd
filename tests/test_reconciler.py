"""Reconciliation pipeline parity (reference `tests/test_reconciler.py`,
13 cases over `reconciliation/memories.py` + `relations.py`): decision
application, the relation contradiction pass's guards (no-existing /
no-new skip the policy; policy errors delete nothing), and the T6
threshold boundary — similar facts surface candidates to the policy,
dissimilar ones don't."""

from __future__ import annotations

from pyspark.sql import functions as F

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor, ScriptedReconciler


def _mk(spark, **kw):
    t = [1_000_000]

    def now():
        t[0] += 1000
        return t[0]

    return MemoryEngine(spark, now_fn=now, **kw)


def _rel_extractor(outputs):
    return ScriptedExtractor(outputs)


def _rel(source, target, relation_type):
    return {"source": source, "target": target, "relation_type": relation_type}


class TestReconcileDecisions:
    def test_reconcile_no_existing(self, spark):
        """Empty store → every fact lands as ADD via the policy's
        no-candidate fast path (ref test_reconcile_no_existing)."""
        ext = _rel_extractor(
            [{"facts": ["alice works at acme", "alice is a data scientist"],
              "entities": [], "relations": []}]
        )
        eng = _mk(spark, extractor=ext)
        res = eng.add("profile", user_id="u")
        assert len(res.added_ids) == 2

    def test_reconcile_with_delete(self, spark):
        """A DELETE decision expires the target and the ADD lands
        (ref test_reconcile_with_delete)."""
        eng = _mk(
            spark,
            extractor=_rel_extractor(
                [{"facts": ["alice works at acme corp"], "entities": [], "relations": []},
                 {"facts": ["alice joined beta inc"], "entities": [], "relations": []}]
            ),
            reconciler=ScriptedReconciler(
                [{"decisions": [{"action": "ADD", "text": "alice works at acme corp"}]},
                 {"decisions": [
                     {"action": "DELETE", "target_memory_id": 1},
                     {"action": "ADD", "text": "alice works at beta inc"}]}]
            ),
        )
        eng.add("alice works at acme corp", user_id="u")
        res = eng.add("alice left acme; joined beta", user_id="u")
        assert res.expired_ids == [1]
        live = [r["text"] for r in eng.get_all(user_id="u").collect()]
        assert live == ["alice works at beta inc"]

    def test_mixed_add_and_update(self, spark):
        """Some facts UPDATE, others ADD in one call
        (ref test_mixed_add_and_update)."""
        eng = _mk(
            spark,
            extractor=_rel_extractor(
                [{"facts": ["alice works at acme office"], "entities": [], "relations": []},
                 {"facts": ["alice works from home", "alice has a cat named whiskers"],
                  "entities": [], "relations": []}]
            ),
            reconciler=ScriptedReconciler(
                [{"decisions": [{"action": "ADD", "text": "alice works at acme office"}]},
                 {"decisions": [
                     {"action": "UPDATE", "target_memory_id": 1,
                      "text": "alice works from home"},
                     {"action": "ADD", "text": "alice has a cat named whiskers"}]}]
            ),
        )
        eng.add("alice works at acme office", user_id="u")
        res = eng.add("update", user_id="u")
        assert len(res.updated_ids) == 1 and len(res.added_ids) == 1
        live = sorted(r["text"] for r in eng.get_all(user_id="u").collect())
        assert live == ["alice has a cat named whiskers", "alice works from home"]

    def test_reconcile_empty_facts(self, spark):
        """No facts extracted → no-op add (ref test_reconcile_empty_facts)."""
        eng = _mk(spark, extractor=_rel_extractor([{"facts": [], "entities": [], "relations": []}]))
        res = eng.add("nothing extractable", user_id="u")
        assert res.added_ids == [] and eng.store.memories.count() == 0


class TestThresholdBoundary:
    def test_similar_fact_surfaces_candidate(self, spark):
        """Identical text (cosine 1.0) is a candidate even at a high
        threshold (ref test_similar_fact_triggers_update)."""
        seen = []

        class Spy(ScriptedReconciler):
            def reconcile(self, facts, candidates, prompt=None):
                seen.append(list(candidates))
                return super().reconcile(facts, candidates)

        eng = _mk(spark, reconciler=Spy(), reconcile_threshold=0.95)
        eng.add("pizza is great", user_id="u")
        eng.add("pizza is great", user_id="u")
        assert seen[0] == []
        assert [c["text"] for c in seen[1]] == ["pizza is great"]
        assert seen[1][0]["score"] > 0.95

    def test_dissimilar_fact_no_candidates(self, spark):
        """Below-threshold matches are not shown to the policy."""
        seen = []

        class Spy(ScriptedReconciler):
            def reconcile(self, facts, candidates, prompt=None):
                seen.append(list(candidates))
                return super().reconcile(facts, candidates)

        eng = _mk(spark, reconciler=Spy(), reconcile_threshold=0.99)
        eng.add("pizza is great", user_id="u")
        eng.add("quantum chromodynamics lattice", user_id="u")
        assert seen[1] == []
        assert eng.get_all(user_id="u").count() == 2


class TestRelationReconciliation:
    def _eng(self, spark, extractor_outputs, policy):
        return _mk(spark, extractor=_rel_extractor(extractor_outputs),
                   relation_reconciler=policy)

    def _relation_rows(self, eng):
        return (
            eng.store.edges.where(F.col("edge_type") == "RELATION")
            .select("relation_type").collect()
        )

    def test_contradiction_deletes_old(self, spark):
        """Job change deletes the old works_at triple
        (ref test_reconcile_relations_contradiction)."""
        calls = []

        def policy(new_rels, existing):
            calls.append((new_rels, existing))
            return [e for e in existing if e["relation_type"] == "works_at"]

        eng = self._eng(
            spark,
            [{"facts": ["alice works at acme"],
              "entities": [{"name": "alice"}, {"name": "acme"}],
              "relations": [_rel("alice", "acme", "works_at")]},
             {"facts": ["alice works at beta"],
              "entities": [{"name": "alice"}, {"name": "beta"}],
              "relations": [_rel("alice", "beta", "works_at")]}],
            policy,
        )
        eng.add("alice works at acme", user_id="u")
        eng.add("alice works at beta", user_id="u")
        assert len(calls) == 1  # first add had no existing relations
        rels = self._relation_rows(eng)
        assert len(rels) == 1  # old triple deleted, new one stored

    def test_coexistence_keeps_both(self, spark):
        """likes pizza + likes sushi both survive
        (ref test_reconcile_relations_coexistence)."""
        eng = self._eng(
            spark,
            [{"facts": ["alice likes pizza"],
              "entities": [{"name": "alice"}, {"name": "pizza"}],
              "relations": [_rel("alice", "pizza", "likes")]},
             {"facts": ["alice likes sushi"],
              "entities": [{"name": "alice"}, {"name": "sushi"}],
              "relations": [_rel("alice", "sushi", "likes")]}],
            lambda new_rels, existing: [],
        )
        eng.add("alice likes pizza", user_id="u")
        eng.add("alice likes sushi", user_id="u")
        assert len(self._relation_rows(eng)) == 2

    def test_no_existing_skips_policy(self, spark):
        """First relations for an entity → policy NOT invoked
        (ref test_reconcile_relations_no_existing)."""
        calls = []

        def policy(new_rels, existing):  # pragma: no cover - must not run
            calls.append(1)
            return []

        eng = self._eng(
            spark,
            [{"facts": ["alice works at acme"],
              "entities": [{"name": "alice"}, {"name": "acme"}],
              "relations": [_rel("alice", "acme", "works_at")]}],
            policy,
        )
        eng.add("alice works at acme", user_id="u")
        assert calls == []
        assert len(self._relation_rows(eng)) == 1

    def test_no_new_relations_skips_policy(self, spark):
        """Adds without relations never consult the policy
        (ref test_reconcile_relations_no_new)."""
        calls = []

        def policy(new_rels, existing):  # pragma: no cover - must not run
            calls.append(1)
            return []

        eng = self._eng(
            spark,
            [{"facts": ["alice works at acme"],
              "entities": [{"name": "alice"}, {"name": "acme"}],
              "relations": [_rel("alice", "acme", "works_at")]},
             {"facts": ["plain fact"], "entities": [{"name": "alice"}],
              "relations": []}],
            policy,
        )
        eng.add("alice works at acme", user_id="u")
        eng.add("plain fact", user_id="u")
        assert calls == []

    def test_policy_error_deletes_nothing(self, spark):
        """A raising policy neither crashes the add nor deletes
        (ref test_reconcile_relations_error)."""

        def policy(new_rels, existing):
            raise RuntimeError("llm fell over")

        eng = self._eng(
            spark,
            [{"facts": ["alice works at acme"],
              "entities": [{"name": "alice"}, {"name": "acme"}],
              "relations": [_rel("alice", "acme", "works_at")]},
             {"facts": ["alice works at beta"],
              "entities": [{"name": "alice"}, {"name": "beta"}],
              "relations": [_rel("alice", "beta", "works_at")]}],
            policy,
        )
        eng.add("alice works at acme", user_id="u")
        eng.add("alice works at beta", user_id="u")  # must not raise
        assert len(self._relation_rows(eng)) == 2  # nothing deleted
