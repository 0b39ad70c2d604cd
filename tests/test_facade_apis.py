"""Facade read APIs (reference `manager.py:2113-2265`): temporal_chain,
episode_chain, get_episodes, get_provenance, set_importance, add_batch —
the reference's `tests/test_episodes.py` / `test_temporal.py` themes —
plus the round-3 lifecycle semantics fixes (UPDATE history id,
duplicate-target dedupe, metric coalesce, temporal-hint OR)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.lifecycle import Decision, execute_decisions

from conftest import supersede
from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import (
    HashEmbedder,
    ScriptedExtractor,
    ScriptedReconciler,
)


def _mk(spark, **kw):
    t = [1_000_000]

    def now():
        t[0] += 1000
        return t[0]

    kw.setdefault("enable_episodes", True)
    return MemoryEngine(spark, now_fn=now, **kw)


class TestTemporalChain:
    def _chained(self, spark):
        # episodes off: temporal_chain walks LEADS_TO memory edges,
        # which are only written without episodes (reference
        # `manager.py:240-245` episode/elif gating)
        eng = _mk(spark, enable_episodes=False)
        for i in range(4):
            eng.add(f"step {i}", user_id="u", session_id="s", infer=False)
        ids = [r["id"] for r in
               eng.store.memories.orderBy("created_at").collect()]
        return eng, ids

    def test_forward(self, spark):
        eng, ids = self._chained(spark)
        got = eng.temporal_chain(ids[0], direction="forward").collect()
        assert [r["memory_id"] for r in got] == ids[1:]
        assert [r["text"] for r in got] == ["step 1", "step 2", "step 3"]

    def test_backward(self, spark):
        eng, ids = self._chained(spark)
        got = eng.temporal_chain(ids[3], direction="backward").collect()
        assert [r["memory_id"] for r in got] == ids[:3]

    def test_both_dedupes(self, spark):
        eng, ids = self._chained(spark)
        got = eng.temporal_chain(ids[1], direction="both").collect()
        assert sorted(r["memory_id"] for r in got) == sorted(
            ids[:1] + ids[2:]
        )

    def test_max_depth_truncates(self, spark):
        eng, ids = self._chained(spark)
        got = eng.temporal_chain(ids[0], max_depth=2).collect()
        assert [r["memory_id"] for r in got] == ids[1:3]

    def test_user_scope_filters(self, spark):
        eng, ids = self._chained(spark)
        assert eng.temporal_chain(ids[0], user_id="someone").count() == 0
        assert eng.temporal_chain(ids[0], user_id="u").count() == 3

    def test_unknown_direction_raises(self, spark):
        eng, ids = self._chained(spark)
        with pytest.raises(ValueError):
            eng.temporal_chain(ids[0], direction="sideways")


class TestEpisodeChain:
    def _eng(self, spark, n=4):
        eng = _mk(spark)
        for i in range(n):
            eng.add(f"ep {i}", user_id="u", session_id="s", infer=False)
        eps = [r["id"] for r in
               eng.store.episodes.orderBy("created_at").collect()]
        return eng, eps

    def test_forward_order(self, spark):
        eng, eps = self._eng(spark)
        got = eng.episode_chain(eps[0]).collect()
        assert [r["episode_id"] for r in got] == eps[1:]
        assert [r["position"] for r in got] == [1, 2, 3]

    def test_both_is_reversed_backward_then_forward(self, spark):
        eng, eps = self._eng(spark)
        got = eng.episode_chain(eps[2], direction="both").collect()
        # reference order: farthest predecessor first, then successors
        assert [r["episode_id"] for r in got] == [eps[0], eps[1], eps[3]]
        assert [r["position"] for r in got] == [-2, -1, 1]

    def test_max_depth(self, spark):
        eng, eps = self._eng(spark)
        assert eng.episode_chain(eps[0], max_depth=1).count() == 1


class TestGetEpisodes:
    def test_filters_and_arrays(self, spark):
        ext = ScriptedExtractor(
            outputs=[
                {
                    "facts": ["alice fact"],
                    "entities": [{"name": "Alice", "entity_type": "person"}],
                    "relations": [],
                },
                {"facts": ["plain"], "entities": [], "relations": []},
            ]
        )
        eng = _mk(spark, extractor=ext)
        r1 = eng.add("alice fact", user_id="u", session_id="s1")
        eng.add("plain", user_id="u", session_id="s2")
        eng.add("other user", user_id="v", session_id="s1", infer=False)

        all_u = eng.get_episodes(user_id="u").collect()
        assert len(all_u) == 2
        first = all_u[0]
        assert first["produced_memories"] == sorted(r1.added_ids)
        assert first["mentioned_entities"] == ["alice"]
        assert all_u[1]["mentioned_entities"] == []

        s1 = eng.get_episodes(user_id="u", session_id="s1").collect()
        assert len(s1) == 1 and s1[0]["content"] == "alice fact"

    def test_limit_keeps_oldest_first(self, spark):
        eng = _mk(spark)
        for i in range(5):
            eng.add(f"m{i}", user_id="u", infer=False)
        got = eng.get_episodes(user_id="u", limit=3).collect()
        assert [r["content"] for r in got] == ["m0", "m1", "m2"]


class TestProvenance:
    def test_produced_episode_returned(self, spark):
        eng = _mk(spark)
        res = eng.add("a fact", user_id="u", session_id="s", infer=False)
        mid = res.added_ids[0]
        got = eng.get_provenance(mid).collect()
        assert len(got) == 1 and got[0]["content"] == "a fact"
        assert eng.get_provenance(999_999).count() == 0


class TestSetImportance:
    def test_set_and_bounds(self, spark):
        eng = _mk(spark)
        mid = eng.add("x", user_id="u", infer=False).added_ids[0]
        assert eng.set_importance(mid, 0.75) is True
        row = eng.store.memories.where(F.col("id") == mid).collect()[0]
        assert row["importance"] == 0.75
        assert eng.set_importance(424242, 0.5) is False
        with pytest.raises(ValueError):
            eng.set_importance(mid, 1.5)


class TestAddBatch:
    def test_batch_embeds_once_when_not_inferring(self, spark):
        calls = []
        real = HashEmbedder()

        class Spy:
            dimensions = real.dimensions

            def embed(self, texts):
                calls.append(list(texts))
                return real.embed(texts)

        eng = _mk(spark, embedder=Spy())
        res = eng.add_batch(["one", "two", "three"], user_id="u",
                            infer=False)
        assert len(res.added_ids) == 3
        # ONE embed call for the whole batch (reference add_batch
        # contract), not one per message
        assert calls == [["one", "two", "three"]]
        texts = sorted(r["text"] for r in eng.store.memories.collect())
        assert texts == ["one", "three", "two"]

    def test_infer_path_runs_sequentially(self, spark):
        rec = ScriptedReconciler(
            outputs=[
                {"decisions": [{"action": "ADD", "text": "first"}]},
                {"decisions": [{"action": "UPDATE", "text": "second",
                                "target_memory_id": 1}]},
            ]
        )
        eng = _mk(spark, reconciler=rec)
        res = eng.add_batch(["first", "second"], user_id="u")
        assert len(res.added_ids) == 1 and len(res.updated_ids) == 1
        live = [r["text"] for r in eng.get_all(user_id="u").collect()]
        assert live == ["second"]


class TestLifecycleSemantics:
    def test_decision_update_history_recorded_under_new_id(self, spark):
        # the reconciler's UPDATE decision supersedes: history rides the
        # NEW memory id (reference decision branch, manager.py:978)
        eng = _mk(spark)
        old = eng.add("v1", user_id="u", infer=False).added_ids[0]
        res = supersede(eng, old, "v2", user_id="u")
        new = res.updated_ids[0]
        assert new != old
        ev_new = [r["event"] for r in eng.history(new).collect()]
        ev_old = [r["event"] for r in eng.history(old).collect()]
        assert ev_new == ["UPDATE"]
        assert ev_old == ["ADD"]
        upd = eng.history(new).collect()[0]
        assert upd["old_text"] == "v1" and upd["new_text"] == "v2"

    def test_public_update_history_same_id(self, spark):
        # the public update() is in-place: ADD + UPDATE under ONE id
        # (reference `_update` manager.py:836-855,
        # test_update_records_history)
        eng = _mk(spark)
        mid = eng.add("v1", user_id="u", infer=False).added_ids[0]
        res = eng.update(mid, "v2", user_id="u")
        assert res.updated_ids == [mid]
        assert [r["event"] for r in eng.history(mid).collect()] == [
            "ADD", "UPDATE",
        ]

    def test_duplicate_targets_keep_id_unique(self, spark):
        eng = _mk(spark)
        mid = eng.add("dup target", user_id="u", infer=False).added_ids[0]
        st, res, _, _ = execute_decisions(
            eng.store,
            [
                Decision("UPDATE", "new text", target_memory_id=mid),
                Decision("DELETE", target_memory_id=mid),
            ],
            eng.embedder, user_id="u", now_ms=2_000_000,
            next_node_id=eng._next_node_id, next_edge_id=eng._next_edge_id,
        )
        ids = [r["id"] for r in st.memories.collect()]
        assert len(ids) == len(set(ids))  # no duplicated memory rows
        assert st.memories.where(
            (F.col("id") == mid) & F.col("expired_at").isNotNull()
        ).count() == 1


class TestMetricCoalesce:
    def test_apply_metrics_keeps_old_values_for_uncovered_rows(self, spark):
        from grafeo_memory_spark.graph.metrics import apply_metrics

        eng = _mk(spark)
        a = eng.add("covered", user_id="u", infer=False).added_ids[0]
        b = eng.add("uncovered", user_id="u", infer=False).added_ids[0]
        seed = spark.createDataFrame(
            [(a, 0.1, 0.2, 1), (b, 0.3, 0.4, 2)],
            "node_id long, _pagerank double, _betweenness double, "
            "_community int",
        )
        st = apply_metrics(eng.store, seed)
        # second run covers only `a`: `b` keeps its old cached values
        upd = spark.createDataFrame(
            [(a, 0.9, 0.8, 7)],
            "node_id long, _pagerank double, _betweenness double, "
            "_community int",
        )
        st = apply_metrics(st, upd)
        rows = {r["id"]: r for r in st.memories.collect()}
        assert rows[a]["_pagerank"] == 0.9 and rows[a]["_community"] == 7
        assert rows[b]["_pagerank"] == 0.3 and rows[b]["_community"] == 2


class TestTemporalHintOr:
    def test_past_state_query_overrides_explicit_flag(self, spark):
        eng = _mk(spark)
        old = eng.add("lived in Paris", user_id="u", infer=False).added_ids[0]
        supersede(eng, old, "lives in Berlin", user_id="u")
        # "previously" classifies as past-state; explicit
        # include_expired=False must NOT suppress the hint (reference
        # ORs them)
        got = eng.search(
            "where did I previously live", user_id="u",
            include_expired=False, k=10,
        ).collect()
        texts = {r["text"] for r in got}
        assert "lived in Paris" in texts
