"""Explain, history, and graph_name breadth — reference
`tests/test_explain.py` (6), `test_history.py` (8), `test_graph_name.py`
themes not yet pinned elsewhere (VERDICT r3 item 7)."""

from __future__ import annotations

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor

NOW = [1_700_000_000_000]


def tick():
    NOW[0] += 60_000
    return NOW[0]


class TestExplain:
    def test_explain_has_core_steps(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        eng.add("a fact", user_id="u", infer=False)
        eng.search("a fact", user_id="u", k=3).collect()
        stages = eng.explain()
        for step in ("scope_filter", "hybrid_search", "merge", "final"):
            assert step in stages, stages

    def test_explain_reflects_most_recent_search(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        eng.add("a fact", user_id="u", infer=False)
        eng.search("a fact", user_id="u", k=3, min_score=0.5).collect()
        assert "min_score_filter" in eng.explain()
        eng.search("a fact", user_id="u", k=3).collect()
        assert "min_score_filter" not in eng.explain()

    def test_explain_empty_store(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        assert eng.search("anything", user_id="u", k=3).count() == 0
        assert "final" in eng.explain()

    def test_no_topology_steps_by_default(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        eng.add("a fact", user_id="u", infer=False)
        eng.search("a fact", user_id="u", k=3).collect()
        stages = eng.explain()
        assert "topology_boost" not in stages
        assert "rerank" not in stages


class TestHistory:
    def test_create_event_recorded_with_actor(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        res = eng.add(
            [{"role": "user", "name": "alice", "content": "likes jazz"}],
            user_id="u", infer=False,
        )
        rows = eng.history(res.added_ids[0]).collect()
        assert [r["event"] for r in rows] == ["ADD"]
        assert rows[0]["actor_id"] == "alice"
        assert rows[0]["role"] == "user"

    def test_history_in_timestamp_order(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        res = eng.add("v1", user_id="u", infer=False)
        mid = res.added_ids[0]
        upd = eng.update(mid, "v2", user_id="u")
        new_id = upd.updated_ids[0]
        rows = eng.history(new_id).collect()
        ts = [r["timestamp"] for r in rows]
        assert ts == sorted(ts)
        assert rows[-1]["event"] == "UPDATE"
        assert rows[-1]["old_text"] == "v1" and rows[-1]["new_text"] == "v2"

    def test_delete_event_recorded(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        res = eng.add("temp", user_id="u", infer=False)
        mid = res.added_ids[0]
        eng.delete(mid)
        events = [r["event"] for r in eng.history(mid).collect()]
        assert events[-1] == "DELETE"

    def test_empty_for_nonexistent_node(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        assert eng.history(999_999).count() == 0


class TestGraphName:
    def test_memory_and_entity_stamped(self, spark):
        ext = ScriptedExtractor(
            outputs=[{
                "facts": ["bob works at acme"],
                "entities": [{"name": "bob", "entity_type": "person"}],
                "relations": [],
            }]
        )
        eng = MemoryEngine(spark, extractor=ext, now_fn=tick)
        eng.add("bob works at acme", user_id="u", graph_name="work")
        mem = eng.store.memories.collect()[0]
        ent = eng.store.entities.collect()[0]
        assert mem["graph_name"] == "work"
        assert ent["graph_name"] == "work"

    def test_no_graph_name_leaves_null(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        eng.add("plain", user_id="u", infer=False)
        assert eng.store.memories.collect()[0]["graph_name"] is None

    def test_same_entity_name_different_graphs_not_shared(self, spark):
        out = {
            "facts": ["acme mention"],
            "entities": [{"name": "acme", "entity_type": "organization"}],
            "relations": [],
        }
        ext = ScriptedExtractor(outputs=[out, dict(out)])
        eng = MemoryEngine(spark, extractor=ext, now_fn=tick)
        eng.add("acme mention", user_id="u", graph_name="g1")
        eng.add("acme mention", user_id="u", graph_name="g2")
        ents = eng.store.entities.collect()
        assert len(ents) == 2
        assert {e["graph_name"] for e in ents} == {"g1", "g2"}

    def test_search_isolated_between_graphs(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        eng.add("work secret", user_id="u", graph_name="work", infer=False)
        eng.add("home secret", user_id="u", graph_name="home", infer=False)
        hits = eng.search(
            "secret", user_id="u", k=5, graph_name="work"
        ).collect()
        assert [r["text"] for r in hits] == ["work secret"]


class TestGroupedSearch:
    """Reference `search(grouped=True)` (`manager.py:1571-1583,2175`)."""

    def test_grouped_buckets_by_session_chronologically(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        eng.add("s1 second fact", user_id="u", session_id="s1", infer=False)
        eng.add("s2 only fact", user_id="u", session_id="s2", infer=False)
        eng.add("s1 first fact", user_id="u", session_id="s1", infer=False)
        groups = eng.search_grouped("fact", user_id="u", k=10)
        assert set(groups) == {"s1", "s2"}
        s1 = [r["text"] for r in groups["s1"]]
        # chronological within the group, regardless of score order
        assert s1 == ["s1 second fact", "s1 first fact"]
        assert [r["text"] for r in groups["s2"]] == ["s2 only fact"]

    def test_no_session_goes_to_default_group(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        eng.add("loose fact", user_id="u", infer=False)
        groups = eng.search_grouped("loose fact", user_id="u", k=5)
        assert list(groups) == ["default"]


class TestLearnedAt:
    def test_learned_at_defaults_to_created_at(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        eng.add("a fact", user_id="u", infer=False)
        row = eng.store.memories.collect()[0]
        assert row["learned_at"] == row["created_at"]


class TestAccessStats:
    """A6 write-back (reference `scoring.py:115-121`): serving a search
    result increments access_count and stamps last_accessed."""

    def test_search_updates_access_stats_when_enabled(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        eng.add("popular fact", user_id="u", infer=False)
        eng.add("unrelated thing entirely", user_id="u", infer=False)
        for _ in range(2):
            eng.search(
                "popular fact", user_id="u", k=1, update_access_stats=True
            ).collect()
        rows = {r["text"]: r for r in eng.store.memories.collect()}
        hit = rows["popular fact"]
        assert hit["access_count"] == 2
        assert hit["last_accessed"] is not None
        assert rows["unrelated thing entirely"]["access_count"] == 0

    def test_search_read_only_by_default(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        eng.add("a fact", user_id="u", infer=False)
        eng.search("a fact", user_id="u", k=1).collect()
        assert eng.store.memories.collect()[0]["access_count"] == 0

    def test_frequency_feeds_back_into_ranking(self, spark):
        # repeated access raises the composite score via frequency
        eng = MemoryEngine(spark, now_fn=tick)
        eng.add("twin fact alpha", user_id="u", infer=False)
        eng.record_access(
            [eng.store.memories.collect()[0]["id"]] * 1
        )
        row = eng.store.memories.collect()[0]
        assert row["access_count"] == 1


class _StubEmbedder:
    """Maps known texts to crafted unit-ish vectors so MMR geometry is
    deterministic (HashEmbedder vectors are not semantic)."""

    def __init__(self, table, dims=2):
        self.table = table
        self._dims = dims

    @property
    def dimensions(self):
        return self._dims

    def embed(self, texts):
        return [list(self.table[t]) for t in texts]


class TestDiverseSearch:
    """V3 via the facade (reference `search(diverse=True)` ->
    `diverse_search`, `search/vector.py:194-291`)."""

    _TABLE = {
        "find coffee": [0.9, 0.44],
        "coffee brewing notes": [1.0, 0.0],
        "gardening in spring": [0.0, 1.0],
    }

    def test_diverse_returns_k_and_stage(self, spark):
        eng = MemoryEngine(
            spark, embedder=_StubEmbedder(self._TABLE), now_fn=tick
        )
        for t in ("coffee brewing notes", "gardening in spring"):
            eng.add(t, user_id="u", infer=False)
        rows = eng.search(
            "find coffee", user_id="u", k=2, diverse=True
        ).collect()
        assert len(rows) == 2
        assert "mmr_diversify" in eng.explain()
        # first pick is the pure relevance argmax
        assert rows[0]["text"] == "coffee brewing notes"

    def test_diverse_prefers_spread_over_exact_duplicate(self, spark):
        eng = MemoryEngine(
            spark, embedder=_StubEmbedder(self._TABLE), now_fn=tick
        )
        eng.add("coffee brewing notes", user_id="u", infer=False)
        eng.add("coffee brewing notes", user_id="u", infer=False)  # dup
        eng.add("gardening in spring", user_id="u", infer=False)
        rows = eng.search(
            "find coffee", user_id="u", k=2, diverse=True
        ).collect()
        texts = [r["text"] for r in rows]
        # the exact duplicate's diversity penalty (sim-to-chosen = 1.0)
        # outweighs gardening's lower query similarity at lambda 0.5
        assert texts == ["coffee brewing notes", "gardening in spring"]

    def test_empty_store_diverse(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        assert (
            eng.search("anything", user_id="u", k=3, diverse=True).count()
            == 0
        )


class TestDeleteContract:
    """Reference delete() bool contract (`tests/test_manager.py`):
    True on removal, False for missing / repeated / invalid ids."""

    def test_delete_twice_second_is_false(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        res = eng.add("temp", user_id="u", infer=False)
        mid = res.added_ids[0]
        assert eng.delete(mid) is True
        assert eng.delete(mid) is False  # already soft-deleted

    def test_delete_missing_and_invalid(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        assert eng.delete(999_999) is False
        assert eng.delete("not_a_number") is False

    def test_hard_delete_contract(self, spark):
        eng = MemoryEngine(spark, now_fn=tick)
        res = eng.add("temp", user_id="u", infer=False)
        mid = res.added_ids[0]
        assert eng.delete(mid, hard=True) is True
        assert eng.delete(mid, hard=True) is False  # physically gone
