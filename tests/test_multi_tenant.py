"""Multi-tenant hygiene — reference `tests/test_multi_tenant.py`
themes: graph metrics must skip foreign users' nodes, foreign data
survives another tenant's delete_all, a foreign entity with the same
name is never reused across users, and stats can be scoped to one
graph (VERDICT r3 item 7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor


def _entity_add(name="acme", user="u1"):
    return {
        "facts": [f"{user} mentions {name}"],
        "entities": [{"name": name, "entity_type": "organization"}],
        "relations": [],
    }


class TestMultiTenant:
    def test_delete_all_preserves_foreign_data(self, spark):
        eng = MemoryEngine(spark, now_fn=lambda: 1_000)
        eng.add("u1 fact", user_id="u1", infer=False)
        eng.add("u2 fact", user_id="u2", infer=False)
        removed = eng.delete_all(user_id="u1")
        assert removed == 1
        assert eng.get_all(user_id="u1").count() == 0
        assert [r["text"] for r in eng.get_all(user_id="u2").collect()] == [
            "u2 fact"
        ]

    def test_same_name_entity_not_reused_across_users(self, spark):
        ext = ScriptedExtractor(
            outputs=[_entity_add("acme", "u1"), _entity_add("acme", "u2")]
        )
        eng = MemoryEngine(spark, extractor=ext, now_fn=lambda: 1_000)
        eng.add("u1 mentions acme", user_id="u1")
        eng.add("u2 mentions acme", user_id="u2")
        ents = eng.store.entities.where(F.col("name") == "acme").collect()
        assert len(ents) == 2  # one per user, never shared
        assert {e["user_id"] for e in ents} == {"u1", "u2"}

    def test_same_user_entity_is_reused(self, spark):
        ext = ScriptedExtractor(
            outputs=[_entity_add("acme", "u1"), _entity_add("acme", "u1")]
        )
        eng = MemoryEngine(spark, extractor=ext, now_fn=lambda: 1_000)
        eng.add("first mention", user_id="u1")
        eng.add("second mention", user_id="u1")
        assert (
            eng.store.entities.where(F.col("name") == "acme").count() == 1
        )

    def test_stats_scoped_by_graph_name(self, spark):
        eng = MemoryEngine(spark, now_fn=lambda: 1_000)
        eng.add("g1 fact a", user_id="u", graph_name="g1", infer=False)
        eng.add("g1 fact b", user_id="u", graph_name="g1", infer=False)
        eng.add("g2 fact", user_id="u", graph_name="g2", infer=False)
        assert eng.stats()["total_memories"] == 3
        assert eng.stats(graph_name="g1")["total_memories"] == 2
        assert eng.stats(graph_name="g2")["total_memories"] == 1
        assert eng.stats(graph_name="nope")["total_memories"] == 0

    def test_metrics_cover_all_tenants_without_cross_boost(self, spark):
        # graph metrics run over the whole store, but HAS_ENTITY /
        # RELATION edges never cross users (entities are per-user), so
        # one tenant's dense graph cannot boost another's pagerank
        ext = ScriptedExtractor(
            outputs=[
                _entity_add("acme", "u1"),
                _entity_add("globex", "u2"),
            ]
        )
        eng = MemoryEngine(
            spark, extractor=ext, now_fn=lambda: 1_000,
            enable_graph_algorithms=True,
        )
        eng.add("u1 mentions acme", user_id="u1")
        eng.add("u2 mentions globex", user_id="u2")
        eng.refresh_metrics()
        rows = {
            r["user_id"]: r["_pagerank"]
            for r in eng.store.memories.collect()
        }
        # both tenants' single-memory graphs are structurally identical
        # → identical metric values (no cross-tenant edge inflation)
        assert rows["u1"] == rows["u2"]


class TestStatsShape:
    """Reference MemoryStats fields (`types.py:256-267`)."""

    def test_stats_includes_community_and_db_info(self, spark):
        eng = MemoryEngine(spark, now_fn=lambda: 1_000)
        st = eng.stats()
        assert st["communities"] == 0
        assert st["db_info"]["engine"] == "pyspark"
        assert "version" in st["db_info"]
        # deliberately no raw total-node count in db_info (reference
        # test_stats_db_info_has_no_total_node_count)
        assert "total_node_count" not in st["db_info"]

    def test_stats_community_count_after_detect(self, spark):
        ext = ScriptedExtractor(
            outputs=[{
                "facts": ["a knows b"],
                "entities": [{"name": "a", "entity_type": "person"},
                             {"name": "b", "entity_type": "person"}],
                "relations": [{"source": "a", "target": "b",
                               "relation_type": "knows"}],
            }]
        )
        eng = MemoryEngine(spark, extractor=ext, now_fn=lambda: 1_000)
        eng.add("a knows b", user_id="u")
        eng.detect_communities(user_id="u")
        assert eng.stats()["communities"] == 1
