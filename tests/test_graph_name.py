"""graph_name multi-graph isolation parity (reference
`tests/test_graph_name.py`, 15 cases): node stamping, per-graph entity
identity, search/get_all/stats scoping, None-sees-everything, and the
graph-scoped session chain (reference `manager.py:1199-1200`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor


def _mk(spark, **kw):
    t = [1_000_000]

    def now():
        t[0] += 1000
        return t[0]

    return MemoryEngine(spark, now_fn=now, **kw)


def _alice_extraction():
    return {
        "facts": ["alice works at acme corp"],
        "entities": [
            {"name": "alice", "entity_type": "person"},
            {"name": "acme_corp", "entity_type": "organization"},
        ],
        "relations": [],
    }


class TestGraphNameStamping:
    def test_memory_node_stamped_with_graph_name(self, spark):
        eng = _mk(spark)
        eng.add("fact", user_id="u", graph_name="graph_a", infer=False)
        assert eng.store.memories.collect()[0]["graph_name"] == "graph_a"

    def test_entity_node_stamped_with_graph_name(self, spark):
        eng = _mk(spark, extractor=ScriptedExtractor([_alice_extraction()]))
        eng.add("alice works at acme", user_id="u", graph_name="graph_a")
        assert {r["graph_name"] for r in eng.store.entities.collect()} == {"graph_a"}

    def test_no_graph_name_means_null(self, spark):
        eng = _mk(spark, extractor=ScriptedExtractor([_alice_extraction()]))
        eng.add("alice works at acme", user_id="u")
        assert eng.store.memories.collect()[0]["graph_name"] is None
        assert {r["graph_name"] for r in eng.store.entities.collect()} == {None}

    def test_batch_add_stamps_graph_name(self, spark):
        eng = _mk(spark)
        eng.add_batch(["one", "two"], user_id="u", graph_name="g", infer=False)
        assert {r["graph_name"] for r in eng.store.memories.collect()} == {"g"}


class TestGraphNameVisibility:
    def _two_graphs(self, spark):
        eng = _mk(spark)
        eng.add("alice works at acme", user_id="u", graph_name="graph_a", infer=False)
        eng.add("bob likes hiking", user_id="u", graph_name="graph_b", infer=False)
        return eng

    def test_search_isolated_between_graphs(self, spark):
        eng = self._two_graphs(spark)
        texts = [r["text"] for r in
                 eng.search("anything", user_id="u", k=10, graph_name="graph_a").collect()]
        assert texts == ["alice works at acme"]

    def test_get_all_isolated_between_graphs(self, spark):
        eng = self._two_graphs(spark)
        a = eng.get_all(user_id="u", filters={"graph_name": "graph_a"}).collect()
        assert [r["text"] for r in a] == ["alice works at acme"]

    def test_no_graph_name_sees_everything(self, spark):
        """graph_name=None is unscoped (ref test_no_graph_name_sees_everything)."""
        eng = self._two_graphs(spark)
        assert eng.get_all(user_id="u").count() == 2
        assert eng.search("anything", user_id="u", k=10).count() == 2


class TestGraphNameEntityIsolation:
    def test_same_entity_different_graphs(self, spark):
        """Same entity name in two graphs → two nodes
        (ref test_same_entity_different_graphs)."""
        eng = _mk(spark, extractor=ScriptedExtractor(
            [_alice_extraction(), _alice_extraction()]
        ))
        eng.add("alice works at acme", user_id="u", graph_name="graph_a")
        eng.add("alice works at acme", user_id="u", graph_name="graph_b")
        alice = eng.store.entities.where(F.col("name") == "alice").collect()
        assert len(alice) == 2
        assert {r["graph_name"] for r in alice} == {"graph_a", "graph_b"}


class TestGraphNameStats:
    def test_stats_scoped_to_graph(self, spark):
        eng = _mk(spark, extractor=ScriptedExtractor([
            _alice_extraction(),
            {"facts": ["bob likes hiking"],
             "entities": [{"name": "bob", "entity_type": "person"}],
             "relations": []},
            {"facts": ["bob plays guitar"],
             "entities": [{"name": "bob", "entity_type": "person"}],
             "relations": []},
        ]))
        eng.add("alice works at acme", user_id="u", graph_name="graph_a")
        eng.add("bob likes hiking", user_id="u", graph_name="graph_b")
        eng.add("bob plays guitar", user_id="u", graph_name="graph_b")
        sa, sb = eng.stats(graph_name="graph_a"), eng.stats(graph_name="graph_b")
        assert sa["total_memories"] == 1 and sb["total_memories"] == 2
        assert sa["entities"] == 2  # alice + acme_corp
        assert sb["entities"] == 1  # bob (reused within the graph)

    def test_stats_no_graph_name_counts_all(self, spark):
        eng = _mk(spark)
        eng.add("a", user_id="u", graph_name="graph_a", infer=False)
        eng.add("b", user_id="u", graph_name="graph_b", infer=False)
        assert eng.stats()["total_memories"] == 2


class TestGraphScopedSessionChain:
    def test_temporal_chain_scoped(self, spark):
        """The same run_id in two graphs builds two independent LEADS_TO
        chains (ref test_temporal_chain_scoped; reference
        `manager.py:1199-1200`)."""
        eng = _mk(spark)
        first = eng.add("alice works at acme", user_id="u", run_id="session1",
                        graph_name="graph_a", infer=False).added_ids[0]
        eng.add("bob likes hiking", user_id="u", run_id="session1",
                graph_name="graph_b", infer=False)
        eng.add("alice got promoted", user_id="u", run_id="session1",
                graph_name="graph_a", infer=False)
        chain = eng.temporal_chain(first, user_id="u", direction="forward").collect()
        texts = [r["text"] for r in chain]
        assert texts == ["alice got promoted"]
        assert all("bob" not in t for t in texts)

    def test_unscoped_session_chain_still_links(self, spark):
        """Without graph_name the chain behaves as before (single chain)."""
        eng = _mk(spark)
        first = eng.add("one", user_id="u", run_id="r", infer=False).added_ids[0]
        eng.add("two", user_id="u", run_id="r", infer=False)
        chain = eng.temporal_chain(first, user_id="u", direction="forward").collect()
        assert [r["text"] for r in chain] == ["two"]
