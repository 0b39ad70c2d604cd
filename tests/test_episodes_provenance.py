"""Episode provenance, NEXT_EPISODE chains, reconciliation decision
variants, and community materialization through the facade — the
reference's episodes (14), reconciler (13), and communities (18) test
themes (SURVEY §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.operators.traversals import expand_chain
from grafeo_memory_spark.protocols import (
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


def test_every_add_records_episode_with_produced_edges(spark):
    eng = _mk(spark)
    eng.add("first message", user_id="u", session_id="s", infer=False)
    eng.add("second message", user_id="u", session_id="s", infer=False)
    eps = eng.store.episodes.orderBy("created_at").collect()
    assert [e["content"] for e in eps] == ["first message", "second message"]
    produced = eng.store.edges.where(F.col("edge_type") == "PRODUCED")
    # each episode PRODUCED exactly one memory
    assert produced.count() == 2
    # and the second episode chains to the first
    nxt = eng.store.edges.where(F.col("edge_type") == "NEXT_EPISODE").collect()
    assert len(nxt) == 1
    assert nxt[0]["src"] == eps[0]["id"] and nxt[0]["dst"] == eps[1]["id"]


def test_episode_chain_walk_matches_insertion_order(spark):
    eng = _mk(spark)
    for i in range(4):
        eng.add(f"msg {i}", user_id="u", session_id="s", infer=False)
    eps = eng.store.episodes.orderBy("created_at").collect()
    seed = spark.createDataFrame([(eps[0]["id"],)], "node_id long")
    walked = {
        r["node_id"]: r["depth"]
        for r in expand_chain(
            eng.store.edges, seed, "NEXT_EPISODE", max_depth=10
        ).collect()
    }
    assert walked == {eps[1]["id"]: 1, eps[2]["id"]: 2, eps[3]["id"]: 3}


def test_reconciler_update_decision_supersedes(spark):
    rec = ScriptedReconciler(
        outputs=[
            {"decisions": [{"action": "ADD", "text": "likes tea"}]},
            # second add: replace memory 1 (the reference UPDATE shape)
            {
                "decisions": [
                    {
                        "action": "UPDATE",
                        "text": "likes coffee now",
                        "target_memory_id": 1,
                    }
                ]
            },
        ]
    )
    eng = _mk(spark, reconciler=rec)
    eng.add("likes tea", user_id="u")
    eng.add("actually coffee", user_id="u")
    live = eng.get_all(user_id="u").collect()
    assert [r["text"] for r in live] == ["likes coffee now"]
    sup = eng.store.edges.where(F.col("edge_type") == "SUPERSEDES").collect()
    assert len(sup) == 1 and sup[0]["dst"] == 1
    hist = eng.store.history.orderBy("timestamp").collect()
    assert [h["event"] for h in hist] == ["ADD", "UPDATE"]


def test_reconciler_none_decision_skips(spark):
    rec = ScriptedReconciler(
        outputs=[
            {"decisions": [{"action": "ADD", "text": "a fact"}]},
            {"decisions": [{"action": "NONE"}]},
        ]
    )
    eng = _mk(spark, reconciler=rec)
    eng.add("a fact", user_id="u")
    eng.add("a fact again", user_id="u")
    assert eng.store.memories.count() == 1
    assert eng.store.history.count() == 1  # NONE leaves no history row


def test_update_without_target_downgrades_to_add(spark):
    rec = ScriptedReconciler(
        outputs=[
            {
                "decisions": [
                    {"action": "UPDATE", "text": "orphan update"}  # no target
                ]
            }
        ]
    )
    eng = _mk(spark, reconciler=rec)
    eng.add("something", user_id="u")
    got = eng.get_all(user_id="u").collect()
    # reference downgrades UPDATE-without-target to ADD (manager.py:910-943)
    assert [r["text"] for r in got] == ["orphan update"]
    assert eng.store.history.collect()[0]["event"] == "ADD"


def test_entities_and_relations_materialize(spark):
    ext = ScriptedExtractor(
        outputs=[
            {
                "facts": ["alice works at acme"],
                "entities": [
                    {"name": "Alice", "entity_type": "person"},
                    {"name": "Acme", "entity_type": "org"},
                ],
                "relations": [
                    {"source": "Alice", "target": "Acme",
                     "relation_type": "works_at"}
                ],
            }
        ]
    )
    eng = _mk(spark, extractor=ext)
    eng.add("alice works at acme", user_id="u")
    names = sorted(r["name"] for r in eng.store.entities.collect())
    assert names == ["acme", "alice"]  # X7 lowercase normalization
    rel = eng.store.edges.where(F.col("edge_type") == "RELATION").collect()
    assert len(rel) == 1 and rel[0]["relation_type"] == "works_at"
    he = eng.store.edges.where(F.col("edge_type") == "HAS_ENTITY")
    assert he.count() == 2  # memory linked to both entities


def test_entity_upsert_no_duplicates(spark):
    out = {
        "facts": ["fact"],
        "entities": [{"name": "Alice", "entity_type": "person"}],
        "relations": [],
    }
    eng = _mk(spark, extractor=ScriptedExtractor(outputs=[out, dict(out)]))
    eng.add("fact", user_id="u")
    eng.add("fact", user_id="u")
    # J6 find-or-create: one entity row, two HAS_ENTITY edges
    assert eng.store.entities.count() == 1
    assert (
        eng.store.edges.where(F.col("edge_type") == "HAS_ENTITY").count() == 2
    )


def test_usage_callback_counts_policy_calls(spark):
    seen: list[tuple[str, int]] = []
    eng = _mk(
        spark,
        usage_callback=lambda op, u: seen.append((op, u.calls)),
    )
    eng.add("a fact", user_id="u")  # extract + reconcile
    assert ("extract", 1) in seen and ("reconcile", 1) in seen


def test_episodes_not_created_when_disabled(spark):
    # reference `types.py:103`: enable_episodes defaults to False — a
    # plain add writes no Episode node and no PRODUCED edges
    eng = _mk(spark, enable_episodes=False)
    eng.add("no provenance", user_id="u", infer=False)
    assert eng.store.episodes.count() == 0
    assert (
        eng.store.edges.where(F.col("edge_type") == "PRODUCED").count() == 0
    )
    assert eng.get_episodes(user_id="u").count() == 0


def test_episode_properties(spark):
    """Episode rows carry content/source/user/session/run/created_at
    (reference `tests/test_episodes.py` test_episode_properties)."""
    eng = _mk(spark)
    eng.add("Bob likes pizza", user_id="u", session_id="sess1", run_id="run1",
            infer=False)
    ep = eng.store.episodes.collect()[0]
    assert ep["source"] == "message"
    assert ep["user_id"] == "u"
    assert ep["session_id"] == "sess1"
    assert ep["run_id"] == "run1"
    assert ep["created_at"] is not None
    assert "Bob likes pizza" in ep["content"]


def test_raw_add_creates_episode(spark):
    """infer=False still records an Episode (reference
    test_raw_add_creates_episode)."""
    eng = _mk(spark)
    res = eng.add("Some raw text", user_id="u", run_id="run1", infer=False)
    assert len(res.added_ids) == 1
    eps = eng.store.episodes.collect()
    assert len(eps) == 1 and "Some raw text" in eps[0]["content"]


def test_multiple_facts_multiple_produced(spark):
    """One episode PRODUCES every memory of its add (reference
    test_multiple_facts_multiple_produced)."""
    ext = ScriptedExtractor(
        [{"facts": ["fact a", "fact b", "fact c"], "entities": [],
          "relations": []}]
    )
    eng = _mk(spark, extractor=ext)
    res = eng.add("three facts", user_id="u")
    assert len(res.added_ids) == 3
    produced = eng.store.edges.where(F.col("edge_type") == "PRODUCED")
    assert produced.count() == 3
    assert produced.select("src").distinct().count() == 1  # one episode


def test_episode_nodes_not_in_search(spark):
    """Episodes never surface as search results (reference
    test_episode_nodes_not_in_search)."""
    eng = _mk(spark)
    eng.add("alice works at acme", user_id="u", run_id="r1", infer=False)
    rows = eng.search("alice work", user_id="u", k=10).collect()
    texts = {r["text"] for r in rows}
    assert texts == {"alice works at acme"}
    assert all(r["source"] in ("vector", "graph", "both") for r in rows)


def test_leads_to_not_created_with_episodes(spark):
    """Episodes on → zero LEADS_TO edges (reference
    test_leads_to_not_created_with_episodes; `manager.py:240-245`)."""
    eng = _mk(spark)
    eng.add("Fact one", user_id="u", run_id="run1", infer=False)
    eng.add("Fact two", user_id="u", run_id="run1", infer=False)
    assert eng.store.edges.where(F.col("edge_type") == "LEADS_TO").count() == 0
    assert eng.store.edges.where(
        F.col("edge_type") == "NEXT_EPISODE"
    ).count() == 1
