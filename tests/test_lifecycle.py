"""End-to-end lifecycle tests (SURVEY.md §2.14): add → update → delete
→ search semantics over the append-only store, in the reference test
suite's style (scripted reconciler, hash embedder, pinned clock)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.scoring import ScoreConfig
from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor, ScriptedReconciler

from conftest import supersede

NOW = [1_700_000_000_000]


def tick():
    NOW[0] += 60_000
    return NOW[0]


@pytest.fixture()
def engine(spark):
    return MemoryEngine(spark, now_fn=tick, enable_episodes=True)


def test_add_then_search_finds_it(engine):
    res = engine.add("alice likes coffee", user_id="alice")
    assert len(res.added_ids) == 1
    out = engine.search("coffee", user_id="alice", k=5).collect()
    assert [r["text"] for r in out] == ["alice likes coffee"]
    assert out[0]["source"] == "vector"
    # exact same text → hash embedder gives cosine 1 → top score
    assert engine.explain()[0] == "scope_filter"
    assert engine.explain()[-1] == "final"


def test_update_decision_expires_old_and_supersedes(engine):
    # the reconciler's UPDATE *decision* path supersedes; the public
    # update() is in-place (reference `_update` vs decision split)
    res = engine.add("bob works at acme", user_id="bob")
    old_id = res.added_ids[0]
    upd = supersede(engine, old_id, "bob works at globex", user_id="bob")
    new_id = upd.updated_ids[0]

    # search excludes the expired version
    texts = [
        r["text"] for r in engine.search("bob works", user_id="bob", k=10).collect()
    ]
    assert texts == ["bob works at globex"]

    # include_expired finds both (reference include_expired semantics)
    both = engine.search(
        "bob works", user_id="bob", k=10, include_expired=True
    ).collect()
    assert {r["text"] for r in both} == {
        "bob works at acme", "bob works at globex",
    }

    # SUPERSEDES edge new→old
    sup = engine.store.edges.where(F.col("edge_type") == "SUPERSEDES").collect()
    assert [(r["src"], r["dst"]) for r in sup] == [(new_id, old_id)]

    # bi-temporal: old version got invalid_at stamped
    old_row = engine.store.memories.where(F.col("id") == old_id).collect()[0]
    assert old_row["expired_at"] is not None
    assert old_row["invalid_at"] is not None

    # temporal-hint phrasing flips include_expired automatically (X1)
    past = engine.search("where did bob previously work", user_id="bob", k=10)
    assert {r["text"] for r in past.collect()} == {
        "bob works at acme", "bob works at globex",
    }


def test_update_inherits_entity_edges(spark):
    ext = ScriptedExtractor(
        [
            {
                "facts": ["carol plays piano"],
                "entities": [{"name": "Piano", "entity_type": "concept"}],
                "relations": [],
            },
        ]
    )
    eng = MemoryEngine(spark, extractor=ext, now_fn=tick)
    res = eng.add("carol plays piano", user_id="carol")
    old_id = res.added_ids[0]
    he_old = eng.store.edges.where(
        (F.col("edge_type") == "HAS_ENTITY") & (F.col("src") == old_id)
    ).collect()
    assert len(he_old) == 1
    # entity name normalized lowercase_underscore (X7)
    ent = eng.store.entities.collect()
    assert [e["name"] for e in ent] == ["piano"]

    upd = supersede(eng, old_id, "carol plays violin", user_id="carol")
    new_id = upd.updated_ids[0]
    he_new = eng.store.edges.where(
        (F.col("edge_type") == "HAS_ENTITY") & (F.col("src") == new_id)
    ).collect()
    assert [(r["dst"]) for r in he_new] == [he_old[0]["dst"]]


def test_delete_soft_and_history(engine):
    res = engine.add("dave lives in paris", user_id="dave")
    mid = res.added_ids[0]
    engine.delete(mid)
    assert engine.search("dave", user_id="dave", k=5).count() == 0
    events = [r["event"] for r in engine.history(mid).collect()]
    assert events == ["ADD", "DELETE"]


def test_reconciler_decisions_respected(spark):
    rec = ScriptedReconciler(
        [
            {"decisions": [{"action": "ADD", "text": "fact one"}]},
            # second add: NONE — store unchanged
            {"decisions": [{"action": "NONE"}]},
        ]
    )
    eng = MemoryEngine(spark, reconciler=rec, now_fn=tick)
    eng.add("fact one", user_id="u")
    eng.add("fact one again", user_id="u")
    assert eng.get_all(user_id="u").count() == 1
    # UPDATE without target downgrades to ADD (reference
    # reconciliation/memories.py:44-52)
    rec2 = ScriptedReconciler(
        [{"decisions": [{"action": "UPDATE", "text": "downgraded"}]}]
    )
    eng2 = MemoryEngine(spark, reconciler=rec2, now_fn=tick)
    r = eng2.add("x", user_id="u")
    assert len(r.added_ids) == 1


def test_session_chain_and_episode(engine):
    # episodes on → session continuity lives on NEXT_EPISODE, and NO
    # LEADS_TO memory edges are written (reference `manager.py:240-245`
    # episode/elif gating; `tests/test_episodes.py`
    # test_leads_to_not_created_with_episodes)
    engine.add("step one", user_id="eve", session_id="s1", run_id="r1")
    engine.add("step two", user_id="eve", session_id="s1", run_id="r1")
    lt = engine.store.edges.where(F.col("edge_type") == "LEADS_TO").collect()
    assert len(lt) == 0
    ep = engine.store.episodes.collect()
    assert len(ep) == 2
    ne = engine.store.edges.where(F.col("edge_type") == "NEXT_EPISODE").collect()
    assert len(ne) == 1
    assert (
        engine.store.edges.where(F.col("edge_type") == "PRODUCED").count() == 2
    )


def test_session_chain_without_episodes(spark):
    # episodes off → the memory-level LEADS_TO chain applies
    eng = MemoryEngine(spark, now_fn=tick)
    eng.add("step one", user_id="eve", session_id="s1", run_id="r1")
    eng.add("step two", user_id="eve", session_id="s1", run_id="r1")
    assert eng.store.edges.where(F.col("edge_type") == "LEADS_TO").count() == 1
    assert eng.store.episodes.count() == 0


def test_delete_all_counts(engine):
    engine.add("m1", user_id="frank")
    engine.add("m2", user_id="frank")
    engine.add("other", user_id="grace")
    assert engine.delete_all(user_id="frank") == 2
    assert engine.store.memories.count() == 1


def test_stats_rollup(engine):
    engine.add("a", user_id="u", memory_type="procedural")
    engine.add("b", user_id="u")  # NULL type → semantic
    s = engine.stats()
    assert s["memories_by_type"] == {"procedural": 1, "semantic": 1}
    assert s["total_memories"] == 2
    assert s["episodes"] == 2


def test_summarize_consolidation(engine):
    for i in range(8):
        engine.add(f"old fact {i}", user_id="hank")
    sids = engine.summarize(user_id="hank", preserve_recent=3, batch_size=10)
    assert len(sids) == 1
    mems = engine.store.memories.where(F.col("user_id") == "hank").collect()
    # 3 preserved + 1 summary
    assert len(mems) == 4
    summary = [m for m in mems if m["source"] == "summarize"]
    assert len(summary) == 1
    df_edges = engine.store.edges.where(F.col("edge_type") == "DERIVED_FROM")
    assert df_edges.count() == 5  # lineage to each consolidated original
    # DELETE history recorded per original
    dels = engine.store.history.where(F.col("event") == "DELETE").count()
    assert dels == 5


def test_search_min_score_and_chrono(spark):
    eng = MemoryEngine(
        spark,
        config=ScoreConfig(search_min_score=0.99),
        now_fn=tick,
    )
    eng.add("hello world", user_id="u")
    # min-score 0.99 filters everything (composite < 1 for non-identical)
    assert eng.search("something else entirely", user_id="u", k=5).count() == 0
    assert "min_score_filter" in eng.explain()
    # chronological sort stage appears when hinted
    eng2 = MemoryEngine(spark, now_fn=tick)
    eng2.add("first event", user_id="u")
    eng2.add("second event", user_id="u")
    out = eng2.search("when did the events happen", user_id="u", k=5)
    rows = out.collect()
    assert "temporal_sort" in eng2.explain()
    assert [r["text"] for r in rows] == ["first event", "second event"]


def test_summarize_topology_protection(spark):
    """Well-connected memories (R4 topology >= threshold) survive
    consolidation (reference manager.py:1863-1873)."""
    eng = MemoryEngine(spark, now_fn=tick)
    shared = {
        "facts": ["hub fact"],
        "entities": [
            {"name": "E1", "entity_type": "t"},
            {"name": "E2", "entity_type": "t"},
        ],
        "relations": [],
    }
    eng_ext = ScriptedExtractor(outputs=[dict(shared), dict(shared)])
    eng.extractor = eng_ext
    eng.add("hub fact", user_id="u")          # entities E1,E2
    eng.add("hub fact two", user_id="u")      # same entities → shared
    eng.extractor = ScriptedExtractor(outputs=[])  # plain adds below
    for i in range(3):
        eng.add(f"leaf fact {i}", user_id="u", infer=False)

    before = {r["id"]: r["text"] for r in eng.store.memories.collect()}
    hub_ids = [i for i, t in before.items() if t.startswith("hub")]
    # preserve_recent=0: every memory is a candidate; topology protects
    # the two hub memories (entity_count 2, shared_ratio 1 → R4 > 0.5)
    sids = eng.summarize(
        user_id="u", preserve_recent=0, topology_protect_threshold=0.5
    )
    assert sids  # leaves were consolidated
    left = {r["id"] for r in eng.store.memories.collect()}
    assert set(hub_ids) <= left  # hubs survived
    assert not any(t.startswith("leaf") for t in (
        r["text"] for r in eng.store.memories.collect()
    ))
    derived = eng.store.edges.where(F.col("edge_type") == "DERIVED_FROM")
    assert derived.count() == 3  # one lineage edge per consumed leaf


def test_reranker_failure_falls_back(spark):
    """R9 — a throwing reranker degrades to the original order
    (reference reranker.py:50-124 error fallback)."""

    class Boom:
        def rerank(self, query, results, top_k):
            raise RuntimeError("llm down")

    eng = MemoryEngine(spark, now_fn=tick, reranker=Boom())
    eng.add("aaa", user_id="u", infer=False)
    eng.add("bbb", user_id="u", infer=False)
    got = eng.search("aaa", user_id="u", k=2).collect()
    assert len(got) == 2
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)  # original order kept
    assert "rerank" in eng.explain()


def test_normalize_decisions_downgrades():
    # reference validation (`reconciliation/memories.py:44-52`):
    # UPDATE without a target downgrades to ADD keeping its payload;
    # DELETE without a target becomes NONE; valid decisions unchanged
    from grafeo_memory_spark.lifecycle import (
        ADD,
        DELETE,
        NONE,
        UPDATE,
        Decision,
        normalize_decisions,
    )

    out = normalize_decisions(
        [
            Decision(UPDATE, "new text", None, importance=0.7),
            Decision(DELETE, None, None),
            Decision(UPDATE, "kept", 5),
            Decision(DELETE, None, 6),
            Decision(ADD, "plain"),
            Decision(NONE),
        ]
    )
    assert [d.action for d in out] == [ADD, NONE, UPDATE, DELETE, ADD, NONE]
    assert out[0].text == "new text" and out[0].importance == 0.7
    assert out[0].target_memory_id is None
    assert out[2].target_memory_id == 5 and out[3].target_memory_id == 6


def test_normalize_decisions_action_parse():
    # reference `reconciliation/memories.py:33-38`: case-insensitive
    # action parse; unknown actions (and None) degrade to NONE, never
    # raise — policy output is untrusted
    from grafeo_memory_spark.lifecycle import (
        ADD,
        NONE,
        UPDATE,
        Decision,
        normalize_decisions,
    )

    out = normalize_decisions(
        [
            Decision("add", "lower"),
            Decision("Update", "mixed", 7),
            Decision("MERGE", "unknown"),
            Decision(None, "missing"),
        ]
    )
    assert [d.action for d in out] == [ADD, UPDATE, NONE, NONE]
    assert out[1].target_memory_id == 7
    assert out[0].text == "lower"


def test_score_config_construction_validation():
    # construction-time validation (reference `types.py:107-146`):
    # out-of-range unit knobs raise, off-unit core weight sum only warns
    import warnings

    with pytest.raises(ValueError):
        ScoreConfig(weight_similarity=1.5)
    with pytest.raises(ValueError):
        ScoreConfig(mmr_lambda=-0.1)
    with pytest.raises(ValueError):
        ScoreConfig(decay_rate=0.0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ScoreConfig(weight_similarity=0.9, weight_recency=0.9)
    assert any("core importance weights" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ScoreConfig()  # defaults sum to 1.0 — silent
    assert not w


def test_public_update_is_in_place(spark):
    """engine.update() rewrites the SAME node (reference `_update`
    `manager.py:836-855`): same id stays live, text/embedding replaced,
    history(id) reads ADD + UPDATE with old/new text."""
    eng = MemoryEngine(spark, now_fn=tick)
    mid = eng.add("alice works at acme", user_id="u", infer=False).added_ids[0]
    res = eng.update(mid, "alice works at globex corp", user_id="u")
    assert res.updated_ids == [mid]
    rows = eng.get_all(user_id="u").collect()
    assert [r["id"] for r in rows] == [mid]
    assert rows[0]["text"] == "alice works at globex corp"
    assert rows[0]["updated_at"] is not None
    hist = eng.history(mid).collect()
    assert [h["event"] for h in hist] == ["ADD", "UPDATE"]
    assert hist[1]["old_text"] == "alice works at acme"
    assert hist[1]["new_text"] == "alice works at globex corp"
    # repeated updates keep working on the same live id (reference
    # test_history_ordered_by_timestamp updates the same id 3x)
    eng.update(mid, "alice works at gamma", user_id="u")
    eng.update(mid, "alice works at delta", user_id="u")
    events = [h["event"] for h in eng.history(mid).collect()]
    assert events == ["ADD", "UPDATE", "UPDATE", "UPDATE"]


def test_public_update_unknown_id_raises(spark):
    eng = MemoryEngine(spark, now_fn=tick)
    with pytest.raises(ValueError):
        eng.update(999_999, "nope", user_id="u")


def test_public_update_re_embeds(spark):
    """Search finds the NEW text after update (re-embed contract,
    reference test_update_changes_text)."""
    eng = MemoryEngine(spark, now_fn=tick)
    mid = eng.add("original topic", user_id="u", infer=False).added_ids[0]
    eng.update(mid, "replacement topic", user_id="u")
    # exact-text query → cosine 1.0 against the NEW embedding, so the
    # updated row is the top hit (score is the weighted composite)
    got = eng.search("replacement topic", user_id="u", k=1).collect()
    assert got[0]["memory_id"] == mid
    assert got[0]["text"] == "replacement topic"


def test_summarize_policy_failure_skips_batch(engine):
    """An LLM failure for a batch skips that batch and preserves its
    originals (reference tests/test_manager.py:923-940)."""
    for i in range(4):
        engine.add(f"old fact {i}", user_id="ivy", infer=False)

    def boom(texts):
        raise RuntimeError("llm down")

    sids = engine.summarize(
        user_id="ivy", summarize_batch=boom, preserve_recent=1, batch_size=10
    )
    assert sids == []
    texts = {r["text"] for r in engine.get_all(user_id="ivy").collect()}
    assert texts == {f"old fact {i}" for i in range(4)}


def test_summarize_partial_failure_consolidates_surviving_batches(engine):
    """With batch_size=2 and the policy failing only on the first
    batch, the second batch still consolidates."""
    for i in range(5):
        engine.add(f"note {i}", user_id="jay", infer=False)

    calls = []

    def flaky(texts):
        calls.append(list(texts))
        if len(calls) == 1:
            raise RuntimeError("transient")
        return "summary: " + "; ".join(texts)

    sids = engine.summarize(
        user_id="jay", summarize_batch=flaky, preserve_recent=1, batch_size=2
    )
    assert len(sids) == 1  # batches: [0,1] failed, [2,3] summarized
    texts = {r["text"] for r in engine.get_all(user_id="jay").collect()}
    assert "note 0" in texts and "note 1" in texts  # failed batch preserved
    assert "note 2" not in texts and "note 3" not in texts
    assert "note 4" in texts  # preserve_recent
