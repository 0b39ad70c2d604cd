"""Tests for the composed search pipeline (SURVEY §3.2): stage-trace
names, branch merge semantics, and filter placement — mirroring the
reference's explain() contract (`manager.py:794-834`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.scoring import ScoreConfig
from grafeo_memory_spark.plans.search_pipeline import (
    SearchRequest,
    search_pipeline,
)
from grafeo_memory_spark.store import Store, empty_store

DIMS = 4


def _vec(x, y=0.0):
    return [float(x), float(y), 0.0, 0.0]


@pytest.fixture()
def store(spark):
    s = empty_store(spark)
    n_rest = len(s.memories.schema) - 1
    cols = [f.name for f in s.memories.schema]

    def row(**kw):
        d = dict.fromkeys(cols)
        d.update(kw)
        return tuple(d[c] for c in cols)

    memories = spark.createDataFrame(
        [
            row(id=1, text="apple pie", user_id="u", created_at=1000,
                access_count=0, embedding=_vec(1.0)),
            row(id=2, text="banana bread", user_id="u", created_at=2000,
                access_count=0, embedding=_vec(0.9, 0.1)),
            row(id=3, text="other user", user_id="v", created_at=1500,
                access_count=0, embedding=_vec(1.0)),
            row(id=4, text="expired", user_id="u", created_at=500,
                access_count=0, expired_at=999, embedding=_vec(1.0)),
        ],
        s.memories.schema,
    )
    entities = spark.createDataFrame(
        [(10, "Apple", "org", "u", None)], s.entities.schema
    )
    edges = spark.createDataFrame(
        [(100, 1, 10, "HAS_ENTITY", None, None)], s.edges.schema
    )
    return Store(
        memories=memories, entities=entities, edges=edges,
        episodes=s.episodes, history=s.history,
    )


def _cfg():
    # retrieval-score-only composite so expectations stay closed-form
    return ScoreConfig(
        weight_similarity=1.0, weight_recency=0.0, weight_frequency=0.0,
        weight_importance=0.0, weight_topology=0.0,
        topology_boost_factor=0.0, cross_session_boost_factor=0.0,
    )


def test_vector_only_scopes_and_excludes_expired(store):
    out, stages = search_pipeline(
        store,
        SearchRequest(query_vec=_vec(1.0), k=10, user_id="u", config=_cfg()),
    )
    rows = out.collect()
    ids = [r["memory_id"] for r in rows]
    assert 3 not in ids  # other user
    assert 4 not in ids  # soft-expired
    assert ids[0] == 1  # exact match ranks first
    assert [s for s in ("scope_filter", "merge", "final") if s in stages] == [
        "scope_filter", "merge", "final",
    ]
    assert "graph_search" not in stages
    assert all(r["source"] == "vector" for r in rows)


def test_graph_branch_merge_marks_source_both(store):
    out, stages = search_pipeline(
        store,
        SearchRequest(
            query_vec=_vec(1.0), k=10, user_id="u",
            anchor_entity_names=["APPLE"],  # case-insensitive X5
            config=_cfg(),
        ),
    )
    by_id = {r["memory_id"]: r for r in out.collect()}
    assert by_id[1]["source"] == "both"  # found by vector AND 1-hop graph
    assert by_id[2]["source"] == "vector"
    assert "graph_search" in stages and "entity_extraction" in stages
    # agreement bonus: m1 score = max(v,g)*(1+0.1) > plain cosine 1.0
    assert by_id[1]["score"] == pytest.approx(1.1, abs=1e-6)


def test_include_expired_and_time_filters(store):
    out, stages = search_pipeline(
        store,
        SearchRequest(
            query_vec=_vec(1.0), k=10, user_id="u", include_expired=True,
            time_before=1500, config=_cfg(),
        ),
    )
    ids = sorted(r["memory_id"] for r in out.collect())
    assert ids == [1, 4]  # expired visible; m2 (2000) cut by time_before
    assert "temporal_filter" in stages


def test_min_score_filter_applies(store):
    out, stages = search_pipeline(
        store,
        SearchRequest(
            query_vec=_vec(1.0), k=10, user_id="u", min_score=0.999,
            config=_cfg(),
        ),
    )
    ids = [r["memory_id"] for r in out.collect()]
    assert ids == [1]  # m2 cosine ≈ 0.9939 < 0.999 cut; m1 = 1.0 kept
    assert "min_score_filter" in stages


def test_chronological_sort_flag(store):
    out, stages = search_pipeline(
        store,
        SearchRequest(
            query_vec=_vec(1.0), k=10, user_id="u",
            sort_chronologically=True, config=_cfg(),
        ),
    )
    ids = [r["memory_id"] for r in out.collect()]
    assert ids == sorted(
        ids,
        key=lambda i: {1: 1000, 2: 2000}[i],
    )
    assert "temporal_sort" in stages


def test_projection_carries_actor_and_learned_at(spark):
    """Search results include actor_id/role/learned_at (reference
    SearchResult fields, `types.py:189-209`;
    test_actor_in_search_results)."""
    from grafeo_memory_spark.manager import MemoryEngine

    eng = MemoryEngine(spark)
    eng.add({"role": "user", "content": "I like hiking", "name": "alice"},
            user_id="u", infer=False)
    row = eng.search("hiking", user_id="u", k=1).collect()[0]
    assert row["actor_id"] == "alice"
    assert row["role"] == "user"
    assert row["learned_at"] is not None


def test_graph_search_depth_gates_two_hop(spark, store):
    """Reference multi-hop contract (`types.py:92-93`, test_multi_hop):
    depth 1 (default) = direct entity->memory only; depth 2 adds the
    entity->RELATION->entity->memory tier at 0.7x."""
    # wire: Apple -RELATION-> Banana <-HAS_ENTITY- memory 2
    ent2 = spark.createDataFrame(
        [(11, "Banana", "org", "u", None)], store.entities.schema
    )
    extra = spark.createDataFrame(
        [
            (101, 10, 11, "RELATION", None, None),
            (102, 2, 11, "HAS_ENTITY", None, None),
        ],
        store.edges.schema,
    )
    st = Store(
        memories=store.memories,
        entities=store.entities.union(ent2),
        edges=store.edges.union(extra),
        episodes=store.episodes,
        history=store.history,
    )
    base = dict(
        query_vec=_vec(1.0), k=10, user_id="u",
        anchor_entity_names=["Apple"],
    )

    out1, _ = search_pipeline(st, SearchRequest(**base, config=_cfg()))
    src1 = {r["memory_id"]: r["source"] for r in out1.collect()}
    assert src1[1] == "both"      # direct 1-hop still found
    assert src1[2] == "vector"    # 2-hop tier absent at depth 1

    cfg2 = ScoreConfig(
        weight_similarity=1.0, weight_recency=0.0, weight_frequency=0.0,
        weight_importance=0.0, graph_search_depth=2,
    )
    out2, _ = search_pipeline(st, SearchRequest(**base, config=cfg2))
    src2 = {r["memory_id"]: r["source"] for r in out2.collect()}
    assert src2[2] == "both"      # found via Apple->Banana->m2 at depth 2


def test_graph_search_depth_validated():
    for bad in (0, 3):
        with pytest.raises(ValueError, match="graph_search_depth"):
            ScoreConfig(graph_search_depth=bad)
