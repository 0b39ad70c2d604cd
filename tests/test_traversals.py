"""Unit tests for the graph-traversal join operators (SURVEY §2.3) on
tiny hand-built graphs with closed-form expected results — the areas the
sf-fixture oracle queries exercise only in aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.operators.traversals import (
    expand_chain,
    memory_entities,
    relation_triples,
    shared_entity_children,
    topology_aggregate,
    two_hop_memories,
)

MEM_SCHEMA = "id long, text string, created_at long, importance double"
EDGE_SCHEMA = (
    "edge_id long, src long, dst long, edge_type string, relation_type string"
)
ENT_SCHEMA = "id long, name string, entity_type string"


@pytest.fixture()
def tiny(spark):
    """Memories 1,2,3; entities 10,11,12. m1-{10,11}, m2-{11}, m3-{12};
    RELATION 10->12 ("works_at"); LEADS_TO 1->2->3."""
    memories = spark.createDataFrame(
        [
            (1, "m1", 100, 0.5),
            (2, "m2", 200, 0.8),
            (3, "m3", 300, 1.0),
        ],
        MEM_SCHEMA,
    )
    entities = spark.createDataFrame(
        [(10, "alice", "person"), (11, "acme", "org"), (12, "paris", "place")],
        ENT_SCHEMA,
    )
    edges = spark.createDataFrame(
        [
            (100, 1, 10, "HAS_ENTITY", None),
            (101, 1, 11, "HAS_ENTITY", None),
            (102, 2, 11, "HAS_ENTITY", None),
            (103, 3, 12, "HAS_ENTITY", None),
            (104, 10, 12, "RELATION", "works_at"),
            (105, 1, 2, "LEADS_TO", None),
            (106, 2, 3, "LEADS_TO", None),
        ],
        EDGE_SCHEMA,
    )
    return memories, entities, edges


def test_memory_entities_pairs(tiny):
    memories, entities, edges = tiny
    got = sorted(
        (r["memory_id"], r["entity_name"])
        for r in memory_entities(memories, edges, entities).collect()
    )
    assert got == [(1, "acme"), (1, "alice"), (2, "acme"), (3, "paris")]


def test_two_hop_follows_both_relation_directions(tiny, spark):
    memories, entities, edges = tiny
    # anchor at alice(10): RELATION 10->12 forward → paris → m3
    anchors = spark.createDataFrame([(10,)], "entity_id long")
    got = sorted(
        r["memory_id"]
        for r in two_hop_memories(anchors, edges, memories).collect()
    )
    assert got == [3]
    # anchor at paris(12): same edge followed backward → alice → m1
    anchors_b = spark.createDataFrame([(12,)], "entity_id long")
    got_b = sorted(
        r["memory_id"]
        for r in two_hop_memories(anchors_b, edges, memories).collect()
    )
    assert got_b == [1]


def test_relation_triples_per_memory(tiny):
    memories, entities, edges = tiny
    got = sorted(tuple(r) for r in relation_triples(edges, entities).collect())
    # both m1 (via alice) and any memory holding alice expand her edge
    assert got == [(1, "alice", "works_at", "paris")]


def test_expand_chain_forward_and_both(tiny, spark):
    _, _, edges = tiny
    seed = spark.createDataFrame([(1,)], "node_id long")
    fwd = {
        r["node_id"]: r["depth"]
        for r in expand_chain(edges, seed, "LEADS_TO", max_depth=5).collect()
    }
    assert fwd == {2: 1, 3: 2}
    bwd = {
        r["node_id"]: r["depth"]
        for r in expand_chain(
            edges, spark.createDataFrame([(3,)], "node_id long"),
            "LEADS_TO", max_depth=5, direction="backward",
        ).collect()
    }
    assert bwd == {2: 1, 1: 2}


def test_expand_chain_cycle_bounded(spark):
    """A LEADS_TO cycle must terminate at max_depth with first-visit
    depths, not loop or re-emit."""
    edges = spark.createDataFrame(
        [
            (1, 1, 2, "LEADS_TO", None),
            (2, 2, 3, "LEADS_TO", None),
            (3, 3, 1, "LEADS_TO", None),
        ],
        EDGE_SCHEMA,
    )
    seed = spark.createDataFrame([(1,)], "node_id long")
    got = {
        r["node_id"]: r["depth"]
        for r in expand_chain(edges, seed, "LEADS_TO", max_depth=10).collect()
    }
    assert got == {2: 1, 3: 2, 1: 3}  # seed rediscovered once, min depth


def test_shared_entity_children_reinforcement(tiny):
    memories, entities, edges = tiny
    # base = m1 (created 100). Children sharing an entity and later:
    # m2 shares acme(11), created 200 > 100, importance 0.8.
    got = shared_entity_children(
        memories.where(F.col("id") == 1), memories, edges, gamma=0.2
    ).collect()
    assert len(got) == 1
    assert got[0]["memory_id"] == 1
    assert got[0]["reinforcement"] == pytest.approx(0.2 * 0.8)


def test_shared_entity_children_no_earlier_children(tiny):
    memories, entities, edges = tiny
    # base = m2: m1 shares acme but was created EARLIER -> no rows
    got = shared_entity_children(
        memories.where(F.col("id") == 2), memories, edges
    ).collect()
    assert got == []


def test_topology_aggregate_counts_and_ratio(tiny):
    memories, entities, edges = tiny
    got = {
        r["memory_id"]: (r["entity_count"], r["shared_ratio"])
        for r in topology_aggregate(memories, edges).collect()
    }
    # acme(11) is linked to m1+m2 => shared; alice(10), paris(12) unique
    assert got[1] == (2, pytest.approx(0.5))
    assert got[2] == (1, pytest.approx(1.0))
    assert got[3] == (1, pytest.approx(0.0))
