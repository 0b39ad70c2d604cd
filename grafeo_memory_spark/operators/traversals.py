"""Graph-traversal operators — every reference Cypher pattern as
DataFrame equi-joins (SURVEY.md §2.3).

The reference walks a property graph through its engine
(`search/graph.py`, `manager.py` traversal sites); here each hop is one
hash join against the typed ``edges`` table ``(edge_id, src, dst,
edge_type, relation_type, sequence)``. Anchor sets (query entities,
chain seeds) are tiny → always broadcast; the edges side arrives
pre-filtered on ``edge_type``, which pushes to the Parquet scan.

Scale notes: joins shuffle on node-id keys. At 100 TB you'd bucket
`edges` by src (and a dst-sorted copy by dst) so traversal joins
co-locate without shuffling the big side; the operators here take the
DataFrames as given, so a bucketed reader slots in unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "edges_of_type",
    "memory_entities",
    "entity_memories",
    "two_hop_memories",
    "relation_triples",
    "expand_chain",
    "shared_entity_children",
    "topology_aggregate",
]


def edges_of_type(edges: DataFrame, edge_type: str) -> DataFrame:
    """Typed-edge scan; the equality predicate pushes into Parquet."""
    return edges.where(F.col("edge_type") == edge_type)


def memory_entities(
    memories: DataFrame, edges: DataFrame, entities: DataFrame
) -> DataFrame:
    """J1 — ``(m:Memory)-[:HAS_ENTITY]->(e:Entity)`` (reference
    `manager.py:1167-1178`): one row per (memory, entity) pair.

    Output: memory columns + ``entity_id``, ``entity_name``,
    ``entity_type``.
    """
    he = edges_of_type(edges, "HAS_ENTITY").select(
        F.col("src").alias("memory_id"), F.col("dst").alias("entity_id")
    )
    ent = entities.select(
        F.col("id").alias("entity_id"),
        F.col("name").alias("entity_name"),
        F.col("entity_type"),
    )
    return (
        memories.withColumnRenamed("id", "memory_id")
        .join(he, "memory_id")
        .join(ent, "entity_id")
    )


def entity_memories(
    anchor_entities: DataFrame, edges: DataFrame, memories: DataFrame
) -> DataFrame:
    """J2 — reverse 1-hop: memories mentioning an anchor entity
    (graph-search core, reference `search/graph.py:110-165`).

    ``anchor_entities`` must carry ``entity_id``; it is small (query
    entities) and broadcast. Output: ``entity_id`` + memory columns with
    the memory id as ``memory_id``.
    """
    he = edges_of_type(edges, "HAS_ENTITY").select(
        F.col("src").alias("memory_id"), F.col("dst").alias("entity_id")
    )
    return (
        he.join(F.broadcast(anchor_entities.select("entity_id")), "entity_id")
        .join(memories.withColumnRenamed("id", "memory_id"), "memory_id")
    )


def two_hop_memories(
    anchor_entities: DataFrame, edges: DataFrame, memories: DataFrame
) -> DataFrame:
    """J3 — ``Entity-[:RELATION]->Entity<-[:HAS_ENTITY]-Memory`` with
    DISTINCT memories (reference `search/graph.py:167-219`; the caller
    applies the 0.7× score discount and the seen-set dedupe against
    1-hop results, as the reference does at 186-188).

    Both RELATION directions are followed, matching the undirected
    expansion of the reference's Cypher pattern.
    """
    rel = edges_of_type(edges, "RELATION")
    fwd = rel.select(F.col("src").alias("entity_id"), F.col("dst").alias("nbr"))
    bwd = rel.select(F.col("dst").alias("entity_id"), F.col("src").alias("nbr"))
    neighbors = (
        fwd.unionByName(bwd)
        .join(F.broadcast(anchor_entities.select("entity_id")), "entity_id")
        .select(F.col("nbr").alias("entity_id"))
        .distinct()
    )
    he = edges_of_type(edges, "HAS_ENTITY").select(
        F.col("src").alias("memory_id"), F.col("dst").alias("entity_id")
    )
    return (
        he.join(F.broadcast(neighbors), "entity_id")
        .select("memory_id")
        .distinct()
        .join(memories.withColumnRenamed("id", "memory_id"), "memory_id")
    )


def relation_triples(
    edges: DataFrame, entities: DataFrame, memories: DataFrame | None = None
) -> DataFrame:
    """J4 — relation triples ``(source_name, relation_type, target_name)``
    per memory (reference `_get_node_relations`,
    `search/vector.py:384-409`): for each memory's entities, their
    outgoing RELATION edges.

    Output: (memory_id, source_name, relation_type, target_name).
    """
    ent_name = entities.select(F.col("id"), F.col("name"))
    rel = (
        edges_of_type(edges, "RELATION")
        .select("src", "dst", "relation_type")
        .join(
            ent_name.select(
                F.col("id").alias("src"), F.col("name").alias("source_name")
            ),
            "src",
        )
        .join(
            ent_name.select(
                F.col("id").alias("dst"), F.col("name").alias("target_name")
            ),
            "dst",
        )
    )
    he = edges_of_type(edges, "HAS_ENTITY").select(
        F.col("src").alias("memory_id"), F.col("dst").alias("src")
    )
    return he.join(rel, "src").select(
        "memory_id", "source_name", "relation_type", "target_name"
    )


def expand_chain(
    edges: DataFrame,
    seed: DataFrame,
    edge_type: str,
    max_depth: int,
    direction: str = "forward",
) -> DataFrame:
    """J10/J11 — variable-length path expansion
    (``-[:LEADS_TO*1..max_depth]->``, reference `temporal_chain`
    `manager.py:1475-1569`; `_traverse_episodes` `manager.py:1407-1473`).

    Iterative frontier expansion: each hop is one equi-join; visited
    nodes keep their *first* (minimum) depth, reference seen-set
    semantics. ``seed`` carries ``node_id``. Depth ≤ 5 (default config)
    keeps the loop short; the frontier is tiny and broadcast each hop.

    Returns (node_id, depth) for reached nodes, depth ∈ [1, max_depth].

    Each hop checkpoints the (tiny) frontier lazily and breaks as soon
    as it empties — the ``isEmpty()`` probe materializes the checkpoint
    blocks in the SAME job (the `betweenness_centrality` /
    `louvain` merges.isEmpty pattern; the former eager checkpoint spent
    a separate driver job per hop just to materialize before probing —
    2 jobs/hop → 1, r12). The checkpoint also keeps lineage flat, so
    deep chains don't build a max_depth-deep join tree for the final
    aggregate to re-derive.
    """
    e = edges_of_type(edges, edge_type)
    step = (
        e.select(F.col("src").alias("node_id"), F.col("dst").alias("next_id"))
        if direction == "forward"
        else e.select(F.col("dst").alias("node_id"), F.col("src").alias("next_id"))
    )
    # materialize the type-filtered step relation once (lazy: the first
    # hop pays it) instead of re-scanning the full edge table on every
    # hop — a depth-10 walk otherwise runs 10 source scans (r9)
    step = step.localCheckpoint(eager=False)
    frontier = seed.select("node_id")
    reached: DataFrame | None = None
    for depth in range(1, max_depth + 1):
        nxt = (
            step.join(F.broadcast(frontier), "node_id")
            .select(F.col("next_id").alias("node_id"))
            .distinct()
        ).localCheckpoint(eager=False)
        if nxt.isEmpty():
            break
        hop = nxt.withColumn("depth", F.lit(depth))
        reached = hop if reached is None else reached.unionByName(hop)
        frontier = nxt
    if reached is None:
        return (
            seed.select("node_id")
            .withColumn("depth", F.lit(1))
            .limit(0)
        )
    # first-visit depth wins (seen-set: a node found at depth 2 is not
    # re-emitted at depth 4 when chains reconverge)
    return reached.groupBy("node_id").agg(F.min("depth").alias("depth"))


def shared_entity_children(
    base: DataFrame, memories: DataFrame, edges: DataFrame, gamma: float = 0.2
) -> DataFrame:
    """J14 + A3 — reinforcement: for each *base* memory (a search
    candidate list — the reference only ever scores candidates, never
    the full table), the later-created memories sharing ≥1 entity,
    aggregated to ``clamp(gamma * avg(child importance), 0, 1)``
    (reference `_compute_reinforcement` `scoring.py:245-299`, mean at
    277-299).

    Self-join through HAS_ENTITY (m→e←child) — an equi-join on the
    entity key with the timestamp inequality applied as a post-join
    filter (the only theta condition in the reference). ``base`` being a
    bounded candidate list keeps the entity-key fan-out skew-bounded at
    scale. Children with NULL importance are excluded (they carry no
    signal for the mean; keeps NULL semantics engine-agnostic).

    Output: (memory_id, reinforcement).
    """
    he = edges_of_type(edges, "HAS_ENTITY").select(
        F.col("src").alias("memory_id"), F.col("dst").alias("entity_id")
    )
    base_e = base.select(
        F.col("id").alias("memory_id"), F.col("created_at")
    ).join(he, "memory_id")
    child = (
        memories.where(F.col("importance").isNotNull())
        .select(
            F.col("id").alias("child_id"),
            F.col("created_at").alias("child_created"),
            F.col("importance").alias("child_importance"),
        )
        .join(
            he.select(F.col("memory_id").alias("child_id"), F.col("entity_id")),
            "child_id",
        )
    )
    pairs = (
        base_e.join(child, "entity_id")
        .where(F.col("child_created") > F.col("created_at"))
        .select("memory_id", "child_id", "child_importance")
        .distinct()  # a child sharing 2 entities counts once
    )
    return pairs.groupBy("memory_id").agg(
        F.greatest(
            F.lit(0.0),
            F.least(F.lit(1.0), F.lit(gamma) * F.avg("child_importance")),
        ).alias("reinforcement")
    )


def topology_aggregate(memories: DataFrame, edges: DataFrame) -> DataFrame:
    """A4 — per-memory entity degree + shared-entity ratio (reference
    `_batch_topology_scores`, `scoring.py:302-370`).

    ``shared`` = the entity is linked to ≥2 memories — computed once as
    an entity-degree aggregate (the Spark replacement for the
    reference's per-entity LIMIT-1 probe, an N+1 it had to hand-fix),
    then joined back. Two narrow shuffles total, both on small keys.

    Output: (memory_id, entity_count, shared_ratio).
    """
    he = edges_of_type(edges, "HAS_ENTITY").select(
        F.col("src").alias("memory_id"), F.col("dst").alias("entity_id")
    )
    ent_degree = he.groupBy("entity_id").agg(
        F.countDistinct("memory_id").alias("ent_deg")
    )
    return (
        he.join(ent_degree, "entity_id")
        .groupBy("memory_id")
        .agg(
            F.count("*").alias("entity_count"),
            (
                F.sum(F.when(F.col("ent_deg") >= 2, 1).otherwise(0))
                / F.count("*")
            ).alias("shared_ratio"),
        )
    )
