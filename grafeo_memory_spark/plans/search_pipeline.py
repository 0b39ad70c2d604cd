"""The composed retrieval pipeline (SURVEY.md §3.2, reference `_search`
`manager.py:522-792` with explain-trace `manager.py:794-834`).

One lazily-built Catalyst plan: scope filters → vector branch ∥ graph
branch → merge with agreement bonus → temporal filters → boost chain →
composite scoring → min-score → sort → top-k. Stage names accumulate in
the returned trace exactly as the reference's explain() reports them, so
a user can diff stage-by-stage behavior.

Everything is Column arithmetic over two scans (memories + edges) —
the branches are plan subtrees of the same memories scan, so Spark reads
the table once per branch with all pushed predicates; no Python touches
row data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.scoring import (
    ScoreConfig,
    agreement_bonus,
    composite_score,
    cross_session_boost,
    topology_boost,
    topology_score,
)
from grafeo_memory_spark.functions.vector import cosine_similarity
from grafeo_memory_spark.operators.filters import (
    compile_filters,
    not_expired,
    scope_filter,
    time_range,
    valid_at_point,
)
from grafeo_memory_spark.operators.traversals import (
    entity_memories,
    topology_aggregate,
    two_hop_memories,
)
from grafeo_memory_spark.store import Store


@dataclass
class SearchRequest:
    """Search parameters (reference `manager.py:2141-2177` signature)."""

    query_vec: Sequence[float]
    k: int = 10
    user_id: str | None = None
    agent_id: str | None = None
    run_id: str | None = None
    graph_name: str | None = None
    filters: dict[str, Any] | None = None
    memory_type: str | None = None
    include_expired: bool = False
    time_after: int | None = None
    time_before: int | None = None
    point_in_time: int | None = None
    min_score: float = 0.0
    anchor_entity_names: Sequence[str] | None = None
    sort_chronologically: bool = False
    expand_limit: bool = False
    now_ms: int = 0
    config: ScoreConfig = field(default_factory=ScoreConfig)


def search_pipeline(store: Store, req: SearchRequest) -> tuple[DataFrame, list[str]]:
    """Build the full search plan; returns (result DataFrame, stage
    trace). Result columns: memory_id, score, source, plus the
    SearchResult projection fields (F10)."""
    stages: list[str] = []
    cfg = req.config
    widen = 2 if req.expand_limit else 1  # W6, reference manager.py:563
    fetch = req.k * 2 * widen

    mem = store.memories
    scope = scope_filter(
        user_id=req.user_id, agent_id=req.agent_id, run_id=req.run_id,
        graph_name=req.graph_name,
    )
    if req.memory_type is not None:
        scope = scope & (
            F.coalesce(F.col("memory_type"), F.lit("semantic"))
            == F.lit(req.memory_type)
        )
    if req.filters:
        scope = scope & compile_filters(req.filters)
    base = mem.where(scope & not_expired(req.include_expired))
    stages.append("scope_filter")

    qv = F.array(*[F.lit(float(x)) for x in req.query_vec])
    sim = cosine_similarity(F.col("embedding"), qv)

    # Branch A — vector search (V1/V2 stand-in: exact cosine top-fetch)
    vec = (
        base.select(F.col("id").alias("memory_id"), sim.alias("vec_score"))
        .orderBy(F.col("vec_score").desc(), F.col("memory_id").asc())
        .limit(fetch)
    )
    stages.append("hybrid_search")

    # Branch B — entity-anchored graph search (V6: J2 1-hop + J3 2-hop
    # at 0.7×, seen-set dedupe)
    if req.anchor_entity_names:
        stages.append("entity_extraction")
        lowered = [n.lower() for n in req.anchor_entity_names]
        anchors = store.entities.where(
            F.lower(F.col("name")).isin(lowered)
        ).select(F.col("id").alias("entity_id"))
        # same scope as the vector branch: the reference's graph search
        # filters user/graph too (search/graph.py:82-83,109)
        live = base
        one = (
            entity_memories(anchors, store.edges, live)
            .select("memory_id")
            .distinct()
            .withColumn("disc", F.lit(1.0))
        )
        # J3 2-hop expansion is gated on graph_search_depth (reference
        # default 1 = direct entity→memory only; `search/graph.py:168`)
        if cfg.graph_search_depth >= 2:
            hops = one.unionByName(
                two_hop_memories(anchors, store.edges, live)
                .select("memory_id")
                .join(one.select("memory_id"), "memory_id", "left_anti")
                .withColumn("disc", F.lit(0.7))
            )
        else:
            hops = one
        gr = (
            hops
            .join(
                live.select(F.col("id").alias("memory_id"), "embedding"),
                "memory_id",
            )
            .select(
                "memory_id",
                (F.col("disc") * cosine_similarity(F.col("embedding"), qv)).alias(
                    "graph_score"
                ),
            )
            .orderBy(F.col("graph_score").desc(), F.col("memory_id").asc())
            .limit(fetch)
        )
        stages.append("graph_search")
        merged = vec.join(gr, "memory_id", "full_outer").select(
            "memory_id",
            agreement_bonus(
                F.col("vec_score"), F.col("graph_score"), cfg.agreement_bonus
            ).alias("score"),
            F.when(
                F.col("vec_score").isNotNull() & F.col("graph_score").isNotNull(),
                F.lit("both"),
            )
            .when(F.col("vec_score").isNotNull(), F.lit("vector"))
            .otherwise(F.lit("graph"))
            .alias("source"),
        )
    else:
        merged = vec.select(
            "memory_id",
            F.col("vec_score").alias("score"),
            F.lit("vector").alias("source"),
        )
    stages.append("merge")

    # hydrate the SearchResult projection (F10) for downstream stages
    proj = merged.join(
        mem.select(
            F.col("id").alias("memory_id"), "text", "user_id", "memory_type",
            "created_at", "learned_at", "importance", "access_count",
            "session_id", "actor_id", "role", "metadata", "valid_at",
            "invalid_at", "expired_at", "_pagerank", "_betweenness",
        ),
        "memory_id",
    )

    if req.time_after is not None or req.time_before is not None:
        proj = proj.where(time_range(req.time_after, req.time_before))
        stages.append("temporal_filter")
    if req.point_in_time is not None:
        proj = proj.where(valid_at_point(req.point_in_time))
        stages.append("point_in_time_filter")

    if cfg.topology_boost_factor > 0:
        topo = topology_aggregate(mem, store.edges).select(
            "memory_id",
            topology_score("entity_count", "shared_ratio").alias("_topo"),
        )
        proj = (
            proj.join(topo, "memory_id", "left")
            .withColumn("_topo", F.coalesce("_topo", F.lit(0.0)))
            .withColumn(
                "score",
                topology_boost(
                    F.col("score"), F.col("_topo"), cfg.topology_boost_factor
                ),
            )
            .drop("_topo")
        )
        stages.append("topology_boost")

    if cfg.cross_session_boost_factor > 0:
        proj = proj.withColumn(
            "score",
            cross_session_boost(
                F.col("score"), F.col("_pagerank"), F.col("_betweenness"),
                cfg.cross_session_boost_factor,
            ),
        )
        stages.append("cross_session_boost")

    # importance re-scoring R5 (reference manager.py:766-771): fold the
    # retrieval score into the weighted composite
    proj = proj.withColumn(
        "score",
        composite_score(
            F.col("score"),
            "created_at",
            "access_count",
            F.coalesce(F.col("importance"), F.lit(0.5)),
            req.now_ms,
            cfg,
        ),
    )
    stages.append("importance_scoring")

    threshold = max(req.min_score, cfg.search_min_score)
    if threshold > 0:
        proj = proj.where(F.col("score") >= F.lit(threshold))
        stages.append("min_score_filter")

    if req.sort_chronologically:
        out = proj.orderBy(F.col("created_at").asc(), F.col("memory_id").asc())
        stages.append("temporal_sort")
        out = out.limit(req.k)
    else:
        out = proj.orderBy(F.col("score").desc(), F.col("memory_id").asc()).limit(
            req.k
        )
    stages.append("final")
    return out, stages
