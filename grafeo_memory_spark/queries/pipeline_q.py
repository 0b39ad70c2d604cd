"""The composed search pipeline as a driver query (SURVEY.md §3.2) —
the flagship: scope → vector ∥ graph branches → merge + agreement →
topology boost → cross-session boost → composite scoring → top-k,
hash-matched against a DuckDB oracle that mirrors every stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.scoring import ScoreConfig
from grafeo_memory_spark.plans.search_pipeline import SearchRequest, search_pipeline
from grafeo_memory_spark.queries import query
from grafeo_memory_spark.queries.graph_q import _ANCHOR_SQL, _EDG, _ENT, _MEM, ANCHORS
from grafeo_memory_spark.queries.scoring_q import NOW_MS
from grafeo_memory_spark.sources.tables import load_fixture
from grafeo_memory_spark.store import Store

_COS = (
    "list_dot_product(b.embedding::DOUBLE[], q.qv)"
    " / (sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qv, q.qv)))"
)


@query(
    "search_pipeline",
    oracle=f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv FROM {_MEM} WHERE id = 1
    ), base AS (
      SELECT * FROM {_MEM} m
      WHERE m.user_id = 'alice' AND m.expired_at IS NULL
    ), vec AS (
      SELECT b.id AS memory_id, {_COS} AS vec_score
      FROM base b, q
      ORDER BY vec_score DESC, memory_id ASC LIMIT 40
    ), anchors AS (
      SELECT id FROM {_ENT} WHERE lower(name) IN {_ANCHOR_SQL}
    ), one_hop AS (
      SELECT DISTINCT g.src AS memory_id FROM {_EDG} g
      JOIN anchors a ON g.dst = a.id
      JOIN base b ON b.id = g.src
      WHERE g.edge_type = 'HAS_ENTITY'
    ), nbrs AS (
      SELECT DISTINCT nbr FROM (
        SELECT g.dst AS nbr FROM {_EDG} g JOIN anchors a ON g.src = a.id
        WHERE g.edge_type = 'RELATION'
        UNION ALL
        SELECT g.src AS nbr FROM {_EDG} g JOIN anchors a ON g.dst = a.id
        WHERE g.edge_type = 'RELATION'
      )
    ), two_hop AS (
      SELECT DISTINCT g.src AS memory_id
      FROM {_EDG} g JOIN nbrs n ON g.dst = n.nbr
      JOIN base b ON b.id = g.src
      WHERE g.edge_type = 'HAS_ENTITY'
        AND g.src NOT IN (SELECT memory_id FROM one_hop)
    ), gcand AS (
      SELECT memory_id, 1.0 AS disc FROM one_hop
      UNION ALL
      SELECT memory_id, 0.7 AS disc FROM two_hop
    ), gr AS (
      SELECT c.memory_id, c.disc * {_COS} AS graph_score
      FROM gcand c JOIN base b ON b.id = c.memory_id, q
      ORDER BY graph_score DESC, c.memory_id ASC LIMIT 40
    ), merged AS (
      SELECT coalesce(v.memory_id, g.memory_id) AS memory_id,
             CASE WHEN v.vec_score IS NOT NULL AND g.graph_score IS NOT NULL
                  THEN greatest(v.vec_score, g.graph_score) * 1.1
                  ELSE coalesce(v.vec_score, g.graph_score) END AS score,
             CASE WHEN v.vec_score IS NOT NULL AND g.graph_score IS NOT NULL
                  THEN 'both'
                  WHEN v.vec_score IS NOT NULL THEN 'vector'
                  ELSE 'graph' END AS source
      FROM vec v FULL OUTER JOIN gr g ON v.memory_id = g.memory_id
    ), he AS (
      SELECT src AS memory_id, dst AS entity_id FROM {_EDG}
      WHERE edge_type = 'HAS_ENTITY'
    ), deg AS (
      SELECT entity_id, count(DISTINCT memory_id) AS ent_deg FROM he
      GROUP BY entity_id
    ), topo AS (
      SELECT he.memory_id,
             0.6 * least(1.0, ln(1.0 + count(*)) / ln(11.0))
             + 0.4 * greatest(0.0, least(1.0,
                 sum(CASE WHEN d.ent_deg >= 2 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*))) AS topology
      FROM he JOIN deg d ON d.entity_id = he.entity_id
      GROUP BY he.memory_id
    ), boosted AS (
      SELECT m.memory_id, m.source,
             m.score
               * (1.0 + 0.3 * coalesce(t.topology, 0.0))
               * (1.0 + 0.2 * (0.7 * least(1.0, coalesce(mm._pagerank, 0.0) * 10.0)
                               + 0.3 * least(1.0, coalesce(mm._betweenness, 0.0) * 10.0)))
               AS score,
             mm.created_at, mm.access_count, mm.importance
      FROM merged m
      JOIN {_MEM} mm ON mm.id = m.memory_id
      LEFT JOIN topo t ON t.memory_id = m.memory_id
    )
    SELECT memory_id, source,
           round(0.4 * score
                 + 0.3 * exp(-0.1 * greatest(0.0, ({NOW_MS} - created_at)
                                                   / 86400000.0))
                 + 0.15 * (CASE WHEN access_count IS NULL OR access_count <= 0
                                THEN 0.0
                                ELSE least(1.0, ln(1.0 + access_count)
                                                / ln(101.0)) END)
                 + 0.15 * coalesce(importance, 0.5), 6) AS score
    FROM boosted
    ORDER BY score DESC, memory_id ASC
    LIMIT 20
    """,
)
def q_search_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 — the full composed retrieval pipeline as ONE Catalyst plan
    (reference `_search` `manager.py:522-792`): user-scoped vector top-40
    ∥ entity-anchored graph top-40 (0.7× 2-hop discount) → full-outer
    merge with the 1.1× agreement bonus (J5/R8) → topology boost (R6,
    factor 0.3) → cross-session boost (R7, factor 0.2, cached metric
    columns) → composite re-score (R5, pinned clock, default weights,
    missing importance ≡ 0.5) → top-20."""
    store = Store(
        memories=load_fixture(spark, sf_dir, "memories"),
        entities=load_fixture(spark, sf_dir, "entities"),
        edges=load_fixture(spark, sf_dir, "edges"),
        episodes=load_fixture(spark, sf_dir, "episodes"),
        history=load_fixture(spark, sf_dir, "history"),
    )
    qv = [
        float(x)
        for x in store.memories.where(F.col("id") == 1)
        .select("embedding")
        .collect()[0][0]
    ]
    req = SearchRequest(
        query_vec=qv,
        k=20,
        user_id="alice",
        anchor_entity_names=list(ANCHORS),
        now_ms=NOW_MS,
        config=ScoreConfig(
            topology_boost_factor=0.3,
            cross_session_boost_factor=0.2,
            graph_search_depth=2,  # oracle SQL includes the 0.7x 2-hop tier
        ),
    )
    df, _stages = search_pipeline(store, req)
    return df.select(
        "memory_id", "source", F.round("score", 6).alias("score")
    )
