"""Scoring-chain driver queries (SURVEY.md §2.9, reference `scoring.py`)
over the native memories fixture table, with a pinned clock — the
reference calls ``time.time()`` inline (`scoring.py:385`), which makes
results irreproducible; here ``NOW_MS`` is fixed so Spark and the DuckDB
oracle compute identical decays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.scoring import (
    ScoreConfig,
    composite_score,
    cross_session_boost,
    frequency_score,
    modulated_recency_score,
    recency_score,
    topology_boost,
    topology_score,
)
from grafeo_memory_spark.functions.vector import cosine_similarity
from grafeo_memory_spark.operators.traversals import (
    shared_entity_children,
    topology_aggregate,
)
from grafeo_memory_spark.queries import query
from grafeo_memory_spark.queries.graph_q import _MEM, _EDG
from grafeo_memory_spark.sources.tables import load_fixture

#: pinned clock: 2025-01-01T00:00:00Z + 400 days
NOW_MS = 1_735_689_600_000 + 400 * 86_400_000

_DUCK_COS_M = (
    "list_dot_product(m.embedding::DOUBLE[], q.qv)"
    " / (sqrt(list_dot_product(m.embedding::DOUBLE[], m.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qv, q.qv)))"
)

# SQL fragments mirroring scoring.py formulas (reference scoring.py:378-411)
_SQL_RECENCY = (
    f"exp(-0.1 * greatest(0.0, ({NOW_MS} - m.created_at) / 86400000.0))"
)
_SQL_FREQ = (
    "CASE WHEN m.access_count IS NULL OR m.access_count <= 0 THEN 0.0 "
    "ELSE least(1.0, ln(1.0 + m.access_count) / ln(101.0)) END"
)


@query(
    "score_chain",
    oracle=f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv FROM {_MEM} WHERE id = 1
    ), cscored AS (
      SELECT m.id AS memory_id,
             {_DUCK_COS_M} AS sim,
             {_SQL_RECENCY} AS recency,
             {_SQL_FREQ} AS freq,
             m.importance
      FROM {_MEM} m, q
      WHERE m.importance IS NOT NULL AND m.expired_at IS NULL
    ), cpart AS (
      SELECT memory_id, round(sim, 6) AS sim, round(recency, 6) AS recency,
             round(freq, 6) AS frequency,
             round(0.4 * sim + 0.3 * recency + 0.15 * freq
                   + 0.15 * importance, 6) AS composite
      FROM cscored
      ORDER BY composite DESC, memory_id ASC
      LIMIT 100
    ), he AS (
      SELECT src AS memory_id, dst AS entity_id FROM {_EDG}
      WHERE edge_type = 'HAS_ENTITY'
    ), deg AS (
      SELECT entity_id, count(DISTINCT memory_id) AS ent_deg FROM he
      GROUP BY entity_id
    ), topo AS (
      SELECT he.memory_id,
             count(*) AS ec,
             sum(CASE WHEN d.ent_deg >= 2 THEN 1 ELSE 0 END)::DOUBLE
               / count(*) AS sr
      FROM he JOIN deg d ON d.entity_id = he.entity_id
      GROUP BY he.memory_id
    ), bscored AS (
      SELECT m.id AS memory_id,
             {_DUCK_COS_M} AS sim,
             -- coalesce inputs, not the sum: DuckDB least/greatest skip
             -- NULL args, so least(1.0, NULL) = 1.0, not NULL
             0.6 * least(1.0, ln(1.0 + coalesce(t.ec, 0)) / ln(11.0))
               + 0.4 * greatest(0.0, least(1.0, coalesce(t.sr, 0.0)))
               AS topology,
             least(1.0, coalesce(m._pagerank, 0.0) * 10.0) AS pr,
             least(1.0, coalesce(m._betweenness, 0.0) * 10.0) AS bt
      FROM {_MEM} m LEFT JOIN topo t ON t.memory_id = m.id, q
      WHERE m.expired_at IS NULL
    ), bpart AS (
      SELECT memory_id, round(topology, 6) AS topology,
             round(sim * (1.0 + 0.3 * topology)
                   * (1.0 + 0.2 * (0.7 * pr + 0.3 * bt)), 6) AS boosted
      FROM bscored
      ORDER BY boosted DESC, memory_id ASC
      LIMIT 100
    )
    SELECT 'composite' AS kind, memory_id, sim, recency, frequency,
           composite, CAST(NULL AS DOUBLE) AS topology,
           CAST(NULL AS DOUBLE) AS boosted
    FROM cpart
    UNION ALL
    SELECT 'boost' AS kind, memory_id, CAST(NULL AS DOUBLE) AS sim,
           CAST(NULL AS DOUBLE) AS recency, CAST(NULL AS DOUBLE) AS frequency,
           CAST(NULL AS DOUBLE) AS composite, topology, boosted
    FROM bpart
    ORDER BY kind, memory_id
    """,
)
def q_score_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1+R3+R5 and R6→R7 in one tagged union (merged per the r4
    slot-folding pattern; the freed slot went to `semdedup`).

    'composite' rows — the weighted composite score with reference
    default weights 0.4/0.3/0.15/0.15 (`compute_composite_score`,
    `scoring.py:15-42`; recency `scoring.py:378-388`; frequency
    `scoring.py:406-411`), pinned ``now``, top-100 by composite. Pure
    Column arithmetic over the scan — one codegen stage, then
    TakeOrderedAndProject.

    'boost' rows — the boost chain applied in pipeline order
    (reference `manager.py:742-756`): topology boost
    ``score·(1 + 0.3·topology)`` (`scoring.py:185-222`) then
    cross-session boost ``score·(1 + 0.2·(0.7·min(1,pr·10) +
    0.3·min(1,bt·10)))`` (`scoring.py:128-182`) over the cached
    metric columns; memories without entities get topology 0 (R4's
    no-entity rule). Top-100 by boosted score."""
    mem = load_fixture(spark, sf_dir, "memories")
    edges = load_fixture(spark, sf_dir, "edges")
    qv = mem.where(F.col("id") == 1).select(F.col("embedding").alias("qv"))

    cfg = ScoreConfig()
    cmem = mem.where(
        F.col("importance").isNotNull() & F.col("expired_at").isNull()
    )
    sim = cosine_similarity("embedding", "qv")
    cpart = (
        cmem.crossJoin(F.broadcast(qv))
        .select(
            F.col("id").alias("memory_id"),
            F.round(sim, 6).alias("sim"),
            F.round(
                recency_score("created_at", NOW_MS, cfg.decay_rate), 6
            ).alias("recency"),
            F.round(frequency_score("access_count"), 6).alias("frequency"),
            F.round(
                composite_score(
                    sim, "created_at", "access_count", F.col("importance"),
                    NOW_MS, cfg,
                ),
                6,
            ).alias("composite"),
        )
        .orderBy(F.col("composite").desc(), F.col("memory_id").asc())
        .limit(100)
        .select(
            F.lit("composite").alias("kind"),
            "memory_id", "sim", "recency", "frequency", "composite",
            F.lit(None).cast("double").alias("topology"),
            F.lit(None).cast("double").alias("boosted"),
        )
    )

    topo = topology_aggregate(mem, edges).select(
        "memory_id",
        topology_score("entity_count", "shared_ratio").alias("topology"),
    )
    live = mem.where(F.col("expired_at").isNull())
    bscored = (
        live.select(
            F.col("id").alias("memory_id"), "embedding", "_pagerank", "_betweenness"
        )
        .join(topo, "memory_id", "left")
        .withColumn("topology", F.coalesce("topology", F.lit(0.0)))
        .crossJoin(F.broadcast(qv))
        .withColumn("sim", cosine_similarity("embedding", "qv"))
    )
    boosted = cross_session_boost(
        topology_boost(F.col("sim"), F.col("topology"), 0.3),
        F.col("_pagerank"),
        F.col("_betweenness"),
        0.2,
    )
    bpart = (
        bscored.select(
            "memory_id",
            F.round("topology", 6).alias("topology"),
            F.round(boosted, 6).alias("boosted"),
        )
        .orderBy(F.col("boosted").desc(), F.col("memory_id").asc())
        .limit(100)
        .select(
            F.lit("boost").alias("kind"),
            "memory_id",
            F.lit(None).cast("double").alias("sim"),
            F.lit(None).cast("double").alias("recency"),
            F.lit(None).cast("double").alias("frequency"),
            F.lit(None).cast("double").alias("composite"),
            "topology", "boosted",
        )
    )
    return cpart.unionByName(bpart).orderBy("kind", "memory_id")


@query(
    "modulated_recency",
    oracle=f"""
    WITH he AS (
      SELECT src AS memory_id, dst AS entity_id FROM {_EDG}
      WHERE edge_type = 'HAS_ENTITY'
    ), base AS (
      SELECT m.id AS memory_id, m.created_at FROM {_MEM} m
      WHERE m.user_id = 'carol' AND m.expired_at IS NULL
      ORDER BY m.importance DESC NULLS LAST, m.id ASC LIMIT 20
    ), pairs AS (
      SELECT DISTINCT b.memory_id, c.id AS child_id, c.importance
      FROM base b
      JOIN he hb ON hb.memory_id = b.memory_id
      JOIN he hc ON hc.entity_id = hb.entity_id
      JOIN {_MEM} c ON c.id = hc.memory_id AND c.created_at > b.created_at
        AND c.importance IS NOT NULL
    ), reinf AS (
      SELECT memory_id,
             greatest(0.0, least(1.0, 0.2 * avg(importance))) AS r
      FROM pairs GROUP BY memory_id
    )
    SELECT b.memory_id,
           round(exp(-0.1 * greatest(0.0, ({NOW_MS} - b.created_at)
                                           / 86400000.0)), 6) AS recency,
           round(exp(-(0.1 * (1.0 - 0.5 * coalesce(r.r, 0.0)))
                     * greatest(0.0, ({NOW_MS} - b.created_at)
                                      / 86400000.0)), 6) AS mod_recency
    FROM base b LEFT JOIN reinf r ON r.memory_id = b.memory_id
    ORDER BY b.memory_id
    """,
)
def q_modulated_recency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 — structural-decay modulated recency (reference
    `scoring.py:391-403`): the decay rate shrinks by
    ``(1 - 0.5·clamp(reinforcement))`` so well-reinforced memories age
    slower. Reinforcement per J14/A3 over the carol candidate list;
    memories with no reinforcement row decay at the plain R1 rate."""
    mem = load_fixture(spark, sf_dir, "memories")
    edges = load_fixture(spark, sf_dir, "edges")
    base = (
        mem.where((F.col("user_id") == "carol") & F.col("expired_at").isNull())
        .orderBy(F.col("importance").desc_nulls_last(), F.col("id").asc())
        .limit(20)
    )
    reinf = shared_entity_children(base, mem, edges)
    joined = (
        base.select(F.col("id").alias("memory_id"), "created_at")
        .join(reinf, "memory_id", "left")
        .withColumn("r", F.coalesce("reinforcement", F.lit(0.0)))
    )
    return joined.select(
        "memory_id",
        F.round(recency_score("created_at", NOW_MS, 0.1), 6).alias("recency"),
        F.round(
            modulated_recency_score("created_at", F.col("r"), NOW_MS, 0.1), 6
        ).alias("mod_recency"),
    ).orderBy("memory_id")
