"""Graph-layer driver queries (SURVEY.md §2.3, §2.8 V6) over the native
memory-graph fixture tables (FIXTURES.md §B, scripts/gen_fixtures.py).

The DuckDB oracles read the same parquet fixtures by absolute path; the
correctness gate runs at sf0.01 (TESTDATA.md), which is the path baked
into the oracle SQL, while the Spark side scales with ``sf_dir``.

Anchor entities are fixed names from the deterministic generator; one is
stored with mixed case ("Canyon_turbine_19") and queried in upper case to
exercise the reference's case-insensitive fallback match (X5,
`search/graph.py:103`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.scoring import topology_score
from grafeo_memory_spark.functions.vector import cosine_similarity
from grafeo_memory_spark.operators.traversals import (
    edges_of_type,
    entity_memories,
    expand_chain,
    memory_entities,
    relation_triples,
    shared_entity_children,
    topology_aggregate,
    two_hop_memories,
)
from grafeo_memory_spark.queries import query
from grafeo_memory_spark.sources.tables import ORACLE_FIXTURES as FIX, load_fixture, spread


_MEM = f"read_parquet('{FIX}/memories.parquet')"
_ENT = f"read_parquet('{FIX}/entities.parquet')"
_EDG = f"read_parquet('{FIX}/edges.parquet')"
_EPI = f"read_parquet('{FIX}/episodes.parquet')"
_COM = f"read_parquet('{FIX}/communities.parquet')"

ANCHORS = ["coffee_rocket_0", "piano_compass_1", "CANYON_TURBINE_19"]
_ANCHOR_SQL = "('coffee_rocket_0', 'piano_compass_1', 'canyon_turbine_19')"

_DUCK_COS_M = (
    "list_dot_product(m.embedding::DOUBLE[], q.qv)"
    " / (sqrt(list_dot_product(m.embedding::DOUBLE[], m.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qv, q.qv)))"
)


def _anchor_entities(entities: DataFrame) -> DataFrame:
    """Case-insensitive anchor lookup (X5): lower(name) equality."""
    lowered = [a.lower() for a in ANCHORS]
    return entities.where(F.lower(F.col("name")).isin(lowered)).select(
        F.col("id").alias("entity_id")
    )


@query(
    "graph_1hop",
    oracle=f"""
    SELECT 'fwd' AS hop, m.id AS memory_id, e.name AS entity_key
    FROM {_MEM} m
    JOIN {_EDG} g ON g.src = m.id AND g.edge_type = 'HAS_ENTITY'
    JOIN {_ENT} e ON e.id = g.dst
    WHERE m.user_id = 'alice' AND m.expired_at IS NULL
    UNION ALL
    SELECT 'rev' AS hop, m.id AS memory_id,
           CAST(g.dst AS VARCHAR) AS entity_key
    FROM {_EDG} g
    JOIN {_ENT} e ON e.id = g.dst AND g.edge_type = 'HAS_ENTITY'
    JOIN {_MEM} m ON m.id = g.src
    WHERE lower(e.name) IN {_ANCHOR_SQL}
      AND m.expired_at IS NULL
    ORDER BY hop, memory_id, entity_key
    """,
)
def q_graph_1hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + J2 in one tagged union (merged per VERDICT r4 item 1's
    slot-folding pattern — each operator keeps a green row through the
    shared query; the freed slot went to `lm_perplexity`).

    'fwd' rows: Memory⋈Entity 1-hop (`manager.py:1167-1178`) — entities
    of every non-expired memory of one user; the user and expiry
    predicates push into the memories Parquet scan. 'rev' rows:
    Entity⋈Memory reverse 1-hop (`search/graph.py:110-165`) — the
    anchor set is broadcast; lower(name) matching is the reference's
    case-insensitive fallback (X5)."""
    mem = load_fixture(spark, sf_dir, "memories")
    edges = load_fixture(spark, sf_dir, "edges")
    ent = load_fixture(spark, sf_dir, "entities")
    alice = mem.where(
        (F.col("user_id") == "alice") & F.col("expired_at").isNull()
    )
    fwd = memory_entities(alice, edges, ent).select(
        F.lit("fwd").alias("hop"),
        "memory_id",
        F.col("entity_name").alias("entity_key"),
    )
    live = mem.where(F.col("expired_at").isNull())
    rev = entity_memories(_anchor_entities(ent), edges, live).select(
        F.lit("rev").alias("hop"),
        "memory_id",
        F.col("entity_id").cast("string").alias("entity_key"),
    )
    return fwd.unionByName(rev).orderBy("hop", "memory_id", "entity_key")


@query(
    "graph_2hop",
    oracle=f"""
    WITH anchors AS (
      SELECT id FROM {_ENT} WHERE lower(name) IN {_ANCHOR_SQL}
    ), nbrs AS (
      SELECT DISTINCT nbr FROM (
        SELECT g.dst AS nbr FROM {_EDG} g JOIN anchors a ON g.src = a.id
        WHERE g.edge_type = 'RELATION'
        UNION ALL
        SELECT g.src AS nbr FROM {_EDG} g JOIN anchors a ON g.dst = a.id
        WHERE g.edge_type = 'RELATION'
      )
    ), one_hop AS (
      SELECT DISTINCT g.src AS memory_id FROM {_EDG} g
      JOIN anchors a ON g.dst = a.id WHERE g.edge_type = 'HAS_ENTITY'
    )
    SELECT DISTINCT g.src AS memory_id
    FROM {_EDG} g JOIN nbrs n ON g.dst = n.nbr
    WHERE g.edge_type = 'HAS_ENTITY'
      AND g.src NOT IN (SELECT memory_id FROM one_hop)
    ORDER BY memory_id
    """,
)
def q_graph_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — 2-hop entity path
    ``Entity-[:RELATION]-Entity<-[:HAS_ENTITY]-Memory`` with DISTINCT
    memories, deduped against the 1-hop seen-set (reference
    `search/graph.py:167-219`, seen-set at 186-188)."""
    ent = load_fixture(spark, sf_dir, "entities")
    edges = load_fixture(spark, sf_dir, "edges")
    mem = load_fixture(spark, sf_dir, "memories")
    anchors = _anchor_entities(ent)
    two = two_hop_memories(anchors, edges, mem).select("memory_id")
    one = entity_memories(anchors, edges, mem).select("memory_id").distinct()
    return two.join(one, "memory_id", "left_anti").orderBy("memory_id")


@query(
    "relation_triples",
    oracle=f"""
    SELECT g.src AS memory_id, es.name AS source_name,
           r.relation_type, et.name AS target_name
    FROM {_EDG} g
    JOIN {_EDG} r ON r.src = g.dst AND r.edge_type = 'RELATION'
    JOIN {_ENT} es ON es.id = r.src
    JOIN {_ENT} et ON et.id = r.dst
    JOIN {_MEM} m ON m.id = g.src
    WHERE g.edge_type = 'HAS_ENTITY' AND m.user_id = 'carol'
    ORDER BY memory_id, source_name, r.relation_type, target_name
    """,
)
def q_relation_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — per-memory relation-triple expansion
    (`_get_node_relations`, `search/vector.py:384-409`): the outgoing
    RELATION edges of each of a memory's entities, as flat rows (the
    reference nests them per result; `collect_list(struct(...))` would
    re-nest identically)."""
    mem = load_fixture(spark, sf_dir, "memories").where(F.col("user_id") == "carol")
    # every join here broadcasts the small side, so without spreading
    # the 300k-edge scan the whole chain runs on ONE input split
    out = relation_triples(
        spread(load_fixture(spark, sf_dir, "edges")),
        load_fixture(spark, sf_dir, "entities"),
    ).join(mem.select(F.col("id").alias("memory_id")), "memory_id")
    return out.select(
        "memory_id", "source_name", "relation_type", "target_name"
    ).orderBy("memory_id", "source_name", "relation_type", "target_name")


@query(
    "supersedes_inherit",
    oracle=f"""
    WITH sup AS (
      SELECT src AS new_id, dst AS old_id FROM {_EDG}
      WHERE edge_type = 'SUPERSEDES'
    ), he AS (
      SELECT src, dst FROM {_EDG} WHERE edge_type = 'HAS_ENTITY'
    )
    SELECT s.new_id, s.old_id,
           count(ho.dst) AS n_old_entities,
           count(hn.dst) AS n_inherited
    FROM sup s
    JOIN {_MEM} old_m ON old_m.id = s.old_id
    LEFT JOIN he ho ON ho.src = s.old_id
    LEFT JOIN he hn ON hn.src = s.new_id AND hn.dst = ho.dst
    WHERE old_m.expired_at IS NOT NULL
    GROUP BY s.new_id, s.old_id
    ORDER BY s.new_id, s.old_id
    """,
)
def q_supersedes_inherit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 read side — SUPERSEDES lineage + edge-inheritance check
    (`manager.py:966-976`, `_inherit_entity_edges` 1153-1180): for every
    supersession, the old node must be expired and the new node must
    carry every HAS_ENTITY edge of the old one (n_inherited ==
    n_old_entities by the executor's contract)."""
    edges = load_fixture(spark, sf_dir, "edges")
    mem = load_fixture(spark, sf_dir, "memories")
    sup = edges_of_type(edges, "SUPERSEDES").select(
        F.col("src").alias("new_id"), F.col("dst").alias("old_id")
    )
    he = edges_of_type(edges, "HAS_ENTITY").select("src", "dst")
    old_ent = he.select(F.col("src").alias("old_id"), F.col("dst").alias("ent"))
    new_ent = he.select(F.col("src").alias("new_id"), F.col("dst").alias("ent"))
    expired_old = mem.where(F.col("expired_at").isNotNull()).select(
        F.col("id").alias("old_id")
    )
    new_marked = new_ent.withColumn("matched", F.lit(1))
    return (
        sup.join(expired_old, "old_id")
        .join(old_ent, "old_id", "left")
        .withColumnRenamed("ent", "ent_key")
        .join(
            new_marked.withColumnRenamed("ent", "ent_key"),
            ["new_id", "ent_key"],
            "left",
        )
        .groupBy("new_id", "old_id")
        .agg(
            F.count("ent_key").alias("n_old_entities"),
            F.count("matched").alias("n_inherited"),
        )
        .orderBy("new_id", "old_id")
    )


@query(
    "chain_expansion",
    oracle=f"""
    WITH RECURSIVE lt(node_id, depth) AS (
      SELECT g.dst, 1 FROM {_EDG} g
      WHERE g.edge_type = 'LEADS_TO'
        AND g.src = (SELECT min(src) FROM {_EDG} WHERE edge_type = 'LEADS_TO')
      UNION ALL
      SELECT g.dst, w.depth + 1
      FROM lt w JOIN {_EDG} g
        ON g.src = w.node_id AND g.edge_type = 'LEADS_TO'
      WHERE w.depth < 5
    ), ne(node_id, depth) AS (
      SELECT g.dst, 1 FROM {_EDG} g
      WHERE g.edge_type = 'NEXT_EPISODE'
        AND g.src = (SELECT min(src) FROM {_EDG} WHERE edge_type = 'NEXT_EPISODE')
      UNION ALL
      SELECT g.dst, w.depth + 1
      FROM ne w JOIN {_EDG} g
        ON g.src = w.node_id AND g.edge_type = 'NEXT_EPISODE'
      WHERE w.depth < 10
    )
    SELECT 'leads_to' AS kind, node_id, min(depth) AS depth
    FROM lt GROUP BY node_id
    UNION ALL
    SELECT 'episode' AS kind, node_id, min(depth) AS depth
    FROM ne GROUP BY node_id
    ORDER BY kind, node_id
    """,
)
def q_chain_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 + J11 in one tagged union (merged per the r4 slot-folding
    pattern; the freed slot went to `pq_adc_topk`).

    'leads_to' rows: LEADS_TO recursive chain, forward, max_depth=5
    (reference `temporal_chain`, `manager.py:1475-1569`) — iterative
    frontier joins, first-visit depth wins, seeded at the chain head
    with the smallest id (deterministic; both sides derive it the same
    way). 'episode' rows: NEXT_EPISODE single-successor walk,
    max_depth=10 (`_episode_chain_impl` + `_traverse_episodes`,
    `manager.py:1407-1473`); out-degree ≤ 1 by construction so each
    hop is a 1-row frontier."""
    edges = load_fixture(spark, sf_dir, "edges")
    lt = edges_of_type(edges, "LEADS_TO")
    lt_seed = lt.agg(F.min("src").alias("node_id"))
    lt_out = expand_chain(edges, lt_seed, "LEADS_TO", max_depth=5).select(
        F.lit("leads_to").alias("kind"), "node_id", "depth"
    )
    ne = edges_of_type(edges, "NEXT_EPISODE")
    ne_seed = ne.agg(F.min("src").alias("node_id"))
    ne_out = expand_chain(edges, ne_seed, "NEXT_EPISODE", max_depth=10).select(
        F.lit("episode").alias("kind"), "node_id", "depth"
    )
    return lt_out.unionByName(ne_out).orderBy("kind", "node_id")


@query(
    "provenance_rollup",
    oracle=f"""
    SELECT e.id AS episode_id,
           count(DISTINCT p.dst) AS n_memories,
           count(DISTINCT mn.dst) AS n_entities
    FROM {_EPI} e
    LEFT JOIN {_EDG} p ON p.src = e.id AND p.edge_type = 'PRODUCED'
    LEFT JOIN {_EDG} mn ON mn.src = e.id AND mn.edge_type = 'MENTIONS'
    WHERE e.user_id = 'alice'
    GROUP BY e.id ORDER BY episode_id
    """,
)
def q_provenance_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12 — provenance joins (`manager.py:1329-1405`): per episode, the
    memories it PRODUCED and the entities it MENTIONS. Distinct counts
    because the two left joins fan out multiplicatively."""
    epi = load_fixture(spark, sf_dir, "episodes").where(F.col("user_id") == "alice")
    edges = load_fixture(spark, sf_dir, "edges")
    prod = edges_of_type(edges, "PRODUCED").select(
        F.col("src").alias("episode_id"), F.col("dst").alias("mem_id")
    )
    ment = edges_of_type(edges, "MENTIONS").select(
        F.col("src").alias("episode_id"), F.col("dst").alias("ent_id")
    )
    return (
        epi.select(F.col("id").alias("episode_id"))
        .join(prod, "episode_id", "left")
        .join(ment, "episode_id", "left")
        .groupBy("episode_id")
        .agg(
            F.countDistinct("mem_id").alias("n_memories"),
            F.countDistinct("ent_id").alias("n_entities"),
        )
        .orderBy("episode_id")
    )


@query(
    "reinforcement_mean",
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
    )
    SELECT memory_id,
           round(greatest(0.0, least(1.0, 0.2 * avg(importance)))::DOUBLE, 6)
             AS reinforcement
    FROM pairs GROUP BY memory_id ORDER BY memory_id
    """,
)
def q_reinforcement_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J14 + A3 — shared-entity reinforcement for a candidate list
    (reference `_compute_reinforcement`, `scoring.py:245-299`): children
    = later-created memories sharing ≥1 entity; reinforcement =
    clamp(0.2 · avg(child importance)).

    The base set is a top-20 candidate list (the reference only ever
    scores search candidates, never the full table) — which also keeps
    the entity self-join skew-bounded at scale."""
    mem = load_fixture(spark, sf_dir, "memories")
    edges = load_fixture(spark, sf_dir, "edges")
    base = (
        mem.where((F.col("user_id") == "carol") & F.col("expired_at").isNull())
        .orderBy(F.col("importance").desc_nulls_last(), F.col("id").asc())
        .limit(20)
    )
    out = shared_entity_children(base, mem, edges)
    return out.select(
        "memory_id", F.round("reinforcement", 6).alias("reinforcement")
    ).orderBy("memory_id")


@query(
    "topology_scores",
    oracle=f"""
    WITH he AS (
      SELECT src AS memory_id, dst AS entity_id FROM {_EDG}
      WHERE edge_type = 'HAS_ENTITY'
    ), deg AS (
      SELECT entity_id, count(DISTINCT memory_id) AS ent_deg FROM he
      GROUP BY entity_id
    ), agg AS (
      SELECT he.memory_id,
             count(*) AS entity_count,
             round(sum(CASE WHEN d.ent_deg >= 2 THEN 1 ELSE 0 END)::DOUBLE
                   / count(*), 6) AS shared_ratio
      FROM he JOIN deg d ON d.entity_id = he.entity_id
      GROUP BY he.memory_id
    )
    SELECT memory_id, entity_count, shared_ratio,
           round(0.6 * least(1.0, ln(1.0 + entity_count) / ln(11.0))
                 + 0.4 * greatest(0.0, least(1.0, shared_ratio)), 6) AS topology
    FROM agg ORDER BY memory_id
    """,
)
def q_topology_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 + R4 — per-memory entity degree, shared-entity ratio and the
    topology score 0.6·min(1, log(1+ec)/log 11) + 0.4·clamp(ratio)
    (reference `_batch_topology_scores` `scoring.py:302-370`, formula at
    230-242). Entity "shared" = degree ≥ 2, computed as one aggregate
    instead of the reference's per-entity LIMIT-1 probes."""
    mem = load_fixture(spark, sf_dir, "memories")
    edges = load_fixture(spark, sf_dir, "edges")
    agg = topology_aggregate(mem, edges).withColumn(
        "shared_ratio", F.round("shared_ratio", 6)
    )
    return agg.select(
        "memory_id",
        "entity_count",
        "shared_ratio",
        F.round(topology_score("entity_count", "shared_ratio"), 6).alias("topology"),
    ).orderBy("memory_id")


@query(
    "entity_anchored_search",
    oracle=f"""
    WITH q AS (
      SELECT embedding::DOUBLE[] AS qv FROM {_MEM} WHERE id = 1
    ), anchors AS (
      SELECT id FROM {_ENT} WHERE lower(name) IN {_ANCHOR_SQL}
    ), one_hop AS (
      SELECT DISTINCT g.src AS memory_id FROM {_EDG} g
      JOIN anchors a ON g.dst = a.id WHERE g.edge_type = 'HAS_ENTITY'
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
      WHERE g.edge_type = 'HAS_ENTITY'
        AND g.src NOT IN (SELECT memory_id FROM one_hop)
    ), cand AS (
      SELECT memory_id, 1.0 AS disc FROM one_hop
      UNION ALL
      SELECT memory_id, 0.7 AS disc FROM two_hop
    )
    SELECT c.memory_id,
           round(c.disc * {_DUCK_COS_M}, 6) AS score
    FROM cand c
    JOIN {_MEM} m ON m.id = c.memory_id AND m.expired_at IS NULL, q
    ORDER BY score DESC, c.memory_id ASC
    LIMIT 10
    """,
)
def q_entity_anchored_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V6 — entity-anchored graph retrieval (reference `graph_search`,
    `search/graph.py:34-223`): anchor entities → 1-hop memories at full
    cosine score, 2-hop at 0.7× (the reference's discount at 167-219),
    2-hop deduped against 1-hop by seen-set, soft-expiry filter, top-k.

    The query vector is the stored embedding of memory id=1 (available
    identically to both engines)."""
    mem = load_fixture(spark, sf_dir, "memories")
    edges = load_fixture(spark, sf_dir, "edges")
    ent = load_fixture(spark, sf_dir, "entities")
    anchors = _anchor_entities(ent)
    live = mem.where(F.col("expired_at").isNull())

    one = (
        entity_memories(anchors, edges, mem)
        .select("memory_id")
        .distinct()
        .withColumn("disc", F.lit(1.0))
    )
    two = (
        two_hop_memories(anchors, edges, mem)
        .select("memory_id")
        .join(one.select("memory_id"), "memory_id", "left_anti")
        .withColumn("disc", F.lit(0.7))
    )
    qv = mem.where(F.col("id") == 1).select(F.col("embedding").alias("qv"))
    cand = one.unionByName(two)
    scored = (
        cand.join(
            live.select(F.col("id").alias("memory_id"), "embedding"), "memory_id"
        )
        .crossJoin(F.broadcast(qv))
        .select(
            "memory_id",
            F.round(
                F.col("disc") * cosine_similarity("embedding", "qv"), 6
            ).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("memory_id").asc()).limit(10)


@query(
    "community_rollup",
    oracle=f"""
    SELECT c.community_id, c.member_count,
           count(g.dst) AS edge_members
    FROM {_COM} c
    LEFT JOIN {_EDG} g ON g.src = c.id AND g.edge_type = 'HAS_MEMBER'
    WHERE c.member_count >= 2
    GROUP BY c.community_id, c.member_count
    ORDER BY c.community_id
    """,
)
def q_community_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J15 + A5 — community membership expansion
    (`communities.py:203-283`, grouping at 49-81): HAS_MEMBER edge count
    per community cross-checked against the stored member_count; groups
    of ≥2 only (the reference's community-formation threshold)."""
    com = load_fixture(spark, sf_dir, "communities").where(
        F.col("member_count") >= 2
    )
    hm = edges_of_type(load_fixture(spark, sf_dir, "edges"), "HAS_MEMBER").select(
        F.col("src").alias("id"), F.col("dst")
    )
    return (
        com.select("id", "community_id", "member_count")
        .join(hm, "id", "left")
        .groupBy("community_id", "member_count")
        .agg(F.count("dst").alias("edge_members"))
        .orderBy("community_id")
    )


# S3/S4 point + property lookup moved into `filter_ops`
# (relational_q.py) in r6 to free a registry slot for the corpus ops.


@query(
    "memory_stats",
    oracle=f"""
    SELECT coalesce(memory_type, 'semantic') AS memory_type,
           count(*) AS n,
           CAST(sum(CASE WHEN expired_at IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
           round(quantile_cont(importance, 0.5), 6) AS p50_importance,
           round(quantile_cont(importance, 0.95), 6) AS p95_importance
    FROM {_MEM}
    GROUP BY coalesce(memory_type, 'semantic')
    ORDER BY memory_type
    """,
)
def q_memory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/A1 — the real stats rollup over the native memories table
    (`_stats_impl`, `manager.py:1926-2014`): counts by memory_type with
    the NULL≡semantic back-compat rule (F6), active vs expired split,
    plus EXACT interpolated importance percentiles (Spark `percentile`
    and DuckDB `quantile_cont` share the (n-1)·p linear-interpolation
    definition, so the hash pins them bit-for-bit at 6 decimals — the
    latency/score-distribution surface a stats endpoint reports)."""
    mem = load_fixture(spark, sf_dir, "memories")
    return (
        mem.groupBy(
            F.coalesce(F.col("memory_type"), F.lit("semantic")).alias("memory_type")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("expired_at").isNull(), 1).otherwise(0)).alias(
                "n_active"
            ),
            F.round(F.percentile("importance", F.lit(0.5)), 6).alias(
                "p50_importance"
            ),
            F.round(F.percentile("importance", F.lit(0.95)), 6).alias(
                "p95_importance"
            ),
        )
        .orderBy("memory_type")
    )
