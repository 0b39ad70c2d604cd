"""G1-G3 tests against closed-form / hand-computed power-iteration
oracles on tiny graphs (FIXTURES.md §D: pure-function expectations for
SQL-inexpressible iterative ops)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.graph.algorithms import (
    betweenness_centrality,
    label_propagation,
    pagerank,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(i, s, d, "RELATION") for i, (s, d) in enumerate(pairs)],
        "edge_id long, src long, dst long, edge_type string",
    )


def _py_pagerank(pairs, n_nodes, damping=0.85, iters=200):
    """Plain-python power iteration with uniform dangling redistribution
    — the oracle."""
    nodes = sorted({x for p in pairs for x in p})
    out = {v: 0 for v in nodes}
    for s, _ in pairs:
        out[s] += 1
    r = {v: 1.0 / len(nodes) for v in nodes}
    for _ in range(iters):
        dangling = sum(r[v] for v in nodes if out[v] == 0)
        nxt = {v: (1 - damping) / len(nodes) + damping * dangling / len(nodes)
               for v in nodes}
        for s, d in pairs:
            nxt[d] += damping * r[s] / out[s]
        r = nxt
    return r


def test_pagerank_two_node_cycle(spark):
    pr = {
        r["node_id"]: r["pagerank"]
        for r in pagerank(_edges(spark, [(1, 2), (2, 1)])).collect()
    }
    assert pr[1] == pytest.approx(0.5, abs=1e-6)
    assert pr[2] == pytest.approx(0.5, abs=1e-6)


def test_pagerank_matches_power_iteration(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 2), (5, 2)]
    got = {
        r["node_id"]: r["pagerank"]
        for r in pagerank(_edges(spark, pairs), max_iter=200).collect()
    }
    want = _py_pagerank(pairs, 5)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    for v, w in want.items():
        assert got[v] == pytest.approx(w, abs=1e-5), f"node {v}"


def test_pagerank_dangling_mass(spark):
    # 1→2, 2 dangles: mass must still sum to 1
    got = {
        r["node_id"]: r["pagerank"]
        for r in pagerank(_edges(spark, [(1, 2)])).collect()
    }
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    assert got[2] > got[1]


def test_lpa_two_disjoint_triangles(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)]
    labels = {
        r["node_id"]: r["community"]
        for r in label_propagation(_edges(spark, pairs)).collect()
    }
    assert labels[1] == labels[2] == labels[3]
    assert labels[10] == labels[11] == labels[12]
    assert labels[1] != labels[10]


def test_betweenness_path_graph(spark):
    # path 1-2-3: only the middle node carries flow; normalized → 1.0
    got = {
        r["node_id"]: r["betweenness"]
        for r in betweenness_centrality(_edges(spark, [(1, 2), (2, 3)])).collect()
    }
    assert got[2] == pytest.approx(1.0, abs=1e-9)
    assert got[1] == pytest.approx(0.0, abs=1e-9)
    assert got[3] == pytest.approx(0.0, abs=1e-9)


def test_betweenness_star_center(spark):
    # star K1,4: center on every pair path → normalized 1, leaves 0
    got = {
        r["node_id"]: r["betweenness"]
        for r in betweenness_centrality(
            _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4)])
        ).collect()
    }
    assert got[0] == pytest.approx(1.0, abs=1e-9)
    for leaf in (1, 2, 3, 4):
        assert got[leaf] == pytest.approx(0.0, abs=1e-9)


def test_betweenness_square_with_diagonal(spark):
    # cycle 1-2-3-4 plus chord 1-3: hand-computed Brandes values
    # pairs: (2,4) has two shortest paths (via 1 and via 3) → each of
    # nodes 1,3 gets 0.5; all other pairs are direct edges.
    got = {
        r["node_id"]: r["betweenness"]
        for r in betweenness_centrality(
            _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])
        ).collect()
    }
    # normalization: /((4-1)(4-2)/2) = /3
    assert got[1] == pytest.approx(0.5 / 3, abs=1e-9)
    assert got[3] == pytest.approx(0.5 / 3, abs=1e-9)
    assert got[2] == pytest.approx(0.0, abs=1e-9)
    assert got[4] == pytest.approx(0.0, abs=1e-9)


def test_betweenness_driver_matches_distributed(spark):
    """The gated numpy fast path (r8) must agree with the distributed
    per-level joins — randomized parity on seeded graphs, full-source
    and sampled-source, with and without a binding depth cap."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 24 + 8 * trial
        pairs = {
            (rng.randrange(n), rng.randrange(n)) for _ in range(3 * n)
        }
        pairs = [(a, b) for a, b in pairs if a != b]
        edges = _edges(spark, pairs)
        sources = None if trial == 0 else sorted(
            {rng.randrange(n) for _ in range(6)}
        )
        depth = 3 if trial == 2 else 10
        fast = {
            r["node_id"]: r["betweenness"]
            for r in betweenness_centrality(
                edges, sources=sources, max_depth=depth
            ).collect()
        }
        slow = {
            r["node_id"]: r["betweenness"]
            for r in betweenness_centrality(
                edges, sources=sources, max_depth=depth,
                driver_edge_threshold=0,
            ).collect()
        }
        assert fast.keys() == slow.keys()
        for k in fast:
            assert fast[k] == pytest.approx(slow[k], abs=1e-9), (trial, k)


def test_pagerank_driver_matches_distributed(spark):
    """The gated numpy fast path (r8) must agree with the distributed
    power-iteration loop — randomized parity on seeded graphs,
    including a dangling-node trial (the parity test the r8 docstring
    promised; VERDICT r8 item 1)."""
    import random

    rng = random.Random(11)
    for trial in range(3):
        n = 16 + 8 * trial
        pairs = {
            (rng.randrange(n), rng.randrange(n)) for _ in range(3 * n)
        }
        pairs = sorted((a, b) for a, b in pairs if a != b)
        if trial >= 1:
            # force dangling nodes: strip all out-edges of two ids
            dangle = {0, 1}
            pairs = [(a, b) for a, b in pairs if a not in dangle]
            pairs += [(n - 1, d) for d in dangle]  # keep them reachable
        edges = _edges(spark, pairs)
        fast = {
            r["node_id"]: r["pagerank"]
            for r in pagerank(edges, max_iter=40).collect()
        }
        slow = {
            r["node_id"]: r["pagerank"]
            for r in pagerank(
                edges, max_iter=40, driver_edge_threshold=0
            ).collect()
        }
        assert fast.keys() == slow.keys(), trial
        assert sum(fast.values()) == pytest.approx(1.0, abs=1e-6)
        for k in fast:
            assert fast[k] == pytest.approx(slow[k], abs=1e-9), (trial, k)

    # fixed-iteration mode on a dangling-free graph: the distributed
    # loop skips the per-round stats job entirely (r9) — results must
    # still match the numpy path exactly
    cyc = [(i, (i + 1) % 10) for i in range(10)] + [(3, 7), (8, 2)]
    edges = _edges(spark, cyc)
    fast = {
        r["node_id"]: r["pagerank"]
        for r in pagerank(edges, max_iter=15, tol=0.0).collect()
    }
    slow = {
        r["node_id"]: r["pagerank"]
        for r in pagerank(
            edges, max_iter=15, tol=0.0, driver_edge_threshold=0
        ).collect()
    }
    assert fast.keys() == slow.keys()
    for k in fast:
        assert fast[k] == pytest.approx(slow[k], abs=1e-9), k

    # fixed-iteration mode WITH dangling nodes (the scale-bench shape,
    # r13): the distributed loop carries the dangling mass forward as a
    # broadcast 1-row aggregate instead of a per-round collected scalar
    # — same arithmetic, zero per-round driver jobs; must still match
    # the numpy path
    dang = [(i, (i + 1) % 8) for i in range(7)] + [(2, 9), (5, 9), (0, 8)]
    edges = _edges(spark, dang)  # nodes 8 and 9 have no out-edges
    fast = {
        r["node_id"]: r["pagerank"]
        for r in pagerank(edges, max_iter=12, tol=0.0).collect()
    }
    slow = {
        r["node_id"]: r["pagerank"]
        for r in pagerank(
            edges, max_iter=12, tol=0.0, driver_edge_threshold=0
        ).collect()
    }
    assert fast.keys() == slow.keys()
    for k in fast:
        assert fast[k] == pytest.approx(slow[k], abs=1e-9), k


def test_lpa_driver_matches_distributed(spark):
    """The gated numpy LPA fast path (r9) is deterministic integer
    arithmetic on both sides, so driver ≡ distributed must hold
    EXACTLY — randomized parity on seeded graphs, shipped with the fast
    path per VERDICT r8 item 4."""
    import random

    rng = random.Random(23)
    for trial in range(3):
        n = 18 + 10 * trial
        pairs = {
            (rng.randrange(n), rng.randrange(n)) for _ in range(2 * n)
        }
        pairs = sorted((a, b) for a, b in pairs if a != b)
        if trial == 2:
            pairs.append((5, 5))  # self-loop parity
        edges = _edges(spark, pairs)
        fast = {
            r["node_id"]: r["community"]
            for r in label_propagation(edges, max_iter=8).collect()
        }
        slow = {
            r["node_id"]: r["community"]
            for r in label_propagation(
                edges, max_iter=8, driver_edge_threshold=0
            ).collect()
        }
        assert fast == slow, trial


def test_betweenness_duplicate_sources_dedup(spark):
    """Duplicate ids in `sources` must not double-count on either path
    (ADVICE r8): both paths dedup, so [2, 2, 1] ≡ [1, 2]."""
    pairs = [(1, 2), (2, 3), (3, 4)]
    for thresh in (1_000_000, 0):
        dup = {
            r["node_id"]: r["betweenness"]
            for r in betweenness_centrality(
                _edges(spark, pairs),
                sources=[2, 2, 1, 2],
                driver_edge_threshold=thresh,
            ).collect()
        }
        uniq = {
            r["node_id"]: r["betweenness"]
            for r in betweenness_centrality(
                _edges(spark, pairs),
                sources=[1, 2],
                driver_edge_threshold=thresh,
            ).collect()
        }
        assert dup == pytest.approx(uniq), thresh


def test_louvain_label_fixture_is_fresh(spark):
    """The committed fixtures/sf0.01/louvain_labels.parquet must match
    a fresh deterministic run — the driver's structural oracle reads
    the file DuckDB-side, so a code change to louvain() without a
    fixture regeneration would silently break the correctness row."""
    from pyspark.sql import functions as F

    from grafeo_memory_spark.graph.algorithms import louvain
    from grafeo_memory_spark.sources.tables import load_fixture

    stored = {
        (r["node_id"], r["community"])
        for r in spark.read.parquet(
            "/root/repo/fixtures/sf0.01/louvain_labels.parquet"
        ).collect()
    }
    edges = load_fixture(spark, "/root/testdata/sf0.01", "edges").where(
        F.col("edge_type") == "RELATION"
    )
    fresh = {
        (r["node_id"], r["community"])
        for r in louvain(edges, max_iter=10).collect()
    }
    assert stored == fresh


def test_triangle_count_known_graph(spark):
    # K4 on {1,2,3,4} (each node in C(3,2)=3 triangles) plus a pendant
    # edge (5) and an isolated triangle {6,7,8}
    from grafeo_memory_spark.graph.algorithms import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
         (6, 7), (7, 8), (6, 8)],
        "src long, dst long",
    )
    got = {r["node_id"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 6: 1, 7: 1, 8: 1}


def test_triangle_count_direction_and_dup_invariant(spark):
    # reversed + duplicated edges must not create extra triangles
    from grafeo_memory_spark.graph.algorithms import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)], "src long, dst long"
    )
    got = {r["node_id"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_adamic_adar_scores(spark):
    # path 1-2-3: only non-adjacent pair is (1,3) via center 2 with
    # deg 2 → score 1/ln(2); star center 10 with leaves 11,12,13 →
    # each leaf pair scores 1/ln(3)
    import math

    from grafeo_memory_spark.graph.algorithms import adamic_adar

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12), (10, 13)], "src long, dst long"
    )
    got = {
        (r["node_a"], r["node_b"]): r["aa_score"]
        for r in adamic_adar(edges).collect()
    }
    assert set(got) == {(1, 3), (11, 12), (11, 13), (12, 13)}
    assert got[(1, 3)] == pytest.approx(1 / math.log(2))
    assert got[(11, 12)] == pytest.approx(1 / math.log(3))


def test_adamic_adar_hub_cap_drops_hub_wedges(spark):
    from grafeo_memory_spark.graph.algorithms import adamic_adar

    edges = spark.createDataFrame(
        [(10, 11), (10, 12), (10, 13)], "src long, dst long"
    )
    assert adamic_adar(edges, max_hub_degree=2).count() == 0
    assert (
        adamic_adar(
            edges, max_hub_degree=2, driver_edge_threshold=0
        ).count()
        == 0
    )


def test_triangle_driver_matches_distributed(spark):
    """The gated numpy fast path (r9) must agree with the distributed
    wedge joins EXACTLY — triangle counts are integers on both sides.
    Randomized parity on seeded graphs with duplicates, reversals, and
    self-loops, shipped with the fast path per the r8 G1 lesson."""
    import random

    from grafeo_memory_spark.graph.algorithms import triangle_count

    rng = random.Random(31)
    for trial in range(3):
        n = 20 + 10 * trial
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(4 * n)
        ]
        if trial == 1:
            pairs += [(p[1], p[0]) for p in pairs[:10]]  # reversals
            pairs.append((3, 3))  # self-loop
        edges = _edges(spark, pairs)
        fast = {
            (r["node_id"], r["triangles"])
            for r in triangle_count(edges).collect()
        }
        slow = {
            (r["node_id"], r["triangles"])
            for r in triangle_count(
                edges, driver_edge_threshold=0
            ).collect()
        }
        assert fast == slow, trial


def test_adamic_adar_driver_matches_distributed(spark):
    """The gated numpy fast path (r9) must agree with the distributed
    wedge expansion — same pair set, scores to 1e-9 (float sums
    reassociate between the two paths), hub cap included."""
    import random

    from grafeo_memory_spark.graph.algorithms import adamic_adar

    rng = random.Random(37)
    for trial in range(3):
        n = 18 + 8 * trial
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(3 * n)
        ]
        hub = 4 if trial == 2 else None
        edges = _edges(spark, pairs)
        fast = {
            (r["node_a"], r["node_b"]): r["aa_score"]
            for r in adamic_adar(edges, max_hub_degree=hub).collect()
        }
        slow = {
            (r["node_a"], r["node_b"]): r["aa_score"]
            for r in adamic_adar(
                edges, max_hub_degree=hub, driver_edge_threshold=0
            ).collect()
        }
        assert fast.keys() == slow.keys(), trial
        for key in fast:
            assert fast[key] == pytest.approx(slow[key], abs=1e-9), (
                trial,
                key,
            )
    # top_k truncation parity on a fixed graph with distinct scores
    tri_pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (1, 3), (2, 5)]
    edges = _edges(spark, tri_pairs)
    fast = [tuple(r) for r in adamic_adar(edges, top_k=3).collect()]
    slow = [
        tuple(r)
        for r in adamic_adar(
            edges, top_k=3, driver_edge_threshold=0
        ).collect()
    ]
    assert sorted(fast) == pytest.approx(sorted(slow))


def test_wedge_budget_falls_back_to_distributed(spark, monkeypatch):
    """When the collected graph's pair expansion exceeds the wedge
    budget, both drivers must decline (return None) and the public
    functions must fall through to the distributed plans with
    unchanged results."""
    from grafeo_memory_spark.graph import algorithms as ga

    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    edges = _edges(spark, pairs)
    tri_default = sorted(map(tuple, ga.triangle_count(edges).collect()))
    aa_default = sorted(map(tuple, ga.adamic_adar(edges).collect()))
    monkeypatch.setattr(ga, "_WEDGE_BUDGET", 0)
    import numpy as np

    raw = np.array(pairs, dtype=np.int64)
    assert ga._triangle_driver(spark, raw) is None
    assert ga._adamic_adar_driver(spark, raw, None, None) is None
    tri = sorted(map(tuple, ga.triangle_count(edges).collect()))
    aa = sorted(map(tuple, ga.adamic_adar(edges).collect()))
    assert tri == tri_default
    assert [p[:2] for p in aa] == [p[:2] for p in aa_default]
    for got, want in zip(aa, aa_default):
        assert got[2] == pytest.approx(want[2], abs=1e-9)


def test_k_core_peels_to_fixpoint(spark):
    # K4 {1..4} is the 3-core; the tail 4-5-6 and the pendant on 5 all
    # peel away (5 transiently has degree 2 — multiple rounds needed)
    from grafeo_memory_spark.graph.algorithms import k_core

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (5, 6), (5, 7)],
        "src long, dst long",
    )
    got = {r["node_id"]: r["core_degree"] for r in k_core(edges, 3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # k=1 keeps everything with an edge
    assert k_core(edges, 1).count() == 7


def test_k_core_paths_agree(spark):
    # driver peel vs distributed loop: identical unique fixpoint,
    # including in-core degrees (nodes can keep dead neighbors' slots)
    from grafeo_memory_spark.graph.algorithms import k_core

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (4, 5), (5, 6), (5, 7), (6, 7)],
        "src long, dst long",
    )
    fast = {(r[0], r[1]) for r in k_core(edges, 2).collect()}
    slow = {
        (r[0], r[1])
        for r in k_core(edges, 2, driver_edge_threshold=0).collect()
    }
    assert fast == slow
    assert dict(fast)[1] == 3  # node 1 keeps its K4 degree


def test_k_core_driver_helper_matches_k_core(spark):
    # r13: q_graph_metrics collects the symmetrized edge set ONCE and
    # hands it to _k_core_driver (vectorized round-synchronous peel)
    # instead of letting k_core re-checkpoint + re-collect. The k-core
    # is a unique order-independent fixpoint, so the helper must agree
    # with both k_core paths exactly — including in-core degrees and
    # on a graph needing multiple peel rounds.
    import random

    from grafeo_memory_spark.graph.algorithms import (
        _driver_gate,
        _k_core_driver,
        k_core,
        symmetrize,
    )

    rng = random.Random(13)
    rows = list({
        (rng.randrange(40), rng.randrange(40)) for _ in range(160)
    })
    edges = spark.createDataFrame(rows, "src long, dst long")
    und = symmetrize(edges)
    raw = _driver_gate(und, 1_000_000)
    assert raw is not None
    for k in (1, 2, 3, 5):
        helper = {
            (r[0], r[1]) for r in _k_core_driver(spark, raw, k).collect()
        }
        fast = {(r[0], r[1]) for r in k_core(und, k, symmetrized=True).collect()}
        slow = {
            (r[0], r[1])
            for r in k_core(
                und, k, symmetrized=True, driver_edge_threshold=0
            ).collect()
        }
        assert helper == fast == slow


def test_symmetrized_fast_path_agrees(spark):
    # the shared-prep path (symmetrize once, pass symmetrized=True to
    # all three metrics — graph_metrics' one-edge-shuffle shape) must
    # agree exactly with each metric's private symmetrize
    from grafeo_memory_spark.graph.algorithms import (
        adamic_adar,
        k_core,
        symmetrize,
        triangle_count,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (2, 3), (2, 4), (3, 4), (1, 4),
         (4, 5), (5, 5), (6, 7), (7, 8), (6, 8)],
        "src long, dst long",
    )
    und = symmetrize(edges).localCheckpoint(eager=False)
    for private, shared in (
        (triangle_count(edges), triangle_count(und, symmetrized=True)),
        (adamic_adar(edges), adamic_adar(und, symmetrized=True)),
        (k_core(edges, 2), k_core(und, 2, symmetrized=True)),
    ):
        assert sorted(map(tuple, private.collect())) == sorted(
            map(tuple, shared.collect())
        )


def test_distributed_paths_handle_empty_graph(spark):
    """Forcing the distributed loops (driver_edge_threshold=0) on an
    empty edge list must return an empty result, not error — the r10
    fused per-level aggregations introduced sentinel unions whose
    degenerate (zero-row) shapes this pins. The gated driver paths get
    the same check via the default threshold."""
    from grafeo_memory_spark.communities import connected_components
    from grafeo_memory_spark.graph.algorithms import (
        betweenness_centrality,
        label_propagation,
        pagerank,
    )

    edges = spark.createDataFrame([], "src long, dst long")
    sym = spark.createDataFrame([], "node_id long, nbr long")
    for thresh in (0, 1_000_000):
        assert pagerank(edges, driver_edge_threshold=thresh).count() == 0
        assert (
            label_propagation(
                edges, max_iter=3, driver_edge_threshold=thresh
            ).count()
            == 0
        )
        assert (
            betweenness_centrality(
                edges, max_depth=3, driver_edge_threshold=thresh
            ).count()
            == 0
        )
        assert (
            connected_components(sym, driver_edge_threshold=thresh).count()
            == 0
        )
