"""Unit tests for MMR selection, multi-probe semantics, BM25/RRF and the
chain/traversal operators — closed-form cases in the reference's
pure-function test style."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.text import (
    bm25_scores,
    build_text_index,
    rrf_fuse,
    tokenize,
)
from grafeo_memory_spark.functions.vector import knn_multi_probe, mmr_select
from grafeo_memory_spark.operators.traversals import expand_chain
from grafeo_memory_spark.operators.windows import drop_newest


def test_mmr_orthogonal_vectors():
    # candidates: two near-duplicates of the query + one orthogonal.
    # MMR must pick one duplicate first, then prefer the orthogonal
    # vector over the second duplicate (diversity term dominates).
    cands = [
        (1, 1.0, [1.0, 0.0]),
        (2, 0.99, [1.0, 0.001]),
        (3, 0.0, [0.0, 1.0]),
    ]
    sel = mmr_select(cands, [1.0, 0.0], k=2, lambda_mult=0.5)
    assert [i for i, _ in sel] == [1, 3]
    # lambda=1 → pure relevance, ignores diversity
    sel_rel = mmr_select(cands, [1.0, 0.0], k=2, lambda_mult=1.0)
    assert [i for i, _ in sel_rel] == [1, 2]


def test_multi_probe_first_wins(spark):
    # one candidate qualifying under two probes with different sims:
    # the FIRST probe's score must win (reference seen-set semantics,
    # search/vector.py:327-333)
    table = spark.createDataFrame(
        [(10, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    probes = spark.createDataFrame(
        [(0, [0.9, 0.1]), (1, [1.0, 0.0])],
        "probe_id long, qv array<double>",
    )
    out = knn_multi_probe(table, probes, k=5, threshold=0.3).collect()
    assert len(out) == 1
    # probe 0's cosine (≈0.9938) wins over probe 1's exact 1.0
    assert out[0]["score"] == pytest.approx(
        0.9 / ((0.9**2 + 0.1**2) ** 0.5), abs=1e-9
    )


def test_multi_probe_threshold_gate(spark):
    table = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    probes = spark.createDataFrame(
        [(0, [1.0, 0.0])], "probe_id long, qv array<double>"
    )
    out = knn_multi_probe(table, probes, k=5, threshold=0.5).collect()
    assert [r["vec_id"] for r in out] == [10]


def test_bm25_prefers_rare_term(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana banana"),
            (2, "apple cherry"),
            (3, "apple apple apple"),
        ],
        "id long, text string",
    )
    idx = build_text_index(docs, "id", "text")
    scores = {r["id"]: r["bm25"] for r in bm25_scores(idx, ["cherry"]).collect()}
    assert set(scores) == {2}  # only doc 2 contains the term
    assert scores[2] > 0
    # common term scores everyone, rare term ranks doc 2 on top
    both = {r["id"]: r["bm25"] for r in bm25_scores(idx, ["apple", "cherry"]).collect()}
    assert set(both) == {1, 2, 3}
    assert both[2] == max(both.values())


def test_tokenize_matches_convention(spark):
    df = spark.createDataFrame([("Hello, World! x2 ",)], "t string")
    got = df.select(tokenize("t").alias("v")).collect()[0]["v"]
    assert got == ["hello", "world", "x2"]


def test_rrf_fusion_math(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "id long, rank_a int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "id long, rank_b int")
    got = {r["id"]: r["rrf"] for r in rrf_fuse(a, b).collect()}
    assert got[1] == pytest.approx(1 / 2)           # rank 1 in a only
    assert got[2] == pytest.approx(1 / 3 + 1 / 2)   # rank 2 + rank 1
    assert got[3] == pytest.approx(1 / 3)           # rank 2 in b only


def test_expand_chain_first_visit_depth(spark):
    # 1→2→3→4 plus shortcut 1→3: node 3 must report depth 1, not 2
    edges = spark.createDataFrame(
        [
            (1, 1, 2, "LEADS_TO"),
            (2, 2, 3, "LEADS_TO"),
            (3, 3, 4, "LEADS_TO"),
            (4, 1, 3, "LEADS_TO"),
        ],
        "edge_id long, src long, dst long, edge_type string",
    )
    seed = spark.createDataFrame([(1,)], "node_id long")
    got = {
        r["node_id"]: r["depth"]
        for r in expand_chain(edges, seed, "LEADS_TO", max_depth=3).collect()
    }
    assert got == {2: 1, 3: 1, 4: 2}


def test_drop_newest_two_phase(spark):
    df = spark.createDataFrame(
        [(i, 1000 + i) for i in range(10)], "id long, created_at long"
    )
    out = drop_newest(df, 3, "created_at", tiebreak="id").collect()
    assert [r["id"] for r in out] == list(range(7))
    # preserve more than table size → empty
    assert drop_newest(df, 20, "created_at", tiebreak="id").count() == 0
    # no global single-partition window in the plan
    plan = drop_newest(df, 3, "created_at", tiebreak="id")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
