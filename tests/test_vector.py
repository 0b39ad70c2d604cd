"""Vector function unit tests + oracle parity for the V1/F8 queries."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.vector import (
    cosine_similarity,
    cosine_to_query,
    knn,
)
from grafeo_memory_spark.queries import QUERIES
from grafeo_memory_spark.sources.tables import load_table
from tests.conftest import SF_DIR, assert_matches_oracle


def test_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    vals = [r[0] for r in df.select(cosine_similarity("a", "b")).collect()]
    assert vals[0] == pytest.approx(1.0)
    assert vals[1] == pytest.approx(0.0)
    assert vals[2] == 0.0  # zero-norm guard, reference search/graph.py:28-29


def test_cosine_matches_python(spark):
    a = [0.3, -0.5, 0.8, 0.1]
    b = [-0.2, 0.9, 0.4, 0.0]
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    df = spark.createDataFrame([(a,)], "v array<double>")
    got = df.select(cosine_to_query("v", b)).collect()[0][0]
    assert got == pytest.approx(dot / (na * nb), abs=1e-12)


def test_knn_returns_k_sorted(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    qv = emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    out = knn(emb.where(F.col("vec_id") != 0), qv, k=5).collect()
    assert len(out) == 5
    sims = [r["sim"] for r in out]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 - 1e-9 <= s <= 1.0 + 1e-9 for s in sims)


@pytest.mark.parametrize("name", ["knn_topk"])
def test_oracle_parity(spark, duck, name):
    from grafeo_memory_spark.queries import ORACLES

    assert_matches_oracle(QUERIES[name](spark, SF_DIR), duck, ORACLES[name])
