"""Vector retrieval queries (SURVEY.md §2.8) over the driver tables.

The query vector is always the embedding of ``vec_id = 0`` — deterministic
and available to both Spark and the DuckDB oracle without a side channel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.vector import cosine_similarity
from grafeo_memory_spark.queries import query
from grafeo_memory_spark.sources.tables import load_table

# DuckDB cosine with explicit double casts so the float32 parquet values
# go through the exact same double-precision fold as the Spark side.
_DUCK_COS = (
    "list_dot_product(e.embedding::DOUBLE[], q.qv)"
    " / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qv, q.qv)))"
)


def _query_row(emb: DataFrame) -> DataFrame:
    return emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))


@query(
    "knn_topk",
    oracle=f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, round({_DUCK_COS}, 6) AS sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY sim DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 — exact cosine kNN, k=10 (reference `protocol.py:96-105`,
    `search/vector.py:18-77`; exact instead of HNSW-approximate).

    Physical plan: parquet scan → codegen'd project(sim) →
    TakeOrderedAndProject. No shuffle; scales linearly with executors.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    scored = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(_query_row(emb)))
        .select(
            "vec_id",
            F.round(cosine_similarity("embedding", "qv"), 6).alias("sim"),
        )
    )
    return scored.orderBy(F.col("sim").desc(), F.col("vec_id").asc()).limit(10)


@query(
    "similarity_threshold",
    oracle=f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, round({_DUCK_COS}, 6) AS sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
      AND round({_DUCK_COS}, 6) >= 0.3
    ORDER BY e.vec_id ASC
    """,
)
def similarity_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/V4 — reconciliation similarity gate: keep candidates with
    cosine >= 0.3 (reference `search/vector.py:327-332`, default
    `similarity_threshold` at `types.py:59`)."""
    emb = load_table(spark, sf_dir, "embeddings")
    scored = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(_query_row(emb)))
        .select(
            "vec_id",
            F.round(cosine_similarity("embedding", "qv"), 6).alias("sim"),
        )
    )
    return scored.where(F.col("sim") >= 0.3).orderBy(F.col("vec_id").asc())
