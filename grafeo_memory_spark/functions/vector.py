"""Vector math as native Column expressions (SURVEY.md §2.8).

The reference computes cosine similarity in a Rust HNSW engine
(`protocol.py:96-105`) and in pure Python (`search/graph.py:24-31`).
Here every similarity is a Catalyst higher-order-function expression —
`zip_with` + `aggregate` — so the hot path stays inside whole-stage
codegen on the JVM: no Python UDF, no Arrow transfer, vectorized columnar
scan straight from Parquet.

Scale notes (100 TB): a kNN against a single query vector is a map-only
scan + TakeOrderedAndProject — Spark computes per-partition top-k and
merges k·num_partitions rows on the driver; no shuffle of the full table.
For query *sets* (similarity join) see `multi_probe_search` and
`pipeline/ann.py` for the LSH-bucketed path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine_similarity",
    "cosine_to_query",
    "knn",
    "similarity_to_distance",
]


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns, computed in double.

    Sequential left-fold (same order as the reference's Python loop at
    `search/graph.py:27` and DuckDB's list_dot_product) so results are
    bit-reproducible across engines.
    """
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of an array<numeric> column."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity between two vector columns.

    Mirrors `_cosine_similarity` (reference `search/graph.py:24-31`):
    returns 0.0 when either norm is zero rather than NaN.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def _vec_lit(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_to_query(emb: Column | str, query_vec: Sequence[float]) -> Column:
    """Cosine similarity of a vector column against a constant query vector.

    The query vector is folded into the plan as a literal array (constant
    for every task — the Catalyst equivalent of a broadcast variable).
    """
    return cosine_similarity(emb, _vec_lit(query_vec))


def similarity_to_distance(sim: Column) -> Column:
    """Reference converts engine distance to `sim = max(0, 1 - distance)`
    (`search/vector.py:47`); the inverse for parity checks."""
    return F.greatest(F.lit(0.0), F.lit(1.0) - sim)


def knn(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sim_col: str = "sim",
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Exact cosine top-k against one query vector (operator V1).

    Reference: `vector_search` (`protocol.py:96-105`, HNSW approximate);
    here exact — strictly more correct, and at any scale the physical plan
    is scan → project(sim) → TakeOrderedAndProject: per-partition top-k,
    driver merges k rows per partition, zero shuffle.

    Deterministic tie-break on ``id_col`` ascending.
    """
    cols = [F.col(id_col)] + [F.col(c) for c in (keep_cols or [])]
    scored = df.select(*cols, cosine_to_query(vec_col, query_vec).alias(sim_col))
    return scored.orderBy(F.col(sim_col).desc(), F.col(id_col).asc()).limit(k)
