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
    "knn_multi_probe",
    "mmr_select",
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

    Formulated as ``coalesce(dot / nullif(denom, 0), 0)`` rather than a
    CASE guard: a ``when(denom == 0).otherwise(dot/denom)`` duplicates
    both norm aggregates into condition AND else-branch, doubling the
    per-row fold work in the scan's hot loop (visible in
    `.explain("formatted")`); nullif evaluates each aggregate once.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
    return F.coalesce(dot(a, b) / denom, F.lit(0.0))


def _vec_lit(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_to_query(emb: Column | str, query_vec: Sequence[float]) -> Column:
    """Cosine similarity of a vector column against a constant query vector.

    The query vector is folded into the plan as a literal array (constant
    for every task — the Catalyst equivalent of a broadcast variable).
    The query norm is computed driver-side (r9): Catalyst does not
    constant-fold an ``aggregate`` over a literal array, so the naive
    form re-folds the query norm on EVERY row of the scan — a third of
    the per-row fold work for nothing. Bit-identical to
    ``cosine_similarity(emb, lit(query_vec))``: the Python loop below
    is the same left-fold acc+x*x then sqrt over the same doubles
    (IEEE 754 ops are exactly specified), and the expression keeps the
    exact ``coalesce(dot/nullif(norm_emb*norm_q, 0), 0)`` shape.
    """
    import math

    acc = 0.0
    for x in query_vec:  # same left-fold order as l2_norm's aggregate
        acc = acc + float(x) * float(x)
    qn = math.sqrt(acc)
    emb = F.col(emb) if isinstance(emb, str) else emb
    denom = F.nullif(l2_norm(emb) * F.lit(qn), F.lit(0.0))
    return F.coalesce(dot(emb, _vec_lit(query_vec)) / denom, F.lit(0.0))


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


def knn_multi_probe(
    df: DataFrame,
    probes: DataFrame,
    k: int = 10,
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_vec_col: str = "qv",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """V4 — multi-probe reconciliation search (reference `search_similar`,
    `search/vector.py:294-348`): for each probe vector run kNN(k), union,
    dedupe keeping the best score, gate on the similarity threshold.

    ``probes`` is a small DataFrame (one row per new-fact embedding) —
    broadcast against the big table. The ``sim >= threshold`` filter runs
    *before* the per-probe top-k window: sub-threshold rows can never
    survive the reference's post-top-k gate, so pre-filtering is
    semantics-preserving and cuts the shuffle feeding the window by
    orders of magnitude (only near matches move).

    Dedupe semantics match the reference exactly: `search_similar`
    iterates probes in order and a seen-set keeps the FIRST qualifying
    probe's similarity (`search/vector.py:327-333`) — NOT the best one —
    so we take the row with the lowest ``probe_id`` per candidate id.
    """
    from pyspark.sql import Window

    joined = df.crossJoin(F.broadcast(probes)).select(
        F.col(id_col),
        F.col(probe_id_col),
        cosine_similarity(vec_col, probe_vec_col).alias("sim"),
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    topk = (
        joined.where(F.col("sim") >= threshold)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
    )
    first_wins = Window.partitionBy(id_col).orderBy(F.col(probe_id_col).asc())
    return (
        topk.withColumn("_first", F.row_number().over(first_wins))
        .where(F.col("_first") == 1)
        .select(F.col(id_col), F.col("sim").alias("score"))
    )


def mmr_select(
    candidates: list[tuple],
    query_vec: Sequence[float],
    k: int,
    lambda_mult: float = 0.5,
) -> list[tuple]:
    """V3 — greedy maximal-marginal-relevance selection (reference
    `mmr_search`, `search/vector.py:194-291`, fetch_k = 4k upstream).

    Driver-side by design: the candidate set is fetch_k ≈ 40 rows of
    (id, sim, vector) already reduced by the distributed kNN; the greedy
    argmax loop is inherently sequential and O(k·fetch_k) — exactly how
    the reference's engine does it, and never worth a distributed job.

    ``candidates``: list of (id, sim_to_query, vector). Returns the
    selected (id, mmr_score) in selection order.
    """
    import math as _math

    def _cos(a: Sequence[float], b: Sequence[float]) -> float:
        dp = sum(x * y for x, y in zip(a, b))
        na = _math.sqrt(sum(x * x for x in a))
        nb = _math.sqrt(sum(x * x for x in b))
        return 0.0 if na == 0 or nb == 0 else dp / (na * nb)

    remaining = list(candidates)
    selected: list[tuple] = []
    chosen_vecs: list[Sequence[float]] = []
    while remaining and len(selected) < k:
        best = None
        best_score = -float("inf")
        best_key = -float("inf")
        for cand in remaining:
            cid, sim, vec = cand
            if chosen_vecs:
                max_sel = max(_cos(vec, v) for v in chosen_vecs)
                score = lambda_mult * sim - (1.0 - lambda_mult) * max_sel
                key = score
            else:
                # First pick is a pure relevance argmax (reference
                # `search/vector.py:194-291`). Compare raw sim: scaling
                # by lambda_mult first can underflow denormal sims to
                # 0.0 and hand the argmax to the id tie-break.
                score = lambda_mult * sim
                key = sim
            if key > best_key or (
                key == best_key and best is not None and cid < best[0]
            ):
                best, best_score, best_key = cand, score, key
        selected.append((best[0], best_score))
        chosen_vecs.append(best[2])
        remaining.remove(best)
    return selected
