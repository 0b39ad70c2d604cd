"""Vector retrieval queries (SURVEY.md §2.8) over the driver tables.

The query vector is always the embedding of ``vec_id = 0`` — deterministic
and available to both Spark and the DuckDB oracle without a side channel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    topk AS (
      SELECT 'topk' AS kind, e.vec_id, round({_DUCK_COS}, 6) AS sim
      FROM embeddings e, q
      WHERE e.vec_id <> 0
      ORDER BY sim DESC, e.vec_id ASC
      LIMIT 10
    ),
    thresh AS (
      SELECT 'thresh' AS kind, e.vec_id, round({_DUCK_COS}, 6) AS sim
      FROM embeddings e, q
      WHERE e.vec_id <> 0
        AND round({_DUCK_COS}, 6) >= 0.3
    )
    SELECT * FROM topk
    UNION ALL
    SELECT * FROM thresh
    ORDER BY kind, sim DESC, vec_id ASC
    """,
)
def knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 + F8/V5 in one driver row (the former standalone
    `similarity_threshold` slot folded in r6, tagged 'thresh'):
    exact cosine kNN, k=10 (reference `protocol.py:96-105`,
    `search/vector.py:18-77`; exact instead of HNSW-approximate),
    plus the reconciliation similarity gate — candidates with
    cosine >= 0.3 (`search/vector.py:327-332`, default
    `similarity_threshold` at `types.py:59`).

    Physical plan: ONE parquet scan → codegen'd project(sim), then a
    TakeOrderedAndProject for the topk branch and a plain filter for
    the gate branch. No shuffle; scales linearly with executors.
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
    topk = (
        scored.orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(10)
        .select(F.lit("topk").alias("kind"), "vec_id", "sim")
    )
    thresh = scored.where(F.col("sim") >= 0.3).select(
        F.lit("thresh").alias("kind"), "vec_id", "sim"
    )
    return topk.unionByName(thresh).orderBy(
        "kind", F.col("sim").desc(), F.col("vec_id").asc()
    )


_DUCK_COS_EC = (
    "list_dot_product(e.embedding::DOUBLE[], c.cv)"
    " / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(c.cv, c.cv)))"
)
_DUCK_COS_CQ = (
    "list_dot_product(c.cv, q.qv)"
    " / (sqrt(list_dot_product(c.cv, c.cv))"
    " * sqrt(list_dot_product(q.qv, q.qv)))"
)


@query(
    "ivf_topk",
    oracle=f"""
    WITH cent AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
             embedding::DOUBLE[] AS cv
      FROM embeddings ORDER BY vec_id LIMIT 8
    ), q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ), assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               max({_DUCK_COS_EC}) OVER w AS best,
               {_DUCK_COS_EC} AS sim
        FROM embeddings e CROSS JOIN cent c
        WINDOW w AS (PARTITION BY e.vec_id)
      ) WHERE sim = best
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cid DESC) = 1
    ), probes AS (
      SELECT cid FROM cent c, q
      ORDER BY {_DUCK_COS_CQ} DESC, cid ASC LIMIT 2
    )
    SELECT e.vec_id, round({_DUCK_COS}, 6) AS sim
    FROM embeddings e
    JOIN assign a ON a.vec_id = e.vec_id
    JOIN probes p ON a.cid = p.cid, q
    WHERE e.vec_id <> 0
    ORDER BY sim DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def ivf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN path as a graded query (builder brief: "IVF or LSH
    variant as the scale path"; companion to `ann_lsh_topk`): an
    8-entry deterministic codebook (lowest-vec_id rows), every vector
    assigned to its max-cosine centroid via a broadcast join +
    map-side `max(struct(sim, cid))` partial aggregation (one scan, one
    narrow shuffle on vec_id), then nprobe=2 inverted lists exactly
    re-ranked against the query. Cost scales as |table|·nprobe/n_cent
    once the lists are partition-pruned (see pipeline/ann.py ivf_*
    for the literal-codebook codegen variant of the same operator).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cent = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cid"),
            F.col("embedding").alias("cv"),
        )
    )
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            F.struct(
                cosine_similarity("embedding", "cv").alias("sim"),
                F.col("cid").alias("cid"),
            ).alias("sc"),
        )
        .groupBy("vec_id")
        .agg(F.max("sc")["cid"].alias("cid"))
    )
    probes = (
        cent.crossJoin(F.broadcast(_query_row(emb)))
        .select("cid", cosine_similarity("cv", "qv").alias("qsim"))
        .orderBy(F.col("qsim").desc(), F.col("cid").asc())
        .limit(2)
        .select("cid")
    )
    return (
        emb.where(F.col("vec_id") != 0)
        .join(assign, "vec_id")
        .join(F.broadcast(probes), "cid")
        .crossJoin(F.broadcast(_query_row(emb)))
        .select(
            "vec_id",
            F.round(cosine_similarity("embedding", "qv"), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@query(
    "pq_adc_topk",
    oracle="""
    WITH js AS (SELECT unnest(generate_series(0, 3)) AS j),
    seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
             embedding::DOUBLE[] AS v
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    cents AS (
      SELECT js.j, s.c, s.v[js.j * 16 + 1 : js.j * 16 + 16] AS cv
      FROM seeds s CROSS JOIN js
    ),
    q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    sub AS (
      SELECT e.vec_id, js.j,
             (e.embedding::DOUBLE[])[js.j * 16 + 1 : js.j * 16 + 16] AS sv
      FROM embeddings e CROSS JOIN js WHERE e.vec_id <> 0
    ),
    dists AS (
      SELECT s.vec_id, s.j, c.c,
             list_sum(list_transform(generate_series(1, 16),
                                     t -> (s.sv[t] - c.cv[t]) ^ 2)) AS d
      FROM sub s JOIN cents c ON c.j = s.j
    ),
    codes AS (
      SELECT vec_id, j, c FROM (
        SELECT vec_id, j, c, row_number() OVER (
          PARTITION BY vec_id, j ORDER BY d ASC, c ASC) AS rn
        FROM dists) WHERE rn = 1
    ),
    lut AS (
      SELECT c.j, c.c,
             list_sum(list_transform(generate_series(1, 16),
                                     t -> (q.qv[c.j * 16 + t] - c.cv[t]) ^ 2))
               AS d
      FROM cents c, q
    )
    SELECT k.vec_id, round(sum(l.d), 6) AS dist
    FROM codes k JOIN lut l ON l.j = k.j AND l.c = k.c
    GROUP BY k.vec_id
    ORDER BY dist ASC, k.vec_id ASC
    LIMIT 10
    """,
)
def pq_adc_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k as a graded query (Jégou et al.
    2011; companion to `ivf_topk` — same deterministic-codebook
    strategy: the m=4 × k=8 codebooks are the subvectors of the 8
    lowest-vec_id rows, so no training randomness enters the oracle,
    while the Lloyd-trained `pq_train` path stays pinned by the
    recall/distance-ratio tests in test_ann_quality).

    Spark side is the production operator pair: `pq_encode` compresses
    every vector to m one-byte codes (codegen argmin per subspace, one
    scan, no shuffle — 64·8 bytes → 4 bytes per vector), then
    `pq_adc_topk` scores candidates with a driver-built inlined lookup
    table (m array reads + a fold per row) and TakeOrderedAndProject.
    This is the memory-bound billion-vector scan shape. The oracle
    replays subspace split, argmin codes (same d-then-c tie-break),
    LUT arithmetic, and the final sum."""
    emb = load_table(spark, sf_dir, "embeddings")
    from grafeo_memory_spark.pipeline.ann import pq_adc_topk, pq_encode

    seeds = [
        list(r[0])
        for r in emb.orderBy("vec_id").limit(8).select("embedding").collect()
    ]
    codebooks = [
        [[float(x) for x in s[j * 16 : (j + 1) * 16]] for s in seeds]
        for j in range(4)
    ]
    qv = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    encoded = pq_encode(emb.where(F.col("vec_id") != 0), codebooks)
    out = pq_adc_topk(encoded, codebooks, qv, k=10)
    return out.select(
        F.col("id").alias("vec_id"), F.round("dist", 6).alias("dist")
    ).orderBy(F.col("dist").asc(), F.col("vec_id").asc())
