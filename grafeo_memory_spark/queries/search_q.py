"""Retrieval-pipeline driver queries (SURVEY.md §2.8): hybrid
BM25+RRF+cosine search (V2), multi-probe reconciliation search (V4) and
MMR diverse search (V3) over the driver `documents`/`embeddings` tables.

`doc_id` and `vec_id` share the id space (both 0..N-1, same row count),
standing in for the reference's per-node text + embedding properties.
The query vector is the stored embedding of id 0; the query terms are
fixed tokens from the generator vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.text import (
    bm25_scores,
    build_text_index,
    rank_by,
    rrf_fuse,
)
from grafeo_memory_spark.functions.vector import (
    cosine_similarity,
    knn,
    knn_multi_probe,
    mmr_select,
)
from grafeo_memory_spark.queries import query
from grafeo_memory_spark.sources.tables import load_table

QUERY_TERMS = ["spark", "vector", "hash"]
_TERMS_SQL = "('spark'), ('vector'), ('hash')"
TOP_N = 20  # per-branch candidate width (reference widens k, then fuses)

_DUCK_COS = (
    "list_dot_product(e.embedding::DOUBLE[], q.qv)"
    " / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(q.qv, q.qv)))"
)


@query(
    "hybrid_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
      FROM documents WHERE doc_id <> 0
    ), toks2 AS (
      SELECT id, term FROM toks WHERE term <> ''
    ), postings AS (
      SELECT id, term, count(*) AS tf FROM toks2 GROUP BY id, term
    ), doclen AS (
      SELECT id, count(*) AS dl FROM toks2 GROUP BY id
    ), stats AS (
      SELECT count(*) AS n FROM documents WHERE doc_id <> 0
    ), adl AS (
      SELECT avg(dl) AS avgdl FROM doclen
    ), qterms(term) AS (VALUES {_TERMS_SQL}),
    matched AS (
      SELECT p.* FROM postings p JOIN qterms USING (term)
    ), dft AS (
      SELECT term, count(DISTINCT id) AS df FROM matched GROUP BY term
    ), bm AS (
      SELECT m.id,
             sum(ln((n - df + 0.5) / (df + 0.5) + 1.0)
                 * m.tf * (1.2 + 1.0)
                 / (m.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS bm25
      FROM matched m JOIN dft USING (term) JOIN doclen USING (id)
      CROSS JOIN stats CROSS JOIN adl
      GROUP BY m.id
    ), bm_rank AS (
      SELECT id, row_number() OVER (ORDER BY round(bm25, 6) DESC, id ASC)
               AS rank_b
      FROM bm ORDER BY round(bm25, 6) DESC, id ASC LIMIT {TOP_N}
    ), q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ), vec AS (
      SELECT e.vec_id AS id, {_DUCK_COS} AS sim
      FROM embeddings e, q WHERE e.vec_id <> 0
    ), vec_rank AS (
      SELECT id, row_number() OVER (ORDER BY sim DESC, id ASC) AS rank_v
      FROM vec ORDER BY sim DESC, id ASC LIMIT {TOP_N}
    ), fused AS (
      SELECT coalesce(b.id, v.id) AS id,
             coalesce(1.0 / (1 + b.rank_b), 0.0)
               + coalesce(1.0 / (1 + v.rank_v), 0.0) AS rrf
      FROM bm_rank b FULL OUTER JOIN vec_rank v ON b.id = v.id
    )
    SELECT f.id, round(f.rrf, 6) AS rrf, round({_DUCK_COS}, 6) AS sim
    FROM fused f JOIN embeddings e ON e.vec_id = f.id, q
    ORDER BY sim DESC, f.id ASC
    LIMIT 10
    """,
)
def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2 — hybrid BM25+vector search with RRF fusion and exact-cosine
    re-rank (reference `search/vector.py:80-191`): BM25 top-20 and
    cosine top-20 are rank-fused (rrf_k=1, W5), then the fused candidate
    set is re-ranked by exact cosine against stored embeddings — the
    reference's BM25-noise-elimination step — and cut to k=10.

    Rank-then-filter ordering preserved (SURVEY §4 O10): candidates are
    ranked inside each branch *before* fusion; no post-filters here.

    Physical shape: postings/doclen aggregates (one scan of documents),
    broadcast term join, two TakeOrderedAndProject branches feeding a
    20+20-row fusion join — everything after the scans touches ≤40 rows.
    """
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") != 0)
    emb = load_table(spark, sf_dir, "embeddings")
    index = build_text_index(docs, "doc_id", "text")
    bm = bm25_scores(index, QUERY_TERMS).withColumn(
        "bm25r", F.round("bm25", 6)
    )
    bm_ranked = rank_by(bm, F.col("bm25r"), "id", "rank_b", limit=TOP_N)

    qv = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    vec = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("id"),
            cosine_similarity("embedding", "qv").alias("sim"),
        )
    )
    vec_ranked = rank_by(vec, F.col("sim"), "id", "rank_v", limit=TOP_N)

    fused = rrf_fuse(bm_ranked, vec_ranked, rank_a="rank_b", rank_b="rank_v")
    rescored = (
        fused.join(emb.select(F.col("vec_id").alias("id"), "embedding"), "id")
        .crossJoin(F.broadcast(qv))
        .select(
            "id",
            F.round("rrf", 6).alias("rrf"),
            F.round(cosine_similarity("embedding", "qv"), 6).alias("sim"),
        )
    )
    return rescored.orderBy(F.col("sim").desc(), F.col("id").asc()).limit(10)


@query(
    "multi_probe",
    oracle=f"""
    WITH probes AS (
      SELECT vec_id AS probe_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id IN (0, 1, 2)
    ), scored AS (
      SELECT e.vec_id AS id, q.probe_id, {_DUCK_COS} AS sim
      FROM embeddings e CROSS JOIN probes q
      WHERE e.vec_id NOT IN (0, 1, 2)
    ), qual AS (
      SELECT * FROM (
        SELECT id, probe_id, sim,
               row_number() OVER (PARTITION BY probe_id
                                  ORDER BY sim DESC, id ASC) AS rn
        FROM scored WHERE sim >= 0.2
      ) WHERE rn <= 10
    )
    SELECT id, round(sim, 6) AS score FROM (
      SELECT id, sim,
             row_number() OVER (PARTITION BY id ORDER BY probe_id ASC) AS fr
      FROM qual
    ) WHERE fr = 1
    ORDER BY id
    """,
)
def q_multi_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4 — multi-probe reconciliation search (reference
    `search_similar`, `search/vector.py:294-348`): per-probe kNN(k=10)
    gated at the similarity threshold, union, dedupe keeping the FIRST
    qualifying probe's score (reference seen-set, 327-333).

    Probes = embeddings of ids {0,1,2} (a 3-fact batch); threshold 0.2.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("qv")
    )
    out = knn_multi_probe(
        emb.where(~F.col("vec_id").isin([0, 1, 2])),
        probes,
        k=10,
        threshold=0.2,
    )
    return out.select(
        F.col("vec_id").alias("id"), F.round("score", 6).alias("score")
    ).orderBy("id")


@query(
    "mmr_topk",
    oracle=f"""
    WITH RECURSIVE q AS (
      SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ),
    cand AS (
      SELECT * FROM (
        SELECT e.vec_id AS id, {_DUCK_COS} AS sim,
               e.embedding::DOUBLE[] AS emb
        FROM embeddings e, q WHERE e.vec_id <> 0
      ) ORDER BY sim DESC, id ASC LIMIT 40
    ),
    sel(step, id, mmr, chosen) AS (
      (SELECT 1, id, 0.5 * sim, [id]
       FROM cand ORDER BY 0.5 * sim DESC, id ASC LIMIT 1)
      UNION ALL
      (SELECT s.step + 1, pick.id, pick.score, list_append(s.chosen, pick.id)
       FROM sel s, LATERAL (
         SELECT c.id AS id,
                0.5 * c.sim - 0.5 * (
                  SELECT max(
                    list_dot_product(c.emb, c2.emb)
                    / (sqrt(list_dot_product(c.emb, c.emb))
                       * sqrt(list_dot_product(c2.emb, c2.emb)))
                  )
                  FROM cand c2 WHERE list_contains(s.chosen, c2.id)
                ) AS score
         FROM cand c WHERE NOT list_contains(s.chosen, c.id)
         ORDER BY score DESC, c.id ASC LIMIT 1
       ) pick
       WHERE s.step < 10)
    )
    SELECT id AS vec_id, round(mmr, 6) AS mmr FROM sel ORDER BY vec_id
    """,
)
def q_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3 — MMR diverse search (reference `mmr_search`,
    `search/vector.py:194-291`): fetch_k=4k candidates by exact kNN
    (distributed), then the inherently-sequential greedy
    relevance/diversity selection on the driver over those 40 rows —
    the same split the reference engine uses.

    The greedy loop IS SQL-expressible for a fixed k: a DuckDB
    recursive CTE whose step argmax runs in a LATERAL subquery over the
    not-yet-chosen candidates (VERDICT r2 item 4) — so the selection
    order and scores are hash-verified, not just row-counted.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").collect()
    qv = list(qrow[0][0])
    cands = knn(
        emb.where(F.col("vec_id") != 0), qv, k=40, keep_cols=["embedding"]
    ).collect()
    sel = mmr_select(
        [(r["vec_id"], r["sim"], list(r["embedding"])) for r in cands],
        qv,
        k=10,
        lambda_mult=0.5,
    )
    return spark.createDataFrame(
        [(int(i), float(round(s, 6))) for i, s in sel], "vec_id long, mmr double"
    )
