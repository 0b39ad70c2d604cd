"""Text retrieval: tokenization, inverted-index stats, BM25 scoring, RRF
fusion (SURVEY.md §2.8 V2, §2.5 W5).

The reference delegates BM25 to its engine's full-text index
(`manager.py:124`, `search/vector.py:80-191`); here it's the classic
two-pass DataFrame formulation:

  1. ``build_text_index`` — one scan producing postings (doc, term, tf)
     and doc lengths; at scale this is computed ONCE and persisted
     (partitioned by term) — the Spark analog of the engine's text index.
  2. ``bm25_scores`` — for a query, join the (tiny, broadcast) term list
     against the postings, aggregate per doc. One narrow shuffle on doc id.

Okapi BM25: idf = ln((N - df + 0.5)/(df + 0.5) + 1),
tf_norm = tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)), k1=1.2, b=0.75.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize(text: Column | str) -> Column:
    """Lowercase alnum tokenizer shared with the DuckDB oracle
    (regexp split on non-alphanumeric runs)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


@dataclass
class TextIndex:
    """Inverted-index DataFrames (the persisted "text index" S10)."""

    postings: DataFrame  # (id, term, tf)
    doclen: DataFrame  # (id, dl)
    n_docs: DataFrame  # single row (n)

    def persist(self) -> "TextIndex":
        return TextIndex(self.postings.cache(), self.doclen.cache(), self.n_docs.cache())


def build_text_index(docs: DataFrame, id_col: str, text_col: str) -> TextIndex:
    tokens = docs.select(
        F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("term")
    )
    # ONE tokenize pass (r12): doclen = Σ tf per doc derives from the
    # postings aggregate instead of a second explode over the corpus
    # (the former shape ran tokenize+explode twice — once per groupBy).
    # The lazy checkpoint materializes postings exactly once for its two
    # consumers (the BM25 term join and the doclen rollup) — postings IS
    # the table a deployment persists as the text index anyway; the
    # doclen shuffle is postings-sized (index rows), not token-sized.
    postings = tokens.groupBy("id", "term").agg(
        F.count("*").alias("tf")
    ).localCheckpoint(eager=False)
    doclen = postings.groupBy("id").agg(F.sum("tf").alias("dl"))
    n_docs = docs.select(F.count("*").alias("n"))
    return TextIndex(postings, doclen, n_docs)


def bm25_scores(
    index: TextIndex,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for the query terms → (id, bm25).

    Only documents containing ≥1 query term appear (BM25 candidates, as
    in the reference's hybrid path). The query-term list is a literal
    broadcast; the postings join prunes to those terms before any shuffle.
    """
    q = F.array(*[F.lit(t) for t in query_terms])
    matched = index.postings.where(F.array_contains(q, F.col("term")))
    df_t = matched.groupBy("term").agg(F.countDistinct("id").alias("df"))
    avgdl = index.doclen.select(F.avg("dl").alias("avgdl"))
    scored = (
        matched.join(F.broadcast(df_t), "term")
        .join(index.doclen, "id")
        .crossJoin(F.broadcast(index.n_docs))
        .crossJoin(F.broadcast(avgdl))
        .withColumn(
            "idf",
            F.log(
                (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "tf_norm",
            F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy("id").agg(F.sum(F.col("idf") * F.col("tf_norm")).alias("bm25"))


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "id",
    rank_a: str = "rank_a",
    rank_b: str = "rank_b",
    rrf_k: int = 1,
) -> DataFrame:
    """W5 — reciprocal-rank fusion of two ranked candidate lists
    (reference `search/vector.py:123-132`, rrf_k=1).

    Inputs carry 1-based rank columns; output: (id, rrf) where missing
    membership contributes 0. Full-outer join on id (both lists are
    already top-N small)."""
    a = ranked_a.select(F.col(id_col).alias("id"), F.col(rank_a).alias("_ra"))
    b = ranked_b.select(F.col(id_col).alias("id"), F.col(rank_b).alias("_rb"))
    fused = a.join(b, "id", "full_outer").select(
        "id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("_ra")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("_rb")), F.lit(0.0))
        ).alias("rrf"),
    )
    return fused


def rank_by(
    df: DataFrame, score: Column, id_col: str, rank_name: str, limit: int = 1000
) -> DataFrame:
    """1-based positional ranking (row_number, deterministic id
    tie-break) — the reference fuses positional ranks from its engine's
    already-sorted candidate lists (`search/vector.py:123-132`).

    The unpartitioned window is intentional *and bounded*: RRF inputs are
    top-N candidate lists, never full tables. ``limit`` enforces that —
    the TakeOrderedAndProject cap runs first, so at most ``limit`` rows
    ever reach the single-task window. Raise it consciously if a fusion
    ever needs more than 1000 candidates per source.
    """
    capped = df.orderBy(score.desc(), F.col(id_col).asc()).limit(limit)
    w = Window.orderBy(score.desc(), F.col(id_col).asc())
    return capped.withColumn(rank_name, F.row_number().over(w))
