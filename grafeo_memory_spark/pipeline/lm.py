"""N-gram language-model perplexity filtering (CCNet-style) for corpus
curation.

CCNet (Wenzek et al., 2020) scores every document with a small language
model trained on a trusted corpus and keeps the low-perplexity "head"
of the distribution. This module is that stage re-expressed Spark-first
with a word-bigram Lidstone-smoothed LM so every step stays in
codegen'd Column expressions and broadcast hash joins:

- ``lm_train``: one explode + two keyed aggregations over the trusted
  corpus; the vocabulary is pruned to the top ``max_vocab`` words and
  observed bigrams to the top ``max_bigrams`` rows (count desc, then
  lexicographic — deterministic), so the trained model is always
  broadcast-sized regardless of corpus size. Out-of-vocabulary words
  collapse to ``<unk>`` *before* bigram counting — via broadcast hash
  joins against the vocab (O(1) per token), never an ``array_contains``
  scan over a vocabulary literal — so training and scoring see the
  same event space.
- ``lm_perplexity``: scoring is map-only over the corpus — the pruned
  model (vocab + context totals + bigram counts) is broadcast, each
  document explodes to its adjacent word pairs, per-pair
  ``-log P(w2|w1)`` is computed in codegen, and the per-document
  average folds back through partial aggregation (the shuffle carries
  one row per document, never per token, because a document's tokens
  live in one input row). Unpruned bigrams back off to the smoothed
  floor ``alpha / (c(ctx) + alpha*V)`` — the same bounded-state
  trade-off KenLM makes with count pruning.
- ``ccnet_buckets``: head/middle/tail split on perplexity, either at
  explicit thresholds or at quantiles estimated with
  ``approxQuantile`` (mergeable sketch — one pass, no global sort; the
  standard scale substitute for an exact ntile window, which would
  funnel every row through a single partition).

Smoothing: P(w2|w1) = (c(w1,w2) + alpha) / (c(w1) + alpha*V) with
V = |vocab| + 1 (the ``<unk>`` event). Documents with fewer than two
tokens score NULL (no bigram evidence).

Reference parity note: the reference has no LM stage (its quality
gates are embedding-side); this is a builder-brief training-data
operator. Tokenization matches `pipeline/text_stats.py` so the same
DuckDB replay (regexp_split_to_array + list filter) applies.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.text_stats import _words

__all__ = [
    "LmModel",
    "UNK",
    "lm_train",
    "lm_scores",
    "lm_perplexity",
    "ccnet_buckets",
]

UNK = "<unk>"


@dataclass
class LmModel:
    """A trained bigram LM: three broadcast-sized DataFrames plus the
    smoothing constant. ``vocab_size`` counts ``<unk>``."""

    vocab: DataFrame  # (word, c_uni) — top max_vocab words
    contexts: DataFrame  # (w1, c_ctx) — bigram-context totals, incl <unk>
    bigrams: DataFrame  # (w1, w2, c_bi) — top max_bigrams observed pairs
    alpha: float
    vocab_size: int


def _pairs(col: Column | str) -> Column:
    """Adjacent word pairs of a document as an array<struct<w1,w2>>."""
    words = _words(col)
    n = F.greatest(F.size(words) - 1, F.lit(0))
    return F.zip_with(
        F.slice(words, 1, n),
        F.slice(words, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def _unk_mapped(pairs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Map both words of (w1, w2) rows to ``<unk>`` unless in-vocab,
    via two broadcast hash joins (map-only; no vocabulary literal in
    the plan, no per-token O(V) array scan)."""
    v1 = F.broadcast(
        vocab.select(F.col("word").alias("w1"), F.lit(1).alias("_in1"))
    )
    v2 = F.broadcast(
        vocab.select(F.col("word").alias("w2"), F.lit(1).alias("_in2"))
    )
    return (
        pairs.join(v1, "w1", "left")
        .join(v2, "w2", "left")
        .select(
            *[c for c in pairs.columns if c not in ("w1", "w2")],
            F.when(F.col("_in1") == 1, F.col("w1"))
            .otherwise(F.lit(UNK))
            .alias("w1"),
            F.when(F.col("_in2") == 1, F.col("w2"))
            .otherwise(F.lit(UNK))
            .alias("w2"),
        )
    )


def lm_train(
    df: DataFrame,
    text_col: str = "text",
    max_vocab: int = 50_000,
    max_bigrams: int = 200_000,
    alpha: float = 0.1,
) -> LmModel:
    """Train a pruned word-bigram LM on a trusted corpus.

    Shapes at scale: one explode + groupBy(word) for unigrams with a
    map-side top-``max_vocab`` take (TakeOrderedAndProject — no full
    sort shuffle), then one explode + groupBy(pair) for bigrams with
    the vocabulary applied through broadcast joins before counting.
    Every returned table is bounded by the prune knobs, never by the
    corpus.
    """
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    words = df.select(F.explode(_words(text_col)).alias("word"))
    vocab = (
        words.groupBy("word")
        .agg(F.count("*").alias("c_uni"))
        .orderBy(F.desc("c_uni"), F.asc("word"))
        .limit(max_vocab)
    ).localCheckpoint(eager=True)

    pairs = df.select(F.explode(_pairs(text_col)).alias("p")).select(
        "p.w1", "p.w2"
    )
    counted = (
        _unk_mapped(pairs, vocab)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_bi"))
    ).localCheckpoint(eager=True)
    contexts = counted.groupBy("w1").agg(F.sum("c_bi").alias("c_ctx"))
    bigrams = counted.orderBy(
        F.desc("c_bi"), F.asc("w1"), F.asc("w2")
    ).limit(max_bigrams)
    n_vocab = vocab.count() + 1  # + <unk>
    return LmModel(vocab, contexts, bigrams, alpha, n_vocab)


def lm_scores(
    df: DataFrame,
    model: LmModel,
    text_col: str = "text",
    id_col: str = "id",
) -> DataFrame:
    """The scoring core of :func:`lm_perplexity`: one row per input
    row, ``(id_col, lm_nll, lm_bigrams, lm_ppl)``, NULL metrics for
    documents with fewer than two tokens.

    ``explode_outer`` keeps short documents through the aggregation
    (they emit a single NULL-pair row that scores NULL), so the output
    already covers EVERY document — a consumer that only needs the id
    and the scores (the `lm_perplexity` bench query) can read this
    frame directly instead of paying the corpus-keyed join back onto
    ``df`` plus a second scan of the document table (optimization guide
    §2.4: remove the shuffle outright).

    Plan: (id, pair)-explode → broadcast hash joins for the ``<unk>``
    map, the pruned bigram counts, and the context totals (all
    model-sized) → per-pair nll in codegen → groupBy(id) where partial
    aggregation collapses each document to one row before the shuffle.
    The corpus is never shuffled at token granularity.
    """
    a, v = model.alpha, float(model.vocab_size)
    pairs = df.select(
        F.col(id_col).alias("_lm_id"),
        F.explode_outer(_pairs(text_col)).alias("p"),
    ).select(
        "_lm_id",
        "p.w1",
        "p.w2",
        # pre-<unk>-mapping pair marker: _unk_mapped coalesces a NULL
        # word to '<unk>', which would give the outer-exploded
        # short-doc row a real score — remember which rows carried an
        # actual bigram before the mapping destroys the NULL
        F.col("p").isNotNull().alias("_has_pair"),
    )
    joined = (
        _unk_mapped(pairs, model.vocab)
        .join(
            F.broadcast(model.bigrams.withColumnRenamed("c_bi", "_c_bi")),
            ["w1", "w2"],
            "left",
        )
        .join(
            F.broadcast(model.contexts.withColumnRenamed("c_ctx", "_c_ctx")),
            ["w1"],
            "left",
        )
        .select(
            "_lm_id",
            F.when(
                F.col("_has_pair"),
                -F.log(
                    (F.coalesce(F.col("_c_bi"), F.lit(0)).cast("double") + a)
                    / (
                        F.coalesce(F.col("_c_ctx"), F.lit(0)).cast("double")
                        + a * v
                    )
                ),
            ).alias("nll"),
        )
    )
    return joined.groupBy("_lm_id").agg(
        F.avg("nll").alias("lm_nll"),
        # count("nll") skips the NULL marker rows; a short doc's count
        # of 0 surfaces as NULL, matching the no-evidence contract
        F.when(F.count("nll") > 0, F.count("nll")).alias("lm_bigrams"),
    ).select(
        F.col("_lm_id").alias(id_col),
        "lm_nll",
        "lm_bigrams",
        F.exp("lm_nll").alias("lm_ppl"),
    )


def lm_perplexity(
    df: DataFrame,
    model: LmModel,
    text_col: str = "text",
    id_col: str = "id",
) -> DataFrame:
    """Score every document: appends ``lm_nll`` (average negative
    log-probability per bigram, natural log), ``lm_ppl``
    (exp(lm_nll)), and ``lm_bigrams`` (bigram count) to ``df``.
    Documents with fewer than two tokens get NULLs.

    Thin wrapper over :func:`lm_scores` (see there for the plan shape)
    that joins the score frame back onto ``df`` so every passthrough
    column survives; the join is 1:1 on ``id_col``. Consumers that
    only need (id, scores) should read :func:`lm_scores` directly and
    skip this join.
    """
    scores = lm_scores(df, model, text_col=text_col, id_col=id_col)
    sc = scores.withColumnRenamed(id_col, "_lm_id")
    return df.join(
        sc, df[id_col] == sc["_lm_id"], "left"
    ).drop("_lm_id")


def ccnet_buckets(
    df: DataFrame,
    ppl_col: str = "lm_ppl",
    head: float = 0.33,
    tail: float = 0.67,
    thresholds: tuple[float, float] | None = None,
    relative_error: float = 0.0001,
) -> DataFrame:
    """CCNet head/middle/tail split on perplexity.

    Appends ``lm_bucket`` ∈ {'head','middle','tail', NULL}: head =
    lowest-perplexity fraction ``head``, tail = above quantile
    ``tail``. Pass explicit ``thresholds=(t_head, t_tail)`` for a
    fully deterministic split; otherwise the cut points come from
    ``approxQuantile`` (one-pass mergeable sketch — no single-partition
    window at 100 TB).
    """
    if thresholds is None:
        t_head, t_tail = df.approxQuantile(
            ppl_col, [head, tail], relative_error
        )
    else:
        t_head, t_tail = thresholds
    c = F.col(ppl_col)
    return df.withColumn(
        "lm_bucket",
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(c <= t_head, F.lit("head"))
        .when(c > t_tail, F.lit("tail"))
        .otherwise(F.lit("middle")),
    )
