"""Benchmark decontamination for LLM training corpora (builder brief):
remove training documents that overlap an evaluation/benchmark set via
exact word n-gram collision — the GPT-3 (Brown et al. 2020 §C) /
PaLM-style filter run before any corpus ships to training.

Semantics: a training document is *contaminated* when at least
``min_matches`` of its word n-grams (default n=13, the commonly cited
value) also occur anywhere in the benchmark set. Documents (and
benchmark entries) shorter than n words fall back to their full
normalized text as the single n-gram, so short eval answers still
match verbatim copies. Tokenization and hashing reuse the portable
conventions from :mod:`grafeo_memory_spark.pipeline.dedup`
(``normalize_text`` + ``word_shingles`` + 60-bit md5 ``shingle_hash``),
so a DuckDB/SQL oracle can replay the whole filter bit-identically.

Scale design — the 100 TB side never shuffles:
- The benchmark set is eval-sized (thousands..millions of rows), so its
  distinct n-gram hashes are collected into a ``broadcast()`` side —
  typically a few MB.
- The corpus side is ONE map-only pass (r12): explode the n-gram
  hashes, broadcast LEFT join against the benchmark hashes, and count
  total and matched grams in a single partial-aggregating groupBy — the
  shuffle carries one partially-aggregated row per document (clean docs
  included), never rows per gram and never corpus text.
  ``decontaminate`` then keeps clean docs with a broadcast anti-join on
  ids; the parquet scan keeps its pushed filters and pruned schema.
- Joining on the 60-bit hash (not the shingle string) keeps the
  broadcast small and the probe cheap; at 13 words/gram a false
  collision needs a 2^-60 hash clash AND would only ever *remove* a
  training doc — the safe direction for decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.dedup import shingle_hash, word_shingles

__all__ = [
    "benchmark_ngram_hashes",
    "contamination_matches",
    "decontaminate",
]

#: n-gram width used by the published GPT-3 decontamination filter.
DEFAULT_N = 13


def benchmark_ngram_hashes(
    benchmark: DataFrame, text_col: str, *, n: int = DEFAULT_N
) -> DataFrame:
    """Distinct 60-bit n-gram hashes of the benchmark set as a
    single-column DataFrame ``(bench_h: long)`` — the broadcast side of
    the contamination join."""
    return (
        benchmark.select(
            F.explode(word_shingles(text_col, n)).alias("_g")
        )
        .select(shingle_hash(F.col("_g"), 0).alias("bench_h"))
        .distinct()
    )


def contamination_matches(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    n: int = DEFAULT_N,
) -> DataFrame:
    """Per-document contamination evidence: ``(id, matched_ngrams,
    total_ngrams, matched_fraction)`` for every doc with ≥1 benchmark
    n-gram hit. Map-only explode + broadcast semi-join + count."""
    bench = benchmark_ngram_hashes(
        benchmark, bench_text_col or text_col, n=n
    )
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, n)).alias("_g"),
    ).select("id", shingle_hash(F.col("_g"), 0).alias("_h"))
    # ONE corpus pass (r12): a broadcast LEFT join flags each gram and a
    # single partial-aggregating groupBy counts matched and total
    # together — the former two-query shape (hits groupBy, then a semi-
    # join + second groupBy for totals) ran the explode + md5 gram scan
    # over the corpus TWICE. The shuffle stays one ~16-byte row per doc
    # per map task (partial aggregation), so counting totals for clean
    # docs costs shuffle bytes ~|docs|, while the saved second scan is
    # O(corpus text) — the dominant term at any scale.
    return (
        grams.join(
            F.broadcast(bench), grams["_h"] == bench["bench_h"], "left"
        )
        .groupBy("id")
        .agg(
            F.count("bench_h").alias("matched_ngrams"),
            F.count("*").alias("total_ngrams"),
        )
        .where(F.col("matched_ngrams") >= 1)
        .select(
            "id",
            "matched_ngrams",
            "total_ngrams",
            (F.col("matched_ngrams") / F.col("total_ngrams")).alias(
                "matched_fraction"
            ),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str,
    id_col: str,
    bench_text_col: str | None = None,
    n: int = DEFAULT_N,
    min_matches: int = 1,
) -> DataFrame:
    """Drop every training doc with ≥ ``min_matches`` benchmark n-gram
    collisions; returns the clean corpus with its original schema.

    The contaminated-id set is bounded by the corpus×benchmark overlap
    (tiny in practice), so the final keep is a broadcast anti-join —
    the corpus side stays map-only end to end."""
    dirty = (
        contamination_matches(
            docs,
            benchmark,
            text_col=text_col,
            id_col=id_col,
            bench_text_col=bench_text_col,
            n=n,
        )
        .where(F.col("matched_ngrams") >= min_matches)
        .select(F.col("id").alias(id_col))
    )
    return docs.join(F.broadcast(dirty), id_col, "left_anti")
