"""Training-corpus dedup + quality pass — the LLM-data-pipeline
operators over the documents table (this engine's Spark-native
extension beyond the reference surface).

Exact dedup, MinHash/LSH near-dup pairs, SimHash fingerprints, and the
language/quality/token stats, each as one declarative plan that scales
to a cluster-sized corpus unchanged.

Run: python examples/corpus_dedup.py [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.dedup import (
    exact_dedup,
    near_dedup,
    near_dup_pairs_minhash,
    simhash16,
)
from grafeo_memory_spark.pipeline.text_stats import (
    lang_id,
    quality_score,
    token_count_bpe_ish,
)
from grafeo_memory_spark.session import get_spark


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = spark or get_spark(app_name="corpus-dedup")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print(f"corpus: {docs.count()} docs")

    survivors = exact_dedup(docs, "text", "doc_id")
    print("after exact dedup:", survivors.count())

    pairs = near_dup_pairs_minhash(
        docs, "text", "doc_id", jaccard_threshold=0.5
    ).limit(5)
    print("sample near-dup pairs (jaccard >= 0.5):")
    for r in pairs.collect():
        print(f"  {r['id_a']} ~ {r['id_b']}")

    # full fuzzy dedup: pairs → connected components → one canonical
    # survivor per duplicate cluster
    fuzzy = near_dedup(docs, "text", "doc_id", jaccard_threshold=0.5)
    print("after fuzzy dedup (cluster survivors):", fuzzy.count())

    from grafeo_memory_spark.pipeline.cleaning import gopher_quality_flags

    kept = docs.where(
        gopher_quality_flags("text", min_words=5).getField("keep")
    ).count()
    print(f"after Gopher quality filters: {kept}")

    # benchmark decontamination: drop docs sharing any 13-gram with the
    # eval set (here: snippets cut from the corpus itself, so some hit)
    from grafeo_memory_spark.pipeline.decontamination import decontaminate

    bench = docs.orderBy("doc_id").limit(10).select(
        F.substring("text", 30, 200).alias("prompt")
    )
    clean = decontaminate(
        docs, bench, text_col="text", id_col="doc_id",
        bench_text_col="prompt",
    )
    print("after benchmark decontamination:", clean.count())

    # C4-style global span dedup: repeated 3-line spans survive only at
    # their first occurrence corpus-wide
    from grafeo_memory_spark.pipeline.dedup import dedup_spans_global

    rewritten = dedup_spans_global(docs, "text", "doc_id")
    n_changed = (
        rewritten.alias("r")
        .join(docs.select("doc_id", F.col("text").alias("orig")), "doc_id")
        .where(F.col("r.text") != F.col("orig"))
        .count()
    )
    print(f"span dedup rewrote {n_changed} docs")

    # domain mixture: sample sources toward a target token share
    from grafeo_memory_spark.pipeline.sampling import mixture_sample
    from grafeo_memory_spark.pipeline.text_stats import token_count_ws

    with_tok = docs.withColumn("n_tok", token_count_ws("text"))
    weights = {
        r["source"]: 1.0
        for r in docs.select("source").distinct().collect()
    }
    mixed = mixture_sample(
        with_tok, "source", weights, id_col="doc_id", token_col="n_tok"
    )
    print("uniform-mixture sample:", mixed.count(), "docs")

    print("\nper-doc quality/fingerprint columns (first 3):")
    enriched = docs.select(
        "doc_id",
        lang_id("text").alias("lang_guess"),
        token_count_bpe_ish("text").alias("n_tokens"),
        F.round(quality_score("text"), 3).alias("quality"),
        simhash16("text").alias("simhash"),
    ).orderBy("doc_id").limit(3)
    for r in enriched.collect():
        print(f"  doc {r['doc_id']}: lang={r['lang_guess']} "
              f"tokens={r['n_tokens']} quality={r['quality']} "
              f"simhash={r['simhash']:#06x}")

    # CCNet-style LM filtering: train a pruned bigram LM on a trusted
    # slice, score every document map-only, split head/middle/tail
    from grafeo_memory_spark.pipeline.lm import (
        ccnet_buckets,
        lm_perplexity,
        lm_train,
    )

    model = lm_train(docs.where(F.col("source") == "src0"),
                     max_vocab=1000, max_bigrams=10_000)
    scored = ccnet_buckets(lm_perplexity(docs, model, id_col="doc_id"))
    print("\nCCNet perplexity buckets:")
    for r in scored.groupBy("lm_bucket").count().orderBy("lm_bucket").collect():
        print(f"  {r['lm_bucket']}: {r['count']}")

    # the whole recipe as ONE call: clean → quality → exact → fuzzy →
    # SemDeDup → decontaminate → mixture, with per-stage accounting
    # (the embeddings table's vec_id aligns with doc_id in the fixtures)
    from grafeo_memory_spark.pipeline.corpus import (
        CorpusRecipe,
        build_training_corpus,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    final, report = build_training_corpus(
        docs,
        benchmark=bench,
        bench_text_col="prompt",
        embeddings=emb,
        recipe=CorpusRecipe(min_words=5, semantic=True,
                            semantic_centroids=16, semantic_eps=0.35,
                            mixture={"src0": 0.5, "src1": 0.5}),
        count_stages=True,
    )
    print("\ncomposed recipe:")
    for stage in report.stages:
        before, after = report.rows[stage]
        print(f"  {stage:15s} {before} -> {after}")
    print("final corpus:", final.count(), "docs")


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
