"""Tokenization-side corpus prep: chunk documents into token-budget
windows, train a BPE tokenizer on the corpus, encode to ids, pack the
chunks into fixed-budget training sequences, and screen a follow-up
batch through the Bloom incremental-dedup tier.

The pipeline shape that matters at scale: chunking and encoding are
map-only; BPE training's corpus-sized work is ONE word-count shuffle
whose result is type-sized; packing shards then packs in parallel; the
Bloom probe tests a new batch against the historical corpus with no
join at all.

Run: python examples/tokenize_pipeline.py [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.bloom import (
    bloom_build,
    bloom_might_contain,
)
from grafeo_memory_spark.pipeline.chunking import chunk_documents
from grafeo_memory_spark.pipeline.dedup import content_hash
from grafeo_memory_spark.pipeline.sampling import pack_greedy
from grafeo_memory_spark.pipeline.tokenizer import (
    bpe_decode,
    bpe_encode,
    bpe_train,
    word_counts,
)
from grafeo_memory_spark.session import get_spark


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = spark or get_spark(app_name="tokenize-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print(f"corpus: {docs.count()} docs")

    # 1. chunk into 64-token windows with an 8-token stride overlap
    chunks = chunk_documents(
        docs.select("doc_id", "text"), max_tokens=64, overlap=8
    )
    print("chunks:", chunks.count())

    # 2. train BPE on the corpus word counts (one shuffle, type-sized
    #    result), then encode every chunk map-only
    model = bpe_train(word_counts(docs, "text"), n_merges=200)
    print(
        f"bpe: {len(model.merges)} merges, vocab {len(model.vocab)}"
    )
    encoded = bpe_encode(chunks, "chunk_text", model).withColumn(
        "n_tokens", F.size("token_ids")
    )
    sample = encoded.select("chunk_text", "token_ids").first()
    ids = list(sample["token_ids"])
    assert bpe_decode(ids, model) == " ".join(sample["chunk_text"].split())
    print(
        "round-trip ok; sample chunk -> "
        f"{len(ids)} ids (first 8: {ids[:8]})"
    )

    # 3. pack chunks into 512-token training sequences (sharded
    #    first-fit; deterministic)
    packed = pack_greedy(
        encoded.select(
            F.concat_ws(":", "doc_id", "chunk_idx").alias("chunk_id"),
            F.col("n_tokens").alias("length"),
        ),
        "length",
        512,
        id_col="chunk_id",
    )
    n_packs = packed.select("pack_id").distinct().count()
    print(f"packed into {n_packs} sequences of <=512 tokens")

    # 4. Bloom tier: a 'yesterday' filter over chunk content hashes
    #    screens today's batch map-only; only maybe-seen rows would go
    #    on to the exact anti-join tier
    keyed = chunks.withColumn("key", content_hash(F.col("chunk_text")))
    bloom = bloom_build(keyed, "key", fpp=0.01)
    batch = keyed.select("doc_id", "chunk_idx", "chunk_text", "key").limit(
        50
    ).unionByName(
        keyed.select(
            "doc_id",
            "chunk_idx",
            F.concat(F.lit("fresh "), "chunk_text").alias("chunk_text"),
        )
        .limit(30)
        .withColumn("key", content_hash(F.col("chunk_text")))
    )
    maybe_seen = batch.where(bloom_might_contain("key", bloom)).count()
    fresh = batch.count() - maybe_seen
    print(
        f"incremental tier: {fresh} guaranteed-new chunks skip the "
        f"anti-join; {maybe_seen} maybe-seen go to the exact tier"
    )


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
