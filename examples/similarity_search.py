"""Similarity search tiers — exact kNN, LSH buckets, IVF lists, and
int8-quantized storage over an embedding column (this engine's
Spark-native extension beyond the reference surface).

Run: python examples/similarity_search.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from grafeo_memory_spark.functions.vector import knn
from grafeo_memory_spark.pipeline.ann import (
    dequantize_int8,
    ivf_assign,
    ivf_topk,
    ivf_train,
    quantize_int8,
)
from grafeo_memory_spark.session import get_spark


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = spark or get_spark(app_name="similarity-search")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in
          emb.where(F.col("vec_id") == 0).collect()[0]["embedding"]]

    print("exact brute-force top-5 (map-only scan + TakeOrdered):")
    for r in knn(emb, qv, k=5).collect():
        print(f"  vec {r['vec_id']}: {r['sim']:.4f}")

    print("\nIVF (Lloyd-trained codebook, nprobe=4/16 lists):")
    cents = ivf_train(emb, 16, iterations=2)
    assigned = ivf_assign(emb, cents)
    for r in ivf_topk(assigned, cents, qv, k=5, nprobe=4).collect():
        print(f"  vec {r['id']}: {r['sim']:.4f}")

    print("\nint8 quantization (4x smaller) — round-trip fidelity:")
    fidelity = (
        emb.select(
            F.avg(
                F.aggregate(
                    F.zip_with(
                        "embedding",
                        dequantize_int8(quantize_int8("embedding")),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("mse")
        ).collect()[0]["mse"]
    )
    print(f"  mean squared reconstruction error: {fidelity:.2e}")

    # product quantization: 64 doubles → 4 bytes per vector; top-k by
    # asymmetric distance (query-side lookup table, no vector math on
    # the table side) — the memory-bound billion-vector scan
    from grafeo_memory_spark.pipeline.ann import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    books = pq_train(emb, m=4, k=16, iterations=2)
    codes = pq_encode(emb, books)
    print("\nPQ ADC top-5 (4-byte codes):")
    for r in pq_adc_topk(codes, books, qv, k=5).collect():
        print(f"  vec {r['id']}: dist {r['dist']:.4f}")

    # semantic dedup (SemDeDup): cluster on the IVF codebook, drop
    # within-cluster near-duplicates, keep the farthest-from-centroid
    # member of each duplicate group
    from grafeo_memory_spark.pipeline.dedup import semdedup

    survivors = semdedup(emb, cents, eps=0.35)
    print(f"\nSemDeDup: {emb.count()} vectors -> "
          f"{survivors.count()} semantic survivors (eps=0.35)")

    # hard-negative mining: per anchor, the most-similar vectors with
    # a DIFFERENT label — the impostors a contrastive loss needs
    from grafeo_memory_spark.pipeline.ann import hard_negatives

    anchors = emb.where(F.col("vec_id").isin([0, 1]))
    print("\nhard negatives (top-3 per anchor, label-mismatched):")
    for r in hard_negatives(emb, anchors, k=3).orderBy(
        "probe_id", "rank"
    ).collect():
        print(f"  anchor {r['probe_id']} #{r['rank']}: "
              f"vec {r['id']} sim {r['sim']:.4f}")


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
