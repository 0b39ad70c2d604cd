"""Streaming corpus dedup — continuous ingest with the watermarked
exact tier and the incremental MinHash/LSH near-dup sink (this
engine's Spark-native extension beyond the reference surface).

Run: python examples/streaming_dedup.py
"""

from __future__ import annotations

import tempfile

from grafeo_memory_spark.session import get_spark
from grafeo_memory_spark.streaming.dedup import (
    DOC_STREAM_SCHEMA,
    run_incremental_dedup_stream,
)

T0 = 1_700_000_000_000


def main(spark=None) -> None:
    spark = spark or get_spark(app_name="streaming-dedup")
    workdir = tempfile.mkdtemp(prefix="stream_dedup_")
    src, ckpt = f"{workdir}/in", f"{workdir}/ckpt"

    def write_batch(rows):
        spark.createDataFrame(
            [dict(doc_id=i, ts=t, text=x) for i, t, x in rows],
            DOC_STREAM_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(src)

    alpha = "the quick brown fox jumps over the lazy dog again and again"
    write_batch([(1, T0, alpha),
                 (2, T0 + 1, "colorless green ideas sleep furiously")])
    sink = run_incremental_dedup_stream(spark, src, ckpt)
    print("batch 1 survivors:",
          sorted(r["doc_id"] for r in sink.survivors(spark).collect()))

    # a near-copy arrives later — suppressed against the stored corpus
    write_batch([(10, T0 + 60_000, alpha.replace("lazy", "sleepy")),
                 (11, T0 + 60_001, "a genuinely new document entirely")])
    sink = run_incremental_dedup_stream(spark, src, ckpt)
    print("after batch 2:",
          sorted(r["doc_id"] for r in sink.survivors(spark).collect()),
          "(10 suppressed as a near-dup of 1)")


if __name__ == "__main__":
    main()
