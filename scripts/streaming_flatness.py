#!/usr/bin/env python
"""Per-batch wall-clock flatness of the streaming dedup sinks.

The constant-STATE claims (each batch writes O(batch) state rows, the
Bloom bitmap is fixed-size) are pytest-pinned, but per-batch TIME across
a long batch sequence had never been measured — a super-constant trend
(e.g. the corpus band table growing the `_vs_corpus` scan) would be
invisible to the replay/state tests. This driver feeds each sink
``n_batches`` equal-sized batches (10% of every later batch duplicates
batch 0, so corpus collisions actually exercise the vs-corpus path) and
times the foreachBatch body alone.

Reported per sink: the per-batch seconds, the median of the first and
last thirds, their ratio (flat ≈ 1.0), and a least-squares slope in
ms/batch. Prints one JSON line like bench.py.

Run: python scripts/streaming_flatness.py [n_batches] [batch_rows] [sinks]
(``sinks`` = optional comma-separated subset, e.g. ``simhash_sink`` —
re-draw one sink solo after a load spike instead of re-running all 3)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from grafeo_memory_spark.session import get_spark
    from grafeo_memory_spark.sources.tables import load_table, spread
    from grafeo_memory_spark.streaming.bloom_dedup import BloomDedupSink
    from grafeo_memory_spark.streaming.dedup import (
        IncrementalDedupSink,
        SimHashDedupSink,
    )

    spark = get_spark(app_name="streaming-flatness")
    docs = spread(load_table(spark, SF_DIR, "documents")).localCheckpoint()
    need = n_batches * batch_rows
    n_docs = docs.count()
    if not n_docs:
        raise SystemExit("documents table is empty")
    if n_docs < need:
        # replicate with disjoint ids so a long batch sequence is
        # possible at any sf. A suffix salt is NOT enough here: the
        # copies must be far from each other under BOTH MinHash-Jaccard
        # and SimHash-Hamming, or every later batch reads as a near-dup
        # of the corpus and the pair count grows quadratically by
        # construction (measured: simhash per-batch 27→60 s over 4
        # batches with a 3-char suffix salt). Rotating the alphabet per
        # replica rewrites every token, so replicas share no shingles
        # and the only cross-batch collisions are the injected ones.
        from functools import reduce

        alpha = "abcdefghijklmnopqrstuvwxyz"

        def _rot(i: int):
            k = i % 25 + 1 if i else 0
            return F.translate(
                F.col("text"),
                alpha + alpha.upper(),
                alpha[k:] + alpha[:k] + (alpha[k:] + alpha[:k]).upper(),
            )

        docs = reduce(
            lambda a, b: a.unionByName(b),
            [
                docs.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    _rot(i).alias("text"),
                    *[c for c in docs.columns if c not in ("doc_id", "text")],
                )
                for i in range(-(-need // n_docs))
            ],
        )
    ranked = (
        docs.withColumn(
            "_rn",
            F.row_number().over(Window.orderBy(F.col("doc_id").asc())) - 1,
        )
        .where(F.col("_rn") < need)
        .localCheckpoint()
    )
    if ranked.count() < need:
        raise SystemExit(
            f"need {need} docs, table has fewer — lower n_batches/batch_rows"
        )

    # batch i = rows [i*B, (i+1)*B); in batches i>0 the first 10% of
    # rows carry batch-0 TEXT under batch-i ids, so the vs-corpus path
    # drops real duplicates every batch instead of idling
    dup = max(1, batch_rows // 10)
    base_texts = (
        ranked.where(F.col("_rn") < dup)
        .select((F.col("_rn")).alias("_k"), F.col("text").alias("_dup_text"))
        .localCheckpoint()
    )

    def make_batch(i: int):
        b = ranked.where(
            (F.col("_rn") >= i * batch_rows)
            & (F.col("_rn") < (i + 1) * batch_rows)
        )
        if i > 0:
            b = (
                b.withColumn("_k", F.col("_rn") - i * batch_rows)
                .join(F.broadcast(base_texts), "_k", "left")
                .withColumn(
                    "text", F.coalesce(F.col("_dup_text"), F.col("text"))
                )
                .drop("_k", "_dup_text")
            )
        return b.drop("_rn").localCheckpoint()

    batches = [make_batch(i) for i in range(n_batches)]

    def drive(sink_factory) -> list[float]:
        root = tempfile.mkdtemp(prefix="flatness-")
        try:
            sink = sink_factory(
                os.path.join(root, "survivors"), os.path.join(root, "state")
            )
            times = []
            for i, b in enumerate(batches):
                t0 = time.perf_counter()
                sink(b, i)
                times.append(time.perf_counter() - t0)
            return times
        finally:
            shutil.rmtree(root, ignore_errors=True)

    sinks = {
        "minhash_sink": lambda s, st: IncrementalDedupSink(
            survivors_path=s, state_path=st
        ),
        "simhash_sink": lambda s, st: SimHashDedupSink(
            survivors_path=s, state_path=st
        ),
        "bloom_sink": lambda s, st: BloomDedupSink(
            survivors_path=s, state_path=st, expected_keys=need
        ),
    }

    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        unknown = only - sinks.keys()
        if unknown:
            raise SystemExit(f"unknown sinks: {sorted(unknown)}")
        sinks = {k: v for k, v in sinks.items() if k in only}

    out: dict[str, dict] = {}
    third = max(1, n_batches // 3)
    for name, factory in sinks.items():
        times = drive(factory)
        first = statistics.median(times[:third])
        last = statistics.median(times[-third:])
        n = len(times)
        xbar = (n - 1) / 2
        ybar = sum(times) / n
        slope = sum(
            (i - xbar) * (t - ybar) for i, t in enumerate(times)
        ) / sum((i - xbar) ** 2 for i in range(n))
        out[name] = {
            "batches": n,
            "batch_rows": batch_rows,
            "sec_first_third_median": round(first, 3),
            "sec_last_third_median": round(last, 3),
            "last_over_first": round(last / max(first, 1e-9), 3),
            "slope_ms_per_batch": round(slope * 1000, 2),
            "per_batch_sec": [round(t, 3) for t in times],
        }

    print(json.dumps({
        "metric": "streaming_dedup_flatness",
        "sf_dir": SF_DIR,
        "sinks": out,
    }))


if __name__ == "__main__":
    main()
