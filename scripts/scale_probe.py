#!/usr/bin/env python
"""Scale probe: run the headline corpus operators at 1× and N× the
sf0.1 documents table (ids remapped per replica, so dedup can't
collapse the copies) and report per-op wall-clock plus the observed
scaling exponent — evidence that the plans behave linearly, not
quadratically, as data grows toward cluster scale.

An exponent near 1.0 means doubling the data doubles the time (scan/
shuffle bound — what every op here is designed to be); meaningfully
above 1 flags a pair blowup or driver bottleneck. The probe prints one
JSON line like bench.py.

Run: python scripts/scale_probe.py [N]   (default 4)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _execute(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from pyspark.sql import functions as F

    from grafeo_memory_spark.pipeline.decontamination import decontaminate
    from grafeo_memory_spark.pipeline.dedup import (
        dedup_spans_global,
        exact_dedup,
        near_dup_pairs_minhash,
    )
    from grafeo_memory_spark.pipeline.sampling import stratified_sample
    from grafeo_memory_spark.session import get_spark
    from grafeo_memory_spark.sources.tables import load_table, spread

    spark = get_spark(app_name="scale-probe")
    base = spread(load_table(spark, SF_DIR, "documents")).localCheckpoint()
    n_docs = base.count()

    def replicate(times: int):
        """times copies with disjoint ids and per-copy text salt (so
        near-dup work scales with data instead of collapsing)."""
        parts = []
        for i in range(times):
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(f" replica{i}")).alias(
                        "text"
                    ),
                    "source",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.localCheckpoint()

    bench = base.orderBy("doc_id").limit(10).select(
        F.col("text").alias("prompt")
    ).localCheckpoint()

    ops = {
        "exact_dedup": lambda df: exact_dedup(df, "text", "doc_id"),
        "near_dup_pairs": lambda df: near_dup_pairs_minhash(
            df, "text", "doc_id", jaccard_threshold=0.5
        ),
        "span_dedup": lambda df: dedup_spans_global(
            df, "text", "doc_id", span=5, sep=" "
        ),
        "decontaminate": lambda df: decontaminate(
            df, bench, text_col="text", id_col="doc_id",
            bench_text_col="prompt",
        ),
        "stratified_sample": lambda df: stratified_sample(
            df, "source", {"src0": 0.5, "src1": 0.5}, id_col="doc_id"
        ),
    }

    small = replicate(1)
    large = replicate(n)
    # warm both inputs and the codegen paths
    _execute(small)
    _execute(large)

    out: dict[str, dict] = {}
    for name, fn in ops.items():
        _execute(fn(small))  # warm-up run
        t0 = time.perf_counter()
        _execute(fn(small))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        _execute(fn(large))
        tn = time.perf_counter() - t0
        exponent = math.log(max(tn, 1e-9) / max(t1, 1e-9)) / math.log(n)
        out[name] = {
            "sec_1x": round(t1, 3),
            f"sec_{n}x": round(tn, 3),
            "scaling_exponent": round(exponent, 3),
        }

    print(json.dumps({
        "metric": "corpus_op_scaling",
        "sf_dir": SF_DIR,
        "docs_1x": n_docs,
        "replicas": n,
        "ops": out,
    }))


if __name__ == "__main__":
    main()
