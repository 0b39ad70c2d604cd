#!/usr/bin/env python
"""Phase-level timing of q_semdedup — documents where the row's time
goes so the 'left alone, intrinsic' audit call rests on a measurement
from this host, not only the r12 one. Phases: codebook (count +
collect), assignment checkpoint, pair join checkpoint, CC + reps +
final anti-join (the rest of the query, timed via noop).

Usage: python scripts/semdedup_phases.py [-n N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F


def main() -> None:
    n_rounds = 3
    if len(sys.argv) > 2 and sys.argv[1] == "-n":
        n_rounds = int(sys.argv[2])

    from grafeo_memory_spark.session import get_spark
    from grafeo_memory_spark.sources.tables import load_table
    from grafeo_memory_spark.functions.vector import l2_norm
    from grafeo_memory_spark.pipeline.ann import ivf_assign
    from grafeo_memory_spark.pipeline.dedup import semdedup

    spark = get_spark(app_name="semdedup_phases")
    sc = spark.sparkContext

    phases: dict[str, list[float]] = {}

    def timed(name, fn):
        sc.setJobDescription(f"semdedup:{name}")
        t0 = time.perf_counter()
        out = fn()
        phases.setdefault(name, []).append(time.perf_counter() - t0)
        return out

    for _ in range(n_rounds):
        emb = load_table(spark, SF_DIR, "embeddings")
        n_cent = timed(
            "codebook", lambda: min(max(8, emb.count() // 128), 100_000)
        )
        cents = timed(
            "collect_cents",
            lambda: [
                (i, [float(x) for x in r[0]])
                for i, r in enumerate(
                    emb.orderBy("vec_id")
                    .limit(n_cent)
                    .select("embedding")
                    .collect()
                )
            ],
        )
        scored = timed(
            "assign_ckpt",
            lambda: ivf_assign(
                emb, cents, vec_col="embedding", id_col="vec_id", with_sim=True
            )
            .withColumn("v_norm", l2_norm(F.col("v")))
            .localCheckpoint(eager=True),
        )
        # the full operator re-runs assignment; time the remainder as
        # (full run) separately so phases are additive-ish
        out = timed(
            "full_semdedup",
            lambda: semdedup(
                emb, cents, eps=0.35, vec_col="embedding", id_col="vec_id"
            )
            .select("vec_id", "label")
            .orderBy("vec_id"),
        )
        timed(
            "execute_noop",
            lambda: out.write.format("noop").mode("overwrite").save(),
        )

    for name, runs in phases.items():
        print(
            f"{name:14s} min={min(runs):6.2f} med={statistics.median(runs):6.2f} "
            f"runs={[round(x, 2) for x in runs]}"
        )


if __name__ == "__main__":
    main()
