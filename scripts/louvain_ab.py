#!/usr/bin/env python
"""Interleaved A/B for the r11 Louvain quotient-carry: time the FORCED
phase-1 coarsening path (min_distributed_rounds=N) at sf0.1 — the
carry only changes the coarsening loop, so the forced path is where
the delta lives (the default path collects straight to the driver).

Timing two trees (an old-commit worktree vs HEAD) in one driver
process is impossible, so this script times ONE tree per invocation;
interleave by alternating AB_TREE:

    git worktree add /tmp/ab_old <old-commit>
    for i in 1 2 3; do
      AB_TREE=/tmp/ab_old python scripts/louvain_ab.py 2
      python scripts/louvain_ab.py 2
    done
    git worktree remove /tmp/ab_old

AB_REPL=N replicates the edges as disjoint copies. Prints one JSON
line {"tree": ..., "rounds": N, "secs": [...]} with AB_REPS
measurements after one warm-up.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPS = int(os.environ.get("AB_REPS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# AB_TREE picks the package tree to time (default: this repo)
sys.path.insert(
    0,
    os.environ.get(
        "AB_TREE",
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ),
)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from pyspark.sql import functions as F

    from grafeo_memory_spark.graph.algorithms import louvain
    from grafeo_memory_spark.session import get_spark
    from grafeo_memory_spark.sources.tables import load_fixture

    spark = get_spark(app_name="louvain-ab")
    edges = (
        load_fixture(spark, SF_DIR, "edges")
        .where(F.col("edge_type") == "RELATION")
        .localCheckpoint()
    )
    # AB_REPL=N times the edges as disjoint copies — the quotient (and
    # the old path's per-round full-edge joins) scale with N
    repl = int(os.environ.get("AB_REPL", "1"))
    if repl > 1:
        parts = [
            edges.select(
                (F.col("src") + F.lit(i * 100_000_000)).alias("src"),
                (F.col("dst") + F.lit(i * 100_000_000)).alias("dst"),
            )
            for i in range(repl)
        ]
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        edges = out.localCheckpoint()
    secs = []
    for i in range(REPS + 1):
        t0 = time.perf_counter()
        louvain(
            edges, max_iter=10, min_distributed_rounds=rounds
        ).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if i:  # drop the warm-up
            secs.append(round(dt, 3))
    import grafeo_memory_spark

    print(json.dumps({
        "tree": os.path.dirname(os.path.dirname(grafeo_memory_spark.__file__)),
        "rounds": rounds,
        "secs": secs,
    }))


if __name__ == "__main__":
    main()
