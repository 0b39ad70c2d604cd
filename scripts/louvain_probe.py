#!/usr/bin/env python
"""Louvain pre-coarsening probe (VERDICT r6 item 9): measure the cost
and quality of ``min_distributed_rounds=1`` against the default at
bench scale, so the "second-level quotient" knob carries a number.

``min_distributed_rounds=1`` forces one distributed heavy-edge-matching
round before the quotient graph is collected — the configuration for
deployments where even the raw quotient is too wide for the driver.
Every forced merge strictly increases modularity, so quality should
land within noise of the default; the cost is the extra round's
scheduling. This probe runs both configurations on the sf0.1 RELATION
edge set (after a shared warm-up) and prints ONE JSON line:

    {"probe": "louvain_rounds", "sf_dir": ..., "edges": E,
     "default": {"sec": ..., "modularity": ..., "communities": ...},
     "rounds1": {...}, "modularity_delta": ...}

Run: python scripts/louvain_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from grafeo_memory_spark.graph.algorithms import louvain, modularity
    from grafeo_memory_spark.session import get_spark
    from grafeo_memory_spark.sources.tables import fixtures_dir

    spark = get_spark(app_name="louvain-probe")
    edges = (
        spark.read.parquet(os.path.join(fixtures_dir(SF_DIR), "edges.parquet"))
        .where(F.col("edge_type") == "RELATION")
        .select("src", "dst")
        .localCheckpoint()
    )
    n_edges = edges.count()

    def run(rounds: int) -> dict:
        t0 = time.monotonic()
        labels = louvain(edges, min_distributed_rounds=rounds)
        n_comm = labels.select("community").distinct().count()
        sec = time.monotonic() - t0
        q = modularity(edges, labels)
        return {
            "sec": round(sec, 3),
            "modularity": round(q, 6),
            "communities": n_comm,
        }

    run(0)  # warm-up: codegen + checkpoint paths, result discarded
    default = run(0)
    rounds1 = run(1)
    print(
        json.dumps(
            {
                "probe": "louvain_rounds",
                "sf_dir": SF_DIR,
                "edges": n_edges,
                "default": default,
                "rounds1": rounds1,
                "modularity_delta": round(
                    rounds1["modularity"] - default["modularity"], 6
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
