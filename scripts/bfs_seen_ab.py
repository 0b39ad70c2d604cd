#!/usr/bin/env python
"""Interleaved A/B: Brandes forward-BFS sentinel set = full visited
union (pre-r13 shape, SPARK_GRAFT_BFS_SEEN_ALL=1) vs last-two-levels
window (r13). Undirected-graph invariant: a neighbor of a depth-(d-1)
node has depth in {d-2, d-1, d}, so excluding levels d-1 and d-2
discards exactly what the full union would — the window is an
equivalence, not an approximation; parity is asserted inside the run.

Usage: python scripts/bfs_seen_ab.py [-n N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _stat():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def main() -> None:
    args = sys.argv[1:]
    n_rounds = 5
    if args and args[0] == "-n":
        n_rounds = int(args[1])

    from grafeo_memory_spark.session import get_spark
    from grafeo_memory_spark.queries import BENCH_EXTRAS

    spark = get_spark(app_name="bfs_seen_ab")
    fn = BENCH_EXTRAS["betweenness_distributed"]

    def run(flag: str):
        os.environ["SPARK_GRAFT_BFS_SEEN_ALL"] = flag
        spark.sparkContext.setJobDescription(f"bfs_seen_ab seen_all={flag}")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # parity first: both variants' full result, compared exactly
    def rows(flag: str):
        os.environ["SPARK_GRAFT_BFS_SEEN_ALL"] = flag
        return {
            r["node_id"]: r["betweenness"] for r in fn(spark, SF_DIR).collect()
        }

    a, b = rows("1"), rows("0")
    assert a.keys() == b.keys(), "node set mismatch"
    worst = max(abs(a[k] - b[k]) for k in a) if a else 0.0
    print(f"parity: {len(a)} rows, max |delta| = {worst:.3e}", flush=True)
    assert worst < 1e-12, worst

    results = {"all": [], "window": []}
    stat_a = _stat()
    for r in range(n_rounds):
        order = (
            [("all", "1"), ("window", "0")]
            if r % 2 == 0
            else [("window", "0"), ("all", "1")]
        )
        for name, flag in order:
            results[name].append(run(flag))
    stat_b = _stat()
    d = [y - x for x, y in zip(stat_a, stat_b)]
    tot = sum(d) or 1
    for name in ("all", "window"):
        runs = results[name]
        print(
            f"{name:7s} min={min(runs):6.2f} med={statistics.median(runs):6.2f} "
            f"runs={[round(x, 2) for x in runs]}",
            flush=True,
        )
    print(f"sweep sys%={100 * d[2] / tot:.0f} steal%={100 * d[7] / tot:.0f}")


if __name__ == "__main__":
    main()
