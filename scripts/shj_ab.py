#!/usr/bin/env python
"""Interleaved A/B of spark.sql.join.preferSortMergeJoin at full core count.

Round-13 item 1: the driver's 32-core r12 draw collapsed the five
join-heavy rows (lpa_distributed 5x, cc_distributed 3.2x, graph_metrics
2.9x, betweenness_distributed 1.8x, pagerank_distributed 1.5x) while the
8-core run of the same code matched r11 — prime suspect is the
session-global preferSortMergeJoin=false flip (session.py).  The conf is
a runtime SQL conf, so this harness alternates true/false per repetition
WITHIN one 32-core session (order swapped every round to cancel drift)
and prints min/median per (query, conf) with /proc/stat brackets, the
only A/B design the box's stall noise respects.

Usage:
    python scripts/shj_ab.py [-n N] [query ...]     # default: the 5 loop rows
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_QUERIES = [
    "lpa_distributed",
    "cc_distributed",
    "graph_metrics",
    "betweenness_distributed",
    "pagerank_distributed",
]


def _stat():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def main() -> None:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    names = args or DEFAULT_QUERIES

    from grafeo_memory_spark.session import get_spark
    import __spark_entry__ as entrymod
    from grafeo_memory_spark.queries import BENCH_EXTRAS

    spark = get_spark(app_name="shj_ab")
    queries = dict(entrymod.queries())
    queries.update(BENCH_EXTRAS)

    def execute(name, conf):
        spark.conf.set("spark.sql.join.preferSortMergeJoin", conf)
        spark.sparkContext.setJobDescription(f"{name} smj={conf}")
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    tiny = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    results: dict[tuple[str, str], list[float]] = {}
    for name in names:
        if os.path.isdir(tiny):
            try:
                execute(name, "true")  # warm codegen/plans
            except Exception:
                pass
        a = _stat()
        for r in range(n):
            order = ["true", "false"] if r % 2 == 0 else ["false", "true"]
            for conf in order:
                results.setdefault((name, conf), []).append(execute(name, conf))
        b = _stat()
        d = [y - x for x, y in zip(a, b)]
        tot = sum(d) or 1
        for conf in ("true", "false"):
            runs = results[(name, conf)]
            print(
                f"{name:26s} smj={conf:5s} min={min(runs):6.2f} "
                f"med={statistics.median(runs):6.2f} runs={[round(x, 2) for x in runs]}",
                flush=True,
            )
        print(
            f"{name:26s} sweep sys%={100 * d[2] / tot:.0f} steal%={100 * d[7] / tot:.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
