#!/usr/bin/env python
"""Per-query micro-bench with noise-robust statistics.

The measurement box shows intermittent multi-second kernel-time stalls
(sys% spikes to 60%+ with near-zero steal), so a median of 3 — fine on
a quiet host — can be poisoned by two co-incident spikes. This harness
runs each named query N times (default 7) inside ONE session, prints
min / median / all runs, and brackets the sweep with /proc/stat deltas
so a polluted draw is visible instead of silently recorded.

Usage:
    python scripts/qbench.py [-n N] query [query ...]
    python scripts/qbench.py -n 5 all          # every registered query
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
    n = 7
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]

    from grafeo_memory_spark.session import get_spark
    import __spark_entry__ as entrymod
    from grafeo_memory_spark.queries import BENCH_EXTRAS

    spark = get_spark(app_name="qbench")
    queries = dict(entrymod.queries())
    queries.update(BENCH_EXTRAS)
    names = list(queries) if args == ["all"] else args

    def execute(df):
        df.write.format("noop").mode("overwrite").save()

    tiny = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    for name in names:
        if os.path.isdir(tiny):
            try:
                execute(queries[name](spark, tiny))  # warm codegen/plans
            except Exception:
                pass
        runs = []
        a = _stat()
        for _ in range(n):
            t0 = time.perf_counter()
            execute(queries[name](spark, SF_DIR))
            runs.append(time.perf_counter() - t0)
        b = _stat()
        d = [y - x for x, y in zip(a, b)]
        tot = sum(d) or 1
        print(
            f"{name:28s} min={min(runs):6.2f} med={statistics.median(runs):6.2f} "
            f"runs={[round(r, 2) for r in runs]} "
            f"sys%={100 * d[2] / tot:.0f} steal%={100 * d[7] / tot:.0f}"
        )


if __name__ == "__main__":
    main()
