#!/usr/bin/env python
"""Count driver jobs (and stages) one query run schedules — the loop
rows' 'plan diff': their static plan is a select over a checkpointed
RDD, so per-run job count is where a driver-barrier removal shows up.

Usage: python scripts/job_count.py query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from grafeo_memory_spark.session import get_spark
    import __spark_entry__ as entrymod
    from grafeo_memory_spark.queries import BENCH_EXTRAS

    spark = get_spark(app_name="job-count")
    queries = dict(entrymod.queries())
    queries.update(BENCH_EXTRAS)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    for name in sys.argv[1:]:
        before_jobs = set(tracker.getJobIdsForGroup(None) or [])
        # run in a dedicated job group so the count is exact
        sc.setJobGroup(f"jc-{name}", name)
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        jobs = set(tracker.getJobIdsForGroup(f"jc-{name}") or [])
        n_stages = 0
        for j in jobs:
            info = tracker.getJobInfo(j)
            if info:
                n_stages += len(info.stageIds)
        print(
            f"{name:28s} jobs={len(jobs):3d} stages={n_stages:3d} "
            f"wall={dt:6.2f}s",
            flush=True,
        )
        sc.setJobGroup(None, None)


if __name__ == "__main__":
    main()
