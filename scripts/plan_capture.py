#!/usr/bin/env python
"""Capture `.explain("formatted")` for every registered driver query
(plus the BENCH_EXTRAS scale shapes) into plans/<tag>/<query>_<suffix>.txt.

Usage:
    python scripts/plan_capture.py <tag> <suffix> [query ...]

e.g. ``python scripts/plan_capture.py r12 before`` captures every query;
``python scripts/plan_capture.py r12 after semdedup span_dedup`` only
those two. The plan is the PRE-execution AdaptiveSparkPlan (the shape
the optimizer committed to: exchange count, join strategy, pushed
filters, Python-eval nodes); queries that run driver-side actions while
*building* the DataFrame (collect-seeded codebooks, the louvain
fixture write) execute those actions as the real query would.

A one-line summary per query (Exchange / Python-eval / scan counts)
prints to stdout so plan-shape regressions are visible at a glance.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])

    from grafeo_memory_spark.session import get_spark
    import __spark_entry__ as entrymod
    from grafeo_memory_spark.queries import BENCH_EXTRAS

    spark = get_spark(app_name="plan-capture")
    queries = dict(entrymod.queries())
    queries.update(BENCH_EXTRAS)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure instead of dying
            text = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_ex = len(re.findall(r"\bExchange\b", text))
        n_py = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas", text)
        )
        n_scan = len(re.findall(r"Scan parquet", text))
        n_smj = len(re.findall(r"SortMergeJoin", text))
        n_bhj = len(re.findall(r"BroadcastHashJoin", text))
        print(
            f"{name:28s} exchanges={n_ex:2d} scans={n_scan:2d} "
            f"smj={n_smj} bhj={n_bhj} pyeval={n_py}"
        )


if __name__ == "__main__":
    main()
