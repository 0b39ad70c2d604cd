#!/usr/bin/env python
"""Interleaved A/B: LPA per-round checkpoint eager (r7 default, two
driver jobs per round: materialize + changed-count) vs lazy
(SPARK_GRAFT_LPA_LAZY_CKPT=1 — the changed-count action materializes
the checkpoint blocks itself, one driver job per round; the CC-loop
shape). The flag only moves WHEN materialization happens, never what
is computed — parity is asserted inside the run anyway.

Usage: python scripts/lpa_ckpt_ab.py [-n N]
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

    spark = get_spark(app_name="lpa_ckpt_ab")
    fn = BENCH_EXTRAS["lpa_distributed"]

    def run(flag: str):
        os.environ["SPARK_GRAFT_LPA_LAZY_CKPT"] = flag
        spark.sparkContext.setJobDescription(f"lpa_ckpt_ab lazy={flag}")
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # parity first: both variants' full result, compared exactly
    def rows(flag: str):
        os.environ["SPARK_GRAFT_LPA_LAZY_CKPT"] = flag
        return {r["community"]: r["n_members"] for r in fn(spark, SF_DIR).collect()}

    a, b = rows("0"), rows("1")
    assert a == b, "label mismatch between eager and lazy checkpoint"
    print(f"parity: {len(a)} rows, exact-equal", flush=True)

    results = {"eager": [], "lazy": []}
    stat_a = _stat()
    for r in range(n_rounds):
        order = (
            [("eager", "0"), ("lazy", "1")]
            if r % 2 == 0
            else [("lazy", "1"), ("eager", "0")]
        )
        for name, flag in order:
            results[name].append(run(flag))
    stat_b = _stat()
    d = [y - x for x, y in zip(stat_a, stat_b)]
    tot = sum(d) or 1
    for name in ("eager", "lazy"):
        runs = results[name]
        print(
            f"{name:6s} min={min(runs):6.2f} med={statistics.median(runs):6.2f} "
            f"runs={[round(x, 2) for x in runs]}",
            flush=True,
        )
    print(f"sweep sys%={100 * d[2] / tot:.0f} steal%={100 * d[7] / tot:.0f}")


if __name__ == "__main__":
    main()
