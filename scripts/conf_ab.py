#!/usr/bin/env python
"""Interleaved A/B of one runtime SQL conf across named queries.

Same design as shj_ab.py (one session, per-repetition alternation with
order swapped every round, min/median + /proc/stat brackets) but
generic: the conf key and its two values come from the command line.

Usage:
    python scripts/conf_ab.py [-n N] <conf_key> <valA> <valB> query [query ...]
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
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    key, val_a, val_b, *names = args

    from grafeo_memory_spark.session import get_spark
    import __spark_entry__ as entrymod
    from grafeo_memory_spark.queries import BENCH_EXTRAS

    spark = get_spark(app_name="conf_ab")
    queries = dict(entrymod.queries())
    queries.update(BENCH_EXTRAS)

    def execute(name, val):
        spark.conf.set(key, val)
        spark.sparkContext.setJobDescription(f"{name} {key}={val}")
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    tiny = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    for name in names:
        if os.path.isdir(tiny):
            try:
                execute(name, val_a)  # warm codegen/plans
            except Exception:
                pass
        results: dict[str, list[float]] = {val_a: [], val_b: []}
        a = _stat()
        for r in range(n):
            order = [val_a, val_b] if r % 2 == 0 else [val_b, val_a]
            for val in order:
                results[val].append(execute(name, val))
        b = _stat()
        d = [y - x for x, y in zip(a, b)]
        tot = sum(d) or 1
        for val in (val_a, val_b):
            runs = results[val]
            print(
                f"{name:26s} {key.rsplit('.', 1)[-1]}={val:6s} "
                f"min={min(runs):6.2f} med={statistics.median(runs):6.2f} "
                f"runs={[round(x, 2) for x in runs]}",
                flush=True,
            )
        print(
            f"{name:26s} sweep sys%={100 * d[2] / tot:.0f} "
            f"steal%={100 * d[7] / tot:.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
