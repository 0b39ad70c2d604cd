#!/usr/bin/env python
"""Interleaved A/B: embedding_near_dup with the r13 signature/band
checkpoints (SPARK_GRAFT_NEARDUP_NO_CKPT unset) vs the pre-r13
re-derive shape (=1). Two checkpoints are toggled together: the
hyperplane-signature table feeding both bucket self-join sides
(q_embedding_near_dup) and simhash_near_dup's guarded band table
feeding both Hamming self-join sides. Both are pure
materializations of the identical frame — parity is asserted inside
the run anyway.

Usage: python scripts/neardup_ckpt_ab.py [-n N] [query ...]
(default query: embedding_near_dup)
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
        args = args[2:]
    qnames = args or ["embedding_near_dup"]

    from grafeo_memory_spark.session import get_spark
    import __spark_entry__ as entrymod
    from grafeo_memory_spark.queries import BENCH_EXTRAS

    spark = get_spark(app_name="neardup_ckpt_ab")
    queries = dict(entrymod.queries())
    queries.update(BENCH_EXTRAS)

    for qname in qnames:
        fn = queries[qname]

        def run(flag: str):
            os.environ["SPARK_GRAFT_NEARDUP_NO_CKPT"] = flag
            spark.sparkContext.setJobDescription(
                f"neardup_ckpt_ab {qname} no_ckpt={flag}"
            )
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        # parity first: both variants' full result, compared exactly
        def rows(flag: str):
            os.environ["SPARK_GRAFT_NEARDUP_NO_CKPT"] = flag
            return sorted(
                tuple(r) for r in fn(spark, SF_DIR).collect()
            )

        a, b = rows("1"), rows("0")
        assert a == b, f"{qname}: result mismatch ({len(a)} vs {len(b)} rows)"
        print(f"{qname} parity: {len(a)} rows identical", flush=True)

        results = {"no_ckpt": [], "ckpt": []}
        stat_a = _stat()
        for r in range(n_rounds):
            order = (
                [("no_ckpt", "1"), ("ckpt", "0")]
                if r % 2 == 0
                else [("ckpt", "0"), ("no_ckpt", "1")]
            )
            for name, flag in order:
                results[name].append(run(flag))
        stat_b = _stat()
        d = [y - x for x, y in zip(stat_a, stat_b)]
        tot = sum(d) or 1
        for name in ("no_ckpt", "ckpt"):
            runs = results[name]
            print(
                f"{qname} {name:8s} min={min(runs):6.2f} "
                f"med={statistics.median(runs):6.2f} "
                f"runs={[round(x, 2) for x in runs]}",
                flush=True,
            )
        print(f"sweep sys%={100 * d[2] / tot:.0f} steal%={100 * d[7] / tot:.0f}")
    os.environ.pop("SPARK_GRAFT_NEARDUP_NO_CKPT", None)


if __name__ == "__main__":
    main()
