#!/usr/bin/env python
"""Interleaved A/B: pagerank distributed loop, per-iteration collected
dangling scalar (current) vs dangling mass carried as a 1-row crossJoin
column with lazy checkpoints (candidate).

The candidate only applies when tol == 0.0 (fixed-iteration mode, the
bench row's mode): there is no early exit, so the per-iteration stats
collect exists ONLY to refresh the dangling scalar — that value can
ride the next iteration's plan as a broadcast 1-row aggregate instead,
removing both driver jobs per iteration (stats collect + eager
checkpoint). Arithmetic is unchanged: the same sum over the same
checkpointed rank rows, consumed as a column instead of a literal.

Parity is asserted inside the run: both variants' final (node_id,
pagerank) frames are collected once and compared to 1e-12.

Usage: python scripts/pr_fuse_ab.py [-n N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F


def _stat():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def _common(edges):
    verts = (
        edges.select(F.col("src").alias("node_id"))
        .unionByName(edges.select(F.col("dst").alias("node_id")))
        .distinct()
        .localCheckpoint()
    )
    n = verts.count()
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    links = edges.select("src", "dst").join(out_deg, "src").localCheckpoint()
    verts = (
        verts.join(
            out_deg.select(F.col("src").alias("node_id")).withColumn(
                "_out", F.lit(1)
            ),
            "node_id",
            "left",
        )
        .select("node_id", F.col("_out").isNull().alias("is_dangling"))
        .localCheckpoint()
    )
    n_dangling = (
        verts.agg(F.sum(F.when(F.col("is_dangling"), 1).otherwise(0)))
        .collect()[0][0]
        or 0
    )
    return verts, links, n, n_dangling


def pr_current(edges, damping=0.85, max_iter=12):
    """The shipped distributed loop at tol=0.0 (collected dangling)."""
    verts, links, n, n_dangling = _common(edges)
    ranks = verts.withColumn("pagerank", F.lit(1.0 / n))
    dangling = n_dangling / float(n)
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        contrib = (
            links.join(
                ranks.select(F.col("node_id").alias("src"), "pagerank"), "src"
            )
            .select(
                F.col("dst").alias("node_id"),
                (F.col("pagerank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node_id")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            ranks.select(
                "node_id", "is_dangling", F.col("pagerank").alias("_pr_old")
            )
            .join(contrib, "node_id", "left")
            .select(
                "node_id",
                "is_dangling",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.lit(dangling / n)
                    )
                ).alias("pagerank"),
                "_pr_old",
            )
            .localCheckpoint()
        )
        if n_dangling > 0:
            dangling = (
                new_ranks.agg(
                    F.coalesce(
                        F.sum(F.when(F.col("is_dangling"), F.col("pagerank"))),
                        F.lit(0.0),
                    )
                ).collect()[0][0]
            )
        ranks = new_ranks.select("node_id", "is_dangling", "pagerank")
    return ranks.select("node_id", "pagerank")


def pr_fused(edges, damping=0.85, max_iter=12):
    """Candidate: dangling rides as a broadcast 1-row aggregate; lazy
    checkpoints; zero per-iteration driver jobs."""
    verts, links, n, n_dangling = _common(edges)
    ranks = verts.withColumn("pagerank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    # iteration 1 uses the exact init scalar, like the current loop;
    # later iterations read the broadcast `_dangling` column riding on
    # the rank rows
    has_dangling_col = False
    for it in range(max_iter):
        dangling_expr = (
            F.col("_dangling")
            if has_dangling_col
            else F.lit(n_dangling / float(n))
        )
        keep = ["node_id", "is_dangling", "pagerank"] + (
            ["_dangling"] if has_dangling_col else []
        )
        contrib = (
            links.join(
                ranks.select(F.col("node_id").alias("src"), "pagerank"), "src"
            )
            .select(
                F.col("dst").alias("node_id"),
                (F.col("pagerank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node_id")
            .agg(F.sum("c").alias("inflow"))
        )
        new_ranks = (
            ranks.select(*keep)
            .join(contrib, "node_id", "left")
            .select(
                "node_id",
                "is_dangling",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + dangling_expr / F.lit(float(n))
                    )
                ).alias("pagerank"),
            )
            .localCheckpoint(eager=False)
        )
        ranks = new_ranks
        if n_dangling > 0 and it + 1 < max_iter:
            dang_df = ranks.agg(
                F.coalesce(
                    F.sum(F.when(F.col("is_dangling"), F.col("pagerank"))),
                    F.lit(0.0),
                ).alias("_dangling")
            )
            # broadcast the 1-row aggregate into the next iteration
            ranks = ranks.crossJoin(F.broadcast(dang_df))
            has_dangling_col = True
    return ranks.select("node_id", "pagerank")


def main() -> None:
    args = sys.argv[1:]
    n_rounds = 5
    if args and args[0] == "-n":
        n_rounds = int(args[1])
    from grafeo_memory_spark.session import get_spark
    from grafeo_memory_spark.sources.tables import load_fixture

    spark = get_spark(app_name="pr_fuse_ab")

    def run(variant):
        spark.sparkContext.setJobDescription(f"pr_fuse_ab {variant.__name__}")
        t0 = time.perf_counter()
        # construction is INSIDE the timed region: the current loop does
        # its per-iteration work (eager checkpoints + stats collects) at
        # build time, exactly like the bench row does
        edges = load_fixture(spark, SF_DIR, "edges").where(
            F.col("edge_type") == "RELATION"
        )
        pr = variant(edges)
        out = (
            pr.select("node_id", F.round("pagerank", 6).alias("pagerank"))
            .orderBy(F.round("pagerank", 6).desc(), F.col("node_id").asc())
            .limit(50)
        )
        out.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # parity check first (one run each, compare full rank vectors)
    edges = load_fixture(spark, SF_DIR, "edges").where(
        F.col("edge_type") == "RELATION"
    )
    a_rows = {
        r["node_id"]: r["pagerank"] for r in pr_current(edges).collect()
    }
    b_rows = {r["node_id"]: r["pagerank"] for r in pr_fused(edges).collect()}
    assert set(a_rows) == set(b_rows), "node set mismatch"
    worst = max(abs(a_rows[k] - b_rows[k]) for k in a_rows)
    print(f"parity: {len(a_rows)} nodes, max |delta| = {worst:.3e}", flush=True)
    assert worst < 1e-12, worst

    results = {"current": [], "fused": []}
    stat_a = _stat()
    for r in range(n_rounds):
        order = (
            [("current", pr_current), ("fused", pr_fused)]
            if r % 2 == 0
            else [("fused", pr_fused), ("current", pr_current)]
        )
        for name, fn in order:
            results[name].append(run(fn))
    stat_b = _stat()
    d = [y - x for x, y in zip(stat_a, stat_b)]
    tot = sum(d) or 1
    for name in ("current", "fused"):
        runs = results[name]
        print(
            f"{name:8s} min={min(runs):6.2f} med={statistics.median(runs):6.2f} "
            f"runs={[round(x, 2) for x in runs]}",
            flush=True,
        )
    print(f"sweep sys%={100 * d[2] / tot:.0f} steal%={100 * d[7] / tot:.0f}")


if __name__ == "__main__":
    main()
