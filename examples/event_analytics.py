"""Event analytics — gap sessionization, point-in-time as-of joins,
and structural graph metrics over the events + entity tables (this
engine's Spark-native extension surface beyond the reference).

Run: python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from grafeo_memory_spark.operators.asof import asof_join
from grafeo_memory_spark.operators.windows import sessionize
from grafeo_memory_spark.session import get_spark


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = spark or get_spark(app_name="event-analytics")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    # 1. gap sessionization: 30 minutes of inactivity splits a user's
    # stream into sessions — one shuffle, two window passes
    sess = sessionize(
        ev, ["user_id"], "ts", F.expr("INTERVAL 30 MINUTES"),
        tiebreak="event_id",
    )
    rollup = (
        sess.groupBy("user_id", "session_seq")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total"))
    )
    stats = rollup.agg(
        F.count("*").alias("sessions"),
        F.round(F.avg("n_events"), 2).alias("avg_events"),
        F.round(F.max("n_events"), 2).alias("max_events"),
    ).collect()[0]
    print(f"sessions: {stats['sessions']} "
          f"(avg {stats['avg_events']} events, max {stats['max_events']})")

    # 2. as-of join: each purchase sees the user's latest click
    # at-or-before it — the leakage-free feature-store lookup
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    feats = asof_join(
        purchases, clicks, on="user_id", ts_col="ts",
        value_cols=["click_value"],
    )
    n_matched = feats.where(F.col("click_value").isNotNull()).count()
    print(f"purchases with a prior click: {n_matched}/{feats.count()}")
    print("sample features (purchase value, click value, click ts):")
    for r in (
        feats.where(F.col("click_value").isNotNull())
        .orderBy("event_id").limit(3).collect()
    ):
        print(f"  event {r['event_id']}: {r['value']:.2f} / "
              f"{r['click_value']:.2f} @ {r['ts_matched_asof']}")

    # 2b. range join: attribute each purchase to the promo window(s)
    # containing it — the binned equi-join, never a nested loop
    from grafeo_memory_spark.operators.range_join import range_join

    day = 86_400.0
    promos = spark.createDataFrame(
        [
            (1, "new-year", 0.0, 7 * day),
            (2, "mid-month", 12 * day, 18 * day),
            (3, "clearance", 25 * day, 40 * day),
        ],
        "promo_id int, promo string, lo double, hi double",
    )
    pts = purchases.withColumn(
        "t_rel",
        F.unix_timestamp("ts").cast("double")
        - F.unix_timestamp(F.lit("2024-01-01 00:00:00")).cast("double"),
    )
    attributed = range_join(
        pts, promos, point_col="t_rel", lo_col="lo", hi_col="hi",
        bin_width=7 * day, how="left",
    )
    promo_rollup = (
        attributed.groupBy("promo")
        .agg(F.count("*").alias("purchases"),
             F.round(F.sum("value"), 2).alias("revenue"))
        .orderBy(F.desc_nulls_last("purchases"))
    )
    print("promo attribution (NULL = outside every window):")
    for r in promo_rollup.collect():
        print(f"  {r['promo']}: {r['purchases']} purchases, "
              f"revenue {r['revenue']}")

    # 3. structural graph metrics on a co-occurrence graph: users that
    # touch the same minute-bucket form edges; triangles, link
    # prediction, and the dense 2-core over that graph
    from grafeo_memory_spark.graph.algorithms import (
        adamic_adar,
        k_core,
        triangle_count,
    )

    buckets = ev.select(
        "user_id", F.date_trunc("minute", "ts").alias("bucket")
    ).distinct()
    a = buckets.select(F.col("user_id").alias("src"), "bucket")
    b = buckets.select(F.col("user_id").alias("dst"), "bucket")
    edges = (
        a.join(b, "bucket")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    tri_total = (
        triangle_count(edges).agg(F.sum("triangles")).collect()[0][0] or 0
    ) // 3
    print(f"\nco-activity graph: {edges.count()} edges, "
          f"{tri_total} triangles")
    preds = adamic_adar(edges, top_k=3).collect()
    print(f"top link predictions (Adamic-Adar): {len(preds)}")
    for r in preds:
        print(f"  users {r['node_a']}-{r['node_b']}: {r['aa_score']:.4f}")
    core = k_core(edges, 2)
    print(f"2-core: {core.count()} users")


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
