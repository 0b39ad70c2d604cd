"""SparkSession factory.

Defaults are tuned for the test harness (local[N], single JVM) but every
setting is the one you'd want on a real cluster too: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), UTC session time
zone (oracle comparability), Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "grafeo_memory_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    On a real cluster, drop ``master`` and let spark-submit supply it;
    nothing else here is local-mode specific.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let the planner pick shuffled-hash join when its size checks
        # pass instead of always sort-merge (optimization guide §3.1/§9
        # baseline): SHJ skips both sort passes; SMJ remains the
        # fallback whenever the build side might not fit, and AQE skew
        # handling still applies. Measured on the 12 join-heavy bench
        # rows (r12 interleaved A/B): subtotal 33.5 s → 30.1 s, with
        # graph_2hop 1.29→0.84, search_pipeline 2.48→1.83,
        # embedding_near_dup 4.67→3.39. Env-overridable for clusters
        # that prefer the sort-merge-always posture.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata's events.ts is parquet TIMESTAMP(NANOS) which Spark
        # has no native type for; read it as a long of epoch-nanoseconds
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if master or not os.environ.get("SPARK_MASTER"):
        builder = builder.master(master or f"local[{cpus}]")
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
