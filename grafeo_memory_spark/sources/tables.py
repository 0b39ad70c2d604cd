"""Parquet table loaders for the driver-generated test schema (TESTDATA.md)
and for the memory-graph tables (FIXTURES.md §B).

One DataFrame per table, read lazily — Catalyst pushes filters and column
pruning into the Parquet scan, so callers should never pre-`.cache()` here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet carries TIMESTAMP(NANOS), which Spark has no native
    # type for. The conf is runtime-settable and idempotent, and must be
    # set on *this* session: the driver supplies its own SparkSession that
    # never went through our get_spark() factory (session.py).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in DRIVER_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view so operators can be
    written in either DataFrame or SQL form over the same names."""
    for t in DRIVER_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
