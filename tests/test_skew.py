"""Skew utilities: salted and split joins must be result-identical to
the plain join, and actually change the physical shape they claim to."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.operators.skew import (
    hot_keys,
    salted_join,
    split_skew_join,
)


@pytest.fixture()
def skewed(spark):
    # 900 rows on key 0 (the hot domain), 100 spread over keys 1..9
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 0).otherwise(F.col("id") % 10).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(10)], "k long, rname string"
    )
    return left, right


def _as_set(df):
    return {tuple(r) for r in df.collect()}


class TestSaltedJoin:
    def test_inner_parity(self, spark, skewed):
        left, right = skewed
        plain = left.join(right, "k")
        salted = salted_join(left, right, "k", salt_n=8)
        assert _as_set(salted) == _as_set(plain)

    def test_left_parity_with_unmatched(self, spark, skewed):
        left, right = skewed
        r_small = right.where(F.col("k") < 5)
        plain = left.join(r_small, "k", "left")
        salted = salted_join(left, r_small, "k", salt_n=4, how="left")
        assert _as_set(salted) == _as_set(plain)

    def test_semi_parity(self, spark, skewed):
        left, right = skewed
        r_small = right.where(F.col("k") >= 3)
        plain = left.join(r_small, "k", "left_semi")
        salted = salted_join(left, r_small, "k", salt_n=4, how="left_semi")
        assert _as_set(salted) == _as_set(plain)

    def test_right_join_rejected(self, spark, skewed):
        left, right = skewed
        with pytest.raises(ValueError):
            salted_join(left, right, "k", how="right")

    def test_salt_actually_spreads_hot_key(self, spark, skewed):
        left, right = skewed
        n_salts = (
            left.withColumn(
                "_salt",
                F.pmod(
                    F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)
                ).cast("int"),
            )
            .where(F.col("k") == 0)
            .select("_salt")
            .distinct()
            .count()
        )
        assert n_salts == 8  # the hot key occupies every salt bucket


class TestSplitSkewJoin:
    def test_hot_keys_measurement(self, spark, skewed):
        left, _ = skewed
        assert hot_keys(left, "k", threshold=100) == [0]

    def test_parity_inner_and_left(self, spark, skewed):
        left, right = skewed
        for how in ("inner", "left"):
            plain = left.join(right, "k", how)
            split = split_skew_join(
                left, right, "k", hot_threshold=100, how=how
            )
            assert _as_set(split) == _as_set(plain)

    def test_hot_path_is_broadcast(self, spark, skewed):
        left, right = skewed
        plan = (
            split_skew_join(left, right, "k", hot=[0])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_no_hot_keys_degenerates_to_plain(self, spark, skewed):
        left, right = skewed
        out = split_skew_join(left, right, "k", hot_threshold=10_000)
        assert _as_set(out) == _as_set(left.join(right, "k"))


class TestReservedAndMapTypes:
    """ADVICE r5 (low): '_salt' inputs must be rejected and map-typed
    columns must not reach xxhash64 (plan-time failure)."""

    def test_salt_column_rejected(self, spark, skewed):
        left, right = skewed
        with pytest.raises(ValueError, match="_salt"):
            salted_join(left.withColumn("_salt", F.lit(1)), right, "k")
        with pytest.raises(ValueError, match="_salt"):
            salted_join(left, right.withColumn("_salt", F.lit(1)), "k")

    def test_map_column_survives_salting(self, spark, skewed):
        left, right = skewed
        lmap = left.withColumn(
            "props", F.create_map(F.lit("a"), F.col("lval"))
        )
        out = salted_join(lmap, right, "k")
        plain = lmap.join(right, "k")
        assert out.count() == plain.count()
        assert set(out.columns) == set(plain.columns)

    def test_all_nonkey_map_falls_back(self, spark):
        left = spark.range(50).select(
            (F.col("id") % 3).alias("k"),
            F.create_map(F.lit("x"), F.col("id")).alias("m"),
        )
        right = spark.createDataFrame(
            [(0, "a"), (1, "b"), (2, "c")], "k long, v string"
        )
        assert salted_join(left, right, "k").count() == 50
