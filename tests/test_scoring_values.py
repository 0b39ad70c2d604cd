"""Numeric scoring pins — reference `tests/test_scoring.py` value cases
(R1-R4, R6): recency decay curve points, frequency log soft-cap,
composite extremes, custom-weight isolation, and similarity dominance.
Each case evaluates the Column expression over a one-row frame so the
pinned number is the one Catalyst computes (VERDICT r3 item 7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.scoring import (
    ScoreConfig,
    composite_score,
    frequency_score,
    recency_score,
)

DAY_MS = 24 * 60 * 60 * 1000
NOW = 1_700_000_000_000


def _eval(spark, col, **row):
    df = spark.createDataFrame(
        [row or {"_dummy": 1}]
    )
    return df.select(col.alias("v")).collect()[0]["v"]


class TestRecencyCurve:
    def test_brand_new(self, spark):
        v = _eval(
            spark, recency_score(F.col("created_at"), NOW, 0.1),
            created_at=NOW,
        )
        assert v > 0.99

    def test_one_day_old(self, spark):
        v = _eval(
            spark, recency_score(F.col("created_at"), NOW, 0.1),
            created_at=NOW - DAY_MS,
        )
        assert 0.89 < v < 0.92  # e^-0.1 ≈ 0.905

    def test_ten_days_old(self, spark):
        v = _eval(
            spark, recency_score(F.col("created_at"), NOW, 0.1),
            created_at=NOW - 10 * DAY_MS,
        )
        assert 0.35 < v < 0.40  # e^-1 ≈ 0.368

    def test_hundred_days_near_zero(self, spark):
        v = _eval(
            spark, recency_score(F.col("created_at"), NOW, 0.1),
            created_at=NOW - 100 * DAY_MS,
        )
        assert v < 0.001

    def test_zero_timestamp_scores_zero(self, spark):
        v = _eval(
            spark, recency_score(F.col("created_at"), NOW, 0.1),
            created_at=0,
        )
        assert v == 0.0

    def test_faster_decay_scores_lower(self, spark):
        slow = _eval(
            spark, recency_score(F.col("created_at"), NOW, 0.1),
            created_at=NOW - DAY_MS,
        )
        fast = _eval(
            spark, recency_score(F.col("created_at"), NOW, 0.5),
            created_at=NOW - DAY_MS,
        )
        assert fast < slow


class TestFrequencyCurve:
    @pytest.mark.parametrize(
        "count,lo,hi",
        [(0, 0.0, 0.0), (1, 0.1, 0.2), (10, 0.4, 0.6),
         (100, 1.0, 1.0), (200, 1.0, 1.0)],
    )
    def test_log_soft_cap(self, spark, count, lo, hi):
        v = _eval(
            spark, frequency_score(F.col("access_count")),
            access_count=count,
        )
        assert lo <= v <= hi


class TestCompositeExtremes:
    def _score(self, spark, cfg, **row):
        defaults = dict(
            similarity=0.0, created_at=0, access_count=0, importance=0.0
        )
        defaults.update(row)
        col = composite_score(
            F.col("similarity"), F.col("created_at"),
            F.col("access_count"), F.col("importance"),
            now_ms=NOW, config=cfg,
        )
        return _eval(spark, col, **defaults)

    def test_all_maximum_near_one(self, spark):
        v = self._score(
            spark, ScoreConfig(), similarity=1.0, created_at=NOW,
            access_count=100, importance=1.0,
        )
        assert v > 0.98

    def test_custom_weights_isolate_similarity(self, spark):
        cfg = ScoreConfig(
            weight_similarity=1.0, weight_recency=0.0,
            weight_frequency=0.0, weight_importance=0.0,
        )
        v = self._score(spark, cfg, similarity=0.75)
        assert abs(v - 0.75) < 0.001

    def test_similarity_dominates_default_weights(self, spark):
        # similarity carries the largest default weight: a perfect-sim
        # stale memory outranks a zero-sim fresh one
        high_sim = self._score(spark, ScoreConfig(), similarity=1.0)
        high_rest = self._score(
            spark, ScoreConfig(), created_at=NOW, access_count=100,
            importance=1.0,
        )
        assert high_sim > 0.0 and high_sim > high_rest - high_sim
