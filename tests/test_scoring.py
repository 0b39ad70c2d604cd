"""Pure-function unit tests for the scoring family R1-R8 — mirrors the
reference's `tests/test_scoring.py` style: closed-form expectations at
hand-picked inputs, pinned clock."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.scoring import (
    ScoreConfig,
    agreement_bonus,
    composite_score,
    cross_session_boost,
    frequency_score,
    modulated_recency_score,
    recency_score,
    topology_boost,
    topology_score,
)

MS_PER_DAY = 86_400_000
NOW = 1_700_000_000_000


def _one(spark, col, row=None, schema="x int"):
    df = spark.createDataFrame([row or (1,)], schema)
    return df.select(col.alias("v")).collect()[0]["v"]


def test_recency_decay_closed_form(spark):
    # age 10 days → exp(-0.1*10) = exp(-1)
    created = NOW - 10 * MS_PER_DAY
    got = _one(spark, recency_score(F.lit(created), NOW, 0.1))
    assert got == pytest.approx(math.exp(-1.0), abs=1e-12)
    # zero/negative created_at → 0.0 (reference scoring.py:386)
    assert _one(spark, recency_score(F.lit(0), NOW, 0.1)) == 0.0
    # future created_at clamps age to 0 → score 1.0
    assert _one(spark, recency_score(F.lit(NOW + MS_PER_DAY), NOW, 0.1)) == 1.0


def test_modulated_recency_halves_decay(spark):
    created = NOW - 10 * MS_PER_DAY
    # reinforcement 1.0 → rate*0.5 → exp(-0.5)
    got = _one(spark, modulated_recency_score(F.lit(created), F.lit(1.0), NOW, 0.1))
    assert got == pytest.approx(math.exp(-0.5), abs=1e-12)
    # reinforcement 0 → plain decay
    got0 = _one(spark, modulated_recency_score(F.lit(created), F.lit(0.0), NOW, 0.1))
    assert got0 == pytest.approx(math.exp(-1.0), abs=1e-12)
    # reinforcement clamped at 1 even if passed >1
    got2 = _one(spark, modulated_recency_score(F.lit(created), F.lit(5.0), NOW, 0.1))
    assert got2 == pytest.approx(math.exp(-0.5), abs=1e-12)


def test_frequency_score_log_cap(spark):
    # n=100 → log(101)/log(101) = 1.0 exactly (reference cap, scoring.py:411)
    assert _one(spark, frequency_score(F.lit(100))) == pytest.approx(1.0)
    # n=200 → still capped at 1
    assert _one(spark, frequency_score(F.lit(200))) == 1.0
    # n=0 / NULL → 0
    assert _one(spark, frequency_score(F.lit(0))) == 0.0
    assert _one(spark, frequency_score(F.lit(None).cast("long"))) == 0.0
    # n=10 → log(11)/log(101)
    assert _one(spark, frequency_score(F.lit(10))) == pytest.approx(
        math.log(11) / math.log(101), abs=1e-12
    )


def test_topology_score_formula(spark):
    # ec=10 → degree=log(11)/log(11)=1; sr=0.5 → 0.6*1 + 0.4*0.5 = 0.8
    got = _one(spark, topology_score(F.lit(10), F.lit(0.5)))
    assert got == pytest.approx(0.8, abs=1e-12)
    # no entities → 0 regardless of ratio (reference scoring.py:233-235)
    assert _one(spark, topology_score(F.lit(0), F.lit(1.0))) == 0.0
    # shared_ratio clamped to [0,1]
    got2 = _one(spark, topology_score(F.lit(10), F.lit(2.0)))
    assert got2 == pytest.approx(1.0, abs=1e-12)


def test_composite_score_weighted_sum(spark):
    cfg = ScoreConfig()
    created = NOW - 10 * MS_PER_DAY
    col = composite_score(
        F.lit(0.5), F.lit(created), F.lit(100), F.lit(0.8), NOW, cfg
    )
    expect = 0.4 * 0.5 + 0.3 * math.exp(-1.0) + 0.15 * 1.0 + 0.15 * 0.8
    assert _one(spark, col) == pytest.approx(expect, abs=1e-12)


def test_composite_weights_validate():
    with pytest.raises(ValueError):
        ScoreConfig(weight_similarity=0.9, weight_recency=0.9).validate()
    with pytest.raises(ValueError):
        ScoreConfig(decay_rate=-1.0).validate()
    ScoreConfig().validate()


def test_topology_boost_multiplier(spark):
    got = _one(spark, topology_boost(F.lit(0.5), F.lit(0.8), 0.25))
    assert got == pytest.approx(0.5 * 1.2, abs=1e-12)


def test_cross_session_boost_null_metrics(spark):
    # NULL pagerank/betweenness count as 0 → no boost
    got = _one(
        spark,
        cross_session_boost(
            F.lit(1.0),
            F.lit(None).cast("double"),
            F.lit(None).cast("double"),
            0.5,
        ),
    )
    assert got == 1.0
    # pr=0.05 → min(1, 0.5)=0.5; bt=0.2 → min(1,2)=1 → algo=0.7*0.5+0.3*1
    got2 = _one(
        spark, cross_session_boost(F.lit(1.0), F.lit(0.05), F.lit(0.2), 1.0)
    )
    assert got2 == pytest.approx(1.0 + (0.7 * 0.5 + 0.3 * 1.0), abs=1e-12)


def test_agreement_bonus_merge(spark):
    # both branches → max * 1.1
    got = _one(spark, agreement_bonus(F.lit(0.6), F.lit(0.8), 0.1))
    assert got == pytest.approx(0.88, abs=1e-12)
    # one branch only → passthrough
    got_v = _one(
        spark, agreement_bonus(F.lit(0.6), F.lit(None).cast("double"), 0.1)
    )
    assert got_v == pytest.approx(0.6)
    got_g = _one(
        spark, agreement_bonus(F.lit(None).cast("double"), F.lit(0.7), 0.1)
    )
    assert got_g == pytest.approx(0.7)
