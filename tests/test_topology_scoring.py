"""Topology-aware scoring and structural decay modulation parity
(reference `tests/test_topology_scoring.py`, 25 cases over
`scoring.py`): topology-score shape, reinforcement children semantics,
modulated recency, composite-with-topology, and boost invariants —
evaluated through the repo's Column functions so the pinned number is
the one Catalyst computes."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from grafeo_memory_spark.functions.scoring import (
    ScoreConfig,
    composite_score,
    modulated_recency_score,
    recency_score,
    topology_boost,
    topology_score,
)
from grafeo_memory_spark.operators.traversals import shared_entity_children

DAY_MS = 86_400_000
NOW = 1_800_000_000_000


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _topo(spark, entity_count, shared_ratio):
    return _eval(
        spark, topology_score(F.lit(entity_count), F.lit(float(shared_ratio)))
    )


class TestTopologyScore:
    def test_no_entities(self, spark):
        assert _topo(spark, 0, 0.0) == 0.0

    def test_one_entity_not_shared(self, spark):
        score = _topo(spark, 1, 0.0)
        assert 0.0 < score < 0.5

    def test_many_entities_all_shared(self, spark):
        assert _topo(spark, 10, 1.0) > 0.9

    def test_shared_ratio_boosts_score(self, spark):
        assert _topo(spark, 3, 1.0) > _topo(spark, 3, 0.0)

    def test_more_entities_higher_score(self, spark):
        assert _topo(spark, 8, 0.5) > _topo(spark, 1, 0.5)

    def test_score_bounded_zero_one(self, spark):
        for ec, sr in [(0, 0.0), (100, 1.0), (1, 0.5)]:
            assert 0.0 <= _topo(spark, ec, sr) <= 1.0


def _reinf_frames(spark, memories, edges):
    """memories: [(id, created_at, importance)]; edges: [(mem, ent)]."""
    mem_df = spark.createDataFrame(memories, "id long, created_at long, importance double")
    edge_df = spark.createDataFrame(
        [(m, e, "HAS_ENTITY") for m, e in edges], "src long, dst long, edge_type string"
    )
    return mem_df, edge_df


class TestComputeReinforcement:
    def test_no_children(self, spark):
        """Sole memory on an entity → no row (zero reinforcement)
        (ref test_no_children)."""
        mem, edg = _reinf_frames(spark, [(1, NOW, 1.0)], [(1, 100)])
        out = shared_entity_children(mem, mem, edg, gamma=0.3).collect()
        assert out == []

    def test_with_younger_child(self, spark):
        """Newer memory on a shared entity reinforces the older one
        (ref test_with_younger_child)."""
        mem, edg = _reinf_frames(
            spark,
            [(1, NOW - 10 * DAY_MS, 0.8), (2, NOW, 1.0)],
            [(1, 100), (2, 100)],
        )
        rows = {r["memory_id"]: r["reinforcement"]
                for r in shared_entity_children(mem, mem, edg, gamma=0.3).collect()}
        assert 0.0 < rows[1] <= 1.0
        assert abs(rows[1] - 0.3 * 1.0) < 1e-9

    def test_older_sibling_not_counted(self, spark):
        """Memories created BEFORE the base are not children
        (ref test_older_sibling_not_counted)."""
        mem, edg = _reinf_frames(
            spark,
            [(1, NOW - 10 * DAY_MS, 1.0), (2, NOW, 1.0)],
            [(1, 100), (2, 100)],
        )
        base = mem.where("id = 2")
        assert shared_entity_children(base, mem, edg, gamma=0.3).collect() == []

    def test_gamma_zero_disables(self, spark):
        """gamma=0 → reinforcement 0 regardless of structure
        (ref test_gamma_zero_disables)."""
        mem, edg = _reinf_frames(
            spark,
            [(1, NOW - 10 * DAY_MS, 1.0), (2, NOW, 1.0)],
            [(1, 100), (2, 100)],
        )
        rows = shared_entity_children(mem, mem, edg, gamma=0.0).collect()
        assert all(r["reinforcement"] == 0.0 for r in rows)

    def test_duplicate_entity_child_counts_once(self, spark):
        """A child sharing 2 entities contributes once to the mean
        (repo `traversals.py` distinct contract)."""
        mem, edg = _reinf_frames(
            spark,
            [(1, NOW - DAY_MS, 1.0), (2, NOW, 0.5)],
            [(1, 100), (2, 100), (1, 200), (2, 200)],
        )
        rows = {r["memory_id"]: r["reinforcement"]
                for r in shared_entity_children(mem, mem, edg, gamma=0.4).collect()}
        assert abs(rows[1] - 0.4 * 0.5) < 1e-9


class TestModulatedRecencyScore:
    def test_zero_reinforcement_matches_base(self, spark):
        t = NOW - DAY_MS
        base = _eval(spark, recency_score(F.lit(t), NOW, 0.1))
        mod = _eval(spark, modulated_recency_score(F.lit(t), F.lit(0.0), NOW, 0.1))
        assert abs(base - mod) < 1e-6

    def test_reinforcement_slows_decay(self, spark):
        t = NOW - 10 * DAY_MS
        normal = _eval(spark, modulated_recency_score(F.lit(t), F.lit(0.0), NOW, 0.1))
        reinforced = _eval(spark, modulated_recency_score(F.lit(t), F.lit(1.0), NOW, 0.1))
        assert reinforced > normal

    def test_max_reinforcement_halves_decay(self, spark):
        t = NOW - 10 * DAY_MS
        half = _eval(spark, recency_score(F.lit(t), NOW, 0.05))
        mod = _eval(spark, modulated_recency_score(F.lit(t), F.lit(1.0), NOW, 0.1))
        assert abs(mod - half) < 1e-6
        assert mod == math.exp(-0.05 * 10) or abs(mod - math.exp(-0.05 * 10)) < 1e-9

    def test_zero_timestamp(self, spark):
        assert _eval(spark, modulated_recency_score(F.lit(0), F.lit(0.5), NOW, 0.1)) == 0.0

    def test_reinforcement_clamped_above_one(self, spark):
        """reinforcement > 1 clamps: never decays slower than half-rate."""
        t = NOW - 10 * DAY_MS
        over = _eval(spark, modulated_recency_score(F.lit(t), F.lit(5.0), NOW, 0.1))
        half = _eval(spark, recency_score(F.lit(t), NOW, 0.05))
        assert abs(over - half) < 1e-9


class TestCompositeScoreWithTopology:
    def _score(self, spark, cfg, topo, reinf=None):
        t = NOW - 10 * DAY_MS
        return _eval(
            spark,
            composite_score(
                F.lit(0.8), F.lit(t), F.lit(5), F.lit(0.5), NOW, cfg,
                topology=F.lit(float(topo)),
                reinforcement=None if reinf is None else F.lit(float(reinf)),
            ),
        )

    def test_weight_topology_zero_no_effect(self, spark):
        cfg = ScoreConfig(weight_topology=0.0)
        assert abs(self._score(spark, cfg, 0.0) - self._score(spark, cfg, 1.0)) < 1e-10

    def test_topology_adds_to_score(self, spark):
        cfg = ScoreConfig(weight_topology=0.2)
        without = self._score(spark, cfg, 0.0)
        with_topo = self._score(spark, cfg, 0.8)
        assert with_topo > without
        assert abs(with_topo - without - 0.2 * 0.8) < 1e-9

    def test_structural_decay_modulation(self, spark):
        cfg = ScoreConfig()
        without = self._score(spark, cfg, 0.0, reinf=0.0)
        with_reinf = self._score(spark, cfg, 0.0, reinf=0.8)
        assert with_reinf > without


class TestTopologyBoost:
    def test_boost_factor_zero_noop(self, spark):
        df = spark.createDataFrame([(0.5, 0.9), (0.2, 0.1)], "score double, topo double")
        out = df.select(
            topology_boost(F.col("score"), F.col("topo"), 0.0).alias("b"),
            "score",
        ).collect()
        assert all(abs(r["b"] - r["score"]) < 1e-12 for r in out)

    def test_connected_memory_boosted(self, spark):
        df = spark.createDataFrame([(0.5, 0.9), (0.5, 0.0)], "score double, topo double")
        out = sorted(
            r["b"] for r in df.select(
                topology_boost(F.col("score"), F.col("topo"), 0.5).alias("b")
            ).collect()
        )
        assert out[0] == 0.5 and out[1] > 0.5

    def test_boost_never_decreases_scores(self, spark):
        rows = [(s / 10.0, t / 10.0) for s in range(11) for t in range(11)]
        df = spark.createDataFrame(rows, "score double, topo double")
        out = df.select(
            "score", topology_boost(F.col("score"), F.col("topo"), 0.3).alias("b")
        ).collect()
        assert all(r["b"] >= r["score"] - 1e-12 for r in out)

    def test_boost_empty_results(self, spark):
        df = spark.createDataFrame([], "score double, topo double")
        assert df.select(
            topology_boost(F.col("score"), F.col("topo"), 0.3).alias("b")
        ).count() == 0
