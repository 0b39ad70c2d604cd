"""Config-knob validation parity (reference
`tests/test_config_validation.py`, 18 cases over MemoryConfig
`types.py:107-146`): out-of-range knobs raise at construction, an
off-unit core weight sum only warns, and the yolo() constructor stays
valid. The repo splits the reference's MemoryConfig into ScoreConfig
(scoring knobs) + engine kwargs + embedder dimensions; each validation
lands on its owning object."""

from __future__ import annotations

import warnings

import pytest

from grafeo_memory_spark.functions.scoring import ScoreConfig
from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import HashEmbedder

UNIT_KNOBS = [
    "weight_similarity",
    "weight_recency",
    "weight_frequency",
    "weight_importance",
    "weight_topology",
    "topology_boost_factor",
    "cross_session_boost_factor",
    "agreement_bonus",
    "search_min_score",
    "mmr_lambda",
    "reconciliation_threshold",
]


class TestScoreConfigValidation:
    def test_defaults_are_valid(self):
        cfg = ScoreConfig()
        assert cfg.decay_rate == 0.1

    def test_decay_rate_zero(self):
        with pytest.raises(ValueError, match="decay_rate"):
            ScoreConfig(decay_rate=0.0)

    def test_decay_rate_negative(self):
        with pytest.raises(ValueError, match="decay_rate"):
            ScoreConfig(decay_rate=-0.5)

    @pytest.mark.parametrize("field_name", UNIT_KNOBS)
    def test_knob_negative(self, field_name):
        with pytest.raises(ValueError, match=f"{field_name} must be in"):
            ScoreConfig(**{field_name: -0.1})

    @pytest.mark.parametrize("field_name", UNIT_KNOBS)
    def test_knob_above_one(self, field_name):
        with pytest.raises(ValueError, match=f"{field_name} must be in"):
            ScoreConfig(**{field_name: 1.1})

    def test_knob_boundaries_valid(self):
        cfg = ScoreConfig(
            weight_similarity=0.0,
            weight_recency=0.0,
            weight_frequency=0.0,
            weight_importance=0.0,
            weight_topology=1.0,
        )
        assert cfg.weight_topology == 1.0

    def test_reconciliation_threshold_boundaries_valid(self):
        assert ScoreConfig(reconciliation_threshold=0.0).reconciliation_threshold == 0.0
        assert ScoreConfig(reconciliation_threshold=1.0).reconciliation_threshold == 1.0

    def test_search_min_score_default_zero(self):
        assert ScoreConfig().search_min_score == 0.0

    def test_weight_sum_warning(self):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            ScoreConfig(
                weight_similarity=0.5,
                weight_recency=0.5,
                weight_frequency=0.5,
                weight_importance=0.5,
            )
        assert len(w) == 1
        assert "2.000" in str(w[0].message)

    def test_weight_sum_no_warning_for_defaults(self):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            ScoreConfig()
        assert len(w) == 0

    def test_weight_boundaries_zero_no_raise(self):
        """All-zero core weights: valid values, only the sum warns."""
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            ScoreConfig(
                weight_similarity=0.0,
                weight_recency=0.0,
                weight_frequency=0.0,
                weight_importance=0.0,
            )
        assert len(w) == 1


class TestEmbedderValidation:
    def test_embedding_dimensions_zero(self):
        with pytest.raises(ValueError, match="dimensions"):
            HashEmbedder(dimensions=0)

    def test_embedding_dimensions_negative(self):
        with pytest.raises(ValueError, match="dimensions"):
            HashEmbedder(dimensions=-5)

    def test_embedding_dimensions_valid(self):
        assert HashEmbedder(dimensions=32).dimensions == 32


class TestYolo:
    def test_yolo_still_works(self, spark):
        """yolo() turns every optional feature on and stays valid
        (ref test_yolo_still_works)."""
        eng = MemoryEngine.yolo(spark)
        assert eng.enable_graph_algorithms is True
        assert eng.enable_episodes is True
        assert eng.tracer is not None
        assert eng.usage_callback is not None

    def test_yolo_with_overrides(self, spark):
        """Overrides pass through (ref test_yolo_with_overrides)."""
        eng = MemoryEngine.yolo(
            spark,
            embedder=HashEmbedder(dimensions=32),
            enable_episodes=False,
        )
        assert eng.embedder.dimensions == 32
        assert eng.enable_episodes is False
        assert eng.enable_graph_algorithms is True
