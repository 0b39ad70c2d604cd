"""Deterministic scoring / re-ranking math as Column expressions
(SURVEY.md §2.9, reference `scoring.py`).

Every formula is a pure Column over epoch-millisecond LongType inputs —
same arithmetic as the reference (ms → days inside the expression), no
Python UDFs, fully codegen'd. ``now_ms`` is always an explicit argument:
the reference calls ``time.time()`` inline (`scoring.py:385`), which makes
results irreproducible; callers here pass a pinned clock (tests/oracles)
or ``int(time.time()*1000)`` at the facade.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

MS_PER_DAY = 86_400_000.0


#: knobs that must lie in [0, 1] (reference `types.py:122-137`)
_UNIT_RANGE_KNOBS = (
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
)


@dataclass(frozen=True)
class ScoreConfig:
    """Scoring knobs with the reference defaults (`types.py:59-95`).

    Construction validates like the reference's `__post_init__`
    (`types.py:107-146`): out-of-range knobs RAISE, an off-unit core
    weight sum only WARNS (scores still well-defined, just rescaled).
    ``validate()`` is the strict variant that raises on the sum too.
    """

    decay_rate: float = 0.1
    weight_similarity: float = 0.4
    weight_recency: float = 0.3
    weight_frequency: float = 0.15
    weight_importance: float = 0.15
    weight_topology: float = 0.0
    topology_boost_factor: float = 0.0
    cross_session_boost_factor: float = 0.0
    agreement_bonus: float = 0.1
    search_min_score: float = 0.0
    mmr_lambda: float = 0.5
    reconciliation_threshold: float = 0.3
    #: multi-hop graph-search depth (reference `types.py:92-93`):
    #: 1 = entity→memory only (the reference default); 2 adds the
    #: entity→RELATION→entity→memory expansion at 0.7× discount
    graph_search_depth: int = 1

    def __post_init__(self) -> None:
        if self.decay_rate <= 0:
            raise ValueError(
                f"decay_rate must be positive, got {self.decay_rate}"
            )
        if self.graph_search_depth not in (1, 2):
            raise ValueError(
                "graph_search_depth must be 1 or 2, got "
                f"{self.graph_search_depth}"
            )
        for name in _UNIT_RANGE_KNOBS:
            val = getattr(self, name)
            if not 0.0 <= val <= 1.0:
                raise ValueError(f"{name} must be in [0.0, 1.0], got {val}")
        if abs(self._core_weight_sum() - 1.0) > 0.05:
            import warnings

            warnings.warn(
                f"core importance weights sum to "
                f"{self._core_weight_sum():.3f}, expected ~1.0",
                UserWarning,
                stacklevel=3,
            )

    def _core_weight_sum(self) -> float:
        return (
            self.weight_similarity
            + self.weight_recency
            + self.weight_frequency
            + self.weight_importance
        )

    def validate(self) -> None:
        s = self._core_weight_sum()
        if abs(s - 1.0) > 0.05:
            raise ValueError(f"core weights sum to {s:.3f}, expected ~1.0")
        if self.decay_rate <= 0:
            raise ValueError("decay_rate must be positive")


def _clamp01(c: Column) -> Column:
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), c))


def recency_score(created_at: Column | str, now_ms: int, decay_rate: float) -> Column:
    """R1 — `exp(-decay_rate * age_days)`; 0.0 for created_at <= 0
    (reference `_recency_score`, `scoring.py:378-388`)."""
    c = F.col(created_at) if isinstance(created_at, str) else created_at
    age_days = F.greatest(F.lit(0.0), (F.lit(float(now_ms)) - c)) / F.lit(MS_PER_DAY)
    return F.when(c <= 0, F.lit(0.0)).otherwise(F.exp(-F.lit(decay_rate) * age_days))


def modulated_recency_score(
    created_at: Column | str,
    reinforcement: Column,
    now_ms: int,
    decay_rate: float,
) -> Column:
    """R2 — structural-decay modulated recency: decay rate scaled by
    `(1 - 0.5*clamp(reinforcement))` (reference `scoring.py:391-403`)."""
    c = F.col(created_at) if isinstance(created_at, str) else created_at
    rate = F.lit(decay_rate) * (F.lit(1.0) - F.lit(0.5) * _clamp01(reinforcement))
    age_days = F.greatest(F.lit(0.0), (F.lit(float(now_ms)) - c)) / F.lit(MS_PER_DAY)
    return F.when(c <= 0, F.lit(0.0)).otherwise(F.exp(-rate * age_days))


def frequency_score(access_count: Column | str) -> Column:
    """R3 — `min(1, log(1+n)/log(101))`, 0.0 for n <= 0
    (reference `_frequency_score`, `scoring.py:406-411`)."""
    n = F.col(access_count) if isinstance(access_count, str) else access_count
    score = F.least(F.lit(1.0), F.log(F.lit(1.0) + n) / F.lit(math.log(101.0)))
    return F.when(n.isNull() | (n <= 0), F.lit(0.0)).otherwise(score)


def topology_score(entity_count: Column | str, shared_ratio: Column | str) -> Column:
    """R4 — `0.6*min(1, log(1+ec)/log(11)) + 0.4*clamp(shared_ratio)`,
    0.0 when no entities (reference `_topology_score`,
    `scoring.py:230-242`)."""
    ec = F.col(entity_count) if isinstance(entity_count, str) else entity_count
    sr = F.col(shared_ratio) if isinstance(shared_ratio, str) else shared_ratio
    degree = F.least(F.lit(1.0), F.log(F.lit(1.0) + ec) / F.lit(math.log(11.0)))
    return F.when(ec.isNull() | (ec <= 0), F.lit(0.0)).otherwise(
        F.lit(0.6) * degree + F.lit(0.4) * _clamp01(sr)
    )


def composite_score(
    similarity: Column,
    created_at: Column | str,
    access_count: Column | str,
    importance: Column,
    now_ms: int,
    config: ScoreConfig | None = None,
    topology: Column | None = None,
    reinforcement: Column | None = None,
) -> Column:
    """R5 — weighted composite (reference `compute_composite_score`,
    `scoring.py:15-42`). When ``reinforcement`` is given (structural decay
    on) and > 0, recency decay is modulated by it."""
    cfg = config or ScoreConfig()
    if reinforcement is not None:
        rec = F.when(
            reinforcement > 0,
            modulated_recency_score(created_at, reinforcement, now_ms, cfg.decay_rate),
        ).otherwise(recency_score(created_at, now_ms, cfg.decay_rate))
    else:
        rec = recency_score(created_at, now_ms, cfg.decay_rate)
    score = (
        F.lit(cfg.weight_similarity) * similarity
        + F.lit(cfg.weight_recency) * rec
        + F.lit(cfg.weight_frequency) * frequency_score(access_count)
        + F.lit(cfg.weight_importance) * importance
    )
    if cfg.weight_topology > 0 and topology is not None:
        score = score + F.lit(cfg.weight_topology) * topology
    return score


def topology_boost(score: Column, topology: Column, boost_factor: float) -> Column:
    """R6 — `score * (1 + boost_factor * topology)` (reference
    `apply_topology_boost`, `scoring.py:185-222`)."""
    return score * (F.lit(1.0) + F.lit(boost_factor) * topology)


def cross_session_boost(
    score: Column,
    pagerank: Column,
    betweenness: Column,
    boost_factor: float,
) -> Column:
    """R7 — `algo = 0.7*min(1,pr*10) + 0.3*min(1,bt*10)`;
    `score * (1 + factor*algo)` (reference `scoring.py:128-182`).
    NULL metric columns count as 0 (node never scored)."""
    pr = F.least(F.lit(1.0), F.coalesce(pagerank, F.lit(0.0)) * 10.0)
    bt = F.least(F.lit(1.0), F.coalesce(betweenness, F.lit(0.0)) * 10.0)
    algo = F.lit(0.7) * pr + F.lit(0.3) * bt
    return score * (F.lit(1.0) + F.lit(boost_factor) * algo)


def agreement_bonus(
    vec_score: Column, graph_score: Column, bonus: float
) -> Column:
    """R8/J5 — merge bonus: when found by both branches take
    `max(v,g) * (1+bonus)` (reference `manager.py:666-689`)."""
    both = vec_score.isNotNull() & graph_score.isNotNull()
    return F.when(
        both, F.greatest(vec_score, graph_score) * (F.lit(1.0) + F.lit(bonus))
    ).otherwise(F.coalesce(vec_score, graph_score))
