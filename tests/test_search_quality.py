"""Search-quality invariants — reference `tests/test_search_quality.py`
themes: result source attribution, min_score config-vs-param
precedence, agreement bonus, memory-type scoped search, and the
explain() stage list reflecting applied filters (VERDICT r3 item 7)."""

from __future__ import annotations

from grafeo_memory_spark.functions.scoring import ScoreConfig
from grafeo_memory_spark.manager import MemoryEngine


def _eng(spark, **kw):
    return MemoryEngine(spark, now_fn=lambda: 1_000, **kw)


class TestResultSource:
    def test_search_result_has_source(self, spark):
        eng = _eng(spark)
        eng.add("likes rain", user_id="u", infer=False)
        rows = eng.search("likes rain", user_id="u", k=1).collect()
        assert rows[0]["source"] in ("vector", "graph", "both")

    def test_columns_match_searchresult_projection(self, spark):
        eng = _eng(spark)
        eng.add("a fact", user_id="u", infer=False)
        cols = set(eng.search("a fact", user_id="u", k=1).columns)
        assert {"memory_id", "text", "score", "source"} <= cols


class TestMinScorePrecedence:
    def test_default_returns_all(self, spark):
        eng = _eng(spark)
        eng.add("completely different topic", user_id="u", infer=False)
        assert (
            eng.search("unrelated query", user_id="u", k=5).count() == 1
        )

    def test_param_filters_low(self, spark):
        eng = _eng(spark)
        eng.add("completely different topic", user_id="u", infer=False)
        assert (
            eng.search(
                "unrelated query", user_id="u", k=5, min_score=0.99
            ).count()
            == 0
        )

    def test_config_level_min_score(self, spark):
        eng = _eng(spark, config=ScoreConfig(search_min_score=0.99))
        eng.add("completely different topic", user_id="u", infer=False)
        assert eng.search("unrelated query", user_id="u", k=5).count() == 0

    def test_param_cannot_lower_config_floor(self, spark):
        # pipeline applies max(param, config) — the stricter gate wins
        eng = _eng(spark, config=ScoreConfig(search_min_score=0.99))
        eng.add("completely different topic", user_id="u", infer=False)
        assert (
            eng.search(
                "unrelated query", user_id="u", k=5, min_score=0.0
            ).count()
            == 0
        )

    def test_explain_includes_min_score_step_only_when_set(self, spark):
        eng = _eng(spark)
        eng.add("a fact", user_id="u", infer=False)
        eng.search("a fact", user_id="u", k=1).collect()
        assert "min_score_filter" not in eng.explain()
        eng.search("a fact", user_id="u", k=1, min_score=0.5).collect()
        assert "min_score_filter" in eng.explain()


class TestAgreementBonus:
    def test_default(self):
        assert ScoreConfig().agreement_bonus == 0.1

    def test_zero_disables_but_search_works(self, spark):
        eng = _eng(spark, config=ScoreConfig(agreement_bonus=0.0))
        eng.add("alice works at acme", user_id="u", infer=False)
        assert (
            eng.search("alice works at acme", user_id="u", k=3).count() == 1
        )


class TestTypeScopedSearch:
    def test_semantic_vs_procedural_scoping(self, spark):
        eng = _eng(spark)
        eng.add("paris is in france", user_id="u", infer=False)
        eng.add(
            "how to deploy the service", user_id="u", infer=False,
            memory_type="procedural",
        )
        sem = eng.search("paris", user_id="u", k=5, memory_type="semantic")
        proc = eng.search(
            "deploy", user_id="u", k=5, memory_type="procedural"
        )
        assert [r["text"] for r in sem.collect()] == ["paris is in france"]
        assert [r["text"] for r in proc.collect()] == [
            "how to deploy the service"
        ]

    def test_no_filter_returns_both(self, spark):
        eng = _eng(spark)
        eng.add("fact one", user_id="u", infer=False)
        eng.add(
            "procedure one", user_id="u", infer=False,
            memory_type="procedural",
        )
        assert eng.search("one", user_id="u", k=5).count() == 2
