"""Bi-temporal semantics — reference `tests/test_bitemporal.py`: date
parsing edge cases, valid_at flowing from policy decision strings into
the store as epoch ms, UPDATE stamping invalid_at from the successor's
valid_at, and point-in-time search honoring the validity interval."""

from __future__ import annotations

from datetime import datetime, timezone

from grafeo_memory_spark.functions.temporal import classify_temporal, parse_date_ms
from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import (
    ScriptedExtractor,
    ScriptedReconciler,
)


def _ms(*args):
    return int(datetime(*args, tzinfo=timezone.utc).timestamp() * 1000)


class TestParseDateMs:
    def test_iso_date(self):
        assert parse_date_ms("2024-01-15") == _ms(2024, 1, 15)

    def test_iso_datetime(self):
        assert parse_date_ms("2024-06-15T10:30:00") == _ms(
            2024, 6, 15, 10, 30, 0
        )

    def test_space_datetime(self):
        assert parse_date_ms("2024-06-15 10:30:00") == _ms(
            2024, 6, 15, 10, 30, 0
        )

    def test_year_only(self):
        assert parse_date_ms("2024") == _ms(2024, 1, 1)

    def test_none_and_empty(self):
        assert parse_date_ms(None) is None
        assert parse_date_ms("") is None

    def test_unparseable(self):
        assert parse_date_ms("not a date") is None

    def test_whitespace_stripped(self):
        assert parse_date_ms("  2024-03-01  ") == _ms(2024, 3, 1)

    def test_int_passthrough(self):
        assert parse_date_ms(1_700_000_000_000) == 1_700_000_000_000


class TestBiTemporalAdd:
    def test_decision_string_valid_at_lands_as_epoch_ms(self, spark):
        ext = ScriptedExtractor(
            outputs=[{"facts": ["alice started at acme in january 2024"],
                      "entities": [], "relations": []}]
        )
        rec = ScriptedReconciler(
            outputs=[{"decisions": [{
                "action": "add",
                "text": "alice started at acme in january 2024",
                "valid_at": "2024-01-15",
            }]}]
        )
        eng = MemoryEngine(
            spark, extractor=ext, reconciler=rec, now_fn=lambda: 1_000
        )
        eng.add("Alice started at Acme in January 2024", user_id="u")
        row = eng.get_all(user_id="u").collect()[0]
        assert row["valid_at"] == _ms(2024, 1, 15)

    def test_no_annotation_leaves_valid_at_null(self, spark):
        eng = MemoryEngine(spark, now_fn=lambda: 1_000)
        eng.add("plain fact", user_id="u", infer=False)
        assert eng.get_all(user_id="u").collect()[0]["valid_at"] is None

    def test_update_stamps_invalid_at_from_successor(self, spark):
        ext = ScriptedExtractor(
            outputs=[
                {"facts": ["lives in rome"], "entities": [],
                 "relations": []},
                {"facts": ["lives in paris"], "entities": [],
                 "relations": []},
            ]
        )
        rec = ScriptedReconciler(
            outputs=[
                {"decisions": [{"action": "ADD", "text": "lives in rome",
                                "valid_at": "2023-01-01"}]},
                # scripted second call: supersede memory 1 with a fact
                # valid from 2024-05-01
                {"decisions": [{"action": "UPDATE",
                                "target_memory_id": 1,
                                "text": "lives in paris",
                                "valid_at": "2024-05-01"}]},
            ]
        )
        eng = MemoryEngine(
            spark, extractor=ext, reconciler=rec, now_fn=lambda: 10_000
        )
        eng.add("lives in rome", user_id="u")
        eng.add("lives in paris", user_id="u")
        rows = {r["text"]: r for r in eng.get_all(
            user_id="u", include_expired=True
        ).collect()}
        old, new = rows["lives in rome"], rows["lives in paris"]
        # bi-temporal close-out: predecessor's invalid_at = successor's
        # valid_at (reference lifecycle semantics)
        assert new["valid_at"] == _ms(2024, 5, 1)
        assert old["invalid_at"] == _ms(2024, 5, 1)
        assert old["expired_at"] is not None

    def test_point_in_time_search_honors_interval(self, spark):
        ext = ScriptedExtractor(
            outputs=[{"facts": ["worked at acme"], "entities": [],
                      "relations": []}]
        )
        rec = ScriptedReconciler(
            outputs=[{"decisions": [{
                "action": "ADD", "text": "worked at acme",
                "valid_at": "2020-01-01", "invalid_at": "2022-01-01",
            }]}]
        )
        eng = MemoryEngine(
            spark, extractor=ext, reconciler=rec, now_fn=lambda: 1_000
        )
        eng.add("worked at acme", user_id="u")
        inside = eng.search(
            "worked at acme", user_id="u", k=5,
            point_in_time=_ms(2021, 6, 1),
        )
        after = eng.search(
            "worked at acme", user_id="u", k=5,
            point_in_time=_ms(2023, 6, 1),
        )
        assert inside.count() == 1
        assert after.count() == 0


class TestPointInTimeHints:
    """Point-in-time phrasings set the hint (reference
    `tests/test_bitemporal.py` TestPointInTimeHints)."""

    def test_as_of_detected(self):
        h = classify_temporal("What was Alice's job as of 2023?")
        assert "point_in_time" in h.signals
        assert h.is_temporal
        assert h.point_in_time_hint == parse_date_ms("2023")

    def test_at_that_point_detected(self):
        h = classify_temporal("Who was the manager at that point?")
        assert "point_in_time" in h.signals
        assert h.point_in_time_hint is None  # no explicit date

    def test_back_then_is_past_state(self):
        # "back then" reads as past-state (expired versions visible),
        # the reference flags it for historical retrieval too
        h = classify_temporal("What did the team look like back then?")
        assert h.include_expired and h.is_temporal

    def test_in_year_detected(self):
        h = classify_temporal("What projects were active in 2022?")
        assert "point_in_time" in h.signals
        assert h.point_in_time_hint == parse_date_ms("2022")

    def test_on_date_detected(self):
        h = classify_temporal("What was true on 2023-05-01?")
        assert h.point_in_time_hint == parse_date_ms("2023-05-01")

    def test_no_false_positive(self):
        h = classify_temporal("Where does Alice work now?")
        assert "point_in_time" not in h.signals


class TestParseDateEdgeCases:
    def test_year_overflow_returns_none(self):
        assert parse_date_ms("9999999999") is None

    def test_garbage_year_returns_none(self):
        assert parse_date_ms("abcd") is None

    def test_bool_not_treated_as_epoch(self):
        # bool is an int subclass; must not pass through as epoch ms
        assert parse_date_ms(True) is None or parse_date_ms(True) != 1
