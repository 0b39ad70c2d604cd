"""Pure-function tests for X1 temporal-hint classification, X2 date
parsing, X4 message normalization (reference `tests/test_temporal.py` /
`tests/test_bitemporal.py:47-79` style)."""

from __future__ import annotations

from grafeo_memory_spark.functions.temporal import (
    classify_temporal,
    normalize_messages,
    parse_date_ms,
)


def test_hints_past_state():
    h = classify_temporal("where did bob previously work")
    assert h.is_temporal and h.include_expired
    assert "past_state" in h.signals


def test_hints_sequence_widen():
    h = classify_temporal("when did alice move and what happened after that")
    assert h.sort_chronologically and h.expand_limit


def test_hints_point_in_time():
    h = classify_temporal("as of 2023 where did carol live in 2023")
    assert "point_in_time" in h.signals
    assert h.point_in_time_hint == parse_date_ms("2023")


def test_hints_non_temporal_control():
    h = classify_temporal("what is the capital of france")
    assert not h.is_temporal
    assert not h.include_expired and not h.sort_chronologically


def test_parse_date_forms():
    # 2024-03-05T00:00:00Z
    assert parse_date_ms("2024-03-05") == 1_709_596_800_000
    assert parse_date_ms("2024-03-05T12:30:00") == 1_709_596_800_000 + 45_000_000
    assert parse_date_ms("2024") == 1_704_067_200_000
    assert parse_date_ms("not a date") is None
    assert parse_date_ms(None) is None
    assert parse_date_ms("24-03-05") is None


def test_normalize_messages_forms():
    text, actor, imgs = normalize_messages("plain string")
    assert text == "plain string" and actor is None and imgs == []

    text, actor, imgs = normalize_messages(
        {"role": "user", "name": "Ann", "content": "hi"}
    )
    assert text == "Ann (user): hi" and actor == "Ann"

    text, actor, imgs = normalize_messages(
        [
            {"role": "system", "content": "be brief"},
            {
                "role": "user",
                "name": "Bo",
                "content": [
                    {"type": "text", "text": "look at"},
                    {"type": "image_url", "image_url": {"url": "http://x/i.png"}},
                    {"type": "text", "text": "this"},
                ],
            },
        ]
    )
    assert text == "system: be brief\nBo (user): look at this"
    assert actor == "Bo"  # last named message wins
    assert imgs == ["http://x/i.png"]


def test_normalize_messages_edge_cases():
    # reference parse_messages edge semantics (`messages.py:30-90`):
    # bad top-level type raises, non-dict parts are skipped, empty or
    # missing image URLs are dropped, empty list yields empty text
    import pytest as _pytest

    with _pytest.raises(TypeError):
        normalize_messages(42)

    text, actor, imgs = normalize_messages([])
    assert text == "" and actor is None and imgs == []

    text, actor, imgs = normalize_messages(
        [
            {
                "role": "user",
                "content": [
                    "stray string part",
                    {"type": "text", "text": "kept"},
                    {"type": "image_url", "image_url": {"url": ""}},
                    {"type": "image_url", "image_url": {}},
                    {"type": "image_url", "image_url": "http://x/a.png"},
                ],
            }
        ]
    )
    assert text == "user: kept"
    assert imgs == ["http://x/a.png"]

    # role defaults to user; missing content renders empty
    text, actor, imgs = normalize_messages([{}])
    assert text == "user: " and actor is None and imgs == []


class TestTemporalHintsBreadth:
    """Reference `tests/test_temporal.py` TestTemporalHints cases."""

    def test_no_temporal_keywords(self):
        h = classify_temporal("Where does Alice work?")
        assert not h.is_temporal
        assert not h.include_expired
        assert not h.sort_chronologically

    def test_when_keyword_sorts_chronologically(self):
        h = classify_temporal("When did Alice move to NYC?")
        assert h.is_temporal and h.sort_chronologically

    def test_used_to_includes_expired(self):
        h = classify_temporal("Where did Alice used to work?")
        assert h.include_expired and h.is_temporal

    def test_previously_includes_expired(self):
        h = classify_temporal("What did the user previously believe?")
        assert h.include_expired

    def test_first_sorts_chronologically(self):
        h = classify_temporal("What was the first thing Alice said?")
        assert h.sort_chronologically

    def test_how_many_days_duration(self):
        h = classify_temporal(
            "How many days between the move and the new job?"
        )
        assert h.expand_limit and "duration" in h.signals
        assert h.include_expired  # both endpoints, earlier one expired

    def test_changed_includes_expired(self):
        h = classify_temporal("Has Alice's job changed?")
        assert h.include_expired

    def test_after_is_temporal(self):
        h = classify_temporal("What happened after the meeting?")
        assert h.is_temporal

    def test_no_false_positive(self):
        h = classify_temporal("Tell me about quantum physics")
        assert not h.is_temporal
