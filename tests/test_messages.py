"""Message normalization — reference `tests/test_messages.py` (16
tests): every accepted input form, multimodal part handling, image-URL
extraction, and type validation for the X4/X6 adapter
(`functions/temporal.py:108-146`; reference `messages.py:30-90`)."""

from __future__ import annotations

import pytest

from grafeo_memory_spark.functions.temporal import normalize_messages


class TestBasicForms:
    def test_string_input(self):
        text, actor, imgs = normalize_messages("hello world")
        assert text == "hello world" and actor is None and imgs == []

    def test_single_dict(self):
        text, actor, imgs = normalize_messages(
            {"role": "user", "content": "hi"}
        )
        assert text == "user: hi" and actor is None

    def test_list_of_dicts(self):
        text, _, _ = normalize_messages(
            [
                {"role": "user", "content": "question"},
                {"role": "assistant", "content": "answer"},
            ]
        )
        assert text == "user: question\nassistant: answer"

    def test_dict_with_name_sets_actor(self):
        text, actor, _ = normalize_messages(
            [{"role": "user", "name": "alice", "content": "hi"}]
        )
        assert actor == "alice"
        assert text == "alice (user): hi"

    def test_last_named_message_wins(self):
        _, actor, _ = normalize_messages(
            [
                {"role": "user", "name": "alice", "content": "a"},
                {"role": "user", "name": "bob", "content": "b"},
            ]
        )
        assert actor == "bob"

    def test_empty_list(self):
        text, actor, imgs = normalize_messages([])
        assert text == "" and actor is None and imgs == []

    def test_dict_defaults_to_user_role(self):
        text, _, _ = normalize_messages({"content": "no role"})
        assert text.startswith("user:")

    def test_invalid_type_raises(self):
        with pytest.raises(TypeError):
            normalize_messages(42)
        with pytest.raises(TypeError):
            normalize_messages(None)


class TestMultimodalParts:
    def test_image_url_extracted(self):
        _, _, imgs = normalize_messages(
            [{"role": "user", "content": [
                {"type": "image_url",
                 "image_url": {"url": "https://x.test/cat.jpg"}},
            ]}]
        )
        assert imgs == ["https://x.test/cat.jpg"]

    def test_data_uri_extracted(self):
        uri = "data:image/jpeg;base64,AAAA"
        _, _, imgs = normalize_messages(
            [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": uri}},
            ]}]
        )
        assert imgs == [uri]

    def test_plain_string_image_url_value(self):
        # image_url may be the URL string directly, not a dict
        _, _, imgs = normalize_messages(
            [{"role": "user", "content": [
                {"type": "image_url", "image_url": "https://x.test/a.png"},
            ]}]
        )
        assert imgs == ["https://x.test/a.png"]

    def test_multiple_images_in_order(self):
        _, _, imgs = normalize_messages(
            [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": "u1"}},
                {"type": "text", "text": "between"},
                {"type": "image_url", "image_url": {"url": "u2"}},
            ]}]
        )
        assert imgs == ["u1", "u2"]

    def test_text_only_multimodal_format(self):
        text, _, imgs = normalize_messages(
            [{"role": "user", "content": [
                {"type": "text", "text": "part a"},
                {"type": "text", "text": "part b"},
            ]}]
        )
        assert text == "user: part a part b" and imgs == []

    def test_image_only_no_text(self):
        text, _, imgs = normalize_messages(
            [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": "u"}},
            ]}]
        )
        assert text == "user: " and imgs == ["u"]

    def test_multimodal_across_messages(self):
        text, _, imgs = normalize_messages(
            [
                {"role": "user", "content": [
                    {"type": "text", "text": "first"},
                    {"type": "image_url", "image_url": {"url": "u1"}},
                ]},
                {"role": "assistant", "content": "plain reply"},
                {"role": "user", "content": [
                    {"type": "image_url", "image_url": {"url": "u2"}},
                ]},
            ]
        )
        assert imgs == ["u1", "u2"]
        assert "plain reply" in text

    def test_non_dict_parts_skipped(self):
        # reference skips non-dict parts rather than raising
        text, _, imgs = normalize_messages(
            [{"role": "user", "content": [
                "stray string", {"type": "text", "text": "kept"},
            ]}]
        )
        assert text == "user: kept" and imgs == []

    def test_empty_image_url_skipped(self):
        _, _, imgs = normalize_messages(
            [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": ""}},
                {"type": "image_url", "image_url": {}},
                {"type": "image_url", "image_url": {"url": "real"}},
            ]}]
        )
        assert imgs == ["real"]
