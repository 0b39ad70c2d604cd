"""Vision policy slot (reference `vision.py:24-66`, wired at
`manager.py:218-224`; `tests/test_vision.py` themes): image parts in a
message become "[Image: <description>]" lines merged into the ingest
text before extraction, with per-image fallback on policy failure."""

from __future__ import annotations

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedDescriber

_IMG_MSG = {
    "role": "user",
    "content": [
        {"type": "text", "text": "look at this"},
        {"type": "image_url", "image_url": {"url": "http://x/cat.png"}},
    ],
}


def _mk(spark, **kw):
    return MemoryEngine(spark, now_fn=lambda: 1_000, **kw)


def test_image_description_merged_into_memory_text(spark):
    eng = _mk(spark, describer=ScriptedDescriber())
    res = eng.add([_IMG_MSG], user_id="u", infer=False)
    text = eng.store.memories.collect()[0]["text"]
    assert "look at this" in text
    assert "[Image: image at http://x/cat.png]" in text
    assert len(res.added_ids) == 1


def test_image_only_message_becomes_description_text(spark):
    eng = _mk(spark, describer=ScriptedDescriber(outputs=["a red bicycle"]))
    msg = {"role": "user",
           "content": [{"type": "image_url",
                        "image_url": {"url": "http://x/b.png"}}]}
    eng.add([msg], user_id="u", infer=False)
    text = eng.store.memories.collect()[0]["text"]
    assert "[Image: a red bicycle]" in text


def test_no_describer_ignores_images(spark):
    eng = _mk(spark)  # vision disabled (reference enable_vision=False)
    eng.add([_IMG_MSG], user_id="u", infer=False)
    text = eng.store.memories.collect()[0]["text"]
    assert "look at this" in text and "[Image:" not in text


def test_describer_failure_falls_back_to_placeholder(spark):
    class Boom:
        def describe(self, urls):
            raise RuntimeError("vision model down")

    eng = _mk(spark, describer=Boom())
    eng.add([_IMG_MSG], user_id="u", infer=False)
    text = eng.store.memories.collect()[0]["text"]
    assert "[Image: [image: undescribed]]" in text


def test_usage_callback_counts_described_images(spark):
    seen = []
    eng = _mk(
        spark,
        describer=ScriptedDescriber(),
        usage_callback=lambda op, u: seen.append((op, u.calls)),
    )
    two = {
        "role": "user",
        "content": [
            {"type": "image_url", "image_url": {"url": "http://x/1.png"}},
            {"type": "image_url", "image_url": {"url": "http://x/2.png"}},
        ],
    }
    eng.add([two], user_id="u", infer=False)
    assert ("describe_image", 2) in seen


def test_scripted_describer_pads_missing_outputs():
    d = ScriptedDescriber(outputs=["only one"])
    assert d.describe(["u1", "u2"]) == ["only one", "[image: undescribed]"]
