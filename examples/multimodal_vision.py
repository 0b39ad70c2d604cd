"""Multimodal ingest — image parts described into the memory text via
the ImageDescriber policy slot (reference examples/multimodal_vision.py,
vision.py). ScriptedDescriber stands in for a vision model so the
example runs offline; swap in any callable hitting a real VLM.

Run: python examples/multimodal_vision.py
"""

from __future__ import annotations

from grafeo_memory_spark import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedDescriber
from grafeo_memory_spark.session import get_spark


def main(spark=None) -> None:
    spark = spark or get_spark(app_name="vision-example")
    engine = MemoryEngine(
        spark,
        describer=ScriptedDescriber(
            ["a whiteboard covered in system architecture diagrams"]
        ),
    )

    res = engine.add(
        [
            {"role": "user", "content": [
                {"type": "text", "text": "Notes from the design review"},
                {"type": "image_url",
                 "image_url": {"url": "https://example.com/whiteboard.jpg"}},
            ]}
        ],
        user_id="u",
    )
    print("added:", res.added_ids)
    for m in engine.get_all(user_id="u").collect():
        print(" stored text:", m["text"])
    engine.close()


if __name__ == "__main__":
    main()
