"""Quickstart — the core memory lifecycle, fully offline.

Mirrors the reference's examples/quickstart.py flow (add → search →
get_all → update → history → delete) but runs with the deterministic
built-in policies (hash embedder, passthrough extractor, ADD-everything
reconciler), so no API key or model download is needed.

Run: python examples/quickstart.py
"""

from __future__ import annotations

from grafeo_memory_spark import MemoryEngine
from grafeo_memory_spark.session import get_spark


def main(spark=None) -> None:
    spark = spark or get_spark(app_name="quickstart")
    engine = MemoryEngine(spark)

    print("Adding memories:")
    res = engine.add("Alice is learning Rust and enjoys systems programming",
                     user_id="alice")
    res.merge(engine.add("Alice prefers Neovim over VS Code", user_id="alice"))
    print(f"  added ids: {res.added_ids}")

    print("\nSearch: 'What is Alice learning?'")
    for r in engine.search("Alice is learning Rust", user_id="alice",
                           k=5).collect():
        print(f"  [{r['score']:.2f}] {r['text']}")

    print("\nAll memories:")
    rows = engine.get_all(user_id="alice").collect()
    for m in rows:
        print(f"  [{m['id']}] {m['text']}")

    mid = res.added_ids[0]
    print(f"\nUpdating memory {mid}:")
    engine.update(mid, "Alice is now learning Zig", user_id="alice")
    print("history events:",
          [e["event"] for e in engine.history(mid).collect()])

    print(f"\nDeleting memory {mid}:",
          engine.delete(mid))
    engine.close()


if __name__ == "__main__":
    main()
