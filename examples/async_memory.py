"""Async API — the same engine surface with async/await, for FastAPI /
aiohttp-style hosts (reference examples/async_memory.py).

Run: python examples/async_memory.py
"""

from __future__ import annotations

import asyncio

from grafeo_memory_spark import AsyncMemoryEngine
from grafeo_memory_spark.session import get_spark


async def amain(spark=None) -> None:
    spark = spark or get_spark(app_name="async-example")
    async with AsyncMemoryEngine(spark) as memory:
        print("Adding memories:")
        res = await memory.add(
            "Alice is learning Rust and enjoys systems programming",
            user_id="alice",
        )
        print(f"  added: {res.added_ids}")
        await memory.add("Alice prefers Neovim over VS Code",
                         user_id="alice")

        print("\nAsync search:")
        rows = await memory.search("Alice is learning Rust",
                                   user_id="alice", k=5)
        for r in rows.collect():
            print(f"  [{r['score']:.2f}] {r['text']}")

        print("\nAll memories:")
        allrows = await memory.get_all(user_id="alice")
        for m in allrows.collect():
            print(f"  [{m['id']}] {m['text']}")


def main(spark=None) -> None:
    asyncio.run(amain(spark))


if __name__ == "__main__":
    main()
