"""Usage tracking — the P6 callback fires per engine operation with
call/token counts (reference examples/usage_tracking.py).

Run: python examples/usage_tracking.py
"""

from __future__ import annotations

from grafeo_memory_spark import MemoryEngine
from grafeo_memory_spark.session import get_spark


def main(spark=None) -> None:
    spark = spark or get_spark(app_name="usage-example")
    seen = []

    def on_usage(operation, usage):
        seen.append((operation, usage))
        print(f"  [usage] {operation}: {usage}")

    engine = MemoryEngine(spark, usage_callback=on_usage)
    print("Operations fire the callback:")
    res = engine.add("Alice enjoys rock climbing", user_id="u")
    engine.search("rock climbing", user_id="u", k=3).collect()

    print("\nPer-result usage also rides the result object:")
    print("  add usage:", res.usage)
    print("  callback events:", [op for op, _ in seen])
    engine.close()


if __name__ == "__main__":
    main()
