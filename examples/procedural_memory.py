"""Procedural memory — typed memories with type-scoped reconciliation
and search filters (reference examples/procedural_memory.py).

Run: python examples/procedural_memory.py
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grafeo_memory_spark import MemoryEngine
from grafeo_memory_spark.session import get_spark


def main(spark=None) -> None:
    spark = spark or get_spark(app_name="procedural-example")
    engine = MemoryEngine(spark)

    engine.add("Alice lives in Lisbon", user_id="u")  # semantic (default)
    engine.add("To deploy: run tests, tag a release, push the tag",
               user_id="u", memory_type="procedural")
    engine.add("Reviewed the Q3 roadmap with Bob yesterday",
               user_id="u", memory_type="episodic")

    print("All types by default:")
    for r in engine.search("Alice lives in Lisbon", user_id="u",
                           k=10).collect():
        print(f"  [{r['memory_type'] or 'semantic'}] {r['text']}")

    print("\nOnly procedural:")
    rows = engine.get_all(user_id="u").where(
        F.col("memory_type") == "procedural"
    ).collect()
    for m in rows:
        print(f"  [{m['id']}] {m['text']}")
    engine.close()


if __name__ == "__main__":
    main()
