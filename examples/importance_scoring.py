"""Importance scoring — multi-factor search ranking (reference
examples/importance_scoring.py).

Search ranks by a composite of similarity, recency, access frequency
and user-set importance; ``set_importance`` pins a memory's priority
and ``update_access_stats=True`` feeds the frequency term.

Run: python examples/importance_scoring.py
"""

from __future__ import annotations

from grafeo_memory_spark import MemoryEngine
from grafeo_memory_spark.session import get_spark


def main(spark=None) -> None:
    spark = spark or get_spark(app_name="importance-example")
    engine = MemoryEngine(spark)

    a = engine.add("standup meeting is at 9am", user_id="u").added_ids[0]
    b = engine.add("standup meeting moved to 10am on Fridays",
                   user_id="u").added_ids[0]

    print("Boosting memory", b, "to importance 1.0:")
    engine.set_importance(b, 1.0)
    engine.set_importance(a, 0.1)

    print("\nRanked search (access stats recorded):")
    rows = engine.search("standup meeting", user_id="u", k=5,
                         update_access_stats=True).collect()
    for r in rows:
        print(f"  [{r['score']:.3f}] {r['text']}")

    print("\nOut-of-range importance raises:")
    try:
        engine.set_importance(a, 1.5)
    except ValueError as e:
        print(" ", e)
    engine.close()


if __name__ == "__main__":
    main()
