"""Entity communities — Louvain detection, materialized Community
nodes, and search-time community context (reference communities.py
surface).

Run: python examples/communities.py
"""

from __future__ import annotations

from grafeo_memory_spark import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor
from grafeo_memory_spark.session import get_spark


def main(spark=None) -> None:
    spark = spark or get_spark(app_name="communities-example")
    # two clusters: a work circle and a climbing circle
    rel = lambda s, t, r: {"source": s, "target": t, "relation_type": r}
    ent = lambda n: {"name": n, "type": "person"}
    extractor = ScriptedExtractor([
        {"facts": ["Alice pairs with Bob on the query engine"],
         "entities": [ent("Alice"), ent("Bob")],
         "relations": [rel("Alice", "Bob", "PAIRS_WITH")]},
        {"facts": ["Bob reviews Carol's PRs"],
         "entities": [ent("Bob"), ent("Carol")],
         "relations": [rel("Bob", "Carol", "REVIEWS")]},
        {"facts": ["Dan belays Erin at the climbing gym"],
         "entities": [ent("Dan"), ent("Erin")],
         "relations": [rel("Dan", "Erin", "BELAYS")]},
    ])
    engine = MemoryEngine(spark, extractor=extractor)
    engine.add("Alice pairs with Bob on the query engine", user_id="u")
    engine.add("Bob reviews Carol's PRs", user_id="u")
    engine.add("Dan belays Erin at the climbing gym", user_id="u")

    infos = engine.detect_communities(user_id="u")
    print(f"detected {len(infos)} communities:")
    for c in infos:
        print(f"  community {c['community_id']}: "
              f"{c['member_count']} members — {c['summary']}")

    print("\ncommunity context for ['Alice']:")
    for r in engine.get_community_context(["Alice"], user_id="u").collect():
        print(f"  {r['summary']}")
    engine.close()


if __name__ == "__main__":
    main()
