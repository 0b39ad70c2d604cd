"""Topology-aware ranking — graph metrics boost well-connected memories
(reference examples/topology_boost.py).

A scripted extractor supplies entities/relations so the knowledge graph
forms offline; enable_graph_algorithms turns on the cached
PageRank/betweenness boost columns used by search.

Run: python examples/topology_boost.py
"""

from __future__ import annotations

from grafeo_memory_spark import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor
from grafeo_memory_spark.session import get_spark


def main(spark=None) -> None:
    spark = spark or get_spark(app_name="topology-example")
    extractor = ScriptedExtractor([
        {"facts": ["Alice leads the storage team"],
         "entities": [{"name": "Alice", "type": "person"},
                      {"name": "storage team", "type": "team"}],
         "relations": [{"source": "Alice", "target": "storage team",
                        "relation_type": "LEADS"}]},
        {"facts": ["Alice mentors Bob"],
         "entities": [{"name": "Alice", "type": "person"},
                      {"name": "Bob", "type": "person"}],
         "relations": [{"source": "Alice", "target": "Bob",
                        "relation_type": "MENTORS"}]},
        {"facts": ["Carol joined the design team"],
         "entities": [{"name": "Carol", "type": "person"}],
         "relations": []},
    ])
    engine = MemoryEngine(spark, extractor=extractor,
                          enable_graph_algorithms=True)
    engine.add("Alice leads the storage team", user_id="u")
    engine.add("Alice mentors Bob", user_id="u")
    engine.add("Carol joined the design team", user_id="u")

    print("Search with topology boost (Alice memories are central):")
    for r in engine.search("Alice leads the storage team", user_id="u",
                           k=5).collect():
        print(f"  [{r['score']:.3f}] {r['text']}")
    engine.close()


if __name__ == "__main__":
    main()
