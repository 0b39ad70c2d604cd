"""Temporal-graph walkthrough with per-add wall-clock — the repo twin
of the reference's only performance artifact
(`/root/reference/examples/temporal_bench.py:51-59,124-125`), which
prints per-`add()` latency and a total, with no stated targets (its
runs are LLM-API-bound). Ours runs fully offline over the
deterministic mock policy stack, so the printed numbers measure the
ENGINE (Spark ingest + search plans), not a network round-trip.

Exercises the same two phases:
  1. Bi-temporal model — decision-carried valid_at dates, point-in-time
     search vs. current search
  2. Episode provenance — Episode nodes, PRODUCED edges, session
     replay via the NEXT_EPISODE chain

Run: python examples/temporal_bench.py
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

from grafeo_memory_spark import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor, ScriptedReconciler
from grafeo_memory_spark.session import get_spark


def _ms(y: int, m: int, d: int) -> int:
    return int(datetime(y, m, d, tzinfo=timezone.utc).timestamp() * 1000)


#: the reference bench's four career-history messages, with the dated
#: decisions the LLM would have produced scripted deterministically
MSGS = [
    ("Markus joined Acme Corp as a software engineer in March 2022.",
     [{"action": "add",
       "text": "Markus works at Acme Corp as a software engineer",
       "valid_at": "2022-03-01"}]),
    ("Markus was promoted to senior engineer at Acme Corp in January 2024.",
     [{"action": "update", "target_memory_id": 1,
       "text": "Markus is a senior engineer at Acme Corp",
       "valid_at": "2024-01-01"}]),
    ("Markus left Acme and joined Globex Industries in September 2024.",
     [{"action": "update", "target_memory_id": 2,
       "text": "Markus works at Globex Industries",
       "valid_at": "2024-09-01"}]),
    ("Markus started learning Rust in 2023; before that only Python and Go.",
     [{"action": "add", "text": "Markus is learning Rust",
       "valid_at": "2023-01-01"}]),
]


def main(spark=None) -> None:
    spark = spark or get_spark(app_name="temporal-bench")
    ext = ScriptedExtractor(
        outputs=[
            {"facts": [d["text"] for d in decisions],
             "entities": [{"name": "Markus", "entity_type": "person"}],
             "relations": []}
            for _, decisions in MSGS
        ]
    )
    rec = ScriptedReconciler(outputs=[{"decisions": d} for _, d in MSGS])
    engine = MemoryEngine(
        spark, extractor=ext, reconciler=rec, enable_episodes=True,
    )

    t0 = time.perf_counter()

    print("=== Phase 1: Bi-Temporal ===\n")
    for msg, _ in MSGS:
        t1 = time.perf_counter()
        res = engine.add(msg, user_id="markus", run_id="bench_run_1")
        dt = (time.perf_counter() - t1) * 1000
        acts = (
            [("ADD", i) for i in res.added_ids]
            + [("UPDATE", i) for i in res.updated_ids]
        )
        for action, mid in acts:
            print(f"  [{action:6s}] memory {mid}")
        print(f"  ({dt:.0f}ms)\n")

    print("Search: 'Where does Markus work?' (point_in_time=2023-07-01)")
    rows = engine.search(
        "Where does Markus work?", user_id="markus",
        point_in_time=_ms(2023, 7, 1), include_expired=True,
    ).collect()
    for r in rows[:3]:
        print(f"  [{r['score']:.2f}] {r['text']}  valid_at={r['valid_at']}")

    print("\nSearch: 'Where does Markus work?' (current)")
    for r in engine.search("Where does Markus work?",
                           user_id="markus").collect()[:3]:
        print(f"  [{r['score']:.2f}] {r['text']}  valid_at={r['valid_at']}")

    print("\n=== Phase 2: Episode Provenance ===\n")
    eps = engine.get_episodes(user_id="markus").collect()
    print(f"Episodes created: {len(eps)}")
    for ep in eps:
        print(f"  [{ep['episode_id']}] {ep['content'][:60]}...")
        print(f"    produced: {list(ep['produced_memories'])}")
        print(f"    mentions: {list(ep['mentioned_entities'])}")

    if eps:
        print("\nEpisode chain (forward from first):")
        chain = engine.episode_chain(
            eps[0]["episode_id"], direction="forward"
        ).collect()
        for ep in chain:
            print(f"  -> [{ep['episode_id']}] {ep['content'][:50]}...")

        first_mem = engine.get_all(user_id="markus").collect()[0]
        prov = engine.get_provenance(first_mem["id"]).collect()
        print(f"\nProvenance for memory '{first_mem['text'][:40]}...':")
        for ep in prov:
            print(f"  <- Episode [{ep['episode_id']}] {ep['content'][:50]}...")

    print("\n=== Stats ===\n")
    s = engine.stats()
    for key in ("total_memories", "entities", "relations",
                "episodes", "communities"):
        print(f"  {key:13s} {s[key]}")

    total = (time.perf_counter() - t0) * 1000
    print(f"\nTotal time: {total:.0f}ms")
    engine.close()


if __name__ == "__main__":
    main()
