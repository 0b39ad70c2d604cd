"""Facade extras: R9 rerank wiring, A6 usage accumulation, J7/J8
relation reconciliation, G4 metric refresh."""

from __future__ import annotations

from pyspark.sql import functions as F

from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import RunUsage, ScriptedExtractor

NOW = [1_600_000_000_000]


def tick():
    NOW[0] += 60_000
    return NOW[0]


class ReverseReranker:
    """Deterministic R9 stand-in: reverses the incoming order."""

    def rerank(self, query, results, top_k):
        return list(reversed(results))[:top_k]


def test_reranker_applied_and_traced(spark):
    eng = MemoryEngine(spark, reranker=ReverseReranker(), now_fn=tick)
    eng.add("alpha fact", user_id="u")
    eng.add("beta fact", user_id="u")
    out = eng.search("alpha fact", user_id="u", k=2).collect()
    assert "rerank" in eng.explain()
    # pipeline order: alpha (exact match) first → reranker reverses
    assert [r["text"] for r in out] == ["beta fact", "alpha fact"]


def test_usage_callback_accumulates(spark):
    total = RunUsage()
    calls = []

    def cb(op, usage):
        calls.append(op)
        total.incr(usage)

    eng = MemoryEngine(spark, usage_callback=cb, now_fn=tick)
    eng.add("some fact", user_id="u")
    assert "extract" in calls and "reconcile" in calls
    assert total.calls == len(calls)


def test_relation_reconciliation_deletes_contradicted(spark):
    ext = ScriptedExtractor(
        [
            {
                "facts": ["bob works at acme"],
                "entities": [
                    {"name": "bob", "entity_type": "person"},
                    {"name": "acme", "entity_type": "organization"},
                ],
                "relations": [
                    {"source": "bob", "target": "acme",
                     "relation_type": "works_at"}
                ],
            },
            {
                "facts": ["bob works at globex"],
                "entities": [
                    {"name": "bob", "entity_type": "person"},
                    {"name": "globex", "entity_type": "organization"},
                ],
                "relations": [
                    {"source": "bob", "target": "globex",
                     "relation_type": "works_at"}
                ],
            },
        ]
    )

    def contradicts(new_rels, existing):
        # a new works_at contradicts any existing works_at of the source
        # (existing rows use the reference's source/target/relation_type
        # keys, reconciliation/relations.py contract)
        out = []
        for n in new_rels:
            for e in existing:
                if (
                    e["relation_type"] == n["relation_type"]
                    and e["source"] == n["source"]
                    and e["target"] != n["target"]
                ):
                    out.append(
                        {"source": e["source"], "target": e["target"],
                         "relation_type": e["relation_type"]}
                    )
        return out

    eng = MemoryEngine(
        spark, extractor=ext, relation_reconciler=contradicts, now_fn=tick
    )
    eng.add("bob works at acme", user_id="u")
    rel0 = eng.store.edges.where(F.col("edge_type") == "RELATION").count()
    assert rel0 == 1
    eng.add("bob works at globex", user_id="u")
    rels = (
        eng.store.edges.where(F.col("edge_type") == "RELATION")
        .join(
            eng.store.entities.select(
                F.col("id").alias("dst"), F.col("name").alias("target")
            ),
            "dst",
        )
        .collect()
    )
    # the acme relation was contradicted and deleted; globex remains
    assert [r["target"] for r in rels] == ["globex"]


def test_metric_refresh_populates_cached_columns(spark):
    ext = ScriptedExtractor(
        [
            {"facts": ["a knows b"],
             "entities": [{"name": "a", "entity_type": "person"},
                          {"name": "b", "entity_type": "person"}],
             "relations": [{"source": "a", "target": "b",
                            "relation_type": "knows"}]},
        ]
    )
    eng = MemoryEngine(spark, extractor=ext, now_fn=tick)
    eng.add("a knows b", user_id="u")
    assert eng._graph_dirty
    eng.refresh_metrics(with_betweenness=False, pagerank_iter=10)
    assert not eng._graph_dirty
    row = eng.store.memories.collect()[0]
    assert row["_pagerank"] is not None and row["_pagerank"] > 0
    assert row["_community"] is not None


def test_custom_prompts_reach_policies(spark):
    # P5 (reference `types.py:65-67`, `manager.py:251-253`): the fact
    # prompt rides semantic adds, the procedural prompt rides
    # memory_type='procedural' adds, the update prompt rides every
    # reconcile call; None means the policy's built-in prompt
    from grafeo_memory_spark.protocols import ScriptedReconciler

    ext = ScriptedExtractor(
        outputs=[
            {"facts": ["f1"], "entities": [], "relations": []},
            {"facts": ["f2"], "entities": [], "relations": []},
        ]
    )
    rec = ScriptedReconciler()
    eng = MemoryEngine(
        spark, extractor=ext, reconciler=rec, now_fn=tick,
        custom_fact_prompt="FACTS!", custom_update_prompt="UPDATE!",
        custom_procedural_prompt="STEPS!",
    )
    eng.add("semantic thing", user_id="u")
    assert ext.last_prompt == "FACTS!"
    assert rec.last_prompt == "UPDATE!"
    eng.add("procedural thing", user_id="u", memory_type="procedural")
    assert ext.last_prompt == "STEPS!"


def test_default_prompts_thread_through(spark):
    # P5 defaults (VERDICT r6 item 7): with no custom_*_prompt set, the
    # paraphrased templates in `prompts.py` ride the extract/reconcile
    # calls — fact template for semantic adds, procedural template for
    # memory_type='procedural', reconciliation template for every
    # reconcile.
    from grafeo_memory_spark import prompts
    from grafeo_memory_spark.protocols import ScriptedReconciler

    ext = ScriptedExtractor(
        outputs=[
            {"facts": ["f1"], "entities": [], "relations": []},
            {"facts": ["f2"], "entities": [], "relations": []},
        ]
    )
    rec = ScriptedReconciler()
    eng = MemoryEngine(spark, extractor=ext, reconciler=rec, now_fn=tick)
    eng.add("semantic thing", user_id="u")
    assert ext.last_prompt == prompts.FACT_EXTRACTION_SYSTEM
    assert rec.last_prompt == prompts.RECONCILIATION_SYSTEM
    eng.add("procedural thing", user_id="u", memory_type="procedural")
    assert ext.last_prompt == prompts.PROCEDURAL_EXTRACTION_SYSTEM


def test_prompt_aware_callable_never_double_called():
    # ADVICE r8: a TypeError raised INSIDE a prompt-aware callable's
    # body must propagate, not trigger the bare retry — a side-effecting
    # extractor (e.g. a billed LLM call) may not run twice
    from grafeo_memory_spark.manager import _call_with_optional_prompt

    calls = []

    def aware(text, *, prompt):
        calls.append(text)
        raise TypeError("bug inside the callable body")

    import pytest as _pytest

    with _pytest.raises(TypeError, match="bug inside"):
        _call_with_optional_prompt(aware, "t", prompt="P")
    assert calls == ["t"]


def test_unintrospectable_prompt_unaware_gets_bare_retry():
    # the bare retry exists ONLY for callables whose signature cannot
    # be inspected (builtins / C callables) and that turn out
    # prompt-unaware
    from grafeo_memory_spark.manager import _call_with_optional_prompt

    class Weird:
        calls = 0

        @property
        def __signature__(self):
            raise ValueError("no signature")

        def __call__(self, text):
            Weird.calls += 1
            return ["ok"]

    assert _call_with_optional_prompt(Weird(), "t", prompt="P") == ["ok"]
    assert Weird.calls == 1  # the prompt=... attempt fails BEFORE entry


def test_default_prompt_selection_table():
    from grafeo_memory_spark import prompts

    assert (
        prompts.default_extraction_prompt("semantic")
        is prompts.FACT_EXTRACTION_SYSTEM
    )
    assert (
        prompts.default_extraction_prompt("procedural")
        is prompts.PROCEDURAL_EXTRACTION_SYSTEM
    )
    assert (
        prompts.default_extraction_prompt("episodic")
        is prompts.EPISODIC_EXTRACTION_SYSTEM
    )
    # F6: NULL memory_type ≡ semantic, unknown types fall back to facts
    assert (
        prompts.default_extraction_prompt(None)
        is prompts.FACT_EXTRACTION_SYSTEM
    )
    assert (
        prompts.default_extraction_prompt("mystery")
        is prompts.FACT_EXTRACTION_SYSTEM
    )
    # every reference template key has a paraphrased twin with the same
    # format fields, so reference-targeted custom prompts drop in
    for tmpl, fields in [
        (prompts.FACT_EXTRACTION_USER, ["user_id", "text"]),
        (prompts.COMBINED_EXTRACTION_USER, ["user_id", "text"]),
        (prompts.ENTITY_EXTRACTION_USER, ["user_id", "facts"]),
        (prompts.RECONCILIATION_USER, ["new_facts", "existing_memories"]),
        (
            prompts.RELATION_RECONCILE_USER,
            ["existing_relations", "new_relations"],
        ),
        (prompts.SUMMARIZE_USER, ["count", "memories"]),
        (prompts.TEMPORAL_ANNOTATION_USER, ["today", "text", "facts"]),
        (prompts.COMMUNITY_SUMMARY_USER, ["entities", "relations"]),
    ]:
        for f in fields:
            assert "{" + f + "}" in tmpl, (tmpl[:40], f)


def test_no_prompts_keeps_bare_signature(spark):
    # prompt-unaware policies (positional-only extract/reconcile) must
    # keep working when no custom prompt is configured
    class BareExtractor:
        def extract(self, text):
            return {"facts": [text], "entities": [], "relations": []}

    class BareReconciler:
        def reconcile(self, facts, candidates):
            return {"decisions": [{"action": "ADD", "text": f} for f in facts]}

    eng = MemoryEngine(
        spark, extractor=BareExtractor(), reconciler=BareReconciler(),
        now_fn=tick,
    )
    res = eng.add("works without prompt kwarg", user_id="u")
    assert len(res.added_ids) == 1


def test_unintrospectable_prompt_unaware_extractor_retries_bare(spark):
    # ADVICE r7: when inspect.signature fails (builtins / C callables)
    # the engine optimistically passes prompt=;  a prompt-unaware
    # callable of that kind must get a bare retry, not a swallowed
    # TypeError that turns every add() into an empty extraction
    class CLikeExtract:
        # invalid __signature__ makes inspect.signature raise TypeError
        __signature__ = "not-a-signature"

        def __call__(self, text):
            return {"facts": [text], "entities": [], "relations": []}

    class CLikeExtractor:
        extract = CLikeExtract()

    eng = MemoryEngine(spark, extractor=CLikeExtractor(), now_fn=tick)
    res = eng.add("survives the optimistic prompt kwarg", user_id="u")
    assert len(res.added_ids) == 1


def test_package_top_level_exports():
    """`from grafeo_memory_spark import ...` mirrors the reference
    package surface (reference `__init__.py` exports)."""
    import grafeo_memory_spark as g

    for name in g.__all__:
        assert hasattr(g, name), name
    assert g.MemoryEngine is not None
    assert g.AsyncMemoryEngine is not None
