"""Structured-output schemas (schemas.py): round-trip, validation
errors with paths, the reconciliation action vocabulary, and JSON-
Schema emission — the named contract surface between a custom LLM
agent and the deterministic engine (reference schemas.py parity)."""

from __future__ import annotations

import pytest

from grafeo_memory_spark.schemas import (
    RECONCILE_ACTIONS,
    CommunitySummaryOutput,
    EntitiesOutput,
    ExtractionOutput,
    FactsOutput,
    ReconciliationOutput,
    RelationReconciliationOutput,
    SchemaError,
    SummarizeOutput,
    TemporalAnnotationOutput,
)


class TestRoundTrip:
    def test_extraction(self):
        d = {
            "facts": ["alice moved to berlin"],
            "entities": [{"name": "alice", "entity_type": "person"}],
            "relations": [
                {"source": "alice", "target": "berlin",
                 "relation_type": "LIVES_IN"}
            ],
        }
        out = ExtractionOutput.from_dict(d)
        assert out.to_dict() == d
        assert out.entities[0].name == "alice"

    def test_defaults_fill_missing_optionals(self):
        out = ExtractionOutput.from_dict({"facts": []})
        assert out.entities == [] and out.relations == []
        assert EntitiesOutput.from_dict({"entities": []}).relations == []

    def test_reconciliation(self):
        d = {
            "decisions": [
                {"action": "ADD", "text": "x", "target_memory_id": None},
                {"action": "UPDATE", "text": "y", "target_memory_id": "7"},
                {"action": "NONE", "text": "", "target_memory_id": None},
            ]
        }
        out = ReconciliationOutput.from_dict(d)
        assert [x.action for x in out.decisions] == ["ADD", "UPDATE", "NONE"]
        assert out.to_dict() == d

    def test_temporal_and_summaries(self):
        t = TemporalAnnotationOutput.from_dict(
            {"annotations": [{"fact_index": 0, "valid_at": "2026-01-01"}]}
        )
        assert t.annotations[0].invalid_at is None
        assert FactsOutput.from_dict({"facts": ["a"]}).facts == ["a"]
        assert SummarizeOutput.from_dict({"memories": ["m"]}).memories == ["m"]
        c = CommunitySummaryOutput.from_dict({"name": "n", "summary": "s"})
        assert (c.name, c.summary) == ("n", "s")
        r = RelationReconciliationOutput.from_dict(
            {"delete": [{"source": "a", "target": "b",
                         "relation_type": "KNOWS"}]}
        )
        assert r.delete[0].relation_type == "KNOWS"


class TestValidation:
    def test_bad_action_names_path(self):
        with pytest.raises(SchemaError, match=r"decisions\[1\].action"):
            ReconciliationOutput.from_dict(
                {"decisions": [{"action": "ADD"}, {"action": "MERGE"}]}
            )

    def test_action_vocabulary_matches_executor(self):
        assert RECONCILE_ACTIONS == ("ADD", "UPDATE", "DELETE", "NONE")

    def test_wrong_types_raise_with_path(self):
        with pytest.raises(SchemaError, match=r"facts\[0\]"):
            FactsOutput.from_dict({"facts": [1]})
        with pytest.raises(SchemaError, match=r"entities\[0\].name"):
            EntitiesOutput.from_dict({"entities": [{"entity_type": "x"}]})
        with pytest.raises(SchemaError, match="fact_index"):
            TemporalAnnotationOutput.from_dict(
                {"annotations": [{"fact_index": True}]}
            )
        with pytest.raises(SchemaError, match="expected object"):
            ExtractionOutput.from_dict([])


class TestJsonSchema:
    def test_schemas_are_valid_shapes(self):
        js = ExtractionOutput.json_schema()
        assert js["type"] == "object"
        assert set(js["properties"]) == {"facts", "entities", "relations"}
        assert js["required"] == ["facts"]
        dec = ReconciliationOutput.json_schema()
        action = dec["properties"]["decisions"]["items"]["properties"]["action"]
        assert action["enum"] == list(RECONCILE_ACTIONS)

    def test_scripted_extractor_output_fits_schema(self):
        """The repo's deterministic mock must satisfy the declared
        contract — the same guarantee a custom agent gets."""
        from grafeo_memory_spark.protocols import ScriptedExtractor

        ex = ScriptedExtractor(
            outputs=[{"facts": ["f"], "entities": [], "relations": []}]
        )
        out = ex.extract("hello")
        typed = ExtractionOutput.from_dict(out)
        assert typed.facts == ["f"]
