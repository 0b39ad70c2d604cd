"""Structured-output schemas for the LLM policy layer — the named
place a user porting a custom agent looks for the wire shapes (parity
surface for the reference's pydantic output models,
`src/grafeo_memory/schemas.py`; same class names and fields, stdlib
dataclasses instead of pydantic since the engine itself never calls an
LLM).

Each schema is the contract between an :mod:`grafeo_memory_spark.protocols`
implementation and the deterministic engine:

- :class:`ExtractionOutput` / :class:`FactsOutput` /
  :class:`EntitiesOutput` — what an ``Extractor.extract`` returns;
- :class:`ReconciliationOutput` — what ``Reconciler.reconcile`` returns;
- :class:`RelationReconciliationOutput` — relation-delete decisions;
- :class:`TemporalAnnotationOutput` — per-fact validity stamps;
- :class:`CommunitySummaryOutput` — Louvain community naming;
- :class:`SummarizeOutput` — consolidation output.

Every class round-trips ``from_dict``/``to_dict`` with validation
(unknown actions, wrong container types, missing keys raise
``SchemaError`` with the offending path), and ``json_schema()`` emits a
plain JSON-Schema dict — hand that to any structured-output client
(a pydantic-ai agent, a raw ``response_format`` call) and feed the
parsed reply back through ``from_dict`` to get the engine-side object.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field
from typing import Any

__all__ = [
    "SchemaError",
    "FactsOutput",
    "EntityItem",
    "RelationItem",
    "EntitiesOutput",
    "ExtractionOutput",
    "ReconciliationItem",
    "ReconciliationOutput",
    "RelationDeleteItem",
    "RelationReconciliationOutput",
    "TemporalAnnotation",
    "TemporalAnnotationOutput",
    "CommunitySummaryOutput",
    "SummarizeOutput",
    "RECONCILE_ACTIONS",
]

#: the reconciliation decision vocabulary the mutation executor accepts
#: (`lifecycle.execute_decisions`)
RECONCILE_ACTIONS = ("ADD", "UPDATE", "DELETE", "NONE")


class SchemaError(ValueError):
    """Raised when an LLM reply does not fit the declared schema."""


def _expect(cond: bool, path: str, msg: str) -> None:
    if not cond:
        raise SchemaError(f"{path}: {msg}")


def _str_list(v: Any, path: str) -> list[str]:
    _expect(isinstance(v, list), path, f"expected list, got {type(v).__name__}")
    for i, x in enumerate(v):
        _expect(isinstance(x, str), f"{path}[{i}]", "expected string")
    return list(v)


@dataclass
class _Base:
    def to_dict(self) -> dict[str, Any]:
        return asdict(self)

    @classmethod
    def json_schema(cls) -> dict[str, Any]:
        """Plain JSON-Schema dict for structured-output clients."""
        return _JSON_SCHEMAS[cls.__name__]


@dataclass
class FactsOutput(_Base):
    """Fact extraction: the list of atomic fact strings."""

    facts: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "FactsOutput":
        _expect(isinstance(d, dict), "$", "expected object")
        return cls(facts=_str_list(d.get("facts", []), "facts"))


@dataclass
class EntityItem(_Base):
    """One extracted entity."""

    name: str
    entity_type: str

    @classmethod
    def from_dict(cls, d: dict[str, Any], path: str = "$") -> "EntityItem":
        _expect(isinstance(d, dict), path, "expected object")
        for k in ("name", "entity_type"):
            _expect(isinstance(d.get(k), str), f"{path}.{k}", "expected string")
        return cls(name=d["name"], entity_type=d["entity_type"])


@dataclass
class RelationItem(_Base):
    """One extracted (source)-[relation_type]->(target) triple."""

    source: str
    target: str
    relation_type: str

    @classmethod
    def from_dict(cls, d: dict[str, Any], path: str = "$") -> "RelationItem":
        _expect(isinstance(d, dict), path, "expected object")
        for k in ("source", "target", "relation_type"):
            _expect(isinstance(d.get(k), str), f"{path}.{k}", "expected string")
        return cls(
            source=d["source"],
            target=d["target"],
            relation_type=d["relation_type"],
        )


@dataclass
class EntitiesOutput(_Base):
    """Entity/relation extraction output."""

    entities: list[EntityItem] = field(default_factory=list)
    relations: list[RelationItem] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "EntitiesOutput":
        _expect(isinstance(d, dict), "$", "expected object")
        ents = d.get("entities", [])
        rels = d.get("relations", [])
        _expect(isinstance(ents, list), "entities", "expected list")
        _expect(isinstance(rels, list), "relations", "expected list")
        return cls(
            entities=[
                EntityItem.from_dict(e, f"entities[{i}]")
                for i, e in enumerate(ents)
            ],
            relations=[
                RelationItem.from_dict(r, f"relations[{i}]")
                for i, r in enumerate(rels)
            ],
        )


@dataclass
class ExtractionOutput(_Base):
    """Combined fact + entity extraction (one LLM call) — the dict an
    :class:`~grafeo_memory_spark.protocols.Extractor` returns, typed."""

    facts: list[str] = field(default_factory=list)
    entities: list[EntityItem] = field(default_factory=list)
    relations: list[RelationItem] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ExtractionOutput":
        base = EntitiesOutput.from_dict(d)
        return cls(
            facts=_str_list(d.get("facts", []), "facts"),
            entities=base.entities,
            relations=base.relations,
        )


@dataclass
class ReconciliationItem(_Base):
    """One ADD/UPDATE/DELETE/NONE decision."""

    action: str
    text: str = ""
    target_memory_id: str | None = None

    @classmethod
    def from_dict(
        cls, d: dict[str, Any], path: str = "$"
    ) -> "ReconciliationItem":
        _expect(isinstance(d, dict), path, "expected object")
        action = d.get("action")
        _expect(
            action in RECONCILE_ACTIONS,
            f"{path}.action",
            f"expected one of {RECONCILE_ACTIONS}, got {action!r}",
        )
        text = d.get("text", "")
        _expect(isinstance(text, str), f"{path}.text", "expected string")
        tid = d.get("target_memory_id")
        _expect(
            tid is None or isinstance(tid, str),
            f"{path}.target_memory_id",
            "expected string or null",
        )
        return cls(action=action, text=text, target_memory_id=tid)


@dataclass
class ReconciliationOutput(_Base):
    """Memory reconciliation output — the dict a
    :class:`~grafeo_memory_spark.protocols.Reconciler` returns, typed."""

    decisions: list[ReconciliationItem] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ReconciliationOutput":
        _expect(isinstance(d, dict), "$", "expected object")
        ds = d.get("decisions", [])
        _expect(isinstance(ds, list), "decisions", "expected list")
        return cls(
            decisions=[
                ReconciliationItem.from_dict(x, f"decisions[{i}]")
                for i, x in enumerate(ds)
            ]
        )


@dataclass
class RelationDeleteItem(_Base):
    """One relation marked obsolete by relation reconciliation."""

    source: str
    target: str
    relation_type: str

    @classmethod
    def from_dict(
        cls, d: dict[str, Any], path: str = "$"
    ) -> "RelationDeleteItem":
        r = RelationItem.from_dict(d, path)
        return cls(
            source=r.source, target=r.target, relation_type=r.relation_type
        )


@dataclass
class RelationReconciliationOutput(_Base):
    """Relation reconciliation output: triples to delete."""

    delete: list[RelationDeleteItem] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "RelationReconciliationOutput":
        _expect(isinstance(d, dict), "$", "expected object")
        dl = d.get("delete", [])
        _expect(isinstance(dl, list), "delete", "expected list")
        return cls(
            delete=[
                RelationDeleteItem.from_dict(x, f"delete[{i}]")
                for i, x in enumerate(dl)
            ]
        )


@dataclass
class TemporalAnnotation(_Base):
    """Validity stamps for one extracted fact (index into the facts
    list; ISO-8601 strings or null)."""

    fact_index: int
    valid_at: str | None = None
    invalid_at: str | None = None

    @classmethod
    def from_dict(
        cls, d: dict[str, Any], path: str = "$"
    ) -> "TemporalAnnotation":
        _expect(isinstance(d, dict), path, "expected object")
        ix = d.get("fact_index")
        _expect(
            isinstance(ix, int) and not isinstance(ix, bool),
            f"{path}.fact_index",
            "expected integer",
        )
        out = {}
        for k in ("valid_at", "invalid_at"):
            v = d.get(k)
            _expect(
                v is None or isinstance(v, str),
                f"{path}.{k}",
                "expected string or null",
            )
            out[k] = v
        return cls(fact_index=ix, **out)


@dataclass
class TemporalAnnotationOutput(_Base):
    """Temporal annotation output for a batch of facts."""

    annotations: list[TemporalAnnotation] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "TemporalAnnotationOutput":
        _expect(isinstance(d, dict), "$", "expected object")
        xs = d.get("annotations", [])
        _expect(isinstance(xs, list), "annotations", "expected list")
        return cls(
            annotations=[
                TemporalAnnotation.from_dict(x, f"annotations[{i}]")
                for i, x in enumerate(xs)
            ]
        )


@dataclass
class CommunitySummaryOutput(_Base):
    """Name + summary for one detected community."""

    name: str
    summary: str

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "CommunitySummaryOutput":
        _expect(isinstance(d, dict), "$", "expected object")
        for k in ("name", "summary"):
            _expect(isinstance(d.get(k), str), k, "expected string")
        return cls(name=d["name"], summary=d["summary"])


@dataclass
class SummarizeOutput(_Base):
    """Consolidation output: the replacement memory texts."""

    memories: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "SummarizeOutput":
        _expect(isinstance(d, dict), "$", "expected object")
        return cls(memories=_str_list(d.get("memories", []), "memories"))


def _arr(items: dict[str, Any]) -> dict[str, Any]:
    return {"type": "array", "items": items}


def _obj(props: dict[str, Any], required: list[str]) -> dict[str, Any]:
    return {
        "type": "object",
        "properties": props,
        "required": required,
        "additionalProperties": False,
    }


_S = {"type": "string"}
_SN = {"type": ["string", "null"]}
_ENTITY = _obj({"name": _S, "entity_type": _S}, ["name", "entity_type"])
_RELATION = _obj(
    {"source": _S, "target": _S, "relation_type": _S},
    ["source", "target", "relation_type"],
)

_JSON_SCHEMAS: dict[str, dict[str, Any]] = {
    "FactsOutput": _obj({"facts": _arr(_S)}, ["facts"]),
    "EntityItem": _ENTITY,
    "RelationItem": _RELATION,
    "EntitiesOutput": _obj(
        {"entities": _arr(_ENTITY), "relations": _arr(_RELATION)},
        ["entities"],
    ),
    "ExtractionOutput": _obj(
        {
            "facts": _arr(_S),
            "entities": _arr(_ENTITY),
            "relations": _arr(_RELATION),
        },
        ["facts"],
    ),
    "ReconciliationItem": _obj(
        {
            "action": {"type": "string", "enum": list(RECONCILE_ACTIONS)},
            "text": _S,
            "target_memory_id": _SN,
        },
        ["action"],
    ),
    "ReconciliationOutput": _obj(
        {
            "decisions": _arr(
                _obj(
                    {
                        "action": {
                            "type": "string",
                            "enum": list(RECONCILE_ACTIONS),
                        },
                        "text": _S,
                        "target_memory_id": _SN,
                    },
                    ["action"],
                )
            )
        },
        ["decisions"],
    ),
    "RelationDeleteItem": _RELATION,
    "RelationReconciliationOutput": _obj(
        {"delete": _arr(_RELATION)}, ["delete"]
    ),
    "TemporalAnnotation": _obj(
        {
            "fact_index": {"type": "integer"},
            "valid_at": _SN,
            "invalid_at": _SN,
        },
        ["fact_index"],
    ),
    "TemporalAnnotationOutput": _obj(
        {
            "annotations": _arr(
                _obj(
                    {
                        "fact_index": {"type": "integer"},
                        "valid_at": _SN,
                        "invalid_at": _SN,
                    },
                    ["fact_index"],
                )
            )
        },
        ["annotations"],
    ),
    "CommunitySummaryOutput": _obj(
        {"name": _S, "summary": _S}, ["name", "summary"]
    ),
    "SummarizeOutput": _obj({"memories": _arr(_S)}, ["memories"]),
}
