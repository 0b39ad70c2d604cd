"""Filter/predicate operators (SURVEY.md §2.2).

All of these compile to plain Catalyst Column expressions, so Parquet
predicate pushdown and partition pruning apply automatically — the Spark
analog of the reference's property indexes (`manager.py:129-133`).
"""

from __future__ import annotations

from collections.abc import Mapping
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "scope_filter",
    "compile_filters",
    "not_expired",
    "time_range",
    "valid_at_point",
    "min_score",
]


def scope_filter(
    user_id: str | None = None,
    agent_id: str | None = None,
    run_id: str | None = None,
    graph_name: str | None = None,
    **extra: Any,
) -> Column:
    """F1 — conjunctive equality scope filter (`_build_filters`,
    reference `manager.py:164-175`)."""
    pairs = {
        "user_id": user_id,
        "agent_id": agent_id,
        "run_id": run_id,
        "graph_name": graph_name,
        **extra,
    }
    conds = [F.col(k) == F.lit(v) for k, v in pairs.items() if v is not None]
    if not conds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, conds)


_OPS = {
    "$gt": lambda c, v: c > F.lit(v),
    "$gte": lambda c, v: c >= F.lit(v),
    "$lt": lambda c, v: c < F.lit(v),
    "$lte": lambda c, v: c <= F.lit(v),
    "$ne": lambda c, v: c.isNull() | (c != F.lit(v)),
    "$in": lambda c, v: c.isin(list(v)),
    "$nin": lambda c, v: c.isNull() | ~c.isin(list(v)),
    "$contains": lambda c, v: c.contains(str(v)),
}


def compile_filters(filters: Mapping[str, Any]) -> Column:
    """F2 — Mongo-style operator predicates (`_matches_filters`,
    reference `search/vector.py:351-381`).

    Semantics preserved from the reference:
    - plain value → equality;
    - ``{"$op": v}`` dicts → the operator table above;
    - ``$ne`` / ``$nin`` are true when the field is missing (NULL) —
      the reference's dict-``get`` returns None which *passes* those;
    - ``memory_type`` is back-compat defaulted: missing ≡ "semantic"
      (`search/vector.py:360-363`).
    """
    conds: list[Column] = []
    for field, spec in filters.items():
        col = F.col(field)
        if field == "memory_type":
            col = F.coalesce(col, F.lit("semantic"))
        if isinstance(spec, Mapping):
            for op, val in spec.items():
                if op not in _OPS:
                    raise ValueError(f"unsupported filter operator: {op}")
                conds.append(_OPS[op](col, val))
        else:
            conds.append(col == F.lit(spec))
    if not conds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, conds)


def not_expired(include_expired: bool = False, col: str = "expired_at") -> Column:
    """F3 — soft-expiry filter (`search/vector.py:54`)."""
    if include_expired:
        return F.lit(True)
    return F.col(col).isNull()


def time_range(
    time_after: int | None = None,
    time_before: int | None = None,
    col: str = "created_at",
) -> Column:
    """F4 — created_at range (`manager.py:713-716`); Parquet min/max
    pruning applies."""
    cond = F.lit(True)
    if time_after is not None:
        cond = cond & (F.col(col) >= F.lit(time_after))
    if time_before is not None:
        cond = cond & (F.col(col) <= F.lit(time_before))
    return cond


def valid_at_point(
    pit: int, valid_col: str = "valid_at", invalid_col: str = "invalid_at"
) -> Column:
    """F5 — bi-temporal point-in-time (`_valid_at_point`,
    reference `manager.py:2031-2040`): permissive on missing valid_at."""
    v, iv = F.col(valid_col), F.col(invalid_col)
    return v.isNull() | ((v <= F.lit(pit)) & (iv.isNull() | (iv > F.lit(pit))))


def min_score(threshold: float, col: str = "score") -> Column:
    """F7 — min-score gate (`manager.py:773-784`)."""
    return F.col(col) >= F.lit(threshold)


def point_lookup(df: DataFrame, node_id: int, id_col: str = "id") -> DataFrame:
    """S3 — node by id (`get_node`, reference `protocol.py:68`). The
    equality predicate prunes row groups via Parquet min/max stats; in
    pipelines prefer joins over per-row lookups (no N+1 — SURVEY §4 O2)."""
    return df.where(F.col(id_col) == F.lit(node_id))


def find_by_property(df: DataFrame, name: str, value) -> DataFrame:
    """S4 — node ids by property value (`find_nodes_by_property`,
    reference `protocol.py:76`)."""
    return df.where(F.col(name) == F.lit(value)).select("id")
