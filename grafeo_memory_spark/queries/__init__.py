"""Registry of driver-facing queries and their DuckDB oracle SQL.

Every implemented operator from SURVEY.md §2 gets a named entry here via
the :func:`query` decorator; the driver runs the Spark callable and the
oracle SQL side-by-side at sf=0.01 and hash-compares the results.

Conventions (driver compare is column-name + value-hash based):
- alias every computed column identically in Spark and SQL;
- round floating scores to 6 decimals on BOTH sides;
- deterministic ORDER BY tie-breakers on unique keys for any LIMIT query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: bench-only rows, NOT part of the ≤50-entry driver correctness
#: window: the distributed scale shapes (driver_edge_threshold=0) whose
#: wall-clock must stay measured every round even though every fixture
#: is small enough to take the gated numpy fast paths (VERDICT r8 item
#: 2 — without these rows a regression in the 100-TB loop shape would
#: be invisible to every artifact). Correctness of these paths is
#: pinned by the randomized driver≡distributed parity tests in
#: tests/test_graph_algorithms.py.
BENCH_EXTRAS: dict[str, QueryFn] = {}

#: name of the flagship query run by ``entry()``
FLAGSHIP = "search_pipeline"


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a driver query; ``oracle`` is DuckDB SQL over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings), or None for ops that are not
    SQL-expressible (driver then records a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def bench_extra(name: str) -> Callable[[QueryFn], QueryFn]:
    """Register a bench-only query (see ``BENCH_EXTRAS``)."""

    def deco(fn: QueryFn) -> QueryFn:
        BENCH_EXTRAS[name] = fn
        return fn

    return deco


# Import for side effects: each module registers its queries.
# Registration order is snapshot order for the driver's 50-query
# correctness cap — vector_q/algo_q go FIRST so queries that have never
# had a correctness row (ivf_topk; VERDICT r3 item 1) can never fall off
# the end of the window again. The registry is kept at ≤50 entries total.
from grafeo_memory_spark.queries import (  # noqa: E402,F401
    vector_q,
    algo_q,
    corpus_q,
    graph_q,
    pipeline_ops_q,
    pipeline_q,
    relational_q,
    scoring_q,
    search_q,
)
