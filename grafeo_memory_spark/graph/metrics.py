"""G4 — dirty-flag metric cache (reference `manager.py:1585-1644`):
PageRank / betweenness / community ids computed lazily over the
Memory∪Entity subgraph and cached as ``_pagerank`` / ``_betweenness`` /
``_community`` columns on the memories table, recomputed only when the
graph changed since the last read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grafeo_memory_spark.graph.algorithms import (
    betweenness_centrality,
    label_propagation,
    pagerank,
)
from grafeo_memory_spark.store import Store

#: edge types forming the metric graph (reference caches metrics on
#: Memory and Entity nodes only, manager.py:1616-1639)
METRIC_EDGE_TYPES = ("HAS_ENTITY", "RELATION", "SUPERSEDES", "LEADS_TO")


def compute_metrics(
    store: Store,
    *,
    pagerank_iter: int = 100,
    pagerank_tol: float = 1e-6,
    lpa_iter: int = 20,
    with_betweenness: bool = True,
    betweenness_sources: list[int] | None = None,
    betweenness_max_depth: int = 50,
) -> DataFrame:
    """Run G1-G3 over the memory/entity subgraph; returns
    (node_id, _pagerank, _betweenness, _community).

    ``betweenness_max_depth`` caps the Brandes BFS; the BFS already
    stops early on an empty frontier, so the cap only truncates paths
    longer than it. LEADS_TO session chains grow one hop per ``add()``
    and routinely exceed 10, so the default is generous (50) and the
    knob is exposed — a truncated run stores approximate values in the
    ``_betweenness`` cache without marking them.
    """
    g = store.edges.where(F.col("edge_type").isin(list(METRIC_EDGE_TYPES)))
    pr = pagerank(g, max_iter=pagerank_iter, tol=pagerank_tol).withColumnRenamed(
        "pagerank", "_pagerank"
    )
    com = label_propagation(g, max_iter=lpa_iter).withColumnRenamed(
        "community", "_community"
    )
    out = pr.join(com, "node_id", "full_outer")
    if with_betweenness:
        bt = betweenness_centrality(
            g, sources=betweenness_sources, max_depth=betweenness_max_depth
        ).withColumnRenamed("betweenness", "_betweenness")
        out = out.join(bt, "node_id", "full_outer")
    else:
        out = out.withColumn("_betweenness", F.lit(None).cast("double"))
    return out.select("node_id", "_pagerank", "_betweenness", "_community")


def apply_metrics(store: Store, metrics: DataFrame) -> Store:
    """Write the cached metric columns onto memories (S9 batch property
    set, reference `manager.py:1616-1639`): broadcast-join overwrite,
    keeping old values where the new computation produced no metric
    (coalesce new over old per column)."""
    m = metrics.withColumnRenamed("node_id", "id")
    old_cols = {c for c in ("_pagerank", "_betweenness", "_community")
                if c in store.memories.columns}
    base = store.memories
    for c in old_cols:
        base = base.withColumnRenamed(c, f"_old{c}")
    memories = base.join(F.broadcast(m), "id", "left")
    for c in ("_pagerank", "_betweenness", "_community"):
        if c in old_cols:
            memories = memories.withColumn(
                c, F.coalesce(F.col(c), F.col(f"_old{c}"))
            ).drop(f"_old{c}")
    memories = memories.withColumn(
        "_community", F.col("_community").cast("int")
    )
    return store.with_(memories=memories)
