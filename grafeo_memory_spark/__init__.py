"""grafeo_memory_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of GrafeoDB/grafeo-memory.

Everything here is a Spark-first re-expression of the reference semantics
(see SURVEY.md): declarative DataFrame plans that Catalyst optimizes, no
translation of the reference's native execution engine.

Layout:
    session     — SparkSession builder tuned for local[N] and cluster use
    store       — table schemas + loaders for the memory-graph model
    operators/  — filters, joins (graph traversals), aggregates, windows
    functions/  — vector math, BM25/text, scoring columns, scalar helpers
    plans/      — composed pipelines (search, ingest, consolidation)
    graph/      — iterative graph algorithms (pagerank, LPA, betweenness)
    pipeline/   — training-data ops (dedup, ANN, text analysis, multimodal)
    streaming/  — Structured Streaming session-chain analogs
"""

__version__ = "0.1.0"

# Top-level surface mirroring the reference package's `__init__.py`
# exports (engine + async engine, config, protocols, store, scoring
# helpers, temporal hints) so `from grafeo_memory_spark import ...`
# works the way `from grafeo_memory import ...` does.
from grafeo_memory_spark.async_manager import AsyncMemoryEngine
from grafeo_memory_spark.embedding import HttpEmbedder
from grafeo_memory_spark.functions.scoring import (
    ScoreConfig,
    composite_score,
    cross_session_boost,
    recency_score,
    topology_boost,
    topology_score,
)
from grafeo_memory_spark.functions.temporal import (
    TemporalHints,
    classify_temporal,
    normalize_messages,
)
from grafeo_memory_spark.lifecycle import Decision, ExecResult
from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import (
    EmbeddingClient,
    Extractor,
    HashEmbedder,
    IdentityReranker,
    ImageDescriber,
    Reconciler,
    Reranker,
    RunUsage,
    ScoringReranker,
    ScriptedDescriber,
    ScriptedExtractor,
    ScriptedReconciler,
)
from grafeo_memory_spark.session import get_spark
from grafeo_memory_spark.store import Store, empty_store, load_store, save_store

__all__ = [
    "AsyncMemoryEngine",
    "Decision",
    "EmbeddingClient",
    "ExecResult",
    "Extractor",
    "HashEmbedder",
    "HttpEmbedder",
    "IdentityReranker",
    "ImageDescriber",
    "MemoryEngine",
    "Reconciler",
    "Reranker",
    "RunUsage",
    "ScoreConfig",
    "ScoringReranker",
    "ScriptedDescriber",
    "ScriptedExtractor",
    "ScriptedReconciler",
    "Store",
    "TemporalHints",
    "classify_temporal",
    "composite_score",
    "cross_session_boost",
    "empty_store",
    "get_spark",
    "load_store",
    "normalize_messages",
    "recency_score",
    "save_store",
    "topology_boost",
    "topology_score",
]
