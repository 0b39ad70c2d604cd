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
