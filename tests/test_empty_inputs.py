"""Empty-input robustness: every operator must return an empty (or
identity) result on empty tables rather than erroring — the fresh-store
bootstrap path (S1) exercises all of these on first use."""

from __future__ import annotations

from pyspark.sql import functions as F

from grafeo_memory_spark.graph.algorithms import (
    betweenness_centrality,
    label_propagation,
    pagerank,
)
from grafeo_memory_spark.operators.traversals import (
    expand_chain,
    relation_triples,
    topology_aggregate,
)
from grafeo_memory_spark.operators.windows import drop_newest
from grafeo_memory_spark.store import empty_store

EDGE_SCHEMA = (
    "edge_id long, src long, dst long, edge_type string, relation_type string"
)


def test_graph_algorithms_on_empty_graph(spark):
    edges = spark.createDataFrame([], EDGE_SCHEMA)
    assert pagerank(edges, max_iter=3).count() == 0
    assert label_propagation(edges, max_iter=3).count() == 0
    assert betweenness_centrality(edges).count() == 0
    # and the forced-distributed loops (driver_edge_threshold=0)
    assert pagerank(edges, max_iter=3, driver_edge_threshold=0).count() == 0
    assert (
        label_propagation(edges, max_iter=3, driver_edge_threshold=0).count()
        == 0
    )
    assert betweenness_centrality(edges, driver_edge_threshold=0).count() == 0


def test_traversals_on_empty_store(spark):
    s = empty_store(spark)
    assert relation_triples(s.edges, s.entities).count() == 0
    assert topology_aggregate(s.memories, s.edges).count() == 0
    seed = spark.createDataFrame([(1,)], "node_id long")
    assert expand_chain(s.edges, seed, "LEADS_TO", max_depth=3).count() == 0


def test_drop_newest_empty(spark):
    df = spark.createDataFrame([], "id long, created_at long")
    assert drop_newest(df, 5, tiebreak="id").count() == 0
    assert drop_newest(df, 0, tiebreak="id").count() == 0


def test_search_on_fresh_store(spark):
    from grafeo_memory_spark.manager import MemoryEngine

    eng = MemoryEngine(spark, now_fn=lambda: 1_000_000)
    got = eng.search("anything", user_id="nobody").collect()
    assert got == []
    assert eng.stats()["total_memories"] == 0


def test_dedup_ops_on_empty_documents(spark):
    from grafeo_memory_spark.pipeline.dedup import (
        exact_dedup,
        jaccard_similarity_join,
        minhash_signature,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(docs, "text", "doc_id").count() == 0
    assert minhash_signature(docs, "text", "doc_id").count() == 0
    assert (
        jaccard_similarity_join(docs, "text", "doc_id", df_cap=64).count() == 0
    )


def test_round5_ops_on_empty_inputs(spark):
    from pyspark.sql import functions as F

    from grafeo_memory_spark.graph.algorithms import (
        adamic_adar,
        k_core,
        triangle_count,
    )
    from grafeo_memory_spark.operators.asof import asof_join
    from grafeo_memory_spark.operators.skew import (
        salted_join,
        split_skew_join,
    )
    from grafeo_memory_spark.operators.windows import sessionize
    from grafeo_memory_spark.sources.layout import zvalue

    edges = spark.createDataFrame([], "src long, dst long")
    ev = spark.createDataFrame([], "k long, ts long, v double")
    right = ev.select("k", "ts", F.col("v").alias("rv"))
    assert triangle_count(edges).count() == 0
    assert adamic_adar(edges).count() == 0
    assert k_core(edges, 2).count() == 0
    assert sessionize(ev, ["k"], "ts", 10).count() == 0
    assert asof_join(ev, right, on="k", ts_col="ts").count() == 0
    assert salted_join(ev, right, "k").count() == 0
    assert (
        split_skew_join(
            ev, ev.select("k", F.col("v").alias("rv")), "k", hot_threshold=1
        ).count()
        == 0
    )
    assert ev.select(zvalue(ev, ["ts", "v"], bits=3)).count() == 0


def test_new_corpus_ops_on_empty_inputs(spark):
    from grafeo_memory_spark.operators.range_join import range_join
    from grafeo_memory_spark.pipeline.bloom import bloom_build
    from grafeo_memory_spark.pipeline.chunking import chunk_documents
    from grafeo_memory_spark.pipeline.tokenizer import (
        bpe_encode,
        bpe_train,
        word_counts,
    )
    from grafeo_memory_spark.pipeline.urls import domain_stats

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert chunk_documents(docs, max_tokens=16).count() == 0
    assert word_counts(docs, "text").count() == 0
    model = bpe_train(word_counts(docs, "text"), 10)
    assert model.merges == []
    assert bpe_encode(docs, "text", model).count() == 0
    bf = bloom_build(docs.withColumnRenamed("text", "key"), "key", n_items=1)
    assert all(w == 0 for w in bf.words)
    assert domain_stats(
        spark.createDataFrame([], "id long, url string"), "url"
    ).count() == 0
    pts = spark.createDataFrame([], "pid long, x double")
    ivs = spark.createDataFrame([], "iid long, lo double, hi double")
    assert range_join(
        pts, ivs, point_col="x", lo_col="lo", hi_col="hi"
    ).count() == 0
