#!/usr/bin/env python
"""Scale probe: run the headline corpus operators at 1× and N× the
sf0.1 documents table (ids remapped per replica, so dedup can't
collapse the copies) and report per-op wall-clock plus the observed
scaling exponent — evidence that the plans behave linearly, not
quadratically, as data grows toward cluster scale.

An exponent near 1.0 means doubling the data doubles the time (scan/
shuffle bound — what every op here is designed to be); meaningfully
above 1 flags a pair blowup or driver bottleneck. The probe prints one
JSON line like bench.py.

Run: python scripts/scale_probe.py [N]   (default 4)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _execute(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    # optional comma-separated op filter (argv[2]): re-measure specific
    # rows solo after a transient (steal spike, warm-up pressure)
    # without paying for the full ~25-minute sweep
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    from pyspark.sql import functions as F

    from grafeo_memory_spark.pipeline.decontamination import decontaminate
    from grafeo_memory_spark.pipeline.dedup import (
        dedup_spans_global,
        exact_dedup,
        near_dup_pairs_minhash,
        simhash_near_dup,
    )
    from grafeo_memory_spark.pipeline.sampling import stratified_sample
    from grafeo_memory_spark.session import get_spark
    from grafeo_memory_spark.sources.tables import load_table, spread

    spark = get_spark(app_name="scale-probe")
    base = spread(load_table(spark, SF_DIR, "documents")).localCheckpoint()
    n_docs = base.count()

    def replicate(times: int):
        """times copies with disjoint ids and per-copy text salt (so
        near-dup work scales with data instead of collapsing)."""
        parts = []
        for i in range(times):
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(f" replica{i}")).alias(
                        "text"
                    ),
                    "source",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.localCheckpoint()

    bench = base.orderBy("doc_id").limit(10).select(
        F.col("text").alias("prompt")
    ).localCheckpoint()

    ops = {
        "exact_dedup": lambda df: exact_dedup(df, "text", "doc_id"),
        "near_dup_pairs": lambda df: near_dup_pairs_minhash(
            df, "text", "doc_id", jaccard_threshold=0.5
        ),
        "simhash_near_dup": lambda df: simhash_near_dup(
            df, "text", "doc_id", max_hamming=3
        ),
        "span_dedup": lambda df: dedup_spans_global(
            df, "text", "doc_id", span=5, sep=" "
        ),
        "decontaminate": lambda df: decontaminate(
            df, bench, text_col="text", id_col="doc_id",
            bench_text_col="prompt",
        ),
        "stratified_sample": lambda df: stratified_sample(
            df, "source", {"src0": 0.5, "src1": 0.5}, id_col="doc_id"
        ),
    }

    # map-only tokenization-side ops: model/filter are trained once on
    # the base corpus (fixed cost outside the timed loop); the probe
    # measures how chunk/encode/probe scale with corpus size
    from grafeo_memory_spark.pipeline.bloom import (
        bloom_build,
        bloom_filter_unseen,
    )
    from grafeo_memory_spark.pipeline.chunking import chunk_documents
    from grafeo_memory_spark.pipeline.dedup import content_hash
    from grafeo_memory_spark.pipeline.tokenizer import (
        bpe_encode,
        bpe_train,
        word_counts,
    )

    bpe = bpe_train(word_counts(base, "text"), 200)
    bloom = bloom_build(
        base.withColumn("key", content_hash(F.col("text"))), "key", fpp=0.01
    )
    ops["chunk_documents"] = lambda df: chunk_documents(
        df.select("doc_id", "text"), max_tokens=64, overlap=8
    )
    ops["bpe_encode"] = lambda df: bpe_encode(df, "text", bpe).select(
        "doc_id", F.size("token_ids").alias("n_tokens")
    )
    ops["bloom_probe"] = lambda df: bloom_filter_unseen(
        df.withColumn("key", content_hash(F.col("text"))), "key", bloom
    )

    # hybrid text retrieval (r11): the scale-bearing legs of the
    # hybrid_search plan — inverted-index build (tokenize + explode +
    # two groupBys), the BM25 term-stats aggregate over the candidate
    # postings, the two capped rank legs, and the RRF fuse. The exact
    # cosine re-rank of the driver query is top-k-bounded (O(k) rows),
    # so it cannot carry an exponent and is left out.
    from grafeo_memory_spark.functions.text import (
        bm25_scores,
        build_text_index,
        rank_by,
        rrf_fuse,
    )

    def _hybrid_bm25(df):
        index = build_text_index(df, "doc_id", "text")
        lex = rank_by(
            bm25_scores(index, ["spark", "query", "window"]),
            F.col("bm25"), "id", "rank_a", limit=100,
        )
        rec = rank_by(
            df.select(F.col("doc_id").alias("id")),
            F.col("id").cast("double"), "id", "rank_b", limit=100,
        )
        return rrf_fuse(lex, rec)

    ops["hybrid_bm25_rrf"] = _hybrid_bm25

    # r12: the composed CorpusRecipe cascade as ONE plan (clean →
    # quality → exact dedup → minhash fuzzy dedup → decontaminate →
    # BPE tokenize). Every stage has a solo exponent above; this row
    # probes stage COUPLING — checkpoint storage pressure between
    # tiers and skew interactions — which no solo row can see. The
    # tokenizer trains on the surviving corpus inside the call, so its
    # word-count shuffle scales with the data like the real pipeline.
    from grafeo_memory_spark.pipeline.corpus import (
        CorpusRecipe,
        build_training_corpus,
    )

    def _corpus_recipe(df):
        out_df, _ = build_training_corpus(
            df,
            text_col="text",
            id_col="doc_id",
            benchmark=bench,
            bench_text_col="prompt",
            recipe=CorpusRecipe(tokenize=True, bpe_merges=200),
        )
        return out_df

    ops["corpus_recipe_e2e"] = _corpus_recipe

    # embedding-based ops (r9): ivf_assign is the map-only codebook
    # argmax (fold-budget rework r9 — norm projected once per row,
    # centroid norms driver-side literals), semdedup the full
    # cluster→pair→CC→keep pipeline with the adaptive max(8, n//128)
    # codebook derived per input, exactly like the driver query
    from grafeo_memory_spark.pipeline.ann import ivf_assign
    from grafeo_memory_spark.pipeline.dedup import semdedup

    emb_base = spread(load_table(spark, SF_DIR, "embeddings")).localCheckpoint()

    def replicate_emb(times: int):
        parts = [
            emb_base.select(
                (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                # rotate one coordinate per replica so near-dup pairs
                # scale with the data instead of collapsing across copies
                F.concat(
                    F.slice(F.col("embedding"), i + 1, 10_000),
                    F.slice(F.col("embedding"), 1, i),
                ).alias("embedding"),
                "label",
            )
            for i in range(times)
        ]
        out_ = parts[0]
        for p in parts[1:]:
            out_ = out_.unionByName(p)
        return out_.localCheckpoint()

    def _centroids(df):
        n_rows = df.count()
        k_c = min(max(8, n_rows // 128), 100_000)
        return [
            (i, [float(x) for x in r[0]])
            for i, r in enumerate(
                df.orderBy("vec_id").limit(k_c).select("embedding").collect()
            )
        ]

    def _ivf_assign(df):
        return ivf_assign(
            df, _centroids(df), vec_col="embedding", id_col="vec_id",
            with_sim=True,
        )

    def _semdedup(df):
        return semdedup(
            df, _centroids(df), eps=0.35, vec_col="embedding",
            id_col="vec_id",
        )

    emb_ops = {"ivf_assign": _ivf_assign, "semdedup": _semdedup}

    # events-based ops: replicate with disjoint user ids so sessions and
    # as-of matches scale with the data instead of densifying one key
    from grafeo_memory_spark.operators.asof import asof_join
    from grafeo_memory_spark.operators.windows import sessionize

    ev_base = spread(load_table(spark, SF_DIR, "events")).localCheckpoint()

    def replicate_events(times: int):
        parts = [
            ev_base.select(
                (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
                "event_type",
                "value",
            )
            for i in range(times)
        ]
        out_ = parts[0]
        for p in parts[1:]:
            out_ = out_.unionByName(p)
        return out_.localCheckpoint()

    def _sessionize(ev):
        gap = F.expr("INTERVAL 30 MINUTES")
        return sessionize(ev, ["user_id"], "ts", gap, tiebreak="event_id")

    def _asof(ev):
        purchases = ev.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        )
        clicks = ev.where(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("value").alias("click_value")
        )
        return asof_join(
            purchases, clicks, on="user_id", ts_col="ts",
            value_cols=["click_value"],
        )

    # graph ops: replicate RELATION edges with disjoint node-id ranges
    from grafeo_memory_spark.graph.algorithms import triangle_count
    from grafeo_memory_spark.sources.tables import fixtures_dir

    edge_base = (
        spark.read.parquet(os.path.join(fixtures_dir(SF_DIR), "edges.parquet"))
        .where(F.col("edge_type") == "RELATION")
        .select("src", "dst")
        .localCheckpoint()
    )

    def replicate_edges(times: int):
        parts = [
            edge_base.select(
                (F.col("src") + F.lit(i * 100_000_000)).alias("src"),
                (F.col("dst") + F.lit(i * 100_000_000)).alias("dst"),
            )
            for i in range(times)
        ]
        out_ = parts[0]
        for p in parts[1:]:
            out_ = out_.unionByName(p)
        return out_.localCheckpoint()

    event_ops = {"sessionize": _sessionize, "asof_join": _asof}
    # force the distributed plans: the probe measures the 100-TB wedge
    # shapes, not the r9 gated numpy fast paths
    from grafeo_memory_spark.communities import connected_components
    from grafeo_memory_spark.graph.algorithms import (
        adamic_adar,
        label_propagation,
    )

    def _cc(e):
        # the disjoint replica copies keep component count scaling with
        # data while round count stays ~log(diameter), so the exponent
        # isolates the per-round neighbor-min + pointer-jump shuffles
        sym = e.select(F.col("src").alias("node_id"), F.col("dst").alias("nbr"))
        sym = sym.unionByName(
            e.select(F.col("dst").alias("node_id"), F.col("src").alias("nbr"))
        ).distinct()
        return connected_components(sym, driver_edge_threshold=0)

    # r11: the last two forced-distributed loops without an exponent —
    # pagerank's power iteration and the multi-source Brandes BFS.
    from grafeo_memory_spark.graph.algorithms import (
        betweenness_centrality,
        louvain,
        pagerank,
    )

    # 8 base source ids, re-selected inside each replica via the
    # replica offset (src % 100_000_000 recovers the base-id RESIDUE):
    # the N× run BFSes 8 sources per replica, so sampled-Brandes work
    # scales WITH the data — the honest at-scale reading of a fixed
    # sampling rate — instead of pinning all sources into replica 0.
    # The cut is computed in the SAME residue space as the filter:
    # fixture node ids start at exactly 100_000_000, so an absolute-id
    # cut would pass every row (caught when the first N=8 run OOMed on
    # a 26k-source all-pairs-ish Brandes).
    _src_cut = int(
        edge_base.select((F.col("src") % 100_000_000).alias("b"))
        .distinct().orderBy("b").limit(8)
        .agg(F.max("b")).collect()[0][0]
    )

    def _betweenness(e):
        srcs = [
            int(r[0])
            for r in e.select("src")
            .where((F.col("src") % 100_000_000) <= _src_cut)
            .distinct()
            .collect()
        ]
        return betweenness_centrality(
            e, sources=srcs, max_depth=6, driver_edge_threshold=0
        )

    edge_ops = {
        "triangle_count": lambda e: triangle_count(
            e, driver_edge_threshold=0
        ),
        "adamic_adar": lambda e: adamic_adar(
            e, top_k=20, driver_edge_threshold=0
        ),
        # r10: the two remaining per-round loop shapes without an
        # exponent — pointer-jumping CC and the fused one-exchange LPA
        "connected_components": _cc,
        "lpa": lambda e: label_propagation(
            e, max_iter=5, driver_edge_threshold=0
        ),
        # fixed round count (tol=0.0) so 1× and N× run identical
        # iteration counts and the exponent isolates the per-round
        # message shuffle, not convergence dynamics
        "pagerank": lambda e: pagerank(
            e, max_iter=8, tol=0.0, driver_edge_threshold=0
        ),
        "betweenness": _betweenness,
        # r11: the forced phase-1 coarsening loop (quotient carried
        # across merge rounds) + driver finish
        "louvain_coarsen": lambda e: louvain(
            e, max_iter=10, min_distributed_rounds=2
        ),
    }

    small = replicate(1)
    large = replicate(n)
    ev_small, ev_large = replicate_events(1), replicate_events(n)
    edge_small, edge_large = replicate_edges(1), replicate_edges(n)
    emb_small, emb_large = replicate_emb(1), replicate_emb(n)
    # warm both inputs and the codegen paths
    _execute(small)
    _execute(large)

    inputs = (
        [(name, fn, small, large) for name, fn in ops.items()]
        + [(name, fn, ev_small, ev_large) for name, fn in event_ops.items()]
        + [(name, fn, edge_small, edge_large) for name, fn in edge_ops.items()]
        + [(name, fn, emb_small, emb_large) for name, fn in emb_ops.items()]
    )

    import gc

    def _reclaim():
        """Drop the previous op's localCheckpoint RDD blocks before
        timing the next one: the loops checkpoint every round and the
        blocks are only freed when the ContextCleaner sees the Python
        refs die — without this, a heavy op poisons every later row's
        timing with inherited storage-memory pressure (observed: a
        235 s betweenness run inflating a later semdedup 1x read 6x)."""
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    if only is not None:
        unknown = only - {name for name, _, _, _ in inputs}
        if unknown:
            raise SystemExit(f"unknown ops: {sorted(unknown)}")
        inputs = [row for row in inputs if row[0] in only]

    out: dict[str, dict] = {}
    for name, fn, small, large in inputs:
        _reclaim()
        _execute(fn(small))  # warm-up run
        t0 = time.perf_counter()
        _execute(fn(small))
        t1 = time.perf_counter() - t0
        _reclaim()
        t0 = time.perf_counter()
        _execute(fn(large))
        tn = time.perf_counter() - t0
        exponent = math.log(max(tn, 1e-9) / max(t1, 1e-9)) / math.log(n)
        out[name] = {
            "sec_1x": round(t1, 3),
            f"sec_{n}x": round(tn, 3),
            "scaling_exponent": round(exponent, 3),
        }

    print(json.dumps({
        "metric": "corpus_op_scaling",
        "sf_dir": SF_DIR,
        "docs_1x": n_docs,
        "replicas": n,
        "ops": out,
    }))


if __name__ == "__main__":
    main()
