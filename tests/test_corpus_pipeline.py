"""Composed corpus recipe: stage sequencing, schema preservation,
determinism across reruns, stage toggles, and the accounting report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.corpus import (
    CorpusRecipe,
    build_training_corpus,
)


@pytest.fixture()
def corpus(spark):
    rows = []
    body = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the quiet field toward the river ") * 3
    for i in range(20):
        rows.append((i, f"doc {i} " + body + f"tail {i}", "web"))
    rows.append((100, rows[0][1], "web"))          # exact dup of doc 0
    # near dup of doc 1: single changed word → ~0.95 jaccard, collides
    # in a band under the fixed deterministic hashes
    rows.append((101, rows[1][1].replace("tail 1", "tail x"), "web"))
    rows.append((102, "<b>short</b>", "books"))    # fails min_words
    books_body = ("an entirely different manuscript about maritime "
                  "navigation celestial charts and the careful keeping "
                  "of logbooks aboard long voyages across the sea ") * 3
    rows.append((103, books_body, "books"))
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


class TestBuildTrainingCorpus:
    def test_full_recipe_runs_and_preserves_schema(self, spark, corpus):
        bench = spark.createDataFrame(
            [("held out benchmark prompt that matches nothing",)],
            ["prompt"],
        )
        out, report = build_training_corpus(
            corpus,
            benchmark=bench,
            bench_text_col="prompt",
            recipe=CorpusRecipe(min_words=10, mixture={"web": 0.7,
                                                       "books": 0.3}),
            count_stages=True,
        )
        assert out.columns == ["doc_id", "text", "source"]
        assert report.stages == [
            "clean", "quality", "exact_dedup", "fuzzy_dedup",
            "decontaminate", "mixture_sample",
        ]
        ids = {r["doc_id"] for r in out.collect()}
        assert 100 not in ids          # exact dup dropped
        assert 101 not in ids          # near dup dropped
        assert 102 not in ids          # quality-failed
        # counts recorded and monotone non-increasing
        ns = [report.rows[s] for s in report.stages]
        assert all(b is not None and a is not None for b, a in ns)
        assert all(a <= b for b, a in ns)

    def test_stage_toggles(self, spark, corpus):
        out, report = build_training_corpus(
            corpus,
            recipe=CorpusRecipe(
                clean=False, quality=False, fuzzy=False,
                decontaminate=False,
            ),
        )
        assert report.stages == ["exact_dedup"]
        assert out.count() == corpus.count() - 1  # only the exact dup

    def test_simhash_fuzzy_stage(self, spark, corpus):
        # fuzzy_method='simhash' swaps the near-dup tier for the banded
        # Hamming join (VERDICT r6 item 8). All body-sharing docs
        # (0..20, 100, 101) have near-identical unigram profiles, so
        # SimHash folds them into ONE cluster — the smallest id wins;
        # the maritime doc 103 and the short doc 102 are untouched. The
        # report must show the simhash stage ran instead of MinHash.
        out, report = build_training_corpus(
            corpus,
            recipe=CorpusRecipe(
                clean=False, quality=False, exact=False,
                decontaminate=False,
                fuzzy_method="simhash", simhash_max_hamming=6,
            ),
        )
        assert report.stages == ["fuzzy_dedup_simhash"]
        ids = {r["doc_id"] for r in out.collect()}
        assert ids == {0, 102, 103}

    def test_bad_fuzzy_method_raises(self, spark, corpus):
        with pytest.raises(ValueError, match="fuzzy_method"):
            build_training_corpus(
                corpus, recipe=CorpusRecipe(fuzzy_method="bogus")
            )

    def test_deterministic_across_reruns(self, spark, corpus):
        recipe = CorpusRecipe(min_words=10,
                              mixture={"web": 0.8, "books": 0.2})
        a, _ = build_training_corpus(corpus, recipe=recipe)
        b, _ = build_training_corpus(corpus, recipe=recipe)
        assert sorted(r["doc_id"] for r in a.collect()) == sorted(
            r["doc_id"] for r in b.collect()
        )

    def test_decontamination_drops_benchmark_hits(self, spark, corpus):
        # benchmark = a 13-word verbatim window from doc 3
        window = " ".join(
            corpus.where(F.col("doc_id") == 3)
            .collect()[0]["text"].split()[5:18]
        )
        bench = spark.createDataFrame([(window,)], ["prompt"])
        out, _ = build_training_corpus(
            corpus, benchmark=bench, bench_text_col="prompt",
            recipe=CorpusRecipe(min_words=10, fuzzy=False),
        )
        ids = {r["doc_id"] for r in out.collect()}
        assert 3 not in ids

    def test_lm_filter_stage(self, spark, corpus):
        from grafeo_memory_spark.pipeline.lm import lm_perplexity, lm_train

        model = lm_train(corpus, max_vocab=200, alpha=0.1)
        # threshold chosen between the in-distribution web docs and the
        # out-of-distribution books doc so the cut is observable
        ppls = {
            r["doc_id"]: r["lm_ppl"]
            for r in lm_perplexity(corpus, model, id_col="doc_id").collect()
            if r["lm_ppl"] is not None
        }
        cut = (ppls[0] + ppls[103]) / 2
        assert ppls[0] < cut < ppls[103]
        out, report = build_training_corpus(
            corpus,
            lm_model=model,
            recipe=CorpusRecipe(
                clean=False, quality=False, fuzzy=False,
                decontaminate=False, lm_max_ppl=cut,
            ),
        )
        assert report.stages == ["exact_dedup", "lm_filter"]
        ids = {r["doc_id"] for r in out.collect()}
        assert 103 not in ids and 0 in ids
        assert out.columns == corpus.columns  # score columns dropped

    def test_no_stage_counts_by_default(self, spark, corpus):
        _, report = build_training_corpus(
            corpus, recipe=CorpusRecipe(decontaminate=False)
        )
        assert all(v == (None, None) for v in report.rows.values())


def test_semantic_dedup_stage(spark, corpus):
    # two docs share (near-identical) embeddings → SemDeDup keeps one;
    # the stage only runs when an embeddings frame is supplied
    from pyspark.sql import functions as F

    ids = sorted(r["doc_id"] for r in corpus.select("doc_id").collect())
    dim = len(ids)

    def one_hot(pos):
        return [1.0 if d == pos else 0.0 for d in range(dim)]

    # every doc orthogonal to every other, except doc 2 copies doc 1
    emb = spark.createDataFrame(
        [
            (i, one_hot(ids.index(1) if i == 2 else ids.index(i)))
            for i in ids
        ],
        "doc_id long, embedding array<double>",
    )
    out, report = build_training_corpus(
        corpus,
        embeddings=emb,
        recipe=CorpusRecipe(
            clean=False, quality=False, exact=False, fuzzy=False,
            decontaminate=False, semantic=True, semantic_eps=0.95,
            semantic_centroids=2,
        ),
        count_stages=True,
    )
    assert report.stages == ["semantic_dedup"]
    kept = {r["doc_id"] for r in out.collect()}
    # docs 1 and 2 are semantically identical → exactly one survives
    assert len(kept & {1, 2}) == 1
    before, after = report.rows["semantic_dedup"]
    assert after < before


def test_tokenize_stage_appends_ids_and_counts(spark, corpus):
    out, report = build_training_corpus(
        corpus,
        recipe=CorpusRecipe(
            clean=False, quality=False, exact=False, fuzzy=False,
            decontaminate=False, tokenize=True, bpe_merges=50,
        ),
    )
    assert report.stages == ["tokenize"]
    assert {"token_ids", "n_tokens"} <= set(out.columns)
    rows = out.select("text", "token_ids", "n_tokens").collect()
    for r in rows:
        assert r["n_tokens"] == len(r["token_ids"])
        # every whitespace word emits >= 1 token; with only 50 merges
        # long words stay multi-token, so ids >= word count
        assert len(r["token_ids"]) >= len(r["text"].split())
