"""Benchmark n-gram decontamination: handcrafted contamination cases, a
pure-Python oracle over the documents table, threshold semantics, and
the broadcast-only plan shape (the corpus side must never shuffle)."""

from __future__ import annotations

import re


from grafeo_memory_spark.pipeline.decontamination import (
    benchmark_ngram_hashes,
    contamination_matches,
    decontaminate,
)

N = 5  # small n so handcrafted docs stay readable

PHRASE = "the quick brown fox jumps"  # exactly N words

DOCS = [
    (1, f"clean document about spark catalyst optimizer internals"),
    (2, f"prefix words then {PHRASE} and then a suffix tail"),
    (3, f"{PHRASE} {PHRASE} repeated but distinct grams count once"),
    (4, "tiny doc"),
    (5, "Prefix WORDS then THE Quick Brown Fox jumps and MORE"),
]

BENCH = [
    (100, f"question: {PHRASE} answer: something"),
    (101, "tiny doc"),
]


def _py_ngrams(text: str, n: int) -> set[str]:
    toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
    toks = [t for t in toks if t != ""]
    if len(toks) <= n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _frames(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "body"])
    bench = spark.createDataFrame(BENCH, ["qid", "prompt"])
    return docs, bench


class TestContamination:
    def test_matches_flag_exactly_the_overlapping_docs(self, spark):
        docs, bench = _frames(spark)
        got = {
            r["id"]: r
            for r in contamination_matches(
                docs, bench, text_col="body", id_col="doc_id",
                bench_text_col="prompt", n=N,
            ).collect()
        }
        # doc 2 contains the benchmark 5-gram; doc 5 matches it
        # case/whitespace-insensitively; doc 4 equals a short benchmark
        # entry via the full-text fallback; docs 1 and 3... doc 3 also
        # contains the phrase.
        assert set(got) == {2, 3, 4, 5}
        for doc_id, body in DOCS:
            grams = _py_ngrams(body, N)
            bench_grams = set().union(
                *(_py_ngrams(t, N) for _, t in BENCH)
            )
            want_matched = len(grams & bench_grams)
            if want_matched:
                assert got[doc_id]["matched_ngrams"] == want_matched
                assert got[doc_id]["total_ngrams"] == len(grams)
                assert got[doc_id]["matched_fraction"] == (
                    want_matched / len(grams)
                )

    def test_decontaminate_keeps_clean_docs_with_original_schema(self, spark):
        docs, bench = _frames(spark)
        clean = decontaminate(
            docs, bench, text_col="body", id_col="doc_id",
            bench_text_col="prompt", n=N,
        )
        assert clean.columns == docs.columns
        assert {r["doc_id"] for r in clean.collect()} == {1}

    def test_min_matches_threshold(self, spark):
        docs, bench = _frames(spark)
        clean = decontaminate(
            docs, bench, text_col="body", id_col="doc_id",
            bench_text_col="prompt", n=N, min_matches=2,
        )
        # with n=5, every contaminated doc here shares only ONE distinct
        # gram with the benchmark, so min_matches=2 keeps everything
        assert clean.count() == len(DOCS)

    def test_short_doc_longer_benchmark_no_spurious_match(self, spark):
        docs = spark.createDataFrame([(1, "brown fox")], ["doc_id", "body"])
        bench = spark.createDataFrame(
            [(100, f"a long entry where {PHRASE} appears inside")],
            ["qid", "prompt"],
        )
        got = contamination_matches(
            docs, bench, text_col="body", id_col="doc_id",
            bench_text_col="prompt", n=N,
        ).collect()
        assert got == []

    def test_oracle_on_documents_table(self, spark):
        """Cross-check against a pure-Python replay on the real corpus:
        benchmark = 30 short snippets cut from some documents, so both
        hit and miss paths occur."""
        docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text")
        )
        rows = docs.orderBy("doc_id").limit(30).collect()
        bench_rows = [
            (i, " ".join(r["text"].split()[3:20]))
            for i, r in enumerate(rows)
            if len(r["text"].split()) > 20
        ]
        bench = spark.createDataFrame(bench_rows, ["qid", "prompt"])
        got = {
            r["id"]: (r["matched_ngrams"], r["total_ngrams"])
            for r in contamination_matches(
                docs, bench, text_col="text", id_col="doc_id",
                bench_text_col="prompt", n=13,
            ).collect()
        }
        bench_grams = set().union(
            *(_py_ngrams(t, 13) for _, t in bench_rows)
        )
        want = {}
        for r in docs.collect():
            grams = _py_ngrams(r["text"], 13)
            m = len(grams & bench_grams)
            if m:
                want[r["doc_id"]] = (m, len(grams))
        assert got == want
        assert len(want) >= 1  # the construction guarantees hits

    def test_plan_is_broadcast_only_no_corpus_shuffle(self, spark):
        """The corpus side must reach the contamination verdict through
        broadcast joins only — no SortMergeJoin, no CartesianProduct,
        and no hash-exchange of the raw docs relation."""
        docs, bench = _frames(spark)
        plan = (
            decontaminate(
                docs, bench, text_col="body", id_col="doc_id",
                bench_text_col="prompt", n=N,
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan
        assert "BroadcastHashJoin" in plan

    def test_benchmark_hashes_are_distinct_longs(self, spark):
        _, bench = _frames(spark)
        h = benchmark_ngram_hashes(bench, "prompt", n=N)
        vals = [r["bench_h"] for r in h.collect()]
        assert len(vals) == len(set(vals))
        assert all(isinstance(v, int) for v in vals)
