"""Corpus cleaning + Gopher/C4 quality filters: handcrafted cases for
each rule, plus a corpus-level smoke over the documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.cleaning import (
    duplicate_line_fraction,
    gopher_quality_flags,
    mask_pii,
    mean_word_length,
    normalize_whitespace,
    remove_urls,
    strip_html,
    symbol_to_word_ratio,
    top_word_ratio,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "t string").select(
        col.alias("v")
    ).collect()[0]["v"]


class TestCleaning:
    def test_strip_html(self, spark):
        got = _one(
            spark,
            "<div class='x'>Hello <b>world</b> &amp; friends"
            "<script>alert(1)</script></div>",
            normalize_whitespace(strip_html("t")),
        )
        assert got == "Hello world & friends"

    def test_remove_urls(self, spark):
        got = _one(
            spark,
            "see https://example.com/a?b=1 and www.test.org now",
            normalize_whitespace(remove_urls("t")),
        )
        assert got == "see and now"

    def test_mask_pii(self, spark):
        got = _one(
            spark,
            "mail bob@example.com, call +1 (555) 123-4567, host 10.0.0.1",
            mask_pii("t"),
        )
        assert "<EMAIL>" in got and "<PHONE>" in got and "<IP>" in got
        assert "bob@" not in got and "555" not in got and "10.0.0.1" not in got

    def test_normalize_whitespace(self, spark):
        assert _one(spark, "  a\t b\n\nc  ",
                    normalize_whitespace("t")) == "a b c"


class TestQualitySignals:
    def test_duplicate_line_fraction(self, spark):
        text = "a\nb\na\na\n"
        assert _one(spark, text, duplicate_line_fraction("t")) == \
            pytest.approx(0.5)  # 4 lines, 2 distinct → 2 repeats
        assert _one(spark, "only one line",
                    duplicate_line_fraction("t")) == 0.0

    def test_top_word_ratio(self, spark):
        assert _one(spark, "buy buy buy buy now",
                    top_word_ratio("t")) == pytest.approx(0.8)
        assert _one(spark, "all distinct words here",
                    top_word_ratio("t")) == pytest.approx(0.25)

    def test_top_word_ratio_long_doc_linearithmic(self, spark):
        # 100k-word doc near the Gopher max_words bound: the sorted
        # run-length fold must finish in seconds (the earlier
        # distinct×filter form was quadratic — ~5e9 comparisons here).
        import time

        words = [f"w{i % 50_000}" for i in range(100_000)]
        text = " ".join(words)
        t0 = time.monotonic()
        got = _one(spark, text, top_word_ratio("t"))
        assert time.monotonic() - t0 < 30.0
        assert got == pytest.approx(2 / 100_000)

    def test_symbol_ratio_and_word_len(self, spark):
        assert _one(spark, "### ### word", symbol_to_word_ratio("t")) == \
            pytest.approx(6.0)  # 6 hashes / 1 word
        assert _one(spark, "tiny word four", mean_word_length("t")) == \
            pytest.approx(4.0)

    def test_gopher_flags(self, spark):
        good = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(20))
        spammy = "buy " * 60
        df = spark.createDataFrame([(1, good), (2, spammy)],
                                   "id long, t string")
        rows = {
            r["id"]: r["q"]
            for r in df.select(
                "id", gopher_quality_flags("t").alias("q")
            ).collect()
        }
        assert rows[1]["keep"] is True
        assert rows[2]["keep"] is False
        assert rows[2]["repetition_ok"] is False  # the failing rule

    def test_corpus_filter_composes(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        )
        out = docs.select(
            "doc_id", gopher_quality_flags("text", min_words=5).alias("q")
        )
        kept = out.where(F.col("q.keep")).count()
        assert 0 < kept <= docs.count()
