"""Document chunking (pipeline/chunking.py): DuckDB replay of the
window arithmetic on the sf docs, reassembly and overlap properties,
metadata passthrough, edge cases, and a map-only plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.chunking import chunk_documents
from tests.conftest import SF_DIR, assert_matches_oracle

DOCS = f"{SF_DIR}/documents.parquet"


def test_matches_duckdb_replay(spark, duck):
    docs = spark.read.parquet(DOCS)
    out = chunk_documents(
        docs.select("doc_id", "text"), max_tokens=7, overlap=2
    ).orderBy("doc_id", "chunk_idx")
    assert_matches_oracle(
        out,
        duck,
        r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             x -> x <> '') AS toks
          FROM documents
        ), s AS (
          SELECT doc_id, toks,
                 unnest(generate_series(0, len(toks) - 1, 5)) AS start
          FROM t WHERE len(toks) > 0
        )
        SELECT doc_id,
               (row_number() OVER (PARTITION BY doc_id ORDER BY start)
                - 1)::INT AS chunk_idx,
               array_to_string(list_slice(toks, start + 1, start + 7),
                               ' ') AS chunk_text,
               least(7, len(toks) - start)::INT AS chunk_tokens
        FROM s ORDER BY doc_id, chunk_idx
        """,
    )


def test_no_overlap_reassembles_document(spark):
    docs = spark.read.parquet(DOCS).limit(30)
    chunks = chunk_documents(
        docs.select("doc_id", "text"), max_tokens=11
    ).collect()
    by_doc = {}
    for r in sorted(chunks, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"])
    for r in docs.collect():
        norm = " ".join(r["text"].split())
        assert " ".join(by_doc.get(r["doc_id"], [])) == norm


def test_overlap_prefix_property(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20)))], "doc_id int, text string"
    )
    rows = (
        chunk_documents(df, max_tokens=8, overlap=3)
        .orderBy("chunk_idx")
        .collect()
    )
    # consecutive chunks share exactly `overlap` tokens
    for a, b in zip(rows, rows[1:]):
        at, bt = a["chunk_text"].split(), b["chunk_text"].split()
        if a["chunk_tokens"] == 8:
            assert at[-3:] == bt[:3]
    # every chunk respects the budget; tail may be short
    assert all(r["chunk_tokens"] <= 8 for r in rows)
    assert rows[0]["chunk_text"].startswith("w0 ")


def test_metadata_passthrough_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "web"), (2, "   ", "books"), (3, None, "web")],
        "doc_id int, text string, source string",
    )
    rows = chunk_documents(df, max_tokens=2).collect()
    assert {r["doc_id"] for r in rows} == {1}
    assert all(r["source"] == "web" for r in rows)
    assert sorted(r["chunk_text"] for r in rows) == ["a b", "c"]


def test_invalid_knobs_raise(spark):
    df = spark.range(1).withColumn("text", F.lit("x"))
    with pytest.raises(ValueError):
        chunk_documents(df, id_col="id", max_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, id_col="id", max_tokens=4, overlap=4)


def test_plan_is_map_only(spark):
    docs = spark.read.parquet(DOCS)
    plan = (
        chunk_documents(docs.select("doc_id", "text"), max_tokens=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_chunk_token_ids_windows_and_reassembly(spark):
    from grafeo_memory_spark.pipeline.chunking import chunk_token_ids

    ids = list(range(25))
    df = spark.createDataFrame([(1, ids), (2, []), (3, None)],
                               "doc_id int, token_ids array<int>")
    rows = (
        chunk_token_ids(df, max_tokens=10, overlap=0)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    assert [r["doc_id"] for r in rows] == [1, 1, 1]
    got = []
    for r in rows:
        assert r["chunk_tokens"] == len(r["chunk_ids"]) <= 10
        got.extend(r["chunk_ids"])
    assert got == ids
    # overlap: consecutive windows share the suffix/prefix
    rows = (
        chunk_token_ids(df, max_tokens=10, overlap=4)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    full = [list(r["chunk_ids"]) for r in rows]
    for a, b in zip(full, full[1:]):
        if len(a) == 10:
            assert a[-4:] == b[:4]
