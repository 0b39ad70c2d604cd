"""Property-based tests (hypothesis) for the pure driver-side functions,
plus batched Spark invariant checks for the dedup/text-stat Columns —
the reference pins these behaviors across its 524-test suite; here each
property covers a whole input family at once."""

from __future__ import annotations

import math
from datetime import datetime, timezone

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.temporal import (
    classify_temporal,
    parse_date_ms,
)
from grafeo_memory_spark.functions.vector import mmr_select
from grafeo_memory_spark.protocols import HashEmbedder, normalize_entity_name

# ------------------------------------------------------------- pure fns


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_normalize_entity_name_idempotent(name):
    once = normalize_entity_name(name)
    assert normalize_entity_name(once) == once
    assert " " not in once


@given(
    st.datetimes(
        min_value=datetime(1971, 1, 1), max_value=datetime(2200, 12, 31)
    )
)
@settings(max_examples=200, deadline=None)
def test_parse_date_ms_roundtrips_iso_date(dt):
    s = dt.strftime("%Y-%m-%d")
    ms = parse_date_ms(s)
    assert ms is not None
    back = datetime.fromtimestamp(ms / 1000, tz=timezone.utc)
    assert (back.year, back.month, back.day) == (dt.year, dt.month, dt.day)


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_parse_date_ms_never_raises(s):
    out = parse_date_ms(s)
    assert out is None or isinstance(out, int)


@given(st.text(max_size=120))
@settings(max_examples=200, deadline=None)
def test_classify_temporal_total_function(q):
    hints = classify_temporal(q)
    # flags are consistent: any signal implies is_temporal
    if hints.signals:
        assert hints.is_temporal


@given(st.text(max_size=50), st.integers(min_value=4, max_value=64))
@settings(max_examples=100, deadline=None)
def test_hash_embedder_unit_norm_deterministic(text, dims):
    e = HashEmbedder(dimensions=dims)
    v1 = e.embed_one(text)
    v2 = e.embed_one(text)
    assert v1 == v2
    assert len(v1) == dims
    assert math.sqrt(sum(x * x for x in v1)) == pytest.approx(1.0, abs=1e-3)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 1000),
            st.floats(0, 1, allow_nan=False),
            st.lists(
                st.floats(-1, 1, allow_nan=False), min_size=4, max_size=4
            ),
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=100, deadline=None)
def test_mmr_select_invariants(cands, k):
    sel = mmr_select(cands, [1.0, 0.0, 0.0, 0.0], k=k, lambda_mult=0.5)
    ids = [i for i, _ in sel]
    assert len(ids) == min(k, len(cands))
    assert len(set(ids)) == len(ids)  # no repeats
    assert set(ids) <= {c[0] for c in cands}
    if cands:
        # first pick is pure relevance: the max-sim candidate (ties → id)
        best_sim = max(c[1] for c in cands)
        winners = {c[0] for c in cands if c[1] == best_sim}
        assert ids[0] in winners


# ------------------------------------------- Spark column invariants
# (batched: many generated rows -> ONE DataFrame -> one action)


def test_dedup_and_sketch_invariants_batch(spark):
    from grafeo_memory_spark.pipeline.dedup import (
        content_hash,
        minhash_signature,
        simhash16,
        word_shingles,
    )

    texts = [
        "a", "a b", "a b c", "A  B   c", "", "  ", "x" * 500,
        "the quick brown fox", "THE QUICK BROWN FOX", "unique words here",
        "répété deux fois répété deux fois", "tab\tand\nnewline mix",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select(
        "id",
        "text",
        content_hash("text").alias("h"),
        F.size(word_shingles("text", 3)).alias("n_sh"),
        simhash16("text").alias("sh16"),
    ).collect()
    by_id = {r["id"]: r for r in rows}
    # case/whitespace-insensitive content hash
    assert by_id[3]["h"] == by_id[2]["h"]
    assert by_id[8]["h"] == by_id[7]["h"]
    for r in rows:
        if r["text"].strip():
            assert r["n_sh"] >= 1  # every non-blank doc has ≥1 shingle
        else:
            assert r["n_sh"] == 0  # blank docs carry no shingle signal
        assert 0 <= r["sh16"] < 2**16

    sigs = {
        r["id"]: tuple(r["sig"])
        for r in minhash_signature(df, "text", "id", num_perm=8).collect()
    }
    assert sigs[7] == sigs[8]  # case-normalized identical docs
    assert all(len(s) == 8 for s in sigs.values())


def test_text_stats_bounds_batch(spark):
    from grafeo_memory_spark.pipeline.text_stats import (
        lang_id,
        quality_score,
        token_count_bpe_ish,
        token_count_ws,
    )

    texts = [
        "", "one", "the and of to a in is it you that", "¡hola señor!",
        "der die das und ist", "!!!???...", "word " * 300,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select(
        "id",
        lang_id("text").alias("lang"),
        quality_score("text").alias("q"),
        token_count_ws("text").alias("ws"),
        token_count_bpe_ish("text").alias("bpe"),
    ).collect()
    for r in rows:
        assert 0.0 <= r["q"] <= 1.0
        assert r["ws"] >= 0 and r["bpe"] >= 0
        assert r["lang"] is None or isinstance(r["lang"], str)
    en = next(r for r in rows if r["id"] == 2)
    assert en["lang"] == "en"  # pure-stopword English text
