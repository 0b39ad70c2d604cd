"""BPE tokenizer (pipeline/tokenizer.py): merge learning replayed by a
pure-Python naive-recount oracle, the corpus word-count base
hash-checked against DuckDB, encode parity between the Spark pandas-UDF
path and the driver-side apply loop, round-trips, determinism, and a
map-only plan pin for the encode stage."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.tokenizer import (
    END_OF_WORD,
    BpeModel,
    bpe_decode,
    bpe_encode,
    bpe_encode_word,
    bpe_train,
    word_counts,
)
from tests.conftest import SF_DIR, assert_matches_oracle

DOCS = f"{SF_DIR}/documents.parquet"


# ------------------------------------------------------- replay oracle


def _naive_train(counts, n_merges, min_pair_count=2, eow=END_OF_WORD):
    """Naive recount-every-iteration BPE (Sennrich '16 pseudocode),
    independent of the indexed incremental trainer."""
    words = {tuple(w) + (eow,): c for w, c in counts if w}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        merged = best[0] + best[1]
        out = {}
        for syms, c in words.items():
            ns, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            out[tuple(ns)] = out.get(tuple(ns), 0) + c
        words = out
    return merges


def test_classic_sennrich_example():
    # the worked example from the BPE paper: es→est→est</w> lead
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m = bpe_train(counts, 4).merges
    assert m[0] == ("e", "s")
    assert m[1] == ("es", "t")
    assert m[2] == ("est", END_OF_WORD)
    assert m[3] == ("l", "o")


def test_incremental_trainer_matches_naive_recount():
    # adversarial corpus: overlapping pairs, repeats, ties
    words = [
        "abab", "ababab", "aab", "bba", "abcabc", "cab", "banana",
        "bananas", "nan", "aa", "bb", "ab", "ba", "x",
    ]
    counts = [(w, (i * 7) % 5 + 1) for i, w in enumerate(words)]
    got = bpe_train(counts, 25, min_pair_count=1).merges
    want = _naive_train(counts, 25, min_pair_count=1)
    assert got == want


def test_tie_break_is_lexicographic():
    # "ab" and "cd" both appear exactly 3 times; (a,b) < (c,d)
    counts = [("ab", 3), ("cd", 3)]
    m = bpe_train(counts, 1, min_pair_count=1).merges
    assert m == [("a", "b")]


def test_min_pair_count_stops_early():
    counts = [("abc", 1), ("xyz", 1)]
    assert bpe_train(counts, 10, min_pair_count=2).merges == []


def test_vocab_layout_deterministic():
    counts = [("low", 5), ("newest", 6)]
    m1 = bpe_train(counts, 3)
    m2 = bpe_train(list(reversed(counts)), 3)
    assert m1.merges == m2.merges
    assert m1.vocab == m2.vocab
    assert m1.vocab["<unk>"] == 0
    base = sorted(set("lownewst") | {END_OF_WORD})
    assert [s for s, i in sorted(m1.vocab.items(), key=lambda kv: kv[1])][
        1 : 1 + len(base)
    ] == base


def test_word_counts_matches_duckdb(spark, duck):
    docs = spark.read.parquet(DOCS)
    wc = word_counts(docs, "text").orderBy("word")
    assert_matches_oracle(
        wc,
        duck,
        r"""
        SELECT word, count(*)::BIGINT AS count
        FROM (SELECT unnest(list_filter(
                string_split_regex(lower(text), '\s+'), t -> t <> ''))
                AS word FROM documents)
        GROUP BY word ORDER BY word
        """,
    )


def test_max_types_cap_deterministic(spark):
    docs = spark.read.parquet(DOCS)
    top = word_counts(docs, "text", max_types=5).collect()
    allc = word_counts(docs, "text").collect()
    want = sorted(allc, key=lambda r: (-r["count"], r["word"]))[:5]
    assert sorted((r["word"], r["count"]) for r in top) == sorted(
        (r["word"], r["count"]) for r in want
    )


def test_encode_spark_matches_driver_apply(spark):
    docs = spark.read.parquet(DOCS).limit(50)
    model = bpe_train(word_counts(docs, "text"), 60, min_pair_count=1)
    enc = bpe_encode(docs, "text", model).select("doc_id", "token_ids")
    rows = {r["doc_id"]: r["token_ids"] for r in enc.collect()}
    for r in docs.select("doc_id", "text").collect():
        want = []
        for w in r["text"].lower().split():
            want.extend(
                model.vocab.get(s, model.unk_id)
                for s in bpe_encode_word(w, model.ranks, END_OF_WORD)
            )
        assert rows[r["doc_id"]] == want


def test_round_trip_in_vocab_text(spark):
    docs = spark.read.parquet(DOCS).limit(20)
    model = bpe_train(word_counts(docs, "text"), 40, min_pair_count=1)
    for r in docs.select("text").collect():
        norm = " ".join(r["text"].lower().split())
        ids = []
        for w in norm.split():
            ids.extend(
                model.vocab.get(s, model.unk_id)
                for s in bpe_encode_word(w, model.ranks, END_OF_WORD)
            )
        assert bpe_decode(ids, model) == norm


def test_unknown_chars_map_to_unk():
    model = bpe_train([("abc", 5)], 2, min_pair_count=1)
    syms = bpe_encode_word("aqc", model.ranks, END_OF_WORD)
    ids = [model.vocab.get(s, model.unk_id) for s in syms]
    assert model.unk_id in ids  # 'q' unseen in training


def test_json_round_trip():
    model = bpe_train([("low", 5), ("newest", 6)], 4, min_pair_count=1)
    back = BpeModel.from_json(model.to_json())
    assert back.merges == model.merges
    assert back.vocab == model.vocab
    assert back.ranks == model.ranks


def test_empty_and_null_inputs(spark):
    model = bpe_train([], 5)
    assert model.merges == []
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "id int, text string"
    )
    rows = bpe_encode(df, "text", model).orderBy("id").collect()
    assert [list(r["token_ids"]) for r in rows] == [[], [], []]


def test_encode_plan_is_map_only(spark):
    docs = spark.read.parquet(DOCS)
    model = bpe_train([("low", 3)], 1, min_pair_count=1)
    plan = (
        bpe_encode(docs, "text", model)
        .select("doc_id", F.size("token_ids").alias("n"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_hypothesis_round_trip_and_trainer_parity():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.lists(
        st.text(alphabet="abcxyz", min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=40, deadline=None)
    @given(words)
    def prop(ws):
        counts = Counter(ws)
        items = sorted(counts.items())
        model = bpe_train(items, 15, min_pair_count=1)
        assert model.merges == _naive_train(items, 15, min_pair_count=1)
        text = " ".join(ws)
        ids = []
        for w in text.split():
            ids.extend(
                model.vocab.get(s, model.unk_id)
                for s in bpe_encode_word(w, model.ranks, END_OF_WORD)
            )
        # training corpus chars are all in the vocab → exact round trip
        assert bpe_decode(ids, model) == text

    prop()
