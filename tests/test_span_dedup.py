"""C4-style global span dedup: handcrafted removal cases and a
pure-Python replay oracle over a synthetic corpus built from a small
line pool (so 3-line spans genuinely repeat across docs)."""

from __future__ import annotations

from grafeo_memory_spark.pipeline.dedup import dedup_spans_global


def _py_oracle(docs: list[tuple[int, str]], span: int) -> dict[int, str]:
    lines = {
        i: [l for l in t.split("\n") if l.strip()] for i, t in docs
    }
    first: dict[str, tuple[int, int]] = {}
    for i in sorted(lines):
        for p in range(len(lines[i]) - span + 1):
            first.setdefault("\n".join(lines[i][p : p + span]), (i, p))
    out = {}
    for i in sorted(lines):
        removed: set[int] = set()
        for p in range(len(lines[i]) - span + 1):
            if first["\n".join(lines[i][p : p + span])] != (i, p):
                removed.update(range(p, p + span))
        out[i] = "\n".join(
            l for q, l in enumerate(lines[i]) if q not in removed
        )
    return out


def _run(spark, docs, span=3):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = dedup_spans_global(df, "text", "doc_id", span=span)
    return {r["doc_id"]: r["text"] for r in got.collect()}


class TestSpanDedup:
    def test_later_occurrence_loses_the_span(self, spark):
        shared = "alpha\nbeta\ngamma"
        docs = [
            (1, f"intro\n{shared}\noutro"),
            (2, f"other start\n{shared}\nother end"),
        ]
        got = _run(spark, docs)
        assert got[1] == docs[0][1]  # first occurrence intact
        assert got[2] == "other start\nother end"

    def test_short_doc_passes_through(self, spark):
        docs = [(1, "one\ntwo"), (2, "one\ntwo")]
        got = _run(spark, docs)
        assert got == {1: "one\ntwo", 2: "one\ntwo"}

    def test_blank_lines_normalized_away(self, spark):
        docs = [(1, "a\n\n  \nb\nc\nd")]
        got = _run(spark, docs)
        assert got[1] == "a\nb\nc\nd"

    def test_fully_duplicated_doc_becomes_empty(self, spark):
        body = "x\ny\nz"
        got = _run(spark, [(1, body), (2, body)])
        assert got[1] == body
        assert got[2] == ""

    def test_self_repeat_within_one_doc(self, spark):
        docs = [(1, "a\nb\nc\nfiller\na\nb\nc")]
        got = _run(spark, docs)
        assert got[1] == "a\nb\nc\nfiller"

    def test_oracle_on_synthetic_corpus(self, spark):
        pool = [f"line-{i % 7}-{i % 3}" for i in range(10)]
        docs = [
            (
                d,
                "\n".join(
                    pool[(d * 3 + j) % len(pool)] for j in range(4 + d % 5)
                ),
            )
            for d in range(40)
        ]
        got = _run(spark, docs)
        assert got == _py_oracle(docs, 3)
        # the construction must actually exercise removal
        assert any(got[d] != "\n".join(
            l for l in dict(docs)[d].split("\n") if l.strip()
        ) for d in range(40))

    def test_metadata_columns_survive(self, spark):
        shared = "alpha\nbeta\ngamma"
        df = spark.createDataFrame(
            [
                (1, f"intro\n{shared}\noutro", "web", 0.9),
                (2, f"pre\n{shared}\npost", "books", 0.4),
            ],
            ["doc_id", "text", "source", "quality"],
        )
        got = dedup_spans_global(df, "text", "doc_id")
        assert got.columns == ["doc_id", "text", "source", "quality"]
        rows = {r["doc_id"]: r for r in got.collect()}
        assert rows[1]["source"] == "web" and rows[1]["quality"] == 0.9
        assert rows[2]["source"] == "books"
        assert rows[2]["text"] == "pre\npost"

    def test_literal_separator_not_regex(self, spark):
        # '|' is a regex alternation that matches everywhere; as a
        # literal separator these two docs share the 3-span a|b|c
        df = spark.createDataFrame(
            [(1, "a|b|c|tail"), (2, "head|a|b|c")], ["doc_id", "text"]
        )
        got = {
            r["doc_id"]: r["text"]
            for r in dedup_spans_global(
                df, "text", "doc_id", sep="|"
            ).collect()
        }
        assert got[1] == "a|b|c|tail"
        assert got[2] == "head"

    def test_idempotent(self, spark):
        shared = "alpha\nbeta\ngamma"
        docs = [
            (1, f"intro\n{shared}\noutro"),
            (2, f"other start\n{shared}\nother end"),
        ]
        once = _run(spark, docs)
        twice = _run(spark, sorted(once.items()))
        assert twice == once
