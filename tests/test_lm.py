"""CCNet-style bigram-LM perplexity filter (pipeline/lm.py): training
counts and document scores replayed end-to-end in DuckDB SQL and in
pure Python, plus plan-shape pins (broadcast-only model joins, no
cartesian products, doc-granularity shuffle)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.lm import (
    UNK,
    ccnet_buckets,
    lm_perplexity,
    lm_train,
)
from tests.conftest import SF_DIR, assert_matches_oracle

DOCS = f"{SF_DIR}/documents.parquet"


def _tok(text: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def _python_lm(texts, max_vocab, max_bigrams, alpha):
    """Pure-Python replay of lm_train + per-doc scoring."""
    uni: dict[str, int] = {}
    for t in texts:
        for w in _tok(t):
            uni[w] = uni.get(w, 0) + 1
    vocab = set(
        w
        for w, _ in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[
            :max_vocab
        ]
    )
    m = lambda w: w if w in vocab else UNK  # noqa: E731
    big: dict[tuple[str, str], int] = {}
    for t in texts:
        ws = [m(w) for w in _tok(t)]
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    pruned = dict(
        sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:max_bigrams]
    )
    ctx: dict[str, int] = {}
    for (a, _), c in big.items():
        ctx[a] = ctx.get(a, 0) + c
    v = len(vocab) + 1

    def score(t):
        ws = [m(w) for w in _tok(t)]
        if len(ws) < 2:
            return None, None
        nlls = [
            -math.log(
                (pruned.get((a, b), 0) + alpha) / (ctx.get(a, 0) + alpha * v)
            )
            for a, b in zip(ws, ws[1:])
        ]
        return sum(nlls) / len(nlls), len(nlls)

    return score


class TestLmValues:
    TEXTS = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "the cat and the dog",
        "a bird",
        "zzz",  # single token → no bigram evidence
        "",
    ]

    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)], "id long, text string"
        )

    def test_scores_match_python_replay(self, docs):
        model = lm_train(docs, max_vocab=6, max_bigrams=8, alpha=0.5)
        score = _python_lm(self.TEXTS, 6, 8, 0.5)
        rows = {
            r["id"]: r
            for r in lm_perplexity(docs, model, id_col="id").collect()
        }
        for i, t in enumerate(self.TEXTS):
            nll, n = score(t)
            if nll is None:
                assert rows[i]["lm_nll"] is None
                assert rows[i]["lm_ppl"] is None
            else:
                assert rows[i]["lm_nll"] == pytest.approx(nll, rel=1e-9)
                assert rows[i]["lm_bigrams"] == n
                assert rows[i]["lm_ppl"] == pytest.approx(
                    math.exp(nll), rel=1e-9
                )

    def test_vocab_prune_is_deterministic(self, docs):
        model = lm_train(docs, max_vocab=3, alpha=0.1)
        words = sorted(r["word"] for r in model.vocab.collect())
        # counts: the=6; cat/dog/on/sat=2; tie at 2 breaks alphabetically
        assert words == ["cat", "dog", "the"]
        assert model.vocab_size == 4

    def test_unseen_bigram_backs_off_to_floor(self, spark, docs):
        model = lm_train(docs, max_vocab=50, max_bigrams=50, alpha=0.2)
        probe = spark.createDataFrame(
            [(0, "mat mat")], "id long, text string"
        )
        row = lm_perplexity(probe, model, id_col="id").collect()[0]
        # c(mat,mat)=0; c(ctx mat)=0 ('mat' never starts a bigram)
        expected = -math.log(0.2 / (0.2 * model.vocab_size))
        assert row["lm_nll"] == pytest.approx(expected, rel=1e-9)

    def test_schema_preserved_and_left_join(self, docs):
        model = lm_train(docs, alpha=0.1)
        out = lm_perplexity(docs, model, id_col="id")
        assert set(docs.columns) <= set(out.columns)
        assert out.count() == docs.count()  # empty/short docs survive

    def test_buckets_explicit_thresholds(self, spark):
        df = spark.createDataFrame(
            [(1, 1.0), (2, 5.0), (3, 50.0), (4, None)],
            "id long, lm_ppl double",
        )
        rows = {
            r["id"]: r["lm_bucket"]
            for r in ccnet_buckets(df, thresholds=(2.0, 10.0)).collect()
        }
        assert rows == {1: "head", 2: "middle", 3: "tail", 4: None}

    def test_buckets_quantile_split(self, spark):
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 101)], "id long, lm_ppl double"
        )
        out = ccnet_buckets(df, head=0.25, tail=0.75)
        counts = {
            r["lm_bucket"]: r["n"]
            for r in out.groupBy("lm_bucket").agg(F.count("*").alias("n")).collect()
        }
        assert counts["head"] == 25
        assert counts["tail"] == 25
        assert counts["middle"] == 50


class TestLmDuckDbReplay:
    """End-to-end DuckDB replay over the driver's documents table:
    tokenize → prune vocab → unk-map → bigram counts → smoothed
    per-doc scores, hash-compared the same way the driver does."""

    V, B, A = 40, 120, 0.25

    def test_scores_match_duckdb(self, spark, duck):
        docs = spark.read.parquet(DOCS)
        model = lm_train(
            docs, max_vocab=self.V, max_bigrams=self.B, alpha=self.A
        )
        out = (
            lm_perplexity(docs, model, id_col="doc_id")
            .where(F.col("lm_bigrams").isNotNull())
            .select(
                "doc_id",
                F.round("lm_nll", 6).alias("lm_nll"),
                "lm_bigrams",
                F.round("lm_ppl", 6).alias("lm_ppl"),
            )
        )
        sql = f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS w
          FROM documents
        ),
        uni AS (
          SELECT word, count(*) AS c_uni
          FROM (SELECT unnest(w) AS word FROM toks)
          GROUP BY word ORDER BY c_uni DESC, word ASC LIMIT {self.V}
        ),
        pairs AS (
          SELECT doc_id,
                 CASE WHEN w[i] IN (SELECT word FROM uni)
                      THEN w[i] ELSE '{UNK}' END AS w1,
                 CASE WHEN w[i+1] IN (SELECT word FROM uni)
                      THEN w[i+1] ELSE '{UNK}' END AS w2
          FROM (SELECT doc_id, w,
                       unnest(generate_series(1, len(w) - 1)) AS i
                FROM toks)
        ),
        big AS (SELECT w1, w2, count(*) AS c_bi FROM pairs GROUP BY w1, w2),
        bigp AS (SELECT * FROM big ORDER BY c_bi DESC, w1 ASC, w2 ASC
                 LIMIT {self.B}),
        ctx AS (SELECT w1, sum(c_bi) AS c_ctx FROM big GROUP BY w1),
        nv AS (SELECT count(*) + 1 AS v FROM uni),
        scored AS (
          SELECT p.doc_id,
                 -ln((coalesce(b.c_bi, 0)::DOUBLE + {self.A})
                     / (coalesce(c.c_ctx, 0)::DOUBLE + {self.A} * nv.v)) AS nll
          FROM pairs p
          LEFT JOIN bigp b USING (w1, w2)
          LEFT JOIN ctx c USING (w1)
          CROSS JOIN nv
        )
        SELECT doc_id,
               round(avg(nll), 6) AS lm_nll,
               count(*) AS lm_bigrams,
               round(exp(avg(nll)), 6) AS lm_ppl
        FROM scored GROUP BY doc_id
        """
        assert_matches_oracle(out, duck, sql)


class TestLmPlanShapes:
    def test_scoring_is_broadcast_only(self, spark):
        docs = spark.read.parquet(DOCS)
        model = lm_train(docs, max_vocab=30, max_bigrams=50, alpha=0.1)
        plan = (
            lm_perplexity(docs, model, id_col="doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        # model joins (unk-map ×2, bigrams, contexts) all broadcast
        assert plan.count("BroadcastHashJoin") >= 4
        # doc rollup keeps partial aggregation before its shuffle
        assert "partial_avg" in plan or "HashAggregate" in plan
