"""Corpus sampling ops: determinism across reruns/partitionings,
per-stratum rates, per-key caps, and bucket edges — with a DuckDB
cross-check for the md5-derived selection so the hash contract is
pinned against an independent engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.sampling import (
    length_bucket,
    mixture_fractions,
    mixture_sample,
    stratified_sample,
    take_per_key,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").localCheckpoint()


class TestStratifiedSample:
    def test_rates_and_missing_strata_dropped(self, docs):
        langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
        keep, drop = langs[0], langs[1:]
        out = stratified_sample(
            docs, "lang", {keep: 0.5}, id_col="doc_id"
        )
        got = out.groupBy("lang").count().collect()
        assert [r["lang"] for r in got] == [keep]  # others dropped
        base = docs.where(F.col("lang") == keep).count()
        assert 0.3 * base < got[0]["count"] < 0.7 * base

    def test_deterministic_across_partitionings(self, docs):
        frs = {r["lang"]: 0.3 for r in docs.select("lang").distinct().collect()}
        a = {r["doc_id"] for r in
             stratified_sample(docs, "lang", frs, id_col="doc_id").collect()}
        b = {r["doc_id"] for r in
             stratified_sample(docs.repartition(13), "lang", frs,
                               id_col="doc_id").collect()}
        assert a == b and a

    def test_salt_changes_selection(self, docs):
        frs = {r["lang"]: 0.3 for r in docs.select("lang").distinct().collect()}
        a = {r["doc_id"] for r in
             stratified_sample(docs, "lang", frs, id_col="doc_id").collect()}
        c = {r["doc_id"] for r in
             stratified_sample(docs, "lang", frs, id_col="doc_id",
                               salt=1).collect()}
        assert a != c

    def test_matches_duckdb_selection(self, docs, duck):
        """The md5-threshold rule reproduces identically in DuckDB."""
        frs = {r["lang"]: 0.4 for r in docs.select("lang").distinct().collect()}
        spark_ids = sorted(
            r["doc_id"] for r in
            stratified_sample(docs, "lang", frs, id_col="doc_id").collect()
        )
        duck_ids = [
            r[0] for r in duck.sql(
                "SELECT doc_id FROM documents "
                "WHERE ('0x' || substring(md5(doc_id || ':0'), 1, 8))"
                "::UBIGINT / 4294967296.0 < 0.4 ORDER BY doc_id"
            ).fetchall()
        ]
        assert spark_ids == duck_ids


class TestTakePerKey:
    def test_caps_each_key(self, docs):
        out = take_per_key(docs, "lang", 5, id_col="doc_id")
        counts = out.groupBy("lang").count().collect()
        full = dict(docs.groupBy("lang").count().collect())
        for r in counts:
            assert r["count"] == min(5, full[r["lang"]])

    def test_deterministic(self, docs):
        a = sorted(r["doc_id"] for r in
                   take_per_key(docs, "lang", 3, id_col="doc_id").collect())
        b = sorted(r["doc_id"] for r in
                   take_per_key(docs.repartition(7), "lang", 3,
                                id_col="doc_id").collect())
        assert a == b


class TestLengthBucket:
    def test_edges(self, spark):
        df = spark.createDataFrame(
            [(0,), (99,), (100,), (499,), (500,), (10_000,)], "n long"
        )
        got = [r["b"] for r in
               df.select(length_bucket("n", [100, 500]).alias("b"))
               .orderBy("n").collect()]
        assert got == [0, 0, 1, 1, 2, 2]

    def test_composes_with_corpus(self, docs):
        out = docs.select(
            length_bucket("n_chars", [200, 400, 800]).alias("b")
        ).groupBy("b").count().collect()
        assert sum(r["count"] for r in out) == docs.count()
        assert all(0 <= r["b"] <= 3 for r in out)


class TestPackGreedy:
    def test_every_row_assigned_once(self, docs):
        from grafeo_memory_spark.pipeline.sampling import pack_greedy

        out = pack_greedy(docs, "n_chars", budget=2000, id_col="doc_id",
                          num_shards=8)
        assert out.count() == docs.count()
        assert out.select("doc_id").distinct().count() == docs.count()

    def test_packs_respect_budget(self, docs, spark):
        from grafeo_memory_spark.pipeline.sampling import pack_greedy

        budget = 2000
        out = pack_greedy(docs, "n_chars", budget=budget, id_col="doc_id",
                          num_shards=8)
        sums = out.groupBy("pack_id").agg(
            F.sum("n_chars").alias("tot"), F.count("*").alias("n")
        ).collect()
        for r in sums:
            # multi-row packs stay within budget; only a single row
            # longer than the budget may exceed it
            assert r["tot"] <= budget or r["n"] == 1

    def test_oversize_row_gets_own_pack(self, spark):
        from grafeo_memory_spark.pipeline.sampling import pack_greedy

        df = spark.createDataFrame(
            [(1, 50), (2, 5000), (3, 40)], "doc_id long, n long"
        )
        out = pack_greedy(df, "n", budget=100, id_col="doc_id",
                          num_shards=1).collect()
        by_id = {r["doc_id"]: r["pack_id"] for r in out}
        assert by_id[2] != by_id[1] and by_id[2] != by_id[3]
        assert by_id[1] == by_id[3]  # 50+40 fits one pack

    def test_deterministic(self, docs):
        from grafeo_memory_spark.pipeline.sampling import pack_greedy

        a = sorted((r["doc_id"], r["pack_id"]) for r in
                   pack_greedy(docs, "n_chars", 2000, id_col="doc_id",
                               num_shards=8).collect())
        b = sorted((r["doc_id"], r["pack_id"]) for r in
                   pack_greedy(docs.repartition(11), "n_chars", 2000,
                               id_col="doc_id", num_shards=8).collect())
        assert a == b


class TestMixture:
    def _df(self, spark):
        rows = (
            [(f"w{i}", "web", 10) for i in range(100)]
            + [(f"c{i}", "code", 10) for i in range(30)]
            + [(f"k{i}", "wiki", 10) for i in range(10)]
        )
        return spark.createDataFrame(rows, ["id", "domain", "n_tok"])

    def test_fractions_closed_form(self, spark):
        df = self._df(spark)
        fr = mixture_fractions(
            df, "domain", {"web": 0.6, "code": 0.3, "wiki": 0.1},
            token_col="n_tok",
        )
        # avail = 1000/300/100 tokens; T = min(1000/.6, 300/.3, 100/.1) = 1000
        assert fr == {"web": 0.6, "code": 1.0, "wiki": 1.0}

    def test_budget_caps_total(self, spark):
        df = self._df(spark)
        fr = mixture_fractions(
            df, "domain", {"web": 0.6, "code": 0.3, "wiki": 0.1},
            token_col="n_tok", budget=500,
        )
        assert fr == pytest.approx({"web": 0.3, "code": 0.5, "wiki": 0.5})

    def test_row_counted_when_no_token_col(self, spark):
        df = self._df(spark)
        fr = mixture_fractions(df, "domain", {"web": 0.5, "code": 0.5})
        # avail rows = 100/30; T = min(100/.5=200, 30/.5=60) = 60
        assert fr == {"web": 0.3, "code": 1.0}

    def test_zero_weight_and_unknown_domain(self, spark):
        df = self._df(spark)
        fr = mixture_fractions(
            df, "domain", {"web": 1.0, "wiki": 0.0, "books": 0.0}
        )
        assert fr["wiki"] == 0.0 and fr["books"] == 0.0
        assert fr["web"] == 1.0

    def test_positive_weight_empty_domain_raises(self, spark):
        # weights {web, books} with zero books rows: infeasible — must
        # raise, not silently hand back a 100% web sample
        df = self._df(spark)
        with pytest.raises(ValueError, match="books"):
            mixture_fractions(df, "domain", {"web": 0.5, "books": 0.5})

    def test_mixture_sample_deterministic_and_near_target(self, spark):
        rows = (
            [(f"w{i}", "web", 1) for i in range(4000)]
            + [(f"c{i}", "code", 1) for i in range(1000)]
        )
        df = spark.createDataFrame(rows, ["id", "domain", "n_tok"])
        out = mixture_sample(
            df, "domain", {"web": 0.5, "code": 0.5}, id_col="id",
        )
        counts = {
            r["domain"]: r["n"]
            for r in out.groupBy("domain").agg(
                F.count("*").alias("n")
            ).collect()
        }
        # code is the binding domain: fraction 1.0 → exactly 1000
        assert counts["code"] == 1000
        # web fraction 0.25 of 4000 → ~1000, Bernoulli tolerance
        assert 850 <= counts["web"] <= 1150
        again = mixture_sample(
            df, "domain", {"web": 0.5, "code": 0.5}, id_col="id",
        )
        assert sorted(r["id"] for r in out.collect()) == sorted(
            r["id"] for r in again.collect()
        )


class TestWeightedSamplePerKey:
    def test_deterministic_and_k_per_key(self, spark):
        from grafeo_memory_spark.pipeline.sampling import (
            weighted_sample_per_key,
        )

        df = spark.createDataFrame(
            [(i, "a" if i < 50 else "b", 1 + (i % 7)) for i in range(100)],
            "id long, dom string, w long",
        )
        a = weighted_sample_per_key(df, "dom", 5, "w", id_col="id")
        b = weighted_sample_per_key(df, "dom", 5, "w", id_col="id")
        got_a = sorted(r["id"] for r in a.collect())
        assert got_a == sorted(r["id"] for r in b.collect())
        counts = {
            r["dom"]: r["n"]
            for r in a.groupBy("dom").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"a": 5, "b": 5}

    def test_heavier_rows_win_more_often(self, spark):
        from grafeo_memory_spark.pipeline.sampling import (
            weighted_sample_per_key,
        )

        # one domain, half the rows carry 50x the weight; across many
        # salts the heavy half must dominate the selections
        df = spark.createDataFrame(
            [(i, "d", 50 if i < 100 else 1) for i in range(200)],
            "id long, dom string, w long",
        )
        heavy = 0
        for salt in range(10):
            sel = weighted_sample_per_key(
                df, "dom", 20, "w", id_col="id", salt=salt
            ).collect()
            heavy += sum(1 for r in sel if r["id"] < 100)
        assert heavy > 150  # ≥75% of 200 picks from the heavy half


class TestShuffleRows:
    def test_deterministic_and_layout_independent(self, spark):
        from grafeo_memory_spark.pipeline.sampling import shuffle_rows

        rows = [(i, f"d{i}") for i in range(200)]
        df = spark.createDataFrame(rows, "id long, text string")
        a = [r["id"] for r in shuffle_rows(df, "id", seed=7).collect()]
        b = [r["id"] for r in shuffle_rows(df, "id", seed=7).collect()]
        assert a == b  # same seed → identical order
        # physical layout must not matter: repartitioned input, same order
        c = [
            r["id"]
            for r in shuffle_rows(df.repartition(13), "id", seed=7).collect()
        ]
        assert a == c
        assert a != sorted(a)  # actually shuffled

    def test_seed_changes_order(self, spark):
        from grafeo_memory_spark.pipeline.sampling import shuffle_rows

        df = spark.createDataFrame(
            [(i, "x") for i in range(100)], "id long, text string"
        )
        a = [r["id"] for r in shuffle_rows(df, "id", seed=1).collect()]
        b = [r["id"] for r in shuffle_rows(df, "id", seed=2).collect()]
        assert a != b
        assert sorted(a) == sorted(b)  # permutations of the same set

    def test_shards_uniform_and_seed_stable(self, spark):
        from grafeo_memory_spark.pipeline.sampling import shuffle_rows

        df = spark.createDataFrame(
            [(i, "x") for i in range(400)], "id long, text string"
        )
        out = shuffle_rows(df, "id", seed=3, num_shards=4)
        sizes = {
            r["shard"]: r["n"]
            for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()
        }
        assert set(sizes) == {0, 1, 2, 3}
        assert all(50 <= n <= 150 for n in sizes.values())  # roughly uniform
        again = shuffle_rows(df, "id", seed=3, num_shards=4)
        assert sorted(
            (r["id"], r["shard"]) for r in out.collect()
        ) == sorted((r["id"], r["shard"]) for r in again.collect())

    def test_oracle_replay_md5_order(self, spark, duck):
        """The draw is the repo's portable md5 convention, so DuckDB
        replays the exact permutation."""
        from grafeo_memory_spark.pipeline.sampling import shuffle_rows

        rows = [(i, f"t{i % 7}") for i in range(50)]
        df = spark.createDataFrame(rows, "id long, text string")
        got = [r["id"] for r in shuffle_rows(df, "id", seed=11).collect()]
        duck.execute(
            "CREATE OR REPLACE TABLE t AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, 't{i % 7}')" for i in range(50))
            + ") v(id, text)"
        )
        want = [
            r[0]
            for r in duck.execute(
                "SELECT id FROM t ORDER BY md5('11:' || id::VARCHAR), id"
            ).fetchall()
        ]
        assert got == want
