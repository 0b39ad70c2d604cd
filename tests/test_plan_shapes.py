"""Physical-plan regression tests: pin the plan properties that make
the operators scale — filter pushdown reaching the parquet scan, column
pruning, broadcast joins for driver-sized sides, map-only top-k, and
the absence of cartesian products — so a future refactor that silently
degrades a plan fails here, not at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    return E.queries()


class TestScanHygiene:
    def test_filter_pushdown_reaches_scan(self, spark):
        df = (
            spark.read.parquet(f"{SF}/lineitem.parquet")
            .where(F.col("l_shipdate") <= "1998-09-02")
            .select("l_returnflag", "l_quantity")
        )
        plan = _plan(df)
        assert "PushedFilters: [IsNotNull(l_shipdate)" in plan

    def test_column_pruning(self, spark):
        df = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        plan = _plan(df)
        # ReadSchema carries only the projected columns
        assert "l_orderkey" in plan.split("ReadSchema")[1][:200]
        assert "l_comment" not in plan.split("ReadSchema")[1][:200]

    def test_knn_is_map_only_top_k(self, spark, queries):
        plan = _plan(queries["knn_topk"](spark, SF))
        assert "TakeOrderedAndProject" in plan
        assert "Exchange hashpartitioning" not in plan  # no shuffle

    def test_no_cartesian_products_anywhere(self, spark, queries):
        """Every registered query must avoid CartesianProduct — any
        intended all-pairs comparison must ride a broadcast."""
        offenders = []
        for name, fn in queries.items():
            try:
                if "CartesianProduct" in _plan(fn(spark, SF)):
                    offenders.append(name)
            except Exception:
                pass  # plan-shape audit only; correctness gate covers errors
        assert offenders == []


class TestJoinStrategies:
    def test_search_pipeline_broadcasts_small_sides(self, spark, queries):
        plan = _plan(queries["search_pipeline"](spark, SF))
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_ann_lsh_join_is_equi_join(self, spark, queries):
        plan = _plan(queries["ann_lsh_topk"](spark, SF))
        assert "CartesianProduct" not in plan
        # signature equi-join compiles to a hash-based join
        assert "HashJoin" in plan or "SortMergeJoin" in plan

    def test_exact_dedup_single_shuffle(self, spark):
        from grafeo_memory_spark.pipeline.dedup import exact_dedup

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(
            exact_dedup(docs, "text", "doc_id").select("doc_id")
        )
        # one aggregation key → at most one exchange pair (partial+final
        # HashAggregate around a single hashpartitioning exchange), plus
        # AQE wrappers; never a join-driven second shuffle
        assert plan.count("Exchange hashpartitioning") <= 2
        # r9: normalize+md5 runs ONCE over the corpus — the pre-r9
        # md5-keyed self-join hashed the text a second time on the
        # probe side (a full extra text scan at corpus scale)
        assert plan.count("md5(") == 1

    def test_ivf_assign_map_only_single_row_norm(self, spark):
        """The codebook argmax is shuffle-free, and the per-row norm is
        computed exactly once (r9): centroid norms ride the plan as
        driver-side literals, so the only SQRT in the plan is the one
        row-norm fold — the pre-r9 shape re-folded both norms for every
        centroid (3× the fold work at any codebook size)."""
        from grafeo_memory_spark.pipeline.ann import ivf_assign

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        cents = [
            (i, [float(x) for x in r[0]])
            for i, r in enumerate(
                emb.limit(4).select("embedding").collect()
            )
        ]
        plan = _plan(
            ivf_assign(
                emb, cents, vec_col="embedding", id_col="vec_id",
                with_sim=True,
            )
        )
        assert "Exchange" not in plan
        assert plan.count("SQRT(") == 1

    def test_shuffle_rows_is_one_range_sort(self, spark):
        """The epoch shuffle is exactly one range-partitioned global
        sort — no hash shuffle, no window (r9)."""
        from grafeo_memory_spark.pipeline.sampling import shuffle_rows

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(shuffle_rows(docs, "doc_id", seed=5))
        assert plan.count("Exchange rangepartitioning") == 1
        assert "Exchange hashpartitioning" not in plan


class TestCorpusOpPlans:
    def test_stratified_sample_is_map_only(self, spark):
        """The deterministic Bernoulli sample is a pure filter — zero
        exchanges, so at 100 TB it runs at scan speed with the filter
        in the same stage as the read."""
        from grafeo_memory_spark.pipeline.sampling import stratified_sample

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(
            stratified_sample(
                docs, "source", {"src0": 0.5}, id_col="doc_id"
            )
        )
        assert "Exchange" not in plan

    def test_mixture_sample_apply_is_map_only(self, spark):
        """After the |domains|-row solve, the applied sample must stay
        a map-only filter over the corpus."""
        from grafeo_memory_spark.pipeline.sampling import mixture_sample

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(
            mixture_sample(
                docs, "source", {"src0": 0.6, "src1": 0.4}, id_col="doc_id"
            )
        )
        assert "Exchange" not in plan

    def test_span_dedup_keyed_joins_only(self, spark):
        """Global span dedup is keyed shuffles end to end, never a pair
        blowup — and since r13 the reassembly is map-side: removed
        positions fold to one array per affected doc and LEFT-join 1:1
        onto the corpus, each doc rebuilding via an array filter. The
        per-LINE posexplode + anti-join + collect_list groupBy must not
        come back."""
        from grafeo_memory_spark.pipeline.dedup import dedup_spans_global

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(dedup_spans_global(docs, "text", "doc_id"))
        assert "CartesianProduct" not in plan
        assert "LeftAnti" not in plan  # per-line anti-join removed in r13
        assert plan.count("LeftOuter") == 1  # the 1:1 removed-pos join
        assert "array_contains" in plan  # map-side rebuild filter


class TestFuzzyDedup:
    def test_near_dedup_no_cartesian_and_anti_join_keep(self, spark):
        """The end-to-end fuzzy dedup must stay bucketed: candidate
        pairs ride the (band, band_hash) equi-join, and the final keep
        is an anti-join — never an all-pairs comparison."""
        from grafeo_memory_spark.pipeline.dedup import near_dedup

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(near_dedup(docs, "text", "doc_id"))
        assert "CartesianProduct" not in plan
        assert "LeftAnti" in plan


class TestTemporalJoinPlans:
    def test_range_join_left_is_two_hash_joins_no_window(self, spark):
        """The r7 left path is matched-inner ∪ anti-join — the r6
        surrogate-id window sort (a full shuffle+sort of the joined set
        on a per-row-unique key) must never come back."""
        from grafeo_memory_spark.operators.range_join import range_join

        # plan shape only — numeric point/bounds, values irrelevant
        ev = spark.read.parquet(f"{SF}/events.parquet")
        pts = ev.select(
            "user_id", F.col("event_id").cast("double").alias("x")
        )
        iv = ev.select(
            "user_id",
            (F.col("event_id") - 5).cast("double").alias("lo"),
            (F.col("event_id") + 5).cast("double").alias("hi"),
        )
        plan = _plan(
            range_join(
                pts, iv, point_col="x", lo_col="lo", hi_col="hi",
                on="user_id", how="left",
            )
        )
        assert "CartesianProduct" not in plan
        assert "LeftAnti" in plan
        assert "Window" not in plan
