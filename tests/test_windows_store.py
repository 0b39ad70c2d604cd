"""Unit tests for the window/ranking operators (SURVEY §2.5) and the
Store save/load roundtrip (S1) — tie handling and partition layout are
the behaviors the fixture oracles don't isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.operators.windows import (
    drop_newest,
    latest_per_group,
    rrf_score,
    top_k,
    top_k_per_group,
)
from grafeo_memory_spark.store import Store, empty_store, load_store, save_store


@pytest.fixture()
def scored(spark):
    return spark.createDataFrame(
        [
            ("a", 1, 100, 0.9),
            ("a", 2, 200, 0.7),
            ("a", 3, 300, 0.7),
            ("b", 4, 150, 0.8),
            ("b", 5, 250, 0.6),
        ],
        "grp string, id long, created_at long, score double",
    )


def test_top_k_deterministic_ties(scored):
    got = [
        r["id"]
        for r in top_k(
            scored, [F.col("score").desc(), F.col("id").asc()], 3
        ).collect()
    ]
    assert got == [1, 4, 2]  # 0.7 tie broken by id asc: 2 before 3


def test_top_k_per_group(scored):
    got = sorted(
        (r["grp"], r["id"])
        for r in top_k_per_group(
            scored, ["grp"], [F.col("score").desc(), F.col("id").asc()], 1
        ).collect()
    )
    assert got == [("a", 1), ("b", 4)]


def test_latest_per_group(scored):
    got = sorted(
        (r["grp"], r["id"])
        for r in latest_per_group(scored, ["grp"]).collect()
    )
    assert got == [("a", 3), ("b", 5)]


def test_drop_newest_keeps_oldest_ordered(scored):
    got = [
        r["id"]
        for r in drop_newest(scored, 2, tiebreak="id").collect()
    ]
    # newest 2 by (created_at, id) = ids 3 (300) and 5 (250); rest
    # oldest-first: 100, 150, 200
    assert got == [1, 4, 2]


def test_drop_newest_preserve_all(scored):
    assert drop_newest(scored, 5, tiebreak="id").count() == 0
    assert drop_newest(scored, 99, tiebreak="id").count() == 0


def test_rrf_score_formula(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "rank long")
    got = [
        r["rrf"]
        for r in df.select(rrf_score(F.col("rank"), rrf_k=1).alias("rrf"))
        .orderBy("rank")
        .collect()
    ]
    assert got == pytest.approx([0.5, 1 / 3, 0.25])


def test_store_roundtrip(spark, tmp_path):
    store = empty_store(spark)
    n_rest = len(store.memories.schema) - 3
    mem = spark.createDataFrame(
        [
            (1, "hello", "u1") + (None,) * n_rest,
            (2, "world", "u2") + (None,) * n_rest,
        ],
        store.memories.schema,
    )
    save_store(Store(
        memories=mem,
        entities=store.entities,
        edges=store.edges,
        episodes=store.episodes,
        history=store.history,
    ), str(tmp_path / "db"))
    back = load_store(spark, str(tmp_path / "db"))
    assert sorted(r["text"] for r in back.memories.collect()) == [
        "hello", "world",
    ]
    # user_id partition layout survives (S10 partition-pruning analog):
    # per-user filter reads only that partition's files
    plan = back.memories.where(
        F.col("user_id") == "u1"
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "user_id" in plan
    assert set(back.memories.columns) == set(store.memories.columns)


def test_empty_store_schemas(spark):
    s = empty_store(spark)
    for df in (s.memories, s.entities, s.edges, s.episodes, s.history):
        assert df.count() == 0


def test_drop_newest_zero_preserves_nothing(scored):
    # preserve_recent=0 → the slice is everything, oldest first
    got = [r["id"] for r in drop_newest(scored, 0, tiebreak="id").collect()]
    assert got == [1, 4, 2, 5, 3]


def test_bucketed_edges_join_without_shuffle(spark, tmp_path):
    """Two tables bucketed on src join with no Exchange on either side
    — the co-located traversal-join layout for scale."""
    from grafeo_memory_spark.store import save_edges_bucketed

    s = empty_store(spark)
    edges = spark.createDataFrame(
        [(i, i % 50, 1000 + i, "HAS_ENTITY", None, None) for i in range(500)],
        s.edges.schema,
    )
    st = Store(
        memories=s.memories, entities=s.entities, edges=edges,
        episodes=s.episodes, history=s.history,
    )
    save_edges_bucketed(
        st, "edges_bucketed_test", n_buckets=8,
        path=str(tmp_path / "edges_bucketed"),
    )
    try:
        t = spark.table("edges_bucketed_test")
        joined = (
            t.alias("a")
            .join(t.alias("b"), F.col("a.src") == F.col("b.src"))
            .where(F.col("a.edge_id") < F.col("b.edge_id"))
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", "10485760"
            )
        # bucketed-on-src both sides: the join needs no shuffle stage
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS edges_bucketed_test")
