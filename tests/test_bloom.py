"""Bloom filter (pipeline/bloom.py): no false negatives, bounded false
positives, pure-Python position replay, Spark/driver probe parity,
two-tier incremental-dedup composition, and a map-only plan pin."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.bloom import (
    SEED_STRIDE,
    BloomFilter,
    bloom_build,
    bloom_filter_unseen,
    bloom_might_contain,
    bloom_parameters,
)


def test_parameters_formulas():
    m, k = bloom_parameters(1000, 0.01)
    assert m % 64 == 0
    assert 9000 <= m <= 9700  # -1000·ln(.01)/ln(2)² ≈ 9585
    assert k == 7
    with pytest.raises(ValueError):
        bloom_parameters(0)
    with pytest.raises(ValueError):
        bloom_parameters(10, 1.5)


def test_no_false_negatives(spark):
    vals = [f"doc-{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], ["key"])
    bf = bloom_build(df, "key", n_items=500, fpp=0.01)
    hits = (
        df.where(bloom_might_contain("key", bf)).count()
    )
    assert hits == 500  # every inserted key must probe true
    assert all(bf.contains(v) for v in vals)


def test_false_positive_rate_bounded(spark):
    ins = spark.createDataFrame(
        [(f"in-{i}",) for i in range(2000)], ["key"]
    )
    bf = bloom_build(ins, "key", n_items=2000, fpp=0.01)
    probe = spark.createDataFrame(
        [(f"out-{i}",) for i in range(5000)], ["key"]
    )
    fp = probe.where(bloom_might_contain("key", bf)).count()
    assert fp / 5000 < 0.03  # 3× headroom over the 1% design point


def test_position_replay_matches_spark(spark):
    df = spark.createDataFrame([("alpha",), ("beta",)], ["key"])
    m_bits, k, salt = 1024, 3, 7
    from grafeo_memory_spark.pipeline.bloom import _position_cols

    rows = df.select(
        "key", F.array(*_position_cols(F.col("key"), m_bits, k, salt)).alias("p")
    ).collect()
    for r in rows:
        assert list(r["p"]) == BloomFilter.positions(
            r["key"], m_bits, k, salt
        )
    # and the underlying md5 convention is the documented one
    h = int(
        hashlib.md5(f"alpha#{salt * SEED_STRIDE}".encode()).hexdigest()[:15],
        16,
    )
    assert BloomFilter.positions("alpha", m_bits, k, salt)[0] == h % m_bits


def test_driver_and_spark_probes_agree(spark):
    ins = spark.createDataFrame([(f"k{i}",) for i in range(200)], ["key"])
    bf = bloom_build(ins, "key", n_items=200)
    probe_vals = [f"k{i}" for i in range(150, 250)] + ["zz", "yy"]
    probe = spark.createDataFrame([(v,) for v in probe_vals], ["key"])
    got = {
        r["key"]: r["hit"]
        for r in probe.select(
            "key", bloom_might_contain("key", bf).alias("hit")
        ).collect()
    }
    for v in probe_vals:
        assert got[v] == bf.contains(v)


def test_two_tier_incremental_dedup(spark):
    seen = spark.createDataFrame(
        [(f"old-{i}",) for i in range(300)], ["content_key"]
    )
    bf = bloom_build(seen, "content_key", n_items=300)
    batch = spark.createDataFrame(
        [(f"old-{i}",) for i in range(100)]
        + [(f"new-{i}",) for i in range(100)],
        ["content_key"],
    )
    fresh = bloom_filter_unseen(batch, "content_key", bf)
    keys = {r["content_key"] for r in fresh.collect()}
    assert all(k.startswith("new-") for k in keys)  # no seen key leaks
    maybe = batch.where(bloom_might_contain("content_key", bf))
    # the expensive tier's input: all 100 true dups + few FPs
    assert 100 <= maybe.count() <= 110


def test_null_and_determinism(spark):
    df = spark.createDataFrame([("a",), (None,)], ["key"])
    bf1 = bloom_build(df, "key", n_items=1)
    bf2 = bloom_build(df, "key", n_items=1)
    assert bf1 == bf2
    rows = df.select(bloom_might_contain("key", bf1).alias("h")).collect()
    assert sorted(r["h"] for r in rows) == [False, True]


def test_probe_plan_is_map_only(spark):
    df = spark.createDataFrame([("a",)], ["key"])
    bf = bloom_build(df, "key", n_items=1)
    plan = (
        df.where(bloom_might_contain("key", bf))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan

class TestCapAndSharding:
    """VERDICT r5 #4: a single filter past ``max_m_bits`` rides the
    plan as a multi-hundred-MB literal — builds must raise with
    sharding advice, and the sharded build must round-trip."""

    def test_oversized_build_raises(self, spark):
        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError, match="bloom_build_sharded"):
            bloom_build(df, "v", n_items=1_000_000_000)

    def test_custom_cap_respected(self, spark):
        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError, match="max_m_bits"):
            bloom_build(df, "v", n_items=100_000, max_m_bits=1 << 10)

    def test_sharded_round_trip_and_parity(self, spark):
        from grafeo_memory_spark.pipeline.bloom import bloom_build_sharded

        vals = [(f"doc-{i}",) for i in range(300)]
        df = spark.createDataFrame(vals, "v string")
        sbf = bloom_build_sharded(df, "v", shards=4, n_items=300)
        assert len(sbf.shards) == 4
        # no false negatives, driver replay == Spark probe
        probe = spark.createDataFrame(
            vals + [(f"new-{i}",) for i in range(200)], "v string"
        )
        got = {
            r["v"]: r["hit"]
            for r in probe.select(
                "v", bloom_might_contain("v", sbf).alias("hit")
            ).collect()
        }
        for (v,) in vals:
            assert got[v] is True, f"false negative {v}"
            assert sbf.contains(v) is True
        fp = sum(got[f"new-{i}"] for i in range(200))
        assert fp <= 20  # 1% design fpp, generous slack
        for i in range(200):
            assert sbf.contains(f"new-{i}") == got[f"new-{i}"]

    def test_sharded_unseen_filter(self, spark):
        from grafeo_memory_spark.pipeline.bloom import bloom_build_sharded

        seen = spark.createDataFrame([(f"s{i}",) for i in range(50)], "v string")
        sbf = bloom_build_sharded(seen, "v", shards=2, n_items=50)
        new = spark.createDataFrame(
            [("s1",), ("neverseen-xyz",)], "v string"
        )
        out = [r["v"] for r in bloom_filter_unseen(new, "v", sbf).collect()]
        assert "s1" not in out

    def test_sharded_still_needs_sane_shards(self, spark):
        from grafeo_memory_spark.pipeline.bloom import bloom_build_sharded

        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError, match="raise shards"):
            bloom_build_sharded(
                df, "v", shards=2, n_items=10_000_000, max_m_bits=1 << 12
            )
        with pytest.raises(ValueError, match="shards"):
            bloom_build_sharded(df, "v", shards=0, n_items=10)
