"""Binned range join (operators/range_join.py): randomized
brute-force parity (the crossJoin+filter definition), keyed and
keyless forms, left padding, boundary inclusivity, the
bins-per-interval guard, and the no-nested-loop plan pin."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.operators.range_join import range_join


def _brute(points, intervals, keys):
    out = []
    for p in points:
        for iv in intervals:
            if all(p[k] == iv[k] for k in keys):
                if (
                    p["x"] is not None
                    and iv["lo"] is not None
                    and iv["hi"] is not None
                    and iv["lo"] <= p["x"] <= iv["hi"]
                ):
                    out.append((p["pid"], iv["iid"]))
    return sorted(out)


def test_randomized_brute_force_parity(spark):
    rng = random.Random(7)
    points = [
        dict(pid=i, key=rng.choice("ab"), x=rng.uniform(0, 100))
        for i in range(120)
    ]
    intervals = []
    for i in range(60):
        lo = rng.uniform(0, 100)
        intervals.append(
            dict(
                iid=i,
                key=rng.choice("ab"),
                lo=lo,
                hi=lo + rng.uniform(0, rng.choice([1, 5, 30])),
            )
        )
    pdf = spark.createDataFrame(points)
    idf = spark.createDataFrame(intervals)
    for bw in (None, 2.0, 50.0):
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(
                pdf,
                idf,
                point_col="x",
                lo_col="lo",
                hi_col="hi",
                on="key",
                bin_width=bw,
            ).collect()
        )
        assert got == _brute(points, intervals, ["key"]), f"bw={bw}"


def test_keyless_and_boundary_inclusive(spark):
    pdf = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 25.0)], "pid int, x double"
    )
    idf = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 20.0, 30.0)], "iid int, lo double, hi double"
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            pdf, idf, point_col="x", lo_col="lo", hi_col="hi", bin_width=5.0
        ).collect()
    )
    # both endpoints inclusive; x=20 matches both intervals
    assert got == [(1, 1), (2, 1), (2, 2), (3, 2)]


def test_left_join_pads_unmatched(spark):
    pdf = spark.createDataFrame([(1, 5.0), (2, 99.0)], "pid int, x double")
    idf = spark.createDataFrame([(1, 0.0, 10.0)], "iid int, lo double, hi double")
    rows = {
        r["pid"]: r["iid"]
        for r in range_join(
            pdf, idf, point_col="x", lo_col="lo", hi_col="hi",
            bin_width=10.0, how="left",
        ).collect()
    }
    assert rows == {1: 1, 2: None}


def test_degenerate_and_inverted_intervals(spark):
    pdf = spark.createDataFrame([(1, 5.0)], "pid int, x double")
    idf = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 9.0, 1.0), (3, None, 7.0)],
        "iid int, lo double, hi double",
    )
    got = [
        r["iid"]
        for r in range_join(
            pdf, idf, point_col="x", lo_col="lo", hi_col="hi", bin_width=1.0
        ).collect()
    ]
    assert got == [1]  # zero-span matches; inverted and NULL never do


def test_name_collision_suffix(spark):
    pdf = spark.createDataFrame([(1, 5.0, "p")], "pid int, x double, tag string")
    idf = spark.createDataFrame(
        [(1, 0.0, 10.0, "i")], "iid int, lo double, hi double, tag string"
    )
    row = range_join(
        pdf, idf, point_col="x", lo_col="lo", hi_col="hi", bin_width=10.0
    ).first()
    assert row["tag"] == "p" and row["tag_iv"] == "i"


def test_giant_interval_guard(spark):
    pdf = spark.createDataFrame([(1, 5.0)], "pid int, x double")
    idf = spark.createDataFrame(
        [(1, 0.0, 1e9)], "iid int, lo double, hi double"
    )
    with pytest.raises(Exception, match="range_join"):
        range_join(
            pdf, idf, point_col="x", lo_col="lo", hi_col="hi",
            bin_width=1.0, max_bins_per_interval=100,
        ).collect()
    with pytest.raises(ValueError):
        range_join(
            pdf, idf, point_col="x", lo_col="lo", hi_col="hi", bin_width=-1
        )


def test_plan_has_no_nested_loop(spark):
    pdf = spark.createDataFrame([(1, "a", 5.0)], "pid int, key string, x double")
    idf = spark.createDataFrame(
        [(1, "a", 0.0, 10.0)], "iid int, key string, lo double, hi double"
    )
    plan = (
        range_join(
            pdf, idf, point_col="x", lo_col="lo", hi_col="hi",
            on="key", bin_width=5.0,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


class TestLeftNullPassthrough:
    """VERDICT r5 #2: a matched point carrying a NULL in any
    passthrough column must appear exactly once (the old all-columns
    anti-join was null-unsafe and re-emitted it as a spurious
    NULL-padded 'unmatched' twin)."""

    def test_null_attribute_matched_once(self, spark):
        pts = spark.createDataFrame(
            [(1, 5.0, None), (2, 50.0, "x")], "pid int, x double, tag string"
        )
        iv = spark.createDataFrame(
            [(10, 0.0, 10.0)], "iid int, lo double, hi double"
        )
        rows = sorted(
            range_join(
                pts, iv, point_col="x", lo_col="lo", hi_col="hi",
                how="left", bin_width=10.0,
            ).collect(),
            key=lambda r: r["pid"],
        )
        assert len(rows) == 2
        assert rows[0]["iid"] == 10 and rows[0]["tag"] is None
        assert rows[1]["iid"] is None and rows[1]["lo"] is None

    def test_null_point_kept_unmatched_once(self, spark):
        pts = spark.createDataFrame(
            [(1, None, "a")], "pid int, x double, tag string"
        )
        iv = spark.createDataFrame(
            [(10, 0.0, 10.0)], "iid int, lo double, hi double"
        )
        rows = range_join(
            pts, iv, point_col="x", lo_col="lo", hi_col="hi",
            how="left", bin_width=10.0,
        ).collect()
        assert len(rows) == 1 and rows[0]["iid"] is None

    def test_bin_hit_between_miss_padded_null(self, spark):
        # point shares a bin with an interval but fails BETWEEN: the
        # unmatched representative must have NULLed interval columns
        pts = spark.createDataFrame([(1, 9.0)], "pid int, x double")
        iv = spark.createDataFrame(
            [(10, 0.0, 5.0)], "iid int, lo double, hi double"
        )
        rows = range_join(
            pts, iv, point_col="x", lo_col="lo", hi_col="hi",
            how="left", bin_width=10.0,
        ).collect()
        assert len(rows) == 1
        assert rows[0]["iid"] is None and rows[0]["lo"] is None

    def test_reserved_names_rejected(self, spark):
        pts = spark.createDataFrame([(1, 5.0, 0)], "pid int, x double, _rj_pid int")
        iv = spark.createDataFrame([(0.0, 10.0)], "lo double, hi double")
        with pytest.raises(ValueError, match="reserves"):
            range_join(pts, iv, point_col="x", lo_col="lo", hi_col="hi")


def test_inner_keyed_column_order_matches_contract(spark):
    """r12: with equi-keys the list-form join puts the keys FIRST, so
    the inner path used to emit (key, point cols…, interval cols…)
    while the docstring and the left path promise point columns first
    — caught by the hypothesis parity test's tuple compare (the
    by-name driver oracle could never see a pure ORDER break). Both
    paths must emit the same documented order."""
    pdf = spark.createDataFrame([(7, "a", 5.0)], "pid int, key string, x double")
    idf = spark.createDataFrame(
        [("a", 0.0, 10.0)], "key string, lo double, hi double"
    )
    kw = dict(point_col="x", lo_col="lo", hi_col="hi", on="key", bin_width=10.0)
    inner = range_join(pdf, idf, **kw)
    left = range_join(pdf, idf, how="left", **kw)
    assert inner.columns == ["pid", "key", "x", "lo", "hi"]
    assert left.columns == inner.columns
    assert tuple(inner.first()) == (7, "a", 5.0, 0.0, 10.0)
