"""Unit tests for the predicate operators (SURVEY.md §2.2) — exact
reference semantics including NULL handling and the memory_type
back-compat rule (`search/vector.py:351-381`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.operators.filters import (
    compile_filters,
    not_expired,
    scope_filter,
    time_range,
    valid_at_point,
)


@pytest.fixture(scope="module")
def mem(spark):
    rows = [
        # id, user_id, memory_type, importance, expired_at, valid_at, invalid_at, created_at
        (1, "u1", "semantic", 0.9, None, None, None, 1000),
        (2, "u1", None, 0.5, None, 500, 1500, 2000),
        (3, "u2", "procedural", None, 9000, 800, None, 3000),
        (4, "u1", "episodic", 0.1, None, 2500, None, 4000),
    ]
    return spark.createDataFrame(
        rows,
        "id long, user_id string, memory_type string, importance double,"
        "expired_at long, valid_at long, invalid_at long, created_at long",
    )


def ids(df):
    return sorted(r["id"] for r in df.collect())


def test_scope_filter(mem):
    assert ids(mem.where(scope_filter(user_id="u1"))) == [1, 2, 4]
    assert ids(mem.where(scope_filter())) == [1, 2, 3, 4]


def test_memory_type_backcompat(mem):
    # missing memory_type ≡ "semantic" (reference search/vector.py:360-363)
    assert ids(mem.where(compile_filters({"memory_type": "semantic"}))) == [1, 2]


def test_ne_nin_null_pass(mem):
    # NULL importance passes $ne / $nin (reference dict-get returns None)
    assert ids(mem.where(compile_filters({"importance": {"$ne": 0.5}}))) == [1, 3, 4]
    assert ids(mem.where(compile_filters({"importance": {"$nin": [0.5, 0.9]}}))) == [3, 4]


def test_range_in_contains(mem):
    assert ids(mem.where(compile_filters({"importance": {"$gte": 0.5, "$lte": 0.9}}))) == [1, 2]
    assert ids(mem.where(compile_filters({"user_id": {"$in": ["u2"]}}))) == [3]
    assert ids(mem.where(compile_filters({"user_id": {"$contains": "1"}}))) == [1, 2, 4]


def test_unknown_op_raises():
    with pytest.raises(ValueError):
        compile_filters({"x": {"$regex": ".*"}})


def test_soft_expiry(mem):
    assert ids(mem.where(not_expired())) == [1, 2, 4]
    assert ids(mem.where(not_expired(include_expired=True))) == [1, 2, 3, 4]


def test_time_range(mem):
    assert ids(mem.where(time_range(time_after=2000, time_before=3000))) == [2, 3]
    assert ids(mem.where(time_range(time_after=3500))) == [4]


def test_valid_at_point(mem):
    # pit=1000: id1 NULL valid_at passes (permissive); id2 valid 500-1500
    # passes; id3 valid from 800 passes; id4 valid from 2500 fails
    assert ids(mem.where(valid_at_point(1000))) == [1, 2, 3]
    # pit=1600: id2's invalid_at=1500 has passed
    assert ids(mem.where(valid_at_point(1600))) == [1, 3]
