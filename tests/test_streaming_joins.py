"""Stream-stream interval join: bounded-lookback matches, inclusive
bounds, and left-outer NULL emission after the watermark passes."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from grafeo_memory_spark.streaming.joins import stream_interval_join


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, value double"
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "value"
    ).coalesce(1).write.mode("overwrite").parquet(str(path))


def _read_stream(spark, path):
    return spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).parquet(str(path))


def test_interval_join_bounded_lookback(spark, tmp_path):
    # purchases at 01:00 and 03:00; clicks at 00:30 (inside 1h of the
    # first), 00:50, and 02:50 (inside 1h of the second). The 00:30
    # click is outside the second purchase's lookback.
    lp, rp = tmp_path / "purch", tmp_path / "clicks"
    os.makedirs(lp), os.makedirs(rp)
    _write(spark, lp, [
        (1, "2024-01-01 01:00:00", 7, 10.0),
        (2, "2024-01-01 03:00:00", 7, 20.0),
    ])
    _write(spark, rp, [
        (100, "2024-01-01 00:30:00", 7, 1.0),
        (101, "2024-01-01 00:50:00", 7, 2.0),
        (102, "2024-01-01 02:50:00", 7, 3.0),
    ])
    out = stream_interval_join(
        _read_stream(spark, lp), _read_stream(spark, rp),
        key="user_id", ts_col="ts", lookback="1 hour",
        watermark="0 seconds",
    )
    q = (
        out.writeStream.format("memory").queryName("ivj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["event_id"], r["event_id_r"])
        for r in spark.sql("SELECT * FROM ivj").collect()
    }
    assert got == {(1, 100), (1, 101), (2, 102)}


def test_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    lp, rp = tmp_path / "l", tmp_path / "r"
    os.makedirs(lp), os.makedirs(rp)
    _write(spark, lp, [
        (1, "2024-01-01 01:00:00", 7, 10.0),   # no click in window
        (2, "2024-01-01 05:00:00", 8, 20.0),   # matched
        (3, "2024-01-01 23:00:00", 9, 30.0),   # watermark pusher
    ])
    _write(spark, rp, [
        (200, "2024-01-01 04:30:00", 8, 1.0),
        (201, "2024-01-01 23:30:00", 9, 2.0),  # watermark pusher
    ])
    out = stream_interval_join(
        _read_stream(spark, lp), _read_stream(spark, rp),
        key="user_id", ts_col="ts", lookback="1 hour",
        watermark="0 seconds", how="leftOuter",
    )
    q = (
        out.writeStream.format("memory").queryName("ivj2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q.processAllAvailable()
        # drop a later batch into a NEW file so the advanced watermark
        # flushes the unmatched left row (outer results emit only after
        # the watermark passes the row's join horizon)
        spark.createDataFrame(
            [(99, "2024-01-02 12:00:00", 1, 0.0)],
            "event_id long, ts_s string, user_id long, value double",
        ).select(
            "event_id", F.to_timestamp("ts_s").alias("ts"),
            "user_id", "value",
        ).coalesce(1).write.mode("append").parquet(str(lp))
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM ivj2").collect()
    by_left = {r["event_id"]: r["event_id_r"] for r in rows}
    assert by_left.get(2) == 200
    assert 1 in by_left and by_left[1] is None  # unmatched row emitted


def test_rejects_full_outer(spark, tmp_path):
    import pytest

    lp = tmp_path / "x"
    os.makedirs(lp)
    _write(spark, lp, [(1, "2024-01-01 01:00:00", 7, 1.0)])
    s = _read_stream(spark, lp)
    with pytest.raises(ValueError):
        stream_interval_join(s, s, key="user_id", how="fullOuter")
