"""Streaming gap sessionization (`streaming/sessions.py`): the native
session_window rollup must close sessions on gap + watermark and agree
with the batch `sessionize` split on the same events."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from grafeo_memory_spark.operators.windows import sessionize
from grafeo_memory_spark.streaming.sessions import session_rollup_stream

T0 = "2024-01-01 00:00:00"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, f"2024-01-01 {h:02d}:{m:02d}:00", u, v)
         for i, (h, m, u, v) in enumerate(rows)],
        "event_id long, ts_s string, user_id string, value double",
    ).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "user_id",
        "value",
    )


def test_session_rollup_stream_closes_on_gap(spark, tmp_path):
    src = tmp_path / "events"
    os.makedirs(src)
    # u1: two events 10 min apart (one session), then one 2h later (new
    # session); the 12h-later sentinel advances the watermark far enough
    # to close everything before it
    rows = [
        (0, 0, "u1", 1.0),
        (0, 10, "u1", 2.0),
        (2, 0, "u1", 4.0),
        (12, 0, "u2", 8.0),
    ]
    _ev(spark, rows).coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id string, value double"
    ).parquet(str(src))
    out = session_rollup_stream(
        stream, key="user_id", ts_col="ts", gap="30 minutes",
        watermark="0 seconds",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_rollup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], str(r["session_start"])): (
            r["n_events"], r["total_value"],
        )
        for r in spark.sql("SELECT * FROM sess_rollup").collect()
    }
    # u1's two closed sessions emitted; u2's session is still open
    # (nothing after it to move the watermark past its end)
    assert got == {
        ("u1", "2024-01-01 00:00:00"): (2, 3.0),
        ("u1", "2024-01-01 02:00:00"): (1, 4.0),
    }


def test_stream_split_agrees_with_batch_sessionize(spark, tmp_path):
    rows = [
        (0, 0, "u1", 1.0),
        (0, 20, "u1", 1.0),
        (1, 0, "u1", 1.0),   # 40 min gap → new session in both
        (9, 0, "u2", 1.0),   # sentinel to close u1's sessions
    ]
    ev = _ev(spark, rows)
    batch = sessionize(
        ev, ["user_id"], "ts", F.expr("INTERVAL 30 MINUTES"),
        tiebreak="event_id",
    )
    n_batch_sessions = (
        batch.where(F.col("user_id") == "u1")
        .select("session_seq").distinct().count()
    )

    src = tmp_path / "events2"
    os.makedirs(src)
    ev.coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id string, value double"
    ).parquet(str(src))
    q = (
        session_rollup_stream(
            stream, key="user_id", ts_col="ts", gap="30 minutes",
            watermark="0 seconds",
        )
        .writeStream.format("memory")
        .queryName("sess_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_stream_sessions = (
        spark.sql("SELECT * FROM sess_parity")
        .where(F.col("user_id") == "u1")
        .count()
    )
    assert n_batch_sessions == n_stream_sessions == 2
