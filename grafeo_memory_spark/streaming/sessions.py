"""Streaming gap sessionization (SURVEY.md §2.12 companion): the
continuous twin of ``operators/windows.sessionize``, built on Structured
Streaming's native ``session_window`` — a dynamic-gap event-time window
that closes when a key sees no events for ``gap``; the watermark both
bounds state and decides when a session is final.

Design notes (100-TB shape):
- ``session_window`` is the engine-managed merging-window operator:
  state per OPEN session only, merged incrementally per micro-batch —
  not per event — and evicted the moment the watermark passes
  session_end. No custom ``applyInPandasWithState`` needed for the
  rollup case, so the hot path stays JVM-side.
- Late events inside the watermark extend/merge sessions like the batch
  op's gap rule; events later than the watermark are dropped (the batch
  op, re-run over the lakehouse table, is the backfill story). One
  boundary nuance: ``session_window`` windows are half-open
  ``[t, t+gap)``, so an event arriving EXACTLY ``gap`` after the
  previous one starts a new session here, while the batch op's
  strict-greater rule keeps it — a measure-zero disagreement on
  continuous timestamps; pass ``gap`` plus one tick when exact parity
  matters.
- Output mode: use ``append`` with the watermark so only CLOSED
  sessions emit — the contract a downstream training-data or billing
  job wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["session_rollup_stream"]


def session_rollup_stream(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-(key, session) rollup over a streaming DataFrame: one output
    row per closed session with its bounds and totals.

    ``ts_col`` must be a timestamp column (cast upstream if the source
    ships epoch numbers). Returns a streaming DataFrame; write it with
    ``.writeStream.outputMode("append")`` so rows emit only when the
    watermark closes the session.
    """
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), key)
        .agg(*aggs)
        .select(
            key,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            *[c for c in ["n_events", "first_ts", "last_ts", "total_value"]
              if value_col is not None or c != "total_value"],
        )
    )
