"""Streaming ingest with session-chain semantics (SURVEY.md §2.12
T1/T2): the reference links each new memory to its session's latest
prior memory under a per-user lock (`manager.py:1182-1223,283-284`);
the streaming analog derives the same LEADS_TO edges continuously.

Design: ``foreachBatch`` + per-batch window. Each micro-batch is
repartitioned by session key and lag-windowed *within* the batch; the
cross-batch boundary link (first event of a batch → last event of the
previous batch) comes from a small "session tails" state table that the
sink maintains — the Spark equivalent of the reference's per-session
pointer. Per-key ordering holds because event-time ordering within a
session is resolved by the window, and batch boundaries are serialized
by the streaming engine (T2: one writer per micro-batch).

A watermarked tumbling-window rollup is included as the late-data
pattern (the reference itself never drops late data — bi-temporal
columns make lateness a query-time concern — so the watermark here
guards state size only).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),  # epoch ms
        T.StructField("user_id", T.StringType(), False),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source event stream (one parquet/json drop per ingest
    batch). ``maxFilesPerTrigger`` bounds batch size in production."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(path)


def batch_session_links(
    batch: DataFrame, tails: DataFrame | None = None
) -> DataFrame:
    """Derive LEADS_TO pairs for one (micro-)batch: lag over
    (user, session) ordered by (ts, event_id), plus boundary links from
    the previous batches' session tails (state rows shaped like events:
    the last event per session so far).

    Returns (user_id, session_id, src_event, dst_event, sequence).
    """
    cols = ["event_id", "ts", "user_id", "session_id"]
    ext = batch.select(*cols).withColumn("_is_tail", F.lit(False))
    if tails is not None:
        ext = ext.unionByName(
            tails.select(*cols).withColumn("_is_tail", F.lit(True))
        )
    w = Window.partitionBy("user_id", "session_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    linked = ext.select(
        "user_id",
        "session_id",
        F.lag("event_id").over(w).alias("src_event"),
        F.col("event_id").alias("dst_event"),
        F.row_number().over(w).alias("sequence"),
        "_is_tail",
    )
    # tail rows only *provide* predecessors; they are not new links
    return linked.where(
        F.col("src_event").isNotNull() & ~F.col("_is_tail")
    ).drop("_is_tail")


def session_tails(batch: DataFrame, tails: DataFrame | None = None) -> DataFrame:
    """New state after a batch: the latest event per (user, session)."""
    cols = ["event_id", "ts", "user_id", "session_id"]
    ext = batch.select(*cols)
    if tails is not None:
        ext = ext.unionByName(tails.select(*cols))
    w = Window.partitionBy("user_id", "session_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ext.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


@dataclass
class SessionChainSink:
    """foreachBatch sink keeping BOTH outputs in tables, not on the
    driver: links append to a batch_id-partitioned parquet table
    (overwrite-per-batch-dir → idempotent replays), and the per-session
    tail state is versioned parquet snapshots of a bounded table (one
    row per live session) rather than a driver list. Per batch that is
    one append + one small overwrite — no ``collect()`` anywhere, so
    the sink's memory footprint is independent of stream volume (the
    round-2 verdict's scale-killer).

    A lakehouse deployment swaps the versioned snapshot for MERGE INTO
    on a Delta/Iceberg state table; the logical per-batch plan is the
    same.
    """

    links_path: str
    state_path: str
    keep_versions: int = 2

    def _versions(self) -> list[int]:
        import os

        if not os.path.isdir(self.state_path):
            return []
        return sorted(
            int(d[1:]) for d in os.listdir(self.state_path)
            if d.startswith("v") and d[1:].isdigit()
        )

    def _read_tails(self, spark: SparkSession) -> DataFrame | None:
        vs = self._versions()
        if not vs:
            return None
        import os

        return spark.read.parquet(
            os.path.join(self.state_path, f"v{vs[-1]}")
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        import os
        import shutil

        spark = batch.sparkSession
        tails = self._read_tails(spark)
        out = batch_session_links(batch, tails)
        out.write.mode("overwrite").parquet(
            os.path.join(self.links_path, f"batch_id={batch_id}")
        )
        session_tails(batch, tails).write.mode("overwrite").parquet(
            os.path.join(self.state_path, f"v{batch_id}")
        )
        for v in self._versions()[: -self.keep_versions]:
            shutil.rmtree(
                os.path.join(self.state_path, f"v{v}"), ignore_errors=True
            )

    # ------------------------------------------------------ read side
    def links(self, spark: SparkSession) -> DataFrame:
        """All emitted LEADS_TO links across batches."""
        return spark.read.option("basePath", self.links_path).parquet(
            self.links_path + "/batch_id=*"
        )

    def tails(self, spark: SparkSession) -> DataFrame | None:
        """Current per-session tail state (one row per live session)."""
        return self._read_tails(spark)


def run_session_chain_stream(
    spark: SparkSession, path: str, checkpoint: str
) -> SessionChainSink:
    """Wire the stream end-to-end with an availableNow trigger (process
    everything present, then stop) — the test/backfill mode; a live
    deployment drops the trigger. Link + state tables live next to the
    stream checkpoint."""
    import os

    sink = SessionChainSink(
        links_path=os.path.join(checkpoint, "_links"),
        state_path=os.path.join(checkpoint, "_state"),
    )
    q = (
        read_event_stream(spark, path)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink


SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("last_ts", T.LongType(), False),
        T.StructField("last_event_id", T.LongType(), False),
    ]
)

SESSION_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("last_ts", T.LongType(), False),
        T.StructField("last_event_id", T.LongType(), False),
        T.StructField("closed", T.BooleanType(), False),
    ]
)


def stateful_session_summaries(
    events: DataFrame, timeout_ms: int | None = None
) -> DataFrame:
    """T1/T2 as a *custom stateful operator*: per-(user, session) running
    summaries via ``applyInPandasWithState`` — the Arrow-batched state
    API for semantics the built-in windows can't express (a running
    per-key event count with a session pointer that must survive across
    micro-batches, the streaming form of the reference's per-session
    tail at `manager.py:1191-1209`).

    Each invocation folds the batch's events into the key's state and
    emits a summary row. ``timeout_ms`` (continuous deployments only)
    closes idle sessions via a processing-time timeout — emits
    ``closed=true`` and drops the state, bounding state size. Leave it
    ``None`` for availableNow/backfill runs: a registered
    processing-time timeout keeps scheduling micro-batches to evaluate
    expirations, so the availableNow trigger would never terminate.

    Works only under Structured Streaming (state requires a streaming
    query); the per-batch logic is plain pandas and unit-testable via
    ``_fold_session_batch``.
    """
    import pandas as pd  # noqa: F401  (signature requirement)
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def fold(key, pdf_iter, state: GroupState):
        if state.hasTimedOut:
            n, last_ts, last_id = state.get
            state.remove()
            yield _summary_pdf(key, n, last_ts, last_id, closed=True)
            return
        n, last_ts, last_id = state.get if state.exists else (0, 0, 0)
        for pdf in pdf_iter:
            n, last_ts, last_id = _fold_session_batch(
                pdf, n, last_ts, last_id
            )
        state.update((n, last_ts, last_id))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield _summary_pdf(key, n, last_ts, last_id, closed=False)

    return events.groupBy("user_id", "session_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_SUMMARY_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def _fold_session_batch(pdf, n: int, last_ts: int, last_id: int):
    """Fold one Arrow batch of a session's events into (n, last_ts,
    last_event_id) — ordered by (ts, event_id), reference tie-break."""
    if len(pdf) == 0:
        return n, last_ts, last_id
    ordered = pdf.sort_values(["ts", "event_id"])
    tail = ordered.iloc[-1]
    return (
        n + len(pdf),
        int(tail["ts"]),
        int(tail["event_id"]),
    )


def _summary_pdf(key, n, last_ts, last_id, *, closed):
    import pandas as pd

    user_id, session_id = key
    return pd.DataFrame(
        [
            {
                "user_id": user_id,
                "session_id": session_id,
                "n_events": n,
                "last_ts": last_ts,
                "last_event_id": last_id,
                "closed": closed,
            }
        ]
    )


def windowed_event_counts(events: DataFrame, gap_minutes: int = 60) -> DataFrame:
    """Watermarked tumbling-window rollup (late-data guard pattern):
    events per user per hour, 10-minute watermark. Works on both batch
    and streaming DataFrames."""
    ts = F.timestamp_millis(F.col("ts"))
    return (
        events.withColumn("event_time", ts)
        .withWatermark("event_time", "10 minutes")
        .groupBy(
            F.window("event_time", f"{gap_minutes} minutes").alias("win"),
            "user_id",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"), "user_id", "n_events"
        )
    )
