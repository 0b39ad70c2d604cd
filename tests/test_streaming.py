"""Streaming session-chain tests: cross-batch LEADS_TO continuity via
the availableNow file stream, and the watermarked window rollup."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.streaming.session_chain import (
    EVENT_SCHEMA,
    batch_session_links,
    run_session_chain_stream,
    session_tails,
    windowed_event_counts,
)

T0 = 1_700_000_000_000


def _events(spark, rows):
    return spark.createDataFrame(
        [dict(event_id=i, ts=t, user_id=u, session_id=s, text=None)
         for i, t, u, s in rows],
        EVENT_SCHEMA,
    )


def test_batch_links_within_session(spark):
    b = _events(spark, [
        (1, T0 + 1000, "u1", "s1"),
        (2, T0 + 2000, "u1", "s1"),
        (3, T0 + 3000, "u1", "s2"),   # different session → no link
        (4, T0 + 4000, "u2", "s1"),   # different user → no link
        (5, T0 + 5000, "u1", "s1"),
    ])
    links = {(r["src_event"], r["dst_event"]) for r in
             batch_session_links(b).collect()}
    assert links == {(1, 2), (2, 5)}


def test_cross_batch_boundary_link(spark):
    b1 = _events(spark, [(1, T0 + 1000, "u1", "s1"), (2, T0 + 2000, "u1", "s1")])
    tails = session_tails(b1)
    b2 = _events(spark, [(3, T0 + 3000, "u1", "s1")])
    links = {(r["src_event"], r["dst_event"]) for r in
             batch_session_links(b2, tails).collect()}
    assert links == {(2, 3)}  # first event of batch 2 chains to batch 1 tail
    # tails update after batch 2
    t2 = session_tails(b2, tails).collect()
    assert [(r["session_id"], r["event_id"]) for r in t2] == [("s1", 3)]


def test_streaming_end_to_end(spark, tmp_path):
    src = os.path.join(str(tmp_path), "events")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(src)
    # two files → (at least) two micro-batches with availableNow+maxFiles
    _events(spark, [(1, T0 + 1000, "u1", "s1"), (2, T0 + 2000, "u1", "s1")]) \
        .coalesce(1).write.mode("append").parquet(src)
    _events(spark, [(3, T0 + 3000, "u1", "s1"), (4, T0 + 1000, "u2", "s9")]) \
        .coalesce(1).write.mode("append").parquet(src)
    sink = run_session_chain_stream(spark, src, ckpt)
    links = {(r["src_event"], r["dst_event"])
             for r in sink.links(spark).collect()}
    # regardless of how files were batched, the chain 1→2→3 must come
    # out whole and u2's singleton must not link
    assert links == {(1, 2), (2, 3)}
    # state lives in a table, one row per live session, not on the driver
    tails = {(r["user_id"], r["session_id"], r["event_id"])
             for r in sink.tails(spark).collect()}
    assert tails == {("u1", "s1", 3), ("u2", "s9", 4)}


def test_windowed_counts_watermark(spark):
    ev = _events(spark, [
        (1, T0, "u1", "s1"),
        (2, T0 + 10 * 60_000, "u1", "s1"),
        (3, T0 + 70 * 60_000, "u1", "s1"),   # next hour window
        (4, T0, "u2", "s1"),
    ])
    out = {(r["user_id"], r["window_start"].minute, r["n_events"])
           for r in windowed_event_counts(ev).collect()}
    counts = sorted(r[2] for r in out)
    assert counts == [1, 1, 2]


def test_fold_session_batch_pure():
    import pandas as pd

    from grafeo_memory_spark.streaming.session_chain import (
        _fold_session_batch,
    )

    pdf = pd.DataFrame(
        {"event_id": [3, 1, 2], "ts": [T0 + 30, T0 + 10, T0 + 30]}
    )
    n, last_ts, last_id = _fold_session_batch(pdf, 5, T0, 0)
    assert n == 8
    assert last_ts == T0 + 30
    assert last_id == 3  # (ts, event_id) tie-break: 3 beats 2 at same ts
    # empty batch is a no-op
    assert _fold_session_batch(pdf.iloc[0:0], 8, last_ts, last_id) == (
        8, last_ts, last_id,
    )


def test_stateful_session_summaries_stream(spark, tmp_path):
    from grafeo_memory_spark.streaming.session_chain import (
        read_event_stream,
        stateful_session_summaries,
    )

    src = tmp_path / "events"
    os.makedirs(src)
    _events(
        spark,
        [
            (1, T0 + 10, "u", "s1"),
            (2, T0 + 20, "u", "s1"),
            (3, T0 + 15, "u", "s2"),
        ],
    ).coalesce(1).write.mode("overwrite").parquet(str(src))

    out = stateful_session_summaries(read_event_stream(spark, str(src)))
    q = (
        out.writeStream.format("memory")
        .queryName("session_summaries")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        (r["user_id"], r["session_id"]): r
        for r in spark.sql("select * from session_summaries").collect()
    }
    assert rows[("u", "s1")]["n_events"] == 2
    assert rows[("u", "s1")]["last_event_id"] == 2
    assert rows[("u", "s2")]["n_events"] == 1
    assert rows[("u", "s2")]["last_ts"] == T0 + 15
    assert not rows[("u", "s1")]["closed"]


def test_sink_restart_resumes_from_persisted_state(spark, tmp_path):
    # a NEW sink instance over the same state dir picks up the tails a
    # previous instance wrote — recovery is state-table-driven, nothing
    # lives on the driver (T1/T2 restart semantics)
    from grafeo_memory_spark.streaming.session_chain import SessionChainSink

    links = os.path.join(str(tmp_path), "links")
    state = os.path.join(str(tmp_path), "state")
    first = SessionChainSink(links_path=links, state_path=state)
    first(_events(spark, [(1, T0 + 1000, "u1", "s1"),
                          (2, T0 + 2000, "u1", "s1")]), 0)

    second = SessionChainSink(links_path=links, state_path=state)
    second(_events(spark, [(3, T0 + 3000, "u1", "s1")]), 1)
    got = {(r["src_event"], r["dst_event"])
           for r in second.links(spark).collect()}
    assert got == {(1, 2), (2, 3)}  # cross-instance chain is unbroken


def test_sink_batch_replay_is_idempotent(spark, tmp_path):
    # foreachBatch may replay a batch id after failure: the per-batch
    # overwrite directory makes the replay converge, not duplicate
    from grafeo_memory_spark.streaming.session_chain import SessionChainSink

    links = os.path.join(str(tmp_path), "links")
    state = os.path.join(str(tmp_path), "state")
    sink = SessionChainSink(links_path=links, state_path=state)
    b0 = _events(spark, [(1, T0 + 1000, "u1", "s1"),
                         (2, T0 + 2000, "u1", "s1")])
    sink(b0, 0)
    sink(b0, 0)  # replay same batch id
    got = [(r["src_event"], r["dst_event"])
           for r in sink.links(spark).collect()]
    assert got == [(1, 2)]  # once, not twice


def test_state_versions_pruned(spark, tmp_path):
    from grafeo_memory_spark.streaming.session_chain import SessionChainSink

    links = os.path.join(str(tmp_path), "links")
    state = os.path.join(str(tmp_path), "state")
    sink = SessionChainSink(links_path=links, state_path=state,
                            keep_versions=2)
    for i in range(4):
        sink(_events(spark, [(10 + i, T0 + (i + 1) * 1000, "u1", "s1")]), i)
    assert sink._versions() == [2, 3]  # bounded state history
    # and the surviving state is still correct
    tails = [(r["session_id"], r["event_id"])
             for r in sink.tails(spark).collect()]
    assert tails == [("s1", 13)]
