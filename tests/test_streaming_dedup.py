"""Streaming dedup: exact watermarked dedup end-to-end, and the
incremental MinHash/LSH near-dup sink — cross-batch suppression,
within-batch keep-first, replay idempotence, and state pruning."""

from __future__ import annotations

import os

import pytest

from grafeo_memory_spark.streaming.dedup import (
    DOC_STREAM_SCHEMA,
    IncrementalDedupSink,
    read_doc_stream,
    run_incremental_dedup_stream,
    streaming_exact_dedup,
)

T0 = 1_700_000_000_000

ALPHA = "the quick brown fox jumps over the lazy dog again and again"
BETA = "colorless green ideas sleep furiously every single night indeed"
GAMMA = "completely different third document with its own unique words"


def _docs(spark, rows):
    return spark.createDataFrame(
        [dict(doc_id=i, ts=t, text=x) for i, t, x in rows], DOC_STREAM_SCHEMA
    )


def _write_batch(spark, path, rows):
    _docs(spark, rows).coalesce(1).write.mode("append").parquet(path)


class TestExactStreamingDedup:
    def test_batch_fallback_same_key(self, spark):
        out = streaming_exact_dedup(
            _docs(spark, [(1, T0, ALPHA), (2, T0 + 1, ALPHA), (3, T0 + 2, BETA)])
        ).collect()
        assert {r["text"] for r in out} == {ALPHA, BETA}
        assert len(out) == 2

    def test_stream_end_to_end(self, spark, tmp_path):
        src = str(tmp_path / "in")
        _write_batch(spark, src, [
            (1, T0 + 1000, ALPHA),
            (2, T0 + 2000, ALPHA),   # dup within watermark → dropped
            (3, T0 + 3000, BETA),
        ])
        dedup = streaming_exact_dedup(read_doc_stream(spark, src))
        q = (
            dedup.writeStream.format("memory")
            .queryName("exact_dedup_out")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()
        got = spark.sql("SELECT doc_id, text FROM exact_dedup_out").collect()
        assert sorted(r["doc_id"] for r in got) == [1, 3]


class TestIncrementalNearDup:
    def test_cross_batch_suppression(self, spark, tmp_path):
        src, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        _write_batch(spark, src, [(1, T0, ALPHA), (2, T0 + 1, BETA)])
        sink = run_incremental_dedup_stream(spark, src, ckpt)
        assert sorted(
            r["doc_id"] for r in sink.survivors(spark).collect()
        ) == [1, 2]

        # second micro-batch: near-copy of ALPHA (one word changed)
        # collides in at least one band; GAMMA survives
        near_alpha = ALPHA.replace("lazy", "sleepy")
        _write_batch(spark, src, [(10, T0 + 9000, near_alpha),
                                  (11, T0 + 9001, GAMMA)])
        sink = run_incremental_dedup_stream(spark, src, ckpt)
        ids = sorted(r["doc_id"] for r in sink.survivors(spark).collect())
        assert 11 in ids and 10 not in ids
        assert ids == [1, 2, 11]

    def test_within_batch_keep_first(self, spark, tmp_path):
        src, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        _write_batch(spark, src, [
            (5, T0, ALPHA),
            (7, T0 + 1, ALPHA),                      # exact dup of 5
            # near dup of 5 — this variant provably shares band 0 with
            # ALPHA under the fixed seeded hashes (deterministic)
            (9, T0 + 2, ALPHA.replace("lazy", "sleepy")),
            (3, T0 + 3, BETA),
        ])
        sink = run_incremental_dedup_stream(spark, src, ckpt)
        ids = sorted(r["doc_id"] for r in sink.survivors(spark).collect())
        assert ids == [3, 5]  # smallest id per duplicate group wins

    def test_replay_is_idempotent(self, spark, tmp_path):
        """Replaying a batch against post-batch state must reproduce the
        same survivors (state read excludes the batch's own version)."""
        sink = IncrementalDedupSink(
            survivors_path=str(tmp_path / "surv"),
            state_path=str(tmp_path / "state"),
        )
        b0 = _docs(spark, [(1, T0, ALPHA), (2, T0 + 1, BETA)])
        sink(b0, 0)
        first = sorted(
            r["doc_id"] for r in sink.survivors(spark).collect()
        )
        sink(b0, 0)  # replay after v0 state exists
        again = sorted(
            r["doc_id"] for r in sink.survivors(spark).collect()
        )
        assert first == again == [1, 2]

    def test_state_write_is_per_batch(self, spark, tmp_path):
        """Each batch writes O(batch) state rows — only its own
        survivor bands land in its partition dir, never the cumulative
        corpus (the scale contract: per-batch sink cost stays flat)."""
        sink = IncrementalDedupSink(
            survivors_path=str(tmp_path / "surv"),
            state_path=str(tmp_path / "state"),
        )
        for i, text in enumerate((ALPHA, BETA, GAMMA)):
            sink(_docs(spark, [(100 + i, T0 + i, text)]), i)
        for i in range(3):
            part = spark.read.parquet(
                str(tmp_path / "state" / f"batch_id={i}")
            )
            # 1 surviving doc × 4 bands per batch — not i+1 docs' worth
            assert part.count() == sink.bands
            assert set(r["id"] for r in part.collect()) == {100 + i}
        # the read side still unions the whole corpus
        bands = sink.corpus_bands(spark)
        assert sorted(
            set(r["id"] for r in bands.collect())
        ) == [100, 101, 102]

    def test_compaction_bounds_dir_count(self, spark, tmp_path):
        sink = IncrementalDedupSink(
            survivors_path=str(tmp_path / "surv"),
            state_path=str(tmp_path / "state"),
            compact_every=2,
        )
        texts = [
            f"wholly distinct document number {i} with unique tokens "
            f"zeta{i} eta{i} theta{i} iota{i} kappa{i}"
            for i in range(6)
        ]
        for i, text in enumerate(texts):
            sink(_docs(spark, [(200 + i, T0 + i, text)]), i)
        dirs = [
            d for d in os.listdir(str(tmp_path / "state"))
            if d.startswith(("batch_id=", "compact_id="))
        ]
        # closed partitions fold whenever more than compact_every pile up
        assert len(dirs) <= sink.compact_every + 2
        assert any(d.startswith("compact_id=") for d in dirs)
        bands = sink.corpus_bands(spark)
        assert sorted(set(r["id"] for r in bands.collect())) == [
            200 + i for i in range(6)
        ]
        # replay of the newest batch after compaction is still idempotent
        sink(_docs(spark, [(205, T0 + 5, texts[5])]), 5)
        ids = sorted(r["doc_id"] for r in sink.survivors(spark).collect())
        assert ids == [200 + i for i in range(6)]

    def test_compaction_crash_residue_is_harmless(self, spark, tmp_path):
        """A crash between the fold's atomic publish and the original
        dirs' removal leaves overlapping state (compact dir + folded
        originals). Reads must tolerate the duplicate band rows and
        dedup results must not change."""
        import shutil

        sink = IncrementalDedupSink(
            survivors_path=str(tmp_path / "surv"),
            state_path=str(tmp_path / "state"),
            compact_every=2,
        )
        texts = [
            f"fully distinct residue document {i} with tokens "
            f"mu{i} nu{i} xi{i} omicron{i} pi{i}"
            for i in range(4)
        ]
        for i, text in enumerate(texts):
            sink(_docs(spark, [(300 + i, T0 + i, text)]), i)
        state = tmp_path / "state"
        compacts = [d for d in os.listdir(state)
                    if d.startswith("compact_id=")]
        assert compacts
        # simulate the crash window: resurrect a folded original as a
        # duplicate of rows already inside the compact dir
        shutil.copytree(state / compacts[0], state / "batch_id=0")
        bands = sink.corpus_bands(spark)
        assert sorted(set(r["id"] for r in bands.collect())) == [
            300 + i for i in range(4)
        ]
        # a near-dup of doc 300 must still be suppressed exactly once
        sink(_docs(spark, [(400, T0 + 9, texts[0])]), 9)
        ids = sorted(r["doc_id"] for r in sink.survivors(spark).collect())
        assert ids == [300 + i for i in range(4)]


class TestSimHashSink:
    """SimHash twin of the incremental sink (r7): same band-state
    protocol, blocking from the 64-bit fingerprint's pigeonhole bands,
    drops verified with bit_count(xor) <= max_hamming."""

    def _sink(self, tmp_path, **kw):
        from grafeo_memory_spark.streaming.dedup import SimHashDedupSink

        return SimHashDedupSink(
            survivors_path=str(tmp_path / "surv"),
            state_path=str(tmp_path / "state"),
            **kw,
        )

    def test_cross_batch_suppression_and_verify(self, spark, tmp_path):
        sink = self._sink(tmp_path, max_hamming=6)
        sink(_docs(spark, [(1, T0, ALPHA), (2, T0 + 1, BETA)]), 0)
        assert sorted(
            r["doc_id"] for r in sink.survivors(spark).collect()
        ) == [1, 2]
        # near-copy of ALPHA: one-word unigram drift stays within the
        # Hamming budget; GAMMA's profile is far outside it
        near_alpha = ALPHA.replace("lazy", "sleepy")
        sink(_docs(spark, [(10, T0 + 9000, near_alpha),
                           (11, T0 + 9001, GAMMA)]), 1)
        ids = sorted(r["doc_id"] for r in sink.survivors(spark).collect())
        assert ids == [1, 2, 11]

    def test_band_collision_alone_does_not_drop(self, spark, tmp_path):
        """Unlike the greedy MinHash tier, a shared band value with a
        LARGE overall Hamming distance must NOT suppress the doc — the
        verify gate is what separates candidates from duplicates."""
        from pyspark.sql import functions as F

        from grafeo_memory_spark.pipeline.dedup import simhash64

        sink = self._sink(tmp_path, max_hamming=0)
        # max_hamming=0 → only bit-identical fingerprints may drop;
        # ALPHA vs its variant share no full 64-bit equality
        near_alpha = ALPHA.replace("lazy", "sleepy")
        fps = (
            _docs(spark, [(1, T0, ALPHA), (2, T0 + 1, near_alpha)])
            .select(simhash64("text", 1).alias("fp"))
            .collect()
        )
        assert fps[0]["fp"] != fps[1]["fp"]  # precondition
        sink(_docs(spark, [(1, T0, ALPHA)]), 0)
        sink(_docs(spark, [(2, T0 + 1, near_alpha)]), 1)
        ids = sorted(r["doc_id"] for r in sink.survivors(spark).collect())
        assert ids == [1, 2]

    def test_within_batch_keep_first_and_replay(self, spark, tmp_path):
        sink = self._sink(tmp_path, max_hamming=6)
        b0 = _docs(spark, [
            (7, T0 + 1, ALPHA),
            (5, T0, ALPHA),                          # exact dup, smaller id
            (9, T0 + 2, ALPHA.replace("lazy", "sleepy")),
            (3, T0 + 3, BETA),
        ])
        sink(b0, 0)
        ids = sorted(r["doc_id"] for r in sink.survivors(spark).collect())
        assert ids == [3, 5]
        sink(b0, 0)  # replay against post-batch state
        again = sorted(r["doc_id"] for r in sink.survivors(spark).collect())
        assert again == [3, 5]

    def test_state_carries_fingerprint(self, spark, tmp_path):
        sink = self._sink(tmp_path, max_hamming=3)
        sink(_docs(spark, [(1, T0, ALPHA)]), 0)
        bands = sink.corpus_bands(spark)
        assert {"id", "fp", "band", "band_hash"} <= set(bands.columns)
        assert bands.count() == 4  # max_hamming+1 bands per survivor
