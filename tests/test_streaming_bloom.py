"""Streaming Bloom dedup tier (streaming/bloom_dedup.py): end-to-end
availableNow run, cross-batch suppression with constant state size,
replay idempotence against the strictly-below filter version, version
pruning, and fill-ratio monitoring."""

from __future__ import annotations

import os

from grafeo_memory_spark.streaming.bloom_dedup import (
    BloomDedupSink,
    run_bloom_dedup_stream,
)
from tests.test_streaming_dedup import _docs, _write_batch

T0 = 1_700_000_000_000
ALPHA = "alpha doc about spark shuffles and partitions"
BETA = "beta doc entirely different maritime navigation"
GAMMA = "gamma doc a third subject matter altogether"


def _sink(tmp_path):
    return BloomDedupSink(
        survivors_path=str(tmp_path / "surv"),
        state_path=str(tmp_path / "state"),
        expected_keys=1000,
    )


class TestBloomDedupSink:
    def test_end_to_end_stream(self, spark, tmp_path):
        src = str(tmp_path / "in")
        _write_batch(
            spark, src,
            [(1, T0, ALPHA), (2, T0 + 1, ALPHA), (3, T0 + 2, BETA)],
        )
        sink = run_bloom_dedup_stream(
            spark, src, str(tmp_path / "ckpt"), expected_keys=1000
        )
        out = sink.survivors(spark).collect()
        assert {r["text"] for r in out} == {ALPHA, BETA}
        assert len(out) == 2  # within-batch dup suppressed

    def test_cross_batch_suppression_and_constant_state(
        self, spark, tmp_path
    ):
        sink = _sink(tmp_path)
        sink(_docs(spark, [(1, T0, ALPHA), (2, T0 + 1, BETA)]), 0)
        sink(_docs(spark, [(3, T0 + 2, ALPHA), (4, T0 + 3, GAMMA)]), 1)
        texts = [r["text"] for r in sink.survivors(spark).collect()]
        assert sorted(texts) == sorted([ALPHA, BETA, GAMMA])
        import json

        # state is the fixed bitmap: the word count never grows with
        # the corpus (json byte size only wobbles with digit lengths)
        w0 = json.load(
            open(os.path.join(sink.state_path, "bloom_v0.json"))
        )["words"]
        w1 = json.load(
            open(os.path.join(sink.state_path, "bloom_v1.json"))
        )["words"]
        assert len(w0) == len(w1) == sink.m_bits // 64

    def test_replay_is_idempotent(self, spark, tmp_path):
        sink = _sink(tmp_path)
        sink(_docs(spark, [(1, T0, ALPHA)]), 0)
        batch1 = [(2, T0 + 1, ALPHA), (3, T0 + 2, BETA)]
        sink(_docs(spark, batch1), 1)
        first = sorted(
            r["doc_id"] for r in sink.survivors(spark).collect()
        )
        sink(_docs(spark, batch1), 1)  # crash-replay of batch 1
        second = sorted(
            r["doc_id"] for r in sink.survivors(spark).collect()
        )
        assert first == second == [1, 3]

    def test_version_pruning(self, spark, tmp_path):
        sink = _sink(tmp_path)
        for b in range(6):
            sink(_docs(spark, [(b, T0 + b, f"doc number {b}")]), b)
        vs = sink._versions()
        assert vs[-1] == 5
        assert min(vs) >= 5 - sink.keep_versions
        assert sink.survivors(spark).count() == 6

    def test_fill_ratio_monotone(self, spark, tmp_path):
        sink = _sink(tmp_path)
        assert sink.fill_ratio() == 0.0
        sink(_docs(spark, [(1, T0, ALPHA)]), 0)
        r1 = sink.fill_ratio()
        sink(_docs(spark, [(2, T0 + 1, BETA)]), 1)
        r2 = sink.fill_ratio()
        assert 0 < r1 < r2 < 0.05


class TestStateValidation:
    """ADVICE r5 (low): a restart with different expected_keys/fpp/salt
    must refuse the divergent persisted filter instead of mis-probing
    or IndexError-ing."""

    def test_divergent_config_raises(self, spark, tmp_path):
        import pytest

        src = str(tmp_path / "in")
        _write_batch(spark, src, [(1, T0, ALPHA)])
        run_bloom_dedup_stream(
            spark, src, str(tmp_path / "ck"), expected_keys=1000
        )
        resized = BloomDedupSink(
            survivors_path=str(tmp_path / "ck" / "_survivors"),
            state_path=str(tmp_path / "ck" / "_state"),
            expected_keys=5000,
        )
        with pytest.raises(ValueError, match="persisted filter"):
            resized._read_filter()

    def test_same_config_reads_fine(self, spark, tmp_path):
        src = str(tmp_path / "in")
        _write_batch(spark, src, [(1, T0, ALPHA)])
        sink = run_bloom_dedup_stream(
            spark, src, str(tmp_path / "ck"), expected_keys=1000
        )
        bf = sink._read_filter()
        assert bf.m_bits == sink.m_bits and bf.k == sink.k
