"""Streaming Bloom dedup tier: exact-key suppression across the whole
stream lifetime in **constant state**.

The two existing streaming tiers trade state for precision:
``dropDuplicatesWithinWatermark`` is exact but forgets keys past the
watermark horizon; the LSH band sink remembers forever but its state
grows with the corpus (append-only, O(batch) writes). This tier fills
the remaining corner: *unbounded-horizon* exact-key suppression whose
state is a fixed ``m/8``-byte Bloom bitmap — the OR of the emitted
keys' bit positions — so per-batch state I/O is O(m/8) = **constant**,
independent of both corpus and batch size.

The price is the Bloom contract: a false positive drops a
genuinely-new document (bounded by the design fpp while the filter is
sized for the stream's lifetime keys; monitor :meth:`fill_ratio`).
Because the hashes are deterministic, the behavior is *consistent*: a
key that false-positives always false-positives, so replays and
duplicates are handled identically. Compose with the exact tier when a
horizon-bounded lossless pass should run first.

Replay idempotence follows the band sink's convention: batch N reads
the newest filter version strictly *below* N and overwrites its own
survivor partition, so a replayed batch sees the pre-batch state and
reproduces the same output; publishing the filter is an atomic
tmp+rename. State versions older than ``keep_versions`` batches are
pruned (Structured Streaming only ever replays the last uncommitted
batch).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.bloom import (
    BloomFilter,
    _position_cols,
    bloom_might_contain,
    bloom_parameters,
)
from grafeo_memory_spark.pipeline.dedup import content_hash
from grafeo_memory_spark.streaming.dedup import read_doc_stream

__all__ = ["BloomDedupSink", "run_bloom_dedup_stream"]


@dataclass
class BloomDedupSink:
    """foreachBatch sink: emit only documents whose content key is
    definitely unseen, then OR the emitted keys into the persisted
    filter. ``expected_keys``/``fpp`` size the bitmap once for the
    stream's lifetime (1% fpp ≈ 9.6 bits/key: 10M keys ≈ 12 MB)."""

    survivors_path: str
    state_path: str
    expected_keys: int = 1_000_000
    fpp: float = 0.01
    salt: int = 0
    keep_versions: int = 3
    m_bits: int = field(init=False)
    k: int = field(init=False)

    def __post_init__(self) -> None:
        self.m_bits, self.k = bloom_parameters(self.expected_keys, self.fpp)

    # ------------------------------------------------------ state I/O
    def _versions(self) -> list[int]:
        if not os.path.isdir(self.state_path):
            return []
        out = []
        for f in os.listdir(self.state_path):
            if f.startswith("bloom_v") and f.endswith(".json"):
                mid = f[len("bloom_v"):-len(".json")]
                if mid.isdigit():
                    out.append(int(mid))
        return sorted(out)

    def _read_filter(self, before: int | None = None) -> BloomFilter:
        vs = self._versions()
        if before is not None:
            vs = [v for v in vs if v < before]
        if not vs:
            return BloomFilter(
                m_bits=self.m_bits,
                k=self.k,
                salt=self.salt,
                words=[0] * (self.m_bits // 64),
            )
        with open(
            os.path.join(self.state_path, f"bloom_v{vs[-1]}.json")
        ) as fh:
            d = json.load(fh)
        # the update path ORs positions computed with the *configured*
        # (m_bits, k, salt) into the stored words — a restart with a
        # different expected_keys/fpp/salt would silently mis-probe (or
        # IndexError on a size mismatch), so refuse a divergent state
        if (d["m_bits"], d["k"], d["salt"]) != (
            self.m_bits,
            self.k,
            self.salt,
        ):
            raise ValueError(
                "BloomDedupSink: persisted filter was built with "
                f"(m_bits={d['m_bits']}, k={d['k']}, salt={d['salt']}) "
                f"but the sink is configured for (m_bits={self.m_bits}, "
                f"k={self.k}, salt={self.salt}). Keep expected_keys/fpp/"
                "salt stable across restarts, or rebuild the state by "
                "replaying the survivors into a fresh state_path."
            )
        return BloomFilter(
            m_bits=d["m_bits"], k=d["k"], salt=d["salt"], words=d["words"]
        )

    def _write_filter(self, bf: BloomFilter, batch_id: int) -> None:
        os.makedirs(self.state_path, exist_ok=True)
        tmp = os.path.join(self.state_path, f"_tmp_v{batch_id}.json")
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "m_bits": bf.m_bits,
                    "k": bf.k,
                    "salt": bf.salt,
                    "words": bf.words,
                },
                fh,
            )
        os.replace(
            tmp, os.path.join(self.state_path, f"bloom_v{batch_id}.json")
        )
        for v in self._versions():
            if v < batch_id - self.keep_versions:
                os.remove(
                    os.path.join(self.state_path, f"bloom_v{v}.json")
                )

    def fill_ratio(self) -> float:
        """Fraction of set bits in the newest filter — the saturation
        monitor (fpp ≈ fill^k; past the design point, re-shard or
        resize on the next deployment)."""
        bf = self._read_filter()
        ones = sum(bin(w & (1 << 64) - 1).count("1") for w in bf.words)
        return ones / bf.m_bits

    # ----------------------------------------------------- batch body
    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        prior = self._read_filter(before=batch_id)
        keyed = batch.withColumn("_key", content_hash("text"))
        # within-batch exact: smallest doc_id wins per key
        keyed = (
            keyed.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("_key").orderBy(F.col("doc_id").asc())
                ),
            )
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        survivors = keyed.where(
            ~bloom_might_contain("_key", prior)
        ).localCheckpoint()  # freeze: the write and the position scan agree
        survivors.drop("_key").write.mode("overwrite").parquet(
            os.path.join(self.survivors_path, f"batch_id={batch_id}")
        )
        pos_rows = (
            survivors.select(
                F.explode(
                    F.array(
                        *_position_cols(
                            F.col("_key"), self.m_bits, self.k, self.salt
                        )
                    )
                ).alias("pos")
            )
            .distinct()
            .collect()
        )
        words = [w & (1 << 64) - 1 for w in prior.words]  # unsigned view
        for r in pos_rows:
            p = r["pos"]
            words[p >> 6] |= 1 << (p & 63)
        words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
        self._write_filter(
            BloomFilter(
                m_bits=self.m_bits, k=self.k, salt=self.salt, words=words
            ),
            batch_id,
        )

    # ------------------------------------------------------ read side
    def survivors(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self.survivors_path).parquet(
            self.survivors_path + "/batch_id=*"
        )


def run_bloom_dedup_stream(
    spark: SparkSession, path: str, checkpoint: str, **sink_kw
) -> BloomDedupSink:
    """Wire the Bloom tier end-to-end with an availableNow trigger
    (test/backfill mode; a live deployment drops the trigger)."""
    sink = BloomDedupSink(
        survivors_path=os.path.join(checkpoint, "_survivors"),
        state_path=os.path.join(checkpoint, "_state"),
        **sink_kw,
    )
    q = (
        read_doc_stream(spark, path)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink
