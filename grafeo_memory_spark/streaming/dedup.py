"""Streaming deduplication for continuous corpus ingest (builder
brief: training-data pipelines ingest forever; dedup can't be a
batch-only pass).

Two tiers, matching the batch operators in ``pipeline/dedup.py``:

- **Exact**: content-hash key + ``dropDuplicatesWithinWatermark`` —
  Spark's native streaming dedup operator. State is bounded by the
  watermark horizon (keys older than the watermark are evicted), so it
  runs indefinitely at ingest scale; duplicates arriving farther apart
  than the horizon are caught downstream by the batch pass.
- **Near-dup (MinHash/LSH)**: a ``foreachBatch`` sink that keeps the
  corpus band table as an *append-only* ``batch_id=``-partitioned
  parquet table (nothing driver-resident). Per batch: signature + band
  the new docs (one explode + one groupBy), drop docs colliding with
  the stored corpus bands or with a smaller-id batch sibling, then
  write ONLY this batch's survivor bands to its own partition dir —
  per-batch state I/O is O(batch), not O(corpus), so the sink's cost
  per micro-batch stays flat forever. Reads union the partitions
  strictly below the current batch_id (replay therefore sees the
  pre-batch corpus and reproduces the same survivors). Every
  ``compact_every`` batches the closed partitions fold into one file
  set so the dir count — not the data volume — stays bounded. The
  band-table join is an equi-join on (band, band_hash) — the same
  bucketed, never-all-pairs shape as the batch LSH path.

A lakehouse deployment swaps the partition dirs for MERGE INTO on a
Delta/Iceberg band table; the per-batch logical plan is identical.

A third tier — unbounded-horizon exact-key suppression in constant
(Bloom bitmap) state — lives in ``streaming/bloom_dedup.py``.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from grafeo_memory_spark.pipeline.dedup import (
    content_hash,
    lsh_bands,
    minhash_signature,
)

#: file-stream schema for document ingest tests/backfills
DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),  # event-time, epoch ms
        T.StructField("text", T.StringType(), True),
    ]
)


def read_doc_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(DOC_STREAM_SCHEMA).parquet(path)


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact streaming dedup on normalized content hash. Streaming
    input → ``dropDuplicatesWithinWatermark`` (bounded state, eviction
    past the horizon); batch input → plain ``dropDuplicates`` on the
    same key, so the operator composes with backfills unchanged."""
    keyed = docs.withColumn("_ckey", content_hash(text_col))
    if not docs.isStreaming:
        return keyed.dropDuplicates(["_ckey"]).drop("_ckey")
    return (
        keyed.withColumn(
            "_evt", F.timestamp_millis(F.col(ts_col).cast("long"))
        )
        .withWatermark("_evt", watermark)
        .dropDuplicatesWithinWatermark(["_ckey"])
        .drop("_ckey", "_evt")
    )


@dataclass
class IncrementalDedupSink:
    """foreachBatch near-dup sink: survivors append to a
    batch_id-partitioned parquet table (overwrite-per-batch-dir →
    idempotent replays) and the corpus band table is append-only in the
    same pattern — each batch writes ONLY its own survivor bands to
    ``state_path/batch_id=N``, so per-batch state I/O is O(batch) while
    the corpus grows without bound. State reads union the partitions
    strictly *below* the current batch_id, so a replayed batch sees the
    pre-batch corpus — not its own output — and reproduces the same
    survivor set instead of dropping everything as self-duplicates.
    Partitions below the current batch fold into one file set whenever
    more than ``compact_every`` have accumulated (the merged dir keeps
    the largest folded batch_id, preserving the strictly-below read)."""

    survivors_path: str
    state_path: str
    num_perm: int = 16
    bands: int = 4
    rows: int = 4
    shingle_n: int = 3
    compact_every: int = 8

    def _state_dirs(self) -> list[tuple[int, str]]:
        """(id, dirname) for every live state dir: ``batch_id=N`` holds
        batch N's survivor bands, ``compact_id=N`` holds the folded
        bands of every batch ≤ N."""
        if not os.path.isdir(self.state_path):
            return []
        out: list[tuple[int, str]] = []
        for d in os.listdir(self.state_path):
            for prefix in ("batch_id=", "compact_id="):
                if d.startswith(prefix) and d[len(prefix):].isdigit():
                    out.append((int(d[len(prefix):]), d))
        return sorted(out)

    def _versions(self) -> list[int]:
        return sorted(v for v, _ in self._state_dirs())

    def _read_bands(
        self, spark: SparkSession, before: int | None = None
    ) -> DataFrame | None:
        dirs = self._state_dirs()
        if before is not None:
            dirs = [(v, d) for v, d in dirs if v < before]
        if not dirs:
            return None
        # a crash between compaction's publish and its cleanup leaves a
        # compact dir overlapping the originals — the union then holds
        # duplicate band rows, which is harmless: every consumer is a
        # semi-join or distinct over (band, band_hash, id)
        return spark.read.parquet(
            *[os.path.join(self.state_path, d) for _, d in dirs]
        )

    def _compact(self, spark: SparkSession, below: int) -> None:
        """Fold the closed dirs (< ``below``) into one ``compact_id=``
        dir keyed by the largest folded id. O(state) I/O, amortized:
        runs once per ``compact_every`` batches.

        Crash-safe ordering: the merged fold is written to a tmp dir
        and atomically renamed into place BEFORE any original is
        removed — a crash at any point leaves either the originals
        (publish not reached) or the published fold plus leftover
        originals (duplicates, harmless per ``_read_bands``; removed by
        the next fold). Nothing is ever deleted while it is the only
        copy."""
        dirs = [(v, d) for v, d in self._state_dirs() if v < below]
        if len(dirs) <= self.compact_every:
            return
        maxv = dirs[-1][0]
        target = os.path.join(self.state_path, f"compact_id={maxv}")
        if os.path.exists(target):  # crash residue with the same high id
            return
        merged = spark.read.parquet(
            *[os.path.join(self.state_path, d) for _, d in dirs]
        )
        tmp = os.path.join(self.state_path, "_compact_tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, target)  # atomic publish
        for _, d in dirs:
            shutil.rmtree(
                os.path.join(self.state_path, d), ignore_errors=True
            )

    # ------------------------------------------------- band strategy
    # (overridden by SimHashDedupSink; the state/compaction machinery
    # and the per-batch survivor protocol are method-agnostic)

    def _bands(self, batch: DataFrame) -> DataFrame:
        """(id, band, band_hash) blocking rows for one batch."""
        sig = minhash_signature(
            batch, "text", "doc_id", num_perm=self.num_perm, n=self.shingle_n
        )
        return lsh_bands(sig, self.bands, self.rows)

    def _within_batch_dominated(self, new_bands: DataFrame) -> DataFrame:
        """ids dominated by a smaller-id same-bucket sibling."""
        return (
            new_bands.alias("a")
            .join(
                new_bands.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.id") > F.col("b.id")),
            )
            .select(F.col("a.id").alias("id"))
            .distinct()
        )

    def _vs_corpus(
        self, new_bands: DataFrame, prior: DataFrame
    ) -> DataFrame:
        """ids colliding with the stored corpus band table."""
        return (
            new_bands.join(prior, ["band", "band_hash"], "left_semi")
            .select("id")
            .distinct()
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        prior = self._read_bands(spark, before=batch_id)

        # exact within-batch first: smallest doc_id wins per content key
        batch = (
            batch.withColumn("_ckey", content_hash("text"))
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("_ckey").orderBy(F.col("doc_id").asc())
                ),
            )
            .where(F.col("_rn") == 1)
            .drop("_ckey", "_rn")
        )

        new_bands = self._bands(batch)

        # drop: collides with the stored corpus, or with a smaller-id
        # sibling in the same batch bucket (greedy keep-first)
        dropped = self._within_batch_dominated(new_bands)
        if prior is not None:
            dropped = dropped.unionByName(
                self._vs_corpus(new_bands, prior)
            ).distinct()

        survivors = batch.join(
            dropped.withColumnRenamed("id", "doc_id"), "doc_id", "left_anti"
        )
        survivors.write.mode("overwrite").parquet(
            os.path.join(self.survivors_path, f"batch_id={batch_id}")
        )

        # append-only state: this batch's survivor bands ONLY —
        # O(batch) rows written no matter how large the corpus is
        surv_bands = new_bands.join(
            survivors.select(F.col("doc_id").alias("id")), "id", "left_semi"
        )
        surv_bands.write.mode("overwrite").parquet(
            os.path.join(self.state_path, f"batch_id={batch_id}")
        )
        self._compact(spark, below=batch_id)

    # ------------------------------------------------------ read side
    def survivors(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self.survivors_path).parquet(
            self.survivors_path + "/batch_id=*"
        )

    def corpus_bands(self, spark: SparkSession) -> DataFrame | None:
        return self._read_bands(spark)


@dataclass
class SimHashDedupSink(IncrementalDedupSink):
    """The SimHash twin of :class:`IncrementalDedupSink` (r7): same
    append-only ``batch_id=`` band-state protocol, compaction, and
    strictly-below replay reads, but blocking comes from the 64-bit
    SimHash pigeonhole bands (`pipeline/dedup.simhash_bands`) and —
    unlike the greedy MinHash tier, where a band collision is already
    r-minhash agreement — every collision is VERIFIED with
    ``bit_count(fp_a xor fp_b) <= max_hamming`` before a doc is
    dropped, exactly the batch operator's semantics
    (`pipeline/dedup.simhash_near_dup`). The fingerprint rides the
    state rows (one extra long per band row), so verification against
    the stored corpus needs no side lookup."""

    max_hamming: int = 3
    ngram: int = 1

    def _bands(self, batch: DataFrame) -> DataFrame:
        from grafeo_memory_spark.pipeline.dedup import (
            simhash64,
            simhash_bands,
        )

        fp = batch.select(
            F.col("doc_id").alias("id"), simhash64("text", self.ngram).alias("fp")
        )
        return simhash_bands(fp, self.max_hamming).withColumnRenamed(
            "val", "band_hash"
        )

    def _within_batch_dominated(self, new_bands: DataFrame) -> DataFrame:
        return (
            new_bands.alias("a")
            .join(
                new_bands.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.id") > F.col("b.id"))
                & (
                    F.bit_count(
                        F.col("a.fp").bitwiseXOR(F.col("b.fp"))
                    )
                    <= self.max_hamming
                ),
            )
            .select(F.col("a.id").alias("id"))
            .distinct()
        )

    def _vs_corpus(
        self, new_bands: DataFrame, prior: DataFrame
    ) -> DataFrame:
        return (
            new_bands.alias("a")
            .join(
                prior.select(
                    "band", "band_hash", F.col("fp").alias("_fp_prior")
                ),
                ["band", "band_hash"],
            )
            .where(
                F.bit_count(F.col("fp").bitwiseXOR(F.col("_fp_prior")))
                <= self.max_hamming
            )
            .select("id")
            .distinct()
        )


def run_incremental_dedup_stream(
    spark: SparkSession,
    path: str,
    checkpoint: str,
    sink_cls: type = IncrementalDedupSink,
    **sink_kw,
) -> IncrementalDedupSink:
    """Wire the near-dup stream end-to-end with an availableNow trigger
    (process everything present, then stop) — test/backfill mode; a
    live deployment drops the trigger. ``sink_cls`` picks the blocking
    method: :class:`IncrementalDedupSink` (MinHash/LSH, default) or
    :class:`SimHashDedupSink` (banded Hamming, verified drops)."""
    sink = sink_cls(
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
