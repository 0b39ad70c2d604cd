"""ANN quality pinning: IVF recall vs brute force, Lloyd training
improving assignment tightness, and int8 quantization accuracy — the
"is the approximation actually good" tier above plan-shape tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.vector import cosine_similarity, knn
from grafeo_memory_spark.pipeline.ann import (
    dequantize_int8,
    ivf_assign,
    ivf_centroids,
    ivf_topk,
    ivf_train,
    quantize_int8,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").localCheckpoint()


def _query_vec(emb, vid=0):
    return [float(x) for x in
            emb.where(F.col("vec_id") == vid).collect()[0]["embedding"]]


class TestIvfRecall:
    def test_recall_at_10_vs_brute_force(self, emb):
        qv = _query_vec(emb)
        exact = {
            r["vec_id"]
            for r in knn(emb, qv, k=10, id_col="vec_id",
                         vec_col="embedding").collect()
        }
        cents = ivf_centroids(emb, 16)
        assigned = ivf_assign(emb, cents)
        approx = {
            r["id"]
            for r in ivf_topk(assigned, cents, qv, k=10, nprobe=4).collect()
        }
        recall = len(exact & approx) / 10.0
        assert recall >= 0.5  # nprobe=4/16 lists must find most of top-10

    def test_more_probes_not_worse(self, emb):
        qv = _query_vec(emb, vid=7)
        cents = ivf_centroids(emb, 16)
        assigned = ivf_assign(emb, cents).localCheckpoint()
        exact = {
            r["vec_id"]
            for r in knn(emb, qv, k=10, id_col="vec_id",
                         vec_col="embedding").collect()
        }

        def recall(nprobe):
            got = {r["id"] for r in
                   ivf_topk(assigned, cents, qv, k=10,
                            nprobe=nprobe).collect()}
            return len(exact & got)

        r2, r8, r16 = recall(2), recall(8), recall(16)
        assert r2 <= r8 <= r16
        assert r16 == 10  # probing every list IS brute force


class TestIvfTrain:
    def test_lloyd_tightens_assignment(self, emb):
        """Mean best-centroid cosine must not decrease after Lloyd
        rounds (each round reassigns to nearer means)."""

        def tightness(cents):
            a = ivf_assign(emb, cents)
            cmap = {cid: c for cid, c in cents}
            lut = F.map_from_arrays(
                F.array(*[F.lit(cid) for cid in cmap]),
                F.array(*[
                    F.array(*[F.lit(float(x)) for x in c])
                    for c in cmap.values()
                ]),
            )
            return (
                a.select(
                    cosine_similarity(
                        F.col("v"), lut[F.col("centroid_id")]
                    ).alias("s")
                )
                .agg(F.avg("s"))
                .collect()[0][0]
            )

        seeds = ivf_centroids(emb, 8)
        trained = ivf_train(emb, 8, iterations=2)
        assert len(trained) == 8
        assert tightness(trained) >= tightness(seeds) - 1e-9

    def test_deterministic(self, emb):
        a = ivf_train(emb, 4, iterations=1)
        b = ivf_train(emb, 4, iterations=1)
        assert a == b


class TestInt8Quantization:
    def test_round_trip_cosine_error(self, emb):
        """Dequantized vectors must stay ≈parallel to the originals:
        cosine(v, dq(q(v))) ≥ 0.999 for every row."""
        qd = emb.select(
            "vec_id",
            "embedding",
            dequantize_int8(quantize_int8("embedding")).alias("back"),
        )
        worst = (
            qd.select(
                cosine_similarity("embedding", "back").alias("c")
            )
            .agg(F.min("c"))
            .collect()[0][0]
        )
        assert worst >= 0.999

    def test_quantized_values_bounded(self, emb, spark):
        row = (
            emb.limit(1)
            .select(quantize_int8("embedding").alias("qs"))
            .collect()[0]["qs"]
        )
        assert all(-127 <= x <= 127 for x in row["q"])
        assert row["scale"] > 0

    def test_zero_vector(self, spark):
        df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])],
                                   "id long, v array<double>")
        out = df.select(
            quantize_int8("v").alias("qs"),
            dequantize_int8(quantize_int8("v")).alias("back"),
        ).collect()[0]
        assert out["qs"]["scale"] == 0.0
        assert list(out["back"]) == [0.0, 0.0, 0.0]
