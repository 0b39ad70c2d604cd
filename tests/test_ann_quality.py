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


class TestProductQuantization:
    def test_codes_are_m_bytes_and_deterministic(self, emb):
        from grafeo_memory_spark.pipeline.ann import pq_encode, pq_train

        books = pq_train(emb, m=4, k=16, iterations=1)
        assert len(books) == 4 and len(books[0]) == 16
        codes = pq_encode(emb, books).collect()
        assert all(len(r["code"]) == 4 for r in codes)
        # codes are centroid indices offset by -128 into a signed byte
        assert all(0 <= c + 128 < 16 for r in codes for c in r["code"])
        again = pq_encode(emb, pq_train(emb, m=4, k=16, iterations=1)).collect()
        assert sorted(map(tuple, ((r["id"], tuple(r["code"])) for r in codes))) \
            == sorted(map(tuple, ((r["id"], tuple(r["code"])) for r in again)))

    def test_large_codebook_codes_survive_byte_encoding(self, emb):
        """k=200 (> 127) must round-trip through the signed-byte code
        column — a plain tinyint cast of the index overflows under ANSI
        mode; the -128 offset encoding is what makes the full k=256
        standard codebook representable."""
        from grafeo_memory_spark.pipeline.ann import (
            pq_adc_topk,
            pq_encode,
            pq_train,
        )

        books = pq_train(emb, m=4, k=200, iterations=0)
        encoded = pq_encode(emb, books).localCheckpoint()
        codes = encoded.collect()
        assert {c + 128 for r in codes for c in r["code"]} <= set(range(200))
        assert any(c + 128 > 127 for r in codes for c in r["code"])
        qv = _query_vec(emb, vid=0)
        top = pq_adc_topk(encoded, books, qv, k=3).collect()
        assert top[0]["id"] == 0  # the query vector itself ranks first

    def test_adc_recall_on_clustered_data(self, spark):
        """Planted clusters: inter-cluster distance dominates
        quantization error, so ADC must retrieve the query's cluster.
        (The uniform fixture embeddings are near-equidistant — the
        known hard case where any m=4 code is uninformative; the
        distance-ratio test below covers that regime.)"""
        from grafeo_memory_spark.pipeline.ann import (
            pq_adc_topk,
            pq_encode,
            pq_train,
        )

        rows = []
        for cl in range(8):
            base = [float((cl * 7 + d * 3) % 13) for d in range(16)]
            for i in range(12):
                rows.append(
                    (cl * 100 + i,
                     [x + 0.05 * ((i * 31 + d) % 5) for d, x in
                      enumerate(base)])
                )
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        books = pq_train(df, m=4, k=16, iterations=3)
        encoded = pq_encode(df, books).localCheckpoint()
        qv = rows[0][1]  # a cluster-0 member
        approx = {
            r["id"] for r in pq_adc_topk(encoded, books, qv, k=10).collect()
        }
        assert approx <= {i for i in range(12)}  # all from cluster 0
        assert 0 in approx

    def test_adc_distance_ratio_vs_exact_l2(self, emb):
        """On the uniform fixture, assert quality as a distance ratio:
        the TRUE distance of ADC's top-10 must be within 1.5x of the
        exact top-10's mean — the standard ANN quality metric when
        neighbors are near-equidistant and set-recall is meaningless."""
        from grafeo_memory_spark.pipeline.ann import (
            pq_adc_topk,
            pq_encode,
            pq_train,
        )

        qv = _query_vec(emb, vid=0)
        books = pq_train(emb, m=4, k=16, iterations=3)
        encoded = pq_encode(emb, books).localCheckpoint()
        approx_ids = [
            r["id"] for r in pq_adc_topk(encoded, books, qv, k=10).collect()
        ]
        lit = F.array(*[F.lit(float(x)) for x in qv])
        d = emb.select(
            "vec_id",
            F.aggregate(
                F.zip_with(F.col("embedding"), lit,
                           lambda a, b: (a.cast("double") - b) ** 2),
                F.lit(0.0), lambda acc, x: acc + x,
            ).alias("d"),
        )
        true_d = {r["vec_id"]: r["d"] for r in d.collect()}
        exact10 = sorted(true_d.values())[:10]
        approx_mean = sum(true_d[i] for i in approx_ids) / len(approx_ids)
        assert 0 in approx_ids  # the query vector itself must be found
        assert approx_mean <= 1.5 * (sum(exact10) / 10.0)

    def test_lloyd_rounds_tighten_quantization(self, emb):
        from grafeo_memory_spark.pipeline.ann import pq_encode, pq_train

        def distortion(iters):
            books = pq_train(emb, m=4, k=16, iterations=iters)
            codes = {r["id"]: list(r["code"])
                     for r in pq_encode(emb, books).collect()}
            rows = emb.collect()
            w = len(books[0][0])
            tot = 0.0
            for r in rows:
                v = list(r["embedding"])
                for j, c in enumerate(codes[r["vec_id"]]):
                    cent = books[j][c + 128]  # undo the byte offset
                    tot += sum((v[j * w + t] - cent[t]) ** 2
                               for t in range(w))
            return tot

        assert distortion(3) <= distortion(0) + 1e-9
