"""Unit tests for the training-data pipeline ops: planted duplicates
through dedup/sketches, ANN recall sanity, text stats, and the
multimodal mapInPandas plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grafeo_memory_spark.pipeline.ann import (
    ann_lsh_join,
    hyperplane_signature,
    random_hyperplanes,
)
from grafeo_memory_spark.pipeline.dedup import (
    exact_dedup,
    jaccard_similarity_join,
    minhash_signature,
    near_dup_pairs_minhash,
    simhash16,
)
from grafeo_memory_spark.pipeline.multimodal import (
    ASSET_SCHEMA,
    decode_images,
    fake_image_decode,
    sample_frames,
)
from grafeo_memory_spark.pipeline.text_stats import (
    lang_id,
    quality_score,
    token_count_bpe_ish,
    token_count_ws,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # 2-word-window change
FAR = "completely unrelated text about spark dataframes and shuffles"


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, BASE),
            (2, BASE),                       # exact duplicate
            (3, "  THE  quick brown fox jumps over the lazy dog while the "
                "cat watches from the warm windowsill in the afternoon sun"),
            (4, NEAR),                       # near duplicate
            (5, FAR),
        ],
        "doc_id long, text string",
    )


def test_exact_dedup_keeps_min_id(docs):
    kept = sorted(r["doc_id"] for r in exact_dedup(docs, "text", "doc_id").collect())
    # 2 is an exact dup of 1; 3 normalizes (case/whitespace) to the same
    assert kept == [1, 4, 5]


def test_minhash_near_dup_pairs(docs):
    pairs = near_dup_pairs_minhash(
        docs, "text", "doc_id", num_perm=16, bands=8, jaccard_threshold=0.5
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # exact dups jaccard 1.0; near-dup 4 overlaps heavily with 1/2/3
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert (1, 4) in got
    assert not any(5 in p for p in got)
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert j[(1, 2)] == pytest.approx(1.0)
    assert 0.5 <= j[(1, 4)] < 1.0


def test_simhash_hamming_locality(docs):
    sh = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", simhash16("text").alias("sh")).collect()}
    assert sh[1] == sh[2] == sh[3]  # identical content → identical hash
    ham_near = bin(sh[1] ^ sh[4]).count("1")
    ham_far = bin(sh[1] ^ sh[5]).count("1")
    assert ham_near < ham_far  # near-dup closer in Hamming space


def test_simhash64_extends_simhash16(docs):
    from grafeo_memory_spark.pipeline.dedup import simhash64

    rows = {
        r["doc_id"]: (r["s16"], r["s64"])
        for r in docs.select(
            "doc_id",
            simhash16("text").alias("s16"),
            simhash64("text").alias("s64"),
        ).collect()
    }
    mask = (1 << 64) - 1
    for s16, s64 in rows.values():
        assert (s64 & mask) & 0xFFFF == s16  # lane 0 IS simhash16
        assert -(1 << 63) <= s64 < 1 << 63  # proper two's-complement int64
    # upper bit-lanes carry real (decorrelated) signal, not copies
    s16_1, s64_1 = rows[1]
    lanes = [((s64_1 & mask) >> (16 * k)) & 0xFFFF for k in range(4)]
    assert len(set(lanes)) > 1
    # locality still holds at 64 bits (unsigned XOR view)
    ham_near = bin((rows[1][1] ^ rows[4][1]) & mask).count("1")
    ham_far = bin((rows[1][1] ^ rows[5][1]) & mask).count("1")
    assert ham_near < ham_far


def test_jaccard_join_ranks_duplicates_first(docs):
    pairs = jaccard_similarity_join(docs, "text", "doc_id").collect()
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert j[(1, 2)] == pytest.approx(1.0)
    assert j[(1, 4)] > j.get((4, 5), 0.0)


def test_jaccard_df_cap_drops_hot_shingles(spark):
    # shingle 'a b c' occurs in all 4 docs; cap=2 removes it entirely
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(4)], "doc_id long, text string"
    )
    assert (
        jaccard_similarity_join(
            df, "text", "doc_id", min_intersection=1, df_cap=2
        ).count()
        == 0
    )
    assert (
        jaccard_similarity_join(df, "text", "doc_id", min_intersection=1).count()
        == 6
    )  # all pairs


def test_minhash_signature_shape(docs):
    sig = minhash_signature(docs, "text", "doc_id", num_perm=16).collect()
    assert all(len(r["sig"]) == 16 for r in sig)
    by_id = {r["id"]: r["sig"] for r in sig}
    assert by_id[1] == by_id[2]  # identical docs → identical signatures


def test_ann_lsh_same_bucket_for_same_vector(spark):
    planes = random_hyperplanes(8, 4, seed=1)
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.001, 0.0, 0.0]),
         (3, [-1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    sig = {r["vec_id"]: r["b"] for r in df.select(
        "vec_id", hyperplane_signature("embedding", planes).alias("b")).collect()}
    assert sig[1] == sig[2]          # near-identical vectors co-bucket
    assert sig[1] != sig[3]          # antipodal vector lands elsewhere
    probes = spark.createDataFrame(
        [(0, [1.0, 0.0005, 0.0, 0.0])], "probe_id long, qv array<double>"
    )
    out = ann_lsh_join(df, probes, planes, k=5).collect()
    assert {r["id"] for r in out} == {1, 2}
    assert out[0]["rank"] == 1


def test_text_stats_basics(spark):
    df = spark.createDataFrame(
        [(1, "the cat is on the mat"), (2, "el gato y la casa en un sol"),
         (3, "zzz qqq xxx")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in df.select(
        "doc_id", lang_id("text").alias("lang"),
        token_count_ws("text").alias("ws"),
        token_count_bpe_ish("text").alias("bpe"),
        quality_score("text").alias("q"),
    ).collect()}
    assert rows[1]["lang"] == "en"
    assert rows[2]["lang"] == "es"
    assert rows[3]["lang"] == "und"
    assert rows[1]["ws"] == 6
    assert rows[1]["bpe"] == 6
    assert 0.0 <= rows[3]["q"] < rows[1]["q"] <= 1.0
    # punctuation adds BPE-ish tokens but not whitespace tokens
    p = spark.createDataFrame([(1, "hello, world!")], "doc_id long, text string")
    r = p.select(token_count_ws("text").alias("ws"),
                 token_count_bpe_ish("text").alias("bpe")).collect()[0]
    assert r["ws"] == 2 and r["bpe"] == 4


def test_multimodal_decode_plumbing(spark):
    assets = spark.createDataFrame(
        [
            (1, "image", bytearray(b"imagebytes-1"), '{"fmt":"jpg"}'),
            (2, "image", bytearray(b"imagebytes-2"), None),
            (3, "video", bytearray(b"v" * 100), None),
            (4, "audio", bytearray(b"a" * 10), None),
        ],
        ASSET_SCHEMA,
    )
    feats = decode_images(assets, dims=8).collect()
    assert {r["asset_id"] for r in feats} == {1, 2}  # kind filter pushed
    assert all(len(r["features"]) == 8 for r in feats)
    # deterministic: same payload → same features
    w, h, f = fake_image_decode(b"imagebytes-1", 8)
    got = [r for r in feats if r["asset_id"] == 1][0]
    assert (got["width"], got["height"]) == (w, h)
    assert got["features"] == pytest.approx(f)

    frames = sample_frames(assets, every_nth=10, max_frames=4).collect()
    assert {r["asset_id"] for r in frames} == {3}
    assert [r["frame_index"] for r in frames] == [0, 1, 2, 3]
    assert all(len(r["frame_payload"]) > 0 for r in frames)


def test_multimodal_resize_and_audio(spark):
    from grafeo_memory_spark.pipeline.multimodal import (
        audio_features,
        fake_audio_features,
        fake_resize,
        resize_images,
    )

    assets = spark.createDataFrame(
        [
            (1, "image", bytearray(b"imagebytes-1"), None),
            (2, "audio", bytearray(b"a" * 160), None),
            (3, "video", bytearray(b"v" * 100), None),
        ],
        ASSET_SCHEMA,
    )
    resized = resize_images(assets, 16, 16).collect()
    assert [r["asset_id"] for r in resized] == [1]
    assert (resized[0]["width"], resized[0]["height"]) == (16, 16)
    assert bytes(resized[0]["payload"]) == fake_resize(b"imagebytes-1", 16, 16)
    # size scales with target area (the contract a real kernel keeps)
    assert len(fake_resize(b"xyz", 32, 32)) > len(fake_resize(b"xyz", 8, 8))

    au = audio_features(assets, dims=8).collect()
    assert [r["asset_id"] for r in au] == [2]
    dur, feats = fake_audio_features(b"a" * 160, 8)
    assert au[0]["duration_ms"] == dur == 10_000
    assert au[0]["features"] == pytest.approx(feats)


def test_ivf_assign_and_probe_recall(spark):
    from grafeo_memory_spark.pipeline.ann import (
        ivf_assign,
        ivf_centroids,
        ivf_topk,
    )

    # three well-separated clusters on coordinate axes; ids 0/1/2 (the
    # deterministic codebook seeds) are one exemplar per cluster
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (2, [0.0, 0.0, 1.0, 0.0]),
    ]
    for i in range(1, 10):
        rows.append((10 + i, [1.0, 0.01 * i, 0.0, 0.0]))     # cluster x
        rows.append((100 + i, [0.0, 1.0, 0.01 * i, 0.0]))    # cluster y
        rows.append((200 + i, [0.0, 0.0, 1.0, 0.01 * i]))    # cluster z
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = ivf_centroids(emb, 3)
    assert [c[0] for c in cents] == [0, 1, 2]
    assigned = ivf_assign(emb, cents)
    # every row lands in exactly one inverted list, clusters intact
    assert assigned.count() == 30
    by_c = {r["id"]: r["centroid_id"] for r in assigned.collect()}
    assert {by_c[10 + i] for i in range(1, 10)} == {by_c[0]}
    assert {by_c[100 + i] for i in range(1, 10)} == {by_c[1]}
    assert {by_c[200 + i] for i in range(1, 10)} == {by_c[2]}

    got = ivf_topk(assigned, cents, [0.0, 1.0, 0.0, 0.0], k=5, nprobe=1)
    ids = [r["id"] for r in got.collect()]
    assert len(ids) == 5
    assert all(i == 1 or 100 <= i < 200 for i in ids)  # only y-list probed
    assert ids[0] == 1  # exact match (the y seed itself) first


def test_spread_fans_out_and_is_noop_when_wide(spark):
    """spread() raises the partition count of a narrow scan to the
    core count for CPU-bound per-row work, and leaves already-wide
    inputs untouched (no added shuffle on the at-scale path)."""
    from grafeo_memory_spark.sources.tables import spread

    narrow = spark.range(100).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    out = spread(narrow, min_partitions=8)
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 100

    wide = spark.range(100).repartition(16)
    assert spread(wide, min_partitions=8) is wide


def test_dedup_clusters_transitive(spark):
    # pairs (1,2),(2,3) and (7,9): clusters must close transitively and
    # label each member with the min reachable id
    from grafeo_memory_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    got = {r["id"]: r["cluster"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_connected_components_paths_agree(spark):
    # the size-gated driver union-find and the distributed min-label
    # loop must produce the identical (node, component) fixpoint — a
    # 40-node chain plus a clique plus singleton pairs exercises long
    # diameters (pointer-jumping path) and dense merges (union-find)
    from grafeo_memory_spark.communities import connected_components

    edges = (
        [(i, i + 1) for i in range(40)]
        + [(100 + a, 100 + b) for a in range(5) for b in range(a + 1, 5)]
        + [(200, 201), (300, 301)]
    )
    sym = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "node_id long, nbr long"
    )
    fast = {(r[0], r[1]) for r in connected_components(sym).collect()}
    slow = {
        (r[0], r[1])
        for r in connected_components(sym, driver_edge_threshold=0).collect()
    }
    assert fast == slow
    comp = dict(fast)
    assert comp[40] == 0 and comp[104] == 100 and comp[301] == 300

    # A wide pair frame (extra payload columns) must work unchanged —
    # the gate prunes to (node_id, nbr) before the driver collect
    # (ADVICE r10), so extra columns neither ship nor perturb results.
    wide = sym.withColumn("payload", F.lit("x" * 64))
    assert {
        (r[0], r[1]) for r in connected_components(wide).collect()
    } == fast


def test_near_dedup_end_to_end(docs):
    # 1/2/3/4 form one fuzzy cluster (exact dups + near dup), 5 stands
    # alone: survivors = min-id of the cluster + the singleton
    from grafeo_memory_spark.pipeline.dedup import near_dedup

    kept = sorted(
        r["doc_id"]
        for r in near_dedup(
            docs, "text", "doc_id", num_perm=16, bands=8,
            jaccard_threshold=0.5,
        ).collect()
    )
    assert kept == [1, 5]


def test_near_dedup_keeps_all_when_no_dups(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta"),
         (3, "iota kappa lambda mu")],
        "doc_id long, text string",
    )
    from grafeo_memory_spark.pipeline.dedup import near_dedup

    kept = sorted(r["doc_id"] for r in near_dedup(df, "text", "doc_id").collect())
    assert kept == [1, 2, 3]


def test_semdedup_keeps_one_farthest_per_group(spark):
    # one cluster (centroid c0 = [1,0,0,0]): ids 1,2,3 are mutual
    # near-dups (cos >= 0.9); the survivor must be the member FARTHEST
    # from the centroid (id 3), not the lowest id. id 9 sits alone near
    # the second centroid and survives untouched.
    from grafeo_memory_spark.pipeline.dedup import semdedup

    rows = [
        (1, [1.0, 0.02, 0.0, 0.0], "a"),
        (2, [1.0, 0.03, 0.0, 0.0], "b"),
        (3, [0.9, 0.3, 0.0, 0.0], "c"),   # same group, lowest c_sim
        (9, [0.0, 0.0, 1.0, 0.0], "d"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, tag string"
    )
    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])]
    out = semdedup(df, cents, eps=0.9)
    assert out.columns == df.columns  # schema preserved
    assert sorted(r["vec_id"] for r in out.collect()) == [3, 9]


def test_semdedup_no_pairs_is_identity(spark):
    from grafeo_memory_spark.pipeline.dedup import semdedup

    rows = [(1, [1.0, 0.0], "x"), (2, [0.0, 1.0], "y")]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, tag string")
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    kept = sorted(r["vec_id"] for r in semdedup(df, cents, eps=0.99).collect())
    assert kept == [1, 2]


def test_hard_negatives_excludes_same_label_and_ranks(spark):
    from grafeo_memory_spark.pipeline.ann import hard_negatives

    rows = [
        (0, [1.0, 0.0], 0),   # anchor
        (1, [0.99, 0.1], 0),  # same label: excluded however similar
        (2, [0.9, 0.2], 1),   # nearest different-label
        (3, [0.5, 0.5], 1),
        (4, [0.0, 1.0], 2),   # farthest
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = hard_negatives(
        df, df.where("vec_id = 0"), k=2
    ).orderBy("rank").collect()
    assert [r["id"] for r in out] == [2, 3]
    assert [r["rank"] for r in out] == [1, 2]
    assert all(r["probe_id"] == 0 for r in out)


class TestSimhashNearDup:
    """Banded Hamming join over simhash64 (VERDICT r5 stretch 9):
    randomized parity vs the brute-force all-pairs definition (the
    pigeonhole banding is complete for hamming <= max_hamming, so the
    sets must be identical), plus the bucket guard and plan shape."""

    def _brute(self, spark, df, max_hamming):
        from grafeo_memory_spark.pipeline.dedup import simhash64

        fps = {
            r["doc_id"]: r["fp"] & (2**64 - 1)
            for r in df.select(
                "doc_id", simhash64("text").alias("fp")
            ).collect()
        }
        ids = sorted(fps)
        return sorted(
            (a, b, bin(fps[a] ^ fps[b]).count("1"))
            for i, a in enumerate(ids)
            for b in ids[i + 1:]
            if bin(fps[a] ^ fps[b]).count("1") <= max_hamming
        )

    @pytest.mark.parametrize("max_hamming", [0, 3, 7])
    def test_parity_vs_brute_force(self, spark, max_hamming):
        import random

        from grafeo_memory_spark.pipeline.dedup import simhash_near_dup

        rng = random.Random(11)
        vocab = [f"w{i}" for i in range(40)]
        rows = []
        base_words = [rng.choice(vocab) for _ in range(30)]
        for i in range(40):
            words = list(base_words)
            # mutate 0..6 positions: a spread of hamming distances
            for _ in range(rng.randrange(0, 7)):
                words[rng.randrange(len(words))] = rng.choice(vocab)
            rows.append((i, " ".join(words)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            tuple(r)
            for r in simhash_near_dup(
                df, "text", "doc_id", max_hamming=max_hamming,
                max_bucket_size=10_000,
            ).collect()
        )
        assert got == self._brute(spark, df, max_hamming)

    def test_exact_dup_is_hamming_zero(self, spark, docs):
        from grafeo_memory_spark.pipeline.dedup import simhash_near_dup

        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_near_dup(
                docs, "text", "doc_id", max_hamming=6
            ).collect()
        }
        assert pairs.get((1, 2)) == 0          # exact duplicate
        assert pairs.get((1, 3)) == 0          # normalization twin
        assert all(
            5 not in p for p in pairs
        ), f"FAR doc paired: {pairs}"

    def test_bucket_guard_drops_hot_bands(self, spark):
        from grafeo_memory_spark.pipeline.dedup import simhash_near_dup

        df = spark.createDataFrame(
            [(i, "identical text everywhere") for i in range(20)],
            "doc_id long, text string",
        )
        # every doc shares every band: guard at 10 drops all buckets
        out = simhash_near_dup(
            df, "text", "doc_id", max_hamming=3, max_bucket_size=10
        )
        assert out.count() == 0

    def test_invalid_max_hamming(self, spark, docs):
        from grafeo_memory_spark.pipeline.dedup import simhash_near_dup

        with pytest.raises(ValueError):
            simhash_near_dup(docs, "text", "doc_id", max_hamming=64)

    def test_no_cartesian_in_plan(self, spark, docs):
        from grafeo_memory_spark.pipeline.dedup import simhash_near_dup

        plan = (
            simhash_near_dup(docs, "text", "doc_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


def test_minhash_maponly_matches_explode_groupby(spark):
    """r12 optimization parity: the map-only min-fold signature
    (`minhash_sig_col`) must reproduce the historical explode+groupBy
    formulation bit-for-bit — same minima, same dropped blank docs."""
    import random

    from grafeo_memory_spark.pipeline.dedup import (
        shingle_hash,
        word_shingles,
    )

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "x1", "xy", "Zed", "q-q"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12)))
        for _ in range(60)
    ] + ["", "   ", "\t\n", "one", "two words"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    new = {
        r["id"]: tuple(r["sig"])
        for r in minhash_signature(df, "text", "id", num_perm=8, n=3).collect()
    }
    # the pre-r12 shape, replayed verbatim
    sh = df.select(
        F.col("id"), F.explode(word_shingles("text", 3)).alias("shingle")
    )
    old_rows = (
        sh.groupBy("id")
        .agg(
            *[
                F.min(shingle_hash(F.col("shingle"), k)).alias(f"m{k}")
                for k in range(8)
            ]
        )
        .collect()
    )
    old = {r["id"]: tuple(r[f"m{k}"] for k in range(8)) for r in old_rows}
    assert new == old
    # blank docs appear in neither
    blank_ids = {i for i, t in enumerate(texts) if not t.strip()}
    assert blank_ids.isdisjoint(new.keys())
