"""Deduplication operators for LLM training corpora: exact,
MinHash-LSH, SimHash, and n-gram Jaccard similarity join.

Every hash is *engine-portable by construction* — md5 of the shingle
(optionally salted with a permutation seed), first 15 hex chars parsed
as a 60-bit int — so the DuckDB oracle computes bit-identical
signatures and the correctness gate covers the whole sketch path, not
just row counts.

Scale design:
- exact dedup: one shuffle on the 128-bit content hash; keep-min-id via
  aggregate + semi-join (no window).
- MinHash: one explode over distinct shingles, ``num_perm`` min()
  aggregates in a single groupBy — map-side partial aggregation does
  most of the work; signatures are ~128 bytes/doc.
- LSH banding: candidates only ever join on (band, band_hash) buckets —
  the all-pairs cross join never exists. Bucket skew (boilerplate text)
  is bounded by ``max_bucket_size``.
- Jaccard join: classic shingle-inverted-index join with a
  document-frequency cap on hot shingles — the standard skew guard:
  a shingle in >df_cap docs contributes O(df_cap²) pairs, so hot
  shingles are dropped *before* the pair explosion.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "content_hash",
    "exact_dedup",
    "exact_dedup_ids",
    "word_shingles",
    "shingle_hash",
    "minhash_sig_col",
    "minhash_signature",
    "lsh_bands",
    "near_dup_pairs_minhash",
    "simhash16",
    "simhash64",
    "simhash_bands",
    "simhash_near_dup",
    "jaccard_similarity_join",
    "dedup_clusters",
    "near_dedup",
    "near_dedup_simhash",
    "dedup_spans_global",
]


def normalize_text(col: Column | str) -> Column:
    """Canonical form for content hashing: lowercase, collapse
    whitespace runs, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def content_hash(col: Column | str) -> Column:
    return F.md5(normalize_text(col))


def exact_dedup_ids(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Survivor ids of exact dedup (smallest id per content group), as
    a single-column frame. ONE pass over the text (normalize + md5,
    projected to two columns so the parquet scan prunes) and one
    map-side-combined shuffle of (hash, id) pairs — at corpus scale
    this is the whole cost of exact dedup; callers that only need the
    ids (e.g. a `kept` membership flag) should use this directly and
    skip the semi-join entirely."""
    return (
        df.select(content_hash(text_col).alias("_h"), F.col(id_col))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup keeping the smallest id per content group.

    Shape (reworked r9): hash+min once via :func:`exact_dedup_ids`,
    then ONE semi-join on the id key. The former formulation joined the
    full hashed frame against the per-hash min on the md5 key — which
    recomputed normalize+md5 over the corpus a second time on the probe
    side and shuffled every text payload keyed by a 32-char hash. Now
    the text is scanned once, the build side is bare ids (AQE
    broadcasts it when small), and the probe shuffle key is the id."""
    return df.join(
        exact_dedup_ids(df, text_col, id_col), id_col, "left_semi"
    )


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text (array<string>).
    Documents shorter than n words yield their full text as the single
    shingle, so every non-blank doc has ≥1; empty/whitespace-only docs
    yield none (they carry no shingle signal and drop out of the
    sketch joins — compare them via content_hash instead)."""
    c = normalize_text(col)
    toks = F.split(c, " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(F.filter(grams, lambda g: g != ""))


def shingle_hash(shingle: Column, seed: int) -> Column:
    """Portable 60-bit hash: md5(shingle + '#' + seed) → first 15 hex
    chars → bigint. Identical in DuckDB:
    ``('0x' || substr(md5(s || '#k'), 1, 15))::BIGINT``."""
    return F.conv(
        F.substring(F.md5(F.concat(shingle, F.lit(f"#{seed}"))), 1, 15), 16, 10
    ).cast("long")


def minhash_sig_col(
    text_col: Column | str, num_perm: int = 16, n: int = 3
) -> Column:
    """MinHash signature as a single map-side Column expression: one
    ``aggregate`` fold over the shingle array keeps the element-wise
    running min of all ``num_perm`` salted hashes (``least`` skips the
    NULL init, so the first shingle seeds each lane). The shingle array
    appears exactly once in the expression tree, so normalization +
    shingling run once per row regardless of CollapseProject — the same
    single-evaluation discipline as ``simhash64``.

    Yields an all-NULL signature for docs with no shingles
    (blank/whitespace-only text); batch callers filter those rows out
    (see :func:`minhash_signature`) to preserve the historical
    explode+groupBy semantics where such docs produced no row."""

    def hashes(s: Column) -> Column:
        return F.array(*[shingle_hash(s, k) for k in range(num_perm)])

    return F.aggregate(
        word_shingles(text_col, n),
        F.array_repeat(F.lit(None).cast("long"), num_perm),
        lambda acc, s: F.zip_with(acc, hashes(s), lambda a, h: F.least(a, h)),
    )


def minhash_signature(
    df: DataFrame, text_col: str, id_col: str, num_perm: int = 16, n: int = 3
) -> DataFrame:
    """MinHash signature per document: min over shingle hashes for each
    of ``num_perm`` salted hash functions → (id, sig: array<long>).

    MAP-ONLY (r12): the min-fold runs inside the row's codegen stage
    (:func:`minhash_sig_col`) — no explode, no groupBy, no shuffle. The
    former explode + ``num_perm`` partial-aggregating ``min()``s shape
    hashed exactly as many shingles but paid a full (id, shingle-row)
    exchange to reassemble per-doc minima that a per-row fold computes
    for free; at corpus scale the signature pass is now embarrassingly
    parallel. Docs with no shingles are filtered (cheap normalize-only
    predicate — blank text ⟺ zero shingles by ``word_shingles``'s
    contract), matching the explode formulation's no-row behavior
    bit-for-bit.
    """
    return df.where(normalize_text(text_col) != "").select(
        F.col(id_col).alias("id"),
        minhash_sig_col(text_col, num_perm, n).alias("sig"),
    )


def lsh_bands(sig_df: DataFrame, bands: int, rows: int) -> DataFrame:
    """Split signatures into ``bands`` bands of ``rows`` values; band
    key = md5 of the joined values → (id, band, band_hash)."""
    parts = []
    for b in range(bands):
        band_vals = F.slice(F.col("sig"), b * rows + 1, rows)
        parts.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", F.transform(band_vals, lambda v: v.cast("string")))).alias(
                    "band_hash"
                ),
            )
        )
    return sig_df.select(
        "id", F.explode(F.array(*parts)).alias("bh")
    ).select("id", F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))


def near_dup_pairs_minhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs: band buckets → candidate pairs
    (id_a < id_b) → exact Jaccard verification over shingle sets →
    pairs with jaccard ≥ threshold.

    Buckets larger than ``max_bucket_size`` are dropped before the
    pair join (boilerplate guard — a 10⁶-doc bucket would emit 10¹²
    pairs). Output: (id_a, id_b, jaccard).
    """
    rows = num_perm // bands
    sig = minhash_signature(df, text_col, id_col, num_perm, n)
    bandsdf = lsh_bands(sig, bands, rows)
    sizes = bandsdf.groupBy("band", "band_hash").agg(F.count("*").alias("_bs"))
    bounded = bandsdf.join(
        sizes.where(F.col("_bs") <= max_bucket_size), ["band", "band_hash"]
    )
    a = bounded.select("band", "band_hash", F.col("id").alias("id_a"))
    b = bounded.select("band", "band_hash", F.col("id").alias("id_b"))
    # materialize the candidate set once: it feeds the member-id
    # restriction below AND the verify joins, and re-deriving the band
    # self-join twice would double the banding work
    cand = (
        a.join(b, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    ).localCheckpoint(eager=True)
    # shingle ONLY candidate members (r9): near-dup candidates are a
    # small fraction of the corpus by construction (banding already
    # pruned everything else), so semi-joining df down to member ids
    # BEFORE the word_shingles projection means the normalize+md5
    # shingle pass and the verify-side shuffle touch candidate docs
    # only — at corpus scale the verify stage goes from a second full
    # text scan to a lookup of the candidate slice
    members = (
        cand.select(F.col("id_a").alias("id"))
        .unionByName(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = (
        df.select(F.col(id_col).alias("id"), F.col(text_col))
        .join(members, "id", "left_semi")
        .select("id", word_shingles(text_col, n).alias("sh"))
    )
    verified = (
        cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )
    return verified.where(F.col("jaccard") >= jaccard_threshold)


def _simhash_lane(col: Column | str, n: int, seed: int) -> Column:
    """One 16-bit SimHash lane over word ``n``-grams with the given
    hash seed — each token votes ±1 per bit of its portable hash; the
    sign vector packs into an int.

    Single-pass formulation: gram hashes are materialized once
    (md5 per gram exactly once), then one ``aggregate`` folds all 16
    bit-votes with an array accumulator — 16× less hashing than the
    naive per-bit version (measured 109 s → ~2 s on 5k docs at sf0.1).
    """
    hashes = F.transform(word_shingles(col, n), lambda g: shingle_hash(g, seed))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 16),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(h.bitwiseAND(F.lit(1 << b)) > 0, 1).otherwise(-1)
                    for b in range(16)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    # pack sign bits; `votes` appears exactly once in the expression
    # tree, so the fold above runs once per row regardless of CSE
    weights = F.array(*[F.lit(1 << b) for b in range(16)])
    return F.aggregate(
        F.zip_with(
            votes, weights, lambda v, w: F.when(v > 0, w).otherwise(F.lit(0))
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def simhash16(col: Column | str, n: int = 1) -> Column:
    """16-bit SimHash (lane 0 of :func:`simhash64`) — compact enough
    for a byte-identical oracle; kept as the continuity query."""
    return _simhash_lane(col, n, 0)


def simhash64(col: Column | str, n: int = 1) -> Column:
    """64-bit SimHash in ONE md5 per gram and ONE fold per row: the
    seed-0 md5 digest carries 128 portable bits, so vote bits 0..59
    read the first 15 hex chars (exactly ``shingle_hash(g, 0)`` — bits
    0..15 therefore coincide with :func:`simhash16`) and bits 60..63
    read the next 15 hex chars. Same hashing cost as the 16-bit sketch
    (an earlier 4-seeded-lane formulation cost 4 md5s/gram — measured
    ~3.5× slower at sf0.1) and every bit stays replayable in the
    md5-portable oracle.

    The value is the standard two's-complement int64 (negative when
    vote bit 63 is set — a plain ``1 << 63`` weight overflows under
    ANSI mode in Spark AND DuckDB). Compare/XOR against
    ``& (2**64 - 1)`` for the unsigned view."""
    def two_hashes(g: Column) -> Column:
        m = F.md5(F.concat(g, F.lit("#0")))
        return F.struct(
            F.conv(F.substring(m, 1, 15), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(m, 16, 15), 16, 10).cast("long").alias("h2"),
        )

    hs = F.transform(word_shingles(col, n), two_hashes)

    def bit_votes(h: Column) -> Column:
        return F.array(
            *[
                F.when(
                    (h["h1"] if b < 60 else h["h2"]).bitwiseAND(
                        F.lit(1 << (b if b < 60 else b - 60))
                    )
                    > 0,
                    1,
                ).otherwise(-1)
                for b in range(64)
            ]
        )

    votes = F.aggregate(
        hs,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, v: a + v),
    )
    weights = F.array(
        *[F.lit(1 << b).cast("long") for b in range(63)],
        F.lit(-(1 << 63)).cast("long"),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            weights,
            lambda v, w: F.when(v > 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_bands(fp_df: DataFrame, max_hamming: int) -> DataFrame:
    """Pigeonhole banding of 64-bit SimHash fingerprints: cut the 64
    bits into ``max_hamming + 1`` bands, one output row per (id, band)
    with the band's bit-slice as ``val`` — any two fingerprints within
    Hamming distance ``max_hamming`` agree exactly on at least one
    band. Input ``(id, fp)``; output ``(id, fp, band, val)``. Shared by
    the batch Hamming join (:func:`simhash_near_dup`) and the streaming
    SimHash dedup tier (`streaming/dedup.SimHashDedupSink`)."""
    if not 0 <= max_hamming < 64:
        raise ValueError("max_hamming must be in [0, 64)")
    bands = max_hamming + 1
    width, extra = divmod(64, bands)
    # band b covers `width` bits (+1 for the first `extra` bands);
    # shiftrightunsigned keeps the sign bit from smearing into the top
    # band's value
    band_cols = []
    offset = 0
    for b in range(bands):
        w = width + (1 if b < extra else 0)
        # mask as a SIGNED 64-bit literal (w=64 → -1): a plain
        # (1<<64)-1 overflows the JVM long on the way into F.lit
        mask = (1 << w) - 1
        if mask >= 1 << 63:
            mask -= 1 << 64
        val = F.shiftrightunsigned(F.col("fp"), offset).bitwiseAND(
            F.lit(mask)
        )
        band_cols.append(F.struct(F.lit(b).alias("band"), val.alias("val")))
        offset += w
    return fp_df.select(
        "id", "fp", F.explode(F.array(*band_cols)).alias("bv")
    ).select(
        "id", "fp", F.col("bv.band").alias("band"), F.col("bv.val").alias("val")
    )


def simhash_near_dup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_hamming: int = 3,
    n: int = 1,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """SimHash near-duplicate pairs — the banded Hamming-distance join
    that consumes :func:`simhash64` fingerprints (the Manku-Jain-Sarma
    WWW'07 web-dedup construction, re-expressed as DataFrame ops): cut
    the 64 bits into ``max_hamming + 1`` bands; by pigeonhole, any two
    fingerprints within Hamming distance ``max_hamming`` agree exactly
    on at least one band, so candidates come from a band-value
    equi-join and are verified with one ``bit_count(xor)``. Output:
    ``(id_a, id_b, hamming)`` with ``id_a < id_b``, hamming ≤
    ``max_hamming``.

    Scale shape — mirrors ``near_dup_pairs_minhash``: ONE fingerprint
    scan (the (id, fp) table — two longs per doc — is checkpointed
    because it feeds the bucket-size guard and BOTH self-join sides;
    without it the 64-bit-vote expression re-executes three times,
    measured 3× the row's wall-clock at sf0.1), a ×bands explode, one
    shuffle on (band, band value), and the ``max_bucket_size`` guard
    drops boilerplate buckets before the self-join (a 10⁶-doc bucket
    would emit 10¹² pairs) — never all-pairs. The fingerprints ride
    the band rows, so verification is a codegen xor, not a join back
    to the corpus. In a production pipeline the fingerprint table is
    the thing you persist anyway (same pattern as semdedup's
    assignment table).
    """
    if not 0 <= max_hamming < 64:
        raise ValueError("max_hamming must be in [0, 64)")
    fp = df.select(
        F.col(id_col).alias("id"), simhash64(text_col, n).alias("fp")
    ).localCheckpoint(eager=False)
    banded = simhash_bands(fp, max_hamming)
    sizes = banded.groupBy("band", "val").agg(F.count("*").alias("_bs"))
    bounded = banded.join(
        sizes.where(F.col("_bs") <= max_bucket_size), ["band", "val"]
    )
    # Materialize the guarded band table once (r13): `bounded` feeds
    # BOTH self-join sides, so without this checkpoint each side
    # re-derives it — the bucket-size aggregation (an Exchange over
    # n×bands rows) and the guard join execute TWICE per run, visible
    # as two identical HashAggregate+Exchange subtrees in the r12 plan.
    # Rows are fixed-width (band, val, id, fp — four longs), the same
    # bounded-footprint argument as the fp checkpoint above; eager so
    # concurrent consumer stages can't race to compute the same
    # partition (the diamond-feed pattern of semdedup's assignment
    # checkpoint). SPARK_GRAFT_NEARDUP_NO_CKPT=1 restores the
    # re-derive shape for A/B or forensics.
    if os.environ.get("SPARK_GRAFT_NEARDUP_NO_CKPT") != "1":
        bounded = bounded.localCheckpoint(eager=True)
    a = bounded.select(
        "band", "val", F.col("id").alias("id_a"), F.col("fp").alias("fp_a")
    )
    b = bounded.select(
        "band", "val", F.col("id").alias("id_b"), F.col("fp").alias("fp_b")
    )
    return (
        a.join(b, ["band", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("fp_a").bitwiseXOR(F.col("fp_b"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def jaccard_similarity_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    min_intersection: int = 2,
    df_cap: int | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity join via the shingle inverted index:
    explode shingles → self-join on shingle → count intersections per
    pair → jaccard from set sizes. Output (id_a, id_b, jaccard).

    ``df_cap`` drops shingles occurring in more than that many docs
    *before* pairing — the skew guard that makes this viable at scale
    (hot boilerplate shingles generate quadratic pairs and add almost
    no signal).

    The inverted index ``sh`` feeds BOTH self-join sides and the size
    aggregate (a diamond plan); it is materialized once via
    ``localCheckpoint`` so the shingle/md5 scan runs once, not 3-6× —
    at deployment scale this is the "build the index, then join it"
    structure you'd persist to a table anyway.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    )
    if df_cap is not None:
        # anti-join against the HOT set (shingles in > df_cap docs) —
        # small by construction, so it broadcasts; the keep-set is
        # nearly all shingles and must never be the broadcast side
        sh = sh.localCheckpoint()
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))  # shingles are distinct/doc
            .where(F.col("_df") > df_cap)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sh = sh.localCheckpoint()
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        sh.withColumnRenamed("id", "id_a")
        .join(sh.withColumnRenamed("id", "id_b"), "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
        .where(F.col("inter") >= min_intersection)
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
    )


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Fuzzy-dedup clustering: candidate/verified near-dup *pairs* →
    transitive duplicate *clusters* via distributed connected
    components (min-label propagation, ``communities.connected_components``).

    Output: one row per document that appears in any pair —
    (id, cluster), where ``cluster`` is the smallest doc id reachable
    through the pair graph; the cluster id therefore IS the canonical
    survivor of the cluster.

    Scale shape: each propagation round is one join + one min-agg;
    rounds needed = duplicate-graph diameter (tiny in practice — dup
    clusters are dense), never |docs|.
    """
    from grafeo_memory_spark.communities import connected_components

    sym = pairs.select(
        F.col(id_a).alias("node_id"), F.col(id_b).alias("nbr")
    ).union(pairs.select(F.col(id_b).alias("node_id"), F.col(id_a).alias("nbr")))
    return connected_components(sym).select(
        F.col("node_id").alias("id"), F.col("component").alias("cluster")
    )


def near_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """End-to-end batch fuzzy dedup (the standard LLM-corpus recipe:
    MinHash → LSH bands → verified pairs → connected components → keep
    one canonical doc per cluster). Returns the surviving rows of
    ``df``: every doc not in any near-dup cluster, plus the smallest-id
    doc of each cluster.

    Composition of :func:`near_dup_pairs_minhash` (bucketed, never
    all-pairs) and :func:`dedup_clusters`; the final keep is a
    broadcast-size anti-join against the non-survivor ids only, so the
    corpus itself is never shuffled.
    """
    pairs = near_dup_pairs_minhash(
        df, text_col, id_col,
        num_perm=num_perm, bands=bands, n=n,
        jaccard_threshold=jaccard_threshold,
        max_bucket_size=max_bucket_size,
    )
    clusters = dedup_clusters(pairs)
    losers = clusters.where(F.col("id") != F.col("cluster")).select("id")
    return df.join(
        losers.withColumnRenamed("id", id_col), id_col, "left_anti"
    )


def near_dedup_simhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_hamming: int = 3,
    n: int = 1,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Batch fuzzy dedup on the SimHash axis — the alternative near-dup
    tier to :func:`near_dedup` (MinHash/Jaccard measures shingle-set
    overlap; SimHash Hamming distance measures weighted-token profile
    drift, cheaper per doc: one 64-bit fingerprint vs a num_perm
    signature). Pairs from :func:`simhash_near_dup` (pigeonhole band
    equi-join, never all-pairs) → connected components → keep the
    smallest-id doc per cluster; same survivorship contract and the
    same broadcast-size anti-join keep as the MinHash path.
    """
    pairs = simhash_near_dup(
        df, text_col, id_col,
        max_hamming=max_hamming, n=n, max_bucket_size=max_bucket_size,
    )
    clusters = dedup_clusters(pairs)
    losers = clusters.where(F.col("id") != F.col("cluster")).select("id")
    return df.join(
        losers.withColumnRenamed("id", id_col), id_col, "left_anti"
    )


def dedup_spans_global(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    span: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """C4-style global span dedup (Raffel et al. 2020 §2.2): any run of
    ``span`` consecutive non-blank lines occurring more than once in
    the WHOLE corpus survives only at its first occurrence (smallest
    (id, position)); every later occurrence has those lines removed and
    the document is reassembled from the lines that remain.

    Line normalization: blank/whitespace-only lines are dropped before
    span formation and do not reappear in the output (the op rewrites
    ``text_col`` as the surviving lines joined by ``sep``). Documents
    with fewer than ``span`` non-blank lines form no spans and pass
    through with only that blank-line normalization. A line shared by
    both a duplicated span and a unique one is removed — matching the
    published C4 behavior of discarding the whole later occurrence.

    Schema: the input schema is preserved — every passthrough column
    survives and only ``text_col`` is rewritten (consistent with
    ``exact_dedup``/``near_dedup``/``decontaminate``). ``sep`` is
    treated as a *literal* separator (regex-escaped before the split,
    so ``sep='.'`` or ``'|'`` split where you'd expect).

    Scale shape: lines and span hashes are array-built per row
    (map-side); the shuffles are the span-hash groupBy electing the
    global first occurrence, the removed-span join + distinct, and the
    removed-positions per-doc rollup — all keyed by fixed-width span
    rows, nothing all-pairs and nothing per corpus line (r13: the
    reassembly is a map-side array filter over the final document
    scan, not a posexplode + groupBy of every line). Boilerplate-heavy
    corpora pile rows onto hot span hashes, but min(struct)
    partial-aggregates map-side, so skew costs one hot reducer, not a
    pair blowup.
    """
    import re as _re

    lines = F.filter(
        F.split(F.col(text_col), _re.escape(sep)), lambda x: F.trim(x) != ""
    )
    base = df.select(F.col(id_col).alias("id"), lines.alias("lines"))
    span_hashes = F.when(
        F.size("lines") >= span,
        F.transform(
            F.sequence(F.lit(0), F.size("lines") - span),
            lambda i: F.xxhash64(
                F.concat_ws(sep, F.slice(F.col("lines"), i + 1, span))
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    # fixed-width (id, pos, h) rows, materialized once (r12): the spans
    # frame feeds BOTH the keeper election and the removal join, and
    # without the checkpoint each consumer re-ran the text scan + line
    # split + window hashing (4 corpus text passes before r12, 2 now:
    # this materialization plus the final df scan). The materialization
    # is 3 longs per span — O(line count), never O(corpus bytes), same
    # bounded-width rationale as the gopher kernel checkpoint.
    spans = base.select(
        "id", F.posexplode(span_hashes).alias("pos", "h")
    ).localCheckpoint(eager=False)
    keeper = spans.groupBy("h").agg(
        F.min(F.struct("id", "pos")).alias("k")
    )
    removed = (
        spans.join(keeper, "h")
        .where(
            ~(
                (F.col("id") == F.col("k.id"))
                & (F.col("pos") == F.col("k.pos"))
            )
        )
        .select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + span - 1)
            ).alias("pos"),
        )
        .distinct()
    )
    # Reassembly is map-side over the final df scan (r13): fold the
    # removed (id, pos) rows to one array per AFFECTED doc — rows and
    # width both bounded by the duplicated-span volume, not the corpus
    # — left-join it onto df, and rebuild each document by filtering
    # its own lines array on position. Equivalence with the old
    # posexplode → anti-join → collect_list groupBy: both produce the
    # surviving lines of the SAME normalized lines array (blanks
    # dropped) in ascending position order — here via an
    # order-preserving array filter, there via array_sort on (pos,
    # unit) structs — and docs with no removed lines rebuild to
    # concat_ws(sep, lines) on both paths (the anti-join kept every
    # unit; the filter drops none). This removes the per-LINE corpus
    # passes outright (guide §2.4): the units posexplode (text pass 3
    # of 3), its (id, pos)-keyed anti-join shuffle, and the per-line
    # rebuild groupBy are gone; what remains keyed by doc id is only
    # the removed-positions rollup and the final 1:1 join.
    removed_pos = removed.groupBy("id").agg(
        F.collect_list("pos").alias("_rm")
    )
    out = (
        df.join(removed_pos.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn(
            text_col,
            F.concat_ws(
                sep,
                F.filter(
                    lines,
                    lambda x, i: F.when(
                        F.col("_rm").isNull(), F.lit(True)
                    ).otherwise(~F.array_contains(F.col("_rm"), i)),
                ),
            ),
        )
        .drop("_rm")
    )
    return out.select(*df.columns)


def semdedup(
    table: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    eps: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication through embedding clusters — cluster every vector
    with a coarse codebook, find within-cluster pairs with cosine
    ≥ ``eps``, connect them into duplicate groups, and keep ONE
    representative per group: the member *farthest from its centroid*
    (lowest centroid-cosine — the paper's choice, which preserves the
    most atypical example; ties break on lowest id). Returns the
    surviving rows of ``table`` with its schema intact.

    Scale shape (the reason SemDeDup beats all-pairs at 100 TB): the
    codebook is broadcast and assignment is one map-only scan
    (`pipeline/ann.ivf_assign`); candidate pairs are generated only
    *within* a cluster, so fan-out is Σ|cluster|², bounded by choosing
    n_centroids ∝ corpus size (the paper uses ~100k clusters for
    LAION); groups come from min-label connected components (rounds =
    dup-graph diameter); the final keep is a broadcast anti-join of
    loser ids only — the corpus itself is never shuffled.
    """
    from grafeo_memory_spark.functions.vector import dot, l2_norm
    from grafeo_memory_spark.pipeline.ann import ivf_assign

    # One map-only scan produces assignment AND centroid-cosine: the
    # winning struct of ivf_assign's argmax already carries the sim, so
    # no centroid re-lookup (join or map literal) is needed at all.
    # Materialize it once: it feeds BOTH sides of the pair join and the
    # representative pass, so without the checkpoint the assignment
    # scan re-runs three times and the self-join duplicates its plan.
    # In a production IVF build this table is persisted partitioned by
    # centroid_id anyway. The row norm rides along (r9): computed n
    # times here instead of Σ|cluster|² times inside the pair scan —
    # the pair predicate below then reproduces cosine_similarity's
    # exact expression (coalesce(dot/nullif(norm_a*norm_b,0),0)) from
    # the carried norms, bit-identical because the norm of a row is the
    # same fold wherever it is evaluated.
    scored = (
        ivf_assign(
            table, centroids, vec_col=vec_col, id_col=id_col, with_sim=True
        )
        .withColumn("v_norm", l2_norm(F.col("v")))
        .localCheckpoint(eager=True)
    )
    a = scored.select(
        F.col("id").alias("id_a"),
        F.col("v").alias("v_a"),
        F.col("v_norm").alias("n_a"),
        "centroid_id",
    )
    b = scored.select(
        F.col("id").alias("id_b"),
        F.col("v").alias("v_b"),
        F.col("v_norm").alias("n_b"),
        "centroid_id",
    )
    pair_cos = F.coalesce(
        dot(F.col("v_a"), F.col("v_b"))
        / F.nullif(F.col("n_a") * F.col("n_b"), F.lit(0.0)),
        F.lit(0.0),
    )
    # materialize the (small) pair set before the component loop so the
    # iterative min-label rounds don't re-derive the join+cosine plan
    pairs = (
        a.join(b, "centroid_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(pair_cos >= eps)
        .select("id_a", "id_b")
    ).localCheckpoint(eager=True)
    clusters = dedup_clusters(pairs)
    reps = (
        clusters.join(scored.select("id", "c_sim"), "id")
        .groupBy("cluster")
        .agg(F.min(F.struct(F.col("c_sim"), F.col("id"))).alias("r"))
        .select(F.col("r.id").alias("id"))
    )
    losers = clusters.join(reps, "id", "left_anti").select("id")
    return table.join(
        F.broadcast(losers.withColumnRenamed("id", id_col)),
        id_col,
        "left_anti",
    )
