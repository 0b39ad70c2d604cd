"""Approximate-nearest-neighbor search over embedding columns
(builder brief: brute-force cosine top-k baseline + an LSH-bucketed
scale path).

Hyperplanes are deterministic (HashEmbedder-generated unit vectors), so
the DuckDB oracle can inline the exact same planes as SQL literals and
the bucketed results hash-match — the approximation is reproducible, not
just plausible.

Scale design: the brute-force path is scan → codegen'd cosine →
TakeOrderedAndProject per probe (no shuffle of the big table; verified
plan in functions/vector.py). The LSH path buckets BOTH sides on a
``num_planes``-bit signature: the join touches only same-bucket rows,
so cost is Σ|bucket|·|probes in bucket| instead of |table|·|probes| —
the difference between feasible and not at 10⁹ vectors. Recall is
tunable via ``num_planes`` (fewer planes → bigger buckets → higher
recall, more compute).
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from grafeo_memory_spark.functions.vector import cosine_similarity, dot
from grafeo_memory_spark.protocols import HashEmbedder

__all__ = [
    "random_hyperplanes",
    "hyperplane_signature",
    "ann_lsh_join",
    "planes_sql_literal",
    "ivf_centroids",
    "ivf_assign",
    "ivf_topk",
    "ivf_train",
    "quantize_int8",
    "dequantize_int8",
    "pq_train",
    "pq_encode",
    "pq_adc_topk",
]


def random_hyperplanes(num_planes: int, dims: int, seed: int = 0) -> list[list[float]]:
    """Deterministic unit hyperplanes — reproducible across engines and
    runs (no RNG state: each plane is the hash-embedding of its name)."""
    emb = HashEmbedder(dims)
    return [emb.embed_one(f"hyperplane-{seed}-{i}") for i in range(num_planes)]


def hyperplane_signature(vec_col: Column | str, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product LSH signature packed into an int: bit i set
    iff dot(v, plane_i) > 0."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    # one Literal leaf for all planes; the signature folds as
    # Σ bit_i·2^i with a (sum, place-value) accumulator — integer math
    # identical to the former `reduce(add, 1<<i terms)` chain, but the
    # plan stays O(1) in num_planes·dims AND the commutative add chain
    # (quadratic to canonicalize when the signature becomes a join key)
    # is gone
    planes_lit = F.lit([[float(x) for x in p] for p in planes])
    bits = F.transform(
        planes_lit,
        lambda p: F.when(dot(v, p) > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    # long accumulators: signatures stay exact up to 62 planes (int
    # place-value would overflow past 31)
    sig = F.aggregate(
        bits,
        F.struct(
            F.lit(0).cast("long").alias("s"), F.lit(1).cast("long").alias("m")
        ),
        lambda acc, b: F.struct(
            (acc["s"] + b * acc["m"]).alias("s"),
            (acc["m"] * F.lit(2)).alias("m"),
        ),
        lambda acc: acc["s"],
    )
    # int for ≤31 planes — the type the pre-fold implementation produced
    return sig.cast("int") if len(planes) <= 31 else sig


def planes_sql_literal(planes: list[list[float]]) -> list[str]:
    """Render each plane as a DuckDB DOUBLE[] literal for oracle SQL."""
    return [
        "[" + ", ".join(repr(float(x)) for x in p) + "]::DOUBLE[]" for p in planes
    ]


def ann_lsh_join(
    table: DataFrame,
    probes: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_vec_col: str = "qv",
    probe_id_col: str = "probe_id",
) -> DataFrame:
    """LSH-bucketed ANN join: per probe, the top-k most cosine-similar
    table rows *within the probe's hyperplane bucket*. Output
    (probe_id, id, sim, rank).

    Both sides compute the same signature; the equi-join on it replaces
    the cross join of the brute-force path. Probes are tiny → broadcast.
    """
    sig_t = table.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        hyperplane_signature(vec_col, planes).alias("bucket"),
    )
    sig_p = probes.select(
        F.col(probe_id_col).alias("probe_id"),
        F.col(probe_vec_col).alias("qv"),
        hyperplane_signature(probe_vec_col, planes).alias("bucket"),
    )
    scored = sig_t.join(F.broadcast(sig_p), "bucket").select(
        "probe_id", "id", cosine_similarity(F.col("v"), F.col("qv")).alias("sim")
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("sim").desc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "id", "sim", "rank")
    )


def ivf_centroids(
    table: DataFrame,
    n_centroids: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[tuple[int, list[float]]]:
    """IVF coarse-quantizer codebook: ``n_centroids`` deterministic seed
    vectors (the lowest-id rows — reproducible without RNG state; a
    production build would run a few Lloyd iterations from these seeds,
    which refines recall but not the plan shape). Driver-sized: the
    codebook is ≤ a few thousand small vectors by design."""
    rows = (
        table.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(n_centroids)
        .collect()
    )
    return [(i, list(r["v"])) for i, r in enumerate(rows)]


def ivf_assign(
    table: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    with_sim: bool = False,
) -> DataFrame:
    """Assign every row to its nearest (max-cosine) centroid — the IVF
    inverted-list build. The codebook ships as TWO Literal leaf nodes
    (a nested array of vectors + a parallel id array), not one
    ``F.lit`` per float: a per-element literal codebook makes the
    expression tree O(n_centroids·dim) and Catalyst's canonicalization
    / constraint inference goes quadratic on it the moment the argmax
    column feeds a join key. Two leaves keep the plan O(1) no matter
    the codebook size; the per-row argmax folds inside codegen, so the
    build is one scan, no shuffle. Output (id, v, centroid_id
    [, c_sim when ``with_sim``] ) — ``c_sim`` is the cosine to the
    winning centroid, free out of the same argmax struct.

    At deployment scale, write the result partitioned/bucketed by
    ``centroid_id``: probing then prunes whole files per list. Past
    ~10⁷ codebook floats (100k clusters × 768 dims) the task-shipped
    literal itself gets heavy; switch to a k-row broadcast join +
    per-id max(struct) at that point.

    Fold budget (r9): the naive per-centroid ``cosine_similarity``
    costs 3 array folds per centroid (dot + both norms) = 3k folds per
    row. Here the row norm is projected ONCE per row and the centroid
    norms are computed driver-side into a literal, so the scan does
    k dot-folds + 1 norm-fold per row — ~3× less fold work at any
    codebook size. Bit-parity is preserved, not just approximate:
    the driver-side norm is the same left-fold acc+x*x then sqrt over
    the same doubles (IEEE 754 ops are exactly specified, and sqrt is
    correctly rounded), and the final ``coalesce(dot/nullif(na*nb,0),
    0)`` is the exact expression `cosine_similarity` builds — so every
    hash-verified oracle replaying dot/(sqrt·sqrt) still matches.
    """
    import math

    def _pynorm(vec: list[float]) -> float:
        acc = 0.0
        for x in vec:  # same left-fold order as functions.vector.l2_norm
            acc = acc + float(x) * float(x)
        return math.sqrt(acc)

    cvs = F.lit([[float(x) for x in c] for _, c in centroids])
    cids = F.lit([int(cid) for cid, _ in centroids])
    cnorms = F.lit([_pynorm(c) for _, c in centroids])
    from grafeo_memory_spark.functions.vector import l2_norm

    with_norm = table.withColumn("_vn", l2_norm(F.col(vec_col)))
    sims = F.transform(
        cvs,
        lambda cv, i: F.struct(
            F.coalesce(
                dot(F.col(vec_col), cv)
                / F.nullif(
                    F.col("_vn") * F.element_at(cnorms, i + F.lit(1)),
                    F.lit(0.0),
                ),
                F.lit(0.0),
            ).alias("sim"),
            F.element_at(cids, i + F.lit(1)).alias("cid"),
        ),
    )
    best = F.array_max(sims)  # struct compare: sim first, cid tie-break
    cols = [
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        best["cid"].alias("centroid_id"),
    ]
    if with_sim:
        cols.append(best["sim"].alias("c_sim"))
    return with_norm.select(*cols)


def ivf_topk(
    assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF probe: rank centroids against the query driver-side (the
    codebook is driver-sized), keep ``nprobe`` inverted lists, exact
    cosine re-rank only inside them. Output (id, sim).

    The centroid filter is a pushdown-friendly IN-list — over a
    centroid-partitioned table it prunes partitions at the file level,
    which is what makes IVF the 10⁹-vector path: cost is
    |table|·nprobe/n_centroids instead of |table|.
    """
    import math

    def cos(a: list[float], b: list[float]) -> float:
        dp = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return 0.0 if na == 0 or nb == 0 else dp / (na * nb)

    ranked = sorted(
        centroids, key=lambda c: (-cos(query_vec, c[1]), c[0])
    )[:nprobe]
    probe_ids = [cid for cid, _ in ranked]
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.where(F.col("centroid_id").isin(probe_ids))
        .select("id", cosine_similarity(F.col("v"), qv).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col("id").asc())
        .limit(k)
    )


def ivf_train(
    table: DataFrame,
    n_centroids: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 3,
) -> list[tuple[int, list[float]]]:
    """Lloyd-refined IVF codebook: start from the deterministic seeds
    (`ivf_centroids`) and run ``iterations`` k-means rounds, each as ONE
    distributed pass — the codegen argmax assignment (`ivf_assign`)
    followed by a posexplode + (centroid, dim) mean. No RNG, so the
    codebook is reproducible; empty clusters keep their previous
    centroid. Cost per round is a table scan + one groupBy of
    n_centroids·dims partial means — the shape that holds at 10⁹ rows.

    The driver-facing `ivf_topk` query keeps the seed codebook (its
    DuckDB oracle must reproduce the codebook in SQL); use this trainer
    when recall matters more than oracle replayability.
    """
    centroids = ivf_centroids(
        table, n_centroids, vec_col=vec_col, id_col=id_col
    )
    for _ in range(iterations):
        assigned = ivf_assign(
            table, centroids, vec_col=vec_col, id_col=id_col
        )
        means = (
            assigned.select(
                "centroid_id", F.posexplode("v").alias("dim", "x")
            )
            .groupBy("centroid_id", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "m"))
                ).alias("dm")
            )
            .select(
                "centroid_id",
                F.transform(F.col("dm"), lambda s: s["m"]).alias("c"),
            )
            .collect()
        )
        new = dict(centroids)
        for r in means:
            new[r["centroid_id"]] = [float(x) for x in r["c"]]
        centroids = sorted(new.items())
    return centroids


def quantize_int8(vec_col: Column | str) -> Column:
    """Symmetric per-vector int8 quantization: struct(scale, q) where
    scale = max|x|/127 and q = round(x/scale) as tinyint. 4× smaller
    embedding storage/shuffle; pure codegen (transform + aggregate),
    no UDF. Zero vectors quantize to scale 0 / all-zero q."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    amax = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = (amax / F.lit(127.0)).alias("scale")
    q = F.when(amax == 0.0, F.transform(v, lambda x: F.lit(0).cast("tinyint"))).otherwise(
        F.transform(
            v,
            lambda x: F.round(x.cast("double") / (amax / F.lit(127.0)))
            .cast("int")
            .cast("tinyint"),
        )
    )
    return F.struct(scale, q.alias("q"))


def dequantize_int8(qstruct: Column | str) -> Column:
    """Inverse of `quantize_int8`: struct(scale, q) → array<double>."""
    s = F.col(qstruct) if isinstance(qstruct, str) else qstruct
    return F.transform(
        s["q"], lambda x: x.cast("double") * s["scale"]
    )


# --------------------------------------------------------------- PQ
def _sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 between two equal-length double arrays, one fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def _subspaces(vec: Column, m: int, dims: int) -> Column:
    """Split a dims-length vector into m contiguous subvectors:
    array of structs (j, sub)."""
    w = dims // m
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.slice(vec, j * w + 1, w).alias("sub"),
            )
            for j in range(m)
        ]
    )


def pq_train(
    table: DataFrame,
    *,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 3,
) -> list[list[list[float]]]:
    """Product-quantizer codebooks (Jégou et al. 2011): split the
    vector into ``m`` contiguous subspaces and Lloyd-train ``k``
    centroids per subspace. Returns ``codebooks[j][c]`` — driver-sized
    (m·k·(dims/m) floats) by construction.

    Scale shape: ALL subspaces train in the same pass — one explode to
    (id, j, sub), a codegen argmin assignment against the broadcast
    codebook literal, and one (j, c, dim) mean groupBy per Lloyd round.
    Cost per round is a table scan regardless of m. Deterministic: seeds
    are the lowest-id rows' subvectors, no RNG, empty cells keep their
    centroid."""
    if not 2 <= k <= 256:
        raise ValueError(f"k must be in [2, 256] (one code byte), got {k}")
    head = table.select(vec_col).first()
    if head is None or head[0] is None:
        raise ValueError(
            "pq_train needs a non-empty table with non-null vectors"
        )
    dims = len(head[0])
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    seed_rows = (
        table.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"need at least k={k} rows, have {len(seed_rows)}")
    w = dims // m
    books: list[list[list[float]]] = [
        [[float(x) for x in r["v"][j * w : (j + 1) * w]] for r in seed_rows]
        for j in range(m)
    ]
    subs = table.select(
        F.explode(_subspaces(F.col(vec_col), m, dims)).alias("s")
    ).select(F.col("s.j").alias("j"), F.col("s.sub").alias("sub"))
    for _ in range(iterations):
        # argmin over the per-subspace codebook, dispatched on j —
        # all inside one projection, no shuffle before the mean
        cand = F.array(
            *[
                F.struct(
                    F.when(
                        F.col("j") == j,
                        _sq_l2(
                            F.col("sub"),
                            F.array(*[F.lit(x) for x in books[j][c]]),
                        ),
                    )
                    .otherwise(F.lit(float("inf")))
                    .alias("d"),
                    F.lit(c).alias("c"),
                )
                for j in range(m)
                for c in range(k)
            ]
        )
        assigned = subs.select(
            "j", "sub", F.array_min(cand)["c"].alias("c")
        )
        means = (
            assigned.select("j", "c", F.posexplode("sub").alias("dim", "x"))
            .groupBy("j", "c", "dim")
            .agg(F.avg("x").alias("mu"))
            .groupBy("j", "c")
            .agg(
                F.array_sort(F.collect_list(F.struct("dim", "mu"))).alias("dm")
            )
            .select(
                "j", "c",
                F.transform(F.col("dm"), lambda s: s["mu"]).alias("cent"),
            )
            .collect()
        )
        for r in means:
            books[r["j"]][r["c"]] = [float(x) for x in r["cent"]]
    return books


def pq_encode(
    table: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector as ``m`` one-byte codes (nearest centroid
    per subspace) → (id, code: array<tinyint>). dims·8 bytes → m bytes
    per vector; pure codegen argmin, one scan, no shuffle.

    Byte encoding: the centroid index is stored OFFSET by −128
    (index c → byte c−128), so the full k=256 standard codebook fits a
    signed tinyint — a plain cast would overflow under ANSI mode for
    any c ≥ 128. ``pq_adc_topk`` undoes the offset; treat the code
    column as opaque."""
    m = len(codebooks)
    w = len(codebooks[0][0])

    def sub_code(j: int) -> Column:
        # one Literal leaf per subspace codebook (k×w nested array), not
        # k·w F.lit nodes: keeps the plan O(m) regardless of k and w —
        # at the standard m=8, k=256 a per-element literal tree is
        # ~16k nodes and Catalyst's canonicalization goes quadratic
        cb = F.lit([[float(x) for x in c] for c in codebooks[j]])
        sub = F.slice(F.col(vec_col), j * w + 1, w)
        best = F.array_min(
            F.transform(
                cb,
                lambda cv, i: F.struct(
                    _sq_l2(sub, cv).alias("d"), i.alias("c")
                ),
            )
        )
        return (best["c"] - F.lit(128)).cast("tinyint")

    code = F.array(*[sub_code(j) for j in range(m)])
    return table.select(F.col(id_col).alias("id"), code.alias("code"))


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the m×|codebook| lookup
    table of squared distances from the query's subvectors to every
    centroid is built driver-side and inlined as a literal, so scoring
    a vector is m array lookups + a sum — no vector arithmetic touches
    the table at all. Output (id, dist), ascending (smaller = closer).

    This is the memory-bound 10⁹-vector scan: m bytes read per
    candidate instead of dims·8, with TakeOrderedAndProject on top —
    map-only, no shuffle."""
    m = len(codebooks)
    w = len(codebooks[0][0])
    lut = [
        [
            sum(
                (query_vec[j * w + t] - cent[t]) ** 2 for t in range(w)
            )
            for cent in codebooks[j]
        ]
        for j in range(m)
    ]
    # single Literal leaf (m×k nested array) — O(1) plan nodes
    lut_lit = F.lit([[float(d) for d in row] for row in lut])
    dist = F.aggregate(
        F.zip_with(
            lut_lit,
            F.col("code"),
            # undo pq_encode's −128 byte offset: byte → index c, 1-based
            lambda row, c: F.element_at(row, c.cast("int") + 129),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    return (
        encoded.select("id", dist.alias("dist"))
        .orderBy(F.col("dist").asc(), F.col("id").asc())
        .limit(k)
    )


def hard_negatives(
    table: DataFrame,
    anchors: DataFrame,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor,
    the ``k`` most-similar vectors with a DIFFERENT label — the
    near-miss impostors that carry the most gradient signal in a
    triplet / InfoNCE objective. Output (probe_id, id, sim, rank),
    rank 1 = hardest negative; ties break on lowest id.

    This is the exact (brute-force) baseline: anchors broadcast, one
    scan of the corpus, cosine in codegen, per-anchor top-k. The
    candidate shuffle carries |anchors|·|table| scored rows, so at
    production scale run the same anchors through the LSH-bucketed
    join (:func:`ann_lsh_join`) or IVF probes first and apply the
    label-mismatch filter to the bucketed candidates — identical
    semantics on the candidate set, fan-out bounded by bucket size.
    """
    from pyspark.sql import Window

    a = F.broadcast(
        anchors.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("qv"),
            F.col(label_col).alias("q_label"),
        )
    )
    scored = (
        table.crossJoin(a)
        .where(F.col(label_col) != F.col("q_label"))
        .select(
            "probe_id",
            F.col(id_col).alias("id"),
            cosine_similarity(vec_col, "qv").alias("sim"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("sim").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
