"""Corpus sampling / sharding ops for training-data construction
(builder brief): stratified sampling, deterministic per-key selection,
and length bucketing — each a pure declarative plan.

Scale notes: `stratified_sample` is a map-only filter (no shuffle);
`take_per_key` shuffles once on the key (the same shuffle a balanced
shard write needs anyway); `length_bucket` is a pure projection that
composes with `repartition(bucket)` for length-grouped shard files
(minimizing padding waste in fixed-length training batches).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "stratified_sample",
    "take_per_key",
    "weighted_sample_per_key",
    "length_bucket",
    "mixture_fractions",
    "mixture_sample",
    "pack_greedy",
    "shuffle_rows",
]


def shuffle_rows(
    df: DataFrame,
    id_col: str,
    *,
    seed: int = 0,
    num_shards: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training order (r9): an epoch's
    sample order must be uniform, reproducible across reruns, and
    independent of the input's physical layout. The draw is
    ``md5(seed || ':' || id)`` — the repo's portable hash convention,
    so the order is engine-replayable — and rows sort by (draw, id),
    the id tie-break making the permutation total even under md5
    collisions.

    Scale shape: ONE range-partitioned sort (Spark samples range
    boundaries, then sorts per partition) — the cost of any
    write-ordered-by-key pass; files written from the result preserve
    the shuffled order for a sequential trainer, and a new ``seed``
    reshuffles without touching anything upstream. With ``num_shards``
    an additional ``shard`` column (uniform, deterministic, derived
    from the same draw) supports ``partitionBy('shard')`` writes for
    data-parallel readers: shard membership is seed-stable, so shard k
    of seed s is the same set on every rerun.
    """
    draw = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    out = df.orderBy(draw.asc(), F.col(id_col).asc())
    if num_shards:
        out = out.withColumn(
            "shard",
            F.pmod(
                F.conv(F.substring(draw, 1, 15), 16, 10).cast("long"),
                F.lit(num_shards),
            ).cast("int"),
        )
    return out


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    *,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum Bernoulli sample at the given fraction per key,
    deterministic in (id, salt): a row is kept iff the first 8 hex
    digits of md5(id:salt) fall under fraction·16^8. Unlike
    ``DataFrame.sampleBy`` the decision is a pure function of the row,
    so reruns, retries, and different partitionings all select the
    same rows — the property a resumable 100 TB pipeline needs.
    Strata absent from ``fractions`` are dropped (sampleBy semantics).
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(id_col), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / float(16**8)
    )
    frac = F.create_map(
        *[x for k, v in fractions.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    return df.where(u < F.coalesce(frac[F.col(strata_col)], F.lit(0.0)))


def take_per_key(
    df: DataFrame,
    key_col: str,
    k: int,
    *,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Deterministic pseudo-random k rows per key: order within each
    key by md5(id:salt) and keep the first k — a balanced per-group
    cap (languages, sources, domains) that is stable across reruns.
    One shuffle on the key; the per-partition sort is the window's.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.concat_ws(":", F.col(id_col), F.lit(salt))),
        F.col(id_col).asc(),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample_per_key(
    df: DataFrame,
    key_col: str,
    k: int,
    weight_col: str,
    *,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling without replacement, k rows per
    key — Efraimidis-Spirakis (2006) reservoir keys: each row draws the
    md5 uniform ``u`` (same construction as :func:`stratified_sample`)
    and ranks by ``u^(1/w)`` descending, i.e. heavier rows win
    proportionally more often, yet the draw is a pure function of
    (id, salt) so reruns select identically. Ranking uses the monotone
    transform ``ln(u)/w`` (one transcendental instead of ``pow``)
    ROUNDED to 9 decimals: JVM and DuckDB libm results can differ in
    the final ulp, and the rounding makes the oracle's replay
    bit-identical (verified over the full documents table). Weights are
    clamped to >= 1. One shuffle on the key — identical cost shape to
    :func:`take_per_key`.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(id_col), F.lit(salt))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / float(16**8)
    )
    score = F.round(
        F.log(u) / F.greatest(F.col(weight_col).cast("double"), F.lit(1.0)),
        9,
    )
    w = Window.partitionBy(key_col).orderBy(
        score.desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def length_bucket(
    length: Column | str, boundaries: Sequence[int]
) -> Column:
    """Bucket index for a length column given ascending boundaries:
    len < b[0] → 0, b[i-1] ≤ len < b[i] → i, len ≥ b[-1] →
    len(boundaries). Pure expression; repartition on it to build
    length-homogeneous shards (less padding per fixed-length batch)."""
    c = F.col(length) if isinstance(length, str) else length
    bs = sorted(boundaries)
    expr = F.lit(len(bs))
    for i in range(len(bs) - 1, -1, -1):
        expr = F.when(c < F.lit(bs[i]), F.lit(i)).otherwise(expr)
    return expr


def pack_greedy(
    df: DataFrame,
    length_col: str,
    budget: int,
    *,
    id_col: str,
    num_shards: int = 64,
) -> DataFrame:
    """Greedy sequence packing: assign rows to packs whose total
    ``length_col`` stays ≤ ``budget`` (fixed-length training batches
    with minimal padding). Rows never split; a single row longer than
    the budget gets its own pack.

    Scale shape: rows are hash-distributed into ``num_shards``
    deterministic shards (one shuffle), each shard packed independently
    by a per-group greedy first-fit inside ``applyInPandas`` — workers
    pack in parallel and pack ids are globally unique
    (shard * 2^32 + local). Deterministic: shard assignment is a hash
    of the id, and within a shard rows pack in md5(id) order.

    Output: input columns + ``pack_id`` (long).
    """
    import pandas as pd

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("pack_id", T.LongType(), False)]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_ord", kind="mergesort")
        shard = int(pdf["_shard"].iloc[0])
        packs: list[int] = []  # remaining budget per open pack
        ids = []
        for ln in pdf[length_col]:
            ln = int(ln)
            placed = None
            for i in range(len(packs)):
                if packs[i] >= ln:
                    placed = i
                    packs[i] -= ln
                    break
            if placed is None:
                packs.append(max(0, budget - ln))
                placed = len(packs) - 1
            ids.append((shard << 32) | placed)
        pdf = pdf.assign(pack_id=ids)
        return pdf.drop(columns=["_shard", "_ord"])

    keyed = df.withColumn(
        "_shard",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards)).cast("int"),
    ).withColumn("_ord", F.md5(F.concat_ws(":", F.col(id_col))))
    return keyed.groupBy("_shard").applyInPandas(pack, out_schema)


def mixture_fractions(
    df: DataFrame,
    domain_col: str,
    weights: dict,
    *,
    token_col: str | None = None,
    budget: int | None = None,
) -> dict:
    """Per-domain sampling fractions realizing a target mixture: given
    desired token shares ``weights`` (e.g. {"web": 0.6, "code": 0.3,
    "wiki": 0.1}), find the largest feasible total T (capped by
    ``budget``) such that every domain can supply its share without
    upsampling, and return {domain: fraction} with
    fraction_d = w_d·T / available_d.

    ``token_col`` weighs rows by token count (the unit mixtures are
    specified in); None counts rows. Domains absent from ``weights``
    get fraction 0. One small aggregate (|domains| rows) feeds a
    driver-side closed-form solve — nothing else touches the corpus.

    A positive-weight domain with zero availability (no rows, or null/
    zero token sum) makes the target mixture infeasible at any T > 0 —
    that raises ``ValueError`` rather than silently re-solving over the
    remaining domains (which would hand back a sample whose realized
    mixture deviates from ``weights``, e.g. 100% web for a 50/50
    web/books ask with no books rows).
    """
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    norm = {k: v / total_w for k, v in weights.items() if v > 0}
    unit = F.col(token_col) if token_col else F.lit(1)
    avail = {
        r["d"]: r["avail"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.sum(unit).alias("avail"))
        .collect()
        if r["d"] in norm and r["avail"]
    }
    missing = sorted(set(norm) - set(avail))
    if missing:
        raise ValueError(
            "mixture infeasible: positive-weight domain(s) with zero "
            f"availability: {missing}"
        )
    t = min(avail[d] / norm[d] for d in avail)
    if budget is not None:
        t = min(t, float(budget))
    return {
        k: (norm[k] * t / avail[k] if k in avail else 0.0)
        for k in weights
    }


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict,
    *,
    id_col: str,
    token_col: str | None = None,
    budget: int | None = None,
    salt: int = 0,
) -> DataFrame:
    """Deterministic domain-mixture sample: solve the fractions with
    :func:`mixture_fractions`, then apply the rerun-stable
    :func:`stratified_sample` — the corpus side stays a map-only
    filter. The realized mixture matches ``weights`` in expectation;
    exactness improves with domain size (Bernoulli variance)."""
    fr = mixture_fractions(
        df, domain_col, weights, token_col=token_col, budget=budget
    )
    return stratified_sample(
        df, domain_col, fr, id_col=id_col, salt=salt
    )
