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
    "length_bucket",
    "pack_greedy",
]


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
