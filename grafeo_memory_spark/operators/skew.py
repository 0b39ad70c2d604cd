"""Skew-mitigation utilities: salted joins and hot/cold split joins.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin`, on by default
in `session.get_spark`) already splits oversized sort-merge partitions
at runtime — prefer that for plain shuffled joins. These operators
cover what AQE cannot:

- ``salted_join``: the hot key's rows must land on ONE reducer in a
  hash-partitioned join unless the key itself changes; salting rewrites
  the key to (key, salt) and replicates the small side across salts, so
  a single pathological key spreads over ``salt_n`` tasks. Use when one
  side is modest (it gets replicated ×salt_n) and the other is huge and
  skewed — the classic web-corpus shape (one domain = half the crawl).
- ``split_skew_join``: measure the hot keys (bounded driver list),
  broadcast-join just THOSE rows, shuffle-join the cold rest, union.
  The right call when the hot keys' right-side rows fit in a broadcast
  — no replication factor at all, and the cold path keeps AQE.

Both are result-identical to the plain join (parity pinned in tests).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["salted_join", "split_skew_join", "hot_keys"]

_SUPPORTED = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi"}


def _contains_map(dt: T.DataType) -> bool:
    """xxhash64 rejects MapType (unordered, no canonical hash) anywhere
    in a column's type tree — at plan time, with an opaque error."""
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def _check_reserved(left: DataFrame, right: DataFrame, op: str) -> None:
    if "_salt" in left.columns or "_salt" in right.columns:
        raise ValueError(
            f"{op} reserves the column name '_salt'; rename it first"
        )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    *,
    salt_n: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the left side's hot keys spread over ``salt_n``
    reducers: left rows get a deterministic salt (xxhash64 of the whole
    row — rerun-stable, no RNG state), the right side is replicated
    once per salt value, and the join key becomes (key..., salt).
    Result-identical to ``left.join(right, on, how)`` for inner/left/
    left_semi joins (right-preserving joins would need the mirrored
    construction, so they are rejected).
    """
    if how.lower() not in _SUPPORTED:
        raise ValueError(
            f"salted_join supports {sorted(_SUPPORTED)}, not {how!r}"
        )
    _check_reserved(left, right, "salted_join")
    keys = [on] if isinstance(on, str) else list(on)
    # hash only hashable columns (xxhash64 fails at plan time on any
    # Map-bearing type); the non-key columns provide the within-key
    # spread, so fall back to a per-row id when every non-key column is
    # a map (salt choice never affects the join result, only layout)
    hashable = [
        c
        for c in left.columns
        if not _contains_map(left.schema[c].dataType)
    ]
    spread = [F.col(c) for c in hashable if c not in keys]
    if not spread:
        spread = [F.monotonically_increasing_id()]
    salt: Column = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys if k in hashable], *spread),
        F.lit(salt_n),
    ).cast("int")
    l_s = left.withColumn("_salt", salt)
    r_s = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    return l_s.join(r_s, [*keys, "_salt"], how).drop("_salt")


def hot_keys(
    df: DataFrame,
    on: str | Sequence[str],
    *,
    threshold: int,
    max_keys: int = 10_000,
) -> list:
    """The keys with more than ``threshold`` rows, as a bounded driver
    list (at most ``max_keys``, heaviest first) — the measurement step
    of :func:`split_skew_join`, one aggregation over the key column."""
    keys = [on] if isinstance(on, str) else list(on)
    rows = (
        df.groupBy(*keys)
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > threshold)
        .orderBy(F.col("_n").desc(), *[F.col(k).asc() for k in keys])
        .limit(max_keys)
        .collect()
    )
    if len(keys) == 1:
        return [r[0] for r in rows]
    return [tuple(r[k] for k in keys) for r in rows]


def split_skew_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    hot: Sequence | None = None,
    hot_threshold: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Differential join: rows whose key is hot take a broadcast join
    (no shuffle of the heavy rows at all), the cold rest takes the
    normal shuffled join, results union. ``hot`` is an explicit key
    list, or pass ``hot_threshold`` to measure it here
    (:func:`hot_keys`). Result-identical to the plain join.
    """
    if how.lower() not in _SUPPORTED:
        raise ValueError(
            f"split_skew_join supports {sorted(_SUPPORTED)}, not {how!r}"
        )
    if hot is None:
        if hot_threshold is None:
            raise ValueError("pass hot= or hot_threshold=")
        hot = hot_keys(left, on, threshold=hot_threshold)
    hot = list(hot)
    if not hot:
        return left.join(right, on, how)
    l_hot = left.where(F.col(on).isin(hot))
    l_cold = left.where(~F.col(on).isin(hot) | F.col(on).isNull())
    hot_j = l_hot.join(
        F.broadcast(right.where(F.col(on).isin(hot))), on, how
    )
    cold_j = l_cold.join(right, on, how)
    return hot_j.unionByName(cold_j, allowMissingColumns=False)
