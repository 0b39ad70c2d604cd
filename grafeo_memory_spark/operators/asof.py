"""As-of (point-in-time) join — the temporal lookup a feature store or
training-data pipeline needs: for every left row, the single latest
right row with ``right.ts <= left.ts`` per key (optionally within a
tolerance). The reference's point-in-time search (`search/temporal.py`,
`operators/filters.point_in_time`) answers "state as of T" for ONE
timestamp; this operator answers it for every left row at once.

Scale shape — the union trick, not a range join: tagging both sides,
unioning, and running one ``last(value) IGNORE NULLS`` window per key
costs a single shuffle on the key and a per-partition sort, O(|L|+|R|).
The naive formulation (equi-join on key + ts inequality + argmax) is a
range join that degenerates to per-key Cartesian products, and Spark
has no native as-of join (pandas-on-Spark `merge_asof` exists but
round-trips through pandas). DuckDB's native ``ASOF JOIN`` (inclusive
``>=`` match semantics, which this operator reproduces exactly) serves
as the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    ts_col: str,
    right_ts_col: str | None = None,
    value_cols: Sequence[str] | None = None,
    tolerance: Column | int | float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the value columns of
    the most recent ``right`` row with ``right_ts <= left_ts`` and the
    same key(s); ``NULL``s when no prior right row exists (left-outer
    semantics, row count preserved).

    Ties: a right row at *exactly* the left timestamp matches
    (inclusive, DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics);
    several right rows sharing one (key, ts) resolve deterministically
    to the greatest value struct. ``tolerance`` (same units as a
    numeric ts column, or an INTERVAL Column for timestamps) nulls out
    matches older than ``left_ts - tolerance``.

    Output: every left column, then each requested right value column
    (renamed with ``suffix`` on name collision), then
    ``ts_col + "_matched" + suffix`` — the matched right timestamp
    (useful for staleness features; NULL when unmatched).

    NULL keys never match (standard join equality, DuckDB ``ASOF ...
    ON l.k = r.k`` semantics): a left row with a NULL key is kept with
    NULL values, and NULL-key right rows match nothing.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts_col or ts_col
    reserved = {"_ts", "_side", "_rv", "_m"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)}; "
            f"rename {sorted(clash)} first"
        )
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, rts)]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in value_cols
    }
    matched_ts = ts_col + "_matched" + suffix

    # one struct carries the right timestamp + all values: `last()`
    # then moves ONE column through the window, and the struct's
    # lexicographic order makes equal-ts ties deterministic
    rv = F.struct(
        F.col(rts).cast(right.schema[rts].dataType).alias("_rts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    # NULL-timestamp right rows can never satisfy rts <= lts (SQL
    # comparison semantics, DuckDB ASOF agrees) — drop them up front;
    # without this they sort NULLS FIRST and the window hands them to
    # every row after them (found by the randomized parity test, r7).
    # A NULL-timestamp LEFT row needs no guard: with NULL right rows
    # gone, its window prefix holds only left rows, so _m is NULL and
    # it comes out NULL-padded.
    r_tagged = right.where(F.col(rts).isNotNull()).select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("_ts"),
        F.lit(0).alias("_side"),
        rv.alias("_rv"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l_tagged = left.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rv").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        r_tagged.unionByName(l_tagged)
        .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    # join-equality semantics: NULL keys never match (partitionBy groups
    # NULL with NULL, so without this a NULL-key left row would pick up
    # a NULL-key right row — DuckDB ASOF ON equality never does). A
    # keyless (global) as-of join has no equality to enforce, so the
    # guard is skipped entirely (ADVICE r6: `~None` raised).
    if keys:
        null_key = F.col(keys[0]).isNull()
        for k in keys[1:]:
            null_key = null_key | F.col(k).isNull()
        joined = joined.withColumn("_m", F.when(~null_key, F.col("_m")))
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        joined = joined.withColumn(
            "_m",
            F.when(F.col("_m._rts") >= F.col("_ts") - tol, F.col("_m")),
        )
    return joined.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(out_names[c]) for c in value_cols],
        F.col("_m._rts").alias(matched_ts),
    )
