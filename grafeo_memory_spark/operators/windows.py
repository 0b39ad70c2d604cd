"""Window / ranking operators (SURVEY.md §2.5).

Top-k without a group compiles to TakeOrderedAndProject (per-partition
heap, no shuffle). Grouped variants shuffle once on the group key — at
scale prefer pre-partitioned/bucketed input on that key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "top_k",
    "top_k_per_group",
    "latest_per_group",
    "drop_newest",
    "sessionize",
    "time_weighted_avg",
]


def top_k(
    df: DataFrame, order: Sequence[Column], k: int
) -> DataFrame:
    """W1 — global top-k (`manager.py:695,792`). Pass a deterministic
    tie-breaker as the last order column."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "_rn",
) -> DataFrame:
    """W1 grouped — row_number ≤ k within each group."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
        .drop(rank_col)
    )


def latest_per_group(
    df: DataFrame, group: Sequence[str], ts_col: str = "created_at",
    tiebreak: str | None = None,
) -> DataFrame:
    """W2 — argmax ts per group (session predecessor probe,
    reference `manager.py:1191-1209`)."""
    order = [F.col(ts_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    return top_k_per_group(df, group, order, 1)


def drop_newest(
    df: DataFrame, preserve_recent: int, ts_col: str = "created_at",
    tiebreak: str | None = None,
) -> DataFrame:
    """W4 — consolidation slice: everything but the newest
    ``preserve_recent`` rows, oldest first (reference
    `manager.py:1816-1833,1857-1860`).

    Two-phase, shuffle-free plan (no global window — a
    ``Window.orderBy`` without partitionBy funnels the whole table
    through one task, which dies at scale):

      1. boundary = the oldest of the newest ``preserve_recent`` rows,
         found via TakeOrderedAndProject (per-partition top-k heap,
         driver merges k rows) then a single-row aggregate;
      2. keep rows strictly below the boundary — a broadcast join +
         codegen'd struct comparison, pushdown-friendly.

    Rows tied with the boundary on ``(ts, tiebreak)`` are treated as
    "newest" and dropped, matching the row_number formulation when
    ``tiebreak`` makes the ordering total (pass a unique id for
    deterministic results).
    """
    if preserve_recent <= 0:
        # nothing preserved: the slice is the whole input (a LIMIT 0
        # boundary would aggregate to NULL and wrongly drop every row)
        return df.orderBy(F.col(ts_col).asc())
    key_cols = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    order = [c.desc() for c in key_cols]
    boundary = (
        df.select(F.struct(*key_cols).alias("_key"))
        .orderBy(*order)
        .limit(preserve_recent)
        .agg(F.min("_key").alias("_boundary"))
    )
    return (
        df.crossJoin(F.broadcast(boundary))
        .where(F.struct(*key_cols) < F.col("_boundary"))
        .drop("_boundary")
        .orderBy(F.col(ts_col).asc())
    )


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: Column | int | float,
    *,
    tiebreak: str | None = None,
    session_col: str = "session_seq",
) -> DataFrame:
    """Gap-based sessionization: within each key, a new session starts
    whenever the time since the previous row exceeds ``gap`` (strictly
    greater; equal-to-gap rows stay in the session). Adds ``session_col``
    — a 1-based per-key session sequence number, so (keys..., session)
    is a stable session identifier. Mirrors the reference's session
    chaining (`manager.py` `_link_session_chain`), which links
    consecutive memories into an episode; here the chain additionally
    SPLITS on inactivity — the classic event-analytics session window.

    ``gap`` is in the units of a numeric ``ts_col`` (the fixtures ship
    epoch-nanosecond longs), or an INTERVAL Column for timestamps.

    Scale shape: lag + cumulative sum over one ``(keys, ts)`` window —
    a single shuffle on the key, each partition sorted once; batch twin
    of Structured Streaming's ``session_window`` (streaming/sessions.py).
    """
    gap_c = gap if isinstance(gap, Column) else F.lit(gap)
    order = [F.col(ts_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) - prev > gap_c), F.lit(1)
    ).otherwise(F.lit(0))
    cum = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # two selects: window functions can't nest, but both windows share
    # (keys, order) so Catalyst plans ONE shuffle + one sort
    return (
        df.withColumn("_new_session", is_new)
        .withColumn(session_col, F.sum("_new_session").over(cum))
        .drop("_new_session")
    )


def time_weighted_avg(
    df: DataFrame,
    keys: Sequence[str],
    ts_num_col: str,
    value_col: str,
    *,
    tiebreak: str | None = None,
    out_col: str = "twa",
) -> DataFrame:
    """Left-weighted time-weighted average per key group — the
    timeseries-engine rollup where a value HOLDS from its timestamp
    until the next observation, so irregular sampling doesn't bias the
    mean toward burst periods: ``Σ v_i·(t_{i+1}−t_i) / (t_n−t_0)``.
    The last observation of a group carries no weight (nothing holds
    after it); single-observation groups fall back to the plain value.

    ``ts_num_col`` must already be numeric (epoch micros/millis — exact
    integers; a raw timestamp cast to double loses sub-second precision
    at epoch magnitudes, so convert with ``unix_micros``/timestampdiff
    upstream). One shuffle on the keys; the lead window and the
    aggregation share it.
    """
    order = [F.col(ts_num_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    dur = F.lead(ts_num_col).over(w) - F.col(ts_num_col)
    return (
        df.withColumn("_dur", dur)
        .groupBy(*keys)
        .agg(
            F.when(
                F.sum("_dur") > 0,
                F.sum(F.col(value_col) * F.col("_dur")) / F.sum("_dur"),
            )
            .otherwise(F.avg(value_col))
            .alias(out_col)
        )
    )


def rrf_score(rank_col: Column, rrf_k: int = 1) -> Column:
    """W5 — reciprocal-rank-fusion contribution `1/(rrf_k + rank)`
    (reference `search/vector.py:123-132`, rrf_k=1)."""
    return F.lit(1.0) / (F.lit(float(rrf_k)) + rank_col)
