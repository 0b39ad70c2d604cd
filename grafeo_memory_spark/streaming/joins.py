"""Stream-stream interval joins: continuous enrichment of one event
stream with another inside a bounded lookback — the streaming twin of
`operators/asof.asof_join`.

Exact as-of ("latest prior only") is an aggregation on top of this
join; streaming engines bound state with a time interval first, so the
canonical continuous shape is: interval-join within ``lookback``, then
(if single-match semantics are needed) a downstream max(struct) per
left event, or replay the batch as-of over the lakehouse table — the
same batch-backfill story as `streaming/sessions.py`.

State and correctness: BOTH sides carry watermarks and the join
condition carries the time range, which is exactly what lets Spark
evict right-side state older than ``left_ts - lookback - watermark``
and (for left-outer) emit NULL-padded rows once a left event can no
longer match. Without the range condition the state grows forever —
that is the failure mode this wrapper exists to make unrepresentable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts_col: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
    right_suffix: str = "_r",
) -> DataFrame:
    """Join every left event to the right events of the same ``key``
    whose timestamp falls in ``[left_ts - lookback, left_ts]``
    (inclusive both ends — a right row at exactly the left timestamp
    matches, mirroring the batch as-of's inclusive semantics).

    ``how`` may be ``inner`` or ``leftOuter`` (left-outer needs the
    watermark to know when to give up on a left row). Right columns
    are renamed with ``right_suffix`` on collision; the right timestamp
    always comes back as ``ts_col + right_suffix``.
    """
    if how not in ("inner", "leftOuter", "left_outer", "left"):
        raise ValueError(f"unsupported stream join type {how!r}")
    lw = left.withWatermark(ts_col, watermark)
    renames = {
        c: (c + right_suffix if c in left.columns else c)
        for c in right.columns
        if c != key
    }
    rw = right.withWatermark(ts_col, watermark).select(
        F.col(key).alias("_rk"),
        *[F.col(c).alias(renames[c]) for c in renames],
    )
    rts = renames[ts_col]
    cond = (
        (F.col(key) == F.col("_rk"))
        & (F.col(rts) >= F.col(ts_col) - F.expr(f"INTERVAL {lookback}"))
        & (F.col(rts) <= F.col(ts_col))
    )
    joined = lw.join(rw, cond, "inner" if how == "inner" else "leftOuter")
    return joined.drop("_rk")
