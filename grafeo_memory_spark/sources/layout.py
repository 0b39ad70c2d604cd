"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

Why: a parquet scan prunes row groups by min/max stats. Sorting by ONE
column gives perfect pruning on it and none on any other; interleaving
the bits of several columns' bucket ids (the Z-order curve — the same
layout Delta/Iceberg expose as OPTIMIZE ZORDER BY) makes every file
tight on EVERY clustered column at once, so selective filters on any of
them skip most files. At 100 TB the difference is reading a few hundred
files versus the whole table.

Everything here is codegen Column math — the per-column bucket
boundaries come from one driver-sized ``approxQuantile`` call and fold
into the plan as literals; no UDF, no extra shuffle beyond the final
range-partitioned write.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue", "write_zordered"]


def _bucket_expr(col: str, cuts: list[float], bits: int) -> Column:
    """Map a numeric column to its quantile-bucket id in [0, 2^bits):
    a binary-search-free fold over the (driver-sized, plan-literal)
    boundary array — bucket = number of cuts at or below the value."""
    cuts_lit = F.lit([float(c) for c in cuts])
    n_buckets = (1 << bits) - 1
    return F.least(
        F.aggregate(
            cuts_lit,
            F.lit(0),
            lambda acc, c: acc
            + F.when(F.col(col).cast("double") >= c, 1).otherwise(0),
        ),
        F.lit(n_buckets),
    )


def zvalue(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> Column:
    """The Morton code of ``cols`` as a Column: each column is bucketed
    into 2^bits quantile bins (boundaries via one ``approxQuantile``
    driver call — equi-depth, so skewed value distributions still fill
    all bins), then the bucket ids' bits are interleaved
    (col i contributes its bit j at output position ``j*len(cols)+i``).
    Pure integer codegen; ``bits * len(cols)`` must stay <= 62.
    """
    n = len(cols)
    if bits * n > 62:
        raise ValueError("bits * len(cols) must be <= 62")
    n_cuts = (1 << bits) - 1
    probs = [(i + 1) / (1 << bits) for i in range(n_cuts)]
    all_cuts = df.approxQuantile(list(cols), probs, 0.001)
    z = F.lit(0).cast("long")
    for i, (c, cuts) in enumerate(zip(cols, all_cuts)):
        b = _bucket_expr(c, cuts, bits).cast("long")
        for j in range(bits):
            z = z + F.shiftleft(
                F.shiftright(b, j).bitwiseAND(F.lit(1)), j * n + i
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    bits: int = 8,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``cols``: range-partition by the Morton code (so files own
    contiguous curve segments) and sort within each partition, then
    drop the helper column. Every written file is then tight on the
    min/max of EVERY clustered column — the property
    ``tests/test_layout.py`` asserts quantitatively from the parquet
    footers."""
    z = df.withColumn("_z", zvalue(df, cols, bits=bits))
    part = (
        z.repartitionByRange(num_files, "_z")
        if num_files
        else z.repartitionByRange("_z")
    )
    (
        part.sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
