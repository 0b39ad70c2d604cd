"""Z-order layout: the written files must be tight on BOTH clustered
columns (the property single-column sorting cannot give), measured
straight from the parquet footers."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from grafeo_memory_spark.sources.layout import write_zordered, zvalue


def _file_spans(path: str, col_idx: dict[str, int]) -> dict[str, list[float]]:
    """Per-file (max-min) span of each column, from row-group stats."""
    spans: dict[str, list[float]] = {c: [] for c in col_idx}
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        for c, i in col_idx.items():
            lo = min(
                md.row_group(g).column(i).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(i).statistics.max
                for g in range(md.num_row_groups)
            )
            spans[c].append(float(hi) - float(lo))
    return spans


def test_zorder_files_tight_on_both_columns(spark, tmp_path):
    # x and y are independent uniform dims; global span ~1000 each.
    # Z-ordered into 16 files, each file must cover far less than the
    # global span on BOTH x and y (a plain sort by x would leave y
    # spans at ~full range in every file).
    df = spark.range(20_000).select(
        (F.pmod(F.xxhash64("id"), 1000)).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(1)), 1000)).alias("y"),
        F.col("id"),
    )
    out = str(tmp_path / "zordered")
    write_zordered(df, out, ["x", "y"], bits=4, num_files=16)
    spans = _file_spans(out, {"x": 0, "y": 1})
    assert len(spans["x"]) >= 8  # actually produced multiple files
    avg_x = sum(spans["x"]) / len(spans["x"])
    avg_y = sum(spans["y"]) / len(spans["y"])
    assert avg_x < 600 and avg_y < 600  # both dims tight (global ~999)

    # round-trip: no rows lost, schema unchanged
    back = spark.read.parquet(out)
    assert back.count() == 20_000
    assert set(back.columns) == {"x", "y", "id"}


def test_zvalue_is_deterministic_codegen(spark):
    df = spark.range(100).select(
        F.col("id").alias("x"), (99 - F.col("id")).alias("y")
    )
    a = df.select(zvalue(df, ["x", "y"], bits=3).alias("z")).collect()
    b = df.select(zvalue(df, ["x", "y"], bits=3).alias("z")).collect()
    assert a == b
    zs = [r["z"] for r in a]
    assert all(0 <= z < 64 for z in zs)  # 2 cols × 3 bits → 6-bit codes


def test_zvalue_rejects_too_many_bits(spark):
    df = spark.range(10).select(F.col("id").alias("x"), F.col("id").alias("y"))
    import pytest

    with pytest.raises(ValueError):
        zvalue(df, ["x", "y"], bits=32)
