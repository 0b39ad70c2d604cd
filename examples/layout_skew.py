"""Physical-layout and skew tooling — Z-order clustered writes and the
salted / hot-cold split joins (this engine's Spark-native extension
surface; see COVERAGE.md "Physical layout & skew tooling").

Run: python examples/layout_skew.py [sf_dir]
"""

from __future__ import annotations

import glob
import sys
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from grafeo_memory_spark.operators.skew import (
    hot_keys,
    salted_join,
    split_skew_join,
)
from grafeo_memory_spark.session import get_spark
from grafeo_memory_spark.sources.layout import write_zordered


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = spark or get_spark(app_name="layout-skew")

    # 1. Z-order the orders table on (custkey, totalprice): every
    # written file becomes tight on BOTH columns, so selective filters
    # on either one skip most files at scan time
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = tempfile.mkdtemp(prefix="zorder_")
    write_zordered(
        orders, out, ["o_custkey", "o_totalprice"], bits=4, num_files=8
    )

    def spans(col_idx):
        res = []
        for f in glob.glob(f"{out}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            st = md.row_group(0).column(col_idx).statistics
            res.append(float(st.max) - float(st.min))
        return res

    g_cust = orders.agg(
        F.max("o_custkey") - F.min("o_custkey")
    ).collect()[0][0]
    g_price = orders.agg(
        F.round(F.max("o_totalprice") - F.min("o_totalprice"), 0)
    ).collect()[0][0]
    cs, ps = spans(1), spans(3)
    print(f"z-ordered {orders.count()} orders into {len(cs)} files")
    print(f"  custkey:    global span {g_cust}, "
          f"avg per-file span {sum(cs) / len(cs):.0f}")
    print(f"  totalprice: global span {g_price:.0f}, "
          f"avg per-file span {sum(ps) / len(ps):.0f}")

    # 2. skew: half of lineitem keyed to ONE hot part; the salted join
    # spreads it over 8 reducers, the split join broadcasts just the
    # hot slice — both result-identical to the plain join
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.when(F.col("l_orderkey") % 2 == 0, 1)
        .otherwise(F.col("l_partkey"))
        .alias("pk"),
        "l_quantity",
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("pk"), "p_name"
    )
    plain = li.join(part, "pk").count()
    salted = salted_join(li, part, "pk", salt_n=8).count()
    hot = hot_keys(li, "pk", threshold=li.count() // 4)
    split = split_skew_join(li, part, "pk", hot=hot).count()
    print(f"\nskewed join: plain={plain} salted={salted} split={split} "
          f"(hot keys: {hot})")
    assert plain == salted == split


if __name__ == "__main__":
    main(sf_dir=sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
