"""Relational-core driver queries (SURVEY.md §2.2-2.7) over the TPC-H-ish
driver tables, each with a DuckDB oracle.

Mapping note: the reference's property-graph semantics are exercised here
on the star schema — `orders` stands in for Memory nodes, `part` for
Entity nodes and `lineitem` for HAS_ENTITY edges, `events` for the
session/episode stream. The same operator implementations run over the
native memory-graph tables in tests/ (FIXTURES.md §B).

Timestamps are emitted as epoch **seconds** (`BIGINT`) on both sides to
dodge engine-specific timestamp rendering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from grafeo_memory_spark.operators.filters import (
    compile_filters,
    find_by_property,
    point_lookup,
    scope_filter,
    time_range,
    valid_at_point,
)
from grafeo_memory_spark.operators.asof import asof_join
from grafeo_memory_spark.operators.range_join import range_join
from grafeo_memory_spark.operators.windows import (
    drop_newest,
    latest_per_group,
    sessionize,
    top_k,
    top_k_per_group,
)
from grafeo_memory_spark.queries import query
from grafeo_memory_spark.sources.tables import (
    ORACLE_FIXTURES as _FIX,
    load_fixture,
    load_table,
)
_MEM = f"read_parquet('{_FIX}/memories.parquet')"
_ENT = f"read_parquet('{_FIX}/entities.parquet')"


@query(
    "filter_ops",
    oracle="""
    SELECT 'scope' AS kind, c_custkey AS id, c_name AS name,
           round(c_acctbal, 2) AS val
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_nationkey = 5
    UNION ALL
    SELECT 'ops' AS kind, p_partkey AS id, p_brand AS name,
           CAST(p_size AS DOUBLE) AS val
    FROM part
    WHERE p_size >= 10 AND p_size < 40
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND p_type IS NOT NULL AND contains(p_type, 'O')
      AND (p_retailprice IS NULL OR p_retailprice <> 0.0)
      AND p_partkey NOT IN (1, 2, 3)
    UNION ALL
    SELECT 'json' AS kind, count(*) AS id, event_type AS name,
           round(avg(CAST(regexp_extract(props, '"k": (\\d+)', 1)
                          AS BIGINT)), 4) AS val
    FROM events
    WHERE CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) > 50
    GROUP BY event_type
    UNION ALL
    SELECT 'point' AS kind, id, text AS name, CAST(NULL AS DOUBLE) AS val
    FROM {mem} WHERE id = 42
    UNION ALL
    SELECT 'property' AS kind, id, CAST(NULL AS VARCHAR) AS name,
           CAST(NULL AS DOUBLE) AS val
    FROM {ent} WHERE entity_type = 'location'
    ORDER BY kind, id, name
    """.format(mem=_MEM, ent=_ENT),
)
def q_filter_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 + F2 + X3 + S3 + S4 in one driver row (F1/F2 merged in r4 to
    free registry slots; X3 folded for `graph_metrics`; the former
    `lookup_point_property` slot folded in r6 to seat the corpus ops):
    the conjunctive equality scope filter (`manager.py:164-175`) tagged
    'scope', the Mongo-style `$op` predicate compiler
    (`search/vector.py:351-381`: $gte/$lt/$in/$contains/$ne/$nin)
    tagged 'ops', JSON-encoded property extraction + predicate + rollup
    (`metadata` parse, `search/vector.py:422-433`, regex form shared
    with the oracle) tagged 'json', point lookup by node id
    (`get_node`, `protocol.py:68`) tagged 'point', and node ids by
    property value (`find_nodes_by_property`, `protocol.py:76`) tagged
    'property'. All predicate sets push down to their Parquet scans.
    """
    cust = load_table(spark, sf_dir, "customer")
    scope = cust.where(
        scope_filter(c_mktsegment="BUILDING", c_nationkey=5)
    ).select(
        F.lit("scope").alias("kind"),
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("val"),
    )
    part = load_table(spark, sf_dir, "part")
    pred = compile_filters(
        {
            "p_size": {"$gte": 10, "$lt": 40},
            "p_brand": {"$in": ["Brand#1", "Brand#2", "Brand#3"]},
            "p_type": {"$contains": "O"},
            "p_retailprice": {"$ne": 0.0},
            "p_partkey": {"$nin": [1, 2, 3]},
        }
    )
    ops = part.where(pred).select(
        F.lit("ops").alias("kind"),
        F.col("p_partkey").alias("id"),
        F.col("p_brand").alias("name"),
        F.col("p_size").cast("double").alias("val"),
    )
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("long")
    json_part = (
        ev.withColumn("k", k)
        .where(F.col("k") > 50)
        .groupBy("event_type")
        .agg(F.count("*").alias("id"), F.round(F.avg("k"), 4).alias("val"))
        .select(
            F.lit("json").alias("kind"),
            "id",
            F.col("event_type").alias("name"),
            "val",
        )
    )
    mem = load_fixture(spark, sf_dir, "memories")
    ent = load_fixture(spark, sf_dir, "entities")
    point = point_lookup(mem, 42).select(
        F.lit("point").alias("kind"),
        "id",
        F.col("text").alias("name"),
        F.lit(None).cast("double").alias("val"),
    )
    prop = find_by_property(ent, "entity_type", "location").select(
        F.lit("property").alias("kind"),
        "id",
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("double").alias("val"),
    )
    return (
        scope.unionByName(ops)
        .unionByName(json_part)
        .unionByName(point)
        .unionByName(prop)
        .orderBy("kind", "id", "name")
    )


@query(
    "temporal_filters",
    oracle="""
    WITH bitemporal AS (
      SELECT o_orderkey,
             o_orderdate AS valid_at,
             CASE WHEN o_orderstatus = 'F'
                  THEN o_orderdate + INTERVAL 90 DAY END AS invalid_at
      FROM orders
    )
    SELECT 'range' AS kind, o_orderkey,
           epoch(o_orderdate)::BIGINT AS order_epoch
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <= TIMESTAMP '1996-12-31 23:59:59'
    UNION ALL
    SELECT 'pit' AS kind, o_orderkey, CAST(NULL AS BIGINT) AS order_epoch
    FROM bitemporal
    WHERE valid_at IS NULL
       OR (valid_at <= TIMESTAMP '1997-06-01'
           AND (invalid_at IS NULL OR invalid_at > TIMESTAMP '1997-06-01'))
    ORDER BY kind, o_orderkey
    """,
)
def q_temporal_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 + F5 in one driver row (merged to free registry slots,
    VERDICT r4 item 1): the time-range filter (`manager.py:713-716`,
    min/max Parquet pruning on the pushed-down range) tagged 'range',
    unioned with the bi-temporal point-in-time predicate
    (`manager.py:2031-2040`, permissive on missing valid_at) tagged
    'pit'. valid/invalid intervals derive from order dates; native
    memories semantics are unit-tested."""
    orders = load_table(spark, sf_dir, "orders")
    lo = F.to_timestamp(F.lit("1996-01-01"))
    hi = F.to_timestamp(F.lit("1996-12-31 23:59:59"))
    rng = orders.where(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") <= hi)
    ).select(
        F.lit("range").alias("kind"),
        "o_orderkey",
        F.col("o_orderdate").cast("timestamp").cast("long").alias("order_epoch"),
    )
    bt = orders.select(
        "o_orderkey",
        F.col("o_orderdate").alias("valid_at"),
        F.when(
            F.col("o_orderstatus") == "F",
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
        ).alias("invalid_at"),
    )
    pit = "1997-06-01"
    v, iv = F.col("valid_at"), F.col("invalid_at")
    cond = v.isNull() | (
        (v <= F.to_timestamp(F.lit(pit))) & (iv.isNull() | (iv > F.to_timestamp(F.lit(pit))))
    )
    pit_rows = bt.where(cond).select(
        F.lit("pit").alias("kind"),
        "o_orderkey",
        F.lit(None).cast("long").alias("order_epoch"),
    )
    return rng.unionByName(pit_rows).orderBy("kind", "o_orderkey")


@query(
    "window_ops",
    oracle="""
    SELECT 'topk' AS kind, o_orderkey, CAST(NULL AS BIGINT) AS k2,
           round(o_totalprice, 2) AS score
    FROM (
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    )
    UNION ALL
    SELECT 'latest' AS kind, o_orderkey, o_custkey AS k2,
           CAST(epoch(o_orderdate) AS DOUBLE) AS score
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    UNION ALL
    SELECT 'oldest' AS kind, o_orderkey, o_custkey AS k2,
           CAST(NULL AS DOUBLE) AS score
    FROM (
      SELECT *, row_number() OVER (
        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn > 5
    ORDER BY kind, o_orderkey
    """,
)
def q_window_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 + W2 + W4 in one driver row (merged to free registry slots,
    VERDICT r4 item 1): the global top-k (`manager.py:792`;
    TakeOrderedAndProject, no shuffle) tagged 'topk', argmax created_at
    per group (session predecessor probe, `manager.py:1191-1209`; one
    shuffle on the group key) tagged 'latest', and the consolidation
    slice keeping all but the newest ``preserve_recent=5`` rows
    (`manager.py:1857-1860`) tagged 'oldest'."""
    orders = load_table(spark, sf_dir, "orders")
    topk = top_k(
        orders.select("o_orderkey", F.round("o_totalprice", 2).alias("score")),
        [F.col("score").desc(), F.col("o_orderkey").asc()],
        10,
    ).select(
        F.lit("topk").alias("kind"),
        "o_orderkey",
        F.lit(None).cast("long").alias("k2"),
        "score",
    )
    latest = latest_per_group(
        orders, ["o_custkey"], "o_orderdate", tiebreak="o_orderkey"
    ).select(
        F.lit("latest").alias("kind"),
        "o_orderkey",
        F.col("o_custkey").alias("k2"),
        F.col("o_orderdate")
        .cast("timestamp")
        .cast("long")
        .cast("double")
        .alias("score"),
    )
    oldest = drop_newest(orders, 5, "o_orderdate", tiebreak="o_orderkey").select(
        F.lit("oldest").alias("kind"),
        "o_orderkey",
        F.col("o_custkey").alias("k2"),
        F.lit(None).cast("double").alias("score"),
    )
    return topk.unionByName(latest).unionByName(oldest).orderBy(
        "kind", "o_orderkey"
    )


@query(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-family pricing-summary rollup (TPC-H Q1 shape): partial
    aggregation map-side, single shuffle on the tiny group key."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "group_by_session",
    oracle="""
    WITH lagged AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM events
    ),
    sess AS (
      SELECT user_id, event_id, ts, value,
             sum(CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL '30 minutes'
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM lagged
    ),
    durs AS (
      SELECT user_id, session_seq, ts, value,
             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_e6,
             lead(epoch_us(ts)) OVER (
               PARTITION BY user_id, session_seq
               ORDER BY ts, event_id) - epoch_us(ts) AS dur
      FROM sess
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           epoch_us(min(ts)) AS first_us,
           epoch_us(max(ts)) AS last_us,
           CAST(sum(v_e6) AS BIGINT) AS total_value_e6,
           CAST(CASE
                WHEN sum(dur) > 0 THEN
                  (2 * sum(CAST(v_e6 AS HUGEINT) * dur) + sum(dur))
                  // (2 * sum(dur))
                WHEN count(v_e6) > 0 THEN
                  (2 * sum(v_e6) + count(v_e6)) // (2 * count(v_e6))
                END AS BIGINT) AS twa_value_e6
    FROM durs
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def q_group_by_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — group-by-session rollup (`manager.py:1571-1583`), upgraded
    from a plain per-user rollup to real gap sessionization
    (`operators/windows.sessionize`, 30-minute inactivity gap): a
    user's events split into sessions wherever the gap to the previous
    event exceeds 30 minutes, and the rollup groups by
    (user_id, session_seq). The two window passes and the aggregation
    all share one shuffle on user_id.

    ``ts`` has shipped as both epoch-nanosecond longs (older fixtures,
    read via tables.py nanosAsLong) and native timestamp[us]; branch on
    the arriving type. The timestamp branch measures from the NTZ epoch
    directly so the result is session-timezone-independent, matching
    DuckDB's epoch_us() on naive timestamps."""
    ev = load_table(spark, sf_dir, "events")
    if isinstance(ev.schema["ts"].dataType, T.LongType):
        gap = F.lit(30 * 60 * 1_000_000_000)  # 30 min in nanos
        first = F.expr("min(ts) div 1000").alias("first_us")
        last = F.expr("max(ts) div 1000").alias("last_us")
        us = F.expr("ts div 1000")
    else:
        gap = F.expr("INTERVAL 30 MINUTES")
        epoch_us = (
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            " {c}(ts))"
        )
        first = F.expr(epoch_us.format(c="min")).alias("first_us")
        last = F.expr(epoch_us.format(c="max")).alias("last_us")
        us = F.expr(epoch_us.format(c=""))
    # time-weighted average inside each session (the timeseries rollup
    # `operators/windows.time_weighted_avg` packages standalone): each
    # value holds until the next event; exact integer micros on both
    # sides so the weights are bit-identical with the oracle's epoch_us.
    # The emitted schema is FLOAT-FREE (VERDICT r6 item 1) and, as of
    # r8, the fixed-point derivation itself is pure IEEE-754 double
    # arithmetic: v_e6 = floor(value*1e6 + 0.5) cast to BIGINT. The r7
    # double→decimal(14,6) cast was NOT engine-identical — Spark rounds
    # the double's shortest decimal string HALF_UP
    # (Decimal.apply(double) → BigDecimal(d.toString)) while DuckDB
    # rounds the binary double, so tie values like 8.0244445 produced
    # 8024445 vs 8024444 (ADVICE r7). Multiply/add/floor on doubles are
    # bit-identical across engines, so v_e6 now is too. Everything
    # after is integer fixed-point: total_value_e6 = Σ v_e6 (BIGINT);
    # twa_value_e6 is the round-half-up integer quotient (2N + D) div
    # (2D) with N = Σ v_e6·dur (decimal(38,0) — a per-row product tops
    # out near 2^59·µs so the sum needs headroom) and D = Σ dur
    # (values and durations are non-negative, so trunc-div ≡ floor-div
    # on both sides).
    wdur = Window.partitionBy("user_id", "session_seq").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    sess = (
        sessionize(ev, ["user_id"], "ts", gap, tiebreak="event_id")
        .withColumn("_us", us)
        .withColumn(
            "_ve6",
            F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast(
                "long"
            ),
        )
        .withColumn("_dur", F.lead("_us").over(wdur) - F.col("_us"))
    )
    twa = F.expr(
        "CASE WHEN sum(_dur) > 0 THEN"
        " (2 * sum(CAST(_ve6 AS DECIMAL(20,0)) * _dur)"
        "  + CAST(sum(_dur) AS DECIMAL(38,0)))"
        " div (2 * CAST(sum(_dur) AS DECIMAL(38,0)))"
        " WHEN count(_ve6) > 0 THEN"
        " (2 * CAST(sum(_ve6) AS DECIMAL(38,0)) + count(_ve6))"
        " div (2 * CAST(count(_ve6) AS DECIMAL(38,0)))"
        " END"
    ).alias("twa_value_e6")
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            first,
            last,
            F.sum("_ve6").alias("total_value_e6"),
            twa,
        )
        .orderBy("user_id", "session_seq")
    )


@query(
    "range_join_events",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT DISTINCT user_id, epoch_us(ts) AS lo_us,
             epoch_us(ts) + 1800000000 AS hi_us
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts_us,
           round(p.value, 4) AS purchase_value, c.lo_us, c.hi_us
    FROM p LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts_us BETWEEN c.lo_us AND c.hi_us
    ORDER BY p.event_id, c.lo_us
    """,
)
def q_range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join (`operators/range_join.range_join`; VERDICT
    r5 item 3) — promo-window attribution: every purchase left-joins
    the 30-minute windows opened by that user's clicks (inclusive
    bounds, per-user equi-key), purchases outside every window kept
    NULL-padded — the path fixed this round (surrogate-id window, not
    the null-unsafe all-columns anti-join). The DuckDB oracle is the
    plain non-equi LEFT JOIN; Spark's plan is the bin equi-join
    (bin_width = the window span, so every interval explodes into ≤2
    bins) and provably no BroadcastNestedLoopJoin."""
    ev = load_table(spark, sf_dir, "events")
    if isinstance(ev.schema["ts"].dataType, T.LongType):
        us = F.expr("ts div 1000")
    else:
        us = F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
    half_hour_us = 1_800_000_000
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", us.alias("ts_us"),
        F.round("value", 4).alias("purchase_value"),
    )
    windows = (
        ev.where(F.col("event_type") == "click")
        .select("user_id", us.alias("lo_us"))
        .distinct()
        .withColumn("hi_us", F.col("lo_us") + F.lit(half_hour_us))
    )
    return range_join(
        purchases,
        windows,
        point_col="ts_us",
        lo_col="lo_us",
        hi_col="hi_us",
        on="user_id",
        bin_width=float(half_hour_us),
        how="left",
    ).orderBy("event_id", "lo_us")


@query(
    "asof_join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, max(value) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    m AS (
      SELECT p.event_id, p.user_id, p.ts, p.value,
             c.click_value, c.ts AS click_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    )
    SELECT 'base' AS kind, event_id, user_id,
           epoch_us(ts) AS ts_us,
           round(value, 4) AS purchase_value,
           round(click_value, 4) AS click_value,
           epoch_us(click_ts) AS click_ts_us
    FROM m
    UNION ALL
    SELECT 'tol' AS kind, event_id, user_id,
           epoch_us(ts) AS ts_us,
           round(value, 4) AS purchase_value,
           CASE WHEN click_ts >= ts - INTERVAL '10 minutes'
                THEN round(click_value, 4) END AS click_value,
           CASE WHEN click_ts >= ts - INTERVAL '10 minutes'
                THEN epoch_us(click_ts) END AS click_ts_us
    FROM m
    ORDER BY kind, event_id
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time as-of join (`operators/asof.asof_join`): every
    purchase event picks up the value and timestamp of that user's
    latest click at-or-before the purchase — the feature-store lookup
    pattern ("most recent signal as of the label's time", leakage-free
    by construction). Two tagged row sets (r7, VERDICT r6 item 4):
    'base' is the unbounded lookup; 'tol' runs the same join with
    ``tolerance=10 minutes`` — a match older than the staleness bound
    is nulled out (both value and matched-ts), exactly DuckDB's ASOF
    result post-filtered by ``click_ts >= ts - tol``. The right side
    is pre-deduped to one row per (user_id, ts) so both engines' tie
    handling is vacuous.

    Scale shape: ONE shuffle of |purchases|+|clicks| rows on user_id
    per variant — never a per-key range explosion (`operators/asof.py`
    docstring); the tolerance check is a map-side predicate on the
    already-matched struct, not a second join."""
    ev = load_table(spark, sf_dir, "events")

    def ts_us(c: str):
        if isinstance(ev.schema["ts"].dataType, T.LongType):
            return F.expr(f"{c} div 1000")
        return F.expr(
            "timestampdiff(MICROSECOND,"
            f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})"
        )

    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )

    if isinstance(ev.schema["ts"].dataType, T.LongType):
        tol = F.lit(10 * 60 * 1_000_000_000)  # 10 min in nanos
    else:
        tol = F.expr("INTERVAL 10 MINUTES")

    # ONE as-of join for both variants (r12): the operator documents
    # tolerance as "exactly the unbounded ASOF result post-filtered by
    # click_ts >= ts - tol" (both value and matched-ts nulled), so the
    # 'tol' rows derive from the SAME joined frame with a map-side
    # predicate instead of a second union+window shuffle of
    # |purchases|+|clicks| rows. The lazy checkpoint makes the two
    # branches read one materialization instead of re-running the
    # window, and halves the query's shuffle bytes at any scale.
    m = asof_join(
        purchases, clicks, on="user_id", ts_col="ts",
        value_cols=["click_value"], tolerance=None,
    ).localCheckpoint(eager=False)

    def variant(kind: str, with_tol: bool) -> DataFrame:
        fresh = F.col("ts_matched_asof") >= F.col("ts") - tol
        val = F.col("click_value")
        mts_us = ts_us("ts_matched_asof")
        if with_tol:
            # null-out AFTER the µs conversion: ts_us(NULL) is NULL, so
            # this is the same value as converting the nulled match
            val = F.when(fresh, val)
            mts_us = F.when(fresh, mts_us)
        return m.select(
            F.lit(kind).alias("kind"),
            "event_id",
            "user_id",
            ts_us("ts").alias("ts_us"),
            F.round("value", 4).alias("purchase_value"),
            F.round(val, 4).alias("click_value"),
            mts_us.alias("click_ts_us"),
        )

    return variant("base", False).unionByName(variant("tol", True)).orderBy(
        "kind", "event_id"
    )


@query(
    "set_ops",
    oracle="""
    SELECT 'dedupe' AS kind, o_orderkey AS key FROM (
      SELECT DISTINCT o_orderkey FROM (
        SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
        UNION ALL
        SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
      )
    )
    UNION ALL
    SELECT 'member' AS kind, c_custkey AS key FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    UNION ALL
    SELECT 'missing' AS kind, c_custkey AS key FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    ORDER BY kind, key
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 + U3 + J6 in one driver row (merged to free registry slots,
    VERDICT r4 item 1): union of two candidate streams + dedupe by id
    (`manager.py:663-665`) tagged 'dedupe', the left-semi membership
    check (`manager.py:1604-1611`) tagged 'member', and find-or-create's
    left-anti "find missing" half (`_find_or_create_entity`,
    `manager.py:1685-1710`) tagged 'missing'."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.where(F.col("o_totalprice") > 100000).select("o_orderkey")
    b = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    dedupe = (
        a.unionByName(b)
        .dropDuplicates(["o_orderkey"])
        .select(F.lit("dedupe").alias("kind"), F.col("o_orderkey").alias("key"))
    )
    cust = load_table(spark, sf_dir, "customer")
    big = orders.where(F.col("o_totalprice") > 200000).select("o_custkey")
    semi = cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        F.lit("member").alias("kind"), F.col("c_custkey").alias("key")
    )
    anti = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select(F.lit("missing").alias("kind"), F.col("c_custkey").alias("key"))
    return dedupe.unionByName(semi).unionByName(anti).orderBy("kind", "key")


@query(
    "session_predecessor",
    oracle="""
    SELECT event_id,
           lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_event_id
    FROM events
    ORDER BY event_id
    """,
)
def q_session_predecessor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13/T1 — session-chain predecessor: each event linked to the
    session's latest prior event (`_link_session_chain`,
    `manager.py:1182-1223`) — LEADS_TO edge derivation as a lag window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.select("event_id", F.lag("event_id").over(w).alias("prev_event_id"))
        .orderBy("event_id")
    )
