"""Relational surface queries — Spark SQL/DataFrame over the driver tables.

The reference has no relational operators at all (SURVEY §2.3/§2.4/§2.6
"absent" rows) — Catalyst provides scans, filters, joins, aggregations,
windows, sorts, limits and set-ops for free; these queries pin that surface
down with DuckDB oracles and serve as the BENCH headline set.

Float determinism: sums of parquet doubles are order-dependent, so every
float aggregate is rounded (2 dp for 2-decimal money inputs — accumulated
error ≪ 0.005) and every ordering uses the rounded value plus an integer
tie-break. Derived ratios divide two already-rounded values so both engines
divide identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register
from .functions import asof_join
from .model import load_events
from .session import read_parquet, register_views


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# TPC-H-shaped headline queries (scan/filter/agg/join machinery)
# --------------------------------------------------------------------------


@register(
    "rel_q1_pricing",
    headline=True,
    doc="TPC-H Q1 shape: scan-heavy grouped aggregation with pushed filter.",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                                    AS sum_qty,
               round(sum(l_extendedprice), 2)                               AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
               round(round(sum(l_quantity), 2) / count(*), 6)               AS avg_qty,
               count(*)                                                     AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def rel_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "rel_q3_top_orders",
    headline=True,
    doc="TPC-H Q3 shape: 3-way join + grouped revenue + deterministic top-10.",
    oracle="""
        SELECT o.o_orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15'
          AND l.l_shipdate  > TIMESTAMP '1998-03-15'
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
)
def rel_q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    )


@register(
    "rel_q5_region_revenue",
    headline=True,
    doc="TPC-H Q5 shape: 6-way star join, dims broadcast, grouped revenue.",
    oracle="""
        SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
    """,
)
def rel_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Windows / sorts / limits / set ops / scalar functions (SURVEY §2.6)
# --------------------------------------------------------------------------


@register(
    "rel_window_top2_orders",
    headline=True,
    doc="Window ranking: top-2 orders per customer by price (raw doubles, int tie-break).",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        ) WHERE rn <= 2
    """,
)
def rel_window_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "rel_orders_priority_stats",
    doc="DISTINCT aggregation + exact interpolated percentiles per group "
    "(consolidates rel_distinct_agg + rel_percentiles; Spark percentile ≡ "
    "DuckDB quantile_cont, bit-stable at 4 dp on both SFs).",
    oracle="""
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS n_customers,
               count(*)                  AS n_orders,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
               round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        FROM orders GROUP BY o_orderpriority
    """,
)
def rel_orders_priority_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        )
    )


@register(
    "rel_rollup",
    doc="ROLLUP grouping sets over broadcast-joined dimensions "
    "(consolidates rel_broadcast_enrich: the fact side stays un-broadcast, "
    "every dim is a BroadcastHashJoin — pinned by tests/test_plans.py).",
    oracle="""
        SELECT r.r_name, o.o_orderpriority,
               count(*) AS n_orders,
               round(sum(o.o_totalprice), 2) AS total
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY ROLLUP(r.r_name, o.o_orderpriority)
    """,
)
def rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "rel_correlated_subquery",
    doc="Correlated scalar subquery (Catalyst decorrelates it into a join): "
    "orders priced far above their customer's average. Run through the "
    "plain spark.sql surface (register_views). The 0.001 margin keeps the "
    "float comparison away from cross-engine ULP boundaries.",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey
        FROM orders o
        WHERE o.o_totalprice - 1.5 * (
            SELECT avg(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        ) > 0.001
    """,
)
def rel_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, names=("orders",))
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey
        FROM orders o
        WHERE o.o_totalprice - 1.5 * (
            SELECT avg(o2.o_totalprice) FROM orders o2
            WHERE o2.o_custkey = o.o_custkey
        ) > 0.001
        """
    )


@register(
    "rel_semi_anti_join",
    doc="Set-membership shapes in one result (consolidates rel_semi_join + "
    "rel_anti_join + rel_setops): mode='semi' = customers with a "
    "returned-flag lineitem order (EXISTS / left-semi); mode='anti' = "
    "customers with no orders at all (NOT EXISTS / left-anti); "
    "mode='except' = customers with a finished order EXCEPT the BUILDING "
    "segment (subtract). Absent join kinds in reference, free in Spark.",
    oracle="""
        SELECT 'semi' AS mode, c.c_custkey
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R'
        )
        UNION ALL
        SELECT 'anti' AS mode, c.c_custkey
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
        UNION ALL
        SELECT 'except' AS mode, custkey AS c_custkey FROM (
            SELECT DISTINCT o_custkey AS custkey FROM orders
            WHERE o_orderstatus = 'F'
            EXCEPT
            SELECT c_custkey AS custkey FROM customer
            WHERE c_mktsegment = 'BUILDING'
        )
    """,
)
def rel_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    custs = o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
    semi = (
        c.join(custs, c.c_custkey == custs.o_custkey, "left_semi")
        .select(F.lit("semi").alias("mode"), "c_custkey")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(F.lit("anti").alias("mode"), "c_custkey")
    )
    finished = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey")
    )
    exc = finished.subtract(building).select(
        F.lit("except").alias("mode"), "c_custkey"
    )
    return semi.unionByName(anti).unionByName(exc)


@register(
    "rel_datetime_agg",
    doc="Date bucketing + scalar string/date functions in one result "
    "(consolidates rel_scalar_funcs): order volume by year/month "
    "(extract + group) with upper/substr/lpad/concat/length-derived "
    "columns — both surfaces absent in the reference, free in Spark.",
    oracle="""
        SELECT CAST(year(o_orderdate) AS BIGINT)  AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               CAST(year(o_orderdate) AS VARCHAR) || '-'
                   || lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0')
                                                  AS month_label,
               count(*)                           AS n_orders,
               round(sum(o_totalprice), 2)        AS total,
               min(upper(substr(o_orderpriority, 1, 8))) AS top_priority,
               CAST(min(length(o_orderpriority)) AS BIGINT) AS min_prio_len
        FROM orders GROUP BY 1, 2, 3
    """,
)
def rel_datetime_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    yr = F.year("o_orderdate").cast("long")
    mo = F.month("o_orderdate").cast("long")
    return o.groupBy(
        yr.alias("yr"),
        mo.alias("mo"),
        F.concat(
            yr.cast("string"), F.lit("-"), F.lpad(mo.cast("string"), 2, "0")
        ).alias("month_label"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.min(F.upper(F.substring("o_orderpriority", 1, 8))).alias(
            "top_priority"
        ),
        F.min(F.length("o_orderpriority")).cast("long").alias("min_prio_len"),
    )


# --------------------------------------------------------------------------
# Events-table statistics & windows (SURVEY A1-A4, W7)
# --------------------------------------------------------------------------


@register(
    "rel_events_stats",
    doc="incrStat per-event-type counters (A1, CorrelationEngine.php:790-796) "
    "+ semi-structured JSON payload access (consolidates rel_props_json: "
    "n_big_k / big_k_total are conditional aggregates over props->'$.k' ≥ 50, "
    "the reference's schemaless Event payload as a JSON column) + the "
    "recent-events ring — kind='recent' rows are the last-100 event log "
    "(A4, Library/EventLog.php:13-31; was rel_recent_events, consolidated "
    "to free a driver-window slot) + the value histograms (A3, "
    "Library/Histogram.php:8-43) — kind='linear50' = fixed-width /50 "
    "buckets, kind='pow2' = the reference's exact power-of-two bucket "
    "shape (inclusive upper bounds, -1 = overflow); was "
    "rel_events_histogram, consolidated to free the slot for "
    "pipe_lm_score.",
    oracle="""
        SELECT 'stats' AS kind, event_type,
               CAST(NULL AS BIGINT) AS event_id,
               CAST(NULL AS TIMESTAMP) AS ts,
               CAST(NULL AS BIGINT) AS bucket,
               count(*) AS seen,
               count(DISTINCT user_id) AS n_users,
               round(sum(value), 2) AS value_total,
               CAST(count(DISTINCT CASE
                   WHEN CAST(props->>'$.k' AS BIGINT) >= 50
                   THEN CAST(props->>'$.k' AS BIGINT) END) AS BIGINT) AS n_big_k,
               CAST(sum(CASE
                   WHEN CAST(props->>'$.k' AS BIGINT) >= 50
                   THEN CAST(props->>'$.k' AS BIGINT) END) AS BIGINT) AS big_k_total
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'recent' AS kind, event_type, event_id, ts::TIMESTAMP AS ts,
               CAST(NULL AS BIGINT) AS bucket,
               CAST(NULL AS BIGINT) AS seen, CAST(NULL AS BIGINT) AS n_users,
               CAST(NULL AS DOUBLE) AS value_total,
               CAST(NULL AS BIGINT) AS n_big_k, CAST(NULL AS BIGINT) AS big_k_total
        FROM (
            -- order by the CAST ts: on a TIMESTAMP(NANOS) table the raw
            -- column ranks by nanoseconds while Spark ranks by the
            -- microsecond-floored value — same-microsecond ties at the
            -- ring cutoff would pick different rows
            SELECT event_type, event_id, ts FROM events
            ORDER BY ts::TIMESTAMP DESC, event_id DESC LIMIT 100
        )
        UNION ALL
        SELECT 'linear50' AS kind, CAST(NULL AS VARCHAR) AS event_type,
               CAST(NULL AS BIGINT) AS event_id,
               CAST(NULL AS TIMESTAMP) AS ts,
               CAST(floor(value / 50) AS BIGINT) AS bucket,
               count(*) AS seen,
               CAST(NULL AS BIGINT) AS n_users,
               CAST(NULL AS DOUBLE) AS value_total,
               CAST(NULL AS BIGINT) AS n_big_k, CAST(NULL AS BIGINT) AS big_k_total
        FROM events GROUP BY 5
        UNION ALL
        SELECT 'pow2' AS kind, CAST(NULL AS VARCHAR) AS event_type,
               CAST(NULL AS BIGINT) AS event_id,
               CAST(NULL AS TIMESTAMP) AS ts,
               CAST(CASE
                 WHEN value <= 1 THEN 1 WHEN value <= 2 THEN 2
                 WHEN value <= 4 THEN 4 WHEN value <= 8 THEN 8
                 WHEN value <= 16 THEN 16 WHEN value <= 32 THEN 32
                 WHEN value <= 64 THEN 64 WHEN value <= 128 THEN 128
                 WHEN value <= 256 THEN 256 WHEN value <= 512 THEN 512
                 ELSE -1 END AS BIGINT) AS bucket,
               count(*) AS seen,
               CAST(NULL AS BIGINT) AS n_users,
               CAST(NULL AS DOUBLE) AS value_total,
               CAST(NULL AS BIGINT) AS n_big_k, CAST(NULL AS BIGINT) AS big_k_total
        FROM events GROUP BY 5
    """,
)
def rel_events_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    big_k = F.when(k >= 50, k)
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("seen"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("value_total"),
        F.countDistinct(big_k).alias("n_big_k"),
        F.sum(big_k).cast("long").alias("big_k_total"),
    ).select(
        F.lit("stats").alias("kind"), "event_type",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("long").alias("bucket"),
        "seen", "n_users", "value_total", "n_big_k", "big_k_total",
    )
    recent = (
        e.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(100)
        .select(
            F.lit("recent").alias("kind"), "event_type", "event_id", "ts",
            F.lit(None).cast("long").alias("bucket"),
            F.lit(None).cast("long").alias("seen"),
            F.lit(None).cast("long").alias("n_users"),
            F.lit(None).cast("double").alias("value_total"),
            F.lit(None).cast("long").alias("n_big_k"),
            F.lit(None).cast("long").alias("big_k_total"),
        )
    )

    def _hist_rows(kind: str, bucket_col):
        return (
            e.groupBy(bucket_col.cast("long").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("seen"))
            .select(
                F.lit(kind).alias("kind"),
                F.lit(None).cast("string").alias("event_type"),
                F.lit(None).cast("long").alias("event_id"),
                F.lit(None).cast("timestamp").alias("ts"),
                "bucket", "seen",
                F.lit(None).cast("long").alias("n_users"),
                F.lit(None).cast("double").alias("value_total"),
                F.lit(None).cast("long").alias("n_big_k"),
                F.lit(None).cast("long").alias("big_k_total"),
            )
        )

    linear = _hist_rows("linear50", F.floor(F.col("value") / 50))
    pow2_bucket = F.lit(-1)
    for b in [512, 256, 128, 64, 32, 16, 8, 4, 2, 1]:
        pow2_bucket = F.when(F.col("value") <= b, F.lit(b)).otherwise(pow2_bucket)
    pow2 = _hist_rows("pow2", pow2_bucket)
    return stats.unionByName(recent).unionByName(linear).unionByName(pow2)


@register(
    "rel_events_eps",
    doc="EPS counter family (A2/W7, consolidates rel_events_eps + "
    "rel_events_eps_sliding + rel_events_load): kind='tumble_1h' = tumbling "
    "event-time windows; kind='slide_1h_15m' = 1 h windows every 15 min (the "
    "Counter ring buffer's overlapping horizons); kind='load_*' = events/s "
    "over the trailing 60/900/3600 s of the stream — the Counter::calcLoad "
    "triple (CorrelationEngine.php:802-813). eps = n_events / window seconds.",
    oracle="""
        WITH hi AS (SELECT max(ts::TIMESTAMP) AS h FROM events),
        g AS (
            SELECT unnest(generate_series(
                date_trunc('hour', (SELECT min(ts::TIMESTAMP) FROM events)) - INTERVAL 45 MINUTE,
                (SELECT max(ts::TIMESTAMP) FROM events),
                INTERVAL 15 MINUTE
            )) AS win_start
        )
        SELECT 'tumble_1h' AS kind,
               date_trunc('hour', ts::TIMESTAMP) AS win_start,
               count(*) AS n_events,
               round(count(*) / 3600.0, 6) AS eps
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'slide_1h_15m' AS kind, g.win_start,
               count(e.event_id) AS n_events,
               round(count(e.event_id) / 3600.0, 6) AS eps
        FROM g JOIN events e
          ON e.ts::TIMESTAMP >= g.win_start
         AND e.ts::TIMESTAMP < g.win_start + INTERVAL 1 HOUR
        GROUP BY g.win_start
        UNION ALL
        SELECT 'load_' || sec || 's' AS kind,
               h - to_seconds(sec) AS win_start,
               CAST(sum(CASE WHEN ts::TIMESTAMP > h - to_seconds(sec) THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
               round(sum(CASE WHEN ts::TIMESTAMP > h - to_seconds(sec) THEN 1 ELSE 0 END) / (sec * 1.0), 6) AS eps
        FROM events, hi, (VALUES (60), (900), (3600)) AS horizons(sec)
        GROUP BY h, sec
    """,
)
def rel_events_eps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    tumble = (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.lit("tumble_1h").alias("kind"),
            F.col("w.start").alias("win_start"),
            "n_events",
            F.round(F.col("n_events") / 3600.0, 6).alias("eps"),
        )
    )
    slide = (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.lit("slide_1h_15m").alias("kind"),
            F.col("w.start").alias("win_start"),
            "n_events",
            F.round(F.col("n_events") / 3600.0, 6).alias("eps"),
        )
    )
    # trailing-horizon load: one pass over events against the broadcast max ts
    hi = e.agg(F.max("ts").alias("h"))
    j = e.crossJoin(F.broadcast(hi))

    def _n(seconds: int):
        cutoff = F.col("h") - F.make_interval(secs=F.lit(float(seconds)))
        return F.sum(F.when(F.col("ts") > cutoff, 1).otherwise(0)).alias(
            f"n{seconds}"
        )

    agg = j.groupBy("h").agg(_n(60), _n(900), _n(3600))
    # ONE explode over the single aggregate row instead of three selects
    # unioned — selecting per-horizon would embed (and absent exchange
    # reuse, execute) the full events aggregate three times
    loads = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"load_{sec}s").alias("kind"),
                        (
                            F.col("h")
                            - F.make_interval(secs=F.lit(float(sec)))
                        ).alias("win_start"),
                        F.col(f"n{sec}").alias("n_events"),
                        F.round(F.col(f"n{sec}") / float(sec), 6).alias(
                            "eps"
                        ),
                    )
                    for sec in (60, 900, 3600)
                ]
            )
        ).alias("l")
    ).select("l.kind", "l.win_start", "l.n_events", "l.eps")
    return tumble.unionByName(slide).unionByName(loads)


@register(
    "rel_session_window",
    doc="Native session_window sessionization (W6 built-in path; the CEP "
    "gap-session compiler is the rule-level equivalent). Boundary note: "
    "session_window starts a NEW session when gap >= size (intervals are "
    "half-open), vs the CEP timeout's strict >.",
    oracle="""
        WITH s AS (
            SELECT user_id, event_id, ts::TIMESTAMP AS ts,
                   CASE WHEN lag(ts::TIMESTAMP) OVER win IS NULL
                             OR ts::TIMESTAMP - lag(ts::TIMESTAMP) OVER win >= INTERVAL 6 HOUR
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            -- ts::TIMESTAMP in the window ORDER BY: DuckDB binds a bare
            -- 'ts' to the BASE nanosecond column (not the select alias),
            -- which orders same-microsecond ties differently than Spark
            WINDOW win AS (
                PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
            )
        ), g AS (
            SELECT s.*, sum(new_sess) OVER (
                PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
            ) AS sess
            FROM s
        )
        SELECT user_id, min(ts) AS sess_start, count(*) AS n_events
        FROM g GROUP BY user_id, sess
    """,
)
def rel_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("sess_start"), "n_events")
    )


@register(
    "rel_asof_last_signup",
    doc="As-of join (absent in reference AND in Spark SQL): for each purchase, "
    "the most recent prior signup of the same user — union + running-max window, "
    "one shuffle, no join node.",
    oracle="""
        SELECT event_id, user_id, ts, asof_ts FROM (
            SELECT event_id, user_id, ts::TIMESTAMP AS ts, event_type,
                   -- ts::TIMESTAMP in the ORDER BY: a bare 'ts' binds to
                   -- the base (nanosecond) column, ordering ties
                   -- differently than Spark's microsecond view
                   max(CASE WHEN event_type = 'signup' THEN ts::TIMESTAMP END) OVER (
                       PARTITION BY user_id
                       ORDER BY ts::TIMESTAMP, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS asof_ts
            FROM events
            WHERE event_type IN ('signup', 'purchase')
        ) WHERE event_type = 'purchase'
    """,
)
def rel_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases,
        signups,
        on="ts",
        by="user_id",
        right_value_cols=("ts",),
        right_prefix="asof_",
    ).select("event_id", "user_id", "ts", "asof_ts")
