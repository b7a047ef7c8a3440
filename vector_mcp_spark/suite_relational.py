"""Declared relational queries over the TPC-H-ish star schema + events.

The reference has no relational surface (SURVEY.md §2.4) — Spark gets
joins/grouping/windows natively; these queries exist to pin that capability
to the oracle and to exercise the scan→shuffle→agg paths the vector
operators build on. Plans to care about: partial aggregation before the
shuffle (Q1), broadcast of the small dimension chain (revenue-by-nation),
window per-group top-k.

Float policy: aggregate in double, ROUND(2..6) on both sides; group keys and
counts are exact so rounding only ever touches the aggregated measures.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_mcp_spark.suite import load, register

# -- TPC-H Q1-shaped pricing summary ------------------------------------------

_Q1_CUTOFF = "1998-09-02 00:00:00"

_TPCH_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1_pricing_summary", _TPCH_Q1_ORACLE, "relational")
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# -- revenue by nation: 4-way join with broadcast dimensions ------------------

_REV_ORACLE = """
SELECT n.n_name AS nation, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY revenue DESC, nation ASC
LIMIT 5
"""


@register("top_revenue_nations", _REV_ORACLE, "relational")
def q_top_revenue_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("nation").asc())
        .limit(5)
    )


# -- events: tumbling daily window aggregation (batch twin of the
#    Structured Streaming ingest in vector_mcp_spark.streaming) ---------------

_EVENTS_DAILY_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       count(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value,
       ROUND(AVG(value), 6) AS avg_value
FROM events
GROUP BY date_trunc('day', ts), event_type
"""


@register("events_daily_windows", _EVENTS_DAILY_ORACLE, "relational", "streaming-twin")
def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), F.col("event_type")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


# -- events: per-type top-3 users by total value (window per-group top-k) -----

_EVENTS_TOPU_ORACLE = """
SELECT event_type, user_id, total_value, CAST(rnk AS INTEGER) AS rank FROM (
  SELECT event_type, user_id, ROUND(SUM(value), 4) AS total_value,
         row_number() OVER (
           PARTITION BY event_type ORDER BY ROUND(SUM(value), 4) DESC, user_id ASC
         ) AS rnk
  FROM events GROUP BY event_type, user_id
) WHERE rnk <= 3
"""


@register("events_top_users", _EVENTS_TOPU_ORACLE, "relational")
def q_events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type", "user_id").agg(F.round(F.sum("value"), 4).alias("total_value"))
    w = Window.partitionBy("event_type").orderBy(F.col("total_value").desc(), F.col("user_id").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("event_type", "user_id", "total_value", "rank")
    )


# -- Structured Streaming windowed aggregation (executed, not just twinned) --

# The query RUNS the streaming plan (availableNow trigger → memory sink) and
# returns the sink table; the oracle is the batch-twin SQL. Windows are
# 1-day tumbling and complete-mode output, so end-of-stream watermark
# holdback doesn't drop rows and streaming == batch exactly.
_STREAM_WIN_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       CAST(date_trunc('day', ts) + INTERVAL 1 DAY AS TIMESTAMP) AS window_end,
       event_type,
       count(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value,
       ROUND(AVG(value), 6) AS avg_value
FROM events GROUP BY 1, 2, 3
"""

_STREAM_SINK_SEQ = iter(range(1, 1_000_000))


@register("streaming_windowed_events", _STREAM_WIN_ORACLE, "streaming")
def q_streaming_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from vector_mcp_spark.streaming.ingest import (
        read_event_stream,
        run_stream_to_memory,
        windowed_event_counts,
    )

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    clean_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".tmp", f"events_{sf_tag}")
    clean_dir = os.path.abspath(clean_dir)
    # one-time µs-timestamp re-write (the raw fixture is TIMESTAMP(NANOS),
    # which the streaming parquet source can't read)
    marker = os.path.join(clean_dir, "_SUCCESS")
    if not os.path.exists(marker):
        load(spark, sf_dir, "events").write.mode("overwrite").parquet(clean_dir)
    stream = read_event_stream(spark, clean_dir)
    windowed = windowed_event_counts(stream, "1 day", watermark="2 days")
    name = f"suite_stream_win_{next(_STREAM_SINK_SEQ)}"
    got = run_stream_to_memory(windowed, name, output_mode="complete")
    return got.select(
        "window_start", "window_end", "event_type", "n_events", "total_value", "avg_value"
    )


# -- grouping-sets rollup over events (hypertable-rollup-style) ---------------

_EVENTS_ROLLUP_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       count(*) AS n_events, ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY ROLLUP(day, event_type)
"""


@register("events_rollup", _EVENTS_ROLLUP_ORACLE, "relational")
def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.rollup(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
    )


# -- per-user running totals (general window functions) -----------------------

_EVENTS_RUNNING_ORACLE = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
FROM events
"""


@register("events_user_running_total", _EVENTS_RUNNING_ORACLE, "relational")
def q_events_user_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


# -- sliding-window batch twin (same expressions as the streaming plan) -------

_EVENTS_SLIDING_ORACLE = """
WITH offs AS (SELECT unnest([0, 1]) AS o)
SELECT CAST(date_trunc('day', ts) - o * INTERVAL 1 DAY AS TIMESTAMP) AS window_start,
       CAST(date_trunc('day', ts) - o * INTERVAL 1 DAY + INTERVAL 2 DAY AS TIMESTAMP) AS window_end,
       event_type, count(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value, ROUND(AVG(value), 6) AS avg_value
FROM events CROSS JOIN offs
GROUP BY 1, 2, 3
"""


@register("events_sliding_windows", _EVENTS_SLIDING_ORACLE, "relational", "streaming-twin")
def q_events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.streaming.ingest import windowed_event_counts

    ev = load(spark, sf_dir, "events")
    # same operator as the streaming plan — watermark is a no-op in batch
    return windowed_event_counts(ev, "2 days", "1 day", watermark="3 days")


# -- set operations (§2.4: Spark-native, pinned to the oracle) ----------------

_SETOPS_ORACLE = """
SELECT doc_id, 'both' AS src FROM (
  SELECT doc_id FROM documents WHERE lang = 'en'
  INTERSECT
  SELECT doc_id FROM documents WHERE n_chars >= 200
)
UNION ALL
SELECT doc_id, 'en_only' AS src FROM (
  SELECT doc_id FROM documents WHERE lang = 'en'
  EXCEPT
  SELECT doc_id FROM documents WHERE n_chars >= 200
)
"""


@register("set_ops_intersect_except", _SETOPS_ORACLE, "relational")
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    en = docs.where(F.col("lang") == "en").select("doc_id")
    big = docs.where(F.col("n_chars") >= 200).select("doc_id")
    both = en.intersect(big).withColumn("src", F.lit("both"))
    only = en.exceptAll(big).distinct().withColumn("src", F.lit("en_only"))
    return both.unionByName(only)


# -- as-of join: latest event per (user, day-noon probe) ----------------------

# Probes are each user's active days at 12:00; the operator attaches the most
# recent event at-or-before the probe. Oracle mirrors the inclusive backward
# semantics + (ts DESC, event_id DESC) tie-break with a row_number join.
_ASOF_ORACLE = """
WITH q AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('day', ts) + INTERVAL 12 HOUR AS TIMESTAMP) AS qts
  FROM events
), j AS (
  SELECT q.user_id, q.qts, e.ts, e.event_id, e.value,
         row_number() OVER (
           PARTITION BY q.user_id, q.qts ORDER BY e.ts DESC, e.event_id DESC
         ) AS rn
  FROM q JOIN events e ON q.user_id = e.user_id AND e.ts <= q.qts
)
SELECT user_id, qts, ts AS asof_ts, event_id AS asof_event_id,
       ROUND(value, 4) AS asof_value
FROM j WHERE rn = 1
"""


@register("asof_latest_event", _ASOF_ORACLE, "temporal")
def q_asof_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.temporal import asof_join

    ev = load(spark, sf_dir, "events")
    probes = ev.select(
        "user_id",
        (F.date_trunc("day", F.col("ts")) + F.expr("INTERVAL 12 HOURS")).alias("qts"),
    ).distinct()
    out = asof_join(
        probes,
        ev.select("user_id", "ts", "event_id", "value"),
        on=["user_id"],
        left_ts="qts",
        right_ts="ts",
        right_cols=["event_id", "value"],
        tiebreak="event_id",
    )
    return out.select(
        "user_id", "qts", "asof_ts", "asof_event_id",
        F.round("asof_value", 4).alias("asof_value"),
    )


# -- range join: events within ±12 h of each probe ----------------------------

_RANGE_ORACLE = """
WITH q AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('day', ts) + INTERVAL 12 HOUR AS TIMESTAMP) AS qts
  FROM events
)
SELECT q.user_id, q.qts,
       count(e.ts) AS n_in_range,
       ROUND(COALESCE(SUM(e.value), 0), 4) AS sum_value
FROM q LEFT JOIN events e
  ON q.user_id = e.user_id
 AND e.ts BETWEEN q.qts - INTERVAL 12 HOUR AND q.qts + INTERVAL 12 HOUR
GROUP BY q.user_id, q.qts
"""


@register("range_join_event_counts", _RANGE_ORACLE, "temporal")
def q_range_join_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.temporal import range_join_count

    ev = load(spark, sf_dir, "events")
    probes = ev.select(
        "user_id",
        (F.date_trunc("day", F.col("ts")) + F.expr("INTERVAL 12 HOURS")).alias("qts"),
    ).distinct()
    out = range_join_count(
        probes, ev, on=["user_id"], left_ts="qts", right_ts="ts",
        before_s=43200, after_s=43200, value_col="value",
    )
    return out.select(
        "user_id", "qts", "n_in_range", F.round("sum_value", 4).alias("sum_value")
    )


# -- TPC-H Q3-shaped shipping priority (3-way join, selective filters) --------

_Q3_CUTOFF = "1996-03-15 00:00:00"

_TPCH_Q3_ORACLE = f"""
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
  AND l.l_shipdate > TIMESTAMP '{_Q3_CUTOFF}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


@register("tpch_q3_shipping_priority", _TPCH_Q3_ORACLE, "relational")
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit(_Q3_CUTOFF).cast("timestamp")
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    # filters sit above the scans (pushed to parquet); the filtered customer
    # side broadcasts so only lineitem⋈orders shuffles
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# -- exact interpolated percentiles per event type ----------------------------

# Spark `percentile` and DuckDB `quantile_cont` share the (n-1)*p linear
# interpolation; 6-dp rounding absorbs last-bit float noise.
_QUANTILES_ORACLE = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95,
       ROUND(MIN(value), 4) AS min_value,
       ROUND(MAX(value), 4) AS max_value
FROM events GROUP BY event_type
"""


@register("events_value_quantiles", _QUANTILES_ORACLE, "relational")
def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
    )


# -- pivot: daily value matrix by event type ----------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'click'), 0), 4) AS click,
       ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'error'), 0), 4) AS error,
       ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'purchase'), 0), 4) AS purchase,
       ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'signup'), 0), 4) AS signup,
       ROUND(COALESCE(SUM(value) FILTER (WHERE event_type = 'view'), 0), 4) AS view
FROM events GROUP BY 1
"""


@register("events_daily_pivot", _PIVOT_ORACLE, "relational")
def q_events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # explicit value list keeps the schema static (no extra distinct pass)
    pivoted = (
        ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .pivot("event_type", list(_EVENT_TYPES))
        .sum("value")
    )
    return pivoted.select(
        "day", *[F.round(F.coalesce(F.col(t), F.lit(0.0)), 4).alias(t) for t in _EVENT_TYPES]
    )


# -- sessionization via native session_window (30-min gap) --------------------

# Spark's session_window is half-open: an event exactly gap after the previous
# one starts a NEW session, so the oracle's new-session flag uses >=. The
# window's end is last_event_ts + gap on both sides.
_SESSION_ORACLE = """
WITH flags AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, new_sess DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_no
  FROM flags
)
SELECT user_id,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
       count(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM sess GROUP BY user_id, session_no
"""


@register("events_sessionization", _SESSION_ORACLE, "relational", "streaming-twin")
def q_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


# -- multi-distinct daily aggregation ----------------------------------------

_DISTINCT_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT event_type) AS n_types,
       count(*) AS n_events
FROM events GROUP BY 1
"""


@register("events_distinct_daily", _DISTINCT_ORACLE, "relational")
def q_events_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.count("*").alias("n_events"),
    )


# -- EXISTS / semi-join aggregation (TPC-H Q4-shaped) -------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
GROUP BY o_orderpriority
"""


@register("late_orders_by_priority", _Q4_ORACLE, "relational")
def q_late_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


# -- trailing time-range window frame (RANGE BETWEEN INTERVAL) ----------------

# Spark RANGE frames need a numeric ordering key → order by unix_micros(ts);
# peers (equal micros) are in-frame on both engines.
_TRAILING_ORACLE = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4) AS trailing_1h_value
FROM events
"""


@register("events_trailing_1h_window", _TRAILING_ORACLE, "relational")
def q_events_trailing_1h_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id", "user_id", F.round(F.sum("value").over(w), 4).alias("trailing_1h_value")
    )


# -- UDAF extension point: grouped-agg pandas UDF (median abs deviation) ------

# The reference has no UDF/UDAF surface (§2.4); Spark's extension point is a
# GROUPED_AGG pandas UDF. numpy's median (midpoint interpolation) matches
# DuckDB's built-in mad() exactly.
_MAD_ORACLE = """
SELECT event_type, ROUND(CAST(mad(value) AS DOUBLE), 6) AS mad_value
FROM events GROUP BY event_type
"""


@register("events_mad_udaf", _MAD_ORACLE, "relational", "udaf")
def q_events_mad_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mad(v: pd.Series) -> float:
        m = np.median(v)
        return float(np.median(np.abs(v - m)))

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.round(mad("value"), 6).alias("mad_value"))


# -- JSON property extraction (native from_json over the props column) --------

_JSON_EXTRACT_ORACLE = """
SELECT event_type,
       ROUND(AVG(CAST(json_extract(props, '$.k') AS INTEGER)), 6) AS avg_k,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


@register("events_json_extract", _JSON_EXTRACT_ORACLE, "relational", "json")
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.from_json("props", "k INT").getField("k")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 6).alias("avg_k"), F.count("*").alias("n_events")
    )


# -- UDTF extension point: JSON props exploded to rows via LATERAL ------------

_UDTF_SEQ = iter(range(1, 1_000_000))

_PARSE_PROPS_ORACLE = """
SELECT event_id, 'k' AS key, CAST(json_extract(props, '$.k') AS VARCHAR) AS value
FROM events WHERE props IS NOT NULL
"""


@register("udtf_parse_props", _PARSE_PROPS_ORACLE, "relational", "udtf")
def q_udtf_parse_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) exploding a JSON column into
    (event_id, key, value) rows through a LATERAL correlated call — the
    third Spark extension point (scalar pandas UDF, grouped-agg UDAF, UDTF)
    the reference has no equivalent of (SURVEY §2.4)."""
    from pyspark.sql.functions import udtf

    # useArrow=False: the Arrow UDTF path measured ~10x SLOWER than the
    # pickle batch path at sf0.1 (per-row conversion overhead in Spark 4.1)
    @udtf(returnType="event_id bigint, key string, value string")
    class ParseProps:
        def eval(self, event_id, props):
            import json as _json

            if props is not None:
                for key, val in _json.loads(props).items():
                    yield event_id, key, _json.dumps(val)

    name = f"parse_props_{next(_UDTF_SEQ)}"
    spark.udtf.register(name, ParseProps)
    from vector_mcp_spark.operators.partition import spread

    # spread: a single-partition scan feeds ONE Python UDTF worker; the
    # repartition fans the lateral call out to the whole worker pool
    ev = spread(load(spark, sf_dir, "events"))
    view = f"events_udtf_{name}"
    ev.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT p.event_id, p.key, p.value FROM {view}, LATERAL {name}(event_id, props) p"
    )


# -- skew-proof exact distinct count (salted two-phase) -----------------------

_SALTED_DISTINCT_ORACLE = """
SELECT event_type, count(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type
"""


@register("events_salted_distinct", _SALTED_DISTINCT_ORACLE, "relational", "skew")
def q_events_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.skew import salted_count_distinct

    ev = load(spark, sf_dir, "events")
    return salted_count_distinct(ev, ["event_type"], "user_id", n_salts=8)


# -- lead/lag: inter-arrival gaps per user ------------------------------------

_INTERARRIVAL_ORACLE = """
SELECT event_type,
       ROUND(AVG(gap_s), 6) AS avg_gap_s,
       count(*) AS n_gaps
FROM (
  SELECT event_type,
         CAST(date_diff('microsecond',
              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS DOUBLE)
           / 1000000.0 AS gap_s
  FROM events
)
WHERE gap_s IS NOT NULL
GROUP BY event_type
"""


@register("events_interarrival", _INTERARRIVAL_ORACLE, "relational")
def q_events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).cast("double") / 1e6
    return (
        ev.select("event_type", gap.alias("gap_s"))
        .where(F.col("gap_s").isNotNull())
        .groupBy("event_type")
        .agg(F.round(F.avg("gap_s"), 6).alias("avg_gap_s"), F.count("*").alias("n_gaps"))
    )


# -- CUBE grouping sets (all 4 combinations of (event_type, dow)) -------------

_CUBE_ORACLE = """
SELECT event_type, CAST(isodow(ts) AS INTEGER) AS dow,
       count(*) AS n_events, ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY CUBE(event_type, CAST(isodow(ts) AS INTEGER))
"""


@register("events_cube", _CUBE_ORACLE, "relational")
def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # Spark dayofweek is 1=Sunday; ISO dow = Mon 1..Sun 7
    iso_dow = ((F.dayofweek("ts") + 5) % 7 + 1).cast("int")
    return ev.cube("event_type", iso_dow.alias("dow")).agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value")
    )


# -- NOT EXISTS / anti-join: customers with no 1995 orders --------------------

_ANTI_CUTOFF = "1996-01-01 00:00:00"

_ANTI_ORACLE = f"""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate < TIMESTAMP '{_ANTI_CUTOFF}'
)
GROUP BY c_mktsegment
"""


@register("customers_without_orders", _ANTI_ORACLE, "relational")
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    early = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit(_ANTI_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(early, cust.c_custkey == early.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


# -- decimal arithmetic (exact sums, no float rounding in the compare) --------

# The aggregation is exact DECIMAL(18,2) arithmetic on both engines; the
# result is emitted as VARCHAR because the driver's pandas canonicalizer
# hashes Decimal objects and float64 differently (r4 red row) — stringifying
# preserves exactness while giving both sides the identical byte sequence.
_DECIMAL_ORACLE = """
SELECT l_returnflag,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS total_price,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS VARCHAR) AS total_qty
FROM lineitem GROUP BY l_returnflag
"""


@register("lineitem_decimal_totals", _DECIMAL_ORACLE, "relational", "decimal")
def q_lineitem_decimal_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("string")
        .alias("total_price"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .cast("string")
        .alias("total_qty"),
    )


# -- array aggregation: per-user sorted distinct event types ------------------

# The set is emitted as a comma-joined string (not array<string>): the driver
# canonicalizer sorts result cells with pandas and cannot hash list cells.
_ARRAYAGG_ORACLE = """
SELECT user_id,
       list_aggregate(list_sort(list_distinct(list(event_type))), 'string_agg', ',') AS types,
       count(*) AS n_events
FROM events GROUP BY user_id
"""


@register("user_event_type_sets", _ARRAYAGG_ORACLE, "relational")
def q_user_event_type_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types"),
        F.count("*").alias("n_events"),
    )


# -- TPC-H Q14-shaped promo revenue: selective fact ⋈ broadcast dim -----------

_PROMO_ORACLE = """
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1995-09-01' AND l.l_shipdate < DATE '1995-10-01'
"""


@register("promo_revenue", _PROMO_ORACLE, "relational")
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: a date-pruned fact scan joined to a broadcast dim —
    the filter reaches the parquet scan (PushedFilters) and the join never
    shuffles the fact side (BroadcastHashJoin; part is the small side)."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01")) & (F.col("l_shipdate") < F.lit("1995-10-01"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return j.agg(
        F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct"),
        F.count("*").alias("n_lines"),
    )


# -- custom stateful streaming op under a REAL oracle -------------------------
#
# applyInPandasWithState keeps per-user lifetime counters across
# micro-batches; its FINAL state per user is definitionally the full-history
# aggregate, so a plain batch GROUP BY oracles the stateful machinery
# end-to-end (state carry, merge order, eviction-free path). The update-mode
# memory sink holds one row per (user, micro-batch); n_events is strictly
# monotone per user, so max-n_events row = final state.

_USER_RUNNING_STATS_ORACLE = """
SELECT user_id, count(*) AS n_events, ROUND(SUM(value), 4) AS total_value,
       CAST(MAX(ts) AS TIMESTAMP) AS last_ts
FROM events GROUP BY user_id
"""


@register("streaming_user_running_stats", _USER_RUNNING_STATS_ORACLE, "streaming")
def q_streaming_user_running_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspark.sql import Window

    from vector_mcp_spark.streaming.ingest import (
        read_event_stream,
        run_stream_to_memory,
        running_user_stats,
    )

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    clean_dir = os.path.abspath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".tmp", f"events_{sf_tag}")
    )
    if not os.path.exists(os.path.join(clean_dir, "_SUCCESS")):
        load(spark, sf_dir, "events").write.mode("overwrite").parquet(clean_dir)
    stream = read_event_stream(spark, clean_dir)
    got = run_stream_to_memory(
        running_user_stats(stream),
        f"suite_stream_userstats_{next(_STREAM_SINK_SEQ)}",
        output_mode="update",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        got.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "n_events", "total_value", "last_ts")
    )


# -- KMV distinct-count sketch (deterministic approximate cardinality) --------
#
# approx_count_distinct (HLL++) can't be oracled across engines; KMV keeps
# the k smallest sha256 hashes, so DuckDB replays the ESTIMATE bit-for-bit.
# Exact distinct rides along to show the accuracy envelope in the same row.

_KMV_K = 64
_KMV_DENOM = float(2**60)

_KMV_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substring(sha256(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM events
),
ranked AS (
  SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
  FROM hashed
),
kept AS (
  SELECT event_type, count(*) AS n_kept, max(h) AS kth
  FROM ranked WHERE rn <= {_KMV_K} GROUP BY event_type
),
ex AS (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct FROM events GROUP BY event_type
)
SELECT k.event_type, CAST(k.n_kept AS INTEGER) AS n_kept,
       CAST(CASE WHEN k.n_kept < {_KMV_K} THEN k.n_kept
                 ELSE ROUND({_KMV_K - 1}.0 / (k.kth / {_KMV_DENOM!r})) END AS BIGINT) AS est_distinct,
       e.exact_distinct
FROM kept k JOIN ex e USING (event_type)
"""


@register("events_kmv_distinct", _KMV_ORACLE, "relational", "sketch")
def q_events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.sketches import kmv_distinct

    ev = load(spark, sf_dir, "events")
    est = kmv_distinct(ev, ["event_type"], "user_id", k=_KMV_K)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


# Mergeability is the property that matters at 100 TB: keep per-day sketches,
# answer the all-time distinct question by merging them — never re-scan raw
# data. The merge is LOSSLESS (any hash in the global k-min set is in its own
# partition's k-min set), so merged_est must equal direct_est bit-for-bit;
# the oracle replays both paths and the driver hash proves the equality.

_KMV_MERGE_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST('0x' || substring(sha256(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM events
),
daily AS (
  SELECT event_type, day, h,
         row_number() OVER (PARTITION BY event_type, day ORDER BY h ASC) AS rn
  FROM hashed
),
pooled AS (
  SELECT DISTINCT event_type, h FROM daily WHERE rn <= {_KMV_K}
),
merged AS (
  SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
  FROM pooled
),
mk AS (
  SELECT event_type, count(*) AS n_kept, max(h) AS kth
  FROM merged WHERE rn <= {_KMV_K} GROUP BY event_type
),
direct AS (
  SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
  FROM (SELECT DISTINCT event_type, h FROM hashed)
),
dk AS (
  SELECT event_type, count(*) AS n_kept, max(h) AS kth
  FROM direct WHERE rn <= {_KMV_K} GROUP BY event_type
)
SELECT m.event_type, CAST(m.n_kept AS INTEGER) AS n_kept,
       CAST(CASE WHEN m.n_kept < {_KMV_K} THEN m.n_kept
                 ELSE ROUND({_KMV_K - 1}.0 / (m.kth / {_KMV_DENOM!r})) END AS BIGINT) AS merged_est,
       CAST(CASE WHEN d.n_kept < {_KMV_K} THEN d.n_kept
                 ELSE ROUND({_KMV_K - 1}.0 / (d.kth / {_KMV_DENOM!r})) END AS BIGINT) AS direct_est
FROM mk m JOIN dk d USING (event_type)
"""


# -- count-min sketch (frequency twin of KMV; deterministic, replayable) ------

_CMS_D = 4
_CMS_W = 256

_CMS_ORACLE = f"""
WITH pr AS (
  SELECT user_id, r,
         CAST(CAST('0x' || substring(sha256(CAST(user_id AS VARCHAR) || '|cms' || CAST(r AS VARCHAR)), 1, 15) AS BIGINT)
              % {_CMS_W} AS INTEGER) AS bucket
  FROM events CROSS JOIN (SELECT unnest(range({_CMS_D})) AS r)
),
sk AS (SELECT r, bucket, count(*) AS cnt FROM pr GROUP BY r, bucket),
items AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
probes AS (
  SELECT i.user_id, g.r,
         CAST(CAST('0x' || substring(sha256(CAST(i.user_id AS VARCHAR) || '|cms' || CAST(g.r AS VARCHAR)), 1, 15) AS BIGINT)
              % {_CMS_W} AS INTEGER) AS bucket
  FROM items i CROSS JOIN (SELECT unnest(range({_CMS_D})) AS r) g
),
est AS (
  SELECT p.user_id, CAST(min(COALESCE(s.cnt, 0)) AS BIGINT) AS est_count
  FROM probes p LEFT JOIN sk s ON s.r = p.r AND s.bucket = p.bucket
  GROUP BY p.user_id
),
ex AS (SELECT user_id, count(*) AS exact_count FROM events WHERE user_id < 20 GROUP BY user_id)
SELECT e.user_id, e.est_count, x.exact_count
FROM est e JOIN ex x USING (user_id)
"""


@register("events_cms_user_counts", _CMS_ORACLE, "relational", "sketch")
def q_events_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.sketches import cms_build, cms_estimate

    ev = load(spark, sf_dir, "events")
    sk = cms_build(ev.select("user_id"), "user_id", depth=_CMS_D, width=_CMS_W)
    items = ev.where(F.col("user_id") < 20).select("user_id").distinct()
    est = cms_estimate(sk, items, "user_id", depth=_CMS_D, width=_CMS_W)
    exact = (
        ev.where(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("exact_count"))
    )
    return est.join(exact, "user_id")


# -- Z-order (Morton) layout key over (user_id, value) ------------------------

_Z_BITS = 16


def _zorder_oracle() -> str:
    top = float(2**_Z_BITS - 1)
    terms = " + ".join(
        f"(((nu >> {i}) & 1) << {2 * i}) + (((nv >> {i}) & 1) << {2 * i + 1})"
        for i in range(_Z_BITS)
    )
    return f"""
WITH st AS (
  SELECT min(CAST(user_id AS DOUBLE)) AS min_u, max(CAST(user_id AS DOUBLE)) AS max_u,
         min(value) AS min_v, max(value) AS max_v
  FROM events
),
n AS (
  SELECT e.user_id, ROUND(e.value, 6) AS value,
         CAST(floor(CASE WHEN s.max_u > s.min_u
                         THEN (CAST(e.user_id AS DOUBLE) - s.min_u) / (s.max_u - s.min_u)
                         ELSE 0 END * {top!r}) AS BIGINT) AS nu,
         CAST(floor(CASE WHEN s.max_v > s.min_v
                         THEN (e.value - s.min_v) / (s.max_v - s.min_v)
                         ELSE 0 END * {top!r}) AS BIGINT) AS nv
  FROM events e CROSS JOIN st s
)
SELECT user_id, value, CAST({terms} AS BIGINT) AS zkey FROM n
"""


@register("events_zorder_keys", _zorder_oracle(), "relational", "layout")
def q_events_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.layout import zorder_key

    ev = load(spark, sf_dir, "events").select("user_id", "value")
    return zorder_key(ev, ["user_id", "value"], bits=_Z_BITS).select(
        "user_id", F.round("value", 6).alias("value"), "zkey"
    )


# -- TPC-H Q18 shape: large-volume customers (semi-join on a HAVING agg) ------

_Q18_QTY = 200

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > {_Q18_QTY}
)
SELECT c.c_name, o.o_orderkey, ROUND(o.o_totalprice, 2) AS o_totalprice,
       ROUND(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
ORDER BY ROUND(o.o_totalprice, 2) DESC, o.o_orderkey ASC
LIMIT 100
"""


@register("tpch_q18_large_orders", _Q18_ORACLE, "relational", "tpch")
def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18's plan shape at scale: the HAVING aggregate runs FIRST (partial
    agg on the fact table, output is orders-sized × selectivity), then
    semi-joins prune lineitem/orders before the final group — never a
    fact×fact join on unfiltered inputs. The qualifying-order set is tiny
    (~0.1% at qty>200), so it broadcasts into both probes."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .where(F.col("_q") > _Q18_QTY)
        .select("l_orderkey")
    )
    from pyspark.sql.functions import broadcast

    orders = load(spark, sf_dir, "orders").join(
        broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
    )
    cust = load(spark, sf_dir, "customer")
    joined = (
        li.join(broadcast(big.withColumnRenamed("l_orderkey", "_bk")),
                F.col("l_orderkey") == F.col("_bk"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        joined.groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name", "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# -- sampled quantiles over a deterministic KMV row sample --------------------

_SAMPLE_K = 256

_SAMPLED_Q_ORACLE = f"""
WITH s AS (
  SELECT value FROM events ORDER BY sha256(CAST(event_id AS VARCHAR)) LIMIT {_SAMPLE_K}
),
est AS (
  SELECT ROUND(quantile_cont(value, 0.5), 6) AS est_p50,
         ROUND(quantile_cont(value, 0.95), 6) AS est_p95
  FROM s
),
ex AS (
  SELECT ROUND(quantile_cont(value, 0.5), 6) AS exact_p50,
         ROUND(quantile_cont(value, 0.95), 6) AS exact_p95
  FROM events
)
SELECT est_p50, est_p95, exact_p50, exact_p95 FROM est, ex
"""


@register("events_sampled_quantiles", _SAMPLED_Q_ORACLE, "relational", "sketch")
def q_events_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation the mergeable way: exact percentiles over a
    deterministic k-min-hash row sample (TakeOrdered — no global sort, no
    full-data sort for the estimate) with the full-data exact quantiles
    alongside as the accuracy envelope; the sample is replayed in SQL."""
    from pyspark.sql.functions import broadcast

    from vector_mcp_spark.operators.sketches import kmv_row_sample

    ev = load(spark, sf_dir, "events")
    est = kmv_row_sample(ev, "event_id", k=_SAMPLE_K).agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("est_p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("est_p95"),
    )
    exact = ev.agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("exact_p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("exact_p95"),
    )
    return est.join(broadcast(exact))


# -- streaming count-min sketch (REAL executed stream, batch-twin oracle) -----
#
# The sketch is maintained by a stateful streaming aggregation (update
# mode, state bounded at depth×width counters); because counts are
# monotone, the final value per counter is its max across emitted updates,
# and it must equal the batch sketch — the oracle replays the batch path.


@register("streaming_cms_user_counts", _CMS_ORACLE, "streaming", "sketch")
def q_streaming_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from vector_mcp_spark.operators.sketches import cms_estimate
    from vector_mcp_spark.streaming.ingest import (
        read_event_stream,
        run_stream_to_memory,
        streaming_frequency_sketch,
    )

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    clean_dir = os.path.abspath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".tmp", f"events_{sf_tag}")
    )
    if not os.path.exists(os.path.join(clean_dir, "_SUCCESS")):
        load(spark, sf_dir, "events").write.mode("overwrite").parquet(clean_dir)
    stream = read_event_stream(spark, clean_dir).select("user_id")
    got = run_stream_to_memory(
        streaming_frequency_sketch(stream, "user_id", depth=_CMS_D, width=_CMS_W),
        f"suite_stream_cms_{next(_STREAM_SINK_SEQ)}",
        output_mode="update",
    )
    sketch = got.groupBy("row", "bucket").agg(F.max("cnt").alias("cnt"))
    ev = load(spark, sf_dir, "events")
    items = ev.where(F.col("user_id") < 20).select("user_id").distinct()
    est = cms_estimate(sketch, items, "user_id", depth=_CMS_D, width=_CMS_W)
    exact = (
        ev.where(F.col("user_id") < 20)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("exact_count"))
    )
    return est.join(exact, "user_id")


# -- numeric column profiling (unpivot → one-pass grouped stats) --------------

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
SELECT '{c}' AS col_name, count(*) AS n_rows,
       count(*) - count({c}) AS n_nulls,
       CAST(min({c}) AS DOUBLE) AS min_val, CAST(max({c}) AS DOUBLE) AS max_val,
       CAST(SUM(CAST({c} AS DECIMAL(28,6))) AS DOUBLE) AS sum_val,
       ROUND(CAST(SUM(CAST({c} AS DECIMAL(28,6))) AS DOUBLE) / count({c}), 6) AS mean_val
FROM lineitem""")
    return " UNION ALL ".join(parts)


@register("lineitem_column_profile", _profile_oracle(), "relational", "profile")
def q_lineitem_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.profile import profile_columns

    li = load(spark, sf_dir, "lineitem")
    return profile_columns(li, _PROFILE_COLS)


@register("events_kmv_merge_rollup", _KMV_MERGE_ORACLE, "relational", "sketch")
def q_events_kmv_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.sketches import kmv_estimate, kmv_merge, kmv_sketch

    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.date_trunc("day", "ts"))
    )
    daily = kmv_sketch(ev, ["event_type", "day"], "user_id", k=_KMV_K)
    merged = kmv_merge(daily, ["event_type"], k=_KMV_K)
    direct = kmv_sketch(ev, ["event_type"], "user_id", k=_KMV_K).select(
        "event_type", kmv_estimate(k=_KMV_K).alias("direct_est")
    )
    return merged.select(
        "event_type",
        F.size("ks").cast("int").alias("n_kept"),
        kmv_estimate(k=_KMV_K).alias("merged_est"),
    ).join(direct, "event_type")


# KMV set algebra: union AND intersection cardinality for every pair of
# event-type audiences, answered entirely from the k-hash sketches (Beyer
# et al. SIGMOD'07). The pair join is a broadcast over ~|event_types| sketch
# rows — the events table is scanned once to build sketches and never again.

_KMV_SETOPS_ORACLE = f"""
WITH hashed AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substring(sha256(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM events
),
ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
  FROM hashed
),
ks AS (
  SELECT event_type, list(h ORDER BY h ASC) AS ks
  FROM ranked WHERE rn <= {_KMV_K} GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.ks AS ks_a, b.ks AS ks_b
  FROM ks a JOIN ks b ON a.event_type < b.event_type
),
calc AS (
  SELECT type_a, type_b, ks_a, ks_b,
         list_sort(list_distinct(list_concat(ks_a, ks_b)))[1:{_KMV_K}] AS m
  FROM pairs
),
u AS (
  SELECT type_a, type_b, ks_a, ks_b, m,
         CAST(CASE WHEN len(m) < {_KMV_K} THEN len(m)
                   ELSE ROUND({_KMV_K - 1}.0 / (m[{_KMV_K}] / {_KMV_DENOM!r})) END
              AS BIGINT) AS est_union
  FROM calc
)
SELECT type_a, type_b, est_union,
       CAST(CASE WHEN len(m) = 0 THEN 0.0
                 ELSE ROUND(len(list_intersect(list_intersect(m, ks_a), ks_b))
                            * CAST(est_union AS DOUBLE) / len(m)) END
            AS BIGINT) AS est_intersect
FROM u
"""


@register("events_kmv_set_ops", _KMV_SETOPS_ORACLE, "relational", "sketch")
def q_events_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.sketches import kmv_set_estimates, kmv_sketch

    ev = load(spark, sf_dir, "events")
    sk = kmv_sketch(ev, ["event_type"], "user_id", k=_KMV_K)
    a = sk.select(F.col("event_type").alias("type_a"), F.col("ks").alias("ks_a"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("ks").alias("ks_b"))
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    return kmv_set_estimates(pairs, "ks_a", "ks_b", k=_KMV_K).select(
        "type_a", "type_b", "est_union", "est_intersect"
    )


# -- hour-of-day seasonality profile ------------------------------------------

_SEASONALITY_ORACLE = """
SELECT event_type, CAST(hour(ts) AS INTEGER) AS hour_of_day,
       count(*) AS n_events,
       ROUND(AVG(value), 6) AS avg_value
FROM events GROUP BY event_type, hour(ts)
"""


@register("events_hourly_seasonality", _SEASONALITY_ORACLE, "relational", "analytics")
def q_events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour_of_day")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


# -- experiment readout: variant lift + Welch t-statistic ---------------------
#
# The A/B answer sheet from closed-form aggregates only (means, sample
# variances, counts — all partial-aggregating): lift and the Welch
# t-statistic per event type for a deterministic hash split of users.
# No UDF, one grouped pass after the variant tag.

_AB_ORACLE = """
WITH tagged AS (
  SELECT event_type, value,
         CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS variant
  FROM events
),
g AS (
  SELECT event_type, variant, count(*) AS n, AVG(value) AS mean_v,
         var_samp(value) AS var_v
  FROM tagged GROUP BY event_type, variant
)
SELECT c.event_type,
       CAST(c.n AS BIGINT) AS n_control, CAST(t.n AS BIGINT) AS n_treatment,
       ROUND(c.mean_v, 6) AS mean_control,
       ROUND(t.mean_v, 6) AS mean_treatment,
       ROUND(t.mean_v - c.mean_v, 6) AS lift,
       ROUND((t.mean_v - c.mean_v) /
             sqrt(t.var_v / t.n + c.var_v / c.n), 6) AS welch_t
FROM g c JOIN g t USING (event_type)
WHERE c.variant = 'control' AND t.variant = 'treatment'
"""


@register("events_ab_readout", _AB_ORACLE, "relational", "analytics")
def q_events_ab_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type", "value",
        F.when(F.col("user_id") % 2 == 0, "control").otherwise("treatment").alias("variant"),
    )
    g = tagged.groupBy("event_type", "variant").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("mean_v"),
        F.var_samp("value").alias("var_v"),
    )
    c = g.where(F.col("variant") == "control").select(
        "event_type", F.col("n").alias("n_control"),
        F.col("mean_v").alias("mc"), F.col("var_v").alias("vc"),
    )
    t = g.where(F.col("variant") == "treatment").select(
        "event_type", F.col("n").alias("n_treatment"),
        F.col("mean_v").alias("mt"), F.col("var_v").alias("vt"),
    )
    return c.join(t, "event_type").select(
        "event_type",
        F.col("n_control").cast("long").alias("n_control"),
        F.col("n_treatment").cast("long").alias("n_treatment"),
        F.round("mc", 6).alias("mean_control"),
        F.round("mt", 6).alias("mean_treatment"),
        F.round(F.col("mt") - F.col("mc"), 6).alias("lift"),
        F.round(
            (F.col("mt") - F.col("mc"))
            / F.sqrt(F.col("vt") / F.col("n_treatment") + F.col("vc") / F.col("n_control")),
            6,
        ).alias("welch_t"),
    )


# -- fixed-bin value histogram per event type ---------------------------------
#
# Observability staple: bins are FIXED literals (width 25 over [0, 500)),
# so per-partition bin counts partial-aggregate map-side and histograms
# from different data slices are additive — unlike quantile-based bins,
# which need a pre-pass. Out-of-range values clamp into the edge bins.

_HIST_WIDTH = 25.0
_HIST_BINS = 20

_HIST_ORACLE = f"""
SELECT event_type,
       CAST(LEAST(GREATEST(CAST(floor(value / {_HIST_WIDTH}) AS INT), 0),
                  {_HIST_BINS - 1}) AS INTEGER) AS bin,
       ROUND(LEAST(GREATEST(CAST(floor(value / {_HIST_WIDTH}) AS INT), 0),
                  {_HIST_BINS - 1}) * CAST({_HIST_WIDTH} AS DOUBLE), 2) AS bin_lo,
       count(*) AS n
FROM events
GROUP BY event_type, bin, bin_lo
"""


@register("events_value_histogram", _HIST_ORACLE, "relational", "analytics")
def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bin_ = F.least(
        F.greatest(F.floor(F.col("value") / _HIST_WIDTH).cast("int"), F.lit(0)),
        F.lit(_HIST_BINS - 1),
    )
    return (
        ev.select("event_type", bin_.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            "bin",
            F.round(F.col("bin") * _HIST_WIDTH, 2).alias("bin_lo"),
            "n",
        )
    )


# -- key-skew diagnosis (when to reach for the salted operators) --------------
#
# The report that justifies salting: per candidate join/group key column,
# cardinality, heaviest-key share, and the max/mean frequency ratio. One
# grouped count per key column, then a one-row summary — cheap enough to
# run before any big join at 100 TB.

_SKEW_ORACLE = """
WITH f AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY user_id),
s AS (
  SELECT count(*) AS n_keys, SUM(c) AS n_rows, max(c) AS max_c,
         AVG(c) AS mean_c, median(c) AS p50_c
  FROM f
),
top AS (SELECT k FROM f ORDER BY c DESC, k ASC LIMIT 1)
SELECT 'user_id' AS key_col,
       CAST(s.n_keys AS BIGINT) AS n_keys,
       CAST(s.max_c AS BIGINT) AS max_freq,
       ROUND(s.p50_c, 6) AS p50_freq,
       ROUND(s.max_c / s.mean_c, 6) AS skew_ratio,
       ROUND(s.max_c / CAST(s.n_rows AS DOUBLE), 6) AS top_key_share,
       CAST((SELECT k FROM top) AS BIGINT) AS heaviest_key
FROM s
"""


@register("events_key_skew_report", _SKEW_ORACLE, "relational", "skew")
def q_events_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    f = ev.groupBy(F.col("user_id").alias("k")).agg(F.count("*").alias("c"))
    heaviest = (
        f.orderBy(F.col("c").desc(), F.col("k").asc())
        .limit(1)
        .select(F.col("k").alias("heaviest_key"))
    )
    summary = f.agg(
        F.count("*").alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_c"),
        F.avg("c").alias("mean_c"),
        F.median("c").alias("p50_c"),
    )
    return summary.join(F.broadcast(heaviest)).select(
        F.lit("user_id").alias("key_col"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("max_c").cast("long").alias("max_freq"),
        F.round("p50_c", 6).alias("p50_freq"),
        F.round(F.col("max_c") / F.col("mean_c"), 6).alias("skew_ratio"),
        F.round(F.col("max_c") / F.col("n_rows").cast("double"), 6).alias("top_key_share"),
        F.col("heaviest_key").cast("long").alias("heaviest_key"),
    )


# -- salted skew join (replicate-small-side; result identical to plain join) --
#
# The merge hints force the sort-merge path (the case the operator exists
# for — small side too big to broadcast, big side skewed): the exchange
# keys become (key, salt), spreading any hot key over n_salts merge tasks.
# The oracle is the PLAIN join — salting must be invisible in the result.

_SALTED_JOIN_ORACLE = """
SELECT c.c_mktsegment, count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       ROUND(SUM(e.value), 4) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c_mktsegment
"""


@register("events_salted_enrich_join", _SALTED_JOIN_ORACLE, "relational", "skew")
def q_events_salted_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.skew import salted_join

    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        ev.hint("merge"), cust.hint("merge"),
        big_key="user_id", small_key="c_custkey",
        salt_from="event_id", n_salts=8,
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


# -- robust outlier labeling (applyInPandas grouped-map, per-row output) ------
#
# Median/MAD per event_type, every event labeled — the per-row output a
# grouped AGGREGATE can't produce, via the Arrow grouped-map seam. The
# flag compares raw values; rounding touches only the reported med/mad.

_ROBUST_ORACLE = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, median(abs(e.value - m.med)) AS mad
  FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
)
SELECT e.event_type, e.event_id, e.value,
       ROUND(m.med, 6) AS med, ROUND(d.mad, 6) AS mad,
       abs(e.value - m.med) > 3.0 * d.mad AS is_outlier
FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
"""


@register("events_robust_outliers", _ROBUST_ORACLE, "relational", "analytics")
def q_events_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.robust import group_robust_outliers

    ev = load(spark, sf_dir, "events")
    return group_robust_outliers(
        ev, group_col="event_type", id_col="event_id", value_col="value", z=3.0
    )


# -- daily trend per event type (OLS slope via covariance aggregates) ---------
#
# Trend detection without a UDF: slope = covar_samp(day_idx, total) /
# var_samp(day_idx) — both built-in partial-aggregating JVM functions, so
# the fit costs exactly one grouped pass over the daily rollup.

_TREND_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(value) AS total
  FROM events GROUP BY event_type, date_trunc('day', ts)
),
idx AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1995-01-01', day) AS DOUBLE) AS x,
         total AS y
  FROM daily
)
SELECT event_type,
       CAST(count(*) AS INTEGER) AS n_days,
       ROUND(covar_samp(x, y) / var_samp(x), 6) AS slope,
       ROUND(AVG(y) - (covar_samp(x, y) / var_samp(x)) * AVG(x), 4) AS intercept
FROM idx GROUP BY event_type
ORDER BY event_type
"""


@register("events_daily_trend", _TREND_ORACLE, "relational", "analytics")
def q_events_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum("value").alias("y"))
    idx = daily.select(
        "event_type",
        F.datediff("day", F.lit("1995-01-01").cast("date")).cast("double").alias("x"),
        "y",
    )
    slope = F.covar_samp("x", "y") / F.var_samp("x")
    return (
        idx.groupBy("event_type")
        .agg(
            F.count("*").cast("int").alias("n_days"),
            F.round(slope, 6).alias("slope"),
            F.round(F.avg("y") - slope * F.avg("x"), 4).alias("intercept"),
        )
        .orderBy("event_type")
    )


# -- cohort retention (D1 / D7) -----------------------------------------------
#
# The product-analytics staple: cohort = a user's first activity day;
# retention@k = fraction of the cohort active exactly k days later. Two
# narrow shuffles (per-user min, then per-cohort conditional counts over
# the distinct user-day activity set) — no self-join per offset.

_RETENTION_ORACLE = """
WITH activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
),
cohorts AS (
  SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id
),
joined AS (
  SELECT c.cohort_day, a.user_id, date_diff('day', c.cohort_day, a.day) AS k
  FROM activity a JOIN cohorts c ON a.user_id = c.user_id
)
SELECT cohort_day,
       count(DISTINCT user_id) AS cohort_size,
       count(DISTINCT CASE WHEN k = 1 THEN user_id END) AS retained_d1,
       count(DISTINCT CASE WHEN k = 7 THEN user_id END) AS retained_d7,
       ROUND(CAST(count(DISTINCT CASE WHEN k = 1 THEN user_id END) AS DOUBLE)
             / count(DISTINCT user_id), 6) AS retention_d1,
       ROUND(CAST(count(DISTINCT CASE WHEN k = 7 THEN user_id END) AS DOUBLE)
             / count(DISTINCT user_id), 6) AS retention_d7
FROM joined GROUP BY cohort_day
"""


@register("events_retention_cohorts", _RETENTION_ORACLE, "relational", "analytics")
def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = activity.join(cohorts, "user_id").select(
        "cohort_day", "user_id", F.datediff("day", "cohort_day").alias("k")
    )
    d1 = F.when(F.col("k") == 1, F.col("user_id"))
    d7 = F.when(F.col("k") == 7, F.col("user_id"))
    return joined.groupBy("cohort_day").agg(
        F.countDistinct("user_id").alias("cohort_size"),
        F.countDistinct(d1).alias("retained_d1"),
        F.countDistinct(d7).alias("retained_d7"),
        F.round(
            F.countDistinct(d1).cast("double") / F.countDistinct("user_id"), 6
        ).alias("retention_d1"),
        F.round(
            F.countDistinct(d7).cast("double") / F.countDistinct("user_id"), 6
        ).alias("retention_d7"),
    )


# -- ordered-event funnel (single-shuffle fold, no per-stage joins) -----------

# The oracle replays the SAME greedy fold: per user, event stage-indices in
# (ts, idx) order, folded with list_reduce advancing the stage counter —
# identical tie-break semantics, so hash equality is exact even if two
# funnel events ever share a timestamp.
_FUNNEL_STAGES = ("signup", "view", "click", "purchase")
_FUNNEL_ORACLE = """
WITH e AS (
  SELECT user_id, ts,
         CASE event_type WHEN 'signup' THEN 0 WHEN 'view' THEN 1
              WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 END AS idx
  FROM events
  WHERE event_type IN ('signup', 'view', 'click', 'purchase')
), u AS (
  SELECT user_id, list(idx ORDER BY ts, idx) AS seq FROM e GROUP BY user_id
)
SELECT user_id,
       CAST(list_reduce(list_prepend(0, seq),
                        (a, x) -> CASE WHEN x = a THEN a + 1 ELSE a END)
            AS INTEGER) AS stage_reached,
       CAST(len(seq) AS INTEGER) AS n_funnel_events
FROM u
"""


@register("events_funnel_stages", _FUNNEL_ORACLE, "relational", "sequence")
def q_events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.sequence import funnel_stages

    ev = load(spark, sf_dir, "events")
    return funnel_stages(ev, _FUNNEL_STAGES)


# -- activity gap-filling (date-spine explode + anti-join) --------------------

_GAP_ORACLE = """
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
spans AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM days GROUP BY user_id),
spine AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans
)
SELECT s.user_id, s.day AS gap_day
FROM spine s
WHERE NOT EXISTS (SELECT 1 FROM days d WHERE d.user_id = s.user_id AND d.day = s.day)
"""


@register("events_user_gap_days", _GAP_ORACLE, "relational", "sequence")
def q_events_user_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.sequence import activity_gap_days

    return activity_gap_days(load(spark, sf_dir, "events"))


# -- masked-key fuzzy identifier matching -------------------------------------

# Oracle is the naive quadratic form (fine at sf0.01); the Spark side is the
# lossless linear-shuffle masked-key join — hash equality proves the
# blocking loses nothing.
_FUZZY_ORACLE = """
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       a.s_name AS name_a, b.s_name AS name_b,
       CAST(hamming(a.s_name, b.s_name) AS INTEGER) AS dist
FROM supplier a JOIN supplier b
  ON length(a.s_name) = length(b.s_name) AND a.s_suppkey < b.s_suppkey
WHERE hamming(a.s_name, b.s_name) <= 1
"""


@register("supplier_name_near_matches", _FUZZY_ORACLE, "relational", "fuzzy")
def q_supplier_name_near_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.fuzzy import masked_hamming_pairs

    sup = load(spark, sf_dir, "supplier")
    return masked_hamming_pairs(sup, id_col="s_suppkey", name_col="s_name")


# -- stream-stream interval join (attribution window) -------------------------

_INTERVAL_JOIN_ORACLE = """
SELECT l.user_id AS user_id, l.ts AS l_ts, r.ts AS r_ts,
       l.event_id AS l_event_id, r.event_id AS r_event_id
FROM events l JOIN events r ON l.user_id = r.user_id
WHERE l.event_type = 'click' AND r.event_type = 'purchase'
  AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
"""


@register("streaming_click_purchase_join", _INTERVAL_JOIN_ORACLE, "streaming")
def q_streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream inner interval join driven availableNow; the
    watermark horizon equals the join range bound so each side's state
    retention is one horizon. Inner join ⇒ result equals the batch join."""
    import os

    from vector_mcp_spark.streaming.ingest import (
        interval_join_events,
        read_event_stream,
        run_stream_to_memory,
    )

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    clean_dir = os.path.abspath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".tmp", f"events_{sf_tag}")
    )
    if not os.path.exists(os.path.join(clean_dir, "_SUCCESS")):
        load(spark, sf_dir, "events").write.mode("overwrite").parquet(clean_dir)
    stream = read_event_stream(spark, clean_dir)
    joined = interval_join_events(
        stream.where(F.col("event_type") == "click"),
        stream.where(F.col("event_type") == "purchase"),
        horizon="1 hour",
    )
    name = f"suite_stream_ij_{next(_STREAM_SINK_SEQ)}"
    return run_stream_to_memory(joined, name, output_mode="append", state_partitions=8)


# -- stream-static enrichment join (broadcast dim, zero join state) -----------

_ENRICH_ORACLE = """
SELECT e.event_id, e.user_id, e.value, c.c_name, c.c_mktsegment
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


@register("streaming_enriched_events", _ENRICH_ORACLE, "streaming")
def q_streaming_enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL availableNow stream left-joined to the static customer dim —
    broadcast per micro-batch, no state store, stream side never shuffles."""
    import os

    from vector_mcp_spark.streaming.ingest import (
        enrich_event_stream,
        read_event_stream,
        run_stream_to_memory,
    )

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    clean_dir = os.path.abspath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".tmp", f"events_{sf_tag}")
    )
    if not os.path.exists(os.path.join(clean_dir, "_SUCCESS")):
        load(spark, sf_dir, "events").write.mode("overwrite").parquet(clean_dir)
    stream = read_event_stream(spark, clean_dir)
    enriched = enrich_event_stream(stream, load(spark, sf_dir, "customer")).select(
        "event_id", "user_id", "value", "c_name", "c_mktsegment"
    )
    name = f"suite_stream_enrich_{next(_STREAM_SINK_SEQ)}"
    return run_stream_to_memory(enriched, name, output_mode="append")


# -- stream-stream LEFT OUTER interval join (abandonment detection) -----------
#
# The outer variant of the attribution join: clicks with NO purchase inside
# the horizon surface with NULL right columns. Outer emission is watermark-
# gated, and a finite run's watermark stops at (max event time − delay) —
# so the suite drives the stream through a SENTINEL-FLUSHED copy of the
# events table: two far-future sentinel batches (non-matching user −1, one
# click + one purchase each, mtime-ordered files, maxFilesPerTrigger
# pinned to the base file count) push the watermark past every real row
# between micro-batches. After the flush, availableNow output ≡ the batch
# left join on the real rows — which is exactly what the oracle replays.

_ABANDON_ORACLE = """
SELECT l.user_id AS user_id, CAST(l.ts AS TIMESTAMP) AS l_ts,
       CAST(r.ts AS TIMESTAMP) AS r_ts,
       l.event_id AS l_event_id, r.event_id AS r_event_id
FROM (SELECT * FROM events WHERE event_type = 'click') l
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
"""


def _stage_single_file(df: DataFrame, dst: str, mtime: float) -> None:
    """Write ``df`` as ONE parquet file at ``dst`` with a pinned mtime —
    the staging primitive every pinned-batch-order stream fixture uses
    (file sources batch by mtime). Cleans its tmp dir."""
    import glob
    import os
    import shutil

    tmp = dst + "_stage"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.replace(src, dst)
    os.utime(dst, (mtime, mtime))
    shutil.rmtree(tmp, ignore_errors=True)


def _sentineled_events_dir(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """Events re-write plus two sentinel batches; returns (dir, n_base_files).

    Sentinel files get strictly increasing mtimes (os.utime) so the file
    stream source batches them AFTER the base data."""
    import glob
    import os
    import time

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    d = os.path.abspath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".tmp", f"events_outer_{sf_tag}")
    )
    marker = os.path.join(d, "_flushed")
    if not os.path.exists(marker):
        ev = load(spark, sf_dir, "events")
        # ONE base file: the file source fills each trigger up to
        # maxFilesPerTrigger from the oldest unprocessed files, so with
        # n_base >= 2 both sentinels would share a batch and the second
        # watermark advance (the one that flushes the tail) would depend on
        # a trailing no-data micro-batch. A single base file pins the batch
        # sequence to exactly [base], [sentinel-0], [sentinel-1].
        ev.coalesce(1).write.mode("overwrite").parquet(d)
        base_files = sorted(glob.glob(os.path.join(d, "part-*.parquet")))
        assert len(base_files) == 1, base_files
        now = time.time()
        for f in base_files:
            os.utime(f, (now, now))
        max_ts = ev.agg(F.max("ts").alias("m")).collect()[0].m
        for i, hours in enumerate((3, 6)):
            s_ts = max_ts + __import__("datetime").timedelta(hours=hours)
            sent = spark.createDataFrame(
                [
                    (-(900 + i), s_ts, -1, "click", 0.0, "{}"),
                    (-(950 + i), s_ts, -1, "purchase", 0.0, "{}"),
                ],
                "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
            )
            _stage_single_file(
                sent, os.path.join(d, f"zz-sentinel-{i}.parquet"),
                now + 10 * (i + 1),
            )
        with open(marker, "w") as fh:
            fh.write(str(len(base_files)))
    with open(marker) as fh:
        n_base = int(fh.read().strip())
    return d, n_base


@register("streaming_abandoned_clicks", _ABANDON_ORACLE, "streaming", "temporal")
def q_streaming_abandoned_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL availableNow left-outer interval join through the sentinel
    flush; sentinel rows (user_id < 0) filter out of the result."""
    from vector_mcp_spark.streaming.ingest import (
        interval_join_events,
        read_event_stream,
        run_stream_to_memory,
    )

    d, n_base = _sentineled_events_dir(spark, sf_dir)
    stream = read_event_stream(spark, d, options={"maxFilesPerTrigger": n_base})
    joined = interval_join_events(
        stream.where(F.col("event_type") == "click"),
        stream.where(F.col("event_type") == "purchase"),
        horizon="1 hour",
        how="leftOuter",
    )
    name = f"suite_stream_oj_{next(_STREAM_SINK_SEQ)}"
    got = run_stream_to_memory(joined, name, output_mode="append", state_partitions=8)
    return got.where(F.col("user_id") >= 0)


# -- REAL streaming session windows through the sentinel flush ----------------
#
# events_sessionization pins the session_window EXPRESSIONS in batch; this
# entry executes the STREAMING state machinery — merging session state,
# watermark-gated closure, append emission — through the same sentinel-
# flushed source the outer join uses, so every real session closes before
# the query stops and the availableNow output equals the batch twin. The
# oracle is the identical gap-island SQL the batch entry replays.


@register("streaming_session_windows", _SESSION_ORACLE, "streaming", "temporal")
def q_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.streaming.ingest import (
        read_event_stream,
        run_stream_to_memory,
        sessionized_event_stats,
    )

    d, n_base = _sentineled_events_dir(spark, sf_dir)
    stream = read_event_stream(spark, d, options={"maxFilesPerTrigger": n_base})
    sess = sessionized_event_stats(stream, "30 minutes", watermark="2 hours")
    name = f"suite_stream_sess_{next(_STREAM_SINK_SEQ)}"
    got = run_stream_to_memory(sess, name, output_mode="append", state_partitions=8)
    return got.where(F.col("user_id") >= 0)


# -- OHLC bars: deterministic first/last via composite-key min_by/max_by ------
#
# open/close are raw values picked by min_by/max_by over struct(ts, event_id)
# (ties in ts broken by the unique event id), so they match the oracle's
# window-rank pick bit-for-bit with no rounding; only the float SUM (volume)
# rounds. Cross-mechanism oracle: DuckDB has no composite arg_min, so the
# oracle ranks each user-day twice (asc/desc) and picks rn=1 — same rows,
# different machinery.

_OHLC_ORACLE = """
WITH e AS (
  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id, value FROM events
),
r AS (
  SELECT *,
    row_number() OVER (PARTITION BY user_id, day ORDER BY ts, event_id) AS rn_a,
    row_number() OVER (PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
)
SELECT user_id, day,
  MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
  MAX(value) AS high,
  MIN(value) AS low,
  MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
  CAST(count(*) AS BIGINT) AS n_events,
  ROUND(SUM(value), 4) AS volume
FROM r GROUP BY user_id, day
"""


@register("events_ohlc_bars", _OHLC_ORACLE, "relational", "timeseries")
def q_events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user-day OHLC bars (hypertable first/last rollup) — ONE hash
    aggregate with map-side combine via min_by/max_by over struct(ts,
    event_id); no window, no per-group sort, one shuffle on the bar keys."""
    from vector_mcp_spark.operators.temporal import ohlc_bars

    ev = load(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    return ohlc_bars(ev, ts_col="ts", value_col="value", key_cols=("user_id", "day"))


# -- watermark late-data audit: REAL drop semantics under append mode --------
#
# The stream is staged as five mtime-ordered files so availableNow +
# maxFilesPerTrigger=1 pins the batch sequence: [fresh rows ts >= max-5d],
# [nudge @max], [late rows ts < max-5d], [sentinel max+30d], [sentinel
# max+31d]. After the fresh batch the watermark stands at max-7d; the nudge
# batch exists because the LATE-EVENT filter runs one batch behind the
# eviction watermark (Spark's late-events watermark is the value in effect
# during the previous micro-batch — measured here: a late row arriving in
# the very next batch after the advance is still admitted). By the late
# batch, the filter is armed at max-7d and admits a row ONLY if its 1-day
# window still ENDS after max-7d (the predicate is on window end, not the
# row's ts — also measured: ts < wm with window_end > wm survives). The two
# sentinels push the watermark past every real window end so append mode
# emits everything that survived. The oracle replays the same rule in batch
# SQL: keep a row iff it was in the fresh half OR its window end clears the
# fresh-batch watermark.

_LATE_AUDIT_ORACLE = """
WITH p AS (
  SELECT max(ts) - INTERVAL 5 DAY AS cutoff, max(ts) - INTERVAL 7 DAY AS wm
  FROM events
),
keep AS (
  SELECT e.* FROM events e, p
  WHERE e.ts >= p.cutoff OR date_trunc('day', e.ts) + INTERVAL 1 DAY > p.wm
)
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       CAST(date_trunc('day', ts) + INTERVAL 1 DAY AS TIMESTAMP) AS window_end,
       event_type,
       count(*) AS n_events,
       ROUND(SUM(value), 4) AS total_value,
       ROUND(AVG(value), 6) AS avg_value
FROM keep GROUP BY 1, 2, 3
"""


def _late_audit_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage the five-file late-arrival layout (fresh, nudge, late, two
    sentinels) with strictly increasing mtimes; idempotent per sf_dir. The
    nudge file is load-bearing — see the block comment above."""
    import glob
    import os
    import shutil
    import time
    from datetime import timedelta

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    d = os.path.abspath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".tmp", f"events_late_{sf_tag}")
    )
    marker = os.path.join(d, "_staged")
    if os.path.exists(marker):
        return d
    ev = load(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("m")).collect()[0].m
    cutoff = max_ts - timedelta(days=5)
    now = time.time()

    ev.where(F.col("ts") >= F.lit(cutoff)).coalesce(1).write.mode("overwrite").parquet(d)
    base = sorted(glob.glob(os.path.join(d, "part-*.parquet")))
    assert len(base) == 1, base
    os.utime(base[0], (now, now))

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stages = [
        # nudge: arms the (one-batch-delayed) late-event filter without
        # moving the watermark — its ts is exactly the fresh max
        (spark.createDataFrame([(-989, max_ts, -1, "_sentinel", 0.0, "{}")], schema),
         "zz-nudge.parquet", now + 10),
        (ev.where(F.col("ts") < F.lit(cutoff)), "zz-late-0.parquet", now + 20),
        (spark.createDataFrame([(-990, max_ts + timedelta(days=30), -1, "_sentinel", 0.0, "{}")], schema),
         "zz-sentinel-0.parquet", now + 30),
        (spark.createDataFrame([(-991, max_ts + timedelta(days=31), -1, "_sentinel", 0.0, "{}")], schema),
         "zz-sentinel-1.parquet", now + 40),
    ]
    for df, fname, mtime in stages:
        _stage_single_file(df, os.path.join(d, fname), mtime)
    with open(marker, "w") as fh:
        fh.write("5")
    return d


@register("streaming_late_data_audit", _LATE_AUDIT_ORACLE, "streaming", "temporal")
def q_streaming_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Executes Spark's watermark DROP path, not just windowing: the late
    batch arrives after the watermark advanced, its behind-watermark rows
    are discarded on input, and the availableNow append output therefore
    equals the oracle's keep-rule — state stays bounded by the watermark
    horizon instead of the stream's full history."""
    from vector_mcp_spark.streaming.ingest import (
        read_event_stream,
        run_stream_to_memory,
        windowed_event_counts,
    )

    d = _late_audit_dir(spark, sf_dir)
    stream = read_event_stream(spark, d, options={"maxFilesPerTrigger": 1})
    windowed = windowed_event_counts(stream, "1 day", watermark="7 days")
    name = f"suite_stream_late_{next(_STREAM_SINK_SEQ)}"
    got = run_stream_to_memory(windowed, name, output_mode="append", state_partitions=8)
    return got.where(F.col("event_type") != "_sentinel").select(
        "window_start", "window_end", "event_type", "n_events", "total_value", "avg_value"
    )


# -- HyperLogLog distinct (register-exact cross-engine replay) ----------------
#
# KMV above keeps the k smallest hashes; HLL keeps 64 REGISTERS (max
# leading-zero rank per hash bucket) and merges by element-wise max — the
# per-day-sketch → all-time-merge pattern at constant 64 ints per group.
# Built from sha256 + length(bin(w)) so DuckDB replays registers AND
# estimate bit-for-bit (s_scaled is exact integer evidence; the only float-
# library op in the estimate is one ln, rounded at 2 dp). The 'ALL' row IS
# the merge: max over the five per-type registers, never a rescan.

_HLL_ORACLE = """
WITH hashed AS (
  SELECT event_type,
         CAST('0x' || substring(sha256(CAST(user_id AS VARCHAR)), 1, 9) AS BIGINT) AS h
  FROM events
),
regs AS (
  SELECT event_type, h % 64 AS register,
         MAX(CASE WHEN h // 64 = 0 THEN 31
                  ELSE 31 - length(bin(h // 64)) END) AS rho
  FROM hashed GROUP BY event_type, h % 64
),
allregs AS (
  SELECT * FROM regs
  UNION ALL
  SELECT 'ALL' AS event_type, register, MAX(rho) AS rho FROM regs GROUP BY register
),
summary AS (
  SELECT event_type, COUNT(*) AS present, SUM(POW(2.0, -rho)) AS s_present
  FROM allregs GROUP BY event_type
)
SELECT event_type,
       CAST(64 - present AS INTEGER) AS n_zero,
       CAST(ROUND((s_present + (64 - present)) * 2147483648.0) AS BIGINT) AS s_scaled,
       ROUND(CASE WHEN (0.709 * 4096) / (s_present + (64 - present)) <= 160.0
                   AND (64 - present) > 0
                  THEN 64.0 * LN(64.0 / (64 - present))
                  ELSE (0.709 * 4096) / (s_present + (64 - present)) END, 2) AS est_distinct
FROM summary
"""


@register("events_hll_distinct", _HLL_ORACLE, "relational", "sketch")
def q_events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HLL distinct users + the merged 'ALL' sketch.

    Scale shape: one map-side-partial groupBy on (type, register) — ≤ 64
    rows per type per task cross the wire; the merge and estimate run over
    5 x 64 aggregated rows. The registers frame feeds two jobs (per-type
    estimate + merge), so it's localCheckpoint-ed once."""
    from vector_mcp_spark.operators.sketches import hll_estimate, hll_registers

    ev = load(spark, sf_dir, "events")
    regs = hll_registers(ev, ["event_type"], "user_id").localCheckpoint(eager=True)
    merged = (
        regs.groupBy("register")
        .agg(F.max("rho").alias("rho"))
        .select(F.lit("ALL").alias("event_type"), "register", "rho")
    )
    return hll_estimate(regs.unionByName(merged), ["event_type"])


# -- two-sample Kolmogorov–Smirnov distance (distributed CDF) ------------------
#
# Are click values distributed like purchase values? KS = max CDF gap over
# the (3-dp-quantized) value axis. The CDF is built per value BUCKET with
# driver-side range offsets (bounded by the value range, not the row
# count — operators/rank.py's pattern), so no unpartitioned ordered window
# ever funnels the corpus through one task.

_KS_ORACLE = """
WITH sliced AS (
  SELECT CAST(FLOOR(value * 1000) AS BIGINT) AS b,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS ib
  FROM events WHERE event_type IN ('click', 'purchase')
),
counts AS (SELECT b, SUM(ia) AS ca, SUM(ib) AS cb FROM sliced GROUP BY b),
cum AS (
  SELECT SUM(ca) OVER (ORDER BY b) / (SELECT SUM(ca) FROM counts) AS cdf_a,
         SUM(cb) OVER (ORDER BY b) / (SELECT SUM(cb) FROM counts) AS cdf_b
  FROM counts
)
SELECT (SELECT CAST(SUM(ia) AS BIGINT) FROM sliced) AS n_a,
       (SELECT CAST(SUM(ib) AS BIGINT) FROM sliced) AS n_b,
       ROUND(MAX(ABS(cdf_a - cdf_b)), 4) AS ks_d
FROM cum
"""


@register("events_ks_two_sample", _KS_ORACLE, "relational", "stats")
def q_events_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_mcp_spark.operators.drift import ks_two_sample

    ev = load(spark, sf_dir, "events")
    return ks_two_sample(
        ev,
        "value",
        in_a=F.col("event_type") == "click",
        in_b=F.col("event_type") == "purchase",
    )


# -- HLL merge rollup (daily sketches → weekly estimates, never a rescan) -----
#
# The KMV merge above pools kept hashes; the HLL merge is even simpler —
# element-wise register max — and LOSSLESS: merging daily sketches gives
# exactly the sketch a direct weekly pass would build. Keep 64 ints per
# (type, day); answer any coarser distinct question from them.

_HLL_MERGE_ORACLE = """
WITH hashed AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST('0x' || substring(sha256(CAST(user_id AS VARCHAR)), 1, 9) AS BIGINT) AS h
  FROM events
),
daily AS (
  SELECT event_type, day, h % 64 AS register,
         MAX(CASE WHEN h // 64 = 0 THEN 31
                  ELSE 31 - length(bin(h // 64)) END) AS rho
  FROM hashed GROUP BY event_type, day, h % 64
),
weekly AS (
  SELECT event_type, CAST(date_trunc('week', day) AS DATE) AS week,
         register, MAX(rho) AS rho
  FROM daily GROUP BY 1, 2, 3
),
summary AS (
  SELECT event_type, week, COUNT(*) AS present, SUM(POW(2.0, -rho)) AS s_present
  FROM weekly GROUP BY event_type, week
)
SELECT event_type, week,
       CAST(64 - present AS INTEGER) AS n_zero,
       CAST(ROUND((s_present + (64 - present)) * 2147483648.0) AS BIGINT) AS s_scaled,
       ROUND(CASE WHEN (0.709 * 4096) / (s_present + (64 - present)) <= 160.0
                   AND (64 - present) > 0
                  THEN 64.0 * LN(64.0 / (64 - present))
                  ELSE (0.709 * 4096) / (s_present + (64 - present)) END, 2) AS est_distinct
FROM summary
"""


@register("events_hll_merge_rollup", _HLL_MERGE_ORACLE, "relational", "sketch")
def q_events_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct-user estimates assembled from per-day HLL sketches
    by register max — the keep-sketches-not-raw-data rollup at 100 TB."""
    from vector_mcp_spark.operators.sketches import hll_estimate, hll_registers

    ev = load(spark, sf_dir, "events").withColumn(
        "day", F.to_date(F.date_trunc("day", F.col("ts")))
    )
    daily = hll_registers(ev, ["event_type", "day"], "user_id")
    weekly = (
        daily.withColumn("week", F.to_date(F.date_trunc("week", F.col("day"))))
        .groupBy("event_type", "week", "register")
        .agg(F.max("rho").alias("rho"))
    )
    return hll_estimate(weekly, ["event_type", "week"])


# -- streaming HLL distinct (REAL executed stream, batch-twin oracle) ----------
#
# The HLL registers are a stateful streaming aggregation (update mode,
# state bounded at |types| x 64 register maxima — constant however long the
# stream runs). Register values are monotone, so the final value per key is
# the max across emitted updates and must equal the batch sketch: the
# oracle is the identical batch HLL replay (_HLL_ORACLE above).


@register("streaming_hll_distinct", _HLL_ORACLE, "streaming", "sketch")
def q_streaming_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from vector_mcp_spark.operators.sketches import hll_estimate, hll_registers
    from vector_mcp_spark.streaming.ingest import (
        read_event_stream,
        run_stream_to_memory,
    )

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    clean_dir = os.path.abspath(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".tmp", f"events_{sf_tag}")
    )
    if not os.path.exists(os.path.join(clean_dir, "_SUCCESS")):
        load(spark, sf_dir, "events").write.mode("overwrite").parquet(clean_dir)
    stream = read_event_stream(spark, clean_dir).select("event_type", "user_id")
    got = run_stream_to_memory(
        hll_registers(stream, ["event_type"], "user_id"),
        f"suite_stream_hll_{next(_STREAM_SINK_SEQ)}",
        output_mode="update",
    )
    regs = (
        got.groupBy("event_type", "register")
        .agg(F.max("rho").alias("rho"))
        .localCheckpoint(eager=True)  # feeds the per-type and merged branches
    )
    merged = (
        regs.groupBy("register")
        .agg(F.max("rho").alias("rho"))
        .select(F.lit("ALL").alias("event_type"), "register", "rho")
    )
    return hll_estimate(regs.unionByName(merged), ["event_type"])


# -- t-digest quantile sketch (mergeable, deterministic — VERDICT r8/r9
# optional-breadth pick): per-event-type digests + their merged global
# digest, both fully SQL-replayable ------------------------------------------

_TDIGEST_DELTA = 32
_TDIGEST_KEY = "ROUND((ASIN(2.0 * {q} - 1.0) / PI() + 0.5) * {d}, 6)"

_TDIGEST_ORACLE = f"""
WITH vals AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
),
cents AS (
  SELECT event_type AS scope,
         CAST(FLOOR({_TDIGEST_KEY.format(q="(rn - 0.5) / n", d=_TDIGEST_DELTA)}) AS BIGINT) AS centroid,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         ROUND(AVG(value) + 0.0, 4) AS mean_r
  FROM vals GROUP BY 1, 2
),
ordered AS (
  SELECT *,
         CAST(SUM(cnt) OVER (ORDER BY mean_r, centroid, cnt
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST((SELECT SUM(cnt) FROM cents) AS BIGINT) AS total
  FROM cents
),
merged AS (
  SELECT CAST(FLOOR({_TDIGEST_KEY.format(q="(cum - cnt / 2.0) / total", d=_TDIGEST_DELTA)}) AS BIGINT) AS centroid,
         CAST(SUM(cnt) AS BIGINT) AS cnt,
         FLOOR(CAST(SUM(cnt * CAST(ROUND(mean_r * 10000.0) AS BIGINT)) AS DOUBLE)
               / SUM(cnt) + 0.5) / 10000.0 AS mean_r
  FROM ordered GROUP BY 1
)
SELECT scope, centroid, cnt, mean_r FROM cents
UNION ALL
SELECT '__merged__' AS scope, centroid, cnt, mean_r FROM merged
"""


@register("events_tdigest_quantiles", _TDIGEST_ORACLE, "relational", "sketch")
def q_events_tdigest_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic t-digest (Dunning & Ertl 2019, batch construction):
    per-event-type quantile digests — centroid ids from the k1 arcsine
    scale function over exact ranks, capacity shrinking toward the tails —
    PLUS the merged global digest (re-cluster the union of centroids by
    cumulative mid-quantile), the mergeability that makes the sketch usable
    as a 100 TB rollup: per-shard digests of ≤ delta+1 rows combine without
    touching the data again. Output: (scope, centroid, cnt, mean_r); scope
    '__merged__' carries the merged digest."""
    from vector_mcp_spark.operators.sketches import tdigest_build, tdigest_merge

    ev = load(spark, sf_dir, "events")
    # digest-sized (≤ delta+1 rows per event type): checkpoint so the
    # per-scope output branch, the merge input, and the merge cap-check
    # don't each re-run the grouped-rank build (r13 — the build executed
    # 3× per run)
    per = tdigest_build(ev, "value", ["event_type"], delta=_TDIGEST_DELTA).localCheckpoint(
        eager=True
    )
    merged = tdigest_merge(
        per.select("centroid", "cnt", "mean_r"), delta=_TDIGEST_DELTA
    )
    return per.select(
        F.col("event_type").alias("scope"), "centroid", "cnt", "mean_r"
    ).unionByName(merged.withColumn("scope", F.lit("__merged__")))


# -- t-digest maintained BY THE STREAM (two pinned micro-batches merge) -------
# The sketch's mergeability doing its actual job: each micro-batch builds
# its own bounded per-type digest (ranks are WITHIN-batch — no cross-batch
# state), the digests append to a store, and reading the store is one
# per-type merge. Batch boundaries are pinned (half = event_id % 2, two
# mtime-ordered single files, maxFilesPerTrigger=1) so the oracle can
# replay the exact per-batch digests and their merge.

_STREAM_TDIGEST_ORACLE = f"""
WITH vals AS (
  SELECT event_id % 2 AS half, event_type, value,
         row_number() OVER (PARTITION BY event_id % 2, event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_id % 2, event_type) AS n
  FROM events WHERE value IS NOT NULL
),
cents AS (
  SELECT event_type AS scope,
         CAST(FLOOR({_TDIGEST_KEY.format(q="(rn - 0.5) / n", d=_TDIGEST_DELTA)}) AS BIGINT) AS centroid,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         ROUND(AVG(value) + 0.0, 4) AS mean_r
  FROM vals GROUP BY half, 1, 2
),
tot AS (SELECT scope, CAST(SUM(cnt) AS BIGINT) AS total FROM cents GROUP BY scope),
ordered AS (
  SELECT c.scope, c.centroid, c.cnt, c.mean_r, t.total,
         CAST(SUM(c.cnt) OVER (PARTITION BY c.scope
                               ORDER BY c.mean_r, c.centroid, c.cnt
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM cents c JOIN tot t USING (scope)
),
merged AS (
  SELECT scope,
         CAST(FLOOR({_TDIGEST_KEY.format(q="(cum - cnt / 2.0) / total", d=_TDIGEST_DELTA)}) AS BIGINT) AS centroid,
         CAST(SUM(cnt) AS BIGINT) AS cnt,
         FLOOR(CAST(SUM(cnt * CAST(ROUND(mean_r * 10000.0) AS BIGINT)) AS DOUBLE)
               / SUM(cnt) + 0.5) / 10000.0 AS mean_r
  FROM ordered GROUP BY 1, 2
)
SELECT scope, centroid, cnt, mean_r FROM merged
"""


def _halved_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Events split into two single-file halves (event_id parity), second
    file strictly newer — availableNow + maxFilesPerTrigger=1 pins the
    batch sequence to exactly [half-0], [half-1]. Idempotent per sf."""
    import glob
    import os
    import time

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    d = os.path.abspath(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", ".tmp",
            f"events_halves_{sf_tag}",
        )
    )
    marker = os.path.join(d, "_staged")
    if not os.path.exists(marker):
        ev = load(spark, sf_dir, "events")
        now = time.time()
        os.makedirs(d, exist_ok=True)
        for half in (0, 1):
            _stage_single_file(
                ev.where(F.col("event_id") % 2 == half),
                os.path.join(d, f"half-{half}.parquet"),
                now + 10 * half,
            )
        with open(marker, "w") as fh:
            fh.write("2")
    return d


@register("streaming_tdigest_value", _STREAM_TDIGEST_ORACLE, "streaming", "sketch")
def q_streaming_tdigest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type t-digests maintained BY THE STREAM: foreachBatch
    builds each micro-batch's own digest (ranks never cross a batch — no
    unbounded streaming state, ≤ delta+1 rows per (batch, type) land in
    the store) and the read side folds the store with one per-type merge.
    This is the sketch's 100 TB deployment shape: shards/batches digest
    independently, dashboards merge digests, raw data is touched once."""
    import os
    import shutil

    from vector_mcp_spark.operators.sketches import tdigest_build, tdigest_merge
    from vector_mcp_spark.streaming.ingest import read_event_stream

    d = _halved_events_dir(spark, sf_dir)
    seq = next(_STREAM_SINK_SEQ)
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    # pid + sf + seq: two concurrent suite PROCESSES (bench overlapping the
    # pytest gate) must not rmtree each other's live checkpoint or
    # interleave digests from different SFs in one store
    base = os.path.join(
        os.path.dirname(d), f"tdigest_stream_{os.getpid()}_{sf_tag}_{seq}"
    )
    store = os.path.join(base, "digests")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(base, ignore_errors=True)

    def _digest_batch(batch_df, batch_id: int) -> None:
        tdigest_build(batch_df, "value", ["event_type"], delta=_TDIGEST_DELTA).write.mode(
            "append"
        ).parquet(store)

    q = (
        read_event_stream(spark, d, options={"maxFilesPerTrigger": 1})
        .writeStream.foreachBatch(_digest_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    batch_digests = spark.read.parquet(store).withColumnRenamed("event_type", "scope")
    return tdigest_merge(
        batch_digests.select("scope", "centroid", "cnt", "mean_r"),
        delta=_TDIGEST_DELTA,
        group_cols=["scope"],
    )


# -- quantile READ off the digest (the query the sketch exists to answer) -----
# Estimate rule: the first centroid (in mean order) whose cumulative weight
# reaches p·N answers quantile p with its mean — the nearest-centroid read,
# deterministic and exactly replayable (no interpolation float hazards).

_TDIGEST_READ_PS = (0.5, 0.9, 0.99)
_TDIGEST_READ_ORACLE = f"""
WITH vals AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
),
cents AS (
  SELECT event_type AS scope,
         CAST(FLOOR({_TDIGEST_KEY.format(q="(rn - 0.5) / n", d=_TDIGEST_DELTA)}) AS BIGINT) AS centroid,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         ROUND(AVG(value) + 0.0, 4) AS mean_r
  FROM vals GROUP BY 1, 2
),
cum AS (
  SELECT scope, centroid, mean_r,
         CAST(SUM(cnt) OVER (PARTITION BY scope
                             ORDER BY mean_r, centroid, cnt
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw,
         CAST(SUM(cnt) OVER (PARTITION BY scope) AS BIGINT) AS total
  FROM cents
),
ps(p) AS (VALUES {", ".join(f"(CAST({p} AS DOUBLE))" for p in _TDIGEST_READ_PS)}),
hits AS (
  SELECT c.scope, ps.p, c.mean_r,
         row_number() OVER (PARTITION BY c.scope, ps.p
                            ORDER BY c.cumw ASC, c.centroid ASC) AS rnk
  FROM cum c JOIN ps ON c.cumw >= ps.p * c.total
)
SELECT scope, p, mean_r AS estimate FROM hits WHERE rnk = 1
"""


@register("events_tdigest_read", _TDIGEST_READ_ORACLE, "relational", "sketch")
def q_events_tdigest_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 per event type read off the t-digest: build the same
    per-type digest as events_tdigest_quantiles, take the first centroid
    whose cumulative weight covers p·N. The read touches only digest rows
    (≤ delta+1 per type) — at 100 TB the quantile dashboard never rescans
    the data, which is the whole point of keeping the digest."""
    from pyspark.sql import Window
    from vector_mcp_spark.operators.sketches import tdigest_build

    ev = load(spark, sf_dir, "events")
    cents = tdigest_build(ev, "value", ["event_type"], delta=_TDIGEST_DELTA)
    w = Window.partitionBy("event_type").orderBy(
        F.col("mean_r").asc(), F.col("centroid").asc(), F.col("cnt").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy("event_type")
    cum = cents.select(
        F.col("event_type").alias("scope"),
        "centroid",
        "mean_r",
        F.sum("cnt").over(w).alias("cumw"),
        F.sum("cnt").over(wt).alias("total"),
    )
    ps = spark.createDataFrame([(p,) for p in _TDIGEST_READ_PS], "p double")
    hits = cum.join(F.broadcast(ps), F.col("cumw") >= F.col("p") * F.col("total"))
    wr = Window.partitionBy("scope", "p").orderBy(
        F.col("cumw").asc(), F.col("centroid").asc()
    )
    return (
        hits.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") == 1)
        .select("scope", "p", F.col("mean_r").alias("estimate"))
    )
