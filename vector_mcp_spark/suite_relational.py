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
