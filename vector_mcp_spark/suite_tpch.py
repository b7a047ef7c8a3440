"""TPC-H-shaped relational breadth over the driver star schema.

The reference has no relational surface (SURVEY.md §2.4) — these queries
pin the Spark capabilities its users get "for free" when they migrate, and
each one is chosen to exercise a distinct plan shape that matters at 100 TB:

* Q6  — pure scan + fully-pushed conjunctive predicate (no shuffle at all);
* Q7  — two independent dimension chains (supplier-nation × customer-nation)
        broadcast onto one fact scan, grouped by derived year;
* Q8  — market-share: conditional aggregation (share = sum(if)/sum) instead
        of a self-join, region pruning via broadcast chain;
* Q10 — returned-item report: quarter-bounded fact scan, top-k by revenue
        with TakeOrderedAndProject (no global sort);
* Q15 — top supplier via window max over an aggregated sub-result (TPC-H's
        CREATE VIEW replaced by a rank window — one extra exchange, no view);
* Q17 — small-quantity threshold against a per-part mean: the correlated
        subquery becomes a broadcast of the per-part aggregate;
* Q19 — disjunctive brand/size/quantity predicate evaluated AFTER an
        equi-join on partkey (never a cartesian: OR terms share the join key);
* Q22 — dormant rich customers: global scalar threshold (broadcast one-row
        agg) + anti-join against recent orders.

The driver schema lacks partsupp / l_shipmode / l_commitdate / c_phone, so
queries that need them substitute available columns — Q8/Q17/Q19/Q22 swap
p_type for the 3-word type and mktsegment for the phone prefix; Q2/Q9/Q11/
Q16/Q20 derive the supply relation from observed (partkey, suppkey)
lineitem pairs in place of partsupp; Q12/Q21 classify ship latency
(shipdate − orderdate) in place of shipmode/commitdate. Q4's shape ships as
``late_orders_by_priority`` and Q14's as ``promo_revenue``, both in
suite_relational. Plan shape, not literal
TPC-H compliance, is the point — with these, all 22 query shapes run.

Adapted from the public TPC-H spec; no reference-repo counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_mcp_spark.suite import load, register

# -- Q5: local-supplier volume — join-graph CYCLE -----------------------------
# The distinguishing Q5 feature vs a plain star join: customer and
# supplier must share a nation (c_nationkey = s_nationkey closes a cycle
# in the join graph), on top of the region prune and date window. All
# dimensions broadcast; the cycle closes as a cheap post-join filter on
# two already-present broadcast columns.

_Q5_ORACLE = """
SELECT n.n_name AS n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name ASC
"""


@register("tpch_q5_local_supplier", _Q5_ORACLE, "relational", "tpch")
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


# -- Q6: forecast revenue change — scan-bound, every predicate pushed ---------

_Q6_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6_forecast_revenue", _Q6_ORACLE, "relational", "tpch")
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# -- Q7: volume shipping between two nations ----------------------------------
# Supplier chain and customer chain are independent small dimensions; both
# broadcast onto the single lineitem->orders join.

_Q7_ORACLE = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE (ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
   OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')
GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


@register("tpch_q7_volume_shipping", _Q7_ORACLE, "relational", "tpch")
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# -- Q8: national market share within a region for one part type --------------
# share = conditional sum / total sum in ONE aggregation — the naive
# two-query self-join is never materialized.

_Q8_ORACLE = """
SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
       ROUND(
         SUM(CASE WHEN ns.n_name = 'NATION_3'
                  THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
         / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN region r ON nc.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
GROUP BY year(o.o_orderdate)
ORDER BY o_year
"""


@register("tpch_q8_market_share", _Q8_ORACLE, "relational", "tpch")
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(region), F.col("nc_region") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# -- Q10: returned-item report — quarter scan, top-20 customers ---------------

_Q10_ORACLE = """
SELECT c.c_custkey, c.c_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       ROUND(c.c_acctbal, 2) AS c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@register("tpch_q10_returned_items", _Q10_ORACLE, "relational", "tpch")
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# -- Q13: customer order-count distribution -----------------------------------
# Double aggregation: per-customer order counts (outer join keeps the
# zero-order customers), then the histogram of those counts. The second
# aggregate's input is |customers| rows — the first shuffle does the
# heavy lifting, the second is near-free.

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("tpch_q13_custdist", _Q13_ORACLE, "relational", "tpch")
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# -- Q15: top supplier(s) by quarterly revenue --------------------------------
# TPC-H's CREATE VIEW + scalar-subquery-max becomes: aggregate once, reduce
# to a one-row max, broadcast it back as the filter threshold. (A global
# rank() window would funnel every per-supplier row through ONE partition —
# fine at sf0.01, a straggler at 100 TB where |suppliers| is millions.)
# Revenue is rounded BEFORE the max comparison so both engines break the
# "who is top" tie identically.

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("tpch_q15_top_supplier", _Q15_ORACLE, "relational", "tpch")
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    top = (
        revenue.join(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .drop("max_rev")
    )
    return (
        F.broadcast(top)
        .join(supp, top.supplier_no == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# -- Q17: small-quantity revenue for one brand --------------------------------
# The correlated per-part average becomes a broadcast of the per-part agg
# (the brand filter shrinks it to ~1/25 of parts first).

_Q17_ORACLE = """
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey, 0.5 * AVG(l_quantity) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
) t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11' AND l.l_quantity < t.qty_threshold
"""


@register("tpch_q17_small_quantity", _Q17_ORACLE, "relational", "tpch")
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#11")
    # per-part mean over ALL lineitems of the brand's parts; semi-join the
    # brand filter into the agg input so the broadcast stays tiny
    brand_items = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresholds = brand_items.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        brand_items.join(
            F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey")
        )
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# -- Q19: disjunctive predicate after an equi-join ----------------------------
# All three OR branches share the partkey equi-join; the disjunction is a
# post-join filter, so the plan is broadcast-hash-join + filter, never a
# nested loop.

_Q19_ORACLE = """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("tpch_q19_discounted_revenue", _Q19_ORACLE, "relational", "tpch")
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # pre-prune the part side to the union of brands so the broadcast ships
    # only candidate parts
    part = load(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# -- Q22: dormant rich customers (phone prefix → mktsegment adaptation) -------
# Global scalar threshold = one-row agg broadcast into the filter; "no
# recent orders" = left-anti join against the order scan.

_Q22_ORACLE = """
WITH threshold AS (
  SELECT AVG(c_acctbal) AS avg_bal FROM customer
  WHERE c_acctbal > 0.0
    AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
), recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
)
SELECT c.c_mktsegment, COUNT(*) AS numcust,
       ROUND(SUM(c.c_acctbal), 2) AS totacctbal
FROM customer c, threshold t
WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
  AND c.c_acctbal > t.avg_bal
  AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY c.c_mktsegment
ORDER BY c_mktsegment
"""


@register("tpch_q22_dormant_customers", _Q22_ORACLE, "relational", "tpch")
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "MACHINERY")
    )
    orders = load(spark, sf_dir, "orders")
    threshold = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


# -- Q2: min-cost supplier per part — correlated MIN becomes a rank window ----
# The driver schema has no partsupp; the supply relation is derived from
# observed lineitems (distinct part-supplier pairs, unit cost = min
# extendedprice/quantity seen). The Q2 plan shape survives: a correlated
# "supplier with the minimum cost for this part" subquery, expressed as a
# row_number window over the supply relation (ties broken by suppkey, so no
# float-equality join), with the region prune riding a broadcast dim chain.

_Q2_ORACLE = """
WITH supply AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), ranked AS (
  SELECT s.l_partkey, s.l_suppkey, s.unit_cost,
         ROW_NUMBER() OVER (PARTITION BY s.l_partkey
                            ORDER BY s.unit_cost, s.l_suppkey) AS rk
  FROM supply s
  JOIN supplier su ON su.s_suppkey = s.l_suppkey
  JOIN nation n ON su.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT su.s_acctbal AS s_acctbal, su.s_name AS s_name, n.n_name AS n_name,
       p.p_partkey AS p_partkey, p.p_name AS p_name,
       rk.unit_cost AS unit_cost
FROM ranked rk
JOIN part p ON p.p_partkey = rk.l_partkey
JOIN supplier su ON su.s_suppkey = rk.l_suppkey
JOIN nation n ON su.s_nationkey = n.n_nationkey
WHERE rk.rk = 1 AND p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register("tpch_q2_min_cost_supplier", _Q2_ORACLE, "relational", "tpch")
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    europe = (
        supply.join(F.broadcast(supp), supply.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = (
        europe.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("l_partkey", "l_suppkey", "unit_cost", "s_acctbal", "s_name", "n_name")
    )
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# -- Q9: product-line profit by nation and year -------------------------------
# partsupp's ps_supplycost is proxied by half the part's retail price; the
# Q9 shape is intact: name-filtered part dim broadcast onto the fact, profit
# as an arithmetic expression over fact+dim columns, grouped by supplier
# nation × order year.

_Q9_ORACLE = """
SELECT n.n_name AS n_name,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                 - 0.5 * p.p_retailprice * l.l_quantity), 2) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


@register("tpch_q9_product_profit", _Q9_ORACLE, "relational", "tpch")
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                2,
            ).alias("profit")
        )
        .orderBy("n_name", F.col("o_year").desc())
    )


# -- Q11: important parts — grouped value vs a broadcast global fraction ------
# ps_supplycost*ps_availqty is proxied by observed revenue per part through
# one nation's suppliers; the Q11 shape is intact: grouped aggregate kept
# only where it exceeds a scalar fraction of the global total (the scalar
# broadcasts — no second scan of the grouped side).

_Q11_ORACLE = """
WITH nat_value AS (
  SELECT l.l_partkey, SUM(l.l_extendedprice) AS value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
  GROUP BY l.l_partkey
)
SELECT l_partkey AS p_partkey, ROUND(value, 2) AS value
FROM nat_value
WHERE value > (SELECT SUM(value) * 0.001 FROM nat_value)
ORDER BY value DESC, p_partkey
"""


@register("tpch_q11_important_parts", _Q11_ORACLE, "relational", "tpch")
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
    )
    nat_value = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    threshold = nat_value.agg((F.sum("value") * 0.001).alias("cutoff"))
    return (
        nat_value.join(F.broadcast(threshold))
        .where(F.col("value") > F.col("cutoff"))
        .select("p_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), "p_partkey")
    )


# -- Q12: shipping-latency classes vs order priority --------------------------
# l_shipmode/l_commitdate don't exist; the latency class (FAST ≤ 60 days
# from order to ship, SLOW otherwise) stands in for the shipmode IN (...)
# filter. The Q12 shape is intact: one fact⋈orders join, conditional
# aggregation splitting priorities per class.

_Q12_ORACLE = """
SELECT CASE WHEN l.l_shipdate <= o.o_orderdate + INTERVAL 60 DAY
            THEN 'FAST' ELSE 'SLOW' END AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY ship_class
ORDER BY ship_class
"""


@register("tpch_q12_ship_latency", _Q12_ORACLE, "relational", "tpch")
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_orderdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn(
            "ship_class",
            F.when(
                F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                "FAST",
            ).otherwise("SLOW"),
        )
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# -- Q16: distinct-supplier counts per part attribute group -------------------
# partsupp is proxied by the observed (part, supplier) pairs in lineitem;
# "complaint" suppliers (the NOT IN subquery) are proxied by negative
# account balance. The Q16 shape is intact: an anti-joined supply relation,
# COUNT(DISTINCT suppkey) per (brand, type, size) bucket, ordered by count.

_Q16_ORACLE = """
SELECT p.p_brand AS p_brand, p.p_type AS p_type, p.p_size AS p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#15'
  AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@register("tpch_q16_supplier_cnt", _Q16_ORACLE, "relational", "tpch")
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#15")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    )
    bad_supp = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# -- Q20: suppliers with significant share of a part line ---------------------
# ps_availqty is proxied by shipped quantity: a supplier qualifies when, for
# some 'red' part, its 1996 shipped quantity exceeds half of that part's
# total 1996 shipped quantity (a per-part scalar joined back — the correlated
# 0.5*SUM(l_quantity) of the original). The Q20 shape is intact: nested
# aggregate → semi-join chain up to the supplier list, nation-filtered.

_Q20_ORACLE = """
WITH red_parts AS (
  SELECT p_partkey FROM part WHERE p_name LIKE '%red%'
), shipped AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM red_parts)
  GROUP BY l_partkey, l_suppkey
), part_total AS (
  SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
)
SELECT s.s_name AS s_name, ROUND(s.s_acctbal, 2) AS s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name IN ('NATION_2', 'NATION_5', 'NATION_8', 'NATION_13')
  AND s.s_suppkey IN (
    SELECT sh.l_suppkey FROM shipped sh
    JOIN part_total pt ON pt.l_partkey = sh.l_partkey
    WHERE sh.qty > 0.5 * pt.total_qty
  )
ORDER BY s_name
"""


@register("tpch_q20_part_share_suppliers", _Q20_ORACLE, "relational", "tpch")
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select("p_partkey")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_total = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    qualifying = (
        shipped.join(part_total, "l_partkey")
        .where(F.col("qty") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_2", "NATION_5", "NATION_8", "NATION_13")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi")
        .join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


# -- Q21: suppliers who alone held up multi-supplier orders -------------------
# l_commitdate/l_receiptdate are proxied by ship latency (late = shipped
# more than 90 days after the order date). The Q21 EXISTS/NOT-EXISTS pair —
# "another supplier is on the order" / "no other supplier was late" — is
# computed as one per-order aggregate (distinct suppliers, distinct late
# suppliers) instead of two self-joins on the fact table: one shuffle on
# orderkey replaces two. The oracle keeps the textbook EXISTS formulation,
# so the two independent formulations must agree to pass.

_Q21_ORACLE = """
SELECT s.s_name AS s_name, COUNT(*) AS numwait
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE n.n_name IN ('NATION_4', 'NATION_9', 'NATION_17')
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""


@register("tpch_q21_waiting_supplier", _Q21_ORACLE, "relational", "tpch")
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "late",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).cast("int"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    # one late line per (order, supplier) counts once — match the oracle's
    # l1 row granularity: every late LINE of the lone late supplier counts
    late_lines = lines.where(F.col("late") == 1)
    culprits = (
        late_lines.join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_4", "NATION_9", "NATION_17")
    )
    return (
        culprits.join(F.broadcast(supp), culprits.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )
