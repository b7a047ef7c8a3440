"""TPC-H breadth module: oracle parity at sf0.001 + plan-shape guards.

Every suite_tpch query is hash-compared against its DuckDB oracle by the
driver at sf0.01; this file repeats the comparison at sf0.001 so a breakage
shows up in pytest before the round artifact, and pins the plan properties
each query exists to demonstrate (pushdown, broadcast, no global sort).
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from vector_mcp_spark.suite import SUITE

TPCH_NEW = [
    "tpch_q5_local_supplier",
    "tpch_q13_custdist",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q19_discounted_revenue",
    "tpch_q22_dormant_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_important_parts",
    "tpch_q12_ship_latency",
    "tpch_q16_supplier_cnt",
    "tpch_q20_part_share_suppliers",
    "tpch_q21_waiting_supplier",
]

TABLES = "region nation customer supplier part orders lineitem".split()


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{round(v, 6):.6f}"
    return v


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(row[i]) for i in order) for row in rows)


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", TPCH_NEW)
def test_matches_oracle(spark, sf_dir, oracle_con, name):
    entry = SUITE[name]
    sdf = entry.spark_fn(spark, sf_dir)
    spark_rows = sdf.collect()
    rel = oracle_con.execute(entry.oracle)
    oracle_cols = [d[0] for d in rel.description]
    oracle_rows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(oracle_cols)
    assert _multiset(spark_rows, sdf.columns) == _multiset(oracle_rows, oracle_cols)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_predicates_pushed(spark, sf_dir):
    plan = _plan(SUITE["tpch_q6_forecast_revenue"].spark_fn(spark, sf_dir))
    # every predicate is on scanned columns → parquet row-group pruning
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("]")[0]
    # and nothing shuffles except the final single-row agg exchange
    assert plan.count("Exchange") <= 1


@pytest.mark.parametrize(
    "name",
    ["tpch_q7_volume_shipping", "tpch_q8_market_share", "tpch_q10_returned_items",
     "tpch_q19_discounted_revenue"],
)
def test_dimensions_broadcast(spark, sf_dir, name):
    plan = _plan(SUITE[name].spark_fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q10_topk_no_global_sort(spark, sf_dir):
    plan = _plan(SUITE["tpch_q10_returned_items"].spark_fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q15_no_single_partition_window(spark, sf_dir):
    plan = _plan(SUITE["tpch_q15_top_supplier"].spark_fn(spark, sf_dir))
    assert "Window" not in plan  # max-threshold broadcast, not a global rank


def test_q22_anti_join(spark, sf_dir):
    plan = _plan(SUITE["tpch_q22_dormant_customers"].spark_fn(spark, sf_dir))
    assert "LeftAnti" in plan


def test_q5_cycle_constraint_filters(spark, sf_dir):
    """The local-supplier predicate must actually bite: Q5 revenue is a
    strict subset of the same query without the same-nation constraint."""
    from pyspark.sql import functions as F

    from vector_mcp_spark.suite import SUITE, load

    with_cycle = (
        SUITE["tpch_q5_local_supplier"].spark_fn(spark, sf_dir)
        .agg(F.sum("revenue").alias("r")).first().r or 0.0
    )
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    without = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
        .first().r or 0.0
    )
    assert 0 < with_cycle < without


@pytest.mark.parametrize(
    "name",
    ["tpch_q2_min_cost_supplier", "tpch_q9_product_profit",
     "tpch_q11_important_parts", "tpch_q20_part_share_suppliers",
     "tpch_q21_waiting_supplier"],
)
def test_round5_dimensions_broadcast(spark, sf_dir, name):
    plan = _plan(SUITE[name].spark_fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q2_rank_window_partitioned_by_part(spark, sf_dir):
    """The correlated-min is a per-part window, never a global sort: the
    window spec partitions by partkey."""
    plan = _plan(SUITE["tpch_q2_min_cost_supplier"].spark_fn(spark, sf_dir))
    assert "row_number" in plan
    assert "TakeOrderedAndProject" in plan  # LIMIT 100 never sorts globally


def test_q11_scalar_threshold_broadcast(spark, sf_dir):
    """The 0.1% global-total cutoff joins as a broadcast one-row aggregate,
    not a second scan-and-shuffle of the grouped side."""
    plan = _plan(SUITE["tpch_q11_important_parts"].spark_fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q12_single_fact_pass(spark, sf_dir):
    """Q12 is one fact⋈orders join + conditional agg: no window, no
    cartesian, shipdate pushed to the scan."""
    plan = _plan(SUITE["tpch_q12_ship_latency"].spark_fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("]")[0]


def test_q21_aggregate_formulation_no_self_joins(spark, sf_dir):
    """The EXISTS/NOT-EXISTS pair collapses into ONE per-order aggregate:
    the fact table appears in the plan at most twice (late lines + the
    per-order aggregate), not three times as in the textbook plan."""
    plan = _plan(SUITE["tpch_q21_waiting_supplier"].spark_fn(spark, sf_dir))
    assert plan.count("lineitem.parquet") <= 2
