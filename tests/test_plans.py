"""Physical-plan guards over the ENTIRE declared suite.

Mechanical enforcement of the scale rules (SURVEY §9 / README):
- no row-at-a-time Python UDFs in any hot path (``BatchEvalPython``) —
  Python seams must be Arrow-batched (``ArrowEvalPython`` / ``MapInPandas``
  / ``FlatMapGroupsInPandas*`` are fine);
- no non-broadcast cartesian products (``CartesianProduct``) — broadcast
  nested-loop joins for tiny query sets are the accepted pattern.
"""

from __future__ import annotations

import re

import pytest

from vector_mcp_spark.suite import SUITE

SF_DIR = "/root/testdata/sf0.001"

# streaming sinks execute eagerly; plan string lives in the sink query
_SKIP = {"streaming_windowed_events"}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", [n for n in SUITE if n not in _SKIP])
def test_no_row_udf_no_cartesian(spark, name):
    df = SUITE[name].spark_fn(spark, SF_DIR)
    plan = _plan(df)
    # BatchEvalPythonUDTF is the (only sensible) UDTF mechanism — the Arrow
    # UDTF variant measured ~10x slower; the guard targets scalar row UDFs
    assert not re.search(r"BatchEvalPython(?!UDTF)", plan), (
        f"{name}: row-at-a-time Python UDF in plan"
    )
    assert "CartesianProduct" not in plan, f"{name}: unbroadcast cartesian product in plan"


@pytest.mark.parametrize("name", [n for n in SUITE if n not in _SKIP])
def test_unpartitioned_windows_only_over_bounded_sets(spark, name):
    """A row_number over an unpartitioned ORDER BY funnels its input through
    ONE task — allowed ONLY above a limit (ranking an already-bounded top-k,
    the TakeOrdered-then-rank pattern). An unbounded global window anywhere
    is the canonical lake-scale straggler; the distributed form is
    operators/rank.py global_rank."""
    df = SUITE[name].spark_fn(spark, SF_DIR)
    plan = _plan(df)
    for line in plan.splitlines():
        ls = line.strip()
        if " Window [" not in f" {ls}" or "windowspecdefinition" not in ls:
            continue
        # partitioned windows print [exprs], [partcols], [ordercols];
        # partition-only (no order) prints two lists but its spec starts
        # with the partition columns, not ASC/DESC order columns
        if ls.count("], [") >= 2:
            continue
        spec = ls.split("windowspecdefinition(", 1)[1]
        head = spec.split(",")[0] + "," + (spec.split(",")[1] if "," in spec else "")
        if "ASC" not in head and "DESC" not in head:
            continue  # partition-only window (e.g. max over partition)
        assert "GlobalLimit" in plan or "TakeOrdered" in plan, (
            f"{name}: unpartitioned ordered window with no bounding limit:\n  {ls[:160]}"
        )
