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
