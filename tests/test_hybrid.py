from __future__ import annotations

import pytest

from vector_mcp_spark.operators.hybrid import rrf_fuse
from vector_mcp_spark.validation import EngineError, validate_rrf_k, validate_weights


def test_rrf_opposing_legs_dedup(spark):
    """Reference behavior test analogue (tests/test_vector_api.py:147-167):
    two legs ranking the same two docs in opposite order, weights 0.5/0.5 —
    both ids present exactly once, symmetric scores."""
    leg_a = spark.createDataFrame([("d1", 0.9), ("d2", 0.5)], "id string, score double")
    leg_b = spark.createDataFrame([("d2", 10.0), ("d1", 2.0)], "id string, score double")
    got = rrf_fuse([(leg_a, 0.5), (leg_b, 0.5)], 10, rrf_k=60).collect()
    ids = [r.id for r in got]
    assert sorted(ids) == ["d1", "d2"] and len(ids) == 2
    # both docs: 0.5/61 + 0.5/62 — identical fused scores
    assert got[0].score == got[1].score
    # deterministic tie-break by id
    assert ids == ["d1", "d2"]


def test_rrf_weight_skew(spark):
    leg_a = spark.createDataFrame([("a", 1.0), ("b", 0.9)], "id string, score double")
    leg_b = spark.createDataFrame([("b", 1.0), ("a", 0.9)], "id string, score double")
    got = rrf_fuse([(leg_a, 1.0), (leg_b, 0.1)], 10, rrf_k=60).collect()
    assert got[0].id == "a"  # heavier leg dominates


def test_rrf_doc_in_one_leg_only(spark):
    leg_a = spark.createDataFrame([("a", 1.0)], "id string, score double")
    leg_b = spark.createDataFrame([("b", 1.0)], "id string, score double")
    got = {r.id: r.score for r in rrf_fuse([(leg_a, 0.5), (leg_b, 0.5)], 10).collect()}
    assert got["a"] == got["b"] == round(0.5 / 61, 6)


def test_rrf_respects_n(spark):
    leg = spark.createDataFrame([(f"d{i}", float(100 - i)) for i in range(50)], "id string, score double")
    assert len(rrf_fuse([(leg, 1.0)], 7).collect()) == 7


def test_weight_validation():
    with pytest.raises(EngineError, match="hybrid_weights_invalid"):
        validate_weights([0.0, 0.0])
    with pytest.raises(EngineError, match="hybrid_weights_invalid"):
        validate_weights([1.5, 0.5])
    with pytest.raises(EngineError, match="hybrid_weights_invalid"):
        validate_weights([float("nan"), 0.5])
    assert validate_weights([0.5, 0.5]) == [0.5, 0.5]


def test_rrf_k_validation():
    for bad in (0, 10001, True, 1.5):
        with pytest.raises(EngineError):
            validate_rrf_k(bad)
    assert validate_rrf_k(60) == 60
