"""PCA operator: the two covariance strategies must agree cell-for-cell,
and power iteration must land on numpy's top eigenpair."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(7)
    # anisotropic cloud: one dominant direction
    base = rng.randn(200, 6) * np.array([3.0, 1.0, 0.5, 0.25, 0.1, 0.05])
    rows = [(i, [float(x) for x in base[i]]) for i in range(len(base))]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>"), base


def test_covariance_paths_agree(vecs):
    from vector_mcp_spark.operators.pca import embedding_covariance

    df, _ = vecs
    a = {(r.i, r.j): r.cov for r in embedding_covariance(df).collect()}
    b = {
        (r.i, r.j): r.cov
        for r in embedding_covariance(df, dim=6, via_pandas=True).collect()
    }
    assert a == b
    assert len(a) == 36


def test_covariance_matches_numpy(vecs):
    from vector_mcp_spark.operators.pca import embedding_covariance

    df, base = vecs
    want = np.cov(base, rowvar=False, bias=True)
    got = {(r.i, r.j): r.cov for r in embedding_covariance(df).collect()}
    for i in range(6):
        for j in range(6):
            assert got[(i, j)] == pytest.approx(want[i, j], abs=2e-6)


def test_power_iteration_finds_top_eigenpair(vecs):
    from vector_mcp_spark.operators.pca import embedding_covariance, top_pc_power_iteration

    df, base = vecs
    cov = embedding_covariance(df, dim=6, via_pandas=True)
    v, lam = top_pc_power_iteration(cov, 6, iters=32)
    c = np.cov(base, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(c)
    assert lam == pytest.approx(evals[-1], rel=1e-4)
    top = evecs[:, -1]
    assert abs(float(np.dot(top, np.array(v)))) == pytest.approx(1.0, abs=1e-4)
    assert float(np.linalg.norm(v)) == pytest.approx(1.0, abs=1e-9)


def test_pandas_path_requires_dim(vecs):
    from vector_mcp_spark.operators.pca import embedding_covariance

    df, _ = vecs
    with pytest.raises(ValueError):
        embedding_covariance(df, via_pandas=True)


def test_iter_bounds(vecs, spark):
    from vector_mcp_spark.operators.pca import embedding_covariance, top_pc_power_iteration

    df, _ = vecs
    cov = embedding_covariance(df)
    with pytest.raises(ValueError):
        top_pc_power_iteration(cov, 6, iters=0)


def test_covariance_plan_has_no_row_udfs(vecs):
    from vector_mcp_spark.operators.pca import embedding_covariance

    df, _ = vecs
    plan = embedding_covariance(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # explode path is pure JVM
