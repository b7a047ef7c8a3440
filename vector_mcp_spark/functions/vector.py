"""Vector math as native Column expressions (JVM-side, codegen-friendly).

The reference computes cosine similarity either inside an external engine
(pgvector ``<=>``, ``vector_mcp/vectordb/postgres.py:334-344``) or as a
Python row loop (``vector_mcp/vectordb/couchbase.py:339-348``:
``dot/(||q||·||d||)``, distance = 1 − sim). Here it is a higher-order-function
expression — ``zip_with`` + ``aggregate`` — which stays inside whole-stage
codegen; no Python in the hot path, no UDF serialization.

All arithmetic is in DOUBLE with left-to-right summation so results are
bit-comparable with a DuckDB oracle using ``list_dot_product`` on
``DOUBLE[]`` (both are sequential folds over the same float32→float64
widened values).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double_array(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two array columns, in double."""
    prods = F.zip_with(_as_double_array(a), _as_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    arr = _as_double_array(a)
    sq = F.aggregate(F.transform(arr, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """similarity = 1 − cosine distance ∈ [−1, 1]; the pg/qdrant/mongo score
    convention the reference returns (``postgres.py:329-343``)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def query_vector_lit(vec: Sequence[float]) -> Column:
    """A broadcast-safe literal array column for a single query vector."""
    return F.array(*[F.lit(float(x)) for x in vec])
