"""Johnson–Lindenstrauss random projection for embedding columns.

At 100 TB, projecting fp32 embeddings 64→16 dims cuts every downstream
shuffle/scan of the vector column 4× while approximately preserving
pairwise geometry (JL lemma) — the standard pre-step before clustering or
coarse ANN over a full corpus. The reference engine stores and searches
raw vectors only (pgvector/qdrant native types); projection is a scale
extension (SURVEY.md §2.4).

The projection matrix is derived from sha256 of (seed, j, i) — the same
deterministic-randomness trick as the LSH hyperplanes
(operators/similarity.py) — so the DuckDB oracle inlines the matrix as
literals and replays the projection bit-for-bit. Each output dim is a
zip_with/aggregate fold (sequential, matching DuckDB ``list_dot_product``
order); the literal-expansion alternative overflows codegen limits at
16×64 terms (see similarity.py:_bucket_expr note).
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def projection_matrix(in_dim: int, out_dim: int, seed: str = "rp") -> list[list[float]]:
    """out_dim rows of in_dim uniform[-0.5, 0.5) weights, sha256-derived."""
    rows = []
    for j in range(out_dim):
        row = []
        for i in range(in_dim):
            h = hashlib.sha256(f"{seed}|{j}|{i}".encode()).digest()
            row.append(int.from_bytes(h[:8], "big") / 2**64 - 0.5)
        rows.append(row)
    return rows


def projection_scale(out_dim: int) -> float:
    """JL scaling for uniform[-0.5, 0.5) matrix entries (variance 1/12):
    sqrt(12 / out_dim) makes E[||proj||²] = ||v||², so distances carry over
    at expectation and downstream thresholds keep their meaning."""
    return math.sqrt(12.0 / out_dim)


def project_embeddings(
    df: DataFrame,
    matrix: list[list[float]],
    emb_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Adds ``out_col``: array<double> of dot(v, R[j]) · sqrt(12/out_dim)
    (norm-preserving JL scaling for the uniform matrix). Pure projection:
    no shuffle, scan-bound."""
    out_dim = len(matrix)
    scale = projection_scale(out_dim)

    def _component(row: list[float]) -> F.Column:
        prods = F.zip_with(
            F.col(emb_col),
            F.array(*[F.lit(float(x)) for x in row]),
            lambda x, y: x.cast("double") * y,
        )
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x) * scale

    return df.withColumn(out_col, F.array(*[_component(r) for r in matrix]))
