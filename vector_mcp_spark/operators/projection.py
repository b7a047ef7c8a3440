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
    no shuffle, scan-bound.

    The matrix enters the plan as ONE nested array literal and the whole
    projection is a single transform-over-rows HOF — building out_dim
    separate fold expressions cost ~60 ms of py4j traffic EACH at
    construction time (the dominant cost of a fresh 64→32 plan, measured
    2.5× build and 2.4× execute vs the per-component formulation)."""
    scale = projection_scale(len(matrix))
    # expr-string literal: one py4j call + a JVM-side parse (ms) instead of
    # marshalling 2048 floats element-by-element through py4j (~2 s per
    # call). 'D' suffix pins DOUBLE literals (bare decimals parse as
    # DECIMAL in Spark SQL); repr() round-trips the exact float.
    mat_lit = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{x!r}D" for x in row) + ")" for row in matrix
        )
        + ")"
    )
    proj = F.transform(
        mat_lit,
        lambda row: F.aggregate(
            F.zip_with(F.col(emb_col), row, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        * scale,
    )
    return df.withColumn(out_col, proj)


def ann_projected_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    matrix: list[list[float]],
    shortlist: int = 50,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN: coarse cosine ranking in the PROJECTED space picks a
    ``shortlist`` per query, then the shortlist re-ranks by exact cosine on
    the full vectors — (query_id, rank, neighbor_id, score 6 dp).

    The IVF-PQ-style shape: the expensive per-pair work (the full-dim dot)
    runs only on shortlist·|queries| pairs; the corpus-wide pass costs
    out_dim/in_dim of a brute-force scan (store the projected column and the
    coarse pass reads 4× less). Both stages are deterministic functions of
    (data, matrix), so the whole pipeline stays oracle-replayable; recall is
    additionally pytest-gated against the exact operator.
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    from vector_mcp_spark.functions.vector import dot, l2_norm

    # The coarse pass and its rank window run on NARROW rows — (query_id,
    # neighbor_id, coarse score) — so the shuffle never carries vectors;
    # full vectors re-join only for the shortlist·|queries| re-rank rows.
    # Norms are computed once per side, never per pair.
    proj_q = project_embeddings(queries, matrix, emb_col=emb_col, out_col="_pq").select(
        F.col(id_col).alias("query_id"), "_pq", l2_norm(F.col("_pq")).alias("_pqn")
    )
    from vector_mcp_spark.operators.partition import spread

    # spread: the projection + per-pair coarse-cosine map stage runs on the
    # corpus scan's partitioning — one core on a single-file local read
    proj_c = project_embeddings(spread(corpus), matrix, emb_col=emb_col, out_col="_pc").select(
        F.col(id_col).alias("neighbor_id"), "_pc", l2_norm(F.col("_pc")).alias("_pcn")
    )
    coarse = (
        proj_c.join(broadcast(proj_q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.try_divide(dot("_pq", "_pc"), F.col("_pqn") * F.col("_pcn")).alias("_cs"),
        )
    )
    w_coarse = Window.partitionBy("query_id").orderBy(
        F.col("_cs").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        coarse.withColumn("_crank", F.row_number().over(w_coarse))
        .where(F.col("_crank") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    q_full = queries.select(
        F.col(id_col).alias("query_id"), F.col(emb_col).alias("_qvec"),
        l2_norm(F.col(emb_col)).alias("_qn"),
    )
    c_full = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(emb_col).alias("_nvec"),
        l2_norm(F.col(emb_col)).alias("_nn"),
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("neighbor_id").asc()
    )
    return (
        c_full.join(broadcast(cand), "neighbor_id")
        .join(broadcast(q_full), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.try_divide(dot("_qvec", "_nvec"), F.col("_qn") * F.col("_nn")).alias(
                "_score"
            ),
        )
        .withColumn("rank", F.row_number().over(w_exact))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            F.round("_score", 6).alias("score"),
        )
    )
