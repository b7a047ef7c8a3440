"""Embedding-space diagnostics — isotropy and exact mean pairwise cosine.

Anisotropic embedding spaces (all vectors leaning into a narrow cone) break
cosine retrieval and sign-LSH alike (Ethayarajh 2019); the two cheap global
diagnostics are the mean-vector norm relative to the mean norm, and the
average pairwise cosine. The naive pairwise form is O(n²); over UNIT
vectors the identity

    Σ_{i≠j} v_i·v_j  =  ||Σ_i v_i||² − Σ_i ||v_i||²  =  ||S||² − n

computes it EXACTLY from one pass: S is the element-wise vector sum (a
``dim``-row aggregate after a positional explode — state is O(dim),
corpus-size independent), n is a count. No pair is ever materialized, so
the diagnostic runs at scan speed on any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_mcp_spark.functions.vector import l2_norm


def isotropy_report(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """One row: (n, avg_norm, mean_vec_norm, mean_cos_ratio,
    avg_pairwise_cosine).

    ``mean_cos_ratio`` = ||E[v]|| / E[||v||] over the RAW vectors (0 ≈
    isotropic, → 1 degenerate); ``avg_pairwise_cosine`` is the exact mean
    of cos(v_i, v_j) over all i≠j pairs of the NORMALIZED vectors via the
    sum identity."""
    unit = F.transform(
        F.col(emb_col), lambda x: x.cast("double") / l2_norm(F.col(emb_col))
    )
    base = df.where(F.col(emb_col).isNotNull()).select(
        F.col(emb_col).alias("v"),
        l2_norm(F.col(emb_col)).alias("norm"),
        unit.alias("u"),
    )
    # element-wise sums: explode to (dim, component) — dim-sized aggregate
    ex = base.select(
        F.posexplode(F.arrays_zip("v", "u")).alias("i", "c"), F.col("norm")
    ).select("i", F.col("c.v").alias("x_raw"), F.col("c.u").alias("x_unit"), "norm")
    dims = ex.groupBy("i").agg(
        F.sum("x_raw").alias("s_raw"), F.sum("x_unit").alias("s_unit")
    )
    sums = dims.agg(
        F.sum(F.col("s_raw") * F.col("s_raw")).alias("ss_raw"),
        F.sum(F.col("s_unit") * F.col("s_unit")).alias("ss_unit"),
    )
    stats = base.agg(
        F.count("*").alias("n"), F.avg("norm").alias("avg_norm")
    )
    return (
        stats.join(F.broadcast(sums))
        .select(
            "n",
            F.round("avg_norm", 4).alias("avg_norm"),
            F.round(F.sqrt("ss_raw") / F.col("n"), 4).alias("mean_vec_norm"),
            F.round(F.sqrt("ss_raw") / F.col("n") / F.col("avg_norm"), 4).alias(
                "mean_cos_ratio"
            ),
            F.round(
                (F.col("ss_unit") - F.col("n")) / (F.col("n") * (F.col("n") - 1)), 4
            ).alias("avg_pairwise_cosine"),
        )
    )
