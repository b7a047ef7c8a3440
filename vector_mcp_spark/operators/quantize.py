"""Per-vector int8 scalar quantization for embedding storage.

At 100 TB an fp32 embedding column is often the single largest column in
the lake; symmetric int8 quantization (scale = max|x| / 127, q = round(x /
scale)) cuts it 4× with bounded recall loss, and keeping the per-vector
``scale`` alongside makes dequantization exact-in-form. The reference
stores raw float vectors only (vector_mcp/vectordb/base.py — pgvector /
qdrant native types); quantization is a scale extension (SURVEY.md §2.4).

Everything is built-in array expressions (transform / aggregate — JVM-side,
no UDF): quantization runs at scan speed and the DuckDB oracle replays it
bit-for-bit (both engines round half-away-from-zero on DOUBLE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _max_abs(vec: Column) -> Column:
    return F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per vector: (id, scale, q) with q = round(x / scale) ∈ [-127, 127].

    All-zero vectors get scale 0 and an all-zero q (the x/scale division is
    guarded). The scale is kept at full double precision internally; callers
    projecting it into a comparison round it themselves.
    """
    with_scale = df.select(id_col, vec_col).withColumn(
        "scale", _max_abs(F.col(vec_col)) / F.lit(127.0)
    )
    q = F.when(
        F.col("scale") == 0.0,
        F.transform(F.col(vec_col), lambda x: F.lit(0).cast("int")),
    ).otherwise(
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") / F.col("scale"), 0).cast("int"),
        )
    )
    return with_scale.withColumn("q", q).select(id_col, "scale", "q", vec_col)


def dequantize_expr(q_col: Column | str, scale_col: Column | str) -> Column:
    """Array expression reconstructing the float vector: q * scale."""
    q = F.col(q_col) if isinstance(q_col, str) else q_col
    s = F.col(scale_col) if isinstance(scale_col, str) else scale_col
    return F.transform(q, lambda x: x.cast("double") * s)


def quantization_error(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    include_q: bool = False,
) -> DataFrame:
    """Per vector: quantization scale and reconstruction MSE (6 dp), the
    quality dashboard for a quantized embedding column. One projection —
    no shuffle, no UDF. ``include_q`` adds the quantized vector as a
    comma-joined string (comparison-friendly projection of the int8 array)."""
    quant = quantize_int8(df, vec_col=vec_col, id_col=id_col)
    recon = dequantize_expr("q", "scale")
    sq_err = F.zip_with(
        F.col(vec_col), recon, lambda x, r: (x.cast("double") - r) * (x.cast("double") - r)
    )
    mse = F.aggregate(sq_err, F.lit(0.0), lambda acc, e: acc + e) / F.size(F.col(vec_col))
    cols = [
        F.col(id_col),
        F.round(F.col("scale"), 6).alias("scale_r"),
        F.round(mse, 6).alias("mse"),
    ]
    if include_q:
        cols.append(F.array_join("q", ",").alias("q_str"))
    return quant.select(*cols)
