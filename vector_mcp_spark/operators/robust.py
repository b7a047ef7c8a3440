"""Grouped-map robust statistics: median/MAD outlier labeling per group.

The one pandas-API variant the rest of the repo doesn't already exercise:
``applyInPandas`` grouped-map, which returns PER-ROW output a grouped
aggregate can't (each row keeps its value and gains the group's median,
MAD, and an outlier flag). Median/MAD is the robust alternative to
mean/stddev — a single bot user can't drag the threshold.

Scale: one shuffle on the group key; each group materializes in one Arrow
batch on an executor, so group cardinality is the memory bound (same
contract as any grouped-map — pre-aggregate or sub-bucket million-row
groups first). Median and MAD follow the interpolating middle-two
convention (numpy and ANSI ``median`` agree), so the computation is
oracle-replayable; flags compare RAW mad, rounding touches only the
reported columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def group_robust_outliers(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Per row: (group, id, value, med, mad, is_outlier) where is_outlier =
    |value − group median| > z · group MAD. med/mad are rounded to 6 dp in
    the OUTPUT only; the flag uses raw values."""
    base = df.select(
        F.col(group_col), F.col(id_col), F.col(value_col).cast("double").alias("value")
    )
    out_schema = T.StructType(
        [
            base.schema[0],
            base.schema[1],
            T.StructField("value", T.DoubleType()),
            T.StructField("med", T.DoubleType()),
            T.StructField("mad", T.DoubleType()),
            T.StructField("is_outlier", T.BooleanType()),
        ]
    )

    def label(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=np.float64)
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        out = pdf.copy()
        out["med"] = med
        out["mad"] = mad
        out["is_outlier"] = np.abs(v - med) > z * mad
        return out

    labeled = base.groupBy(group_col).applyInPandas(label, schema=out_schema)
    return labeled.select(
        group_col,
        id_col,
        "value",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "is_outlier",
    )


def winsorize_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorization report: exact [lo, hi] percentile fences,
    clip counts, and the mean of the clipped values.

    Exact interpolated percentiles via the grouped ``percentile``
    aggregate (sort-based within each group — groups are the unit of
    parallelism; for corpus-sized single groups switch to
    ``approx_percentile``, same call shape). The fences join back as a
    broadcast (|groups| rows) so the clip pass is map-side."""
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"winsorize_stats: need 0 <= lo < hi <= 1, got ({lo}, {hi})")
    v = F.col(value_col).cast("double")
    fences = df.groupBy(group_col).agg(
        F.percentile(v, F.lit(lo)).alias("p_lo"),
        F.percentile(v, F.lit(hi)).alias("p_hi"),
    )
    clipped = df.join(F.broadcast(fences), group_col).select(
        group_col,
        v.alias("v"),
        "p_lo",
        "p_hi",
        F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi")).alias("w"),
    )
    return clipped.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.round(F.first("p_lo"), 6).alias("p_lo"),
        F.round(F.first("p_hi"), 6).alias("p_hi"),
        F.sum((F.col("v") < F.col("p_lo")).cast("long")).alias("n_clipped_lo"),
        F.sum((F.col("v") > F.col("p_hi")).cast("long")).alias("n_clipped_hi"),
        F.round(F.avg("w"), 6).alias("mean_winsorized"),
    )


def theil_sen_trend(
    df: DataFrame, group_col: str, ts_col: str
) -> DataFrame:
    """Theil–Sen robust slope of daily counts per group (Theil 1950, Sen
    1968, public): median over all pairwise slopes (cnt_j − cnt_i)/(d_j −
    d_i), i < j, with days indexed by date difference from each group's
    first day. Outlier days move the OLS slope; they barely move this one.

    The pairwise stage is blocked per group — C(days, 2) pairs, bounded by
    the series length, never corpus-sized. Returns (group, n_days, slope)
    with the exact interpolated median."""
    daily = df.groupBy(
        F.col(group_col).alias("grp"), F.date_trunc("DAY", F.col(ts_col)).alias("day")
    ).agg(F.count("*").alias("cnt"))
    mins = daily.groupBy("grp").agg(F.min("day").alias("d0"), F.count("*").alias("n_days"))
    idx = daily.join(F.broadcast(mins), "grp").select(
        "grp", "n_days", F.datediff("day", "d0").alias("d"), "cnt"
    )
    a = idx.select("grp", "n_days", F.col("d").alias("di"), F.col("cnt").alias("ci"))
    b = idx.select("grp", F.col("d").alias("dj"), F.col("cnt").alias("cj"))
    slopes = (
        a.join(b, "grp")
        .where(F.col("di") < F.col("dj"))
        .select(
            "grp",
            "n_days",
            ((F.col("cj") - F.col("ci")) / (F.col("dj") - F.col("di"))).alias("s"),
        )
    )
    return slopes.groupBy("grp", "n_days").agg(
        F.round(F.median("s"), 6).alias("slope")
    ).select(
        F.col("grp").alias(group_col), F.col("n_days").cast("long").alias("n_days"), "slope"
    )
