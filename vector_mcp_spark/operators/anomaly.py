"""Trailing-window z-score anomaly flags over grouped time series.

A monitoring primitive for ingest pipelines: per (group, day) counts
compared against each group's own trailing window — ``z = (x - mu) /
sigma`` where mu/sigma come from the previous ``window`` days only
(never the current one, so a spike can't mask itself). The window is
PARTITIONED by group and bounded by ROWS BETWEEN, so state per partition
is O(days-per-group) — the distributed-safe shape `tests/test_plans.py`
requires (no unpartitioned ordered window over unbounded rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trailing_zscore(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    window: int = 7,
    min_prior: int = 3,
    threshold: float = 2.0,
) -> DataFrame:
    """Daily-count anomalies: (group, day, cnt, mu, sigma, z, is_anomaly).

    Rows with fewer than ``min_prior`` prior days, or a degenerate
    (zero-variance) trailing window, carry NULL z and are never flagged.
    """
    if window < 1:
        raise ValueError(f"trailing_zscore: window must be >= 1, got {window}")
    daily = df.groupBy(
        F.col(group_col).alias("grp"), F.date_trunc("DAY", F.col(ts_col)).alias("day")
    ).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(-window, -1)
    )
    mu = F.avg("cnt").over(w)
    sigma = F.stddev_pop("cnt").over(w)
    nprior = F.count("cnt").over(w)
    z = F.when(
        (nprior >= min_prior) & (sigma > 0), (F.col("cnt") - mu) / sigma
    )
    return daily.select(
        F.col("grp").alias(group_col),
        "day",
        "cnt",
        F.when(nprior >= min_prior, F.round(mu, 6)).alias("mu"),
        F.when(nprior >= min_prior, F.round(sigma, 6)).alias("sigma"),
        F.round(z, 4).alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )


def cusum_changepoint(
    df: DataFrame, group_col: str, ts_col: str
) -> DataFrame:
    """CUSUM changepoint screen over daily counts (Page 1954, public):
    per group, S_t = Σ_{u≤t}(cnt_u − mean), the most likely single level
    shift sits at argmax|S| — returns (group, n_days, mean_cnt, max_abs_cusum,
    cp_day) with ties on the earliest day.

    Two partitioned windows (running sum + argmax), both bounded by the
    group's day count; the mean rides a broadcast join-back."""
    daily = df.groupBy(
        F.col(group_col).alias("grp"), F.date_trunc("DAY", F.col(ts_col)).alias("day")
    ).agg(F.count("*").alias("cnt"))
    means = daily.groupBy("grp").agg(
        F.avg("cnt").alias("mu"), F.count("*").alias("n_days")
    )
    wsum = Window.partitionBy("grp").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    s = daily.join(F.broadcast(means), "grp").withColumn(
        "cusum", F.sum(F.col("cnt") - F.col("mu")).over(wsum)
    )
    wmax = Window.partitionBy("grp").orderBy(F.abs("cusum").desc(), F.col("day").asc())
    return (
        s.withColumn("_rn", F.row_number().over(wmax))
        .where(F.col("_rn") == 1)
        .select(
            F.col("grp").alias(group_col),
            F.col("n_days").cast("long").alias("n_days"),
            F.round("mu", 6).alias("mean_cnt"),
            F.round(F.abs("cusum"), 6).alias("max_abs_cusum"),
            F.col("day").alias("cp_day"),
        )
    )


def seasonal_decomposition(
    df: DataFrame, group_col: str, ts_col: str, period_window: int = 3
) -> DataFrame:
    """Additive seasonal decomposition of daily counts per group:
    cnt = trend + seasonal + residual, with

    * trend: centered (2·period_window+1)-day moving average (edges use
      the partial window — deterministic, no NULL band);
    * seasonal: mean detrended value per (group, weekday 0=Mon);
    * residual: what's left.

    One partitioned bounded window plus one weekday-keyed aggregate —
    the classical-decomposition shape (Macaulay 1931) without the STL
    loess loops, which keeps every value an exact function both engines
    replay. Returns (group, day, cnt, trend, seasonal, residual)."""
    daily = df.groupBy(
        F.col(group_col).alias("grp"), F.date_trunc("DAY", F.col(ts_col)).alias("day")
    ).agg(F.count("*").alias("cnt"))
    w = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(-period_window, period_window)
    )
    t = daily.withColumn("trend", F.avg("cnt").over(w)).withColumn(
        "dow", F.weekday("day")
    )
    seas = t.groupBy("grp", "dow").agg(
        F.avg(F.col("cnt") - F.col("trend")).alias("seasonal")
    )
    return (
        t.join(F.broadcast(seas), ["grp", "dow"])
        .select(
            F.col("grp").alias(group_col),
            "day",
            "cnt",
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 4).alias("seasonal"),
            F.round(F.col("cnt") - F.col("trend") - F.col("seasonal"), 4).alias("residual"),
        )
    )
