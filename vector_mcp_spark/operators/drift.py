"""Distribution-drift diagnostics: PSI and the two-sample KS statistic.

Training-data pipelines re-ingest corpora continuously; before a new slice
is admitted, its feature distributions are compared against the standing
reference (the "population stability index" gate common in production ML
monitoring, and the Kolmogorov–Smirnov distance for continuous features).
The reference repo has no analytics of its own (it delegates storage to
vector DBs), so these are part of the beyond-parity pipeline surface.

Scale shapes:

* PSI — ONE scan with conditional aggregation into a fixed number of
  equal-width bins (global lo/hi ride in as a broadcast one-row frame, the
  benign broadcast-scalar cross join used across the suite). The shuffle is
  |bins| rows; nothing about it grows with corpus size.
* KS — the empirical CDFs are built per VALUE BUCKET (values quantized by
  ``floor(value * 10^q)``), never per row: bucket partial counts are
  aggregated map-side, bucket ranges get driver-side offsets (bounded by
  the value range, same pattern as operators/rank.py:60), and the
  cumulative sum runs in a window PARTITIONED by range — no unpartitioned
  ordered window, no single-task funnel at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Probability floor for PSI terms: an empty bin on one side would send
# ln(p_cur/p_ref) to ±inf; the standard practice is clamping to a small
# epsilon so the term stays finite (and large, flagging the bin).
_PSI_EPS = 1e-6


def psi_bins(
    df: DataFrame,
    value_col: str,
    is_current: F.Column,
    n_bins: int = 8,
) -> DataFrame:
    """Population Stability Index between the reference slice (rows where
    ``is_current`` is false) and the current slice, over ``n_bins``
    equal-width bins of ``value_col``.

    Returns one row per bin: (bin, n_ref, n_cur, p_ref, p_cur, psi_term),
    psi_term = (p_cur - p_ref) * ln(p_cur / p_ref) with epsilon-clamped
    probabilities. Sum of psi_term = the PSI (< 0.1 stable, > 0.25 drifted
    by the usual rule of thumb). Bin edges come from the GLOBAL min/max so
    both slices share the same grid; works for integer AND continuous
    columns (width = (hi-lo)/n, the max value clamps into the top bin; a
    constant column degenerates to one bin).
    """
    bounds = df.agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    flagged = df.select(
        F.col(value_col).alias("_v"), is_current.cast("boolean").alias("_cur")
    ).where(F.col("_v").isNotNull()).crossJoin(F.broadcast(bounds))
    # equal-width bins over [lo, hi]; greatest() guards the constant-column
    # case (hi == lo → zero width → all rows bin 0 via the least() clamp)
    width = F.greatest(
        (F.col("_hi") - F.col("_lo")).cast("double") / F.lit(float(n_bins)),
        F.lit(1e-300),
    )
    bin_col = F.least(
        F.lit(n_bins - 1),
        F.floor((F.col("_v") - F.col("_lo")).cast("double") / width).cast("int"),
    )
    counts = (
        flagged.groupBy(bin_col.alias("bin"))
        .agg(
            F.sum(F.when(~F.col("_cur"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("_cur"), 1).otherwise(0)).alias("n_cur"),
        )
    )
    totals = counts.agg(
        F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc")
    )
    p_ref = F.greatest(F.col("n_ref") / F.col("_tr"), F.lit(_PSI_EPS))
    p_cur = F.greatest(F.col("n_cur") / F.col("_tc"), F.lit(_PSI_EPS))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            F.col("bin").cast("int").alias("bin"),
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            F.round(p_ref, 6).alias("p_ref"),
            F.round(p_cur, 6).alias("p_cur"),
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 4).alias("psi_term"),
        )
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    in_a: F.Column,
    in_b: F.Column,
    quantize: int = 3,
    range_bits: int = 12,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the ``value_col``
    distributions of slice A (rows where ``in_a``) and slice B.

    Values are quantized to ``floor(value * 10^quantize)`` buckets first
    (ties inside a bucket are indistinguishable — the statistic is exact on
    the quantized distributions). Returns ONE row: (n_a, n_b, ks_d).

    Distributed CDF without a global window: bucket counts → coarse range =
    bucket >> range_bits → per-range totals collected driver-side (bounded
    by the value range, not the row count — same justification as
    operators/rank.py:60) → running sums inside a range-partitioned window
    plus the broadcast range offset.
    """
    scale = float(10**quantize)
    b = F.floor(F.col(value_col) * F.lit(scale)).cast("long")
    sliced = (
        df.where(F.col(value_col).isNotNull())  # a NULL bucket would poison
        .select(                                # the driver-side range sort
            b.alias("_b"),
            in_a.cast("int").alias("_a"),
            in_b.cast("int").alias("_in_b"),
        )
        .where((F.col("_a") == 1) | (F.col("_in_b") == 1))
    )
    counts = (
        sliced.groupBy("_b")
        .agg(F.sum("_a").alias("_ca"), F.sum("_in_b").alias("_cb"))
        .withColumn("_r", F.shiftright(F.col("_b"), range_bits))
    )
    counts = counts.localCheckpoint(eager=True)  # feeds offsets + ranked pass
    per_range = {
        r._r: (r.ca, r.cb)
        for r in counts.groupBy("_r")
        .agg(F.sum("_ca").alias("ca"), F.sum("_cb").alias("cb"))
        .collect()
    }
    off_a: dict[int, int] = {}
    off_b: dict[int, int] = {}
    acc_a = acc_b = 0
    for r in sorted(per_range):
        off_a[r], off_b[r] = acc_a, acc_b
        acc_a += per_range[r][0]
        acc_b += per_range[r][1]
    n_a, n_b = acc_a, acc_b
    if n_a == 0 or n_b == 0:
        # an empty slice has no CDF; dividing through would return ks_d=NaN
        # and a silent "no drift" — fail loudly instead (ADVICE r8)
        raise ValueError(
            f"ks_two_sample requires non-empty slices (n_a={n_a}, n_b={n_b})"
        )
    map_a = F.create_map(*[x for r, o in off_a.items() for x in (F.lit(r), F.lit(o))])
    map_b = F.create_map(*[x for r, o in off_b.items() for x in (F.lit(r), F.lit(o))])
    w = Window.partitionBy("_r").orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    cdf_a = (map_a[F.col("_r")] + F.sum("_ca").over(w)).cast("double") / F.lit(float(n_a))
    cdf_b = (map_b[F.col("_r")] + F.sum("_cb").over(w)).cast("double") / F.lit(float(n_b))
    return (
        counts.select(F.abs(cdf_a - cdf_b).alias("_d"))
        .agg(F.round(F.max("_d"), 4).alias("ks_d"))
        .select(
            F.lit(n_a).cast("long").alias("n_a"),
            F.lit(n_b).cast("long").alias("n_b"),
            "ks_d",
        )
    )
