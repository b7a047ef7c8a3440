"""Poisson bootstrap confidence intervals (Chamandy et al. 2012, public).

The distributed bootstrap: a classical resample-with-replacement needs
coordinated sampling of N rows, but for large N the multinomial count of
each row in a replicate converges to Poisson(1) — so every row can draw
its own per-replicate multiplicity INDEPENDENTLY, map-side, from a hash.
Replicate statistics then aggregate normally and the spread of the B
replicate means is the sampling distribution of the estimator.

Determinism: the multiplicity comes from a sha256-derived uniform pushed
through the inlined inverse CDF of Poisson(1) (thresholds are literal
constants), so ANSI SQL replays every draw bit-for-bit. The explode is
×B, but the shuffle after partial aggregation is |groups|·B rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_mcp_spark.operators.partition import spread

# cumulative P(X <= k) for X ~ Poisson(1), k = 0..5; u beyond the last
# threshold draws multiplicity 6 (P ≈ 6e-5 — negligible truncation)
POISSON1_CDF = [
    round(math.exp(-1) * sum(1 / math.factorial(i) for i in range(k + 1)), 12)
    for k in range(6)
]


def _u01(cols, salt: str):
    h = F.sha2(F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in cols]), 256)
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("double") / float(16**15)




def _poisson1(u):
    k = F.lit(6)
    for kk in range(5, -1, -1):
        k = F.when(u < F.lit(POISSON1_CDF[kk]), F.lit(kk)).otherwise(k)
    return k


def bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    replicates: int = 20,
    lo: float = 0.05,
    hi: float = 0.95,
    salt: str = "boot",
) -> DataFrame:
    """Per-group bootstrap CI of the mean: (group, n, mean, ci_lo, ci_hi).

    ``replicates`` Poisson resamples; each row draws its per-replicate
    multiplicity from sha256(salt | _row_id | b), so the caller must
    supply a unique ``_row_id`` column (any stable row key). CI bounds
    are the interpolated [lo, hi] percentiles of the replicate means,
    rounded 4 dp (quotients of order-dependent sums). A replicate that
    draws total weight 0 yields a NULL mean and drops out of the
    percentile — probability (1/e)^|group|, nil for real groups."""
    if not 2 <= replicates <= 512:
        raise ValueError(f"bootstrap_mean_ci: replicates must be in [2, 512], got {replicates}")
    if "_row_id" not in df.columns:
        raise ValueError("bootstrap_mean_ci: df must carry a unique _row_id column")
    # spread: the ×B explode + sha-per-8-draws map stage must not be pinned to
    # a single-partition scan (guide §2.5); no-op at real scale
    df = spread(df)
    v = F.col(value_col).cast("double")
    # the resample explode is ×B, and sha256 per DRAW would dominate it at
    # corpus scale — slice 8 draws of 32 bits each from one shared digest
    # (digest index (b-1) div 8, hex offset ((b-1) mod 8)·8 + 1): a row
    # pays ceil(B/8) hashes instead of B, and the slice arithmetic is
    # plain SQL so the oracle replays every draw bit-for-bit
    reps = (
        df.select(
            F.col(group_col).alias("grp"), v.alias("v"), "_row_id",
            F.explode(F.sequence(F.lit(1), F.lit(replicates))).alias("b"),
        )
        .withColumn("_d", ((F.col("b") - 1) / 8).cast("int"))
        .withColumn(
            "_h",
            F.sha2(
                F.concat_ws(
                    "|", F.lit(salt), F.col("_row_id").cast("string"),
                    F.lit("d"), F.col("_d").cast("string"),
                ),
                256,
            ),
        )
        .withColumn("_off", ((F.col("b") - 1) % 8) * 8 + 1)
        .withColumn(
            "_u",
            F.conv(F.expr("substring(_h, cast(_off AS int), 8)"), 16, 10).cast("double")
            / float(2**32),
        )
        .withColumn("k", _poisson1(F.col("_u")))
    )
    # try_divide: ANSI mode is on (Spark 4 default) — a zero-weight
    # replicate must yield NULL-and-drop (matching the oracle's x/0 -> NULL),
    # not DIVIDE_BY_ZERO
    rep_means = reps.groupBy("grp", "b").agg(
        F.try_divide(F.sum(F.col("k") * F.col("v")), F.sum("k")).alias("m")
    )
    ci = rep_means.groupBy("grp").agg(
        F.round(F.percentile(F.col("m"), F.lit(lo)), 4).alias("ci_lo"),
        F.round(F.percentile(F.col("m"), F.lit(hi)), 4).alias("ci_hi"),
    )
    base = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n"), F.round(F.avg(v), 4).alias("mean")
    )
    return base.join(ci, "grp").select(
        F.col("grp").alias(group_col), "n", "mean", "ci_lo", "ci_hi"
    )
