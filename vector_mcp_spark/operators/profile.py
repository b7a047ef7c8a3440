"""Column profiling: the pre-training data-quality dashboard.

Before a 100 TB corpus feeds a training run, every numeric column gets a
profile pass — row/null counts, range, exact totals — to catch schema
drift, unit changes, and null storms early. The reference has no profiling
surface (scope stops at retrieval); this is a §2.4 scale extension.

Shape: ``unpivot`` (map-side explode to long form, no shuffle) → ONE
hash-partitioned groupBy over |cols| keys with full partial aggregation —
one pass over the table regardless of how many columns are profiled,
instead of |cols| separate scans. Sums run in DECIMAL so the totals are
exact and deterministic under any partition order (double sums drift in
the last bits across partition schedules; decimal doesn't).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUM_DECIMAL = "decimal(28,6)"


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per column: (col_name, n_rows, n_nulls, min_val, max_val, sum_val,
    mean_val). Totals aggregate exactly in DECIMAL, then project to DOUBLE
    (one deterministic rounding); mean is 6 dp over non-null rows."""
    if not cols:
        raise ValueError("cols must be non-empty")
    longf = df.unpivot([], list(cols), "col_name", "_v")
    exact_sum = F.sum(F.col("_v").cast(_SUM_DECIMAL))
    return longf.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("_v").isNull(), 1).otherwise(0)).cast("long").alias("n_nulls"),
        F.min("_v").cast("double").alias("min_val"),
        F.max("_v").cast("double").alias("max_val"),
        exact_sum.cast("double").alias("sum_val"),
        F.round(exact_sum.cast("double") / F.count("_v"), 6).alias("mean_val"),
    )
