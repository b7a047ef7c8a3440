"""Scan-parallelism guard for CPU-heavy map stages (guide §2.5).

A small collection read from one parquet file is ONE scan partition — and a
tokenize / sha256 / nested-HOF map stage planned on top of it runs on one
core no matter how many the session has. ``spread`` round-robins such an
input across ``defaultParallelism`` partitions first.

It is a no-op whenever the scan already has ≥ defaultParallelism partitions
— i.e. always at real scale, where a blind repartition would be a huge
unneeded shuffle; locally the shuffled bytes are the (tiny) raw input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to defaultParallelism iff it has fewer partitions."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
