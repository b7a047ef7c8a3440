"""Scan-parallelism guard for CPU-heavy map stages (guide §2.5) and the
shared materialization helpers for iterative operators.

A small collection read from one parquet file is ONE scan partition — and a
tokenize / sha256 / nested-HOF map stage planned on top of it runs on one
core no matter how many the session has. ``spread`` round-robins such an
input across ``defaultParallelism`` partitions first.

It is a no-op whenever the input is big enough that the scan already splits
to ≥ defaultParallelism partitions — i.e. always at real scale, where a
blind repartition would be a huge unneeded shuffle; locally the shuffled
bytes are the (tiny) raw input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate of ``df`` (file-size sum for scans) — a
    driver-side optimizer pass, NO physical planning, no RDD conversion,
    no job."""
    try:
        return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))  # noqa: SLF001
    except Exception:  # noqa: BLE001 — any py4j hiccup: fall back to "unknown"
        return None


def spread(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to defaultParallelism iff its scan would have
    fewer splits than that.

    The decision reads Catalyst's size estimate (for a parquet scan: the
    file-size sum) against ``spark.sql.files.maxPartitionBytes`` — the
    split math the scan itself uses — instead of materializing
    ``df.rdd.getNumPartitions()``, which paid a full physical-planning +
    RDD-conversion py4j round-trip on EVERY call even at real scale where
    the answer is always "no-op" (r14; the driver-latency class r13 §1
    eliminated from the vector builders). Unknown size repartitions (the
    conservative local default: only tiny inline frames lack stats).
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes").rstrip("b"))
    except (TypeError, ValueError):
        max_split = 128 * 1024 * 1024
    size = _plan_size_bytes(df)
    if size is not None and size >= target * max_split:
        return df
    return df.repartition(target)


def pin_counted(df: DataFrame) -> tuple[DataFrame, int]:
    """Eagerly localCheckpoint ``df`` and return (pinned frame, row count).

    The count is one trivial job over the just-cached partitions; iterative
    operators use it both as their fixpoint probe and to gate broadcast
    hints on MEASURED sizes (see :func:`bcast_if_fits`) — a checkpoint leaf
    alone advertises no statistics, so joins against it plan sort-merge
    and AQE sinks shuffle stages it later abandons for broadcast.
    """
    df = df.localCheckpoint(eager=True)
    return df, df.count()


def bcast_if_fits(df: DataFrame, n_rows: int, row_bytes: int = 64) -> DataFrame:
    """Hint broadcast iff ``n_rows``·``row_bytes`` fits the session's own
    autoBroadcastJoinThreshold. With a MEASURED row count this is
    scale-adaptive, not a local tune: at 100 TB the same frames outgrow
    the threshold, no hint fires, and sort-merge shuffles are real work."""
    try:
        limit = int(df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    except (TypeError, ValueError):
        limit = 10 * 1024 * 1024
    return F.broadcast(df) if 0 <= n_rows * row_bytes <= limit else df
