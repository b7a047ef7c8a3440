"""Change tracking: snapshot diff and SCD2 validity intervals.

Two warehouse primitives every 100 TB lake needs around its tables:

- ``snapshot_diff`` — what changed between two snapshots of a keyed table
  (the audit before promoting a rewrite, the CDC feed when the source has
  none). One full outer join on the key; change detection compares a
  content hash of the tracked columns, so wide rows never shuffle twice.
- ``scd2_intervals`` — collapse an event stream of observed states into
  slowly-changing-dimension type-2 validity intervals: one row per
  (key, state) RUN with [valid_from, valid_to) bounds, current rows open
  (null valid_to). Pure window functions over (key, ts) — one shuffle,
  state never leaves the executors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "id",
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """(id, change) with change ∈ inserted | deleted | changed | unchanged.

    ``compare_cols`` defaults to every non-key column of ``new``. Rows
    compare by a sha256 over the stringified tracked columns (null-safe:
    NULL encodes as a sentinel distinct from any value), so the join
    carries (id, 64-hex) — never the full row."""
    cols = list(compare_cols) if compare_cols is not None else [
        c for c in new.columns if c != id_col
    ]

    def fingerprint(df: DataFrame) -> DataFrame:
        parts = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols
        ]
        return df.select(
            F.col(id_col).alias("id"), F.sha2(F.concat_ws("\x01", *parts), 256).alias("fp")
        )

    o = fingerprint(old).withColumnRenamed("fp", "fp_old")
    n = fingerprint(new).withColumnRenamed("fp", "fp_new")
    joined = o.join(n, "id", "full_outer")
    change = (
        F.when(F.col("fp_old").isNull(), "inserted")
        .when(F.col("fp_new").isNull(), "deleted")
        .when(F.col("fp_old") != F.col("fp_new"), "changed")
        .otherwise("unchanged")
    )
    return joined.select("id", change.alias("change"))


def scd2_intervals(
    observations: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str = "ts",
) -> DataFrame:
    """(key, state, valid_from, valid_to, is_current) — one row per state
    RUN in each key's timeline.

    Consecutive observations with the same state merge into one interval
    (run-start detection via lag); ``valid_to`` is the next run's start
    (half-open, so intervals tile without overlap); the last run per key
    is open-ended with ``is_current`` true. Ties on ts within a key order
    by state for determinism."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(state_col).asc())
    runs = (
        observations.select(key_col, state_col, ts_col)
        .withColumn("_prev", F.lag(state_col).over(w))
        .withColumn(
            "_start",
            (F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col))).cast("int"),
        )
    )
    starts = runs.where(F.col("_start") == 1).select(
        F.col(key_col).alias("key"),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
    )
    w2 = Window.partitionBy("key").orderBy(F.col("valid_from").asc(), F.col("state").asc())
    return starts.withColumn("valid_to", F.lead("valid_from").over(w2)).select(
        "key",
        "state",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def snapshot_asof(
    changelog: DataFrame,
    asof,
    key_col: str = "id",
    ts_col: str = "ts",
    op_col: str | None = None,
    tiebreak_col: str | None = None,
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Time-travel read: reconstruct a keyed table's state AS OF ``asof``
    from an upsert/delete changelog — the Delta/Iceberg ``VERSION AS OF``
    semantics re-expressed over a raw append log (the form a lake has
    BEFORE adopting a table format).

    Per key, the surviving row is the one with the greatest
    (``ts_col``, ``tiebreak_col``) at or before ``asof``; keys whose last
    operation is ``op_col == 'delete'`` are absent from the snapshot.
    Returns (key, *payload_cols, n_versions) where n_versions counts the
    changelog entries the key accumulated up to the cut.

    Scale shape: filter (partition-prunable when the log is ts-partitioned,
    so a year-old snapshot never scans this week's files) then ONE
    groupBy(key).agg(max_by) — map-side partial aggregation, no window
    sort, no shuffle beyond the key hash. This beats the row_number()
    window form at 100 TB: max_by combines within every input partition
    first, so the shuffle carries one candidate row per (partition, key)
    instead of every version of every key.
    """
    payload = list(payload_cols) if payload_cols is not None else [
        c for c in changelog.columns if c not in (key_col,)
    ]
    cut = changelog.where(F.col(ts_col) <= F.lit(asof))
    order = (
        F.struct(F.col(ts_col), F.col(tiebreak_col))
        if tiebreak_col
        else F.col(ts_col)
    )
    agg = cut.groupBy(key_col).agg(
        F.max_by(F.struct(*payload), order).alias("_last"),
        F.count("*").alias("n_versions"),
    )
    if op_col is not None:
        # null-safe: a NULL op is a plain upsert (common CDC shape where
        # only deletes are marked), not a row to drop
        agg = agg.where(~F.col(f"_last.{op_col}").eqNullSafe("delete"))
    return agg.select(
        key_col,
        *[F.col(f"_last.{c}").alias(c) for c in payload if c != op_col],
        "n_versions",
    )
