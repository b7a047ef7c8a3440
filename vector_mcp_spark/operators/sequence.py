"""Ordered-event-sequence analytics: funnel stages and activity gap-filling.

Both are single-shuffle plans designed for the 100 TB case:

* ``funnel_stages`` — ONE groupBy(user) collects the (ts, stage-index)
  events, then a codegen'd ``aggregate`` fold walks them in time order
  advancing a stage counter. No per-stage self-joins (the naive funnel is
  k−1 joins = k−1 shuffles); state per user is its own event list, so skew
  is bounded by the hottest user, not the corpus.
* ``activity_gap_days`` — per-key date spine via ``sequence()`` + explode,
  anti-joined against observed active days. The spine explode is linear in
  (keys × span days) and generated map-side from the aggregated span row —
  the standard gap-filling shape for time-series training data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ordered-funnel progress: the stage counter advances when the
    next event (in ``(ts, stage-index)`` order) matches the stage it is
    waiting for. Returns one row per user having at least one funnel-typed
    event: ``(user, stage_reached ∈ [0, len(stages)], n_funnel_events)``.

    Greedy first-witness matching equals the classic sequential
    min-timestamp formulation (each stage's earliest occurrence after the
    previous stage's witness), which is how the oracle replays it. Ties at
    identical timestamps resolve in stage order — declared semantics.
    """
    stage_list = list(stages)
    idx = F.lit(None).cast("int")
    for i, s in reversed(list(enumerate(stage_list))):
        idx = F.when(F.col(type_col) == s, F.lit(i)).otherwise(idx)
    per_user = (
        df.where(F.col(type_col).isin(stage_list))
        .select(F.col(user_col), F.struct(F.col(ts_col).alias("ts"), idx.alias("idx")).alias("_e"))
        .groupBy(user_col)
        .agg(F.array_sort(F.collect_list("_e")).alias("_evs"))
    )
    fold = F.aggregate(
        F.transform(F.col("_evs"), lambda e: e["idx"]),
        F.lit(0),
        lambda acc, x: F.when(x == acc, acc + 1).otherwise(acc),
    )
    return per_user.select(
        F.col(user_col),
        fold.alias("stage_reached"),
        F.size("_evs").alias("n_funnel_events"),
    )


def activity_gap_days(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Days inside each key's [first, last] activity span with NO events:
    ``(key, gap_day)``. One row per missing day — the rows a gap-filling /
    resampling pipeline would need to synthesize."""
    days = df.select(F.col(key_col), F.to_date(ts_col).alias("day")).distinct()
    spans = days.groupBy(key_col).agg(F.min("day").alias("_d0"), F.max("day").alias("_d1"))
    spine = spans.select(
        F.col(key_col),
        F.explode(F.sequence(F.col("_d0"), F.col("_d1"), F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    return spine.join(days, [key_col, "day"], "left_anti").select(
        F.col(key_col), F.col("day").alias("gap_day")
    )


def markov_transitions(
    df: DataFrame,
    group_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-group event sequences:
    (src, dst, n, p) with p row-normalized over src.

    One partitioned lag window builds the (state, next-state) pairs — the
    same single-shuffle shape as the funnel/gap operators; the pair counts
    are |states|²-bounded so the normalization join broadcasts. Ordering
    ties break on ``tiebreak_col`` to keep the matrix deterministic."""
    w = Window.partitionBy(group_col).orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    pairs = (
        df.withColumn("_nxt", F.lead(state_col).over(w))
        .where(F.col("_nxt").isNotNull())
        .groupBy(F.col(state_col).alias("src"), F.col("_nxt").alias("dst"))
        .agg(F.count("*").alias("n"))
    )
    row_tot = pairs.groupBy("src").agg(F.sum("n").alias("tot"))
    return (
        pairs.join(F.broadcast(row_tot), "src")
        .select("src", "dst", "n", F.round(F.col("n") / F.col("tot"), 6).alias("p"))
    )
