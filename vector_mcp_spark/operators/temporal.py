"""Temporal join operators Spark lacks natively: as-of join and range join.

The reference has no temporal surface (SURVEY.md §2.4); these are north-star
extensions for time-series / training-data pipelines (hypertable-style
"latest reading at time t" lookups, trailing-window feature counts).

Design (Spark-first, no cross join):

* ``asof_join`` uses the classic distributed merge trick — union both sides
  tagged, sort within each key partition by timestamp, and carry the most
  recent right-side payload forward with ``last(..., ignorenulls=True)`` over
  an unbounded-preceding window. Cost: ONE shuffle on the join keys plus a
  per-partition sort — the same shape as a sort-merge join, so it scales to
  100 TB the way Spark's own SMJ does. No per-row lookups, no O(L×R)
  intermediate (a naive ``ON l.key = r.key AND r.ts <= l.ts`` equi+range join
  explodes to every qualifying pair before picking the max).

* ``range_join_count`` aggregates right-side rows falling in
  ``[l.ts - before, l.ts + after]`` per left row. Implemented by bucketing
  both sides to coarse time buckets (width ≥ before+after) so the join is an
  equi-join on (keys, bucket) over at most 2 buckets per right row — Catalyst
  executes it as a shuffled hash/SMJ, never a broadcast-nested-loop.

Skew note: one hot key (a bot user) concentrates its partition; both
operators accept pre-salted keys (add a salt column to ``on``) since the
window/agg composes per key tuple.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_TAG = "__asof_tag"
_PAYLOAD = "__asof_payload"


def _micros(col: Column) -> Column:
    """``unix_micros`` that also accepts TIMESTAMP_NTZ input (parquet written
    with non-UTC-adjusted timestamps reads as NTZ; ``unix_micros`` requires
    TIMESTAMP). The cast interprets the wall clock in the session timezone —
    consistent for bucketing since every row shifts identically."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
    tolerance: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the latest right row with ``right_ts <=
    left_ts`` sharing the ``on`` keys (backward as-of, inclusive), like
    DuckDB/kdb ASOF JOIN or pandas ``merge_asof``.

    Right columns come back as ``{prefix}{col}`` plus ``{prefix}{right_ts}``.
    Ties at equal ``right_ts`` pick the greatest ``tiebreak`` value so results
    are deterministic. ``tolerance`` (an INTERVAL string, e.g. ``"2 days"``)
    drops matches older than ``left_ts - tolerance``. Left rows with no match
    are dropped (inner semantics).
    """
    on = list(on)
    order_cols: list[Column] = [F.col(_TS).asc(), F.col(_TAG).asc()]
    if tiebreak:
        # right rows carry the tiebreak; left rows sort after them anyway
        order_cols.append(F.col("__asof_tb").asc_nulls_first())

    payload = F.struct(F.col(right_ts).alias(right_ts), *[F.col(c) for c in right_cols])
    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_TAG),
        (F.col(tiebreak) if tiebreak else F.lit(None).cast("long")).alias("__asof_tb"),
        payload.alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_TAG),
        F.lit(None).cast("long").alias("__asof_tb"),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    # right rows (tag 0) sort before left probes (tag 1) at equal ts →
    # the inequality is inclusive; last() carries the match forward
    w = (
        Window.partitionBy(*on)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__match", F.last(_PAYLOAD, ignorenulls=True).over(w))
        .where(F.col(_TAG) == 1)
        .where(F.col("__match").isNotNull())
    )
    if tolerance:
        matched = matched.where(
            F.col("__match")[right_ts] >= F.col(_TS) - F.expr(f"INTERVAL {tolerance}")
        )
    out_left = [F.col(f"__l_{c}").alias(c) for c in left.columns if c not in on]
    out_right = [F.col("__match")[right_ts].alias(f"{prefix}{right_ts}")] + [
        F.col("__match")[c].alias(f"{prefix}{c}") for c in right_cols
    ]
    return matched.select(*on, *out_left, *out_right)


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    before_s: int,
    after_s: int,
    value_col: str | None = None,
) -> DataFrame:
    """Per left row: count (and optionally sum ``value_col`` of) right rows
    with ``right_ts`` in ``[left_ts - before_s, left_ts + after_s]`` (bounds
    in seconds, inclusive) and equal ``on`` keys.

    Bucketed band join: time is cut into coarse buckets of width
    ``before_s + after_s``. A left row's window ``[t-before, t+after]`` has
    exactly that width, so it spans exactly two adjacent buckets — the left
    probes are exploded into those two, the (big) right side keeps its single
    bucket, and the range predicate becomes an equi-join on (keys, bucket)
    Catalyst shuffles normally — never a broadcast-nested-loop — with the
    residual interval filter pruning false candidates post-join. Each
    matching pair appears exactly once (right rows live in one bucket; the
    two left copies sit in distinct buckets). Left rows with no right rows
    in range keep count 0 via the final left join back onto ``left``.
    """
    on = list(on)
    width_us = (before_s + after_s) * 1_000_000
    if width_us <= 0:
        raise ValueError("before_s + after_s must be > 0")
    lo = F.col(f"l_{left_ts}") - F.expr(f"INTERVAL {before_s} SECOND")
    hi = F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {after_s} SECOND")

    # distinct BEFORE exploding buckets: duplicate (on, ts) left rows would
    # each join the same matches and the groupBy below would multiply
    # n_in_range/sum by the duplicate count
    base = left.select(*on, F.col(left_ts).alias(f"l_{left_ts}")).distinct()
    lb = (
        base.withColumn("__b0", F.floor((_micros(lo)) / F.lit(width_us)))
        .withColumn("__bucket", F.explode(F.array(F.col("__b0"), F.col("__b0") + 1)))
        .drop("__b0")
    )
    rb = right.select(
        *on,
        F.col(right_ts).alias(f"r_{right_ts}"),
        *([F.col(value_col)] if value_col else []),
    ).withColumn("__bucket", F.floor(_micros(F.col(f"r_{right_ts}")) / F.lit(width_us)))
    joined = lb.join(rb, [*on, "__bucket"]).where(
        (F.col(f"r_{right_ts}") >= lo) & (F.col(f"r_{right_ts}") <= hi)
    )
    aggs = [F.count("*").alias("n_in_range")]
    if value_col:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
    counted = joined.groupBy(*on, f"l_{left_ts}").agg(*aggs)
    out = base.join(counted, [*on, f"l_{left_ts}"], "left").select(
        *on,
        F.col(f"l_{left_ts}").alias(left_ts),
        F.coalesce(F.col("n_in_range"), F.lit(0)).alias("n_in_range"),
        *(
            [F.coalesce(F.col(f"sum_{value_col}"), F.lit(0.0)).alias(f"sum_{value_col}")]
            if value_col
            else []
        ),
    )
    return out


def time_weighted_average(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    horizon_col: str | None = None,
) -> DataFrame:
    """TWAP per key group: each observation holds its value until the next
    observation (duration-weighted mean), the last one until the group's
    max timestamp — so a value that stood for an hour counts 60× one that
    stood for a minute, which a plain AVG gets wrong on irregular series.

    One window pass (lead + max over the key partition), one grouped agg.
    Output: key columns + (twap, n_obs, span_seconds). Groups whose
    observations all share one timestamp have zero span and a NULL twap
    (no duration to weight by — emitted, not dropped, so the caller sees
    them). ``horizon_col`` optionally supplies a per-row group end bound
    instead of the observed max."""
    from pyspark.sql import Window

    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), F.col(value_col).asc())
    wall = Window.partitionBy(*keys)
    end = F.col(horizon_col) if horizon_col else F.max(ts_col).over(wall)
    nxt = F.coalesce(F.lead(ts_col).over(w), end)
    dur = (_micros(nxt) - _micros(F.col(ts_col))).cast("double") / 1e6
    weighted = df.select(
        *keys,
        F.col(value_col).alias("_v"),
        dur.alias("_dur"),
    )
    return weighted.groupBy(*keys).agg(
        (F.sum(F.col("_v") * F.col("_dur")) / F.nullif(F.sum("_dur"), F.lit(0.0))).alias(
            "twap"
        ),
        F.count("*").alias("n_obs"),
        F.round(F.sum("_dur"), 6).alias("span_seconds"),
    )


def ohlc_bars(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: Sequence[str] = ("user_id",),
    tie_col: str = "event_id",
) -> DataFrame:
    """Open/high/low/close bars per key group (the hypertable/financial
    ``time_bucket + first/last`` rollup the reference's external engines
    expose; no analogue in `/root/reference` — north-star time-series op).

    ``open``/``close`` are ``min_by``/``max_by`` over the composite order key
    ``struct(ts, tie)`` — a single hash aggregate with map-side partial
    combine, NO window and NO per-group sort, so the plan is one shuffle on
    the bar keys and scales like any groupBy. The struct tie-breaker makes
    the pick deterministic when timestamps collide (ties broken by
    ``tie_col``, assumed unique). ``volume`` is rounded to 4 dp because a
    float sum's value depends on partial-aggregation order.
    """
    keys = [F.col(k) for k in key_cols]
    order = F.struct(F.col(ts_col), F.col(tie_col))
    return df.groupBy(*keys).agg(
        F.min_by(value_col, order).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, order).alias("close"),
        F.count("*").alias("n_events"),
        F.round(F.sum(value_col), 4).alias("volume"),
    )


def autocorrelation(
    events: DataFrame,
    max_lag: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_agg: Column | None = None,
) -> DataFrame:
    """Per-key autocorrelation function of the daily series at lags
    1..max_lag (the hypertable/time-series diagnostic next to the
    seasonal-decomposition and CUSUM operators):

        r_k = Σ_t (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²

    with x_t the per-day aggregate (count(*) by default, ``value_agg``
    otherwise) over the key's observed span — days with no events count as
    x_t = 0, which is what a gap in an activity series means.

    Scale design: the raw table collapses to one row per (key, day) in a
    single partial-aggregated shuffle; everything after runs on that tiny
    frame (keys × days). The lag alignment is a self-equi-join on
    (key, day + k) — never a window over the raw events — so the expensive
    input is touched exactly once regardless of max_lag.
    """
    agg = value_agg if value_agg is not None else F.count("*").cast("double")
    daily = events.groupBy(
        F.col(key_col).alias("key"), F.to_date(ts_col).alias("day")
    ).agg(agg.alias("x"))
    # daily is referenced by span/spine/mean/denom/num — without a
    # materialization each reference re-derives it and the raw events table
    # is scanned four times. The frame is BOUNDED (keys × observed days),
    # so localCheckpoint is the repo's standard cut here: raw input read
    # exactly once, everything downstream runs on the tiny checkpoint.
    daily = daily.localCheckpoint(eager=True)

    # dense day spine per key (bounded: keys × span-days rows)
    span = daily.groupBy("key").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = span.select(
        "key", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    dense = (
        spine.join(daily, ["key", "day"], "left")
        .withColumn("x", F.coalesce(F.col("x"), F.lit(0.0)))
    )

    mean = dense.groupBy("key").agg(F.avg("x").alias("xbar"))
    centered = dense.join(F.broadcast(mean), "key").select(
        "key", "day", (F.col("x") - F.col("xbar")).alias("c")
    )
    denom = centered.groupBy("key").agg(F.sum(F.col("c") * F.col("c")).alias("ss"))

    lags = centered.sparkSession.range(1, max_lag + 1).select(F.col("id").alias("lag"))
    lagged = centered.crossJoin(F.broadcast(lags)).select(
        "key",
        "lag",
        F.date_add(F.col("day"), F.col("lag").cast("int")).alias("day"),
        F.col("c").alias("c_lag"),
    )
    num = (
        centered.join(lagged, ["key", "day"])
        .groupBy("key", "lag")
        .agg(F.sum(F.col("c") * F.col("c_lag")).alias("sp"))
    )
    return (
        num.join(F.broadcast(denom), "key")
        .where(F.col("ss") > 0)
        .select(
            F.col("key"),
            F.col("lag"),
            F.round(F.col("sp") / F.col("ss"), 6).alias("acf"),
        )
        .orderBy("key", "lag")
    )


def ewma_daily(
    events: DataFrame,
    alpha: float,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_agg: Column | None = None,
) -> DataFrame:
    """Per-key exponentially weighted moving average of the daily series
    (pandas ``ewm(alpha, adjust=True)`` semantics over each key's observed
    days in order):

        y_t = Σ_{s≤t} (1−α)^{t−s} x_s / Σ_{s≤t} (1−α)^{t−s}

    Computed WITHOUT recursion: with r = 1−α, i the per-key day ordinal and
    n the key's series length, y_t = Σ x_s·r^{(n−1)−s} / Σ r^{(n−1)−s} —
    two cumulative sums over an ordered window of per-row precomputable
    terms (the common factor r^{(n−1)−t} cancels in the ratio, so this
    equals the r^{−s} form exactly). The per-key (n−1) rescale keeps every
    weight in (0, 1]: pow stays in its well-conditioned range on both
    engines — at r^{−i} magnitudes near e^700 a 1-ulp pow divergence
    between Spark and an ANSI oracle can flip the 6-dp rounding. Weights
    for the OLDEST rows of a long series shrink toward the subnormal
    floor (r^{n−1} underflows where (n−1)·ln(1/r) ≈ 700 and early-row
    ratios would turn 0/0 = NaN), so the span is CHECKED: series longer
    than the α-dependent safe length raise rather than emit garbage —
    e.g. ~2 000 days at α=0.3 but only ~300 at α=0.9; chunk the series or
    lower α past that.

    Scale design: identical to :func:`autocorrelation` — the raw table
    collapses to the bounded (key, day) frame in one partial-aggregated
    shuffle; the cumulative window runs per key on that tiny frame.
    """
    import math

    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    agg = value_agg if value_agg is not None else F.count("*").cast("double")
    daily = events.groupBy(
        F.col(key_col).alias("key"), F.to_date(ts_col).alias("day")
    ).agg(agg.alias("x"))
    # overflow guard on the tiny post-agg frame: one cheap max over keys
    safe_len = int(700.0 / math.log(1.0 / (1.0 - float(alpha))))
    longest = daily.groupBy("key").count().agg(F.max("count")).first()[0] or 0
    if longest > safe_len:
        raise ValueError(
            f"ewma_daily(alpha={alpha}): a key has {longest} observed days; "
            f"the closed form overflows past {safe_len} — chunk the series "
            "or lower alpha"
        )
    w_ord = Window.partitionBy("key").orderBy(F.col("day").asc())
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # full-frame count over the SAME ordered spec (not a bare
    # partitionBy(key) window) so all three window functions share one
    # exchange + sort
    w_all = w_ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    r = 1.0 - float(alpha)
    indexed = daily.withColumn("_i", F.row_number().over(w_ord) - F.lit(1)).withColumn(
        "_n", F.count("*").over(w_all)
    )
    terms = indexed.withColumn(
        "_w", F.pow(F.lit(r), F.col("_n") - F.lit(1) - F.col("_i"))
    )
    return terms.select(
        "key",
        "day",
        F.round(
            F.sum(F.col("x") * F.col("_w")).over(w_cum) / F.sum("_w").over(w_cum), 6
        ).alias("ewma"),
    ).orderBy("key", "day")
