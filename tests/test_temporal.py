"""As-of join + range join edge semantics (operators/temporal.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from vector_mcp_spark.operators.temporal import asof_join, range_join_count


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100, 1.0),
            (1, _ts("2024-01-01 12:00:00"), 101, 2.0),  # tie ts with 102
            (1, _ts("2024-01-01 12:00:00"), 102, 3.0),
            (1, _ts("2024-01-03 00:00:00"), 103, 4.0),
            (2, _ts("2024-01-02 00:00:00"), 200, 5.0),
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00")),  # before any event -> dropped
            (1, _ts("2024-01-01 12:00:00")),  # exactly at tie -> inclusive, max id
            (1, _ts("2024-01-02 12:00:00")),  # between -> carries 12:00 event
            (2, _ts("2024-01-05 00:00:00")),  # long after -> matches, tolerance drops
            (3, _ts("2024-01-01 00:00:00")),  # key with no right rows -> dropped
        ],
        "user_id long, qts timestamp",
    )
    return left, right


def _asof(left, right, **kw):
    out = asof_join(
        left, right, on=["user_id"], left_ts="qts", right_ts="ts",
        right_cols=["event_id", "value"], tiebreak="event_id", **kw,
    )
    return {(r.user_id, r.qts): (r.asof_event_id, r.asof_ts, r.asof_value) for r in out.collect()}


def test_asof_inclusive_tiebreak_and_carry(frames):
    left, right = frames
    got = _asof(left, right)
    # probe before any event and keyless probe are dropped (inner)
    assert (1, _ts("2024-01-01 09:00:00")) not in got
    assert all(k[0] != 3 for k in got)
    # equal-ts match is inclusive; tie at 12:00 resolved to max event_id
    assert got[(1, _ts("2024-01-01 12:00:00"))][0] == 102
    # carry-forward across a gap
    assert got[(1, _ts("2024-01-02 12:00:00"))] == (102, _ts("2024-01-01 12:00:00"), 3.0)
    assert got[(2, _ts("2024-01-05 00:00:00"))][0] == 200


def test_asof_tolerance(frames):
    left, right = frames
    got = _asof(left, right, tolerance="1 DAY")
    # match is 3 days old -> dropped by tolerance
    assert (2, _ts("2024-01-05 00:00:00")) not in got
    # fresh matches survive
    assert got[(1, _ts("2024-01-01 12:00:00"))][0] == 102


def test_asof_multiple_probes_same_ts(spark):
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 7, 1.5)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00")), (1, _ts("2024-01-01 00:00:00"))],
        "user_id long, qts timestamp",
    )
    out = _asof(left, right)
    assert out[(1, _ts("2024-01-01 00:00:00"))][0] == 7


def test_range_join_boundaries_and_zero(frames, spark):
    left, right = frames
    out = range_join_count(
        left, right, on=["user_id"], left_ts="qts", right_ts="ts",
        before_s=3600, after_s=3600, value_col="value",
    )
    got = {(r.user_id, r.qts): (r.n_in_range, r.sum_value) for r in out.collect()}
    # every left probe is kept, zero-count included
    assert len(got) == left.count()
    assert got[(3, _ts("2024-01-01 00:00:00"))] == (0, 0.0)
    # 09:00 probe: [08:00, 10:00] inclusive catches the 10:00 event exactly
    assert got[(1, _ts("2024-01-01 09:00:00"))] == (1, 1.0)
    # 12:00 probe catches both tie events but not 10:00 (window starts 11:00)
    assert got[(1, _ts("2024-01-01 12:00:00"))] == (2, 5.0)


def test_range_join_cross_bucket_match(spark):
    # right row in bucket B(r); left probe whose window reaches back across
    # the bucket boundary (regression: right-side 0/+1 explode missed B(r)-1)
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:59:00"), 1, 1.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 01:01:00"))], "user_id long, qts timestamp"
    )
    out = range_join_count(
        left, right, on=["user_id"], left_ts="qts", right_ts="ts",
        before_s=600, after_s=0,
    ).collect()
    assert out[0].n_in_range == 1


def test_salted_count_distinct_matches_plain(spark):
    from vector_mcp_spark.operators.skew import salted_count_distinct
    from vector_mcp_spark.suite import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    got = {
        (r.event_type): r.n_distinct
        for r in salted_count_distinct(ev, ["event_type"], "user_id", n_salts=4).collect()
    }
    want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert got == want


def test_range_join_duplicate_left_rows_not_inflated(spark):
    # duplicate (key, ts) probes must not multiply counts (left is
    # deduplicated before the bucket explode)
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00")), (1, _ts("2024-01-01 10:00:00"))],
        "user_id long, qts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:30"), 2.0), (1, _ts("2024-01-01 10:00:45"), 3.0)],
        "user_id long, ts timestamp, value double",
    )
    got = range_join_count(
        left, right, on=["user_id"], left_ts="qts", right_ts="ts",
        before_s=60, after_s=60, value_col="value",
    ).collect()
    assert len(got) == 1
    assert got[0].n_in_range == 2 and got[0].sum_value == 5.0


# -- NTZ-parquet regression (VERDICT r3: the testdata builder switched events.ts
# from timestamp[ns] to non-UTC-adjusted timestamp[us], which Spark reads as
# TIMESTAMP_NTZ; unix_micros() rejects NTZ and the whole temporal family broke.
# This fixture pins both storage variants so a future type change can't
# silently re-break asof/range/trailing/interarrival. -------------------------


@pytest.fixture(scope="module", params=["us_ntz", "ns"])
def ntz_sf_dir(request, spark, tmp_path_factory):
    """A miniature sf dir whose events.parquet uses the given timestamp
    storage: ``us_ntz`` = timestamp[us] not UTC-adjusted (reads as
    TIMESTAMP_NTZ), ``ns`` = TIMESTAMP(NANOS) (vectorized reader rejects)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    unit = {"us_ntz": "us", "ns": "ns"}[request.param]
    root = tmp_path_factory.mktemp(f"ntz_{request.param}")
    ts = [
        _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00"),
        _ts("2024-01-01 12:00:00"), _ts("2024-01-02 09:00:00"),
        _ts("2024-01-02 09:00:30"), _ts("2024-01-01 11:00:00"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "ts": pa.array(ts, pa.timestamp(unit)),  # tz=None → isAdjustedToUTC=false
            "user_id": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
            "event_type": pa.array(["a", "a", "b", "a", "b", "a"]),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], pa.float64()),
            "props": pa.array(['{"k":1}'] * 6),
        }
    )
    pq.write_table(tbl, str(root / "events.parquet"))
    return str(root)


def test_load_normalizes_event_time_to_timestamp(spark, ntz_sf_dir):
    from vector_mcp_spark.suite import load

    ev = load(spark, ntz_sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"  # never timestamp_ntz / bigint
    got = {r.event_id: r.ts for r in ev.collect()}
    assert got[1] == _ts("2024-01-01 10:00:00")  # wall clock preserved


def test_temporal_family_runs_on_ntz_storage(spark, ntz_sf_dir):
    """The four queries that broke in r2/r3 must run on both storage types
    and agree with hand-computed answers."""
    from vector_mcp_spark.suite import SUITE

    asof = {
        (r.user_id, r.qts): r.asof_event_id
        for r in SUITE["asof_latest_event"].spark_fn(spark, ntz_sf_dir).collect()
    }
    # probe 2024-01-01 12:00 for user 1: inclusive match on event 3 at 12:00
    assert asof[(1, _ts("2024-01-01 12:00:00"))] == 3

    rng = {
        (r.user_id, r.qts): (r.n_in_range, r.sum_value)
        for r in SUITE["range_join_event_counts"].spark_fn(spark, ntz_sf_dir).collect()
    }
    # user 1, probe day1 12:00 ±12h → events 1,2,3 (day2's are out of range)
    assert rng[(1, _ts("2024-01-01 12:00:00"))] == (3, 6.0)
    # user 2 probe 12:00 ±12h → its one event at 11:00
    assert rng[(2, _ts("2024-01-01 12:00:00"))] == (1, 6.0)

    trail = {
        r.event_id: r.trailing_1h_value
        for r in SUITE["events_trailing_1h_window"].spark_fn(spark, ntz_sf_dir).collect()
    }
    # event 2 at 10:30 trails event 1 at 10:00 (within 1h): 1.0 + 2.0
    assert trail[2] == 3.0
    # event 3 at 12:00: nothing within the trailing hour but itself... 10:30 is
    # 90 min earlier -> out; 11:00 belongs to user 2 -> excluded
    assert trail[3] == 3.0

    inter = {
        r.event_type: (r.n_gaps, r.avg_gap_s)
        for r in SUITE["events_interarrival"].spark_fn(spark, ntz_sf_dir).collect()
    }
    # user 1 gaps land on the type of the LATER event: 2(a,1800s), 3(b,5400s),
    # 4(a,75600s), 5(b,30s); user 2 has a single event -> no gap
    assert inter["a"] == (2, (1800 + 75600) / 2)
    assert inter["b"] == (2, (5400 + 30) / 2)


def test_salted_join_equals_plain_join(spark):
    """One hot key (90% of the big side) — the salted join must produce
    row-identical results to the plain join while spreading the hot key
    over n_salts merge tasks."""
    from pyspark.sql import functions as F

    from vector_mcp_spark.operators.skew import salted_join, with_salt

    big = spark.createDataFrame(
        [(i, 1 if i % 10 else i % 7, float(i)) for i in range(1000)],
        "row_id long, key long, v double",
    )
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(8)], "key2 long, name string"
    )
    plain = big.join(small, big.key == small.key2).select("row_id", "key", "v", "name")
    salted = salted_join(
        big.hint("merge"), small.hint("merge"),
        big_key="key", small_key="key2", salt_from="row_id", n_salts=8,
    ).select("row_id", "key", "v", "name")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    # the hot key really is spread: its rows occupy every salt bucket
    spread = (
        with_salt(big.where(F.col("key") == 1), "row_id", 8)
        .select("_salt").distinct().count()
    )
    assert spread == 8


def test_salted_join_rejects_outer_modes(spark):
    """Right/full outer would duplicate unmatched small-side rows n_salts
    times; the helper must reject those modes up front (ADVICE r4)."""
    import pytest

    from vector_mcp_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, 1)], "row_id long, key long")
    small = spark.createDataFrame([(1, "x")], "key2 long, name string")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(big, small, "key", "key2", "row_id", n_salts=4, how=how)


def test_snapshot_diff_classifies_all_cases(spark):
    from vector_mcp_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),        # unchanged
         (2, "b", 9.0),        # changed value
         (3, "c", 0.0),        # NULL → value: changed (null-safe compare)
         (5, "e", 5.0)],       # inserted; 4 deleted
        "id long, s string, v double",
    )
    got = {r.id: r.change for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "changed", 4: "deleted", 5: "inserted"}


def test_scd2_intervals_runs_and_currency(spark):
    from datetime import datetime

    from vector_mcp_spark.operators.cdc import scd2_intervals

    t = lambda d: datetime(2026, 1, d)
    obs = spark.createDataFrame(
        [(1, "free", t(1)), (1, "free", t(2)), (1, "pro", t(3)),
         (1, "pro", t(4)), (1, "free", t(5)),
         (2, "pro", t(1))],
        "user long, plan string, ts timestamp",
    )
    rows = sorted(
        scd2_intervals(obs, "user", "plan").collect(),
        key=lambda r: (r.key, r.valid_from),
    )
    assert [(r.key, r.state, r.valid_from.day,
             r.valid_to.day if r.valid_to else None, r.is_current) for r in rows] == [
        (1, "free", 1, 3, False),   # repeat observation merged into one run
        (1, "pro", 3, 5, False),
        (1, "free", 5, None, True), # state can recur as a NEW interval
        (2, "pro", 1, None, True),
    ]
    # intervals tile: each valid_to equals the next valid_from per key
    u1 = [r for r in rows if r.key == 1]
    assert all(a.valid_to == b.valid_from for a, b in zip(u1, u1[1:]))


def test_time_weighted_average_hand_case(spark):
    """Value 10 held for 90s then value 0 for 10s: TWAP = 9.0 — a plain
    AVG says 5 and is wrong on irregular series. Single-observation groups
    have zero span and NULL twap but are emitted."""
    from datetime import datetime

    from vector_mcp_spark.operators.temporal import time_weighted_average

    from datetime import timedelta

    t = lambda s: datetime(2026, 1, 1) + timedelta(seconds=s)
    df = spark.createDataFrame(
        [(1, t(0), 10.0), (1, t(30), 10.0), (1, t(90), 0.0), (1, t(100), 7.0),
         (2, t(5), 3.0)],
        "user long, ts timestamp, value double",
    )
    rows = {r.user: r for r in time_weighted_average(df, ["user"]).collect()}
    assert rows[1].span_seconds == 100.0 and rows[1].n_obs == 4
    assert abs(rows[1].twap - 9.0) < 1e-9  # (10*30 + 10*60 + 0*10 + 7*0) / 100
    assert rows[2].twap is None and rows[2].span_seconds == 0.0


def test_global_rank_equals_naive_window(spark):
    """The two-phase distributed rank must equal row_number over a global
    window for arbitrary data including heavy value ties, and its plan must
    not contain an unpartitioned window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vector_mcp_spark.operators.rank import global_rank

    rows = [(i, float((i * 7) % 13)) for i in range(500)]  # many ties
    df = spark.createDataFrame(rows, "id long, v double")
    got = global_rank(df, "v", ["id"], n_buckets=8)
    naive = df.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("v").asc(), F.col("id").asc()))
    )
    assert {(r.id, r.rank) for r in got.collect()} == {
        (r.id, r.rank) for r in naive.collect()
    }
    plan = got._jdf.queryExecution().executedPlan().toString()
    # every window in the distributed form is partitioned by the coarse bucket
    import re

    assert not re.search(r"Window .*windowspecdefinition\(v", plan.replace("\n", " ")) or "_gb" in plan


def test_autocorrelation_matches_numpy_definition(spark):
    """ACF of a deterministic daily series equals the direct numpy
    computation, including zero-filled gap days."""
    import numpy as np
    from pyspark.sql import functions as F  # noqa: F401

    from vector_mcp_spark.operators.temporal import autocorrelation

    # key A: 10 consecutive days with counts 1..10 via repeated rows;
    # a gap on day 5 (zero-filled by the dense spine)
    rows = []
    counts = [3, 1, 4, 1, 0, 9, 2, 6, 5, 3]
    for d, c in enumerate(counts):
        for i in range(c):
            rows.append(("A", f"2024-01-{d + 1:02d} 00:00:0{i % 10}"))
    df = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.to_timestamp("ts_s").alias("ts")
    )
    got = {r.lag: r.acf for r in autocorrelation(df, 3).collect()}
    x = np.array(counts, dtype=float)
    c = x - x.mean()
    for k in (1, 2, 3):
        expect = float((c[:-k] * c[k:]).sum() / (c * c).sum())
        assert abs(got[k] - round(expect, 6)) < 1e-9, (k, got[k], expect)


def test_autocorrelation_constant_series_excluded(spark):
    """A key whose series has zero variance (ss == 0) is dropped rather
    than emitting NULL/NaN ratios."""
    from pyspark.sql import functions as F

    from vector_mcp_spark.operators.temporal import autocorrelation

    rows = [("B", f"2024-02-{d + 1:02d} 00:00:00") for d in range(5)]  # 1/day
    df = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.to_timestamp("ts_s").alias("ts")
    )
    assert autocorrelation(df, 2).count() == 0


def test_grouped_rank_equals_naive_grouped_window(spark):
    """Bucketed per-group two-phase rank must equal row_number over the
    naive grouped window, including heavy in-group value ties, and must
    attach the exact group size via count_col."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vector_mcp_spark.operators.rank import grouped_rank

    rows = [(i % 3, i, float((i * 7) % 13)) for i in range(600)]
    df = spark.createDataFrame(rows, "g int, id long, v double")
    got = grouped_rank(df, "v", ["g"], tiebreak_cols=["id"], n_buckets=8,
                       out_col="rank", count_col="n")
    naive = df.withColumn(
        "rank", F.row_number().over(Window.partitionBy("g").orderBy(F.col("v").asc(), F.col("id").asc()))
    ).withColumn("n", F.count("*").over(Window.partitionBy("g")))
    assert {(r.g, r.id, r.rank, r.n) for r in got.collect()} == {
        (r.g, r.id, r.rank, r.n) for r in naive.collect()
    }


def test_grouped_rank_falls_back_above_group_cap(spark):
    """More groups than group_cap: ranks still exact via the naive window."""
    from vector_mcp_spark.operators.rank import grouped_rank

    rows = [(i, j, float(j * 3 % 7)) for i in range(30) for j in range(4)]
    df = spark.createDataFrame(rows, "g int, id long, v double")
    got = grouped_rank(df, "v", ["g"], tiebreak_cols=["id"], group_cap=5, count_col="n")
    res = {(r.g, r.id): (r.rank, r.n) for r in got.collect()}
    assert len(res) == 120 and all(n == 4 for _, n in res.values())
    # within each group the rank ordering follows (v, id)
    for g in range(3):
        order = sorted(((v * 3 % 7), j) for j, v in [(j, j) for j in range(4)])
        ranked = sorted(((res[(g, j)][0]), j) for j in range(4))
        assert [j for _, j in ranked] == [j for _, j in order]


def test_grouped_rank_keeps_null_group_keys(spark):
    """NULL group keys are a group (groupBy semantics); the bucketed path's
    joins must be null-safe rather than silently dropping those rows."""
    from vector_mcp_spark.operators.rank import grouped_rank

    rows = [(None, 1, 1.0), (None, 2, 2.0), ("a", 3, 1.0), ("a", 4, 0.5)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    got = {(r.g, r.id): (r.rank, r.n) for r in
           grouped_rank(df, "v", ["g"], tiebreak_cols=["id"], count_col="n").collect()}
    assert got == {
        (None, 1): (1, 2), (None, 2): (2, 2),
        ("a", 4): (1, 2), ("a", 3): (2, 2),
    }


def test_grouped_rank_single_bucket_degrades_to_naive(spark):
    """n_buckets < 2 has no split points; it must rank via the naive window,
    never return empty."""
    from vector_mcp_spark.operators.rank import grouped_rank

    df = spark.createDataFrame([("a", 1, 2.0), ("a", 2, 1.0)], "g string, id long, v double")
    got = {(r.g, r.id): r.rank for r in
           grouped_rank(df, "v", ["g"], tiebreak_cols=["id"], n_buckets=1).collect()}
    assert got == {("a", 2): 1, ("a", 1): 2}


def test_ewma_matches_pandas_adjust_true(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from vector_mcp_spark.operators.temporal import ewma_daily

    counts = [3, 1, 4, 1, 5, 9, 2]
    rows = []
    for d, c in enumerate(counts):
        for i in range(c):
            rows.append(("A", f"2024-03-{d + 1:02d} 00:00:0{i % 10}"))
    df = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.to_timestamp("ts_s").alias("ts")
    )
    got = [r.ewma for r in ewma_daily(df, 0.3).orderBy("day").collect()]
    expect = pd.Series([float(c) for c in counts]).ewm(alpha=0.3, adjust=True).mean()
    for g, e in zip(got, expect):
        assert abs(g - round(float(e), 6)) < 1e-9


def test_ewma_overflow_and_alpha_guards(spark):
    """alpha outside (0,1) and series longer than the closed form's safe
    length must raise loudly instead of silently emitting NaN."""
    import pytest
    from pyspark.sql import functions as F

    from vector_mcp_spark.operators.temporal import ewma_daily

    rows = [("A", f"2024-01-{d + 1:02d} 00:00:00") for d in range(5)]
    df = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.to_timestamp("ts_s").alias("ts")
    )
    with pytest.raises(ValueError, match="alpha"):
        ewma_daily(df, 1.0)
    with pytest.raises(ValueError, match="alpha"):
        ewma_daily(df, 0.0)
    # a 400-day series at alpha=0.9 crosses the ~300-day safe length
    long_rows = []
    import datetime
    d0 = datetime.date(2020, 1, 1)
    for d in range(400):
        long_rows.append(("B", f"{d0 + datetime.timedelta(days=d)} 00:00:00"))
    long_df = spark.createDataFrame(long_rows, "event_type string, ts_s string").select(
        "event_type", F.to_timestamp("ts_s").alias("ts")
    )
    with pytest.raises(ValueError, match="overflow"):
        ewma_daily(long_df, 0.9)
    # ...but passes at a safe alpha and matches finite output
    out = ewma_daily(long_df, 0.3).collect()
    assert len(out) == 400 and all(r.ewma == 1.0 for r in out)


def test_grouped_rank_all_null_group_raises(spark):
    """ADVICE r10: an all-NULL value group must fail loud, not emit
    phantom-bucket ranks."""
    import pytest

    from vector_mcp_spark.operators.rank import grouped_rank

    df = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 2), ("b", None, 3), ("b", None, 4)],
        "g string, v double, id int",
    )
    with pytest.raises(ValueError, match="all NULL"):
        grouped_rank(df, "v", ["g"], tiebreak_cols=["id"], n_buckets=4).collect()
    # groups with SOME nulls in other groups still rank after filtering
    ok = grouped_rank(
        df.where(F.col("v").isNotNull()), "v", ["g"], tiebreak_cols=["id"], n_buckets=4
    )
    assert [r.id for r in ok.orderBy("rank").collect()] == [1, 2]
