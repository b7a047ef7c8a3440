"""funnel_stages / activity_gap_days / masked_hamming_pairs unit tests."""

from __future__ import annotations

from datetime import date, datetime

import pytest

from pyspark.sql import functions as F

from vector_mcp_spark.operators.fuzzy import masked_hamming_pairs
from vector_mcp_spark.operators.sequence import activity_gap_days, funnel_stages

STAGES = ("signup", "view", "click", "purchase")


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def funnel(spark):
    rows = [
        # user 1: full funnel in order → stage 4
        (1, _ts(1), "signup"), (1, _ts(2), "view"), (1, _ts(3), "click"), (1, _ts(4), "purchase"),
        # user 2: purchase arrives BEFORE the click — the purchase can't
        # match at stage 2, but the later click still advances to stage 3
        (2, _ts(1), "signup"), (2, _ts(2), "view"), (2, _ts(3), "purchase"), (2, _ts(4), "click"),
        # user 3: never signs up → stage 0 despite later-stage events
        (3, _ts(1), "view"), (3, _ts(2), "click"),
        # user 4: repeated early stages don't advance twice
        (4, _ts(1), "signup"), (4, _ts(2), "signup"), (4, _ts(3), "view"),
        # user 5: only non-funnel events → excluded entirely
        (5, _ts(1), "error"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    return {r.user_id: r for r in funnel_stages(df, STAGES).collect()}


def test_funnel_full_conversion(funnel):
    assert funnel[1].stage_reached == 4
    assert funnel[1].n_funnel_events == 4


def test_funnel_out_of_order_stops(funnel):
    # click arrives after purchase: purchase can't be matched before click
    assert funnel[2].stage_reached == 3  # signup, view, then the LATE click
    assert funnel[3].stage_reached == 0


def test_funnel_repeats_and_exclusion(funnel):
    assert funnel[4].stage_reached == 2  # signup, (signup ignored), view
    assert 5 not in funnel  # no funnel-typed events → no row


def test_funnel_tie_resolves_in_stage_order(spark):
    # signup and view at the IDENTICAL timestamp: stage order wins → stage 2
    df = spark.createDataFrame(
        [(1, _ts(1), "view"), (1, _ts(1), "signup")],
        "user_id long, ts timestamp, event_type string",
    )
    assert funnel_stages(df, STAGES).collect()[0].stage_reached == 2


def test_activity_gap_days(spark):
    rows = [
        (1, datetime(2024, 1, 1, 5)), (1, datetime(2024, 1, 2, 5)), (1, datetime(2024, 1, 5, 5)),
        (2, datetime(2024, 1, 3, 9)),  # single-day span → no gaps
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.user_id, r.gap_day) for r in activity_gap_days(df).collect()}
    assert got == {(1, date(2024, 1, 3)), (1, date(2024, 1, 4))}


def test_masked_hamming_pairs_exact_and_near(spark):
    rows = [
        (1, "Supplier#01"), (2, "Supplier#02"), (3, "Supplier#01"),
        (4, "Supplier#99"), (5, "Vendor#0001"), (6, "short"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r.id_a, r.id_b): r.dist for r in masked_hamming_pairs(df).collect()}
    assert got[(1, 2)] == 1  # one digit apart
    assert got[(1, 3)] == 0  # exact duplicate
    assert got[(2, 3)] == 1
    assert (1, 4) not in got  # two digits apart → not a candidate
    assert all(5 not in p and 6 not in p for p in got)  # different strings/length
    assert set(got) == {(1, 2), (1, 3), (2, 3)}


def test_masked_hamming_blocking_is_lossless(spark):
    # every Hamming≤1 equal-length pair must be found — brute-force cross-check
    names = ["abcd", "abed", "zbcd", "abce", "wxyz", "abcd"]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = {(r.id_a, r.id_b) for r in masked_hamming_pairs(df).collect()}
    expect = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            if len(a) == len(b) and sum(x != y for x, y in zip(a, b)) <= 1:
                expect.add((i, j))
    assert got == expect
