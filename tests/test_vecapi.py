"""Vector-DB point-API operators: scroll, facet, recommend, discover,
sparse dot, distance matrix, DBSF fusion."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_mcp_spark.operators.vecapi import (
    discover_topk,
    distance_matrix_topk,
    facet_counts,
    recommend_topk,
    scroll_page,
    sparse_dot_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"src{i % 3}", "en" if i % 2 == 0 else "de", 100 + i)
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "id int, source string, lang string, n_chars int")


def test_scroll_keyset_pagination(docs):
    page1 = scroll_page(docs, after_id=None, page_size=3,
                        filter_cond=F.col("lang") == "en", id_col="id",
                        payload_cols=("source",)).collect()
    assert [r.id for r in page1] == [0, 2, 4]
    # the cursor is the last id of the previous page
    page2 = scroll_page(docs, after_id=page1[-1].id, page_size=3,
                        filter_cond=F.col("lang") == "en", id_col="id").collect()
    assert [r.id for r in page2] == [6, 8, 10]
    # past the end: empty page, no error
    tail = scroll_page(docs, after_id=18, page_size=3,
                       filter_cond=F.col("lang") == "en", id_col="id").collect()
    assert tail == []


def test_facet_counts_order_and_top(docs):
    out = facet_counts(docs, "source", filter_cond=F.col("lang") == "en").collect()
    # 10 en docs over sources src0(4: 0,6,12,18) src1(3: 4,10,16) src2(3: 2,8,14)
    assert [(r.value, r["count"]) for r in out] == [("src0", 4), ("src1", 3), ("src2", 3)]
    top1 = facet_counts(docs, "source", filter_cond=F.col("lang") == "en", top=1).collect()
    assert [(r.value, r["count"]) for r in top1] == [("src0", 4)]


@pytest.fixture(scope="module")
def embs(spark):
    # 2-d points on distinct directions; ids 0..5
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 1.0]),
        (3, [0.1, 0.9]),
        (4, [-1.0, 0.0]),
        (5, [0.7, 0.7]),
    ]
    return spark.createDataFrame(rows, "id int, embedding array<float>")


def test_recommend_moves_away_from_negative(embs):
    # positives along +x, negative along +y → q ≈ (avg_pos pushed −y);
    # nearest remaining should be the +x-ish points, never the +y ones first
    out = recommend_topk(embs, positive_ids=[0, 1], negative_ids=[2], k=3,
                         id_col="id").collect()
    ids = [r.id for r in out]
    # example points excluded
    assert not {0, 1, 2} & set(ids)
    assert ids[0] == 5 or ids[0] == 4  # +x-aligned beats +y-aligned
    assert 3 != ids[0]  # the +y-ish point cannot win after the negative push


def test_recommend_no_negatives_is_centroid_search(embs):
    out = recommend_topk(embs, positive_ids=[2, 3], negative_ids=[], k=2,
                         id_col="id").collect()
    assert [r.id for r in out][0] == 5  # (0.7,0.7) closest to the +y centroid


def test_recommend_validates_examples(embs):
    with pytest.raises(ValueError, match="positive"):
        recommend_topk(embs, [], [1], 3, id_col="id")
    with pytest.raises(ValueError, match="not found"):
        recommend_topk(embs, [0, 99], [], 3, id_col="id")


def test_discover_context_dominates_target(embs):
    # target = +y, but the context pair (+x better than +y) inverts the page:
    # points satisfying the pair rank above closer-to-target ones
    out = discover_topk(
        embs, [0.0, 1.0], [([1.0, 0.0], [0.0, 1.0])], k=6, id_col="id"
    ).collect()
    sat = {r.id: r.satisfied for r in out}
    assert sat[0] == 1 and sat[1] == 1 and sat[2] == 0
    # all satisfied=1 rows come before every satisfied=0 row
    flags = [r.satisfied for r in out]
    assert flags == sorted(flags, reverse=True)


def test_sparse_dot_scores(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark vector other"),   # (2*2 + 1*1.5)/4 = 1.375
            (2, "vector only here"),           # 1.5/3 = 0.5
            (3, "no match at all"),
            (4, ""),                           # zero tokens → excluded
        ],
        "id int, content string",
    )
    out = sparse_dot_topk(docs, [("spark", 2.0), ("vector", 1.5)], k=10,
                          id_col="id", content_col="content").collect()
    got = {r.id: r.score for r in out}
    assert got == {1: 1.375, 2: 0.5}


def test_distance_matrix_bounds_and_ranks(embs):
    out = distance_matrix_topk(embs, F.col("id") <= 3, per_row=2, id_col="id").collect()
    by_a = {}
    for r in out:
        by_a.setdefault(r.a_id, []).append((r.rank, r.b_id, r.score))
    assert set(by_a) == {0, 1, 2, 3}
    for a, rows in by_a.items():
        assert [rk for rk, _, _ in sorted(rows)] == [1, 2]
        assert all(b != a for _, b, _ in rows)      # self excluded
        assert all(b <= 3 for _, b, _ in rows)      # never leaves the sample
    # 0's nearest sample point is 1 (cos≈0.994), not 2/3
    assert sorted(by_a[0])[0][1] == 1


def test_dbsf_fuse_magnitude_and_sigma_zero(spark):
    from vector_mcp_spark.operators.hybrid import dbsf_fuse

    # leg A: spread scores; leg B: constant (σ=0) → every B hit adds 0.5
    leg_a = spark.createDataFrame(
        [(1, 10.0), (2, 5.0), (3, 0.0)], "id int, score double"
    )
    leg_b = spark.createDataFrame([(2, 1.0), (4, 1.0)], "id int, score double")
    out = {r.id: r.score for r in dbsf_fuse([leg_a, leg_b], n=10, id_col="id").collect()}
    # leg A: μ=5, σ=√(50/3); norm(s) = (s-(μ-3σ))/(6σ)
    sd = math.sqrt(50.0 / 3.0)
    for i, s in ((1, 10.0), (3, 0.0)):
        assert out[i] == pytest.approx((s - (5.0 - 3 * sd)) / (6 * sd), abs=1e-6)
    assert out[4] == 0.5
    assert out[2] == pytest.approx((5.0 - (5.0 - 3 * sd)) / (6 * sd) + 0.5, abs=1e-6)
    # magnitude preserved: the 10.0 hit beats the 5.0 hit by more than the
    # rank gap alone would give
    assert out[1] > out[2] - 0.5 > out[3]


def test_recommend_best_score_prefers_any_positive_and_penalizes_negatives(spark):
    """best_score ranks by the best SINGLE positive match (multi-modal
    preference), and a candidate matching a negative better than any
    positive flips to -(best_neg^2) — ranked below everything positive."""
    rows = [
        (1, [1.0, 0.0, 0.0]),   # positive example A
        (2, [0.0, 1.0, 0.0]),   # positive example B
        (3, [0.0, 0.0, 1.0]),   # negative example
        (10, [0.9, 0.1, 0.0]),  # close to A only
        (11, [0.1, 0.9, 0.0]),  # close to B only
        (12, [0.1, 0.1, 0.9]),  # close to the negative → flipped score
    ]
    df = spark.createDataFrame(rows, "id int, embedding array<float>")
    from vector_mcp_spark.operators.vecapi import recommend_best_score_topk

    out = recommend_best_score_topk(df, [1, 2], [3], 10).collect()
    got = {r.id: r.score for r in out}
    assert set(got) == {10, 11, 12}
    assert got[10] > 0.9 and got[11] > 0.9  # each matches ITS closest positive
    assert got[12] < 0  # negative-dominated → -(best_neg^2)
    # average-vector strategy would score 10 and 11 equally mediocre against
    # the centroid; best_score keeps both near 1 — the strategies differ
    order = [r.id for r in out]
    assert order[-1] == 12


def test_recommend_best_score_no_negatives_is_best_positive(spark):
    rows = [(1, [1.0, 0.0]), (20, [0.8, 0.2]), (21, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "id int, embedding array<float>")
    from vector_mcp_spark.operators.vecapi import recommend_best_score_topk

    out = recommend_best_score_topk(df, [1], [], 10).collect()
    assert [r.id for r in out] == [20, 21]


def test_context_search_zero_loss_region_wins(spark):
    """Points satisfying every pair score exactly 0 (tie-broken by id);
    points on the wrong side of a boundary carry that pair's negative
    margin."""
    pos, neg = [1.0, 0.0], [0.0, 1.0]
    rows = [
        (10, [0.9, 0.1]),   # deep in the positive half-space → 0
        (11, [0.8, 0.2]),   # also satisfied → 0, ranks after 10 by id
        (12, [0.1, 0.9]),   # violates the pair → negative score
    ]
    df = spark.createDataFrame(rows, "id int, embedding array<float>")
    from vector_mcp_spark.operators.vecapi import context_topk

    out = context_topk(df, [(pos, neg)], 10).collect()
    assert [r.id for r in out] == [10, 11, 12]
    assert out[0].score == 0.0 and out[1].score == 0.0
    assert out[2].score < 0
