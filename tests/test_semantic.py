from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_mcp_spark.functions.embedder import hash_embed
from vector_mcp_spark.operators.semantic import semantic_topk, semantic_topk_multi
from vector_mcp_spark.suite import docs_with_embeddings


@pytest.fixture(scope="module")
def coll(spark, sf_dir):
    return docs_with_embeddings(spark, sf_dir).cache()


def _py_cosine(a, b):
    dot = sum(float(x) * float(y) for x, y in zip(a, b))
    na = math.sqrt(sum(float(x) ** 2 for x in a))
    nb = math.sqrt(sum(float(y) ** 2 for y in b))
    return dot / (na * nb)


def test_topk_matches_python_brute_force(coll):
    q = hash_embed("machine learning", 64)
    got = semantic_topk(coll, q, 5, id_col="doc_id").collect()
    rows = coll.select("doc_id", "embedding").collect()
    expect = sorted(
        ((r.doc_id, _py_cosine(r.embedding, q)) for r in rows),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [r.doc_id for r in got] == [d for d, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert abs(r.score - s) < 1e-6


def test_topk_scores_descending_and_k_rows(coll):
    q = hash_embed("vector database", 64)
    got = semantic_topk(coll, q, 10, id_col="doc_id").collect()
    assert len(got) == 10
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in scores)


def test_distance_threshold_filters(coll):
    q = hash_embed("machine learning", 64)
    got = semantic_topk(coll, q, 1000, id_col="doc_id", distance_threshold=0.7).collect()
    assert all(1.0 - r.score <= 0.7 + 1e-9 for r in got)
    # negative threshold → skipped (base.py:189-211)
    all_rows = semantic_topk(coll, q, 1000, id_col="doc_id", distance_threshold=-1).collect()
    assert len(all_rows) == coll.count()


def test_multi_query_batched(coll):
    queries = [(0, hash_embed("alpha", 64)), (1, hash_embed("beta", 64))]
    got = semantic_topk_multi(coll, queries, 3, id_col="doc_id").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1}
    for qid, rows in by_q.items():
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3]
        single = semantic_topk(coll, dict(queries)[qid], 3, id_col="doc_id").collect()
        assert [r.doc_id for r in sorted(rows, key=lambda r: r.rank)] == [r.doc_id for r in single]


def test_empty_collection_returns_empty(spark, coll):
    empty = coll.where(F.lit(False))
    got = semantic_topk(empty, hash_embed("x", 64), 5, id_col="doc_id").collect()
    assert got == []


# -- MMR diversified re-rank --------------------------------------------------


def _mmr_pool(spark, rows):
    return spark.createDataFrame(rows, "id string, embedding array<double>, score double")


def test_mmr_lambda_one_is_pure_relevance(spark):
    from vector_mcp_spark.operators.mmr import mmr_rerank

    pool = _mmr_pool(spark, [
        ("a", [1.0, 0.0], 0.9), ("b", [0.0, 1.0], 0.8), ("c", [1.0, 1.0], 0.7),
    ])
    got = [r.id for r in mmr_rerank(pool, 3, lam=1.0).orderBy("rank").collect()]
    assert got == ["a", "b", "c"]


def test_mmr_penalizes_redundant_runner_up(spark):
    from vector_mcp_spark.operators.mmr import mmr_rerank

    # b is a near-clone of the top pick; c is orthogonal with lower
    # relevance — diversification must promote c to rank 2
    pool = _mmr_pool(spark, [
        ("a", [1.0, 0.0], 0.90), ("b", [1.0, 0.001], 0.89), ("c", [0.0, 1.0], 0.50),
    ])
    rows = {r.rank: r for r in mmr_rerank(pool, 3, lam=0.5).collect()}
    assert [rows[i].id for i in (1, 2, 3)] == ["a", "c", "b"]
    assert rows[1].redundancy == 0.0
    assert rows[3].redundancy > 0.99  # b's clone penalty was the reason


def test_mmr_tie_breaks_on_ascending_id(spark):
    from vector_mcp_spark.operators.mmr import mmr_rerank

    pool = _mmr_pool(spark, [
        ("z", [1.0, 0.0], 0.5), ("a", [0.0, 1.0], 0.5),
    ])
    got = [r.id for r in mmr_rerank(pool, 2, lam=1.0).orderBy("rank").collect()]
    assert got == ["a", "z"]


def test_mmr_validation(spark):
    import pytest as _pytest

    from vector_mcp_spark.operators.mmr import mmr_rerank
    from vector_mcp_spark.validation import EngineError

    pool = _mmr_pool(spark, [("a", [1.0], 0.5)])
    with _pytest.raises(EngineError, match="mmr_lambda_invalid"):
        mmr_rerank(pool, 1, lam=1.5)
    with _pytest.raises(EngineError, match="number_results_invalid"):
        mmr_rerank(pool, 0)
    big = _mmr_pool(spark, [(str(i), [1.0], 0.5) for i in range(1001)])
    with _pytest.raises(EngineError, match="mmr_pool_too_large"):
        mmr_rerank(big, 1)


def test_late_interaction_maxsim_reference(spark):
    """MaxSim on a tiny corpus equals the hand-computed score: per query
    token take the best vector in the group, then sum."""
    import math

    from vector_mcp_spark.operators.semantic import late_interaction_topk

    groups = {
        "g1": [[1.0, 0.0], [0.0, 1.0]],
        "g2": [[0.7, 0.7], [1.0, 0.1]],
        "g3": [[-1.0, 0.0]],
    }
    rows = [(g, v) for g, vecs in groups.items() for v in vecs]
    df = spark.createDataFrame(rows, "label string, embedding array<float>")
    q = [[1.0, 0.0], [0.0, 1.0]]
    got = {r.label: r.score for r in late_interaction_topk(df, q, 3).collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(y * y for y in b))
        return d / (na * nb)

    for g, vecs in groups.items():
        expected = sum(max(cos(t, v) for v in vecs) for t in q)
        assert got[g] == pytest.approx(expected, abs=1e-5)
    ranked = sorted(got.items(), key=lambda kv: -kv[1])
    assert ranked[0][0] in ("g1", "g2")  # g3 is anti-aligned, must be last
    assert ranked[-1][0] == "g3"


def test_grouped_topk_diversification(spark):
    """Groups rank by their best hit; hits cap at per_group; a dominant
    group cannot take more than its cap even when it holds all the global
    top hits."""
    from vector_mcp_spark.operators.semantic import grouped_topk

    # group A holds the 4 best-aligned vectors, B two mid ones, C one weak
    rows = [
        ("A", 1, [1.0, 0.0]),
        ("A", 2, [0.99, 0.1]),
        ("A", 3, [0.98, 0.15]),
        ("A", 4, [0.97, 0.2]),
        ("B", 5, [0.5, 0.5]),
        ("B", 6, [0.4, 0.6]),
        ("C", 7, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "src string, id int, embedding array<float>")
    out = grouped_topk(
        df, [1.0, 0.0], group_col="src", k_groups=2, per_group=2, id_col="id"
    ).collect()

    # only 2 groups survive, 2 hits each, A first (best hit cos=1.0)
    assert [r.src for r in out] == ["A", "A", "B", "B"]
    assert [r.group_rank for r in out] == [1, 1, 2, 2]
    assert [r.hit_rank for r in out] == [1, 2, 1, 2]
    # A's third/fourth hits are cut despite beating every B hit globally
    assert {r.id for r in out} == {1, 2, 5, 6}
    # scores are descending inside each group
    assert out[0].score >= out[1].score and out[2].score >= out[3].score


def test_grouped_topk_k_groups_bound(spark):
    """k_groups larger than the group count returns every group, ranked."""
    from vector_mcp_spark.operators.semantic import grouped_topk

    df = spark.createDataFrame(
        [("A", 1, [1.0, 0.0]), ("B", 2, [0.0, 1.0])],
        "src string, id int, embedding array<float>",
    )
    out = grouped_topk(df, [1.0, 0.0], "src", k_groups=10, per_group=5, id_col="id")
    assert [(r.src, r.group_rank) for r in out.collect()] == [("A", 1), ("B", 2)]


def test_payload_boost_reorders_by_decay(spark):
    """Two docs with identical vectors: the one whose payload sits at the
    gauss target wins; weight=0 degrades to plain cosine ordering (id ties)."""
    from vector_mcp_spark.operators.semantic import payload_boost_topk

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 900),   # far from target
            (2, [1.0, 0.0], 300),   # at target → +weight boost
            (3, [0.0, 1.0], 300),   # orthogonal: boost alone can't win
        ],
        "id int, embedding array<float>, n_chars int",
    )
    out = payload_boost_topk(
        df, [1.0, 0.0], 3, boost_col="n_chars", target=300.0, scale=150.0, weight=0.2
    ).collect()
    assert [r.id for r in out] == [2, 1, 3]
    assert abs(out[0].score - 1.2) < 1e-6  # cosine 1 + full boost
    flat = payload_boost_topk(
        df, [1.0, 0.0], 3, boost_col="n_chars", target=300.0, scale=150.0, weight=0.0
    ).collect()
    assert [r.id for r in flat] == [1, 2, 3]  # pure cosine, id tie-break


def test_topk_dot_matches_python_brute_force(coll):
    q = hash_embed("machine learning", 64)
    got = semantic_topk(coll, q, 5, id_col="doc_id", metric="dot").collect()
    rows = coll.select("doc_id", "embedding").collect()
    expect = sorted(
        (
            (r.doc_id, sum(float(x) * float(y) for x, y in zip(r.embedding, q)))
            for r in rows
        ),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [r.doc_id for r in got] == [d for d, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert abs(r.score - s) < 1e-6


def test_topk_l2_matches_python_brute_force_and_ascends(coll):
    q = hash_embed("machine learning", 64)
    got = semantic_topk(coll, q, 5, id_col="doc_id", metric="l2").collect()
    rows = coll.select("doc_id", "embedding").collect()
    expect = sorted(
        (
            (
                r.doc_id,
                math.sqrt(sum((float(x) - float(y)) ** 2 for x, y in zip(r.embedding, q))),
            )
            for r in rows
        ),
        key=lambda t: (t[1], t[0]),
    )[:5]
    assert [r.doc_id for r in got] == [d for d, _ in expect]
    scores = [r.score for r in got]
    assert scores == sorted(scores)  # L2 ranks ascend (lower is better)
    for r, (_, s) in zip(got, expect):
        assert abs(r.score - s) < 1e-6


def test_topk_l2_threshold_keeps_only_within_bound(coll):
    q = hash_embed("machine learning", 64)
    # derive the bound from the data: the 3rd-smallest distance
    bound = semantic_topk(coll, q, 3, id_col="doc_id", metric="l2").collect()[-1].score
    got = semantic_topk(
        coll, q, 1000, id_col="doc_id", metric="l2", distance_threshold=bound
    ).collect()
    assert got, "bound is an attained distance, at least one row must survive"
    assert all(r.score <= bound for r in got)
    assert len(got) <= 4  # the 3 best (+1 possible 6-dp rounding tie)


def test_topk_dot_threshold_is_min_score(coll):
    q = hash_embed("machine learning", 64)
    allr = semantic_topk(coll, q, 1000, id_col="doc_id", metric="dot").collect()
    mid = allr[len(allr) // 2].score
    got = semantic_topk(
        coll, q, 1000, id_col="doc_id", metric="dot", distance_threshold=mid
    ).collect()
    assert got and all(r.score >= mid for r in got)
    assert len(got) < len(allr)


def test_topk_unknown_metric_raises(coll):
    with pytest.raises(ValueError, match="metric"):
        semantic_topk(coll, hash_embed("x", 64), 5, id_col="doc_id", metric="manhattan")


def test_payload_boost_null_payload_gets_zero_boost(spark):
    """ADVICE r10: a NULL boost_col value must contribute 0 boost — not a
    NULL score, whose DESC placement differs between Spark (last) and ANSI
    engines (first)."""
    from vector_mcp_spark.operators.semantic import payload_boost_topk

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 300),    # at target -> +weight
            (2, [1.0, 0.0], None),   # NULL payload -> plain cosine
            (3, [0.9, 0.1], None),
        ],
        "id int, embedding array<float>, n_chars int",
    )
    out = payload_boost_topk(
        df, [1.0, 0.0], 3, boost_col="n_chars", target=300.0, scale=150.0, weight=0.2
    ).collect()
    assert [r.id for r in out] == [1, 2, 3]
    assert all(r.score is not None for r in out)
    assert abs(out[1].score - 1.0) < 1e-6  # cosine only, no NULL propagation


def test_l2_null_embeddings_never_outrank_real_scores(spark):
    """ADVICE r11: under metric='l2' the ascending sort must order NULL
    scores LAST — Spark's asc() default (NULLS FIRST) would hand the top-k
    ranks to rows with missing embeddings."""
    rows = [
        ("a", [1.0, 0.0]),
        ("b", [0.8, 0.2]),
        ("c", None),  # missing embedding -> NULL l2 score
        ("d", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    got = semantic_topk(df, [1.0, 0.0], 3, id_col="doc_id", metric="l2").collect()
    assert [r.doc_id for r in got] == ["a", "b", "d"]
    assert all(r.score is not None for r in got)

    multi = semantic_topk_multi(
        df, [(0, [1.0, 0.0])], 3, id_col="doc_id", metric="l2"
    ).collect()
    assert [r.doc_id for r in sorted(multi, key=lambda r: r.rank)] == ["a", "b", "d"]
    assert all(r.score is not None for r in multi)
