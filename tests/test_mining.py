"""Unit tests for the round-5 mining operators: span novelty, DSIR
importance weights, the inverted-index build, and PageRank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_span_novelty_flags_copies(spark):
    from vector_mcp_spark.operators.novelty import span_novelty

    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, base),                       # original: fully novel
            (2, base),                       # verbatim copy: zero novelty
            (3, "one two three four five six seven"),  # unrelated: novel
            (4, base + " iota kappa"),       # partial copy: mixed
            (5, "too short"),                # < n tokens: no spans, dropped
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in span_novelty(docs, n=5, id_col="doc_id", text_col="text").collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1].novelty == 1.0 and out[1].n_repeated == 0
    assert out[2].novelty == 0.0 and out[2].n_spans == out[1].n_spans
    assert out[3].novelty == 1.0
    assert 0.0 < out[4].novelty < 1.0  # shares base spans, adds new ones
    # first-copy ownership: doc 1 is never penalized for doc 2's copying
    assert out[1].n_repeated == 0


def test_dsir_weights_separate_target_like_docs(spark):
    from vector_mcp_spark.operators.dsir import importance_weights

    rows = [(i, "code spark join shuffle query", "target") for i in range(20)]
    rows += [(100 + i, "recipe butter flour sugar oven", "web") for i in range(20)]
    rows += [(200, "code spark join shuffle query", "web"),   # target-like raw doc
             (201, "recipe butter flour sugar oven", "held")]  # off-target doc
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    w = {
        r.id: r.weight
        for r in importance_weights(
            docs, is_target=F.col("source") == "target", id_col="doc_id", text_col="text"
        ).collect()
    }
    assert w[200] > 0 > w[201]  # target-vocabulary doc ranks above off-target
    assert w[200] == w[0]       # same text → same weight regardless of source


def test_build_postings_exact_counts_and_truncation(spark):
    from vector_mcp_spark.operators.lexical import postings_index_summary

    docs = spark.createDataFrame(
        [(1, "apple apple pear"), (2, "apple pear pear pear"), (3, "apple kiwi")],
        "id long, content string",
    )
    idx = {r.term: r for r in postings_index_summary(docs, top_docs=2).collect()}
    assert idx["apple"].df == 3 and idx["apple"].cf == 4
    # top-2 by tf desc then id asc: doc1 (tf 2), then doc2/doc3 (tf 1, id asc)
    assert idx["apple"].postings == "1:2,2:1"
    assert idx["pear"].postings == "2:3,1:1"
    assert idx["kiwi"].df == 1 and idx["kiwi"].postings == "3:1"


def test_pagerank_star_and_ring(spark):
    from vector_mcp_spark.operators.graph import pagerank

    # symmetric ring: uniform stationary distribution, mass conserved
    ring = [(i, (i + 1) % 4, 1.0) for i in range(4)]
    ring += [(b, a, w) for a, b, w in ring]
    pr = {r.node: r.pr for r in pagerank(
        spark.createDataFrame(ring, "src long, dst long, w double"), iters=5
    ).collect()}
    assert all(abs(v - 0.25) < 1e-9 for v in pr.values())
    assert abs(sum(pr.values()) - 1.0) < 1e-9

    # star: the hub out-ranks every leaf
    star = []
    for leaf in (1, 2, 3, 4):
        star += [(0, leaf, 1.0), (leaf, 0, 1.0)]
    spr = {r.node: r.pr for r in pagerank(
        spark.createDataFrame(star, "src long, dst long, w double"), iters=5
    ).collect()}
    assert spr[0] > max(spr[k] for k in (1, 2, 3, 4))
    assert abs(sum(spr.values()) - 1.0) < 1e-9


def test_cooccurrence_edges_weights(spark):
    from vector_mcp_spark.operators.graph import cooccurrence_edges

    m = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"), (3, "c")],
        "grp long, item string",
    )
    e = {(r.src, r.dst): r.w for r in cooccurrence_edges(m).collect()}
    assert e[("a", "b")] == 2 and e[("b", "a")] == 2   # groups 1, 2
    assert e[("a", "c")] == 1 and e[("c", "a")] == 1   # group 3 (distinct)
    assert ("a", "a") not in e


def test_span_novelty_plan_shuffles_hashed_keys(spark, sf_dir):
    """The span shuffle must exchange 8-byte hashes, not span strings, and
    the whole pass must stay codegen'd with no Python in the plan."""
    from vector_mcp_spark.suite import SUITE

    df = SUITE["corpus_span_novelty"].spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "span_h" in plan and "BatchEvalPython" not in plan
