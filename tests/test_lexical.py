from __future__ import annotations

import re

import pytest

from vector_mcp_spark.operators.lexical import (
    bm25_topk,
    build_postings,
    lexical_substring_topk,
    lexical_tf_topk,
)

DOCS = [
    (1, "spark joins data with spark shuffle join"),
    (2, "vector search with spark"),
    (3, "nothing relevant here"),
    (4, "join join join"),
    (5, "Spark SPARK spark"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string").cache()


def _tf(text: str, terms: list[str]) -> int:
    toks = [t.casefold() for t in re.findall(r"[A-Za-z0-9_]{2,}", text)]
    return sum(toks.count(t) for t in terms)


def test_tf_scores_match_reference_semantics(docs):
    got = {
        r.doc_id: r.score
        for r in lexical_tf_topk(docs, "spark join", 10, id_col="doc_id", content_col="text").collect()
    }
    expect = {d: float(_tf(t, ["spark", "join"])) for d, t in DOCS if _tf(t, ["spark", "join"]) > 0}
    assert got == expect


def test_tf_casefolds_both_sides(docs):
    got = lexical_tf_topk(docs, "SPARK", 10, id_col="doc_id", content_col="text").collect()
    assert {r.doc_id: r.score for r in got}[5] == 3.0


def test_and_match_requires_all_terms(docs):
    got = lexical_tf_topk(
        docs, "spark join", 10, id_col="doc_id", content_col="text", require_all_terms=True
    ).collect()
    assert sorted(r.doc_id for r in got) == [1]  # only doc1 has both


def test_duplicate_query_terms_counted_once(docs):
    # canonical semantics: distinct query terms
    a = lexical_tf_topk(docs, "spark spark", 10, id_col="doc_id", content_col="text").collect()
    b = lexical_tf_topk(docs, "spark", 10, id_col="doc_id", content_col="text").collect()
    assert {(r.doc_id, r.score) for r in a} == {(r.doc_id, r.score) for r in b}


def test_empty_query_returns_empty(docs):
    assert lexical_tf_topk(docs, "!!", 10, id_col="doc_id", content_col="text").collect() == []


def test_substring_constant_score(docs):
    got = lexical_substring_topk(docs, "join", 10, id_col="doc_id", content_col="text").collect()
    assert all(r.score == 1.0 for r in got)
    assert sorted(r.doc_id for r in got) == [1, 4]  # case-sensitive contains


def test_bm25_rare_term_outranks_common(docs):
    # 'vector' appears in 1 doc, 'spark' in 3 → doc2 (vector) should score
    # higher on "vector" than doc3 scores on anything
    got = bm25_topk(docs, "vector", 10, id_col="doc_id", content_col="text").collect()
    assert got[0].doc_id == 2 and got[0].score > 0


def test_bm25_accepts_prebuilt_postings(docs):
    postings = build_postings(docs, id_col="doc_id", content_col="text")
    a = bm25_topk(docs, "spark join", 5, id_col="doc_id", content_col="text").collect()
    b = bm25_topk(docs, "spark join", 5, id_col="doc_id", content_col="text", postings=postings).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]


def test_fuzzy_term_matches_one_edit_only(spark):
    from vector_mcp_spark.operators.lexical import fuzzy_term_topk

    df = spark.createDataFrame(
        [
            (1, "vector vector store"),
            (2, "vektor database"),
            (3, "victor works here"),   # 2 edits from 'vektor' — excluded
            (4, "completely unrelated"),
        ],
        "id long, content string",
    )
    got = {r.id: (r.matched_terms, r.score) for r in fuzzy_term_topk(df, "vektor", 10).collect()}
    assert got[1] == ("vector", 2)   # tf-weighted
    assert got[2] == ("vektor", 1)   # exact hit
    assert 3 not in got and 4 not in got
    # ranking: highest total tf first
    order = [r.id for r in fuzzy_term_topk(df, "vektor", 10).collect()]
    assert order[0] == 1


def test_snippet_window_and_position(spark):
    from vector_mcp_spark.operators.lexical import snippet_extract

    long_pad = "x" * 100
    df = spark.createDataFrame(
        [
            (1, f"{long_pad} vector appears here"),
            (2, "vector at the very start"),
            (3, "no match at all"),
        ],
        "id long, content string",
    )
    got = {r.id: r for r in snippet_extract(df, ["vector", "join"], width=10).collect()}
    assert 3 not in got
    assert got[2].hit_pos == 1 and got[2].snippet.startswith("vector")
    r1 = got[1]
    assert r1.hit_pos == 102  # 1-based: after 100 x's + space
    assert "vector" in r1.snippet and len(r1.snippet) <= 20
