from __future__ import annotations

import pytest

from vector_mcp_spark.api import VectorSearchApi
from vector_mcp_spark.engine import CollectionEngine
from vector_mcp_spark.validation import EngineError

CORPUS = [
    "Python is a great programming language for data work",
    "Vector databases store embeddings for semantic search",
    "Apache Spark processes large datasets in parallel",
    "Databases use indexes to speed up queries",
    "Machine learning models learn from data",
]


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    eng = CollectionEngine(spark, str(tmp_path_factory.mktemp("api_root")))
    eng.create_collection("kb")
    eng.add_documents("kb", CORPUS)
    return VectorSearchApi(eng)


def test_hybrid_search_end_to_end(api):
    got = api.search("kb", "database search", number_results=3)
    rows = got.collect()
    assert 0 < len(rows) <= 3
    assert rows[0].content is not None
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_lexical_leg_drives_matching(api):
    rows = api.search("kb", "Python programming", number_results=5).collect()
    top_contents = [r.content for r in rows[:2]]
    assert any("Python" in c for c in top_contents)


def test_semantic_search_multi_query(api):
    got = api.semantic_search("kb", ["data processing", "semantic search"], number_results=2)
    rows = got.collect()
    assert {r.query_id for r in rows} == {0, 1}
    assert all(r.rank in (1, 2) for r in rows)


def test_lexical_search_batch(api):
    rows = api.lexical_search("kb", ["Python", "databases"], number_results=3).collect()
    assert {r.query_id for r in rows} <= {0, 1}
    assert all(r.score > 0 for r in rows)


def test_validation_boundary(api):
    with pytest.raises(EngineError, match="question_invalid"):
        api.search("kb", "   ")
    with pytest.raises(EngineError, match="number_results_invalid"):
        api.search("kb", "q", number_results=0)
    with pytest.raises(EngineError, match="number_results_invalid"):
        api.search("kb", "q", number_results=True)
    with pytest.raises(EngineError, match="rrf_k_invalid"):
        api.search("kb", "q", rrf_k=0)
    with pytest.raises(EngineError, match="hybrid_weights_invalid"):
        api.search("kb", "q", semantic_weight=0.0, lexical_weight=0.0)


def test_query_sanitized_before_search(api):
    # PII in the query must not crash and must be redacted pre-embedding
    rows = api.search("kb", "find alice@example.com data", number_results=2).collect()
    assert len(rows) > 0


def test_empty_questions_rejected(api):
    with pytest.raises(EngineError, match="question_invalid"):
        api.lexical_search("kb", [])
    with pytest.raises(EngineError, match="question_invalid"):
        api.semantic_search("kb", [])


def test_plan_build_launches_no_jobs(api, spark):
    """Building the search DAG must not run any Spark job (the old
    ``WHERE embedding IS NULL LIMIT 1`` probe cost an extra table scan per
    query before the search even started)."""
    sc = spark.sparkContext
    sc.setJobGroup("plan_only_probe", "api plan build")
    try:
        api.search("kb", "database search", number_results=3)
        api.semantic_search("kb", ["data"], number_results=2)
        api.lexical_search("kb", ["data"], number_results=2)
    finally:
        sc.setJobGroup("", "")
    assert sc.statusTracker().getJobIdsForGroup("plan_only_probe") == []


def test_needs_embed_flag_tracks_mutations(spark, tmp_path_factory):
    from vector_mcp_spark.functions.embedder import hash_embed

    eng = CollectionEngine(spark, str(tmp_path_factory.mktemp("flag_root")))
    eng.create_collection("vecs", dimension=64)
    # fully-embedded ingest → flag stays False → search plan skips the
    # (Arrow round-trip) embed projection entirely
    eng.add_documents("vecs", ["a doc", "b doc"], embeddings=[hash_embed("a doc"), hash_embed("b doc")])
    assert eng.needs_embed("vecs") is False
    # content-only ingest flips it, exactly once, driver-side
    eng.add_documents("vecs", ["c doc"])
    assert eng.needs_embed("vecs") is True
    # searches still work over the mixed table (lazy embed fills the gap)
    rows = VectorSearchApi(eng).search("vecs", "doc", number_results=3).collect()
    assert len(rows) > 0


def test_federated_search_across_collections(spark, tmp_path_factory):
    from vector_mcp_spark.api import VectorSearchApi
    from vector_mcp_spark.engine import CollectionEngine
    from vector_mcp_spark.validation import EngineError

    eng = CollectionEngine(spark, str(tmp_path_factory.mktemp("fed_root")))
    api = VectorSearchApi(eng)
    eng.create_collection("kb_a")
    eng.add_documents("kb_a", ["spark processes data fast", "cats nap in the sun"])
    eng.create_collection("kb_b")
    eng.add_documents("kb_b", ["data processing with spark", "gardening tips for spring"])

    out = api.federated_search(["kb_a", "kb_b"], "spark data processing",
                               number_results=3, k_per_collection=1).collect()
    # quota 1 per collection: at most one hit per collection, globally ranked
    assert len(out) == 2
    assert {r.collection for r in out} == {"kb_a", "kb_b"}
    assert [r.rank for r in out] == [1, 2]
    assert all(r.collection_rank == 1 for r in out)
    # unknown collection inside the fan-out → stable error
    import pytest as _pytest

    with _pytest.raises(EngineError, match="collection_not_found"):
        api.federated_search(["kb_a", "nope"], "q")
    with _pytest.raises(EngineError, match="collection_not_found"):
        api.federated_search([], "q")


def test_semantic_search_metric_variants(api):
    """metric=dot/l2 serve through the facade: dot descends, l2 ascends
    (lower distance = better rank), and each facade result equals the
    single-query operator under the same metric."""
    from vector_mcp_spark.functions.embedder import embed_documents, hash_embed
    from vector_mcp_spark.operators.semantic import semantic_topk

    q = "vector databases store embeddings"
    docs = embed_documents(api.engine.read("kb"), text_col="content", out_col="embedding")
    for metric in ("cosine", "dot", "l2"):
        rows = api.semantic_search("kb", [q], number_results=3, metric=metric).collect()
        assert len(rows) == 3
        ranked = sorted(rows, key=lambda r: r.rank)
        scores = [r.score for r in ranked]
        assert scores == sorted(scores, reverse=(metric != "l2"))
        single = semantic_topk(
            docs, hash_embed(q, 64), 3, id_col="id", emb_col="embedding", metric=metric
        ).collect()
        assert [r.id for r in ranked] == [r.id for r in single]
        assert [r.score for r in ranked] == [r.score for r in single]


def test_semantic_search_metric_invalid_is_stable_code(api):
    with pytest.raises(EngineError, match="metric_invalid"):
        api.semantic_search("kb", ["anything"], metric="manhattan")


def test_semantic_search_defaults_to_collection_distance(spark, tmp_path):
    """qdrant-style: a search without an explicit metric scores under the
    collection's locked distance config; passing one overrides per query."""
    from vector_mcp_spark.api import VectorSearchApi
    from vector_mcp_spark.engine import CollectionEngine

    eng = CollectionEngine(spark, str(tmp_path / "apidist_root"))
    api = VectorSearchApi(eng)
    eng.create_collection("l2api", distance="l2")
    eng.add_documents("l2api", [f"api metric doc {i}" for i in range(10)])

    got = api.semantic_search("l2api", ["api metric doc 4"], number_results=3).collect()
    got = sorted(got, key=lambda r: r.rank)
    assert got[0].content == "api metric doc 4"
    scores = [r.score for r in got]
    assert scores == sorted(scores), "default search on an l2 collection ranks ascending"

    # explicit override still wins (pgvector per-operator choice)
    cos = api.semantic_search(
        "l2api", ["api metric doc 4"], number_results=3, metric="cosine"
    ).collect()
    cos = sorted(cos, key=lambda r: r.rank)
    assert [r.score for r in cos] == sorted((r.score for r in cos), reverse=True)
