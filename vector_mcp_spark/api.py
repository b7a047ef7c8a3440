"""VectorSearchApi — the reference ``Api`` surface (SURVEY.md §3, Q9)
re-expressed over CollectionEngine + DataFrame operators.

Mirrors the observable behavior of ``vector_mcp/vector_api.py:195-566``:
boundary validation (§2.5), query-text sanitization before search
(``vector_api.py:548``), semantic/lexical legs, weighted-RRF hybrid fusion
(``vector_api.py:518-566``), finite-score result hygiene
(``vector_api.py:368-386``). The retriever facade of
``retriever/retriever.py:15-101`` (`query` = semantic top-k, `bm25_query` =
lexical) collapses into the same methods.

Where the reference's steps 5-9 are Python loops + network hops, here the
whole search is ONE lazy DataFrame DAG (two ranked subplans → union →
groupBy-sum → TakeOrderedAndProject) executed by a single action.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_mcp_spark.engine import CollectionEngine
from vector_mcp_spark.functions.embedder import hash_embed
from vector_mcp_spark.operators.hybrid import rrf_fuse
from vector_mcp_spark.operators.lexical import lexical_tf_topk, lexical_tf_topk_multi
from vector_mcp_spark.operators.semantic import semantic_topk, semantic_topk_multi
from vector_mcp_spark.sanitize import sanitize_text_py
from vector_mcp_spark.validation import (
    EngineError,
    validate_metric,
    validate_number_results,
    validate_question,
    validate_rrf_k,
    validate_weights,
)


class VectorSearchApi:
    def __init__(
        self,
        engine: CollectionEngine,
        embed_query: Callable[[str], Sequence[float]] | None = None,
        dim: int = 64,
        embed_model: Callable[[Sequence[str]], Sequence[Sequence[float]]] | None = None,
        rerank_model: Callable[[str, Sequence[str]], Sequence[float]] | None = None,
    ):
        """``embed_model`` is the batched real-model seam (texts → vectors):
        it embeds both queries and missing-vector documents, exactly like the
        reference's one-model-for-both contract (``vectordb/base.py:34-75``).
        When omitted, the ``VECTOR_MCP_SPARK_EMBED_ENDPOINT`` env gate may
        supply a ``RemoteEmbeddingClient``; otherwise the deterministic hash
        embedder keeps everything oracle-checkable offline."""
        from vector_mcp_spark.functions.embedding_client import RemoteEmbeddingClient

        from vector_mcp_spark.functions.rerank_client import RemoteRerankClient

        self.engine = engine
        self.dim = dim
        self._embed_model = embed_model if embed_model is not None else RemoteEmbeddingClient.from_env()
        self._rerank_model = rerank_model if rerank_model is not None else RemoteRerankClient.from_env()
        if embed_query is not None:
            self._embed_query = embed_query
        elif self._embed_model is not None:
            model = self._embed_model
            self._embed_query = lambda q: list(model([q])[0])
        else:
            self._embed_query = lambda q: hash_embed(q, dim)

    def embed_query(self, question: str) -> list[float]:
        """The one query-embedding seam (remote model when configured,
        deterministic hash embed otherwise) — public so transports that
        need a raw vector (the veneer's indexed_search) share the exact
        representation every text search uses."""
        return list(self._embed_query(question))

    # -- retrieval (base.py:189-231 protocol) -------------------------------

    def semantic_search(
        self,
        collection: str,
        questions: Sequence[str],
        number_results: int = 5,
        distance_threshold: float | None = None,
        metric: str | None = None,
    ) -> DataFrame:
        """Multi-query semantic search → (query_id, rank, id, content, score).

        ``metric`` ∈ {cosine, dot, l2} — the pgvector ``<=>``/``<#>``/``<->``
        conventions (l2 ranks ascending); refuses unknown values with the
        stable ``metric_invalid`` code. ``None`` (the default) scores under
        the collection's locked distance config, qdrant-style; passing a
        metric overrides per query like pgvector's per-operator choice."""
        number_results = validate_number_results(number_results)
        if metric is None:
            metric = self.engine.collection_distance(collection)
        metric = validate_metric(metric)
        if not questions:
            raise EngineError("question_invalid")  # vector_api.py:548 rejects empty
        cleaned = [sanitize_text_py(validate_question(q)) for q in questions]
        docs = self._docs(collection)
        queries = [(i, self._embed_query(q)) for i, q in enumerate(cleaned)]
        return semantic_topk_multi(
            docs,
            queries,
            number_results,
            id_col="id",
            emb_col="embedding",
            payload_cols=("content",),
            distance_threshold=distance_threshold,
            metric=metric,
        )

    def lexical_search(
        self, collection: str, questions: Sequence[str], number_results: int = 5
    ) -> DataFrame:
        """Multi-query lexical (tf) search → (query_id, id, content, score).

        One job for N queries (lexical_tf_topk_multi scores every query
        map-side in a single pass), not N unioned single-query legs."""
        number_results = validate_number_results(number_results)
        if not questions:
            raise EngineError("question_invalid")
        cleaned = [(i, sanitize_text_py(validate_question(q))) for i, q in enumerate(questions)]
        docs = self._docs(collection)
        ranked = lexical_tf_topk_multi(
            docs, cleaned, number_results, id_col="id", content_col="content"
        )
        # ranked is ≤ N*k rows — broadcast it against the (big) docs payload
        return (
            docs.select("id", "content")
            .join(F.broadcast(ranked), "id")
            .select("query_id", "id", "content", "score")
        )

    def search(
        self,
        collection: str,
        question: str,
        number_results: int = 5,
        semantic_weight: float = 0.5,
        lexical_weight: float = 0.5,
        rrf_k: int = 60,
    ) -> DataFrame:
        """Hybrid RRF search (vector_api.py:518-566) → (id, content, score)."""
        number_results = validate_number_results(number_results)
        rrf_k = validate_rrf_k(rrf_k)
        w_sem, w_lex = validate_weights([semantic_weight, lexical_weight])
        cleaned = sanitize_text_py(validate_question(question))
        docs = self._docs(collection)
        leg_k = max(number_results * 2, 20)
        # the semantic leg ranks under the collection's locked distance
        # (create_collection's contract); RRF is rank-based, so an
        # ascending-better l2 leg just flips its ranking key before fusing
        metric = self.engine.collection_distance(collection)
        sem = semantic_topk(
            docs, self._embed_query(cleaned), leg_k,
            id_col="id", emb_col="embedding", metric=metric,
        )
        if metric == "l2":
            sem = sem.withColumn("score", -F.col("score"))
        lex = lexical_tf_topk(docs, cleaned, leg_k, id_col="id", content_col="content")
        fused = rrf_fuse([(sem, w_sem), (lex, w_lex)], number_results, rrf_k=rrf_k, id_col="id")
        payload = docs.select("id", "content")
        out = fused.join(payload, "id", "left")
        # result hygiene: drop non-finite scores (vector_api.py:368-375)
        return out.where(
            ~F.isnan("score") & (F.col("score") != float("inf")) & (F.col("score") != float("-inf"))
        ).select("id", "content", "score").orderBy(F.col("score").desc(), F.col("id").asc())

    def rerank_search(
        self,
        collection: str,
        question: str,
        number_results: int = 5,
        shortlist: int = 50,
    ) -> DataFrame:
        """Two-stage retrieval: bi-encoder semantic shortlist, cross-encoder
        rerank — (id, content, score). The rerank stage scores the BOUNDED
        shortlist (k ≤ shortlist ≤ 1000, the reference's fusion-loop
        contract): with a ``RemoteRerankClient`` configured the texts go to
        the model endpoint driver-side; otherwise the deterministic hash
        scorer keeps the pipeline oracle-checkable offline and stays fully
        distributed (a Column expression, no collect)."""
        from vector_mcp_spark.functions.rerank import rerank_score_col

        number_results = validate_number_results(number_results)
        shortlist = validate_number_results(shortlist)
        if shortlist < number_results:
            raise EngineError("number_results_invalid")
        cleaned = sanitize_text_py(validate_question(question))
        docs = self._docs(collection)
        short = (
            semantic_topk(
                docs, self._embed_query(cleaned), shortlist,
                id_col="id", emb_col="embedding",
                metric=self.engine.collection_distance(collection),
            )
            .select("id")
            .join(docs.select("id", "content"), "id")
        )
        if self._rerank_model is not None:
            rows = short.select("id", "content").collect()  # bounded ≤1000
            scores = self._rerank_model(cleaned, [r.content for r in rows])
            scored = self.engine.spark.createDataFrame(
                [(r.id, float(sc)) for r, sc in zip(rows, scores)], "id string, score double"
            )
            out = docs.select("id", "content").join(F.broadcast(scored), "id")
        else:
            out = short.select("id", "content", rerank_score_col("content", cleaned).alias("score"))
        return out.orderBy(F.col("score").desc(), F.col("id").asc()).limit(number_results)

    def federated_search(
        self,
        collections: Sequence[str],
        question: str,
        number_results: int = 5,
        k_per_collection: int | None = None,
    ) -> DataFrame:
        """One query across MANY collections, fused to a global ranking —
        (collection, id, content, score, collection_rank, rank).

        The reference searches one collection per call (mcp_server.py:202-293);
        this unions the per-collection document frames into ONE distributed
        plan (a Spark union moves no data) and runs the federated operator:
        per-collection quota via a collection-partitioned window, global fuse
        over |collections|·k rows. Scores are raw cosine against the same
        query vector — DELIBERATELY ignoring per-collection distance
        configs: a cross-collection ranking needs one comparable score
        scale, and cosine-vs-l2 raw scores are not fusable (per-collection
        metric search stays available via semantic_search on each)."""
        from vector_mcp_spark.operators.federated import federated_topk

        number_results = validate_number_results(number_results)
        if not collections:
            raise EngineError("collection_not_found")
        k_per = validate_number_results(
            k_per_collection if k_per_collection is not None else number_results
        )
        cleaned = sanitize_text_py(validate_question(question))
        qvec = self._embed_query(cleaned)
        parts = []
        for name in dict.fromkeys(collections):  # dedup, preserve order
            parts.append(
                self._docs(name).select(
                    F.lit(name).alias("collection"), "id", "content", "embedding"
                )
            )
        docs = parts[0]
        for p in parts[1:]:
            docs = docs.unionByName(p)
        fused = federated_topk(
            docs, qvec, k_per_collection=k_per, n=number_results,
            collection_col="collection", id_col="id", emb_col="embedding",
        )
        # re-attach content by (collection, id) — the fused frame is n rows,
        # broadcast side of the join, so payloads never shuffle corpus-wide.
        # (score hygiene lives inside federated_topk, BEFORE ranking, so
        # NaN rows can never consume quota or top-n slots)
        return (
            docs.join(
                F.broadcast(fused), ["collection", "id"], "inner"
            )
            .select("collection", "id", "content", "score", "collection_rank", "rank")
            .orderBy("rank")
        )

    def _docs(self, collection: str) -> DataFrame:
        df = self.engine.read(collection)
        # Embed rows missing vectors at read time (the reference embeds at
        # insert; engine.add_documents may store content-only rows). Whether
        # the embed projection is needed comes from the engine's catalog flag
        # (maintained at mutation time) — a driver-side lookup, so building
        # the search plan launches ZERO Spark jobs; the old `WHERE embedding
        # IS NULL LIMIT 1` probe cost an extra table scan per query.
        if self.engine.needs_embed(collection):
            from vector_mcp_spark.functions.embedder import embed_documents

            df = embed_documents(
                df, text_col="content", out_col="embedding", dim=self.dim,
                model=self._embed_model,
            )
        return df
