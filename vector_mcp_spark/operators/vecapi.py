"""Vector-DB point-API operators — the query surface of the engines the
reference wraps, beyond plain KNN.

The reference's backends are thin clients over engines whose public APIs all
include this family: Qdrant ``scroll`` (used directly by the reference's
lexical path, ``vector_mcp/vectordb/qdrant.py:272-302``), ``query_points``
(``qdrant.py:242-270``) plus its companion recommend / discover / facet /
search-matrix calls, pgvector's ``sparsevec`` sparse-dot search
(``vector_mcp/vectordb/postgres.py`` backend engine), and ChromaDB/Couchbase
filtered listing (``chromadb.py:259-290``, ``couchbase.py:700``). A reference
user migrating here gets each as a DataFrame operator with the same
semantics, planned for 100 TB:

- **scroll**: keyset pagination (``id > cursor ORDER BY id LIMIT n``) — the
  predicate reaches the parquet scan (min/max pruning skips whole files at
  scale; an OFFSET scan would not), and the page is TakeOrderedAndProject.
- **facet**: value counts under a filter — one map-side-combined groupBy on
  a low-cardinality payload key; shuffle is |values| rows.
- **recommend**: average-vector strategy — the example vectors are a bounded
  point lookup (exactly what the server does), the search itself is the
  standard map-side cosine + TakeOrdered.
- **discover**: context-pair constrained search — all pair cosines are
  literal map-side projections; zero shuffle before top-k.
- **sparse dot**: posting-list join — explode tokens, semi-join the tiny
  query-term table (broadcast), aggregate matching postings only. Shuffle is
  O(matching postings), never O(corpus tokens); this IS the inverted-index
  plan, expressed relationally.
- **distance matrix**: pairwise cosines over a BOUNDED filtered sample
  (the API contract caps the sample, Qdrant-style) via a broadcast
  self-join; never an unbounded self cross-join.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_mcp_spark.functions.text import tokens
from vector_mcp_spark.functions.vector import cosine_similarity, cosine_similarity_lit
from vector_mcp_spark.operators.semantic import semantic_topk, with_similarity

SCORE_DECIMALS = 6


def scroll_page(
    docs: DataFrame,
    after_id: int | None,
    page_size: int,
    filter_cond: Column | None = None,
    id_col: str = "id",
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """One page of a filtered keyset scroll (qdrant.py:282 ``client.scroll``;
    the cursor is the last id of the previous page, Qdrant's
    ``next_page_offset`` contract). Keyset — not OFFSET — so page N costs the
    same as page 1: the ``id > cursor`` predicate is pushed to the scan and
    prunes row groups by min/max, and the page itself plans as
    TakeOrderedAndProject (per-partition partial top-k, no global sort)."""
    out = docs
    if filter_cond is not None:
        out = out.where(filter_cond)
    if after_id is not None:
        out = out.where(F.col(id_col) > F.lit(after_id))
    return (
        out.select(id_col, *payload_cols)
        .orderBy(F.col(id_col).asc())
        .limit(page_size)
    )


def scroll_page_ordered(
    docs: DataFrame,
    order_col: str,
    after: tuple | None,
    page_size: int,
    filter_cond: Column | None = None,
    id_col: str = "id",
    payload_cols: Sequence[str] = (),
    descending: bool = True,
) -> DataFrame:
    """One page of a payload-ORDERED keyset scroll (qdrant ``scroll`` with
    ``order_by``): rows sorted by (order_col, id) with the composite cursor
    ``after = (last_order_value, last_id)``. Keyset, not OFFSET — the
    row-predicate on the cursor pushes to the scan and the page plans as
    TakeOrderedAndProject, so page N costs page 1 at any table size."""
    out = docs
    if filter_cond is not None:
        out = out.where(filter_cond)
    o, i = F.col(order_col), F.col(id_col)
    if after is not None:
        last_o, last_i = after
        strict = o < F.lit(last_o) if descending else o > F.lit(last_o)
        out = out.where(strict | ((o == F.lit(last_o)) & (i > F.lit(last_i))))
    order = [o.desc() if descending else o.asc(), i.asc()]
    return out.select(id_col, order_col, *payload_cols).orderBy(*order).limit(page_size)


def facet_counts(
    docs: DataFrame,
    facet_col: str,
    filter_cond: Column | None = None,
    top: int | None = None,
) -> DataFrame:
    """Payload facet counts (the Qdrant facet API shape): distinct values of
    one payload key among filter-matching points, with match counts, ordered
    by (count desc, value asc). Map-side partial aggregation makes the
    shuffle |distinct values| rows regardless of corpus size."""
    out = docs
    if filter_cond is not None:
        out = out.where(filter_cond)
    agg = (
        out.groupBy(F.col(facet_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.col("count").desc(), F.col("value").asc())
    )
    return agg.limit(top) if top is not None else agg


def _quantize9(x: float) -> float:
    """Half-up 9-dp quantization (floor(x*1e9+0.5)/1e9) — the same op the
    oracle runs in SQL, so a derived query vector is bit-identical across
    engines regardless of each side's summation order."""
    return math.floor(x * 1e9 + 0.5) / 1e9


def _fetch_examples(
    coll: DataFrame, ids: list[int], id_col: str, emb_col: str
) -> dict[int, list[float]]:
    """Bounded example-vector point lookup shared by both recommend
    strategies — the same fetch the qdrant server performs. Collects |ids|
    vectors to the driver; bounded the way the API layer bounds k
    (1000 examples ≈ 256 KB of vectors, far past any real use)."""
    if len(ids) > 1000:
        raise ValueError("recommend accepts at most 1000 example ids")
    rows = coll.where(F.col(id_col).isin(ids)).select(id_col, emb_col).collect()
    by_id = {row[0]: [float(x) for x in row[1]] for row in rows}
    missing = [i for i in ids if i not in by_id]
    if missing:
        raise ValueError(f"example ids not found: {missing}")
    return by_id


def recommend_topk(
    coll: DataFrame,
    positive_ids: Sequence[int],
    negative_ids: Sequence[int],
    k: int,
    id_col: str = "id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Recommendation search, average-vector strategy (the Qdrant recommend
    API's documented default): search with ``q = avg(pos) + (avg(pos) -
    avg(neg))`` — the positive centroid pushed away from the negative one —
    excluding the example points from the results.

    The example-vector fetch is a bounded point lookup (|ids| rows — the
    same lookup the server performs); the search is the standard map-side
    cosine + TakeOrderedAndProject. The derived vector is quantized to 9 dp
    so both engines rank on identical doubles."""
    pos = [int(i) for i in positive_ids]
    neg = [int(i) for i in negative_ids]
    if not pos:
        raise ValueError("recommend requires at least one positive example")
    by_id = _fetch_examples(coll, pos + neg, id_col, emb_col)

    def _avg(ids: list[int]) -> list[float]:
        vecs = [by_id[i] for i in sorted(ids)]  # fixed fold order
        return [sum(dim_vals) / len(vecs) for dim_vals in zip(*vecs)]

    avg_pos = _avg(pos)
    if neg:
        avg_neg = _avg(neg)
        qvec = [p + (p - n) for p, n in zip(avg_pos, avg_neg)]
    else:
        qvec = avg_pos
    qvec = [_quantize9(x) for x in qvec]
    rest = coll.where(~F.col(id_col).isin(pos + neg))
    return semantic_topk(rest, qvec, k, id_col=id_col, emb_col=emb_col)


def recommend_best_score_topk(
    coll: DataFrame,
    positive_ids: Sequence[int],
    negative_ids: Sequence[int],
    k: int,
    id_col: str = "id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Recommendation search, best-score strategy (the Qdrant recommend
    API's second strategy): each candidate scores by its BEST similarity
    to any single positive example — unless some negative example matches
    it even better, in which case the score flips to −(best_neg²), pushing
    strongly-negative-matching points far down the ranking. Unlike the
    average-vector strategy, this finds points similar to ANY positive
    (multi-modal preference sets) rather than to their centroid.

    Same bounded example fetch; the scoring is one map-side expression per
    example vector (|pos|+|neg| literal cosines folded with greatest) —
    zero shuffle before the TakeOrdered top-k. Example points excluded.
    """
    pos = [int(i) for i in positive_ids]
    neg = [int(i) for i in negative_ids]
    if not pos:
        raise ValueError("recommend requires at least one positive example")
    by_id = _fetch_examples(coll, pos + neg, id_col, emb_col)

    def _best(ids: list[int]) -> Column:
        sims = [cosine_similarity_lit(F.col(emb_col), by_id[i]) for i in sorted(ids)]
        return F.greatest(*sims) if len(sims) > 1 else sims[0]

    best_pos = _best(pos)
    if neg:
        best_neg = _best(neg)
        score = F.when(best_pos > best_neg, best_pos).otherwise(-(best_neg * best_neg))
    else:
        score = best_pos
    rest = coll.where(~F.col(id_col).isin(pos + neg))
    return (
        rest.withColumn("score", score)
        .select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("score", F.round("score", 6))
    )


def discover_topk(
    coll: DataFrame,
    target_vec: Sequence[float],
    context_pairs: Sequence[tuple[Sequence[float], Sequence[float]]],
    k: int,
    id_col: str = "id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Discovery search (the Qdrant discover API shape): rank first by how
    many context (positive, negative) pairs a point satisfies — cosine to
    the pair's positive strictly greater than to its negative — then by
    similarity to the target. Steers the search toward a region described
    by examples rather than raw proximity.

    Output ``(id, satisfied, score)`` ordered by (satisfied desc, score
    desc, id asc), top k. Every pair cosine is a literal map-side
    projection (one codegen'd expression per pair); zero shuffle before the
    TakeOrdered top-k."""
    scored = with_similarity(coll, target_vec, emb_col)
    sat: Column = F.lit(0)
    for pos_vec, neg_vec in context_pairs:
        sat = sat + (
            cosine_similarity_lit(F.col(emb_col), pos_vec)
            > cosine_similarity_lit(F.col(emb_col), neg_vec)
        ).cast("int")
    return (
        scored.withColumn("satisfied", sat)
        .select(id_col, "satisfied", "score")
        .orderBy(F.col("satisfied").desc(), F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("score", F.round("score", SCORE_DECIMALS))
    )


def context_topk(
    coll: DataFrame,
    context_pairs: Sequence[tuple[Sequence[float], Sequence[float]]],
    k: int,
    id_col: str = "id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Context search (the Qdrant context API — the third of the explore
    trio next to recommend and discover): no target vector at all; each
    (positive, negative) pair contributes loss = min(0, sim_pos − sim_neg),
    and points rank by the SUM of losses. A point inside every pair's
    positive half-space scores a perfect 0 — context search returns the
    zero-loss region rather than nearest neighbors, which is how qdrant
    implements "show me more like this side of the boundary" exploration.

    Ties at 0 (the common case) break by id ascending, pinned on both
    engines. One literal map-side cosine pair per context pair, zero
    shuffle before the TakeOrdered top-k.
    """
    loss: Column = F.lit(0.0)
    for pos_vec, neg_vec in context_pairs:
        loss = loss + F.least(
            F.lit(0.0),
            cosine_similarity_lit(F.col(emb_col), pos_vec)
            - cosine_similarity_lit(F.col(emb_col), neg_vec),
        )
    return (
        coll.withColumn("score", loss)
        .select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("score", F.round("score", SCORE_DECIMALS))
    )


def sparse_dot_topk(
    docs: DataFrame,
    query_weights: Sequence[tuple[str, float]],
    k: int,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """Sparse-vector dot-product retrieval (pgvector ``sparsevec`` /
    Qdrant sparse-vector shape, SPLADE-style): each document's sparse
    vector is its L1-normalized token TF; the query is a tiny
    ``{term: weight}`` map; score = Σ_t q_t · tf_t(doc) / len(doc).

    Plan = the inverted index, relationally: explode tokens → broadcast
    equi-join against the query-term table (only matching postings survive
    the join, so the shuffle is O(postings of the query terms), never
    O(corpus tokens)) → per-doc aggregate. Document length rides the
    exploded rows as a precomputed column, avoiding a second pass."""
    spark = docs.sparkSession
    qdf = spark.createDataFrame(
        [(str(t).casefold(), float(w)) for t, w in query_weights],
        "term string, qw double",
    )
    toks = tokens(F.col(content_col))
    base = docs.select(
        F.col(id_col), toks.alias("_toks")
    ).where(F.size("_toks") > 0)
    postings = base.select(
        id_col, F.size("_toks").alias("_dlen"), F.explode("_toks").alias("term")
    )
    hits = (
        postings.join(F.broadcast(qdf), "term")
        .groupBy(id_col, "_dlen")
        .agg(F.sum("qw").alias("_num"))
    )
    return (
        hits.select(id_col, (F.col("_num") / F.col("_dlen")).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("score", F.round("score", SCORE_DECIMALS))
    )


def indexed_sparse_dot_topk(
    postings: DataFrame,
    doclens: DataFrame,
    query_weights: Sequence[tuple[str, float]],
    k: int,
    id_col: str = "id",
) -> DataFrame:
    """Sparse-vector retrieval SERVED from a persisted named-sparse family
    (qdrant named sparse vectors / pgvector ``sparsevec``, the SPLADE
    serving shape): ``postings`` is the materialized (term, id, tf)
    inverted index — bucket-prune it on the query's terms before passing —
    and ``doclens`` the (id, dlen) L1 norms, both written once at index
    build. Score = Σ_t q_t·tf_t / dlen — identical to
    :func:`sparse_dot_topk`, but the only corpus work at serve time is the
    query terms' postings rows; nothing re-tokenizes."""
    spark = postings.sparkSession
    qdf = spark.createDataFrame(
        [(str(t).casefold(), float(w)) for t, w in query_weights],
        "term string, qw double",
    )
    hits = (
        postings.join(F.broadcast(qdf), "term")
        .groupBy(id_col)
        .agg(F.sum(F.col("qw") * F.col("tf")).alias("_num"))
    )
    return (
        hits.join(doclens.where(F.col("dlen") > 0), id_col)
        .select(id_col, (F.col("_num") / F.col("dlen")).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumn("score", F.round("score", SCORE_DECIMALS))
    )


def distance_matrix_topk(
    embs: DataFrame,
    sample_cond: Column,
    per_row: int,
    id_col: str = "id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Pairwise-distance matrix over a bounded sample (the Qdrant
    search-matrix API shape): for every point matching ``sample_cond``,
    its ``per_row`` nearest sample neighbors by cosine, self excluded.

    Output ``(a_id, rank, b_id, score)``. The API contract is what bounds
    the quadratic: the sample predicate selects the comparison set (caller
    caps it, as the server API does), the right side broadcasts, and the
    per-row top-k is a window partitioned by ``a_id`` over |sample|²
    narrow rows — never a self-join of the full collection."""
    sample = embs.where(sample_cond).select(
        F.col(id_col).alias("a_id"), F.col(emb_col).alias("_va")
    )
    other = embs.where(sample_cond).select(
        F.col(id_col).alias("b_id"), F.col(emb_col).alias("_vb")
    )
    pairs = sample.join(
        F.broadcast(other), F.col("a_id") != F.col("b_id")
    ).withColumn("score", cosine_similarity(F.col("_va"), F.col("_vb")))
    w = Window.partitionBy("a_id").orderBy(F.col("score").desc(), F.col("b_id").asc())
    return (
        pairs.select("a_id", "b_id", "score")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= per_row)
        .select("a_id", "rank", "b_id", F.round("score", SCORE_DECIMALS).alias("score"))
    )
