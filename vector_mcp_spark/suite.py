"""Declared query suite: one entry per implemented operator (SURVEY.md §2).

Each suite entry couples a Spark DataFrame builder ``(spark, sf_dir) ->
DataFrame`` with the ANSI/DuckDB oracle SQL the driver hash-compares it
against at sf0.01. Column names/aliases are kept identical on both sides;
floats are rounded to 6 dp on both sides; every ranking is tie-broken by id
so both engines select the same rows.

The driver pre-registers views: region nation customer supplier part orders
lineitem events documents embeddings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from vector_mcp_spark.functions.embedder import hash_embed


@dataclass
class SuiteEntry:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver does rows-only check
    tags: tuple[str, ...] = field(default=())


SUITE: dict[str, SuiteEntry] = {}


def register(name: str, oracle: str | None, *tags: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        SUITE[name] = SuiteEntry(spark_fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a driver parquet table, normalizing event-time columns to plain
    TIMESTAMP regardless of how the testdata builder stored them:

    * TIMESTAMP(NANOS) — Spark's vectorized reader rejects it; read the raw
      int64 nanos (``nanosAsLong``) and rebuild as microsecond timestamps.
    * timestamp[us] not UTC-adjusted — Spark reads TIMESTAMP_NTZ, which
      ``unix_micros``/interval arithmetic reject; cast to TIMESTAMP (the
      session runs UTC, so wall-clock values — and the DuckDB oracle's naive
      reading of the same file — are preserved exactly).
    """
    path = f"{sf_dir}/{table}.parquet"
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    # driver testdata is single-file parquet; Spark-written tables are
    # directories — probe the schema from any part file in that case
    schema_path = path
    if os.path.isdir(path):
        parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if parts:
            schema_path = os.path.join(path, sorted(parts)[0])
    schema = pq.read_schema(schema_path)
    ns_cols = [
        f.name for f in schema if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    ]
    if ns_cols:
        # Must not rely on a read failure to set the conf: once set, reads
        # succeed with BIGINT in place of the nanos column.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for name in ns_cols:
        if dict(df.dtypes).get(name) == "bigint":
            # integer div: bigint/1000 in SQL is DOUBLE and rounds-to-nearest,
            # off by 1µs vs DuckDB's truncating ns→µs read
            df = df.withColumn(name, F.timestamp_micros(F.expr(f"`{name}` div 1000")))
    for name, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(name, F.col(name).cast("timestamp"))
    return df


def docs_with_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The working 'collection': documents joined to precomputed vectors
    (stand-in for the embedding model per SURVEY §7 risk 6)."""
    docs = load(spark, sf_dir, "documents")
    embs = load(spark, sf_dir, "embeddings")
    return docs.join(embs, docs.doc_id == embs.vec_id).select(
        "doc_id", "text", "lang", "source", "n_chars", "embedding", "label"
    )


# ---------------------------------------------------------------------------
# Shared fixed parameters (must match between Spark fn and oracle SQL)
# ---------------------------------------------------------------------------

SEM_QUERY_TEXT = "machine learning"
SEM_QUERY_VEC = hash_embed(SEM_QUERY_TEXT, 64)
SEM_K = 10

MULTI_QUERY_TEXTS = ["vector database", "stream processing", "hash join"]
MULTI_QUERY_VECS = [(i, hash_embed(t, 64)) for i, t in enumerate(MULTI_QUERY_TEXTS)]

LEX_QUERY = "spark join vector"
LEX_K = 10

DIST_THRESHOLD = 0.8

RRF_K = 60
HYBRID_N = 10
HYBRID_W_SEM = 0.5
HYBRID_W_LEX = 0.5


def _vec_sql_literal(vec: list[float]) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]::DOUBLE[]"


def _cosine_sql(emb_expr: str, vec: list[float]) -> str:
    q = _vec_sql_literal(vec)
    return (
        f"list_dot_product({emb_expr}::DOUBLE[], {q}) / "
        f"(sqrt(list_dot_product({emb_expr}::DOUBLE[], {emb_expr}::DOUBLE[])) * "
        f"sqrt(list_dot_product({q}, {q})))"
    )


def _dot_sql(emb_expr: str, vec: list[float]) -> str:
    """Inner-product score (pgvector <#> convention, sign-flipped to
    higher-is-better) — same sequential fold as Spark's dot_lit."""
    return f"list_dot_product({emb_expr}::DOUBLE[], {_vec_sql_literal(vec)})"


def _l2_sql(emb_expr: str, vec: list[float]) -> str:
    """Euclidean distance via the same ||d||² + ||q||² − 2·d·q expansion
    (and the same query-side constant) as functions.vector.l2_distance_lit,
    so both engines do bit-identical arithmetic."""
    from vector_mcp_spark.functions.vector import sq_norm_py

    q = _vec_sql_literal(vec)
    qq = repr(sq_norm_py(vec))
    inner = (
        f"(list_dot_product({emb_expr}::DOUBLE[], {emb_expr}::DOUBLE[]) "
        f"+ {qq} - 2.0 * list_dot_product({emb_expr}::DOUBLE[], {q}))"
    )
    # CASE, not greatest(0.0, ·): DuckDB greatest ignores NULLs too, and the
    # Spark side now propagates NULL for a NULL embedding (ADVICE r11)
    return f"sqrt(CASE WHEN {inner} < 0.0 THEN 0.0 ELSE {inner} END)"


# Query-suite modules register themselves on import (bottom import keeps the
# registry and its helpers defined before the modules need them).
#
# Registration order is the driver's correctness-check order, and the driver
# verifies only the first 50 entries per round. Rotate so every entry gets an
# oracle row across rounds. Round 11 window (see lists below the imports):
# the 32 _ROUND10_FILL entries displaced past slot 50 last round (latest
# driver rows r6, the stalest in the registry — exactly
# (_ROUND10_LEAD + _PROMOTED_R10 + _ROUND10_FILL)[50:] of the r10 lists,
# recorded in git history at d5867f3), then new round-11 operators
# (_PROMOTED_R11, so they get a driver row the round they ship), then the
# entries whose latest driver row is r7 (CORRECTNESS_r07 keys minus any
# later-green, alphabetical) up to 50.
# ROUND 14 TODO: lead with the _ROUND13_FILL entries displaced past slot 50
# this round — recompute as (_ROUND13_LEAD + _PROMOTED_R13 +
# _ROUND13_FILL)[50:] — then _PROMOTED_R14, then the stalest remaining
# greens ("changed since last driver green" first, then r9/r10 stalest)
# alphabetical, up to 50.
from vector_mcp_spark import suite_relational  # noqa: E402,F401
from vector_mcp_spark import suite_pipeline  # noqa: E402,F401
from vector_mcp_spark import suite_search  # noqa: E402,F401
from vector_mcp_spark import suite_mutation  # noqa: E402,F401
from vector_mcp_spark import suite_tpch  # noqa: E402,F401
from vector_mcp_spark import suite_mining  # noqa: E402,F401
from vector_mcp_spark import suite_vecapi  # noqa: E402,F401
# --- Round-11 window -------------------------------------------------------
# (a) The 32 _ROUND10_FILL entries displaced past slot 50 last round (latest
# driver rows r6, the stalest in the registry).
_ROUND11_LEAD = [
    "embedding_covariance_cells",
    "embedding_diag_mahalanobis",
    "embedding_isotropy_report",
    "embedding_nearest_centroid_eval",
    "embedding_top_pc",
    "events_anomaly_zscore",
    "events_bootstrap_mean_ci",
    "events_cusum_changepoint",
    "events_equidepth_histogram",
    "events_markov_transitions",
    "events_seasonal_decomposition",
    "events_theil_sen_trend",
    "events_trajectory_similarity",
    "events_twap_user_day",
    "events_value_winsorized",
    "lexical_fuzzy_term",
    "lexical_indexed_tf",
    "lexical_tf",
    "lineitem_price_discount_skyline",
    "parts_item_similarity",
    "parts_label_propagation",
    "parts_top_communities",
    "parts_triangle_count",
    "semantic_multiquery",
    "semantic_rerank_crossencoder",
    "semantic_threshold",
    "semantic_topk",
    "streaming_abandoned_clicks",
    "streaming_dedup_ingest",
    "streaming_kmv_distinct",
    "streaming_session_windows",
    "tpch_q12_ship_latency",
]

# (b) New round-11 operators are appended here as they land so they get a
# driver row the round they ship (each displaces one _ROUND11_FILL slot).
_PROMOTED_R11: list[str] = [
    "semantic_topk_dot",
    "semantic_topk_l2",
    "hybrid_sparse_dense",
    "semantic_threshold_l2",
    "ann_ivf_l2_topk",
]

# (c) Stalest remaining greens (latest driver rows r7 = CORRECTNESS_r07
# keys minus any later-green, alphabetical). Entries displaced past slot 50
# here head the ROUND-12 window.
_ROUND11_FILL = [
    "asof_latest_event",
    "chunk_documents",
    "corpus_semdedup",
    "corpus_strip_repeated_spans",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_normalized",
    "delete_by_ids",
    "embedding_distance_matrix",
    "embedding_mrl_recall",
    "embedding_near_dup",
    "engine_lifecycle",
    "events_daily_pivot",
    "events_daily_windows",
    "events_histogram_quantiles",
    "events_ohlc_bars",
    "events_rollup",
    "events_sliding_windows",
    "events_time_travel",
    "events_top_users",
    "events_user_running_total",
    "events_value_quantiles",
    "federated_search",
    "get_by_ids",
    "hybrid_dbsf",
    "hybrid_multiquery",
    "hybrid_rrf",
    "lexical_and",
    "lexical_bm25",
    "lexical_multiquery",
    "lexical_substring",
    "payload_facet_counts",
    "rag_eval_metrics",
    "sanitize_content",
    "semantic_discover",
    "semantic_filtered_topk",
    "semantic_grouped_topk",
    "semantic_recommend",
    "semantic_scroll_page",
    "set_ops_intersect_except",
    "simhash_fingerprints",
    "simjoin_top1",
    "sparse_vector_topk",
    "streaming_windowed_events",
    "text_stats",
    "top_revenue_nations",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "upsert_merge",
]

# --- Round-12 window -------------------------------------------------------
# (a) The 37 _ROUND11_FILL entries displaced past slot 50 last round (latest
# driver rows r7, the stalest in the registry — exactly
# (_ROUND11_LEAD + _PROMOTED_R11 + _ROUND11_FILL)[50:] of the r11 lists
# above, i.e. _ROUND11_FILL[13:]).
_ROUND12_LEAD = _ROUND11_FILL[13:]

# (b) New round-12 operators are appended here as they land so they get a
# driver row the round they ship (each displaces one _ROUND12_FILL slot).
_PROMOTED_R12: list[str] = [
    "ann_hnsw_l2_topk",
    "multivector_named_topk",
]

# (c) Stalest remaining greens (latest driver rows r8 = CORRECTNESS_r08
# keys minus any later-green, alphabetical). Entries displaced past slot 50
# here head the ROUND-13 window.
_ROUND12_FILL = [
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_projected_topk",
    "collection_aliases",
    "collection_snapshot",
    "corpus_decontaminate",
    "corpus_mixture_sample",
    "corpus_pack_sequences",
    "corpus_psi_drift",
    "corpus_repetition_stats",
    "corpus_token_fertility",
    "corpus_weighted_sample",
    "corpus_zipf_fit",
]

# --- Round-13 window -------------------------------------------------------
# (a) Changed-code-first (standing rule since r13): entries whose
# implementation changed in r12 but whose latest driver green predates the
# change (VERDICT r12 item 1) lead the window.
_ROUND13_LEAD = [
    "hybrid_sparse_dense",
    "semantic_topk_l2",
    "semantic_threshold_l2",
    "ann_ivfpq_topk",
    "ann_ivfpq_rerank_topk",
    "corpus_semdedup",
    "ann_hnsw_topk",
    "ann_hnsw_filtered_topk",
    "ann_filtered_routed_topk",
    "hybrid_indexed_rrf",
]

# (b) New round-13 operators are appended here as they land so they get a
# driver row the round they ship (each displaces one _ROUND13_FILL slot).
_PROMOTED_R13: list[str] = [
    "ann_range_filtered_topk",
    "ann_hnsw_dot_topk",
    "ann_matchany_filtered_topk",
    "ann_ivf_dot_topk",
]

# (c) Stalest remaining greens: the 39 entries whose latest driver row is r8
# (CORRECTNESS_r08 keys minus any later-green, alphabetical), then r9
# spillover (alphabetical) to 50. Entries displaced past slot 50 here head
# the ROUND-14 window.
_ROUND13_FILL = [
    "corpus_weighted_sample",
    "corpus_zipf_fit",
    "customers_without_orders",
    "dedup_winnow_fingerprints",
    "embedding_centroid_outliers",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "events_cms_user_counts",
    "events_cube",
    "events_distinct_daily",
    "events_funnel_stages",
    "events_hll_distinct",
    "events_hll_merge_rollup",
    "events_interarrival",
    "events_kmv_distinct",
    "events_kmv_merge_rollup",
    "events_kmv_set_ops",
    "events_ks_two_sample",
    "events_salted_distinct",
    "events_sampled_quantiles",
    "events_sessionization",
    "events_trailing_1h_window",
    "events_user_gap_days",
    "events_zorder_keys",
    "late_orders_by_priority",
    "lineitem_column_profile",
    "multimodal_features",
    "parts_bfs_reach",
    "parts_personalized_pagerank",
    "payload_ordered_scroll",
    "promo_revenue",
    "range_join_event_counts",
    "semantic_mmr_topk",
    "streaming_click_purchase_join",
    "streaming_cms_user_counts",
    "streaming_enriched_events",
    "streaming_hll_distinct",
    "streaming_late_data_audit",
    "streaming_user_running_stats",
    # r9 spillover (alphabetical)
    "corpus_bloom_decontaminate",
    "corpus_ccnet_filter",
    "corpus_dsir_weights",
    "corpus_expectations",
]

_window = (_ROUND13_LEAD + _PROMOTED_R13 + _ROUND13_FILL)[:50]
_missing = [n for n in _window if n not in SUITE]
if _missing:  # fail loudly at import so a typo can't silently shrink coverage
    raise RuntimeError(f"rotation names not in SUITE: {_missing}")
_order = _window + [n for n in SUITE if n not in _window]
_entries = {n: SUITE[n] for n in _order}
SUITE.clear()
SUITE.update(_entries)
