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


# Query-suite modules register themselves on import (bottom import keeps the
# registry and its helpers defined before the modules need them).
#
# Registration order is the driver's correctness-check order, and the driver
# verifies only the first 50 entries per round. Rotate so every entry gets an
# oracle row across rounds. Round 7 window (see lists below the imports):
# the 33 _ROUND6_BACKFILL entries that missed slot 50 last round (their
# newest driver rows are r3), then new round-7 operators (_PROMOTED_R7),
# then the stalest remaining greens (r4 rows) up to 50.
# ROUND 8 TODO: lead with the never-driver-checked spillover (the
# _PROMOTED_R7 tail past slot 50 — corpus_zipf_fit onward, since slot 50
# closed at events_ohlc_bars — plus ALL 17 _ROUND7_FILL entries),
# then the remaining r4/r5-latest entries (compute as all entries minus
# CORRECTNESS_r0{6,7} keys, sorted by latest driver row), then
# _PROMOTED_R8. Recompute the displaced set if _PROMOTED_R7 grew after
# this comment: displaced = (_PROMOTED_R7 + _ROUND7_FILL)[50 -
# len(_ROUND7_LEAD):] (everything the 50-slot window truncates after the
# 33 lead entries).
from vector_mcp_spark import suite_relational  # noqa: E402,F401
from vector_mcp_spark import suite_pipeline  # noqa: E402,F401
from vector_mcp_spark import suite_search  # noqa: E402,F401
from vector_mcp_spark import suite_mutation  # noqa: E402,F401
from vector_mcp_spark import suite_tpch  # noqa: E402,F401
from vector_mcp_spark import suite_mining  # noqa: E402,F401
from vector_mcp_spark import suite_vecapi  # noqa: E402,F401
# --- Round-7 window --------------------------------------------------------
# (a) The 33 _ROUND6_BACKFILL entries that fell past slot 50 in round 6
# (newest driver rows r3; all re-verified locally at sf0.01 and by
# tests/test_full_oracle.py at sf0.001 each round since).
_ROUND7_LEAD = [
    "lexical_and",
    "lexical_substring",
    "lexical_bm25",
    "hybrid_rrf",
    "lexical_multiquery",
    "hybrid_multiquery",
    "get_by_ids",
    "delete_by_ids",
    "upsert_merge",
    "engine_lifecycle",
    "dedup_exact",
    "simhash_fingerprints",
    "simjoin_top1",
    "embedding_near_dup",
    "text_stats",
    "sanitize_content",
    "events_daily_windows",
    "events_top_users",
    "streaming_windowed_events",
    "events_rollup",
    "events_user_running_total",
    "events_sliding_windows",
    "set_ops_intersect_except",
    "asof_latest_event",
    "events_value_quantiles",
    "tpch_q3_shipping_priority",
    "events_daily_pivot",
    "tpch_q1_pricing_summary",
    "top_revenue_nations",
    "dedup_normalized",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "chunk_documents",
]

# (b) New round-7 operators are appended here as they land so they get a
# driver row the round they ship (each displaces one _ROUND7_FILL slot).
_PROMOTED_R7: list[str] = [
    "federated_search",
    "rag_eval_metrics",
    "events_time_travel",
    "corpus_strip_repeated_spans",
    "corpus_semdedup",
    "embedding_mrl_recall",
    "semantic_filtered_topk",
    "events_histogram_quantiles",
    "semantic_grouped_topk",
    "semantic_scroll_page",
    "payload_facet_counts",
    "semantic_recommend",
    "semantic_discover",
    "sparse_vector_topk",
    "embedding_distance_matrix",
    "hybrid_dbsf",
    "events_ohlc_bars",
    "corpus_zipf_fit",
    "streaming_late_data_audit",
]

# (c) Stalest remaining greens (latest driver rows r4, alphabetical within
# round). Entries displaced past slot 50 here head the ROUND-8 window.
_ROUND7_FILL = [
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_projected_topk",
    "corpus_decontaminate",
    "corpus_mixture_sample",
    "corpus_pack_sequences",
    "corpus_repetition_stats",
    "corpus_weighted_sample",
    "customers_without_orders",
    "dedup_winnow_fingerprints",
    "embedding_centroid_outliers",
    "embedding_quantize_int8",
    "embedding_random_projection",
    "events_cms_user_counts",
    "events_cube",
    "events_distinct_daily",
    "events_funnel_stages",
]

_window = (_ROUND7_LEAD + _PROMOTED_R7 + _ROUND7_FILL)[:50]
_missing = [n for n in _window if n not in SUITE]
if _missing:  # fail loudly at import so a typo can't silently shrink coverage
    raise RuntimeError(f"rotation names not in SUITE: {_missing}")
_order = _window + [n for n in SUITE if n not in _window]
_entries = {n: SUITE[n] for n in _order}
SUITE.clear()
SUITE.update(_entries)
