"""Deduplication operators for LLM-training-data pipelines.

Beyond the reference's exact content-hash dedup
(``vector_mcp/vector_api.py:303-317,363-366``), this module adds the
near-dup family a 100 TB corpus pipeline needs: normalized-key dedup,
blocked n-gram Jaccard, MinHash+LSH banding, SimHash. All hash choices are
cross-engine deterministic (sha256 hex, lexicographic ``min`` as the MinHash
permutation) so every variant stays DuckDB-oracle-checkable.

Scale design:

- exact / normalized dedup: one hash-partitioned groupBy — the canonical
  map-side-combine aggregation; no row data moves, only (key, id).
- n-gram Jaccard: *blocked* self-join (block on cheap invariants such as
  language + length bucket) so candidate pairs are O(Σ block²), not O(N²).
- MinHash LSH: signatures are a single explode+groupBy; candidate
  generation is an equi-join on (band, signature) — a shuffle join on a
  *small* key space instead of a cross join. Verification (exact Jaccard)
  touches only candidate pairs.
- SimHash: one aggregation per doc; near-dup = equality on band keys
  (hamming-adjacent lookups via band rotation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_mcp_spark.functions.text import tokens

JACCARD_DECIMALS = 6


def exact_dedup_groups(df: DataFrame, id_col: str = "id", content_col: str = "content") -> DataFrame:
    """Group identical content: (content_id, n_docs, kept_id) — kept_id is
    the minimum id (deterministic winner; the reference keeps the *last*
    writer within a batch, order-insensitive here)."""
    return (
        df.select(F.sha2(F.col(content_col), 256).alias("content_id"), F.col(id_col))
        .groupBy("content_id")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("kept_id"))
    )


def normalized_key_dedup(
    df: DataFrame, id_col: str = "id", content_col: str = "content", n_prefix_tokens: int = 2
) -> DataFrame:
    """Dedup on a normalized key (first N casefolded tokens) — the cheap
    'title/prefix' dedup pass. Returns (dedup_key, n_docs, kept_id)."""
    key = F.array_join(F.slice(tokens(F.col(content_col)), 1, n_prefix_tokens), " ")
    return (
        df.select(key.alias("dedup_key"), F.col(id_col))
        .groupBy("dedup_key")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("kept_id"))
    )


def _distinct_tokens(content_col: str) -> F.Column:
    return F.array_distinct(tokens(F.col(content_col)))


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "id",
    content_col: str = "content",
    block_cols: tuple[str, ...] = (),
    ngram: int = 1,
) -> DataFrame:
    """Blocked exact Jaccard near-dup pairs: (id_a, id_b, jaccard).

    Jaccard over distinct token n-grams. ``block_cols`` restrict the
    self-join to same-block pairs (candidate blocking), making the operator
    O(Σ block²) instead of O(N²) — at 100 TB, blocking on cheap invariants
    is what keeps this runnable.
    """
    toks = _distinct_tokens(content_col)
    if ngram > 1:
        joined = tokens(F.col(content_col))
        grams = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(joined) - ngram, F.lit(-1))),
            lambda i: F.array_join(F.slice(joined, i + 1, ngram), " "),
        )
        toks = F.array_distinct(grams)
    base = df.select(F.col(id_col).alias("_id"), *block_cols, toks.alias("_toks"))
    a = base.select(
        F.col("_id").alias("id_a"), F.col("_toks").alias("toks_a"), *[F.col(c).alias(f"_ba_{c}") for c in block_cols]
    )
    b = base.select(
        F.col("_id").alias("id_b"), F.col("_toks").alias("toks_b"), *[F.col(c).alias(f"_bb_{c}") for c in block_cols]
    )
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = cond & (F.col(f"_ba_{c}") == F.col(f"_bb_{c}"))
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    union = F.size(F.col("toks_a")) + F.size(F.col("toks_b")) - inter
    return (
        a.join(b, cond)
        .withColumn("jaccard", F.round(inter.cast("double") / union, JACCARD_DECIMALS))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "id",
    content_col: str = "content",
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per document: (id, p, minhash) for p in [0, P).

    The 'permutation' family is h_p(tok) = sha256(p || '|' || tok) with the
    *lexicographic minimum* as the min-hash — engine-agnostic and exactly
    reproducible in ANSI SQL (min over strings), unlike murmur-based MLlib
    MinHashLSH.
    """
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(_distinct_tokens(content_col)).alias("tok")
    )
    perms = exploded.select("id", "tok", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("p"))
    hashed = perms.select(
        "id", "p", F.sha2(F.concat(F.col("p").cast("string"), F.lit("|"), F.col("tok")), 256).alias("h")
    )
    return hashed.groupBy("id", "p").agg(F.min("h").alias("minhash"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """Band the signatures and emit distinct candidate pairs (id_a < id_b)
    sharing any band signature. Join key space is (band, sig) — small, so
    this is an ordinary shuffle join, never a cross join."""
    banded = (
        signatures.withColumn("band", (F.col("p") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "minhash"))), lambda s: s["minhash"]
                ),
                "|",
            ).alias("sig")
        )
    )
    left = banded.select(F.col("id").alias("id_a"), "band", "sig")
    right = banded.select(F.col("id").alias("id_b"), "band", "sig")
    return (
        left.join(right, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "id",
    content_col: str = "content",
    num_hashes: int = 16,
    bands: int = 2,
) -> DataFrame:
    """MinHash-LSH near-dup: candidates from band collisions, verified by
    exact Jaccard ≥ threshold. Returns (id_a, id_b, jaccard)."""
    sigs = minhash_signatures(df, id_col, content_col, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands, num_hashes // bands)
    toks = df.select(F.col(id_col).alias("_tid"), _distinct_tokens(content_col).alias("_toks"))
    pairs = (
        cands.join(toks.select(F.col("_tid").alias("id_a"), F.col("_toks").alias("toks_a")), "id_a")
        .join(toks.select(F.col("_tid").alias("id_b"), F.col("_toks").alias("toks_b")), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    union = F.size(F.col("toks_a")) + F.size(F.col("toks_b")) - inter
    return (
        pairs.withColumn("jaccard", F.round(inter.cast("double") / union, JACCARD_DECIMALS))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str = "id", content_col: str = "content", bits: int = 32) -> DataFrame:
    """SimHash fingerprint per doc: (id, simhash long).

    Token hash = first 8 hex chars of sha256 (32 bits, cross-engine
    reproducible); bit b of the fingerprint is 1 iff the tf-weighted sum of
    (bit_b ? +1 : −1) over tokens is positive.
    """
    toks = df.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(content_col))).alias("tok"))
    tf = toks.groupBy("id", "tok").agg(F.count("*").alias("tf"))
    h32 = F.conv(F.substring(F.sha2(F.col("tok"), 256), 1, 8), 16, 10).cast("long")
    tf = tf.withColumn("h", h32)
    bit_cols = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = tf.groupBy("id").agg(*bit_cols)
    fingerprint = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return sums.select("id", fingerprint.alias("simhash"))
