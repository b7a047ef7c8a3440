"""Cross-corpus span novelty — the C4 repeated-span signal, scored not cut.

C4 (Raffel et al. 2020, §2.2 "we discard all but one of any three-sentence
span occurring more than once in the data set") removes repeated spans
corpus-wide. The distributable form scores each document by how much of it
was already seen: the fraction of its distinct token n-gram spans whose
first occurrence (minimum doc id) lies in an EARLIER document. A score of
1.0 = entirely novel; near 0 = boilerplate already present upstream.
Downstream, filtering/trimming is a WHERE on the score — policy stays out
of the operator.

Scale shape: tokenize once per row (`bind_once` pins the tokenizer against
per-element HOF re-evaluation), build distinct spans map-side, hash each
span to a 60-bit sha prefix BEFORE the shuffle so the first-occurrence
groupBy exchanges 8-byte keys instead of raw span strings, then one
aggregate back per document. Two shuffles total (span → first-doc, doc →
counts), both on uniform hashed keys — no all-pairs stage anywhere, so the
pass stays linear in corpus size at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_mcp_spark.functions.expr import bind_once
from vector_mcp_spark.functions.text import tokens
from vector_mcp_spark.operators.partition import spread


def _gram_hashes(toks, n: int):
    """One 60-bit sha-prefix hash per n-gram START position of ``toks`` —
    the single definition both the scoring and the stripping operator (and
    their DuckDB oracles) must match bit-for-bit."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.conv(
                F.substring(F.sha2(F.array_join(F.slice(toks, i + 1, n), " "), 256), 1, 15),
                16,
                10,
            ).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))


def _span_hashes(text_col: str, n: int):
    """Distinct n-gram spans of the token list, each as a 60-bit sha prefix."""
    return bind_once(
        tokens(F.col(text_col)), lambda toks: F.array_distinct(_gram_hashes(toks, n))
    )


def span_novelty(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_spans, n_repeated, novelty) per document with ≥1 span.

    ``n_repeated`` counts this doc's distinct spans first seen in an earlier
    document (global min-id ownership, ties to the earliest id — so the
    first copy of any duplicated span is never penalized for it);
    ``novelty`` = 1 − n_repeated / n_spans, rounded to 6 dp."""
    # spread: the tokenize + per-span sha map stage must not be pinned to the
    # single scan partition a small parquet input plans as (guide §2.5)
    spans = spread(docs).select(
        F.col(id_col).alias("id"), F.explode(_span_hashes(text_col, n)).alias("span_h")
    )
    first_seen = spans.groupBy("span_h").agg(F.min("id").alias("first_id"))
    return (
        spans.join(first_seen, "span_h")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum((F.col("first_id") < F.col("id")).cast("long")).alias("n_repeated"),
        )
        .select(
            "id",
            "n_spans",
            "n_repeated",
            F.round(1.0 - F.col("n_repeated") / F.col("n_spans"), 6).alias("novelty"),
        )
    )


def strip_repeated_spans(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The C4 cut itself (Raffel et al. 2020 §2.2): REMOVE every token
    covered by an n-gram span whose first corpus occurrence (minimum doc
    id) lies in an earlier document — ``span_novelty`` scores the overlap,
    this produces the deduplicated corpus. Returns (id, n_tokens,
    n_removed, clean_text): the first copy of any repeated span survives
    intact, later copies lose the covered tokens, singleton docs pass
    through unchanged.

    Scale shape mirrors span_novelty's: positional span hashes (60-bit sha
    prefixes) are built map-side, the first-owner groupBy and the
    flagged-position join both exchange 8-byte keys, and the final
    coverage mask is a per-row HOF over the doc's own (few) flagged start
    positions — no stage is ever quadratic in corpus size, and the
    reconstruction (filter + array_join) never shuffles text.
    """
    # "_toks" is a materialized column, so lambda references to it below are
    # plain attribute reads — no bind_once needed outside the lambda. The
    # tokenized base feeds TWO branches (the spans chain and the final
    # reassembly join); localCheckpoint materializes it once so the corpus
    # is scanned and regex-tokenized once, not once per branch (the repo's
    # standing multi-branch-input rule). Zero-token docs are excluded up
    # front — there is nothing to strip and the suite oracle's UNNEST-based
    # replay has no row for them either.
    # spread BEFORE the checkpoint: localCheckpoint preserves partitioning, so
    # a single-partition scan would pin the tokenize AND every later map stage
    # reading the checkpoint to one core (guide §2.5)
    base = spread(docs).select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks"))
    base = base.where(F.size("_toks") > 0).localCheckpoint(eager=True)
    # positional span hashes — unlike span_novelty's distinct set, coverage
    # needs offsets (positions come from posexplode)
    spans = base.select(
        "id", F.posexplode(_gram_hashes(F.col("_toks"), n)).alias("pos", "span_h")
    )
    first_seen = spans.groupBy("span_h").agg(F.min("id").alias("first_id"))
    flagged = (
        spans.join(first_seen, "span_h")
        .where(F.col("first_id") < F.col("id"))
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("pos")).alias("_starts"))
    )
    joined = base.join(flagged, "id", "left").withColumn(
        "_starts", F.coalesce(F.col("_starts"), F.array().cast("array<int>"))
    )
    kept = F.filter(
        F.sequence(F.lit(0), F.size("_toks") - 1),
        lambda i: ~F.exists(
            F.col("_starts"), lambda j: (j <= i) & (i <= j + F.lit(n - 1))
        ),
    )
    return joined.select(
        "id",
        F.size("_toks").cast("long").alias("n_tokens"),
        (F.size("_toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(kept, lambda i: F.element_at(F.col("_toks"), i + 1)), " "
        ).alias("clean_text"),
    )
