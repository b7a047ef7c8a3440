"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure Column expressions (JVM regexp + array ops — no UDFs), so they run
at scan speed over 100 TB and every one is reproducible in the DuckDB
oracle. The quality/lang-id formulas are deterministic heuristics, declared
here as THE semantics (the suite oracle encodes the same formula).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_mcp_spark.functions.text import tokens

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# token sets for the n-gram/stopword language-ID heuristic; deliberately tiny
# and fixed so the heuristic (not the lists) is what's under test.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "is", "of", "to", "a", "in", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "es", "un"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans"),
}


def token_count(content: Column) -> Column:
    return F.size(tokens(content))


def stopword_ratio(content: Column) -> Column:
    toks = tokens(content)
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, n_stop.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def alpha_ratio(content: Column) -> Column:
    n_alpha = F.length(F.regexp_replace(content, r"[^A-Za-z]", ""))
    return F.when(F.length(content) > 0, n_alpha.cast("double") / F.length(content)).otherwise(
        F.lit(0.0)
    )


def quality_score(content: Column) -> Column:
    """Deterministic quality heuristic in [0, 1]:
    0.4·stopword_ratio + 0.3·min(tokens/100, 1) + 0.3·alpha_ratio.
    (Length, punctuation and stopword components — the standard cheap
    pre-filter trio for LLM corpus curation.)"""
    length_component = F.least(token_count(content).cast("double") / 100.0, F.lit(1.0))
    return F.round(
        0.4 * stopword_ratio(content) + 0.3 * length_component + 0.3 * alpha_ratio(content), 6
    )


def lang_id(content: Column) -> Column:
    """Marker-token language ID: argmax over languages of the count of
    marker tokens present (multiplicity counted); ties and zero-evidence
    fall back to 'und' (undetermined) / lexicographically first language."""
    toks = tokens(content)

    def _marker_count(markers: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(x) for x in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: _marker_count(markers) for lang, markers in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # iterate reversed-sorted so earlier languages win ties via later .when
    for lang in sorted(scores, reverse=True):
        result = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(result)
    return result


def fingerprint(content: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token set — the classic 'bag fingerprint' for clustering shingle-free
    exact-ish dups."""
    key = F.array_join(F.array_sort(F.array_distinct(tokens(content))), " ")
    return F.md5(key)


def repetition_stats(
    df: DataFrame,
    id_col: str = "id",
    content_col: str = "content",
    line_delim: str = "\n",
    max_dup_line_frac: float = 0.30,
    max_dup_token_frac: float = 0.65,
    max_top_bigram_frac: float = 0.08,
) -> DataFrame:
    """Gopher-style repetition signals for corpus curation (Rae et al. 2021,
    'Scaling Language Models' §A1.1 repetition filters), as pure Column
    expressions:

    * ``dup_line_frac`` — fraction of (trimmed, non-empty) lines that are
      duplicates of another line in the same document;
    * ``dup_line_char_frac`` — fraction of line characters contained in
      lines occurring more than once (all copies counted);
    * ``dup_token_frac`` — 1 − distinct/total tokens;
    * ``top_bigram_frac`` — occurrences of the most frequent token bigram
      over total bigrams (count fraction; declared semantics — Gopher uses
      the character fraction, which needs the raw text span);
    * ``keep`` — True when every signal is at or under its threshold.

    Scale notes: everything is computed map-side per document with array
    expressions — NO shuffle, so the operator runs at scan speed over
    100 TB. The nested count-in-array lambdas are O(L²) in lines/bigrams
    *per document*, bounded by document size, never by corpus size. The
    token/line arrays are materialized once as projection columns before
    the nested lambdas touch them (an inline expression inside a lambda is
    re-evaluated per element — the ``bind_once`` hazard)."""
    from vector_mcp_spark.operators.partition import spread

    c = F.col(content_col)
    lines_e = F.filter(
        F.transform(F.split(c, line_delim), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    # spread: the O(L² per doc) nested-HOF stage is pure map work — pinned to
    # one core on a single-partition scan without it (guide §2.5)
    base = spread(df).select(F.col(id_col), tokens(c).alias("_toks"), lines_e.alias("_lines"))
    base = base.withColumn(
        "_bigrams",
        F.when(
            F.size("_toks") >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size("_toks") - 2),
                lambda i: F.array_join(F.slice(F.col("_toks"), i + 1, 2), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )

    lines, toks, bigrams = F.col("_lines"), F.col("_toks"), F.col("_bigrams")
    zero = F.lit(0).cast("long")
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    line_chars = F.aggregate(lines, zero, lambda a, l: a + F.length(l))
    dup_line_chars = F.aggregate(
        lines,
        zero,
        lambda a, l: a
        + F.when(F.size(F.filter(lines, lambda x: x == l)) > 1, F.length(l).cast("long")).otherwise(
            zero
        ),
    )
    dup_line_char_frac = F.when(
        line_chars > 0, dup_line_chars.cast("double") / line_chars
    ).otherwise(F.lit(0.0))
    n_tokens = F.size(toks)
    dup_token_frac = F.when(
        n_tokens > 0, (n_tokens - F.size(F.array_distinct(toks))).cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    top_bigram_n = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(bigrams),
                lambda g: F.size(F.filter(bigrams, lambda x: x == g)),
            )
        ),
        F.lit(0),
    )
    top_bigram_frac = F.when(
        F.size(bigrams) > 0, top_bigram_n.cast("double") / F.size(bigrams)
    ).otherwise(F.lit(0.0))

    dup_line_frac = F.round(dup_line_frac, 6)
    dup_line_char_frac = F.round(dup_line_char_frac, 6)
    dup_token_frac = F.round(dup_token_frac, 6)
    top_bigram_frac = F.round(top_bigram_frac, 6)
    return base.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
        dup_line_char_frac.alias("dup_line_char_frac"),
        n_tokens.alias("n_tokens"),
        dup_token_frac.alias("dup_token_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        (
            (dup_line_frac <= max_dup_line_frac)
            & (dup_token_frac <= max_dup_token_frac)
            & (top_bigram_frac <= max_top_bigram_frac)
        ).alias("keep"),
    )


def text_stats(df: DataFrame, id_col: str = "id", content_col: str = "content") -> DataFrame:
    c = F.col(content_col)
    return df.select(
        F.col(id_col),
        token_count(c).alias("n_tokens"),
        F.length(c).alias("n_chars"),
        F.round(stopword_ratio(c), 6).alias("stop_ratio"),
        F.round(alpha_ratio(c), 6).alias("alpha_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )


def zipf_fit(df: DataFrame, content_col: str = "content", top_n: int = 100) -> DataFrame:
    """Least-squares Zipf fit over the corpus token-frequency distribution:
    slope/intercept/R² of ln(freq) ~ ln(rank) for the ``top_n`` most frequent
    tokens (rank ties broken lexically). A healthy natural-language corpus
    sits near slope -1; synthetic or templated text drifts toward 0 — a cheap
    corpus-level quality diagnostic (no analogue in `/root/reference`; the
    pipeline north-star's corpus-statistics family).

    Scale shape: tokenization is a map-side JVM regexp + explode, the
    frequency table is one map-side-combinable groupBy on the (vocabulary-
    bounded) token key, the rank pass is TakeOrdered over top_n rows, and the
    regression is Spark's built-in ``regr_*`` aggregates over ≤ top_n points —
    nothing after the first groupBy depends on corpus size. Outputs round at
    4 dp (regr_* are quotients of order-dependent float sums).
    """
    from pyspark.sql import Window

    freqs = (
        df.select(F.explode(tokens(F.col(content_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    top = freqs.orderBy(F.col("freq").desc(), F.col("tok")).limit(top_n)
    w = Window.orderBy(F.col("freq").desc(), F.col("tok"))
    ranked = top.select(
        F.log(F.col("freq").cast("double")).alias("y"),
        F.log(F.row_number().over(w).cast("double")).alias("x"),
    )
    return ranked.agg(
        F.round(F.regr_slope("y", "x"), 4).alias("zipf_slope"),
        F.round(F.regr_intercept("y", "x"), 4).alias("zipf_intercept"),
        F.round(F.regr_r2("y", "x"), 4).alias("zipf_r2"),
        F.count("*").alias("n_tokens"),
    )
