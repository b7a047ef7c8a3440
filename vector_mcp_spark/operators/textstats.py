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
