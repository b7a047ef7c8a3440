"""Benchmark decontamination: flag training documents sharing token
n-grams with a held-out benchmark/eval set.

The standard pre-training hygiene step (GPT-3 §C / PaLM-style 8-gram to
13-gram overlap): any training document that shares an n-gram with an eval
document is flagged (and usually dropped) so downstream eval numbers are
not memorization artifacts. The reference has no decontamination surface —
its dedup stops at content-hash identity (vector_mcp/vector_api.py:188-206
insert-time hash check); this is the corpus-level extension (SURVEY.md
§2.4).

Scale shape: the benchmark side is small by construction (an eval suite is
MBs against a 100 TB corpus), so its distinct n-gram set is BROADCAST and
the probe is a map-side semi-join — the 100 TB training side is scanned
once, never shuffled on gram. Per-doc aggregation reuses the doc_id
partitioning of the explode, a narrow groupBy. n is a parameter: tests here
use small n because the synthetic corpus has a ~40-word vocabulary; real
corpora use 8-13.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from vector_mcp_spark.functions.expr import bind_once
from vector_mcp_spark.functions.text import tokens


def ngrams_of(tokens_col: Column | str, n: int) -> Column:
    """Distinct space-joined n-grams of a MATERIALIZED token-array column.

    The input must be a real column (pre-projected), not an inline
    ``tokens(text)`` expression: expressions referenced inside a HOF lambda
    are re-evaluated per element — an inline tokenizer would re-run its
    regexp for every gram (measured 10× slower). Documents with < n tokens
    yield an empty set."""
    t = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - n + 1),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    # sequence(1, 0) would generate a DESCENDING [1, 0] — guard short docs
    return F.when(F.size(t) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_set(content: Column | str, n: int) -> Column:
    """Single-expression form: tokenizes and builds grams in one Column.
    bind_once keeps the tokenizer to one evaluation (see ngrams_of)."""
    return bind_once(tokens(content), lambda t: ngrams_of(t, n))


def contamination_report(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Per training document: (id, n_grams, n_shared, contamination) where
    ``contamination`` = shared-gram fraction of the doc's distinct n-grams
    (6 dp). Docs with zero n-grams (shorter than n tokens) report 0.0.

    Only flagged docs (n_shared > 0) survive — the caller anti-joins the
    result against the corpus to decontaminate, keeping the report small.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    bench_grams = (
        bench.select(tokens(content_col).alias("_toks"))
        .select(F.explode(ngrams_of("_toks", n)).alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # one pass over the training grams: broadcast-mark shared grams, then a
    # single aggregation yields both the total and the shared count (the
    # gram sets are per-doc distinct, so count(*) IS n_grams)
    from vector_mcp_spark.operators.partition import spread

    # spread: the train-side tokenize+gram map must not be pinned to one
    # scan partition (guide §2.5)
    ex = spread(train).select(F.col(id_col), tokens(content_col).alias("_toks")).select(
        id_col, F.explode(ngrams_of("_toks", n)).alias("gram")
    )
    marked = ex.join(broadcast(bench_grams), "gram", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("int").alias("n_shared"),
        )
        .where(F.col("n_shared") > 0)
        .select(
            id_col,
            "n_grams",
            "n_shared",
            F.round(F.col("n_shared").cast("double") / F.col("n_grams"), 6).alias(
                "contamination"
            ),
        )
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """The corpus with every flagged document dropped (left-anti against
    the report's flagged ids — broadcast-sized by the report contract)."""
    flagged = contamination_report(train, bench, n, id_col, content_col).select(id_col)
    return train.join(broadcast(flagged), id_col, "left_anti")
