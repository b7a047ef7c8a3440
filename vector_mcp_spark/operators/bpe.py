"""Distributed BPE vocabulary induction (Sennrich et al. 2016, public).

The reference exposes token counting only (`/root/reference/vector_mcp/
vectordb/base.py` chunking uses a fixed tokenizer); a training-data engine
also needs to LEARN the tokenizer. This module runs byte-pair-encoding
merge learning as a sequence of DataFrame jobs:

* the corpus collapses once into a word-frequency dictionary (the only
  corpus-sized shuffle — at 100 TB the dict is |word vocab|-sized, ~100 M
  rows, and every subsequent merge round touches only the dict);
* each merge round is one vocab-sized aggregate (adjacent-pair counts,
  map-side partial) plus a single-row driver collect of the argmax pair —
  the same bounded-collect contract as the k-means centroids;
* applying a merge is a pure-Column `replace` over a **wrapped symbol
  string**: symbols are stored as ``·sym·`` segments concatenated
  (``·a··b··c·``), so the pair (a, b) occurs exactly as the substring
  ``·a··b·`` — never inside a longer symbol — and a left-to-right
  non-overlapping string replace reproduces BPE merge semantics exactly.
  Both Spark's `replace` and ANSI `REPLACE` scan left-to-right without
  overlap, which is why the whole learning loop replays in SQL and the
  suite entry carries a full value oracle.

Industrial BPE trainers incrementally update pair-count deltas instead of
recounting; at the suite's merge counts a full recount per round is one
codegen'd aggregate over the dict and keeps the loop stateless/restartable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "·"  # middle dot: never occurs in [a-z]+ words

WORD_RE = "[a-z]+"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq) dictionary. The single corpus-sized shuffle."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _wrapped(col):
    # 'abc' -> '·a··b··c·' : every symbol wrapped in SEP on both sides
    chars = F.split(col, "(?!$)")  # split at every boundary -> single chars
    return F.concat(F.lit(SEP), F.array_join(chars, SEP + SEP), F.lit(SEP))


def _sym_array(col):
    # wrapped string -> array of symbols
    return F.split(F.expr(f"trim(BOTH '{SEP}' FROM {col})"), SEP + SEP)


def learn_bpe(docs: DataFrame, n_merges: int, text_col: str = "text") -> list[tuple]:
    """Learn ``n_merges`` BPE merges; returns [(rank, left, right, count)].

    Ties break on (count DESC, left ASC, right ASC) so the result is a
    deterministic function of the corpus. Each round localCheckpoints the
    dict so the plan stays O(1) across iterations.
    """
    if not 1 <= n_merges <= 64:
        raise ValueError(f"learn_bpe: n_merges must be in [1, 64], got {n_merges}")
    words = (
        word_freqs(docs, text_col)
        .select("freq", _wrapped(F.col("word")).alias("s"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        arr = _sym_array("s")
        n = F.size(arr)
        pairs = (
            words.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(arr, 1, n - 1).alias("a"), F.slice(arr, 2, n - 1).alias("b")
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        a, b, cnt = pairs[0].a, pairs[0].b, int(pairs[0].cnt)
        merges.append((rank, a, b, cnt))
        pat = f"{SEP}{a}{SEP}{SEP}{b}{SEP}"
        rep = f"{SEP}{a}{b}{SEP}"
        words = words.select(
            "freq", F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("s")
        ).localCheckpoint(eager=True)
    return merges


def apply_merges(words: DataFrame, merges: list[tuple], sym_col: str = "s") -> DataFrame:
    """Apply a learned merge list to a wrapped-symbol column, in rank order."""
    col = F.col(sym_col)
    for _, a, b, _ in merges:
        col = F.replace(col, F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"), F.lit(f"{SEP}{a}{b}{SEP}"))
    return words.withColumn(sym_col, col)


def bpe_token_freqs(docs: DataFrame, merges: list[tuple], text_col: str = "text") -> DataFrame:
    """Tokenize the corpus under a learned merge list → (token, total_freq).

    One pass over the word dict: apply the replace chain (pure Column ops,
    whole-stage codegen), explode final symbols, weight by word frequency.
    """
    words = word_freqs(docs, text_col).select("freq", _wrapped(F.col("word")).alias("s"))
    tokens = apply_merges(words, merges).select(
        "freq", F.explode(_sym_array("s")).alias("token")
    )
    return tokens.groupBy("token").agg(F.sum("freq").alias("total_freq"))
