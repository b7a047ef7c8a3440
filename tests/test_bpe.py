"""BPE learning twin test: the distributed loop must agree, merge for
merge, with a from-scratch pure-Python BPE on the same corpus — the
classic dict-of-symbol-tuples algorithm (Sennrich et al. 2016), written
here independently of the Spark code path."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple]:
    import re

    freqs = Counter()
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            freqs[tuple(w)] += 1
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, f in freqs.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, cnt))
        new: Counter = Counter()
        for syms, f in freqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += f
        freqs = new
    return merges


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps all day, the fox does not",
    "low lower lowest newer newest wide wider widest",
    "aaa aaaa aa aaa abab ababab",
    "Mixed CASE and 123 digits are stripped to letter runs only.",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "doc_id int, text string")


def test_learn_bpe_matches_python_twin(docs):
    from vector_mcp_spark.operators.bpe import learn_bpe

    assert learn_bpe(docs, 12) == _py_bpe(TEXTS, 12)


def test_overlapping_runs_merge_left_to_right(spark):
    # 'aaaaa' under merge (a,a): left-to-right non-overlap -> aa aa a
    from vector_mcp_spark.operators.bpe import apply_merges, bpe_token_freqs, learn_bpe

    d = spark.createDataFrame([(0, "aaaaa")], "doc_id int, text string")
    merges = learn_bpe(d, 1)
    assert [(m[1], m[2]) for m in merges] == [("a", "a")]
    toks = {r.token: r.total_freq for r in bpe_token_freqs(d, merges).collect()}
    assert toks == {"aa": 2, "a": 1}
    del apply_merges  # imported to assert it exists as public surface


def test_token_freqs_conserve_characters(docs):
    # total characters is invariant under merging
    from vector_mcp_spark.operators.bpe import bpe_token_freqs, learn_bpe

    merges = learn_bpe(docs, 6)
    tok = bpe_token_freqs(docs, merges)
    merged_chars = tok.select(
        F.sum(F.length("token") * F.col("total_freq")).alias("c")
    ).collect()[0].c
    base_chars = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
            ).alias("w")
        )
        .select(F.sum(F.length("w")).alias("c"))
        .collect()[0]
        .c
    )
    assert merged_chars == base_chars


def test_learn_bpe_bounds(docs):
    from vector_mcp_spark.operators.bpe import learn_bpe

    with pytest.raises(ValueError):
        learn_bpe(docs, 0)
    with pytest.raises(ValueError):
        learn_bpe(docs, 65)
