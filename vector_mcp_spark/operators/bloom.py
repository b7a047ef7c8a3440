"""Deterministic Bloom filter as a mergeable Spark aggregate.

The decontamination semi-join broadcasts the eval set's distinct n-grams —
MBs today, but a *collection* of eval suites at 100 TB scale can reach GBs.
A Bloom filter caps the broadcast at ``n_bits/8`` bytes regardless of set
size, at the price of deterministic false positives (flag-and-review, or
chain the exact semi-join behind the bloom prefilter so it only sees the
tiny hit fraction).

Everything is reproducible arithmetic: bit position j of value v =
``sha256(v || '|b' || j)`` (60-bit prefix) mod n_bits; words are 32 bits
stored in BIGINT (no sign games), built with a ``bit_or`` aggregate — which
also makes filters MERGEABLE: per-partition/per-day filters OR together
losslessly, the same roll-up story as the KMV sketches. ANSI SQL replays
build and probe bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def _position(val: Column, j: int, n_bits: int) -> Column:
    h = F.conv(F.substring(F.sha2(F.concat(val, F.lit(f"|b{j}")), 256), 1, 15), 16, 10)
    return F.pmod(h.cast("long"), F.lit(n_bits))


def bloom_build(
    df: DataFrame, value_col: str, n_bits: int = 4096, n_hashes: int = 3
) -> DataFrame:
    """Aggregate ``value_col`` into (word_idx, bits) rows — at most
    ``n_bits / 32`` of them; absent words are all-zero. ``bit_or`` gives
    map-side partial aggregation AND lossless filter merging."""
    if n_bits % WORD_BITS:
        raise ValueError("n_bits must be a multiple of 32")
    val = F.col(value_col)
    positions = F.array(*[_position(val, j, n_bits) for j in range(n_hashes)])
    ex = df.select(F.explode(positions).alias("pos"))
    # shiftleft's Python wrapper wants a literal bit count; call_function
    # passes the Column through to the SQL variant, which accepts one
    word = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (F.col("pos") % WORD_BITS).cast("int")
    )
    return (
        ex.select((F.col("pos") / WORD_BITS).cast("int").alias("word_idx"), word.alias("w"))
        .groupBy("word_idx")
        .agg(F.bit_or("w").alias("bits"))
    )


def bloom_words(built: DataFrame, n_bits: int = 4096) -> list[int]:
    """Collect the (bounded, ≤ n_bits/32 rows) filter into a dense word
    list for broadcasting as literals."""
    words = [0] * (n_bits // WORD_BITS)
    for r in built.collect():
        if r.word_idx >= len(words):
            raise ValueError(
                f"bloom_words: word_idx {r.word_idx} out of range for n_bits={n_bits} "
                "— pass the same n_bits used in bloom_build"
            )
        words[r.word_idx] = int(r.bits)
    return words


def bloom_might_contain(
    val: Column, words: list[int], n_bits: int = 4096, n_hashes: int = 3
) -> Column:
    """Membership probe against an inlined word list: true iff every hash
    position's bit is set. No data reads, no join — a pure projection on
    the probing scan."""
    words_lit = F.array(*[F.lit(int(w)) for w in words])
    checks = []
    for j in range(n_hashes):
        pos = _position(val, j, n_bits)
        word = F.element_at(words_lit, (pos / WORD_BITS).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, (pos % WORD_BITS).cast("int")
        ).bitwiseAND(F.lit(1))
        checks.append(bit == 1)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out
