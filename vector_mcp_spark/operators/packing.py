"""Training-sequence packing: assign documents to fixed-token-budget
training sequences the way an LLM data loader does — concatenate documents
in a deterministic order, then chunk the token stream into ``budget``-sized
sequences (documents may straddle a boundary; the assignment records each
document's start sequence and offset).

The reference engine has no packing surface (its scope stops at retrieval);
this is pipeline infrastructure a training corpus needs between "deduped
documents" and "tokenized shards". SURVEY.md §2.4 extension family.

Scale shape: a single global concatenation order would serialize 100 TB
through one sort — instead documents are first hash-assigned to one of
``n_writers`` independent writer streams (sha256-based, so the DuckDB
oracle replays it), and the prefix-sum window runs PER WRITER. State per
window partition is one running sum; with n_writers sized to the cluster's
write parallelism (thousands), no partition sees more than corpus/n_writers
tokens and the plan is one narrow shuffle + one window, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _writer_assign(id_col: str, n_writers: int) -> F.Column:
    # sha256 of the id's decimal string, first 15 hex chars → 60-bit int,
    # mod n_writers. Engine-agnostic: DuckDB replays it exactly.
    h = F.conv(F.substring(F.sha2(F.col(id_col).cast("string"), 256), 1, 15), 16, 10).cast(
        "long"
    )
    return (h % n_writers).cast("int")


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_count_col: str = "n_tokens",
    n_writers: int = 8,
) -> DataFrame:
    """Per document: (id, writer, seq_id, seq_offset) where ``writer`` is the
    hash-assigned concatenation stream, ``seq_id`` the index (within the
    writer) of the ``budget``-token training sequence the document STARTS in,
    and ``seq_offset`` its token offset inside that sequence.

    Documents are concatenated in ascending ``id_col`` order within each
    writer; a document whose span crosses a sequence boundary straddles into
    the next sequence (standard concat-then-chunk packing).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_writers < 1:
        raise ValueError("n_writers must be >= 1")
    w = Window.partitionBy("writer").orderBy(F.col(id_col).asc())
    start = (F.sum(token_count_col).over(w) - F.col(token_count_col)).cast("long")
    return (
        df.withColumn("writer", _writer_assign(id_col, n_writers))
        .select(
            id_col,
            "writer",
            F.floor(start / budget).cast("long").alias("seq_id"),
            (start % budget).cast("long").alias("seq_offset"),
        )
    )


def packing_stats(assignments: DataFrame, budget: int) -> DataFrame:
    """Per writer: sequences started, documents packed, straddle count —
    the shard-balance dashboard for a packing run. Pure partial-agg groupBy."""
    return assignments.groupBy("writer").agg(
        F.count("*").alias("n_docs"),
        (F.max("seq_id") + 1).cast("long").alias("n_seqs"),
        F.sum(F.when(F.col("seq_offset") > 0, 0).otherwise(1)).cast("long").alias(
            "n_boundary_starts"
        ),
    )
