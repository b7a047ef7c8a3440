"""Deterministic embedding model for tests and oracle-checkable queries.

Shape mirrors the reference's ``MockEmbedding``
(``tests/test_all_backends.py:44-64``: 768-dim,
``v[i] = hash(text + str(i)) % 100 / 100``) but replaces Python's
process-salted ``hash`` with sha256 so the vector is stable across
processes/engines, and defaults to dim=64 to match the driver's
``embeddings.parquet`` fixture.

Real model serving stays behind the same seam: ``embed_documents`` is a
``mapInPandas`` transform batching one model call per Arrow batch — the
distributed equivalent of the reference's one-batched-call-per-ingest
contract (``vector_mcp/vectordb/base.py:34-75``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def hash_embed(text: str, dim: int = 64) -> list[float]:
    """Deterministic pseudo-embedding in [0, 1)^dim."""
    return [
        int.from_bytes(hashlib.sha256(f"{text}|{i}".encode()).digest()[:8], "big") % 1000 / 1000.0
        for i in range(dim)
    ]


def embed_documents(
    df: DataFrame,
    text_col: str = "content",
    out_col: str = "embedding",
    dim: int = 64,
    model: Callable[[Sequence[str]], Sequence[Sequence[float]]] | None = None,
) -> DataFrame:
    """Attach embeddings via Arrow-batched ``mapInPandas``.

    One model call per batch — the vectorized analogue of the reference's
    single batched embedding request per ingest (``base.py:52-62``). With no
    ``model`` given, uses the deterministic hash embedder. Rows that already
    have a non-null ``out_col`` are passed through unchanged (the reference
    only embeds docs missing vectors, ``base.py:52-56``).
    """
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name != out_col)
    out_schema = f"{fields}, {out_col} array<float>"
    has_existing = out_col in df.columns

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = model if model is not None else (lambda texts: [hash_embed(t, dim) for t in texts])
        for pdf in batches:
            if has_existing:
                missing = pdf[out_col].isna()
            else:
                pdf = pdf.copy()
                pdf[out_col] = None
                missing = pdf[out_col].isna()
            if missing.any():
                vecs = fn(pdf.loc[missing, text_col].fillna("").tolist())
                pdf.loc[missing, out_col] = pd.Series(list(vecs), index=pdf.index[missing])
            yield pdf

    return df.mapInPandas(_embed, schema=out_schema)
