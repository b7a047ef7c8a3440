"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star extension — treat media as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas UDFs over ``mapInPandas``. The media libraries
(PIL/ffmpeg/librosa) are NOT in this container, so the decode kernels are
stubbed — ``deterministic_fake=True`` produces a seeded fake feature vector
(sha256 of the bytes) so the Spark-side plumbing (schema, batching,
partitioning) is fully real and testable; ``deterministic_fake=False``
raises ``NotImplementedError`` at the exact seam a real decoder would fill.

Scale notes: media bytes never hit the driver; each Arrow batch is decoded
executor-side; `spark.sql.files.maxPartitionBytes` bounds scan partitions;
feature extraction output (small vectors) is what shuffles, not the media.
"""

from __future__ import annotations

import base64
import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)


def _fake_seed_hex(data: bytes, tag: int) -> str:
    """Seed digest for the fake decoders, deliberately derived through a
    VARCHAR-friendly recipe — ``sha256(base64(data) + "|" + tag)`` — so ANSI
    SQL (DuckDB ``sha256(base64(blob) || '|' || tag)``) can replay it and
    the multimodal suite queries get full value oracles despite the decode
    stub. The fake is a placeholder; its derivation is arbitrary, so pick
    the one an oracle can check."""
    return hashlib.sha256(
        (base64.b64encode(data).decode("ascii") + "|" + str(tag)).encode("ascii")
    ).hexdigest()


def _fake_features(data: bytes, dim: int) -> list[float]:
    # one digest yields 16 dims (2-byte hex chunks); counter-extend beyond
    # that — the fake is a placeholder, so cheap beats fancy
    hexbuf = ""
    block = 0
    while len(hexbuf) < 4 * dim:
        hexbuf += _fake_seed_hex(data, block)
        block += 1
    return [int(hexbuf[4 * i : 4 * i + 4], 16) % 1000 / 1000.0 for i in range(dim)]


def extract_features(
    media: DataFrame, dim: int = 16, deterministic_fake: bool = True
) -> DataFrame:
    """Media → feature vector: (media_id, kind, features array<float>).

    Real decoders slot into ``_decode``; the fake is deterministic on the
    bytes so tests are reproducible.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("media decoding requires PIL/ffmpeg/librosa")
            feats = [_fake_features(bytes(b) if b is not None else b"", dim) for b in pdf["data"]]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.mapInPandas(_decode, schema="media_id string, kind string, features array<float>")


def resize_images(media: DataFrame, width: int, height: int, deterministic_fake: bool = True) -> DataFrame:
    """Image resize seam: returns (media_id, data binary, meta) with updated
    dimensions. Fake mode passes bytes through and rewrites meta (the
    plumbing — struct rebuild, schema — is what's under test)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("image resize requires PIL")
            yield pdf

    out = media.where(F.col("kind") == "image").mapInPandas(
        _resize, schema=MEDIA_SCHEMA
    )
    return out.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000, deterministic_fake: bool = True) -> DataFrame:
    """Video frame sampling seam: one row per sampled frame
    (media_id, frame_idx, frame_ts_ms, frame binary). Fake mode emits
    sha256-derived placeholder frames at the right timestamps."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("frame sampling requires ffmpeg")
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for mid, data, meta in zip(pdf["media_id"], pdf["data"], pdf["meta"]):
                duration = (meta or {}).get("duration_ms") or 0
                for idx, ts in enumerate(range(0, int(duration), every_ms)):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_ts_ms"].append(ts)
                    rows["frame"].append(bytes.fromhex(_fake_seed_hex(bytes(data or b""), ts)))
            yield pd.DataFrame(rows)

    return media.where(F.col("kind") == "video").mapInPandas(
        _sample, schema="media_id string, frame_idx int, frame_ts_ms long, frame binary"
    )
