from __future__ import annotations

import pytest

from vector_mcp_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    extract_features,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("img1", "image", b"\x89PNG-fake-bytes", ("image/png", 640, 480, None)),
        ("img2", "image", b"\xff\xd8JPEG-fake", ("image/jpeg", 800, 600, None)),
        ("vid1", "video", b"RIFF-fake-video", ("video/mp4", 1920, 1080, 3500)),
        ("aud1", "audio", b"ID3-fake-audio", ("audio/mpeg", None, None, 2000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).cache()


def test_feature_extraction_shape_and_determinism(media):
    got = {r.media_id: r.features for r in extract_features(media, dim=16).collect()}
    assert set(got) == {"img1", "img2", "vid1", "aud1"}
    assert all(len(v) == 16 for v in got.values())
    again = {r.media_id: r.features for r in extract_features(media, dim=16).collect()}
    assert got == again  # deterministic on bytes
    assert got["img1"] != got["img2"]  # different bytes → different features


def test_real_decoder_seam_raises(media):
    with pytest.raises(Exception, match="PIL|ffmpeg|librosa"):
        extract_features(media, deterministic_fake=False).collect()


def test_resize_rewrites_meta_only_for_images(media):
    got = resize_images(media, 224, 224).collect()
    assert {r.media_id for r in got} == {"img1", "img2"}
    for r in got:
        assert (r.meta.width, r.meta.height) == (224, 224)
        assert r.data is not None  # bytes pass through the fake


def test_frame_sampling(media):
    got = sample_frames(media, every_ms=1000).collect()
    # vid1: duration 3500ms → frames at 0,1000,2000,3000
    assert [r.frame_ts_ms for r in sorted(got, key=lambda r: r.frame_idx)] == [0, 1000, 2000, 3000]
    assert all(r.media_id == "vid1" for r in got)
    assert len({bytes(r.frame) for r in got}) == 4  # distinct placeholder frames
