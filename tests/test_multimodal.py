"""Multimodal plumbing tests: schema, batch shape, deterministic stub."""

import pytest

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_and_featurize,
    frame_sample_plan,
)


def _media(spark):
    rows = [
        (1, "image", bytes(b"\x89PNGfake-image-bytes-1"), ("png", 64, 48, None)),
        (2, "image", bytes(b"\x89PNGfake-image-bytes-2"), ("png", 32, 32, None)),
        (3, "video", bytes(b"\x00\x00ftypfake-video"), ("mp4", 640, 480, 3500)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_requires_explicit_fake(spark):
    with pytest.raises(NotImplementedError, match="fake=True"):
        decode_and_featurize(_media(spark))


def test_decode_and_featurize_fake(spark):
    out = decode_and_featurize(_media(spark), fake=True)
    rows = {r.media_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert len(r.feature) == FEATURE_DIM
    assert rows[1].format == "png"
    # content-hash-seeded: same input -> same features across runs
    again = {r.media_id: r.feature for r in decode_and_featurize(_media(spark), fake=True).collect()}
    assert again[1] == rows[1].feature
    # different content -> different features
    assert again[1] != again[2]


def test_frame_sample_plan(spark):
    out = frame_sample_plan(_media(spark), every_ms=1000).collect()
    # only the video row expands; 3500ms at 1000ms cadence -> frames 0,1000,2000
    assert all(r.media_id == 3 for r in out)
    assert sorted(r.frame_ts_ms for r in out) == [0, 1000, 2000]
