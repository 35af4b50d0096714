"""Multimodal (image/audio/video) column plumbing — beyond-reference
extension for the training-data-pipeline north star.

Media travel as opaque ``binary`` columns with a typed metadata struct; all
compute is Arrow-batched ``mapInPandas`` so executors stream media without
ever materializing a row-at-a-time Python object per pixel. The decode
kernels themselves are STUBS: the imaging/audio libraries are not in this
container, so ``decode_image`` raises unless ``fake=True`` substitutes a
deterministic stand-in (content-hash-seeded), keeping the Spark-side
plumbing — schema, batch shape, partitioning — real and testable.

Schema contract:
    media(media_id BIGINT, kind STRING, content BINARY,
          meta STRUCT<format STRING, width INT, height INT,
                      duration_ms BIGINT>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

#: default decode->featurize resize grid (see :func:`fake_feature`)
TARGET_SIZE = (32, 32)

#: geometry of the synthesized media fixture's fake frames (driver `_media`
#: table and its oracle fixture both derive from these — one source of truth)
FAKE_META_WIDTH = 8
FAKE_META_HEIGHT = 8

#: fixture kind assignment: kind = KIND_BY_MOD[media_id % 3]
KIND_BY_MOD = {0: "video", 1: "image", 2: "audio"}


def _fake_pixels(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decoder: content-hash-seeded uint8 frame.
    Replaced by PIL/ffmpeg in a real deployment; everything downstream
    (resize, feature extraction, batching) is agnostic to the substitution.
    """
    seed = int(hashlib.sha256(content).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def fake_feature(
    content: bytes,
    width: int,
    height: int,
    target_size: tuple[int, int] = TARGET_SIZE,
) -> np.ndarray:
    """Pure per-item twin of :func:`decode_and_featurize`'s kernel:
    fake-decode ``content`` at (height, width), nearest-neighbor resize to
    ``target_size``, 4x4 channel-wise block means, first ``FEATURE_DIM``
    floats. The Spark kernel and the driver's precomputed VALUES oracle both
    call THIS function, so a kernel tweak can never desynchronize them.
    """
    tw, th = target_size
    px = _fake_pixels(content, width, height).astype(np.float64)
    ys = np.linspace(0, px.shape[0] - 1, th).astype(int)
    xs = np.linspace(0, px.shape[1] - 1, tw).astype(int)
    small = px[np.ix_(ys, xs)]
    pooled = small.reshape(4, th // 4, 4, tw // 4, 3).mean(axis=(1, 3))
    return pooled.ravel()[:FEATURE_DIM].astype(np.float32)


def decode_and_featurize(
    media: DataFrame,
    target_size: tuple[int, int] = TARGET_SIZE,
    fake: bool = False,
) -> DataFrame:
    """Decode -> resize -> mean-pool feature vector per media row, as one
    ``mapInPandas`` pass (Arrow batches; one Python worker per core; media
    bytes never shuffle — the transform is map-side on the scan).

    Output: input columns (minus content) + ``feature ARRAY<FLOAT>``.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding needs PIL/ffmpeg, not present in this "
            "container; call with fake=True for the deterministic stand-in"
        )
    tw, th = target_size

    out_schema = (
        "media_id long, kind string, format string, feature array<float>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                w = (meta["width"] if meta is not None else None) or tw
                h = (meta["height"] if meta is not None else None) or th
                feats.append(
                    fake_feature(bytes(content), w, h, (tw, th)).tolist()
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": [
                        (m["format"] if m is not None else None) for m in pdf["meta"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (0, every_ms, ...) ready for a decode UDF — pure expression,
    the expensive decode stays behind ``decode_and_featurize``.

    Output: ``media_id, frame_ts_ms``.
    """
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .filter(F.col("meta.duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                    lambda i: i * every_ms,
                )
            ).alias("frame_ts_ms"),
        )
    )
