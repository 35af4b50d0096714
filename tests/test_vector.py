"""Vector-function unit tests (SURVEY F7)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.vector import (
    cosine_similarity,
    cosine_similarity_pandas,
    dot,
    l2_norm,
    l2_normalize,
)


def test_cosine_matches_numpy(spark):
    a = [1.0, 2.0, 3.0]
    b = [-1.0, 0.5, 2.0]
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).first().c
    want = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert got == pytest.approx(want, abs=1e-12)


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>"
    )
    assert df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).first().c is None


def test_dot_and_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "a array<double>")
    row = df.select(
        dot(F.col("a"), F.col("a")).alias("d"), l2_norm(F.col("a")).alias("n")
    ).first()
    assert row.d == 25.0
    assert row.n == 5.0


def test_l2_normalize_unit_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],), ([0.0, 0.0],)], "a array<double>")
    rows = df.select(l2_normalize(F.col("a")).alias("v")).collect()
    assert math.isclose(sum(x * x for x in rows[0].v) ** 0.5, 1.0, abs_tol=1e-12)
    assert rows[1].v == [0.0, 0.0]  # zero vector passes through


def test_pandas_cosine_agrees_with_expression(spark, embeddings):
    pairs = (
        embeddings.limit(30)
        .select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
        .crossJoin(
            embeddings.limit(5).select(
                F.col("vec_id").alias("ib"), F.col("embedding").alias("vb")
            )
        )
    )
    both = pairs.select(
        F.round(cosine_similarity(F.col("va"), F.col("vb")), 6).alias("expr"),
        F.round(cosine_similarity_pandas(F.col("va"), F.col("vb")), 6).alias("pd"),
    ).collect()
    assert all(r.expr == r.pd for r in both)


def test_quantize_int8_roundtrip_bounds(spark, embeddings):
    """q in [-127,127]; dequantization error per component <= scale/2;
    zero vectors quantize to all-zero codes with scale 0."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.vector import (
        dequantize_int8,
        quantize_int8,
    )

    with_zero = embeddings.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(
            [(999999, [0.0] * 64)], "vec_id long, embedding array<float>"
        )
    )
    qd = quantize_int8(F.col("embedding"))
    out = with_zero.select(
        "vec_id",
        qd["scale"].alias("scale"),
        qd["q"].alias("q"),
        dequantize_int8(qd["q"], qd["scale"]).alias("deq"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vd"),
    ).collect()
    for r in out:
        assert all(-127 <= c <= 127 for c in r.q), r.vec_id
        if r.vec_id == 999999:
            assert r.scale == 0.0 and all(c == 0 for c in r.q)
            continue
        assert r.scale > 0
        for x, d in zip(r.vd, r.deq):
            assert abs(x - d) <= r.scale / 2 + 1e-12, r.vec_id


def test_quantized_cosine_recall(spark, embeddings):
    """Top-10 cosine neighbors computed on dequantized int8 vectors must
    overlap the exact top-10 by >= 80% on average — the quality bar that
    justifies the 4x memory cut."""
    import numpy as np

    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    scale = np.abs(m).max(axis=1, keepdims=True) / 127.0
    q = np.round(m / scale)
    deq = q * scale

    def topk(mat, k=10):
        n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = n @ n.T
        np.fill_diagonal(sims, -np.inf)
        return np.argsort(-sims, axis=1)[:, :k]

    exact, approx = topk(m), topk(deq)
    overlap = np.mean(
        [len(set(a) & set(b)) / 10.0 for a, b in zip(exact, approx)]
    )
    assert overlap >= 0.8, overlap


def test_round_half_up_matches_spark_round(spark):
    """round_half_up_np (used by every vectorized matmul score path) must
    agree with Spark's F.round — BigDecimal HALF_UP — on exact .5e-6
    boundaries in both signs, where np.round's half-to-even would flip
    (round-4 advisor finding: a boundary cosine could cross a >= threshold
    in the vectorized path but not the expression twin)."""
    import numpy as np

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.vector import (
        round_half_up_np,
    )

    # values whose double representation sits exactly on the boundary:
    # k * 2^-21 grid points land exactly on n.5e-6 only when exact in
    # binary — 0.5e-6 itself isn't, so use exactly-representable halves
    # scaled into the interesting range plus adversarial near-boundary ulps
    vals = [
        0.0000005, -0.0000005, 0.0000015, -0.0000015, 0.1234565,
        -0.1234565, 0.9999995, -0.9999995, 1.0, -1.0, 0.0,
        0.12345649999999999, 0.1234565000000001,
    ]
    got = round_half_up_np(np.array(vals), 6)
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    want = [r.y for r in df.select(F.round("x", 6).alias("y")).collect()]
    assert list(got) == want, list(zip(vals, got, want))
